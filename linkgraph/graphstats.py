"""Whole-graph structure statistics: edge reciprocity, degree
assortativity, and a double-sweep diameter lower bound (SURVEY.md §2.15).

Classic link-graph summary metrics (Newman 2002 assortativity; the
double-sweep heuristic of Magnien/Latapy/Habib for diameter bounds), all
over the events-derived transcript graph:

- ``graph_reciprocity`` / ``degree_assortativity`` are pure Catalyst plans
  (joins + hash aggregates + a corr aggregate); nothing leaves the JVM.
- ``engine_diameter2sweep`` exercises the real CSR/Pregel BFS engine twice
  (fixed supersteps so the unrolled-CTE DuckDB oracle replays the exact
  same frontier schedule), picking the second source as the farthest
  vertex of the first sweep (max dist, min-vkey tiebreak).

Scale notes (100 TB posture):
- reciprocity: one distinct on the edge list + one self equi-join on the
  reversed key — both shuffle on (s,t); no fan-out beyond the edge count.
- assortativity: degrees are a hash aggregate over the undirected view;
  the corr() runs as a single partial-aggregable pass over edges.
- double sweep: 2 fixed-depth BFS runs through the frontier-sparse engine
  (message volume tracks the frontier) + two 1-row bounded collects to
  pick sources — the canonical cheap diameter estimator at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .graph_oracles import _GRAPH_CTES
from .io import load_table

_DIAM_STEPS = 10  # fixed BFS depth per sweep (covers gate-scale graphs)


# --------------------------------------------------------------------------
# shared: directed simple edge set (vkey space) straight off events
# --------------------------------------------------------------------------

def _directed_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (s, t) directed edges of the events graph, self-loops
    dropped — mirrors the ``ek`` CTE of graph_oracles._GRAPH_CTES."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    turn = (
        e.select(
            F.col("event_type").alias("s"),
            F.lead("event_type").over(w).alias("t"),
        )
        .where(F.col("t").isNotNull())
    )
    tool = e.select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("s"),
        F.col("event_type").alias("t"),
    )
    return (
        turn.unionByName(tool)
        .where(F.col("s") != F.col("t"))
        .distinct()
    )


# --------------------------------------------------------------------------
# reciprocity
# --------------------------------------------------------------------------

def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of directed simple edges (s,t) whose reverse (t,s) also
    exists.  Output one row (n_edges, n_reciprocal, reciprocity)."""
    dk = _directed_simple(spark, sf_dir)
    rev = dk.select(
        F.col("t").alias("s"), F.col("s").alias("t"), F.lit(1).alias("r")
    )
    marked = dk.join(rev, ["s", "t"], "left")
    return marked.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.coalesce(F.col("r"), F.lit(0))).alias("n_reciprocal"),
        F.round(F.avg(F.coalesce(F.col("r"), F.lit(0))), 6).alias("reciprocity"),
    )


SQL_GRAPH_RECIPROCITY = (
    "WITH "
    + _GRAPH_CTES
    + """,
dk AS (SELECT DISTINCT s, t FROM ek WHERE s <> t),
marked AS (
  SELECT dk.s, dk.t, CASE WHEN r.s IS NULL THEN 0 ELSE 1 END AS r
  FROM dk LEFT JOIN dk r ON r.s = dk.t AND r.t = dk.s
)
SELECT count(*) AS n_edges,
       CAST(sum(r) AS BIGINT) AS n_reciprocal,
       round(avg(CAST(r AS DOUBLE)), 6) AS reciprocity
FROM marked
"""
)


# --------------------------------------------------------------------------
# degree assortativity (Newman 2002: Pearson corr of endpoint degrees
# over the directed-both-ways undirected simple edge list)
# --------------------------------------------------------------------------

def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient of the undirected simple events
    graph.  Output one row (n_half_edges, assortativity)."""
    dk = _directed_simple(spark, sf_dir)
    und = (
        dk.select("s", "t")
        .unionByName(dk.select(F.col("t").alias("s"), F.col("s").alias("t")))
        .distinct()
    )
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("s"), F.col("deg").alias("da"))
    db = deg.select(F.col("s").alias("t"), F.col("deg").alias("db"))
    pairs = und.join(da, "s").join(db, "t")
    return pairs.agg(
        F.count(F.lit(1)).alias("n_half_edges"),
        F.round(F.corr(F.col("da").cast("double"), F.col("db").cast("double")), 6).alias(
            "assortativity"
        ),
    )


SQL_DEGREE_ASSORTATIVITY = (
    "WITH "
    + _GRAPH_CTES
    + """,
dk AS (SELECT DISTINCT s, t FROM ek WHERE s <> t),
und AS (SELECT DISTINCT s, t FROM
        (SELECT s, t FROM dk UNION ALL SELECT t AS s, s AS t FROM dk)),
deg AS (SELECT s, count(*) AS deg FROM und GROUP BY s)
SELECT count(*) AS n_half_edges,
       round(corr(CAST(a.deg AS DOUBLE), CAST(b.deg AS DOUBLE)), 6) AS assortativity
FROM und JOIN deg a ON a.s = und.s JOIN deg b ON b.s = und.t
"""
)


# --------------------------------------------------------------------------
# double-sweep diameter lower bound (2 fixed-depth engine BFS runs)
# --------------------------------------------------------------------------

def q_engine_diameter2sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-sweep BFS diameter lower bound on the undirected simple
    events graph via the CSR/Pregel engine: sweep 1 from the min-vkey
    vertex, sweep 2 from sweep 1's farthest vertex (max dist, min-vkey
    tiebreak).  Both sweeps run FIXED ``_DIAM_STEPS`` supersteps so the
    unrolled-CTE oracle replays the identical schedule.  Output one row
    (src_vkey, far_vkey, ecc_from_src, diameter_lb)."""
    from .engine_queries import _events_ctx
    from .pregel import BFS_INF, BFSProgram, run_program

    g, ctx = _events_ctx(spark, sf_dir)
    try:
        vkeys = g.vertices.select("vid", "vkey")
        src0 = spark.createDataFrame([(0,)], "vid long")  # vid 0 == min vkey
        res1 = run_program(ctx, BFSProgram(src0), fixed_iters=_DIAM_STEPS)
        # bounded 1-row collect: the farthest vertex of sweep 1
        far = (
            res1.state.where(F.col("dist") < F.lit(int(BFS_INF)))
            .join(vkeys, "vid")
            .orderBy(F.desc("dist"), F.asc("vkey"))
            .select("vid", "vkey", "dist")
            .first()
        )
        src_key = (
            g.vertices.where(F.col("vid") == 0).select("vkey").first()["vkey"]
        )
        res2 = run_program(
            ctx,
            BFSProgram(spark.createDataFrame([(int(far["vid"]),)], "vid long")),
            fixed_iters=_DIAM_STEPS,
        )
        ecc2 = (
            res2.state.where(F.col("dist") < F.lit(int(BFS_INF)))
            .agg(F.max("dist").alias("m"))
            .first()["m"]
        )
        return spark.createDataFrame(
            [(src_key, far["vkey"], int(far["dist"]), int(ecc2))],
            "src_vkey string, far_vkey string, ecc_from_src bigint, diameter_lb bigint",
        )
    finally:
        ctx.unpersist()


def _bfs_sweep_ctes(prefix: str, src_pred: str, k: int) -> list[str]:
    """Unrolled k-level BFS CTE chain named ``{prefix}d{i}``; source rows
    are those satisfying ``src_pred`` (a predicate over v.vkey)."""
    # every level is MATERIALIZED: DuckDB inlines plain CTEs at each
    # reference, and level i references level i-1 twice (the frontier join
    # and the carry-forward), so a non-materialized k-level unroll expands
    # 2^k-fold and re-opens the parquet scan per copy.
    ctes = [
        f"{prefix}d0 AS MATERIALIZED (SELECT vkey, CASE WHEN {src_pred} "
        "THEN 0 ELSE NULL END AS dist FROM v)"
    ]
    for i in range(1, k + 1):
        p = f"{prefix}d{i - 1}"
        ctes.append(
            f"{prefix}m{i} AS MATERIALIZED (SELECT u.a AS vkey, min(p.dist) + 1 AS nd "
            f"FROM und u JOIN {p} p ON p.vkey = u.b "
            f"WHERE p.dist IS NOT NULL GROUP BY u.a)"
        )
        ctes.append(
            f"{prefix}d{i} AS MATERIALIZED (SELECT p.vkey, CASE "
            f"WHEN p.dist IS NULL THEN m.nd "
            f"WHEN m.nd IS NULL THEN p.dist "
            f"ELSE least(p.dist, m.nd) END AS dist "
            f"FROM {p} p LEFT JOIN {prefix}m{i} m USING (vkey))"
        )
    return ctes


def _diameter2sweep_sql(k: int) -> str:
    ctes = [
        _GRAPH_CTES,
        "und AS (SELECT DISTINCT a, b FROM ("
        "SELECT s AS a, t AS b FROM ek WHERE s <> t "
        "UNION ALL SELECT t AS a, s AS b FROM ek WHERE s <> t))",
    ]
    ctes += _bfs_sweep_ctes("s1", "vkey = (SELECT min(vkey) FROM v)", k)
    ctes.append(
        f"far AS MATERIALIZED (SELECT vkey, dist FROM s1d{k} WHERE dist IS NOT NULL "
        "ORDER BY dist DESC, vkey LIMIT 1)"
    )
    ctes += _bfs_sweep_ctes("s2", "vkey = (SELECT vkey FROM far)", k)
    sql = "WITH " + ",\n".join(ctes)
    # DuckDB inlines (re-expands) non-materialized CTEs at every reference;
    # with 2*k unrolled BFS levels each referencing `und`, that re-opens the
    # events parquet per level and trips the fd limit.  Materialize the
    # fan-in CTEs so each is computed once.
    for name in ("base", "ek", "v", "und"):
        sql = sql.replace(f"{name} AS (", f"{name} AS MATERIALIZED (", 1)
    return (
        sql
        + f"""
SELECT (SELECT min(vkey) FROM v) AS src_vkey,
       (SELECT vkey FROM far) AS far_vkey,
       (SELECT CAST(dist AS BIGINT) FROM far) AS ecc_from_src,
       (SELECT CAST(max(dist) AS BIGINT) FROM s2d{k} WHERE dist IS NOT NULL)
         AS diameter_lb
"""
    )


SQL_ENGINE_DIAMETER2SWEEP = _diameter2sweep_sql(_DIAM_STEPS)


def registry():
    return {
        "graph_reciprocity": (q_graph_reciprocity, SQL_GRAPH_RECIPROCITY),
        "degree_assortativity": (q_degree_assortativity, SQL_DEGREE_ASSORTATIVITY),
        "engine_diameter2sweep": (q_engine_diameter2sweep, SQL_ENGINE_DIAMETER2SWEEP),
    }
