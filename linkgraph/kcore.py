"""k-core decomposition by iterative peeling (SURVEY.md §2.10 family).

The k-core of an undirected simple graph is the maximal subgraph where
every vertex has degree >= k — the standard dense-substructure primitive
(community seeds, spam/bot rings in link graphs).  Computed by the
classic fixed point: repeatedly drop vertices with degree < k, recompute
degrees on the survivors, until nothing changes.

Spark shape per peel: two equi-joins restricting the symmetrized edge list
to surviving endpoints + one groupBy(src) count — all Catalyst-planned
shuffled hash joins/aggregates, data-proportional, no Python in the loop.
The survivor set shrinks monotonically, so the per-iteration cost falls;
``localCheckpoint`` truncates the loop's lineage each peel (op 54).  At
production scale the alive set starts at |V| and the edge restriction is
the dominant term — a shuffle join on vid, co-partitioned after the first
peel because both sides hash on the same key.

``fixed_iters`` runs exactly j peels (convergence ignored) — the
SQL-expressible form (unrolled CTEs, graph_oracles.kcore_fixed_sql) used by
the driver gate row ``engine_kcore``; the converged form is pytest-verified
against networkx ``nx.k_core`` exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .csr import symmetrize


def _alive_degrees(und: DataFrame, alive: DataFrame) -> DataFrame:
    """Degrees over the subgraph induced by ``alive`` (vid) vertices."""
    e = und.join(alive.withColumnRenamed("vid", "src"), "src").join(
        alive.withColumnRenamed("vid", "dst"), "dst"
    )
    return e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))


def kcore_members(
    edges: DataFrame,
    k: int,
    fixed_iters: int | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """Survivors of k-core peeling: (vid, core_deg) with core_deg the
    induced-subgraph degree of the returned vertex set."""
    und = symmetrize(edges).select("src", "dst").localCheckpoint()
    alive = und.select(F.col("src").alias("vid")).distinct().localCheckpoint()
    n_alive = None if fixed_iters is not None else alive.count()

    last = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(last):
        deg = _alive_degrees(und, alive)
        alive = (
            deg.where(F.col("deg") >= k)
            .select(F.col("src").alias("vid"))
            .localCheckpoint()
        )
        if fixed_iters is None:
            n_new = alive.count()
            if n_new == n_alive:
                break
            n_alive = n_new

    return (
        _alive_degrees(und, alive)
        .select(F.col("src").alias("vid"), F.col("deg").alias("core_deg"))
    )


def engine_kcore(spark: SparkSession, sf_dir: str, k: int = 3, iters: int = 8) -> DataFrame:
    """Driver gate row: fixed-``iters`` 3-core peeling over the events
    graph, output (vkey, core_deg) — hash-checked against the unrolled-CTE
    DuckDB oracle (graph_oracles.kcore_fixed_sql)."""
    from .flagship import events_graph
    from .io import load_table

    g = events_graph(load_table(spark, sf_dir, "events"))
    members = kcore_members(g.edges, k, fixed_iters=iters)
    return members.join(g.vertices.select("vid", "vkey"), "vid").select(
        "vkey", "core_deg"
    )


def onion_layers(
    edges: DataFrame, k: int, iters: int
) -> DataFrame:
    """Onion-layer refinement of k-core peeling (Hébert-Dufresne et al.
    2016): ``layer`` = the peel ROUND (1-based) at which a vertex drops
    out of the k-core fixed point; 0 = still alive after ``iters`` rounds
    (i.e. in the k-core at this depth).  Same per-peel Spark shape as
    ``kcore_members`` — two co-partitioned equi-joins + one combinable
    degree groupBy, shrinking survivor set, lineage truncated each peel;
    the per-round dropped sets are accumulated by unionByName (small,
    disjoint), never re-joined against the full graph."""
    und = symmetrize(edges).select("src", "dst").localCheckpoint()
    alive = und.select(F.col("src").alias("vid")).distinct().localCheckpoint()
    dropped = []
    for i in range(1, iters + 1):
        deg = _alive_degrees(und, alive)
        new_alive = (
            deg.where(F.col("deg") >= k)
            .select(F.col("src").alias("vid"))
            .localCheckpoint()
        )
        dropped.append(
            alive.join(new_alive, "vid", "left_anti").select(
                "vid", F.lit(i).alias("layer")
            )
        )
        alive = new_alive
    out = alive.select("vid", F.lit(0).alias("layer"))
    for d in dropped:
        out = out.unionByName(d)
    return out


def engine_onion(spark: SparkSession, sf_dir: str, k: int = 3, iters: int = 8) -> DataFrame:
    """Driver gate row (§2.15 row 206): onion layers of the fixed-8-round
    3-core peel over the events graph, output (vkey, layer) — hash-checked
    against the chained-LEFT-JOIN unrolled oracle
    (graph_oracles.onion_fixed_sql)."""
    from .flagship import events_graph
    from .io import load_table

    g = events_graph(load_table(spark, sf_dir, "events"))
    layers = onion_layers(g.edges, k, iters)
    return layers.join(g.vertices.select("vid", "vkey"), "vid").select(
        "vkey", "layer"
    )
