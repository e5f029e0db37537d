"""HITS (hubs & authorities) — fixed-point link analysis on the directed
simple graph (SURVEY.md §2.10 family; Kleinberg 1999, public).

Per iteration over the DISTINCT (src, dst) edge set:

    a_t(v) = sum_{u->v} h_{t-1}(u)   then L1-normalize a_t
    h_t(u) = sum_{u->v} a_t(v)       then L1-normalize h_t

Spark shape: each half-step is ONE shuffled equi-join (scores joined to the
edge list on its grouping key) + ONE groupBy aggregate — both
Catalyst-planned, data-proportional, no Python in the loop.  The L1
normalizer is folded in as a broadcast of a 1-row global aggregate
(crossJoin of an agg — no ``collect()``, no driver round-trip inside the
plan), so a superstep is two shuffles end to end, same as the
textbook formulation's lower bound.  Lineage is truncated per iteration
(op 54); at 100 TB the edge list is the static side and would be
pre-partitioned on the join key once and reused.

Fixed-iteration runs are hash-checkable against the unrolled-CTE DuckDB
oracle (graph_oracles.hits_fixed_sql); converged behavior is pytest-verified
against a single-node numpy reference (tests/test_hits.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .derive import GraphTables


def _l1_normalize(scores: DataFrame, col: str) -> DataFrame:
    """Divide ``col`` by its global sum — broadcast 1-row agg, stays lazy."""
    tot = scores.agg(F.sum(col).alias("_tot"))
    # Zero-sum guard (ADVICE r03 #3): an empty distinct edge set drives the
    # global sum to 0 — dividing would turn every score NULL; emit 0 instead.
    return scores.crossJoin(F.broadcast(tot)).select(
        "vid",
        F.coalesce(
            F.col(col) / F.when(F.col("_tot") != 0, F.col("_tot")), F.lit(0.0)
        ).alias(col),
    )


def hits_scores(
    graph: GraphTables, iters: int = 5
) -> DataFrame:
    """``iters`` HITS iterations; returns (vid, authority, hub).

    Uses the distinct directed simple edge set (multiplicities ignored —
    classic HITS is structural).  Every vertex appears in the output;
    vertices outside the link structure get 0 on the missing side.
    """
    e = graph.edges.select("src", "dst").distinct().localCheckpoint()
    v = graph.vertices.select("vid")
    n = v.count()

    h = v.select("vid", F.lit(1.0 / n).alias("h"))
    a = None
    for _ in range(iters):
        # authorities from current hubs: join on src, aggregate on dst
        ar = (
            e.join(h.withColumnRenamed("vid", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
            .withColumnRenamed("dst", "vid")
        )
        a = _l1_normalize(
            v.join(ar, "vid", "left").select("vid", F.coalesce("a", F.lit(0.0)).alias("a")),
            "a",
        ).localCheckpoint()
        # hubs from normalized authorities: join on dst, aggregate on src
        hr = (
            e.join(a.withColumnRenamed("vid", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .withColumnRenamed("src", "vid")
        )
        h = _l1_normalize(
            v.join(hr, "vid", "left").select("vid", F.coalesce("h", F.lit(0.0)).alias("h")),
            "h",
        ).localCheckpoint()

    return a.withColumnRenamed("a", "authority").join(
        h.withColumnRenamed("h", "hub"), "vid"
    )


def salsa_scores(graph: GraphTables, iters: int = 5) -> DataFrame:
    """``iters`` SALSA iterations (Lempel & Moran 2000, public); returns
    (vid, authority, hub).

    SALSA is the degree-normalized sibling of HITS — the bipartite
    random-walk formulation behind web-scale related-page / who-to-follow
    systems: the authority step divides each hub's contribution by its
    out-degree, the hub step divides each authority's contribution by its
    in-degree, so scores are stationary-walk probabilities rather than raw
    path counts (hub sites no longer dominate just by fan-out).  Both
    half-steps L1-normalize, which also re-injects mass lost to one-sided
    vertices under fixed-k iteration.

    Spark shape: degrees are two hash aggregates over the distinct edge
    set, joined to the edges ONCE up front (the per-iteration loop then
    re-joins only the 2-column score table); each half-step is one shuffled
    equi-join + one groupBy — identical plan shape and scale posture as
    :func:`hits_scores`.
    """
    e = graph.edges.select("src", "dst").distinct()
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    idg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    ed = e.join(od, "src").join(idg, "dst").localCheckpoint()
    v = graph.vertices.select("vid")
    n = v.count()

    h = v.select("vid", F.lit(1.0 / n).alias("h"))
    a = None
    for _ in range(iters):
        ar = (
            ed.join(h.withColumnRenamed("vid", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("h") / F.col("od")).alias("a"))
            .withColumnRenamed("dst", "vid")
        )
        a = _l1_normalize(
            v.join(ar, "vid", "left").select("vid", F.coalesce("a", F.lit(0.0)).alias("a")),
            "a",
        ).localCheckpoint()
        hr = (
            ed.join(a.withColumnRenamed("vid", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("a") / F.col("idg")).alias("h"))
            .withColumnRenamed("src", "vid")
        )
        h = _l1_normalize(
            v.join(hr, "vid", "left").select("vid", F.coalesce("h", F.lit(0.0)).alias("h")),
            "h",
        ).localCheckpoint()

    return a.withColumnRenamed("a", "authority").join(
        h.withColumnRenamed("h", "hub"), "vid"
    )


def engine_salsa(spark: SparkSession, sf_dir: str, iters: int = 5, limit: int = 20) -> DataFrame:
    """Driver gate row: fixed-``iters`` SALSA over the events graph, top-20
    by rounded authority — hash-checked against
    graph_oracles.salsa_fixed_sql (same round-to-6 / rounded-order armor as
    engine_hits)."""
    from .flagship import events_graph
    from .io import load_table

    g = events_graph(load_table(spark, sf_dir, "events"))
    s = salsa_scores(g, iters=iters)
    return (
        s.join(g.vertices.select("vid", "vkey"), "vid")
        .select(
            "vkey",
            F.round("authority", 6).alias("authority"),
            F.round("hub", 6).alias("hub"),
        )
        .orderBy(F.desc("authority"), "vkey")
        .limit(limit)
    )


def engine_hits(spark: SparkSession, sf_dir: str, iters: int = 5, limit: int = 20) -> DataFrame:
    """Driver gate row: fixed-``iters`` HITS over the events graph, top-20 by
    rounded authority — hash-checked against graph_oracles.hits_fixed_sql.
    Scores rounded to 6 decimals on BOTH sides and ordered by the rounded
    value (same double-noise armor as the PageRank oracles)."""
    from .flagship import events_graph
    from .io import load_table

    g = events_graph(load_table(spark, sf_dir, "events"))
    s = hits_scores(g, iters=iters)
    return (
        s.join(g.vertices.select("vid", "vkey"), "vid")
        .select(
            "vkey",
            F.round("authority", 6).alias("authority"),
            F.round("hub", 6).alias("hub"),
        )
        .orderBy(F.desc("authority"), "vkey")
        .limit(limit)
    )
