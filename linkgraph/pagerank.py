"""PageRank (SURVEY.md op 48) — naive DataFrame path + CSR/Arrow fast path.

Semantics (match ref_single_node.pagerank_ref / networkx.pagerank exactly):
    r_t(v) = (1-d)/n + d * ( sum_{u->v} r_{t-1}(u) * w(u,v)/wout(u)
                             + dangling_mass_{t-1}/n )
float64 throughout; converged when L_inf(r_t - r_{t-1}) < tol.
Self-loops participate (as in networkx).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .derive import GraphTables


@dataclass
class PageRankResult:
    ranks: DataFrame            # vid:long, rank:double
    supersteps: int
    converged: bool
    deltas: list[float] = field(default_factory=list)


def _prepare(graph: GraphTables):
    """Static per-run inputs: scatter coefficients + dangling flags + n."""
    e = graph.edges.join(
        graph.degrees.select("vid", "out_w"), graph.edges.src == F.col("vid")
    ).select("src", "dst", (F.col("w") / F.col("out_w")).alias("coeff"))
    dangling = graph.degrees.select(
        "vid", (F.col("out_deg") == 0).alias("dangling")
    )
    return e, dangling


def pagerank_naive(
    graph: GraphTables,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> PageRankResult:
    """Plain DataFrame PageRank: per-superstep join + groupBy(dst).sum.

    This is the M1 reference path — correct, Catalyst-planned, but it
    shuffles the full edge contribution stream every superstep.  The CSR
    path (csr.py + pregel.py) is the scale path.  Plan growth across
    iterations is truncated with localCheckpoint (SURVEY.md op 54).
    """
    spark = graph.edges.sparkSession
    e, dangling = _prepare(graph)
    e = e.persist()
    n = graph.vertices.count()

    state = (
        dangling.select("vid", "dangling")
        .withColumn("rank", F.lit(1.0 / n))
        .localCheckpoint()
    )

    deltas: list[float] = []
    converged = False
    steps = 0
    for t in range(1, max_iter + 1):
        steps = t
        dmass = state.where("dangling").agg(F.sum("rank")).collect()[0][0] or 0.0
        msgs = (
            e.join(state.select(F.col("vid").alias("src"), "rank"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("coeff")).alias("msum"))
        )
        new_state = (
            state.join(msgs.withColumnRenamed("dst", "vid"), "vid", "left")
            .select(
                "vid",
                "dangling",
                F.col("rank").alias("old_rank"),
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * (F.coalesce("msum", F.lit(0.0)) + F.lit(dmass / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = new_state.agg(
            F.max(F.abs(F.col("rank") - F.col("old_rank")))
        ).collect()[0][0]
        deltas.append(float(delta))
        state = new_state.select("vid", "dangling", "rank")
        if delta < tol:
            converged = True
            break
    e.unpersist()
    return PageRankResult(state.select("vid", "rank"), steps, converged, deltas)
