"""Dynamic-graph warm start (HOOVER's streaming posture, SURVEY.md §1.4).

HOOVER's graphs evolve over timesteps: vertices/edges appear as new data
arrives and the runtime re-converges from its current state rather than
from scratch.  The Spark realization: when new transcript partitions land,
re-derive the graph (cheap, one pass) and seed the iterative program with
the PREVIOUS converged state carried over by stable vertex key — vids are
dense per-build (derive.py assigns them by sorted (vtype, vkey)), so state
moves between builds keyed on ``(vtype, vkey)``, never on vid.

``warm_pagerank_init`` maps old ranks onto the new vertex set:

- surviving vertices keep their converged rank,
- new vertices start at 1/n_new,
- the whole vector is renormalized to sum 1 (PageRank's invariant),

which preserves the fixed point's basin: for a small graph delta the warm
run re-converges in a fraction of the cold supersteps (property-tested),
and the converged result is identical (same contraction, same fixed point,
1e-6).  At 10^12-turn scale this is the difference between ~5 and ~50+
supersteps per ingest batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .derive import GraphTables
from .pregel import GraphContext


def ranks_by_key(graph: GraphTables, state: DataFrame) -> DataFrame:
    """Converged vid-keyed state -> portable (vtype, vkey, rank)."""
    return state.join(graph.vertices, "vid").select("vtype", "vkey", "rank")


def warm_pagerank_init(
    ctx: GraphContext, graph: GraphTables, prev_ranks: DataFrame
) -> DataFrame:
    """Initial PageRank state for ``run_program(..., init_state=...)``.

    ``prev_ranks``: (vtype, vkey, rank) from a previous converged run
    (``ranks_by_key``).  Never shuffles the big side twice: one join onto
    the new vertex map, then a scalar renormalization.
    """
    n = ctx.n_vertices
    seeded = (
        graph.vertices.join(
            prev_ranks.withColumnRenamed("rank", "prev_rank"),
            ["vtype", "vkey"],
            "left",
        )
        .select("vid", F.coalesce("prev_rank", F.lit(1.0 / n)).alias("rank"))
    )
    total = seeded.agg(F.sum("rank")).collect()[0][0] or 1.0
    return ctx.vertex_base.join(
        seeded.select("vid", (F.col("rank") / F.lit(total)).alias("rank")), "vid"
    ).select("vid", "part_id", "dangling", "rank")
