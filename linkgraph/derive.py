"""Graph derivation from transcript turns (SURVEY.md §2.9, ops 40-45).

Pipeline:
  transcripts --stable ordering--> ordered turns
             --lead() window-->    consecutive-turn edges (actor -> actor)
             --filter-->           tool-invocation edges  (actor -> tool)
             --distinct+sort-->    vertex map (dense deterministic vids)
             --join+groupBy-->     edge table (src,dst,etype, w=multiplicity)
             --groupBy-->          degree table

Invariants (BASELINE.json north_rule / input_hint):
- stable turn ordering: sort key (conv_id, turn_idx, ts); the derived edge
  set is invariant to the physical row order of the input (property-tested).
- vids are dense int64, assigned deterministically; NO
  ``monotonically_increasing_id`` anywhere (non-deterministic across
  runs/partitionings — SURVEY.md op 39).
- actor keys are normalized ``lower(trim(role))``; tool keys
  ``lower(trim(tool))``; vertex identity is (vkey, vtype).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN = "turn"
TOOL = "tool"
ACTOR_T = "actor"
TOOL_T = "tool"

# Window for stable turn ordering. (conv_id, turn_idx) is unique in valid
# input; ts breaks ties if upstream data violates that, and turn_idx is the
# final deterministic tiebreak on itself.
def _conv_order():
    return Window.partitionBy("conv_id").orderBy("turn_idx", "ts")


@dataclass
class GraphTables:
    """The derived columnar graph: all plain DataFrames (FIXTURES.md §2)."""

    vertices: DataFrame  # vkey string, vid int64, vtype string
    edges: DataFrame     # src int64, dst int64, etype string, w double
    degrees: DataFrame   # vid, out_deg, in_deg (edge counts), out_w, in_w (weight sums)


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Attach the stable order + normalized actor/tool keys."""
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.lower(F.trim(F.col("role"))).alias("actor_key"),
        F.lower(F.trim(F.col("tool"))).alias("tool_key"),
    ).withColumn("ord", F.row_number().over(_conv_order()))


def turn_edge_keys(ordered: DataFrame) -> DataFrame:
    """Consecutive-turn links: actor(turn i) -> actor(turn i+1) per conv.

    Implemented with ``lead()`` over the conversation window instead of a
    self-join (cheaper, skew-free: one window pass, no join shuffle —
    SURVEY.md op 14).  Self-loops (same actor twice in a row) are KEPT here;
    algorithm layers drop them where their semantics require.
    """
    nxt = F.lead("actor_key").over(_conv_order())
    return (
        ordered.withColumn("dst_key", nxt)
        .where(F.col("dst_key").isNotNull())
        .select(
            F.col("actor_key").alias("src_key"),
            "dst_key",
            F.lit(TURN).alias("etype"),
        )
    )


def tool_edge_keys(ordered: DataFrame) -> DataFrame:
    """Tool-invocation links: actor(turn) -> tool(turn) where tool set.

    The IS NOT NULL predicate stays a Column expression so Catalyst pushes it
    into the scan (SURVEY.md §4).
    """
    return ordered.where(F.col("tool_key").isNotNull()).select(
        F.col("actor_key").alias("src_key"),
        F.col("tool_key").alias("dst_key"),
        F.lit(TOOL).alias("etype"),
    )


def edge_keys(transcripts: DataFrame) -> DataFrame:
    """Union of turn- and tool-edges, still in key space (op 31)."""
    ordered = ordered_turns(transcripts)
    return turn_edge_keys(ordered).unionByName(tool_edge_keys(ordered))


def build_vertices(ekeys: DataFrame, distributed: bool = False) -> DataFrame:
    """Vertex map with dense deterministic vids (op 43).

    Identity = (vkey, vtype): srcs are always actors; dsts are actors for
    turn-edges and tools for tool-edges.

    Default path: global sort + ``row_number()`` (single-partition window).
    The vertex vocabulary (distinct actors + tools) is orders of magnitude
    smaller than the turn count, so this is fine up to ~10^7 vertices.
    ``distributed=True`` switches to a deterministic two-phase scheme (hash
    bucket -> per-bucket offsets -> bucket-local row_number) that never
    funnels through one task; vids are still dense + deterministic but not
    globally key-ordered.
    """
    srcs = ekeys.select(F.col("src_key").alias("vkey"), F.lit(ACTOR_T).alias("vtype"))
    dsts = ekeys.select(
        F.col("dst_key").alias("vkey"),
        F.when(F.col("etype") == TOOL, F.lit(TOOL_T)).otherwise(F.lit(ACTOR_T)).alias("vtype"),
    )
    keys = srcs.unionByName(dsts).distinct()

    if not distributed:
        w = Window.orderBy("vtype", "vkey")
        return keys.select(
            "vkey", (F.row_number().over(w) - 1).cast("long").alias("vid"), "vtype"
        )

    # Distributed deterministic dense ids: bucket by hash, compute bucket
    # offsets on the driver (B rows), then bucket-local row_number + offset.
    # The bucketed key set is materialized once (localCheckpoint): the
    # offsets job and the final id assignment would otherwise each re-run
    # the full distinct over the edge-key stream.
    n_buckets = 256
    bucketed = keys.withColumn(
        "b", F.pmod(F.xxhash64("vtype", "vkey"), F.lit(n_buckets)).cast("int")
    ).localCheckpoint()
    counts = {r["b"]: r["c"] for r in bucketed.groupBy("b").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off_df = bucketed.sparkSession.createDataFrame(
        [(b, offsets[b]) for b in range(n_buckets)], "b int, off long"
    )
    wb = Window.partitionBy("b").orderBy("vtype", "vkey")
    return (
        bucketed.join(F.broadcast(off_df), "b")
        .select(
            "vkey",
            (F.col("off") + F.row_number().over(wb) - 1).cast("long").alias("vid"),
            "vtype",
        )
    )


def build_edges(ekeys: DataFrame, vertices: DataFrame, broadcast_vertices: bool = True) -> DataFrame:
    """Map keys -> vids and dedup to weighted edges (op 44).

    w = multiplicity of the (src,dst,etype) link (double, for weighted
    PageRank).  The vertex map is broadcast by default — it is small relative
    to the edge table at every scale tier (hub-list pattern, SURVEY.md op 11);
    pass False to fall back to shuffle joins at extreme vertex counts.
    """
    v = F.broadcast(vertices) if broadcast_vertices else vertices
    vsrc = v.where(F.col("vtype") == ACTOR_T).select(
        F.col("vkey").alias("src_key"), F.col("vid").alias("src")
    )
    vdst_actor = v.where(F.col("vtype") == ACTOR_T).select(
        F.col("vkey").alias("dst_key"), F.col("vid").alias("dst")
    )
    vdst_tool = v.where(F.col("vtype") == TOOL_T).select(
        F.col("vkey").alias("dst_key"), F.col("vid").alias("dst")
    )

    turn = ekeys.where(F.col("etype") == TURN).join(vsrc, "src_key").join(vdst_actor, "dst_key")
    tool = ekeys.where(F.col("etype") == TOOL).join(vsrc, "src_key").join(vdst_tool, "dst_key")

    return (
        turn.unionByName(tool)
        .groupBy("src", "dst", "etype")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def build_degrees(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Out/in degree + weight sums per vid; vertices with no edges kept via
    left join (dangling detection = out_deg == 0, SURVEY.md op 45)."""
    out = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("out_deg"), F.sum("w").alias("out_w")
    )
    inn = edges.groupBy("dst").agg(
        F.count(F.lit(1)).alias("in_deg"), F.sum("w").alias("in_w")
    )
    return (
        vertices.select("vid")
        .join(out.withColumnRenamed("src", "vid"), "vid", "left")
        .join(inn.withColumnRenamed("dst", "vid"), "vid", "left")
        .select(
            "vid",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce("out_w", F.lit(0.0)).alias("out_w"),
            F.coalesce("in_w", F.lit(0.0)).alias("in_w"),
        )
    )


def build_graph(
    transcripts: DataFrame, distributed_ids: bool = True, cache: bool = False
) -> GraphTables:
    """Full derivation: transcripts -> (vertices, edges, degrees).

    ``distributed_ids`` defaults to True — the PRODUCTION path: vid
    assignment never funnels through a single task (the global-sort
    variant's single-partition window is a scale-killer past ~10^7
    vertices; VERDICT r01 item 3).  Pass False only where downstream logic
    needs vids globally ordered by (vtype, vkey).

    ``cache=True`` eagerly materializes the edge-key stream once
    (localCheckpoint) so the vertex/edge/degree builds don't each re-run the
    transcript window pass — use for bench/production builds; tests keep the
    pure-lazy default."""
    ekeys = edge_keys(transcripts)
    if cache:
        ekeys = ekeys.localCheckpoint()
    vertices = build_vertices(ekeys, distributed=distributed_ids)
    edges = build_edges(ekeys, vertices)
    degrees = build_degrees(edges, vertices)
    return GraphTables(vertices=vertices, edges=edges, degrees=degrees)


def undirected_simple_edges(edges: DataFrame) -> DataFrame:
    """Undirected simple view: drop self-loops, collapse direction + dups.

    Emits each undirected edge once with u < v (used by CC symmetrization,
    triangles, and the nx oracles)."""
    uv = edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    )
    return uv.distinct()
