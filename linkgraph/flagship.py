"""Flagship query for the driver's ``entry()`` smoke (SURVEY.md §3 trace B).

From the driver table ``events(event_id, ts, user_id, event_type, value,
props)``: order by (user_id, ts, event_id); derive an interaction graph —
consecutive-event edges ``event_type(i) -> event_type(i+1)`` per user, plus
``user:<id> -> event_type`` invocation edges — run 5 PageRank supersteps,
return the top-10 vertices by rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .derive import GraphTables, build_degrees
from .io import load_table
from .pagerank import pagerank_naive


def events_graph(events: DataFrame) -> GraphTables:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.col("event_type").alias("src_key"),
        F.lead("event_type").over(w).alias("dst_key"),
    )
    turn = seq.where(F.col("dst_key").isNotNull()).select(
        "src_key", "dst_key", F.lit("turn").alias("etype")
    )
    tool = events.select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("src_key"),
        F.col("event_type").alias("dst_key"),
        F.lit("tool").alias("etype"),
    )
    ekeys = turn.unionByName(tool)

    # single shared namespace: every key is one vertex regardless of edge type
    keys = (
        ekeys.select(F.col("src_key").alias("vkey"))
        .unionByName(ekeys.select(F.col("dst_key").alias("vkey")))
        .distinct()
    )
    vw = Window.orderBy("vkey")
    vertices = keys.select(
        "vkey",
        (F.row_number().over(vw) - 1).cast("long").alias("vid"),
        F.when(F.col("vkey").startswith("user:"), F.lit("actor"))
        .otherwise(F.lit("tool"))
        .alias("vtype"),
    )
    v = F.broadcast(vertices)
    edges = (
        ekeys.join(v.select(F.col("vkey").alias("src_key"), F.col("vid").alias("src")), "src_key")
        .join(v.select(F.col("vkey").alias("dst_key"), F.col("vid").alias("dst")), "dst_key")
        .groupBy("src", "dst", "etype")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return GraphTables(vertices=vertices, edges=edges, degrees=build_degrees(edges, vertices))


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """5 fixed PageRank supersteps on the events graph; top-10 by rank.

    Fixed iteration count + rank rounded to 6 decimals (and ORDERED by the
    rounded value) make this hash-checkable against the unrolled-CTE DuckDB
    oracle (graph_oracles.pagerank_fixed_sql) — double summation-order noise
    is ~1e-15 relative, far below the rounding grain."""
    graph = events_graph(load_table(spark, sf_dir, "events"))
    res = pagerank_naive(graph, tol=0.0, max_iter=5)
    return (
        res.ranks.join(graph.vertices, "vid")
        .select("vid", "vkey", "vtype", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "vid")
        .limit(10)
    )
