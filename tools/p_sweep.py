"""Partition-count sweep for the superstep engine at a given tier.

Measures PageRank wall / per-superstep wall on the SAME bench graph at
several CSR partition counts P, on the same local[32] session — evidence
for choosing a data-proportional default (partitions sized to edge volume,
not a constant): at sf0.1 (76k edges) a P=32 layout means ~2.4k edges per
block, so per-task scheduling + Python-worker round-trips dominate; at
100 TB the same rule yields thousands of partitions.

Usage: python tools/p_sweep.py [sf_dir] [P ...]
Prints one JSON line per P.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

CONVS_PER_SF = 280_000
HUB_THETA = 256


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ps = [int(x) for x in sys.argv[2:]] or [4, 8, 16, 32]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_conv = max(50, int(CONVS_PER_SF * sf))

    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="p-sweep", master=f"local[{cpus}]", shuffle_partitions=max(ps)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from linkgraph.derive import build_graph
    from linkgraph.pregel import GraphContext, PageRankProgram, run_program
    from linkgraph.synth import synth_transcripts

    tdir = tempfile.mkdtemp(prefix="psweep_") + "/transcripts"
    synth_transcripts(
        spark, n_conversations=n_conv, seed=42, n_agents=200, unique_users=True
    ).write.mode("overwrite").parquet(tdir)
    transcripts = spark.read.parquet(tdir)

    # warm the worker pool once (same rationale as bench.py)
    def _warm(key, tbl):
        return tbl

    (
        spark.range(0, cpus * 4, 1, cpus)
        .withColumn("g", F.col("id") % cpus)
        .groupBy("g")
        .applyInArrow(_warm, "id long, g long")
        .count()
    )

    for p in ps:
        g = build_graph(transcripts, cache=True)
        t0 = time.monotonic()
        ctx = GraphContext.build(g, p, hub_theta=HUB_THETA)
        build_s = time.monotonic() - t0
        t0 = time.monotonic()
        res = run_program(ctx, PageRankProgram(tol=1e-6), max_iter=60)
        pr_s = time.monotonic() - t0
        steps = len(res.stats_history)
        top = (
            res.state.orderBy(F.desc("rank"), "vid")
            .limit(3)
            .select(F.round("rank", 6).alias("r"))
            .collect()
        )
        print(
            json.dumps(
                {
                    "P": p,
                    "build_s": round(build_s, 3),
                    "pagerank_s": round(pr_s, 3),
                    "steps": steps,
                    "per_step_s": round(pr_s / steps, 4),
                    "converged": res.converged,
                    "top3_rank": [r["r"] for r in top],
                    "loadavg": round(os.getloadavg()[0], 1),
                }
            ),
            flush=True,
        )
        ctx.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
