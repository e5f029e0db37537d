"""One PIPELINE scaling-probe run: the full production path — transcripts
(parquet scan) -> derive (edges/vertices/degrees) -> CSR block build ->
fixed-superstep PageRank with durable checkpoints — at one parallelism
level.  Complements bench/scale_probe.py (which isolates the superstep
engine on a dense power-law graph): this probe covers the binding
north-rule claim on the TRANSCRIPT-DERIVED pipeline end to end
(VERDICT r02 next-round item 6).

Invoked by bench/run_pipeline_scaling.py once per level (fresh JVM each).
The transcript input is synthesized and written to parquet ONCE by the
runner and shared by both levels, so the timed region is byte-identical
work against an identical columnar input.

Prints ONE JSON line:
  {"cpus": N, "vertices": V, "edges": E, "derive_s": ..., "pagerank_s": ...,
   "total_s": ..., "steps": k}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--input", required=True, help="transcript parquet dir")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from linkgraph.session import get_spark

    spark = get_spark(
        app_name=f"pipeline-probe-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.partitions,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from linkgraph.derive import build_graph
    from linkgraph.pregel import GraphContext, PageRankProgram, run_program

    # same untimed worker-pool/codegen warm-up as bench.py
    def _warm(key, tbl):
        return tbl

    (
        spark.range(0, args.cpus * 4, 1, args.cpus)
        .withColumn("g", F.col("id") % args.cpus)
        .groupBy("g")
        .applyInArrow(_warm, "id long, g long")
        .count()
    )

    transcripts = spark.read.parquet(args.input)
    ckpt_root = tempfile.mkdtemp(prefix="lg_pipe_ck_")
    try:
        t0 = time.monotonic()
        g = build_graph(transcripts, cache=True)
        ctx = GraphContext.build(g, args.partitions, hub_theta=256)
        t1 = time.monotonic()
        run_program(
            ctx,
            PageRankProgram(tol=0.0),  # fixed work at both levels
            max_iter=args.steps,
            ckpt_root=ckpt_root,
            resume=False,
            fixed_iters=args.steps,
        )
        t2 = time.monotonic()
        print(
            json.dumps(
                {
                    "cpus": args.cpus,
                    "vertices": ctx.n_vertices,
                    "edges": ctx.nnz_directed + ctx.nnz_hub,
                    "P": args.partitions,
                    "steps": args.steps,
                    "derive_s": round(t1 - t0, 3),
                    "pagerank_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                }
            )
        )
    finally:
        shutil.rmtree(ckpt_root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
