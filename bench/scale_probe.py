"""One scaling-probe run: PageRank supersteps on a dense power-law graph.

Invoked by bench/run_bench.py once per parallelism level (fresh JVM per
level — Spark cannot change master in-process).  Prints ONE JSON line:
  {"cpus": N, "edges": nnz, "vertices": V, "step_walls": [...],
   "build_s": ..., "ckpt": bool}

The job is the north-rule production configuration: CSR gather-scatter,
hub-split at theta, durable per-superstep checkpoints.  Fixed superstep
count (convergence is a correctness concern, measured elsewhere) so both
levels do identical work on the identical deterministic input (seed 42).
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
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--no-ckpt", action="store_true")
    args = ap.parse_args()

    from linkgraph.session import get_spark

    spark = get_spark(
        app_name=f"scale-probe-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.partitions,
        # Sized to hold the CSR block caches (~30B/edge directed+undirected)
        # with headroom, but NOT the full host: oversized heaps made young
        # collections and first-touch page faults the dominant superstep-
        # wall noise source before the G1 region/pretouch pins.
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from linkgraph.pregel import GraphContext, PageRankProgram, run_program
    from linkgraph.synth import graph_from_edges, synth_power_edges

    t0 = time.monotonic()
    edges = synth_power_edges(spark, args.vertices, args.edges, seed=42)
    g = graph_from_edges(edges, args.vertices)
    ctx = GraphContext.build(g, args.partitions, hub_theta=4096)
    build_s = time.monotonic() - t0

    ckpt_root = None if args.no_ckpt else tempfile.mkdtemp(prefix="lg_probe_ck_")
    try:
        res = run_program(
            ctx,
            PageRankProgram(tol=0.0),  # never converges early: fixed work
            max_iter=args.steps,
            ckpt_root=ckpt_root,
            resume=False,
        )
        print(
            json.dumps(
                {
                    "cpus": args.cpus,
                    "vertices": ctx.n_vertices,
                    "edges": ctx.nnz_directed + ctx.nnz_hub,
                    "hub_edges": ctx.nnz_hub,
                    "P": args.partitions,
                    "build_s": round(build_s, 2),
                    "ckpt": ckpt_root is not None,
                    "step_walls": [round(h["wall_s"], 3) for h in res.stats_history],
                }
            )
        )
    finally:
        if ckpt_root:
            shutil.rmtree(ckpt_root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
