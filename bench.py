"""Driver bench: headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line to stdout:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "pagerank_supersteps_per_sec": ..., "edges_scattered_per_sec": ...,
   "graph": {...}}

Environment:
  SPARK_GRAFT_SF_DIR  input tier dir (default /root/testdata/sf0.1);
                      the transcript graph is synthesized deterministically
                      at the matching scale (seed 42, FIXTURES.md) — the
                      testdata tables feed the relational queries.
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32).

The graph benchmark measures the production configuration: CSR blocks +
cogrouped gather-scatter with hub-split, per-superstep durable checkpoints
with lineage + metrics (the north-rule execution mode), PageRank run to
L-inf < 1e-6 convergence.  Scaling evidence (local[8] vs local[32]) lives in
bench/run_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# conversations per unit sf: ~21.4 turns/conv -> sf0.1 ~= 600k turns,
# matching the sf0.1 testdata tier (lineitem ~600k rows).
CONVS_PER_SF = 280_000
HUB_THETA = 256
P = 32


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from linkgraph.session import get_spark

    spark = get_spark(app_name="linkgraph-bench", master=f"local[{cpus}]", shuffle_partitions=P)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from linkgraph.derive import build_graph
    from linkgraph.pregel import (
        ComponentsProgram,
        GraphContext,
        LabelPropProgram,
        PageRankProgram,
        run_program,
    )
    from linkgraph.relational import q_agg_pricing, q_join_region_revenue
    from linkgraph.synth import synth_transcripts
    from linkgraph.triangles import count_triangles

    timings: dict[str, float] = {}
    extra: dict[str, object] = {}

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    n_conv = max(50, int(CONVS_PER_SF * sf))
    ckpt_root = tempfile.mkdtemp(prefix="lg_bench_ck_")

    # Steady-state warm-up (NOT timed): one P-partition Arrow-UDF job +
    # shuffle pre-forks the Python worker pool, compiles the codegen paths,
    # and faults in the pre-touched heap.  A production cluster pays these
    # once per executor lifetime, not per query, so the timed numbers below
    # measure per-query cost; documented in BENCH/BASELINE.md.
    def _warm(key, tbl):
        return tbl

    (
        spark.range(0, cpus * 4, 1, cpus)
        .withColumn("g", F.col("id") % cpus)
        .groupBy("g")
        .applyInArrow(_warm, "id long, g long")
        .count()
    )

    try:
        # -- graph pipeline ------------------------------------------------
        # The synthesized transcripts are materialized to parquet ONCE
        # (untimed setup): the north-rule input is an Iceberg/parquet TABLE,
        # so derive_and_csr must measure the engine reading a columnar scan —
        # not the sandbox artifact of re-serializing a driver-side pandas
        # frame into every job that touches the input (synth.py caveat;
        # BASELINE.md "input materialization").
        tdir = ckpt_root + "/transcripts"
        synth_transcripts(
            spark, n_conversations=n_conv, seed=42, n_agents=200, unique_users=True
        ).write.mode("overwrite").parquet(tdir)
        transcripts = spark.read.parquet(tdir)

        def _derive():
            g = build_graph(transcripts, cache=True)
            ctx = GraphContext.build(g, P, hub_theta=HUB_THETA)
            return g, ctx

        g, ctx = timed("derive_and_csr", _derive)
        nnz = ctx.nnz_directed + ctx.nnz_hub
        extra["graph"] = {
            "n_conversations": n_conv,
            "vertices": ctx.n_vertices,
            "edges": nnz,
            "edges_undirected": ctx.nnz_undirected,
            "hub_edges": ctx.nnz_hub,
            "P": P,
        }

        pr = timed(
            "pagerank",
            lambda: run_program(
                ctx, PageRankProgram(tol=1e-6), max_iter=100, ckpt_root=ckpt_root
            ),
        )
        extra["pagerank_supersteps"] = pr.supersteps
        extra["pagerank_converged"] = pr.converged
        extra["pagerank_supersteps_per_sec"] = round(pr.supersteps / timings["pagerank"], 4)
        extra["edges_scattered_per_sec"] = round(nnz * pr.supersteps / timings["pagerank"], 1)

        cc = timed(
            "components",
            lambda: run_program(ctx, ComponentsProgram(), max_iter=50, ckpt_root=ckpt_root),
        )
        extra["components_supersteps"] = cc.supersteps

        # fixed 10 supersteps: sync-LPA tie trajectories depend on the vid
        # numbering, so convergence-step counts drift across id-assignment
        # schemes; pinning the iteration count keeps round-over-round walls
        # comparing identical work.
        lp = timed(
            "labelprop",
            lambda: run_program(
                ctx, LabelPropProgram(), max_iter=10, ckpt_root=ckpt_root, fixed_iters=10
            ),
        )
        extra["labelprop_supersteps"] = lp.supersteps

        tri = timed("triangles", lambda: count_triangles(g))
        extra["triangles_total"] = tri.total
        tri.unpersist()
        ctx.unpersist()

        # -- relational coverage on the driver tables ----------------------
        timed("rel_agg_pricing", lambda: q_agg_pricing(spark, sf_dir).collect())
        timed("rel_join_region", lambda: q_join_region_revenue(spark, sf_dir).collect())

        total = round(sum(timings.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "linkgraph_bench_total",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "cpus": cpus,
                    **extra,
                }
            )
        )
    finally:
        shutil.rmtree(ckpt_root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
