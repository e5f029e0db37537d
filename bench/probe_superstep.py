"""Diagnostic probe (guide §1): superstep plan shape + job/stage counts.

Builds the bench graph at a configurable sf, runs one PageRank superstep,
prints .explain("formatted") of the superstep output and the job/stage
counts the loop actually dispatches (with and without durable checkpoints).
NOT part of the frozen bench surface.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile
import time

sf = float(os.environ.get("PROBE_SF", "0.1"))
cpus = int(os.environ.get("PROBE_CPUS", "32"))
P = 32

from linkgraph.session import get_spark

spark = get_spark(app_name="probe", master=f"local[{cpus}]", shuffle_partitions=P)
spark.sparkContext.setLogLevel("ERROR")

from linkgraph.derive import build_graph
from linkgraph.pregel import GraphContext, PageRankProgram, run_program
from linkgraph.synth import synth_transcripts

n_conv = max(50, int(280_000 * sf))
ck = tempfile.mkdtemp(prefix="probe_ck_")
tdir = ck + "/transcripts"
synth_transcripts(spark, n_conversations=n_conv, seed=42, n_agents=200,
                  unique_users=True).write.mode("overwrite").parquet(tdir)
transcripts = spark.read.parquet(tdir)

g = build_graph(transcripts, cache=True)
ctx = GraphContext.build(g, P, hub_theta=256)

st = spark.sparkContext.statusTracker()


def job_count():
    return len(st.getJobIdsForGroup(None) or [])


def run_steps(tag, ckpt_root, steps=3):
    spark.sparkContext.setJobDescription(f"probe:{tag}")
    j0 = job_count()
    t0 = time.monotonic()
    run_program(ctx, PageRankProgram(tol=0.0), max_iter=steps,
                ckpt_root=ckpt_root, resume=False)
    wall = time.monotonic() - t0
    print(f"[{tag}] steps={steps} wall={wall:.2f}s per_step={wall/steps:.3f}s "
          f"jobs={job_count()-j0}")


# plan of one superstep (before materialization)
prog = PageRankProgram(tol=0.0)
state = prog.init_state(ctx).repartition(P, "part_id").localCheckpoint()
ns = prog.superstep(ctx, state).select(*prog.state_cols).repartition(P, "part_id")
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    ns.explain("formatted")
plan = buf.getvalue()
print(plan)
print("Exchange count:", plan.count("Exchange"))
print("Arrow/python nodes:",
      sum(plan.count(k) for k in ("FlatMapCoGroupsInArrow", "ArrowEval", "BatchEval", "MapInArrow")))

run_steps("warm", None, 2)
run_steps("no_ckpt", None, 5)
run_steps("ckpt", ck + "/pr", 5)
spark.stop()
