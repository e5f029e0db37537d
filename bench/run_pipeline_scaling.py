"""Pipeline scaling evidence: the full transcript->derive->CSR->PageRank
path at two parallelism levels (local[2] as "N executors", local[8] as
"4N") on the SAME parquet input, fresh JVM per level.

    efficiency = (total_2 / total_8) / 4        (binding target >= 0.8)

Writes BENCH/scaling_pipeline.md.  The input tier is sized so parallel work
dominates the fixed per-job scheduling floor at BOTH levels (BASELINE.md
"fixed superstep floor"); low core counts keep both levels free of the
one-box memory-bus saturation that makes 8->32 probes measure host
contention instead of the plan (BASELINE.md findings).

Usage: python bench/run_pipeline_scaling.py [--conversations 280000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(cpus: int, input_dir: str, steps: int) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "bench", "pipeline_probe.py"),
        "--cpus", str(cpus),
        "--input", input_dir,
        "--steps", str(steps),
    ]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"pipeline probe cpus={cpus} failed")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def synth_input(n_conversations: int, out_dir: str) -> None:
    """Synthesize the transcript tier once (its own JVM, untimed)."""
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from linkgraph.session import get_spark
from linkgraph.synth import synth_transcripts
spark = get_spark(app_name="pipe-synth", master="local[32]", shuffle_partitions=32,
                  extra_conf={{"spark.driver.memory": "24g"}})
spark.sparkContext.setLogLevel("ERROR")
synth_transcripts(spark, n_conversations={n_conversations}, seed=42,
                  n_agents=200, unique_users=True
                  ).write.mode("overwrite").parquet({out_dir!r})
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError("input synthesis failed")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conversations", type=int, default=280_000)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    args = ap.parse_args()

    tdir = tempfile.mkdtemp(prefix="lg_pipe_input_")
    try:
        print(f"synthesizing {args.conversations} conversations -> {tdir}", flush=True)
        synth_input(args.conversations, tdir)

        lo = probe(args.low, tdir, args.steps)
        print(json.dumps(lo), flush=True)
        hi = probe(args.high, tdir, args.steps)
        print(json.dumps(hi), flush=True)

        ratio = lo["total_s"] / hi["total_s"]
        eff = ratio / (args.high / args.low)
        md = f"""## Pipeline scaling evidence (bench/run_pipeline_scaling.py)

Full production path — transcript parquet scan -> derive (stable ordering,
edge finalize, distributed dense vids) -> CSR block build -> {args.steps}
PageRank supersteps with durable per-superstep checkpoints — run at two
parallelism levels on the IDENTICAL parquet input
({args.conversations:,} conversations, seed 42; V={hi['vertices']:,},
E={hi['edges']:,}, P={hi['P']}), fresh JVM per level:

| level | derive+CSR (s) | pagerank (s) | total (s) |
|---|---|---|---|
| local[{args.low}] ("N executors") | {lo['derive_s']} | {lo['pagerank_s']} | {lo['total_s']} |
| local[{args.high}] ("4N executors") | {hi['derive_s']} | {hi['pagerank_s']} | {hi['total_s']} |

**Pipeline scaling efficiency ({args.low} -> {args.high} cores) =
(total_{args.low} / total_{args.high}) / {args.high // args.low} =
{eff:.3f}** (binding target >= 0.8).

Protocol notes: identical input bytes and identical plans at both levels
(P fixed at {hi['P']}); the only variable is executor-thread count —
the sandbox substitute for N vs 4N executors (BASELINE.md).  This probe
covers the binding claim on the production pipeline end to end; the
superstep-engine-only probe at 31.6M edges lives in BENCH/scaling_2_8.md.
"""
        out_path = os.path.join(REPO, "BENCH", "scaling_pipeline.md")
        with open(out_path, "w") as f:
            f.write(md)
        print(md)
        print(f"wrote {out_path}")
    finally:
        import shutil

        shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
