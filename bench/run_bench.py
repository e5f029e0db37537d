"""Scaling-evidence harness (BASELINE.md protocol; M9).

Runs the identical PageRank job (same deterministic input, same P, same
checkpointing) at two parallelism levels — local[8] as "N executors" and
local[32] as "4N executors" (task-brief sandbox substitute for two cluster
sizes) — in separate JVMs via spark-submit-compatible subprocesses, then
reports per-superstep medians and

    efficiency = (throughput_32 / throughput_8) / 4        (target >= 0.8)

and rewrites the measured-numbers section of BENCH/BASELINE.md.

Usage: python bench/run_bench.py [--edges 20000000] [--vertices 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(cpus: int, edges: int, vertices: int, steps: int, no_ckpt: bool) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "bench", "scale_probe.py"),
        "--cpus", str(cpus),
        "--edges", str(edges),
        "--vertices", str(vertices),
        "--steps", str(steps),
    ]
    if no_ckpt:
        cmd.append("--no-ckpt")
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"probe cpus={cpus} failed")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def summarize(r: dict, warmup: int = 2) -> dict:
    walls = r["step_walls"][warmup:]
    med = statistics.median(walls)
    return {
        **r,
        "median_step_s": round(med, 3),
        "supersteps_per_sec": round(1.0 / med, 4),
        "edges_scattered_per_sec": round(r["edges"] / med, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--no-ckpt", action="store_true")
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()

    lo_n, hi_n = args.levels
    lo = summarize(probe(lo_n, args.edges, args.vertices, args.steps, args.no_ckpt))
    hi = summarize(probe(hi_n, args.edges, args.vertices, args.steps, args.no_ckpt))
    factor = hi_n / lo_n
    eff = (hi["edges_scattered_per_sec"] / lo["edges_scattered_per_sec"]) / factor

    result = {
        "metric": "pagerank_scaling_efficiency",
        "value": round(eff, 3),
        "target": 0.8,
        "levels": {str(lo_n): lo, str(hi_n): hi},
        "protocol": f"same job/input/P at local[{lo_n}] vs local[{hi_n}]; "
        f"median superstep wall of steps {3}..{args.steps} (first 2 warm-up)",
    }
    print(json.dumps(result))

    md = f"""
## Measured scaling evidence (bench/run_bench.py)

Same deterministic PageRank job (power-law graph seed 42, V={args.vertices:,},
E={lo['edges']:,} after dedup, P={lo['P']}, hub-split theta=4096,
checkpoints {'OFF' if args.no_ckpt else 'ON (durable, per-superstep)'}) at two
parallelism levels; median superstep wall over steps 3..{args.steps}:

| level | median superstep (s) | supersteps/sec | edges-scattered/sec |
|---|---|---|---|
| local[{lo_n}] ("N executors") | {lo['median_step_s']} | {lo['supersteps_per_sec']} | {lo['edges_scattered_per_sec']:,.0f} |
| local[{hi_n}] ("4N executors") | {hi['median_step_s']} | {hi['supersteps_per_sec']} | {hi['edges_scattered_per_sec']:,.0f} |

**Scaling efficiency ({lo_n} -> {hi_n} cores) = (thru_{hi_n}/thru_{lo_n})/{factor:.0f} =
{eff:.3f}** (target >= 0.8).
"""
    # raw per-run output; the curated BENCH/BASELINE.md is maintained by
    # hand from these (it aggregates multiple level pairs + analysis).
    path = os.path.join(REPO, "BENCH", f"scaling_{lo_n}_{hi_n}.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(md.lstrip())
    sys.stderr.write(f"wrote {path}\n")


if __name__ == "__main__":
    main()
