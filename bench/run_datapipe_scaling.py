"""Datapipe scaling evidence: MinHash near-dup dedup at two parallelism
levels (local[2] as "N executors", local[8] as "4N") on the SAME corpus,
fresh JVM per level.

    efficiency = (total_2 / total_8) / 4        (binding target >= 0.8)

Corpus: the sf0.1 documents table replicated ``--reps`` times with a
replica-unique token interleaved every 4th word (so cross-replica shingle
sets are disjoint and the LSH candidate volume stays linear), EXCEPT every
100th base doc, whose replicas keep the original text verbatim — planting
a controlled block of true near-duplicate clusters so the exact-rerank
stage has real work at every level.  Deterministic; written to parquet
once and shared by both levels.

Writes BENCH/scaling_datapipe.md.

Usage: python bench/run_datapipe_scaling.py [--reps 8] [--sf-dir .../sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(cpus: int, input_dir: str) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "bench", "datapipe_probe.py"),
        "--cpus", str(cpus),
        "--input", input_dir,
    ]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"datapipe probe cpus={cpus} failed")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def synthesize(sf_dir: str, reps: int, out_dir: str) -> int:
    """Replicate documents deterministically; returns doc count."""
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="datapipe-corpus-synth",
        master="local[8]",
        shuffle_partitions=16,
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    offset = 10_000_000
    parts = []
    for r in range(reps):
        if r == 0:
            parts.append(d)
            continue
        # interleave a replica-unique token every 4th word so 3-gram
        # shingle sets are disjoint across replicas ...
        perturbed = F.concat_ws(
            " ",
            F.flatten(
                F.transform(
                    F.split(F.lower(F.trim("text")), " "),
                    lambda w, i: F.when(
                        i % 4 == 3,
                        F.array(w, F.concat(F.lit(f"r{r}x"), (i / 4).cast("int").cast("string"))),
                    ).otherwise(F.array(w)),
                )
            ),
        )
        parts.append(
            d.select(
                (F.col("doc_id") + r * offset).alias("doc_id"),
                # ... EXCEPT every 100th base doc: verbatim copy -> a
                # planted true near-dup cluster of size `reps`
                F.when(F.col("doc_id") % 100 == 0, F.col("text"))
                .otherwise(perturbed)
                .alias("text"),
            )
        )
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    n = full.count()
    full.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    spark.stop()
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--levels", default="2,8")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    work = tempfile.mkdtemp(prefix="lg_datapipe_scale_")
    n = synthesize(args.sf_dir, args.reps, work)
    print(f"[corpus] {n} docs at {work}", flush=True)

    r_hi = probe(hi, work)
    print(f"[probe] {hi} cores: {r_hi}", flush=True)
    r_lo = probe(lo, work)
    print(f"[probe] {lo} cores: {r_lo}", flush=True)

    assert r_lo["pairs"] == r_hi["pairs"], "level results diverge"
    factor = hi / lo
    eff = (r_lo["total_s"] / r_hi["total_s"]) / factor
    loadavg = os.getloadavg()

    md = f"""# Datapipe (MinHash near-dup) scaling: local[{lo}] -> local[{hi}]

Same corpus ({n} docs = sf0.1 documents x {args.reps} replicas, planted
near-dup clusters on every 100th base doc), fresh JVM per level, fixed 32
shuffle partitions.  Timed region: shingles -> 16-seed MinHash -> LSH band
bucket join -> exact Jaccard rerank (`datapipe.doc_near_dups`).

| cores | wall (s) | pairs |
|---|---|---|
| {lo} | {r_lo['total_s']} | {r_lo['pairs']} |
| {hi} | {r_hi['total_s']} | {r_hi['pairs']} |

**speedup {lo}->{hi}: {r_lo['total_s'] / r_hi['total_s']:.2f}x over a {factor:.0f}x
core factor -> scaling efficiency {eff:.3f}** (binding target >= 0.8).

Loadavg at capture: {loadavg[0]:.2f} / {loadavg[1]:.2f} / {loadavg[2]:.2f}.
"""
    out = os.path.join(REPO, "BENCH", "scaling_datapipe.md")
    with open(out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
