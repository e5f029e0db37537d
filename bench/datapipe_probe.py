"""One DATAPIPE scaling-probe run: the MinHash near-duplicate pipeline —
shingles -> 16-seed MinHash signatures -> LSH band bucketing -> candidate
pairs -> exact shingle-Jaccard rerank — at one parallelism level.

Complements bench/scale_probe.py (superstep engine) and
bench/pipeline_probe.py (derive->CSR->PageRank): this probe covers the
LLM-data-pipeline side of the surface, whose shuffles (band-bucket join,
per-doc set aggregation) have a different shape from the graph engine's.

Invoked by bench/run_datapipe_scaling.py once per level (fresh JVM each);
the corpus parquet is synthesized ONCE by the runner and shared, so the
timed region is byte-identical work at both levels.

Prints ONE JSON line:
  {"cpus": N, "docs": D, "pairs": P, "near_dups_s": ..., "total_s": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--input", required=True, help="dir holding documents.parquet")
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from linkgraph.session import get_spark

    spark = get_spark(
        app_name=f"datapipe-probe-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.partitions,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from linkgraph.datapipe import doc_near_dups

    # untimed worker-pool/codegen warm-up (same shape as bench.py)
    def _warm(key, tbl):
        return tbl

    (
        spark.range(0, args.cpus * 4, 1, args.cpus)
        .withColumn("g", F.col("id") % args.cpus)
        .groupBy("g")
        .applyInArrow(_warm, "id long, g long")
        .count()
    )

    n_docs = spark.read.parquet(
        os.path.join(args.input, "documents.parquet")
    ).count()

    t0 = time.monotonic()
    pairs = doc_near_dups(spark, args.input).count()
    t1 = time.monotonic()

    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "docs": n_docs,
                "pairs": pairs,
                "near_dups_s": round(t1 - t0, 3),
                "total_s": round(t1 - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
