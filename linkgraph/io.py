"""Sources and sinks (SURVEY.md §2.1, ops 1-4).

The production input is an Iceberg table of transcript turns
(BASELINE.json input_hint). The sandbox Spark has no Iceberg runtime jar and
no network (SURVEY.md §1.1), so ``load_transcripts`` switches on format:
``iceberg`` goes through ``spark.read.format("iceberg").load(ref)`` (real
cluster with a configured catalog), anything else reads parquet with the
declared schema. Schemas are always DECLARED, never inferred, so sf
variations cannot drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_transcripts(spark: SparkSession, ref: str, fmt: str = "parquet") -> DataFrame:
    """Load the transcript table from an Iceberg catalog table or parquet dir.

    ``fmt="iceberg"``: ``ref`` is a catalog table name (multi-executor
    production path — Iceberg gives file-level pruning on conv_id/ts).
    ``fmt="parquet"``: ``ref`` is a path; the declared schema is enforced.
    """
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(ref)
        # Project to the declared column set/ordering; cast defensively.
        return df.select(
            F.col("conv_id").cast("string"),
            F.col("turn_idx").cast("int"),
            F.col("role").cast("string"),
            F.col("text").cast("string"),
            F.col("tool").cast("string"),
            F.col("ts").cast("timestamp"),
        )
    if fmt == "jsonl":
        # newline-delimited JSON landing logs (the common pre-Iceberg
        # transcript format); declared schema — no sampling inference pass,
        # which at 100 TB would be a full extra scan
        return spark.read.schema(TRANSCRIPT_SCHEMA).json(ref)
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(ref)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-provided testdata parquet (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_partitioned(df: DataFrame, path: str, by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Edge/vertex sink; hash-partitioned layouts come in with a part_id col."""
    w = df.write.mode(mode)
    if by:
        w = w.partitionBy(*by)
    w.parquet(path)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> int:
    """Small-file compaction (op 4 family): rewrite a parquet directory into
    ~``target_bytes`` files.  Streaming sinks and per-superstep checkpoint
    writers emit one file per partition per trigger — at 100 TB that is
    millions of small files, and NameNode/listing pressure plus per-file
    open cost dominate scans long before data volume does; periodic
    compaction is the standard fix.

    File count is derived from the directory's ACTUAL byte size via the
    Hadoop FileSystem API (metadata-only, no data scan).  ``shuffle=False``
    uses coalesce — no shuffle, just fewer write tasks (right for pure
    file-count reduction); ``shuffle=True`` repartitions for even output
    sizes when the input is skewed.  Returns the target file count."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n = max(1, -(-int(total) // int(target_bytes)))  # ceil
    df = spark.read.parquet(in_path)
    out = df.repartition(n) if shuffle else df.coalesce(n)
    out.write.mode("overwrite").parquet(out_path)
    return n


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Z-order (Morton-curve) file clustering on TWO columns — the
    multi-dimensional layout trick behind Delta/Iceberg ``OPTIMIZE
    ZORDER``, expressed with stock Spark: min/max-scale each column to
    ``bits``-bit space (1-row bounds broadcast, metadata-cheap), interleave
    the bits JVM-side into a single z-value, range-partition on it, and
    sort within files.  Every written file is then tight in BOTH columns'
    min/max stats, so any stats-aware reader (parquet row-group pruning,
    Iceberg/Delta file skipping) prunes on EITHER predicate — a plain sort
    clusters one column and leaves the other full-range in every file.
    Linear min/max scaling keeps the map a pure column expr; heavily
    skewed columns would use rank buckets instead (same interleave).  The
    ``_z`` column is persisted alongside the data (harmless, and keeps the
    in-file ordering self-describing)."""
    bounds = df.agg(
        F.min(col_a).alias("_la"), F.max(col_a).alias("_ha"),
        F.min(col_b).alias("_lb"), F.max(col_b).alias("_hb"),
    )
    top = (1 << bits) - 1

    def scale(c, lo, hi):
        rng = F.when(F.col(hi) > F.col(lo), F.col(hi) - F.col(lo)).otherwise(F.lit(1))
        return ((F.col(c) - F.col(lo)) * top / rng).cast("long")

    z = F.lit(0).cast("long")
    withb = df.crossJoin(F.broadcast(bounds))
    sa, sb = scale(col_a, "_la", "_ha"), scale(col_b, "_lb", "_hb")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(sa, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(sb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    (
        withb.withColumn("_z", z)
        .drop("_la", "_ha", "_lb", "_hb")
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_sink_as_of(
    spark: SparkSession, out_dir: str, batch_id: int | None = None
) -> DataFrame:
    """Snapshot ("time travel") read of a streaming parquet file sink.

    The exactly-once file sink (streaming.ingest_to_parquet) commits each
    micro-batch by appending ``_spark_metadata/<batchId>`` — a JSON-lines
    manifest (v1: one version line, then one ``{"path": ..., "action":
    "add"}`` per file).  Reading the DIRECTORY therefore sees whatever the
    log says is committed; reading AS OF batch ``batch_id`` means taking
    the union of files in manifests 0..batch_id — snapshot isolation over
    the append log, the same mental model as Iceberg snapshot reads, built
    from the sink's own transaction log.  ``batch_id=None`` reads the
    newest committed snapshot.  Compacted manifests (``<id>.compact``)
    hold the full file list up to that id and are handled transparently.

    Scale note: the manifest scan is driver-side metadata only (one small
    JSON file per micro-batch); the data read is an explicit file list, so
    partition pruning and row-group pushdown behave exactly as a plain
    parquet read."""
    import json as _json

    meta = os.path.join(out_dir, "_spark_metadata")
    entries = []
    for name in os.listdir(meta):
        base = name.split(".")[0]
        if not base.isdigit():
            continue
        entries.append((int(base), name.endswith(".compact"), name))
    if not entries:
        raise FileNotFoundError(f"no committed batches under {meta}")
    max_committed = max(b for b, _c, _n in entries)
    if batch_id is None:
        batch_id = max_committed
    if batch_id > max_committed:
        raise ValueError(
            f"batch {batch_id} not committed yet (newest: {max_committed})"
        )
    # newest compact manifest at or below batch_id carries everything
    # before it; plain manifests after it add the rest
    compacts = [b for b, c, _n in entries if c and b <= batch_id]
    start_after = max(compacts) if compacts else -1
    files: list[str] = []
    for b, c, name in sorted(entries):
        if b > batch_id:
            continue
        if (c and b == start_after) or (not c and b > start_after):
            with open(os.path.join(meta, name)) as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("v"):
                        continue
                    rec = _json.loads(line)
                    if rec.get("action", "add") == "add":
                        files.append(rec["path"])
    if not files:
        return spark.read.parquet(out_dir).limit(0)
    return spark.read.parquet(*files)
