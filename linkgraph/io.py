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
