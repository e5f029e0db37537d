"""Storage-layout scale strategies (SURVEY.md §2 posture notes): bucketing
eliminates the join shuffle; hive-style partitioning prunes the scan.

These are plan-level assertions — the 100 TB claims ("co-located joins via
bucketing", "partition pruning is free if you express the plan
declaratively") verified against the actual physical plan rather than
asserted in prose.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def warehouse(spark):
    d = tempfile.mkdtemp(prefix="lg_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
    for t in ("t_edges_b", "t_verts_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    """Join of two tables bucketed+sorted on the key plans as a sort-merge
    join with ZERO Exchange: the co-location replaces the shuffle — the
    bucketing claim behind the CSR block layout, shown on Spark's own
    bucketed-table path."""
    edges = spark.range(0, 10_000).select(
        (F.col("id") % 512).alias("src"), (F.col("id") * 7 % 997).alias("dst")
    )
    verts = spark.range(0, 512).select(
        F.col("id").alias("src"), F.concat(F.lit("v"), F.col("id")).alias("name")
    )
    for df, name in ((edges, "t_edges_b"), (verts, "t_verts_b")):
        (
            df.write.mode("overwrite")
            .option("path", f"{warehouse}/{name}")
            .bucketBy(8, "src")
            .sortBy("src")
            .saveAsTable(name)
        )
    joined = spark.table("t_edges_b").join(spark.table("t_verts_b"), "src")
    # disable broadcast so the shuffle would be visible if bucketing failed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 10_000  # co-located AND correct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_prunes_scan(spark, warehouse):
    """A filter on the partition column must reach the scan as a partition
    filter (metadata-only pruning): the pruned plan reads strictly fewer
    files — one shard directory of four — instead of full-scan+post-filter."""
    df = spark.range(0, 4_000).select(
        (F.col("id") % 4).cast("string").alias("shard"), F.col("id").alias("v")
    )
    path = f"{warehouse}/part_tbl"
    df.write.mode("overwrite").partitionBy("shard").parquet(path)

    full = spark.read.parquet(path)
    pruned = full.where(F.col("shard") == "2")

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters")[1].split("]")[0]

    def scan_counts(q):
        # drive THIS query execution (an ordinary .count() builds its own
        # execution, leaving these metrics at 0; inputFiles() lists the
        # unpruned relation — both useless for asserting pruning)
        qe = q._jdf.queryExecution()
        qe.toRdd().count()
        m = qe.executedPlan().collectLeaves().apply(0).metrics()
        return m.apply("numFiles").value(), m.apply("numPartitions").value()

    (files_full, parts_full) = scan_counts(full)
    (files_pruned, parts_pruned) = scan_counts(pruned)
    assert parts_full == 4 and parts_pruned == 1  # one shard dir of four
    assert 0 < files_pruned <= files_full / 4
    assert pruned.count() == 1_000


def test_compact_parquet_reduces_files_preserves_rows(spark, warehouse):
    from linkgraph.io import compact_parquet

    src = f"{warehouse}/many"
    dst = f"{warehouse}/compact"
    # 64 tiny files
    spark.range(0, 64_000).repartition(64).write.mode("overwrite").parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*")) == 64
    # pick target_bytes ~ quarter of the dir so n lands small but > 1
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(src)
    total = p.getFileSystem(spark._jsc.hadoopConfiguration()).getContentSummary(p).getLength()
    n = compact_parquet(spark, src, dst, target_bytes=int(total) // 4 + 1)
    files = glob.glob(f"{dst}/part-*")
    assert 1 <= len(files) <= n <= 8
    got = spark.read.parquet(dst)
    assert got.count() == 64_000
    assert got.agg(F.sum("id")).collect()[0][0] == 64_000 * 63_999 // 2


def test_zorder_clusters_both_columns(spark, warehouse):
    """Z-order layout property: per-file min/max ranges are tight in BOTH
    dimensions (what enables two-sided stats skipping), while a plain sort
    on x leaves y full-range in every file.  Row content is preserved."""
    import glob

    from linkgraph.io import zorder_write

    n = 40_000
    df = spark.range(0, n).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 137) % 200).alias("y"),  # decorrelated from x
    )
    zdir = f"{warehouse}/zorder"
    sdir = f"{warehouse}/xsort"
    zorder_write(df, zdir, "x", "y", n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(sdir)

    def file_ranges(d):
        out = []
        for f in sorted(glob.glob(f"{d}/part-*.parquet")):
            p = spark.read.parquet(f).agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")
            ).first()
            out.append((p[1] - p[0], p[3] - p[2]))
        return out

    zr, sr = file_ranges(zdir), file_ranges(sdir)
    assert len(zr) >= 8
    # plain x-sort: y is (near-)full-range in every file
    assert all(ry >= 150 for _rx, ry in sr)
    # z-order: most files are tight in BOTH dimensions
    tight = sum(1 for rx, ry in zr if rx <= 100 and ry <= 100)
    assert tight >= len(zr) * 0.75, zr
    # and the rewrite is lossless
    got = spark.read.parquet(zdir).groupBy("x", "y").count()
    want = df.groupBy("x", "y").count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_bloom_semijoin_plan_broadcasts_filter(spark):
    """The Bloom pre-filter must reach the probe side as BROADCAST hash
    joins (bit set + build side are tiny); a shuffle of the probe table
    into a SortMergeJoin would defeat the whole point at 100 TB."""
    from linkgraph.relational import q_bloom_semijoin

    df = q_bloom_semijoin(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
