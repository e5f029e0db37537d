"""Iceberg-branch smoke under a stub catalog (VERDICT r04 "Next round" #6).

The sandbox has no Iceberg runtime jar and no network, so the
``format("iceberg")`` branch of ``io.load_transcripts`` cannot run for
real.  These tests execute the branch anyway by monkeypatching
``spark.read.format`` to hand back a reader whose ``load(ref)`` returns a
parquet-backed DataFrame shaped like a catalog table would be — wider,
reordered, differently-typed — and assert the branch's projection
enforces the declared transcript schema contract.  This closes the only
in-sandbox-testable surface of SURVEY op 2; the jar-backed path stays
untestable by construction.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from linkgraph.io import TRANSCRIPT_SCHEMA, load_transcripts
from linkgraph.synth import synth_transcripts


class _StubReader:
    """Stands in for spark.read.format('iceberg'): load(ref) resolves the
    'catalog table name' to a pre-registered DataFrame."""

    def __init__(self, tables):
        self._tables = tables

    def load(self, ref):
        return self._tables[ref]


@pytest.fixture()
def stub_iceberg(spark, monkeypatch):
    """Patch spark.read.format so ONLY the 'iceberg' format is stubbed;
    other formats keep the real reader."""
    real_format = type(spark.read).format
    tables = {}

    def fake_format(self, fmt):
        if fmt == "iceberg":
            return _StubReader(tables)
        return real_format(self, fmt)

    monkeypatch.setattr(type(spark.read), "format", fake_format)
    return tables


def test_iceberg_branch_enforces_schema_contract(spark, stub_iceberg):
    """A catalog table with extra columns, shuffled order, and widened
    types comes back as exactly TRANSCRIPT_SCHEMA with values intact."""
    t = synth_transcripts(spark, n_conversations=8, seed=7)
    # what a real warehouse table tends to look like: partition/meta
    # columns appended, column order scrambled, ints widened
    messy = t.select(
        F.col("ts"),
        F.col("tool"),
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("text"),
        F.col("role"),
        F.col("conv_id"),
        F.lit("2026-01-01").alias("_partition_date"),
        F.lit(3).alias("_spec_id"),
    )
    stub_iceberg["warehouse.db.transcripts"] = messy

    got = load_transcripts(spark, "warehouse.db.transcripts", fmt="iceberg")
    assert [f.name for f in got.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    assert [f.dataType for f in got.schema.fields] == [
        f.dataType for f in TRANSCRIPT_SCHEMA.fields
    ]
    # values survive the projection round-trip
    want = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in t.collect()
    }
    have = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in got.collect()
    }
    assert have == want


def test_iceberg_branch_output_feeds_the_engine_like_parquet(
    spark, stub_iceberg
):
    """The branch's output is interchangeable with the parquet path: the
    same downstream derivation (edge keys) produces identical counts."""
    from linkgraph.derive import edge_keys

    t = synth_transcripts(spark, n_conversations=6, seed=13)
    d = tempfile.mkdtemp(prefix="lg_iceberg_stub_")
    pq = os.path.join(d, "t.parquet")
    t.write.mode("overwrite").parquet(pq)
    stub_iceberg["db.t"] = spark.read.parquet(pq)

    via_pq = edge_keys(load_transcripts(spark, pq, fmt="parquet"))
    via_ib = edge_keys(load_transcripts(spark, "db.t", fmt="iceberg"))

    def counts(df):
        return {
            (r["src_key"], r["dst_key"], r["etype"]): r["n"]
            for r in df.groupBy("src_key", "dst_key", "etype")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    assert counts(via_ib) == counts(via_pq)
