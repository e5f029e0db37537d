"""Multimodal (binary) column operators over the documents table.

The 100 TB posture for image/audio/video payloads (SURVEY.md §2.9 side
note; HOOVER-style pipelines attach media to transcript turns): media is an
OPAQUE ``binary`` column with typed metadata alongside, and every media op
is an Arrow-batched pass (``mapInPandas``) that never shuffles the payload
— decode/feature-extract happen where the bytes already live, only the
(tiny) extracted metadata ever moves.

This sandbox has no media codecs (no PIL/ffmpeg) and the driver testdata
has no real media bytes, so the payloads are synthesized DETERMINISTICALLY
from ``documents.text`` (UTF-8 bytes as the blob) and the decode step is a
STUB with the real codec behind an import-try: the Spark-side plumbing —
binary schema, Arrow batch shapes, iterator-of-batches UDF, partition
preservation, bounded frame explode — is real and oracle-checked, while
``_decode_payload`` is the single clearly-marked seam where PIL/ffmpeg
would plug in.

Oracle story (the reason payloads are text-derived): DuckDB computes the
same md5 over the same UTF-8 bytes, so even the Python-side decode row is a
full rows+schema+hash gate row, not a rows-only one.

Ops:
- ``media_table``     — documents -> (doc_id, mime, payload binary, n_bytes)
- ``media_stats``     — per-mime payload accounting (pure built-ins)
- ``media_decode``    — mapInPandas stub-decode: fingerprint + fake
                        width/height/frame-count derived from the payload
                        md5 (codec seam)
- ``media_frames``    — bounded frame sampling for videos (sequence +
                        explode, no UDF)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table

# mime assignment is doc_id mod 3 — deterministic, oracle-mirrorable
_MIMES = ("image/png", "audio/wav", "video/mp4")

try:  # the real-codec seam: absent in this container, stub path taken
    from PIL import Image  # noqa: F401

    _HAVE_CODEC = True
except ImportError:
    _HAVE_CODEC = False


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> opaque binary payloads with typed metadata.

    Payload bytes are the UTF-8 encoding of ``text`` (deterministic fake
    media); at production scale this column is the raw image/audio/video
    blob read from parquet binary columns and everything downstream is
    unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in _MIMES]),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ).alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mime payload accounting — narrow columnar aggregate, no UDF."""
    return (
        media_table(spark, sf_dir)
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 3).alias("avg_bytes"),
        )
    )


SQL_MEDIA_STATS = """
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS mime,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT mime, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(n_bytes), 3) AS avg_bytes
FROM m GROUP BY mime
"""


def _decode_payload(payload: bytes, mime: str) -> tuple[str, int, int, int]:
    """STUB decode — the codec seam.

    A real deployment decodes here (PIL for images, ffmpeg/soundfile for
    audio/video) inside the same Arrow batch loop.  The stub derives
    deterministic fake dimensions from the payload md5 so the output is
    (a) stable, (b) reproducible by the DuckDB oracle, (c) actually a
    function of the bytes — a broken payload column changes the result."""
    if _HAVE_CODEC and mime == "image/png":  # pragma: no cover (no PIL here)
        raise NotImplementedError("real codec path exercised only outside sandbox")
    fp = hashlib.md5(payload).hexdigest()
    width = 16 + int(fp[0:4], 16) % 2048
    height = 16 + int(fp[4:8], 16) % 2048
    n_frames = 1 if mime == "image/png" else 1 + int(fp[8:12], 16) % 120
    return fp, width, height, n_frames


def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pass: binary in, typed metadata out.

    ``mapInPandas`` (iterator of pandas batches) — the payload column never
    shuffles; each task decodes its own partition's blobs and emits only
    the small metadata frame."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _decode_payload(p, m)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                    "fp": [t[0] for t in meta],
                    "width": pd.Series([t[1] for t in meta], dtype="int32"),
                    "height": pd.Series([t[2] for t in meta], dtype="int32"),
                    "n_frames": pd.Series([t[3] for t in meta], dtype="int32"),
                }
            )

    return media_table(spark, sf_dir).mapInPandas(
        decode,
        "doc_id long, mime string, n_bytes long, fp string, "
        "width int, height int, n_frames int",
    )


SQL_MEDIA_DECODE = """
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS mime,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS fp
  FROM documents
)
SELECT doc_id, mime, n_bytes, fp,
       CAST(16 + CAST(('0x' || substr(fp, 1, 4)) AS INTEGER) % 2048 AS INTEGER) AS width,
       CAST(16 + CAST(('0x' || substr(fp, 5, 4)) AS INTEGER) % 2048 AS INTEGER) AS height,
       CAST(CASE WHEN mime = 'image/png' THEN 1
                 ELSE 1 + CAST(('0x' || substr(fp, 9, 4)) AS INTEGER) % 120
            END AS INTEGER) AS n_frames
FROM m
"""

_FRAME_STEP = 7  # sample every 7th frame, capped — explode stays bounded


def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded frame sampling for video payloads (no UDF: the frame-index
    explode is sequence + explode on the decoded metadata, so the payload
    itself is touched exactly once, in media_decode)."""
    dec = media_decode(spark, sf_dir).where(F.col("mime") == "video/mp4")
    return dec.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(_FRAME_STEP))
        ).alias("frame_idx"),
    )


SQL_MEDIA_FRAMES = f"""
WITH m AS (
  SELECT doc_id, md5(text) AS fp
  FROM documents WHERE doc_id % 3 = 2
), n AS (
  SELECT doc_id,
         1 + CAST(('0x' || substr(fp, 9, 4)) AS INTEGER) % 120 AS n_frames
  FROM m
)
SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, {_FRAME_STEP})) AS BIGINT) AS frame_idx
FROM n
"""


def registry():
    """name -> (spark_fn, duckdb_oracle_sql) for the driver contract."""
    return {
        "media_stats": (media_stats, SQL_MEDIA_STATS),
        "media_decode": (media_decode, SQL_MEDIA_DECODE),
        "media_frames": (media_frames, SQL_MEDIA_FRAMES),
    }
