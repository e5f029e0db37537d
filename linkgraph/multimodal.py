"""Multimodal (binary) column operators over the documents table.

The 100 TB posture for image/audio/video payloads (SURVEY.md §2.9 side
note; HOOVER-style pipelines attach media to transcript turns): media is an
OPAQUE ``binary`` column with typed metadata alongside, and every media op
is an Arrow-batched pass (``mapInPandas``) that never shuffles the payload
— decode/feature-extract happen where the bytes already live, only the
(tiny) extracted metadata ever moves.

The driver testdata has no real media bytes, so ``media_table`` synthesizes
SPEC-COMPLIANT containers deterministically from ``documents.text``:

- ``image/bmp``  — a valid 8-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER +
                   256-entry grayscale palette) whose single pixel row is the
                   UTF-8 text bytes (rows 4-byte padded per spec).
- ``audio/wav``  — a valid RIFF/WAVE file (PCM fmt chunk, 8-bit mono, data
                   chunk = the text bytes, RIFF even-padding honoured).
- ``video/avi``  — a valid RIFF/AVI skeleton (LIST hdrl → avih main header,
                   LIST movi → one '00db' frame whose payload is the text).
- ``image/png`` — a valid compressed PNG (signature + IHDR + zlib IDAT +
                   IEND, per-chunk CRC32s) whose 8-bit grayscale pixel row
                   is the UTF-8 text bytes.  The IDAT stream uses zlib
                   stored blocks (level 0) so the container size stays
                   analytically derivable for the DuckDB oracle — it is
                   still a spec-compliant DEFLATE stream that any inflater
                   (including ours) decompresses.

``media_decode`` then REALLY decodes: it walks the BMP header fields, the
RIFF chunk list (fmt /data), the AVI LIST tree (avih/movi), and the PNG
chunk sequence (CRC-checked, zlib-inflated, scanlines un-filtered for all
five PNG filter types) byte-for-byte — width/height/frame-count/sample-rate
come out of the binary structures, not out of a formula (the formulas live
only in the synthesizer and the DuckDB oracle).  A corrupted header, a bad
chunk CRC, or a broken payload column fails the decode.  The content
fingerprint is md5 over the DECODED media data (pixel row / PCM samples /
frame bytes) = md5 of the text bytes, which is what keeps the DuckDB oracle
a full rows+schema+hash gate.

Codec-library formats (JPEG/MP4) still need PIL/ffmpeg; that seam is
``_HAVE_CODEC`` — absent in this container, the pure-Python container
parsers above (incl. the zlib-inflate PNG path) are the real, exercised
code.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table

# mime assignment is doc_id mod 4 — deterministic, oracle-mirrorable
_MIMES = ("image/bmp", "audio/wav", "video/avi", "image/png")

try:  # codec seam for COMPRESSED formats (PNG/JPEG/MP4); absent in sandbox
    from PIL import Image  # noqa: F401

    _HAVE_CODEC = True
except ImportError:
    _HAVE_CODEC = False

# deterministic synthesis parameters (mirrored in the oracle SQL)
_WAV_RATES = 8  # sample_rate = 8000 + 1000 * (doc_id % 8)
_AVI_USEC_PER_FRAME = 40_000  # 25 fps -> duration_ms = n_frames * 40

_BMP_PALETTE = b"".join(bytes((i, i, i, 0)) for i in range(256))  # grayscale


def _bmp_encode(data: bytes) -> bytes:
    """Valid 8-bpp BMP: one pixel row = ``data`` (width=len, height=1)."""
    n = len(data)
    pad = (-n) % 4  # BMP rows are 4-byte aligned
    row = data + b"\x00" * pad
    off = 14 + 40 + len(_BMP_PALETTE)
    file_header = b"BM" + struct.pack("<IHHI", off + len(row), 0, 0, off)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, n, 1, 1, 8, 0, len(row), 2835, 2835, 256, 0
    )
    return file_header + info_header + _BMP_PALETTE + row


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    """RIFF chunk: tag + LE size + body + even-pad byte (per spec)."""
    return tag + struct.pack("<I", len(body)) + body + b"\x00" * (len(body) % 2)


def _wav_encode(data: bytes, sample_rate: int) -> bytes:
    """Valid RIFF/WAVE, PCM 8-bit mono, data chunk = ``data``."""
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = b"WAVE" + _riff_chunk(b"fmt ", fmt) + _riff_chunk(b"data", data)
    return _riff_chunk(b"RIFF", body)


def _avi_encode(data: bytes, width: int, height: int, n_frames: int) -> bytes:
    """Valid RIFF/AVI skeleton: hdrl(avih) + movi(one 00db frame)."""
    avih = struct.pack(
        "<14I", _AVI_USEC_PER_FRAME, 0, 0, 0, n_frames, 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih))
    movi = _riff_chunk(b"LIST", b"movi" + _riff_chunk(b"00db", data))
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    """PNG chunk: BE length + tag + body + CRC32(tag+body)."""
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _deflate_stored(raw: bytes) -> bytes:
    """zlib stream of DEFLATE *stored* blocks (max 65535 bytes each), built
    explicitly so the block segmentation — and therefore the container size
    formula in the oracle — is spec-pinned rather than inherited from a
    particular zlib build's internal buffer sizes.  Any inflater (including
    ``zlib.decompress``) reads it; size = 2 + 5*ceil(m/65535) + m + 4."""
    out = bytearray(b"\x78\x01")  # CMF/FLG: 32K window, fastest, check ok
    nblk = max(1, (len(raw) + 65534) // 65535)
    for i in range(nblk):
        chunk = raw[i * 65535 : (i + 1) * 65535]
        final = 1 if i == nblk - 1 else 0
        out += bytes([final]) + struct.pack("<HH", len(chunk), 0xFFFF ^ len(chunk))
        out += chunk
    out += struct.pack(">I", zlib.adler32(raw) & 0xFFFFFFFF)
    return bytes(out)


def _png_encode(rows: list[bytes]) -> bytes:
    """Valid 8-bit grayscale PNG: one scanline per entry of ``rows`` (all
    equal width), filter type 0, IDAT = explicit DEFLATE stored blocks
    (spec-compliant stream with an oracle-derivable size)."""
    width, height = len(rows[0]), len(rows)
    ihdr = struct.pack(">II5B", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)
    idat = _deflate_stored(raw)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _synth_payload(doc_id: int, text: str) -> tuple[str, bytes]:
    """Deterministic (mime, container bytes) for a document."""
    data = text.encode("utf-8")
    r = doc_id % 4
    if r == 0:
        return _MIMES[0], _bmp_encode(data)
    if r == 1:
        return _MIMES[1], _wav_encode(data, 8000 + 1000 * (doc_id % _WAV_RATES))
    if r == 2:
        return _MIMES[2], _avi_encode(
            data, 160 + 8 * (doc_id % 80), 120 + 8 * (doc_id % 60), 1 + doc_id % 120
        )
    return _MIMES[3], _png_encode([data])


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> opaque binary payloads with typed metadata.

    Payloads are real containers (see module docstring) built in an
    Arrow-batched pass; at production scale this column is the raw
    image/audio/video blob read from parquet binary columns and everything
    downstream is unchanged.  (Variable-length blob synthesis/decode is
    inherently per-element work — the canonical mapInPandas case; no blob
    ever moves through a shuffle.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [
                _synth_payload(int(d), t)
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ]
            payloads = [p for _, p in pairs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": [m for m, _ in pairs],
                    "payload": payloads,
                    "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                }
            )

    return docs.mapInPandas(
        synth, "doc_id long, mime string, payload binary, n_bytes long"
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


# container size formulas (synthesizer ground truth, for the oracle):
#   bmp: 14 + 40 + 1024 header/palette + n + row-pad(4)      = 1078 + n + pad4
#   wav: 12 RIFF + 24 fmt + 8 data hdr + n + even-pad        = 44 + n + n%2
#   avi: 12 RIFF + 8+4+8+56 hdrl + 8+4+8 movi + n + even-pad = 108 + n + n%2
#   png: 8 sig + 25 IHDR + 12 IDAT hdr/crc + idat + 12 IEND, where idat for
#        a level-0 zlib stream over m=n+1 raw bytes (filter byte + pixels)
#        is 2 hdr + 4 adler + m + 5 per stored block  = 64 + n + 5*ceil(m/65535)
_SQL_MEDIA_BASE = """
WITH m AS (
  SELECT doc_id, doc_id % 4 AS r, octet_length(encode(text)) AS n,
         md5(text) AS fp
  FROM documents
), sized AS (
  SELECT doc_id, r, n, fp,
         CASE r WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
                WHEN 2 THEN 'video/avi' ELSE 'image/png' END AS mime,
         CAST(CASE r WHEN 0 THEN 1078 + n + (4 - n % 4) % 4
                     WHEN 1 THEN 44 + n + n % 2
                     WHEN 2 THEN 108 + n + n % 2
                     ELSE 64 + n + 5 * CAST(CEIL((n + 1) / 65535.0) AS BIGINT)
                END AS BIGINT) AS n_bytes
  FROM m
)
"""

SQL_MEDIA_STATS = _SQL_MEDIA_BASE + """
SELECT mime, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(n_bytes), 3) AS avg_bytes
FROM sized GROUP BY mime
"""


def _parse_bmp(payload: bytes) -> tuple[str, int, int, int, int, int]:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 8 or height != 1:
        raise ValueError(f"unexpected BMP geometry bpp={bpp} h={height}")
    pixels = payload[pixel_off : pixel_off + width]  # row minus 4-byte pad
    return hashlib.md5(pixels).hexdigest(), width, height, 1, 0, 0


def _riff_walk(body: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Yield (tag, chunk_body) pairs of a RIFF chunk sequence."""
    i = 0
    while i + 8 <= len(body):
        tag = body[i : i + 4]
        (size,) = struct.unpack_from("<I", body, i + 4)
        yield tag, body[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)  # even-pad per spec


def _wav_samples(payload: bytes) -> tuple[int, bytes]:
    """(sample_rate, raw 8-bit PCM data) from a REAL RIFF/WAVE byte walk."""
    tag, body = next(_riff_walk(bytes(payload)))
    if tag != b"RIFF" or body[:4] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate, data = None, None
    for ctag, cbody in _riff_walk(body[4:]):
        if ctag == b"fmt ":
            (rate,) = struct.unpack_from("<I", cbody, 4)
        elif ctag == b"data":
            data = cbody
    if rate is None or data is None:
        raise ValueError("WAVE missing fmt /data chunk")
    return rate, data


def _parse_wav(payload: bytes) -> tuple[str, int, int, int, int, int]:
    rate, data = _wav_samples(payload)
    duration_ms = len(data) * 1000 // rate  # 8-bit mono: 1 byte per sample
    return hashlib.md5(data).hexdigest(), 0, 0, 0, rate, duration_ms


def _parse_avi(payload: bytes) -> tuple[str, int, int, int, int, int]:
    tag, body = next(_riff_walk(payload))
    if tag != b"RIFF" or body[:4] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    meta, frame = None, None
    for ctag, cbody in _riff_walk(body[4:]):
        if ctag != b"LIST":
            continue
        if cbody[:4] == b"hdrl":
            for htag, hbody in _riff_walk(cbody[4:]):
                if htag == b"avih":
                    usec, frames, width, height = (
                        struct.unpack_from("<I", hbody, 0)[0],
                        struct.unpack_from("<I", hbody, 16)[0],
                        struct.unpack_from("<I", hbody, 32)[0],
                        struct.unpack_from("<I", hbody, 36)[0],
                    )
                    meta = (usec, frames, width, height)
        elif cbody[:4] == b"movi":
            for mtag, mbody in _riff_walk(cbody[4:]):
                if mtag in (b"00db", b"00dc"):
                    frame = mbody
                    break
    if meta is None or frame is None:
        raise ValueError("AVI missing avih/movi")
    usec, frames, width, height = meta
    return (
        hashlib.md5(frame).hexdigest(),
        width,
        height,
        frames,
        0,
        frames * usec // 1000,
    )


def _png_unfilter(raw: bytes, width: int, height: int) -> bytes:
    """Reverse PNG scanline filtering for 8-bit grayscale (bpp=1).

    Handles all five standard filter types (None/Sub/Up/Average/Paeth) so
    the decoder is a real general-purpose grayscale-PNG reader; the
    synthesizer only emits type 0, where this is a straight memcpy."""
    stride = width
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG raw stream length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 1:  # Sub
            for i in range(1, stride):
                line[i] = (line[i] + line[i - 1]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - 1] if i else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out += line
        prev = line
    return bytes(out)


def _png_read(payload: bytes) -> tuple[int, int, bytes]:
    """Real PNG decode to (width, height, pixel bytes): chunk walk w/ CRC
    validation, zlib inflate of the concatenated IDAT stream, scanline
    un-filtering — stdlib only."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr, idat = None, b""
    i = 8
    while i + 12 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, i)
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + size]
        (crc,) = struct.unpack_from(">I", payload, i + 8 + size)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + size
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, ctype = struct.unpack_from(">IIBB", ihdr)
    if depth != 8 or ctype != 0:
        raise ValueError(f"unsupported PNG depth={depth} colortype={ctype}")
    return width, height, _png_unfilter(zlib.decompress(idat), width, height)


def _parse_png(payload: bytes) -> tuple[str, int, int, int, int, int]:
    width, height, pixels = _png_read(payload)
    return hashlib.md5(pixels).hexdigest(), width, height, 1, 0, 0


_PARSERS = {
    "image/bmp": _parse_bmp,
    "audio/wav": _parse_wav,
    "video/avi": _parse_avi,
    "image/png": _parse_png,
}


def _decode_payload(payload: bytes, mime: str) -> tuple[str, int, int, int, int, int]:
    """REAL decode of the supported containers (BMP/WAV/AVI headers walked
    byte-for-byte); compressed formats are the ``_HAVE_CODEC`` seam."""
    parser = _PARSERS.get(mime)
    if parser is None:
        if _HAVE_CODEC:  # pragma: no cover — no codec lib in this container
            raise NotImplementedError("compressed-format decode needs PIL/ffmpeg")
        raise ValueError(f"unsupported mime {mime!r}")
    return parser(bytes(payload))


def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pass: binary in, typed metadata out.

    ``mapInPandas`` (iterator of pandas batches) — the payload column never
    shuffles; each task decodes its own partition's blobs and emits only
    the small metadata frame.  width/height/n_frames/sample_rate are parsed
    from the container bytes, ``fp`` is md5 over the decoded media data."""

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
                    "sample_rate": pd.Series([t[4] for t in meta], dtype="int32"),
                    "duration_ms": pd.Series([t[5] for t in meta], dtype="int64"),
                }
            )

    return media_table(spark, sf_dir).mapInPandas(
        decode,
        "doc_id long, mime string, n_bytes long, fp string, "
        "width int, height int, n_frames int, sample_rate int, duration_ms long",
    )


SQL_MEDIA_DECODE = _SQL_MEDIA_BASE + """
SELECT doc_id, mime, n_bytes, fp,
       CAST(CASE r WHEN 0 THEN n WHEN 3 THEN n WHEN 1 THEN 0
                   ELSE 160 + 8 * (doc_id % 80) END AS INTEGER) AS width,
       CAST(CASE r WHEN 0 THEN 1 WHEN 3 THEN 1 WHEN 1 THEN 0
                   ELSE 120 + 8 * (doc_id % 60) END AS INTEGER) AS height,
       CAST(CASE r WHEN 0 THEN 1 WHEN 3 THEN 1 WHEN 1 THEN 0
                   ELSE 1 + doc_id % 120 END AS INTEGER) AS n_frames,
       CAST(CASE r WHEN 1 THEN 8000 + 1000 * (doc_id % 8)
                   ELSE 0 END AS INTEGER) AS sample_rate,
       CAST(CASE r WHEN 1 THEN (n * 1000) // (8000 + 1000 * (doc_id % 8))
                   WHEN 2 THEN (1 + doc_id % 120) * 40
                   ELSE 0 END AS BIGINT) AS duration_ms
FROM sized
"""

_FRAME_STEP = 7  # sample every 7th frame, capped — explode stays bounded


def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded frame sampling for video payloads (no UDF: the frame-index
    explode is sequence + explode on the decoded metadata, so the payload
    itself is touched exactly once, in media_decode)."""
    dec = media_decode(spark, sf_dir).where(F.col("mime") == "video/avi")
    return dec.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(_FRAME_STEP))
        ).alias("frame_idx"),
    )


SQL_MEDIA_FRAMES = f"""
WITH n AS (
  SELECT doc_id, 1 + doc_id % 120 AS n_frames
  FROM documents WHERE doc_id % 4 = 2
)
SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, {_FRAME_STEP})) AS BIGINT) AS frame_idx
FROM n
"""


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 2× nearest-neighbor downsample of the image payloads (BMP and
    PNG): decode the pixel row, take every other pixel, re-encode a
    spec-compliant container of the same format (the PNG path round-trips
    through chunk-walk → inflate → unfilter → re-deflate).  Same
    Arrow-batched mapInPandas shape as media_decode — payload bytes
    transform where they live, never shuffle.  Output includes the resized
    payload (for downstream/pytest) + metadata; the driver gate row
    (media_resize_meta) checks the metadata against the analytic oracle,
    and tests/test_multimodal.py re-decodes the actual bytes."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ow, nw, nb, fps, payloads = [], [], [], [], [], []
            for d, m, p in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                if m == "image/bmp":
                    (pixel_off,) = struct.unpack_from("<I", p, 10)
                    (width,) = struct.unpack_from("<i", p, 18)
                    row = bytes(p[pixel_off : pixel_off + width])
                    small = row[::2]
                    resized = _bmp_encode(small)
                elif m == "image/png":
                    width, height, row = _png_read(bytes(p))
                    if height != 1:  # synthetic invariant; general = row loop
                        raise ValueError("resize expects single-row PNG")
                    small = row[::2]
                    resized = _png_encode([small])
                else:
                    continue
                ids.append(int(d))
                ow.append(width)
                nw.append(len(small))
                nb.append(len(resized))
                fps.append(hashlib.md5(small).hexdigest())
                payloads.append(resized)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "old_width": pd.Series(ow, dtype="int32"),
                    "new_width": pd.Series(nw, dtype="int32"),
                    "new_n_bytes": pd.Series(nb, dtype="int64"),
                    "new_fp": pd.Series(fps, dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return media_table(spark, sf_dir).mapInPandas(
        resize,
        "doc_id long, old_width int, new_width int, new_n_bytes long, "
        "new_fp string, payload binary",
    )


def media_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate row: resize metadata (payload verified byte-level in
    pytest; its md5 is not SQL-derivable because DuckDB can't slice every
    other byte of a blob, so the oracle checks widths/sizes analytically)."""
    return media_resize(spark, sf_dir).select(
        "doc_id", "old_width", "new_width", "new_n_bytes"
    )


# resized sizes mirror _bmp_encode / _png_encode on ceil(n/2) pixel bytes
SQL_MEDIA_RESIZE = _SQL_MEDIA_BASE + """
SELECT doc_id, CAST(n AS INTEGER) AS old_width,
       CAST((n + 1) // 2 AS INTEGER) AS new_width,
       CAST(CASE r
              WHEN 0 THEN 1078 + (n + 1) // 2 + (4 - ((n + 1) // 2) % 4) % 4
              ELSE 64 + (n + 1) // 2
                   + 5 * CAST(CEIL(((n + 1) // 2 + 1) / 65535.0) AS BIGINT)
            END AS BIGINT) AS new_n_bytes
FROM sized WHERE r IN (0, 3)
"""


# --------------------------------------------------------------------------
# image perceptual hash (difference hash) — the image-dedup primitive at
# corpus scale: decode -> downsample the pixel row into _PH_BUCKETS mean
# buckets -> one bit per adjacent-bucket gradient.  Bucket means are
# compared by exact integer cross-multiplication (sum_a*cnt_b > sum_b*cnt_a)
# so the hash is bit-identical between the numpy path and the oracle's
# byte-level reconstruction.  Docs narrower than _PH_BUCKETS px are skipped
# (no stable gradient signature exists) — same rule in both engines.
# --------------------------------------------------------------------------

_PH_BUCKETS = 33  # 33 buckets -> 32 gradient bits


def _dhash_row(pixels: bytes) -> int | None:
    """32-bit dHash of a 1×W grayscale pixel row (None if W < buckets)."""
    import numpy as np

    w = len(pixels)
    if w < _PH_BUCKETS:
        return None
    v = np.frombuffer(pixels, dtype=np.uint8).astype(np.int64)
    bkt = np.arange(w, dtype=np.int64) * _PH_BUCKETS // w
    sums = np.bincount(bkt, weights=v, minlength=_PH_BUCKETS).astype(np.int64)
    cnts = np.bincount(bkt, minlength=_PH_BUCKETS).astype(np.int64)
    bits = sums[:-1] * cnts[1:] > sums[1:] * cnts[:-1]
    return int((bits.astype(np.int64) << np.arange(_PH_BUCKETS - 1)).sum())


def _image_pixels(payload: bytes, mime: str) -> bytes:
    """Pixel row of a decoded 1-row image container (REAL byte decode)."""
    if mime == "image/bmp":
        (pixel_off,) = struct.unpack_from("<I", bytes(payload), 10)
        (width,) = struct.unpack_from("<i", bytes(payload), 18)
        return bytes(payload)[pixel_off : pixel_off + width]
    if mime == "image/png":
        _w, _h, pixels = _png_read(bytes(payload))
        return pixels
    raise ValueError(f"not an image mime {mime!r}")


def media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection via perceptual difference-hash: decode the
    image payloads, dHash each pixel row, and count how many images share
    each signature.  Exact duplicates and brightness-preserving re-encodes
    (BMP vs PNG of the same pixels) collide; the groupBy(phash) is the ONE
    corpus-wide shuffle — at 100 TB this is the standard shuffle-on-64-bit
    -signature image dedup shape, never pairwise."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "mime": [], "width": [], "phash": []}
            for doc_id, mime, payload in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                if mime not in ("image/bmp", "image/png"):
                    continue
                px = _image_pixels(payload, mime)
                h = _dhash_row(px)
                if h is None:
                    continue
                rows["doc_id"].append(int(doc_id))
                rows["mime"].append(mime)
                rows["width"].append(len(px))
                rows["phash"].append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "mime": pd.Series(rows["mime"], dtype="object"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "phash": pd.Series(rows["phash"], dtype="int64"),
                }
            )

    hashed = media_table(spark, sf_dir).mapInPandas(
        hash_batch, "doc_id long, mime string, width int, phash long"
    )
    from pyspark.sql import Window

    n_same = F.count(F.lit(1)).over(Window.partitionBy("phash"))
    return hashed.select(
        "doc_id", "mime", "width", "phash", n_same.alias("n_same")
    )


SQL_MEDIA_PHASH = f"""
WITH px AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN 'image/bmp' ELSE 'image/png' END AS mime,
         hex(encode(text)) AS hx,
         octet_length(encode(text)) AS w
  FROM documents
  WHERE doc_id % 4 IN (0, 3) AND octet_length(encode(text)) >= {_PH_BUCKETS}
), bytes AS (
  SELECT doc_id, mime, w, unnest(generate_series(0, w - 1)) AS i, hx
  FROM px
), bkts AS (
  SELECT doc_id, mime, w,
         (i * {_PH_BUCKETS}) // w AS bkt,
         CAST(sum(CAST(('0x' || substr(hx, 2 * i + 1, 2)) AS INT)) AS BIGINT)
           AS s,
         CAST(count(*) AS BIGINT) AS c
  FROM bytes GROUP BY doc_id, mime, w, (i * {_PH_BUCKETS}) // w
), hashed AS (
  SELECT a.doc_id, a.mime, a.w AS width,
         CAST(sum(CASE WHEN a.s * b.c > b.s * a.c
                       THEN CAST(1 AS BIGINT) << a.bkt ELSE 0 END) AS BIGINT)
           AS phash
  FROM bkts a JOIN bkts b
    ON a.doc_id = b.doc_id AND b.bkt = a.bkt + 1
  GROUP BY a.doc_id, a.mime, a.w
)
SELECT doc_id, mime, CAST(width AS INTEGER) AS width, phash,
       CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same
FROM hashed
"""


# --------------------------------------------------------------------------
# Windowed audio energy (WAV analog of media_phash): the voice-activity /
# silence-trim primitive of audio corpus pipelines.
# --------------------------------------------------------------------------

_EN_WIN = 64  # PCM samples per energy window


def media_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window audio energy over REAL-decoded WAV payloads: walk the
    RIFF chunk list for fmt /data, then emit one row per 64-sample window
    with the integer sum of squared deviations from the 8-bit midpoint
    (128) — the exact-integer analog of windowed RMS loudness used for
    silence trimming / voice-activity gating.  100 TB posture: the payload
    never shuffles — decode + window reduction happen in one Arrow pass
    where the bytes live, and only the tiny (doc_id, win_idx, energy)
    rows ever move."""
    import numpy as np

    def energy_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "sample_rate": [], "win_idx": [],
                   "n_samples": [], "energy": []}
            for doc_id, mime, payload in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                if mime != "audio/wav":
                    continue
                rate, data = _wav_samples(payload)
                if not data:
                    continue
                d = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
                win = np.arange(len(d), dtype=np.int64) // _EN_WIN
                nwin = int(win[-1]) + 1
                e = np.bincount(win, weights=d * d, minlength=nwin).astype(np.int64)
                c = np.bincount(win, minlength=nwin).astype(np.int64)
                out["doc_id"].extend([int(doc_id)] * nwin)
                out["sample_rate"].extend([int(rate)] * nwin)
                out["win_idx"].extend(range(nwin))
                out["n_samples"].extend(c.tolist())
                out["energy"].extend(e.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "win_idx": pd.Series(out["win_idx"], dtype="int64"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "energy": pd.Series(out["energy"], dtype="int64"),
                }
            )

    return media_table(spark, sf_dir).mapInPandas(
        energy_batch,
        "doc_id long, sample_rate int, win_idx long, n_samples long, energy long",
    )


# synth mirror: WAV payloads are doc_id % 4 == 1; PCM data = the UTF-8 text
# bytes; sample_rate = 8000 + 1000 * (doc_id % 8) — see _synth_payload.
SQL_MEDIA_ENERGY = f"""
WITH wav AS (
  SELECT doc_id,
         CAST(8000 + 1000 * (doc_id % 8) AS INTEGER) AS sample_rate,
         hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE doc_id % 4 = 1 AND octet_length(encode(text)) > 0
), bytes AS (
  SELECT doc_id, sample_rate, unnest(generate_series(0, n - 1)) AS i, hx
  FROM wav
)
SELECT doc_id, sample_rate,
       i // {_EN_WIN} AS win_idx,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum((CAST(('0x' || substr(hx, 2 * i + 1, 2)) AS BIGINT) - 128)
                * (CAST(('0x' || substr(hx, 2 * i + 1, 2)) AS BIGINT) - 128))
            AS BIGINT) AS energy
FROM bytes
GROUP BY doc_id, sample_rate, i // {_EN_WIN}
"""


def media_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-trim / voice-activity summary per audio doc: a window is
    ACTIVE iff its energy is at least half the doc's mean window energy —
    all-integer criterion (2·energy·n_windows >= total_energy), so the
    verdict is bit-identical cross-engine.  Emits the trim bounds
    (first/last active window) and the active count; the decode happens
    once in media_energy's Arrow pass, then two combinable doc_id
    aggregations — no payload shuffle, no second decode."""
    eng = media_energy(spark, sf_dir)
    tot = eng.groupBy("doc_id").agg(
        F.sum("energy").alias("_tot"), F.count(F.lit(1)).alias("n_windows")
    )
    act = eng.join(tot, "doc_id").where(
        2 * F.col("energy") * F.col("n_windows") >= F.col("_tot")
    )
    return act.groupBy("doc_id", "n_windows").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.min("win_idx").alias("first_active"),
        F.max("win_idx").alias("last_active"),
    )


SQL_MEDIA_TRIM = f"""
WITH eng AS ({SQL_MEDIA_ENERGY}),
tot AS (
  SELECT doc_id, sum(energy) AS tot, CAST(count(*) AS BIGINT) AS n_windows
  FROM eng GROUP BY doc_id
)
SELECT e.doc_id, t.n_windows,
       CAST(count(*) AS BIGINT) AS n_active,
       min(e.win_idx) AS first_active,
       max(e.win_idx) AS last_active
FROM eng e JOIN tot t USING (doc_id)
WHERE 2 * e.energy * t.n_windows >= t.tot
GROUP BY e.doc_id, t.n_windows
"""


def registry():
    """name -> (spark_fn, duckdb_oracle_sql) for the driver contract."""
    return {
        "media_stats": (media_stats, SQL_MEDIA_STATS),
        "media_decode": (media_decode, SQL_MEDIA_DECODE),
        "media_frames": (media_frames, SQL_MEDIA_FRAMES),
        "media_resize": (media_resize_meta, SQL_MEDIA_RESIZE),
        "media_phash": (media_phash, SQL_MEDIA_PHASH),
        "media_energy": (media_energy, SQL_MEDIA_ENERGY),
        "media_trim": (media_trim, SQL_MEDIA_TRIM),
    }
