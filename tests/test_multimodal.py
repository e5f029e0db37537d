"""Multimodal binary-column ops (linkgraph/multimodal.py): opaque payload
schema, REAL pure-Python container decode (BMP/WAV/AVI/PNG), bounded frame
sampling.  Decode results are checked against the synthesis FORMULAS and
md5-of-text — independent ground truth, not the parser itself."""

import hashlib
import math
import struct

import pytest

from linkgraph.io import load_table
from linkgraph.multimodal import (
    _FRAME_STEP,
    _parse_avi,
    _parse_bmp,
    _parse_png,
    _parse_wav,
    media_decode,
    media_frames,
    media_table,
)

SF = "/root/testdata/sf0.001"

_MAGIC = {
    "image/bmp": b"BM",
    "audio/wav": b"RIFF",
    "video/avi": b"RIFF",
    "image/png": b"\x89PNG\r\n\x1a\n",
}


def _png_bytes(n: int) -> int:
    return 64 + n + 5 * math.ceil((n + 1) / 65535.0)


def test_media_table_schema_and_container_magic(spark):
    m = media_table(spark, SF)
    assert dict(m.dtypes) == {
        "doc_id": "bigint",
        "mime": "string",
        "payload": "binary",
        "n_bytes": "bigint",
    }
    rows = m.limit(80).collect()
    assert rows
    for r in rows:
        p = bytes(r["payload"])
        assert len(p) == r["n_bytes"]
        mime = ("image/bmp", "audio/wav", "video/avi", "image/png")[r["doc_id"] % 4]
        assert r["mime"] == mime
        assert p.startswith(_MAGIC[mime])
        if mime == "audio/wav":
            assert p[8:12] == b"WAVE"
        if mime == "video/avi":
            assert p[8:12] == b"AVI "


def test_media_decode_roundtrips_real_headers(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    dec = {r["doc_id"]: r.asDict() for r in media_decode(spark, SF).collect()}
    assert dec.keys() == texts.keys()
    seen = set()
    for doc_id, row in dec.items():
        data = texts[doc_id].encode("utf-8")
        n = len(data)
        # fp is md5 over the DECODED media data (pixels/samples/frame)
        assert row["fp"] == hashlib.md5(data).hexdigest()
        r = doc_id % 4
        seen.add(r)
        if r == 0:  # BMP: width = byte count, single row
            assert (row["width"], row["height"], row["n_frames"]) == (n, 1, 1)
            assert row["n_bytes"] == 1078 + n + (-n) % 4
        elif r == 1:  # WAV: rate + duration from the fmt/data chunks
            rate = 8000 + 1000 * (doc_id % 8)
            assert row["sample_rate"] == rate
            assert row["duration_ms"] == n * 1000 // rate
            assert row["n_bytes"] == 44 + n + n % 2
        elif r == 2:  # AVI: avih geometry + frame count
            assert row["width"] == 160 + 8 * (doc_id % 80)
            assert row["height"] == 120 + 8 * (doc_id % 60)
            assert row["n_frames"] == 1 + doc_id % 120
            assert row["duration_ms"] == (1 + doc_id % 120) * 40
            assert row["n_bytes"] == 108 + n + n % 2
        else:  # PNG: width/height from IHDR, bytes from the stored stream
            assert (row["width"], row["height"], row["n_frames"]) == (n, 1, 1)
            assert row["n_bytes"] == _png_bytes(n)
    assert seen == {0, 1, 2, 3}, "sf0.001 must exercise all four mimes"


def test_media_frames_bounded_and_video_only(spark):
    dec = {r["doc_id"]: r.asDict() for r in media_decode(spark, SF).collect()}
    frames = media_frames(spark, SF).collect()
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert by_doc, "sf0.001 must contain at least one video-mime doc"
    for doc_id, idxs in by_doc.items():
        meta = dec[doc_id]
        assert meta["mime"] == "video/avi"
        assert sorted(idxs) == list(range(0, meta["n_frames"], _FRAME_STEP))


def test_decode_rejects_corrupt_containers():
    with pytest.raises(ValueError):
        _parse_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError):
        _parse_wav(b"RIFF\x04\x00\x00\x00JUNK")
    with pytest.raises((ValueError, StopIteration)):
        _parse_avi(b"notariff")
    with pytest.raises(ValueError):
        _parse_png(b"\x89PNJ" + b"\x00" * 40)


def test_png_decode_rejects_bad_crc_and_handles_all_filters():
    from linkgraph.multimodal import _png_encode, _png_read, _png_unfilter

    p = bytearray(_png_encode([b"abcdef"]))
    p[20] ^= 0xFF  # flip an IHDR byte without fixing the CRC
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(p))

    # Sub/Up/Average/Paeth filtered scanlines reconstruct exactly
    img = [bytes((i * 31 + r * 7) % 256 for i in range(9)) for r in range(5)]
    raw = bytearray()
    prev = bytes(9)
    for line, ft in zip(img, (0, 1, 2, 3, 4)):
        enc = bytearray(line)
        for i in range(9):
            a = line[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if ft == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif ft == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif ft == 3:
                enc[i] = (line[i] - ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line
    assert _png_unfilter(bytes(raw), 9, 5) == b"".join(img)

    # multi-row encode -> read round trip through the real chunk walk
    w, h, pix = _png_read(_png_encode([b"abcdef", b"ghijkl"]))
    assert (w, h, pix) == (6, 2, b"abcdefghijkl")


def test_media_resize_bytes_roundtrip(spark):
    """The resized payload must be a VALID container of the same format
    whose decoded row equals every other pixel of the original text bytes
    (nearest-neighbor 2x), for BOTH image mimes (BMP and PNG)."""
    from linkgraph.multimodal import _parse_bmp, _parse_png, media_resize

    sf = "/root/testdata/sf0.001"
    out = media_resize(spark, sf).toPandas()
    docs = {
        int(r["doc_id"]): r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
        if int(r["doc_id"]) % 4 in (0, 3)
    }
    assert len(out) == len(docs) > 0
    mimes_seen = set()
    for r in out.itertuples():
        doc_id = int(r.doc_id)
        want_row = docs[doc_id].encode("utf-8")[::2]
        parser = _parse_bmp if doc_id % 4 == 0 else _parse_png
        mimes_seen.add(doc_id % 4)
        fp, w, h, _nf, _sr, _d = parser(bytes(r.payload))
        assert h == 1
        assert w == r.new_width == len(want_row)
        assert r.old_width == len(docs[doc_id].encode("utf-8"))
        assert fp == r.new_fp == hashlib.md5(want_row).hexdigest()
        assert r.new_n_bytes == len(bytes(r.payload))
    assert mimes_seen == {0, 3}


def test_media_phash_matches_python_and_groups_dups(spark):
    from linkgraph.multimodal import _PH_BUCKETS, media_phash

    sf = "/root/testdata/sf0.001"
    out = media_phash(spark, sf).toPandas()
    docs = {
        int(r["doc_id"]): r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
        if int(r["doc_id"]) % 4 in (0, 3)
    }

    # from-scratch dHash over the raw pixel row (== utf-8 bytes of text)
    def ref_hash(b: bytes) -> int | None:
        w = len(b)
        if w < _PH_BUCKETS:
            return None
        s = [0] * _PH_BUCKETS
        c = [0] * _PH_BUCKETS
        for i, v in enumerate(b):
            s[i * _PH_BUCKETS // w] += v
            c[i * _PH_BUCKETS // w] += 1
        return sum(
            1 << j
            for j in range(_PH_BUCKETS - 1)
            if s[j] * c[j + 1] > s[j + 1] * c[j]
        )

    expected = {
        d: ref_hash(t.encode("utf-8"))
        for d, t in docs.items()
        if ref_hash(t.encode("utf-8")) is not None
    }
    got = dict(zip(out["doc_id"].astype(int), out["phash"].astype(int)))
    assert got == expected

    # identical texts (the planted exact dups) must share a signature,
    # and n_same must equal the corpus-wide signature frequency
    from collections import Counter

    freq = Counter(expected.values())
    for r in out.itertuples():
        assert int(r.n_same) == freq[int(r.phash)]
    texts = {}
    for d, t in docs.items():
        texts.setdefault(t, []).append(d)
    for t, ids in texts.items():
        if len(ids) > 1 and len(t.encode()) >= _PH_BUCKETS:
            assert len({expected[d] for d in ids}) == 1


def test_media_energy_matches_python(spark):
    """Windowed WAV energy: engine rows == a per-doc pure-Python recompute
    from the documents text (the synthesis ground truth), including window
    partials and the real fmt-chunk sample rate."""
    from linkgraph.multimodal import _EN_WIN, media_energy

    docs = {
        int(r["doc_id"]): r["text"]
        for r in load_table(spark, SF, "documents").collect()
        if int(r["doc_id"]) % 4 == 1
    }
    out = media_energy(spark, SF).toPandas()
    assert set(out["doc_id"]) == {d for d, t in docs.items() if len(t.encode()) > 0}
    for doc_id, grp in out.groupby("doc_id"):
        data = docs[int(doc_id)].encode()
        assert (grp["sample_rate"] == 8000 + 1000 * (doc_id % 8)).all()
        want = {}
        for i, b in enumerate(data):
            w = i // _EN_WIN
            cnt, en = want.get(w, (0, 0))
            want[w] = (cnt + 1, en + (b - 128) ** 2)
        got = {
            int(r.win_idx): (int(r.n_samples), int(r.energy))
            for r in grp.itertuples()
        }
        assert got == want


def test_media_trim_bounds_consistent(spark):
    """Trim bounds vs a pure-Python recompute of the integer activity
    criterion from the text bytes."""
    from linkgraph.multimodal import _EN_WIN, media_trim

    docs = {
        int(r["doc_id"]): r["text"].encode()
        for r in load_table(spark, SF, "documents").collect()
        if int(r["doc_id"]) % 4 == 1 and len(r["text"].encode()) > 0
    }
    out = {int(r["doc_id"]): r for r in media_trim(spark, SF).collect()}
    assert set(out) == set(docs)
    for doc_id, data in docs.items():
        wins = {}
        for i, b in enumerate(data):
            wins[i // _EN_WIN] = wins.get(i // _EN_WIN, 0) + (b - 128) ** 2
        tot, nw = sum(wins.values()), len(wins)
        active = sorted(w for w, e in wins.items() if 2 * e * nw >= tot)
        r = out[doc_id]
        assert (r["n_windows"], r["n_active"]) == (nw, len(active))
        assert (r["first_active"], r["last_active"]) == (active[0], active[-1])
        assert active  # criterion can never empty the active set
