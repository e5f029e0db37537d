"""Hypothesis property tests for the pure-python media codec seam and
the transcript synthesizer (SURVEY §5 — deepens the byte-level media
round-trip coverage from fixed examples to randomized properties).

No SparkSession: everything here is the stdlib-only encode/parse layer
that the Arrow-batched media UDFs call per batch, so hundreds of
hypothesis examples run in seconds.
"""

from __future__ import annotations

import hashlib
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from linkgraph.multimodal import (
    _avi_encode,
    _bmp_encode,
    _deflate_stored,
    _parse_avi,
    _parse_bmp,
    _parse_wav,
    _png_encode,
    _png_read,
    _png_unfilter,
    _wav_encode,
)

payload = st.binary(min_size=1, max_size=400)


@given(payload)
def test_bmp_roundtrip(data):
    md5, width, height, frames, rate, dur = _parse_bmp(_bmp_encode(data))
    assert (width, height, frames) == (len(data), 1, 1)
    assert md5 == hashlib.md5(data).hexdigest()


@given(payload, st.integers(min_value=1, max_value=96_000))
def test_wav_roundtrip(data, rate):
    md5, _w, _h, _f, got_rate, dur_ms = _parse_wav(_wav_encode(data, rate))
    assert got_rate == rate
    assert dur_ms == len(data) * 1000 // rate
    assert md5 == hashlib.md5(data).hexdigest()


@given(
    payload,
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=1000),
)
def test_avi_roundtrip(frame, w, h, n_frames):
    md5, gw, gh, gf, _r, dur = _parse_avi(_avi_encode(frame, w, h, n_frames))
    assert (gw, gh, gf) == (w, h, n_frames)
    assert md5 == hashlib.md5(frame).hexdigest()


@given(
    st.integers(min_value=1, max_value=48),
    st.integers(min_value=1, max_value=48),
    st.randoms(use_true_random=False),
)
def test_png_roundtrip_type0(w, h, rnd):
    rows = [bytes(rnd.randrange(256) for _ in range(w)) for _ in range(h)]
    gw, gh, pixels = _png_read(_png_encode(rows))
    assert (gw, gh) == (w, h)
    assert pixels == b"".join(rows)


@given(st.binary(min_size=0, max_size=200_000))
@settings(max_examples=30)
def test_deflate_stored_stream(raw):
    """Any inflater reads the explicit stored-block stream, and the size
    matches the oracle-pinned formula 2 + 5*ceil(m/65535) + m + 4."""
    s = _deflate_stored(raw)
    assert zlib.decompress(s) == raw
    m = len(raw)
    nblk = max(1, (m + 65534) // 65535)
    assert len(s) == 2 + 5 * nblk + m + 4


def _png_forward_filter(pixels: bytes, w: int, h: int, ftypes: list[int]) -> bytes:
    """Reference FORWARD filter (spec 9.2) — the inverse of _png_unfilter."""
    out = bytearray()
    prev = bytes(w)
    for y in range(h):
        line = pixels[y * w : (y + 1) * w]
        ft = ftypes[y]
        out.append(ft)
        for i in range(w):
            a = line[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((line[i] - pred) & 0xFF)
        prev = line
    return bytes(out)


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.randoms(use_true_random=False),
)
def test_png_unfilter_inverts_all_filter_types(w, h, rnd):
    """_png_unfilter recovers the pixels under EVERY per-row filter type
    0-4 — the general-reader path the type-0-only synthesizer never
    exercises."""
    pixels = bytes(rnd.randrange(256) for _ in range(w * h))
    ftypes = [rnd.randrange(5) for _ in range(h)]
    raw = _png_forward_filter(pixels, w, h, ftypes)
    assert _png_unfilter(raw, w, h) == pixels


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=20)
def test_synth_transcripts_deterministic_and_wellformed(seed):
    """Same seed → byte-identical frame; per-conversation invariants hold
    for every seed (contiguous turn_idx from 0, strictly increasing ts,
    roles drawn from the fixed vocabulary)."""
    import pandas as pd

    from linkgraph.synth import synth_transcripts_pdf

    a = synth_transcripts_pdf(n_conversations=6, seed=seed)
    b = synth_transcripts_pdf(n_conversations=6, seed=seed)
    pd.testing.assert_frame_equal(a, b)
    for conv, grp in a.groupby("conv_id"):
        g = grp.sort_values("turn_idx")
        assert list(g["turn_idx"]) == list(range(len(g)))
        ts = list(g["ts"])
        assert all(x < y for x, y in zip(ts, ts[1:]))
    assert a["role"].str.match(r"^(user|assistant|agent\d\d)$").all()
