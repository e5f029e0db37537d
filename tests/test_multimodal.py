"""Multimodal binary-column plumbing (linkgraph/multimodal.py): opaque
payload schema, Arrow-batched stub decode, bounded frame sampling."""

import hashlib

from linkgraph.multimodal import (
    _FRAME_STEP,
    media_decode,
    media_frames,
    media_table,
)

SF = "/root/testdata/sf0.001"


def test_media_table_schema_and_bytes(spark):
    m = media_table(spark, SF)
    assert dict(m.dtypes) == {
        "doc_id": "bigint",
        "mime": "string",
        "payload": "binary",
        "n_bytes": "bigint",
    }
    rows = m.limit(50).collect()
    assert rows
    for r in rows:
        assert isinstance(r["payload"], (bytes, bytearray))
        assert len(r["payload"]) == r["n_bytes"]
        assert r["mime"] == ("image/png", "audio/wav", "video/mp4")[r["doc_id"] % 3]


def test_media_decode_matches_local_codec_stub(spark):
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media_table(spark, SF).collect()}
    dec = {r["doc_id"]: r.asDict() for r in media_decode(spark, SF).collect()}
    assert dec.keys() == payloads.keys()
    for doc_id, row in dec.items():
        fp = hashlib.md5(payloads[doc_id]).hexdigest()
        assert row["fp"] == fp
        assert row["width"] == 16 + int(fp[0:4], 16) % 2048
        assert row["height"] == 16 + int(fp[4:8], 16) % 2048
        if row["mime"] == "image/png":
            assert row["n_frames"] == 1
        else:
            assert row["n_frames"] == 1 + int(fp[8:12], 16) % 120


def test_media_frames_bounded_and_video_only(spark):
    dec = {r["doc_id"]: r.asDict() for r in media_decode(spark, SF).collect()}
    frames = media_frames(spark, SF).collect()
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert by_doc, "sf0.001 must contain at least one video-mime doc"
    for doc_id, idxs in by_doc.items():
        meta = dec[doc_id]
        assert meta["mime"] == "video/mp4"
        assert sorted(idxs) == list(range(0, meta["n_frames"], _FRAME_STEP))
