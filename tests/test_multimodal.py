"""Multimodal plumbing tests: binary payload columns, Arrow-batched
decode kernels (deterministic fakes), frame-explode shape, stub
behavior for real codecs."""

import hashlib

import pytest

from katta_spark.ops import multimodal as mm


@pytest.fixture(scope="module")
def payloads(docs):
    p = mm.attach_fake_payload(docs.limit(50), modality="image",
                               seed_col="content")
    p.cache().count()
    return p


def test_payload_schema(payloads):
    row = payloads.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["byte_len"] == 16  # md5 digest
    assert row["modality"] == "image"


def test_decode_meta_deterministic(payloads):
    rows = mm.decode_image_meta(payloads).collect()
    assert len(rows) == 50
    src = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    for r in rows:
        h = hashlib.md5(src[r["doc_id"]].hex().encode()).hexdigest()
        assert r["width"] == 16 + int(h[0:2], 16) % 64
        assert r["height"] == 16 + int(h[2:4], 16) % 64
        assert r["channels"] == 3
        assert 16 <= r["width"] < 80


def test_image_features_shape(payloads):
    rows = mm.image_features(payloads, dim=8).collect()
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r["features"])
    # deterministic across executions
    again = mm.image_features(payloads, dim=8).collect()
    assert sorted((r["doc_id"], tuple(r["features"])) for r in rows) == sorted(
        (r["doc_id"], tuple(r["features"])) for r in again
    )


def test_frame_sample_explode(payloads):
    fr = mm.sample_frames(payloads, every=4, max_frames=3).collect()
    assert len(fr) == 150  # 3 frames per doc
    by_doc = {}
    for r in fr:
        by_doc.setdefault(r["doc_id"], []).append(r)
    src = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == [0, 4, 8]
        h = src[doc_id].hex()
        for j, r in enumerate(rows):
            h = hashlib.md5((h + format(j, "02x")).encode()).hexdigest()
            assert bytes(r["frame"]).hex() == h


def test_real_decoder_is_stubbed(payloads):
    with pytest.raises(Exception, match="real image decode"):
        mm.decode_image_meta(payloads, fake=False).collect()


def test_no_shuffle_in_decode(spark):
    """Decode kernels must stay narrow — no Exchange added by the
    kernel itself (measured over a shuffle-free source)."""
    from pyspark.sql import functions as F

    src = spark.range(100).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("content")
    )
    p = mm.attach_fake_payload(src, seed_col="content")
    plan = (
        mm.decode_image_meta(p)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
