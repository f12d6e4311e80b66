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


def test_binary_byte_stats_hand_computed(spark):
    """Known byte strings: uniform bytes -> entropy log2(n_distinct),
    constant bytes -> 0; zero_ratio counts 0x00 exactly."""
    from katta_spark.ops.multimodal import binary_byte_stats

    rows = [(0, bytes([0, 1, 2, 3])), (1, bytes([7] * 8)),
            (2, bytes([0, 0, 5, 5])), (3, b"")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in binary_byte_stats(df).collect()}
    assert got[0]["entropy"] == 2.0 and got[0]["n_distinct"] == 4
    assert got[0]["zero_ratio"] == 0.25
    assert got[1]["entropy"] == 0.0 and got[1]["zero_ratio"] == 0.0
    assert got[2]["entropy"] == 1.0 and got[2]["zero_ratio"] == 0.5
    assert got[3]["byte_len"] == 0 and got[3]["entropy"] == 0.0
