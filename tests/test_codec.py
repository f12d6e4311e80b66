import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from katta_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64) if vals else np.empty(0, dtype=np.int64)
    assert np.array_equal(codec.decode_varint(codec.encode_varint(arr)), arr)


def test_varint_empty():
    assert codec.encode_varint(np.empty(0, dtype=np.int64)) == b""
    assert codec.decode_varint(b"").size == 0


def test_varint_sizes():
    # one byte for < 128, two for < 16384
    assert len(codec.encode_varint(np.array([0, 1, 127]))) == 3
    assert len(codec.encode_varint(np.array([128, 16383]))) == 4


@given(
    st.lists(st.integers(min_value=0, max_value=codec.BLOCK_RANGE - 1),
             min_size=1, max_size=200, unique=True),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(offsets, block_id):
    offsets = sorted(offsets)
    doc_ids = np.array(offsets, dtype=np.int64) + block_id * codec.BLOCK_RANGE
    tfs = (doc_ids % 17 + 1).astype(np.int64)
    dls = (doc_ids % 301 + 5).astype(np.int64)
    g, t, d = codec.encode_block(doc_ids, tfs, dls, block_id)
    rid, rtf, rdl = codec.decode_block(g, t, d, block_id)
    assert np.array_equal(rid, doc_ids)
    assert np.array_equal(rtf, tfs)
    assert np.array_equal(rdl, dls)


def test_bm25_helpers_match_formula():
    tfn = codec.bm25_tfnorm(np.array([3]), np.array([40]), 25.0, 1.2, 0.75)
    expect = 3 * 2.2 / (3 + 1.2 * (0.25 + 0.75 * 40 / 25.0))
    assert tfn[0] == pytest.approx(expect, abs=1e-15)
    assert codec.bm25_idf(5, 1000) == pytest.approx(
        np.log(1 + (1000 - 5 + 0.5) / 5.5), abs=1e-15
    )


def test_positions_roundtrip():
    import numpy as np

    from katta_spark.index.codec import decode_positions, encode_positions

    rng = [
        [np.array([0, 3, 7, 100])],
        [np.array([5]), np.array([0, 1, 2]), np.array([1000, 2000])],
        [np.array([], dtype=np.int64), np.array([4, 9])],
        [],
    ]
    for lists in rng:
        lens_b, deltas_b = encode_positions(lists)
        lens, flat = decode_positions(lens_b, deltas_b)
        assert lens.tolist() == [len(p) for p in lists]
        got = np.split(flat, np.cumsum(lens)[:-1]) if len(lists) else []
        for g, w in zip(got, lists):
            assert g.tolist() == list(w)
