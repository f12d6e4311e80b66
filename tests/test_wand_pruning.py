"""Proof that block-max WAND actually prunes: kernel-level unit test
(pure pandas, no Spark) counting decoded groups on data engineered so
most blocks cannot beat the running top-k."""

import numpy as np
import pandas as pd

from katta_spark.index import codec
from katta_spark.index import search as S


def _block_row(term, block_id, doc_offsets, tfs, dls, block_range):
    doc_ids = np.array(sorted(doc_offsets), dtype=np.int64) + block_id * block_range
    g, t, d = codec.encode_block(
        doc_ids, np.array(tfs), np.array(dls), block_id, block_range
    )
    return {
        "term": term, "block_id": block_id, "df": 10,
        "max_tf": int(max(tfs)), "min_dl": int(min(dls)),
        "doc_gaps": g, "tfs": t, "dls": d,
    }


def test_wand_skips_weak_blocks(monkeypatch):
    """100 blocks: block 0 holds high-tf postings (top-k lives there),
    the other 99 hold tf=1 postings that can't reach the heap floor.
    The kernel must decode block 0 plus at most a handful before the
    threshold locks in — never all 100."""
    br = 64
    rows = [_block_row("t", 0, range(10), [50] * 10, [10] * 10, br)]
    for b in range(1, 100):
        rows.append(_block_row("t", b, range(10), [1] * 10, [1000] * 10, br))
    pdf = pd.DataFrame(rows)

    decoded = []
    orig = S._score_group

    def counting(g, n_docs, avgdl, k1, b, block_range):
        decoded.append(int(g["block_id"].iloc[0]))
        return orig(g, n_docs, avgdl, k1, b, block_range)

    monkeypatch.setattr(S, "_score_group", counting)
    kern = S.make_wand_kernel(
        1000.0, avgdl=100.0, k1=1.2, b=0.75, k=5, n_terms=1,
        mode="or", block_range=br,
    )
    out = pd.concat(list(kern(iter([pdf]))))
    assert len(out) == 5
    assert set(out["doc_id"]) == set(range(5))  # top-5 from block 0
    assert 0 in decoded
    assert len(decoded) < 5, f"decoded {len(decoded)} of 100 blocks"


def test_wand_and_mode_skips_missing_term_blocks(monkeypatch):
    """AND over two terms: doc ranges where one term is absent are
    skipped without decoding (conjunction pruning)."""
    br = 64
    rows = [
        _block_row("a", 0, range(5), [3] * 5, [10] * 5, br),
        _block_row("b", 0, range(5), [3] * 5, [10] * 5, br),
    ]
    for blk in range(1, 50):
        rows.append(_block_row("a", blk, range(5), [3] * 5, [10] * 5, br))
    pdf = pd.DataFrame(rows).sort_values(["block_id", "term"])

    decoded = []
    orig = S._score_group

    def counting(g, n_docs, avgdl, k1, b, block_range):
        decoded.append(int(g["block_id"].iloc[0]))
        return orig(g, n_docs, avgdl, k1, b, block_range)

    monkeypatch.setattr(S, "_score_group", counting)
    kern = S.make_wand_kernel(
        1000.0, avgdl=10.0, k1=1.2, b=0.75, k=10,
        n_terms=2, mode="and", block_range=br,
    )
    out = pd.concat(list(kern(iter([pdf]))))
    assert decoded == [0]  # only the block where both terms exist
    assert set(out["doc_id"]) == set(range(5))


def test_wand_never_skips_on_tied_upper_bound():
    """Safety: a later block whose upper bound EQUALS the heap floor
    is still decoded (a tied doc with smaller... larger doc_id can't
    win, but an equal-scored doc must not be silently dropped when
    the heap isn't genuinely full of better docs)."""
    br = 64
    rows = [
        _block_row("t", 0, range(3), [5, 5, 5], [10, 10, 10], br),
        _block_row("t", 1, range(3), [5, 5, 5], [10, 10, 10], br),
    ]
    pdf = pd.DataFrame(rows)
    kern = S.make_wand_kernel(
        1000.0, avgdl=10.0, k1=1.2, b=0.75, k=6, n_terms=1,
        mode="or", block_range=br,
    )
    out = pd.concat(list(kern(iter([pdf]))))
    # all six identical-scored docs survive, ordered by doc_id
    assert list(out["doc_id"]) == [0, 1, 2, 64, 65, 66]
