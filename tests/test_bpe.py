"""Distributed BPE trainer vs a pure-python classic-BPE mirror
(Sennrich et al. 2016 greedy merges over a term-frequency dict)."""

from collections import Counter

from katta_spark.ops import bpe
from katta_spark.tokenizer import py_tokenize

TEXTS = [
    "low lower lowest low low newer new",
    "wider wide new low newest",
    "sparkContext sparkSession spark_context spark",
]


def py_bpe(term_counts: dict[str, int], n_merges: int):
    vocab = {t: list(t) for t in term_counts}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for t, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += term_counts[t]
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for t, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[t] = out
    return merges, vocab


def _term_counts() -> dict[str, int]:
    c: Counter = Counter()
    for t in TEXTS:
        c.update(py_tokenize(t))
    return dict(c)


def test_bpe_train_matches_python_mirror(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, content string"
    )
    want_merges, want_vocab = py_bpe(_term_counts(), 6)
    got_merges, got_vocab = bpe.bpe_train(df, 6)
    assert got_merges == want_merges
    got = {r["term"]: list(r["symbols"]) for r in got_vocab.collect()}
    assert got == want_vocab


def test_apply_merge_left_to_right_nonoverlapping(spark):
    """'aaaa' under merge (a,a) becomes [aa, aa] — greedy
    left-to-right, never the overlapping [a,aa,a] or [aa,a,a]."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],), (["b", "a"],)],
        "symbols array<string>",
    )
    out = [
        list(r["m"])
        for r in df.select(
            bpe.apply_merge("symbols", "a", "a").alias("m")
        ).collect()
    ]
    assert out == [["aa", "aa"], ["aa", "a"], ["b", "a"]]


def test_pair_counts_weighted_by_term_frequency(spark):
    df = spark.createDataFrame(
        [(0, "ab ab ab xy")], "doc_id long, content string"
    )
    v = bpe.initial_vocab(df)
    got = {
        (r["a"], r["b"]): r["cnt"] for r in bpe.pair_counts(v).collect()
    }
    assert got == {("a", "b"): 3, ("x", "y"): 1}
