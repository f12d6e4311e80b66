"""Edge cases: empty corpus, token-less docs, unicode, block-boundary
doc ids, high tf, fuzzed tokenizer parity."""

import random
import string

import pytest
from pyspark.sql import functions as F

from katta_spark.index import PhysicalIndex, build_index
from katta_spark.tokenizer import py_tokenize, tokens_array


def _mk_corpus(spark, rows):
    return spark.createDataFrame(
        [(i, "r", f"p{i}", "c", "x", t) for i, t in enumerate(rows)],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )


def test_empty_and_tokenless_docs(spark, tmp_path):
    d = str(tmp_path / "edge1")
    corpus = _mk_corpus(spark, ["", "!!! ???", "a b c d", "hello hello"])
    build_index(spark, corpus, d, n_groups=1, block_range=64)
    idx = PhysicalIndex(spark, d)
    assert idx.stats["n_docs"] == 4
    # docs 0,1 have dl=0 ("a","b","c","d" are 1-char, dropped too)
    dls = {r["doc_id"]: r["dl"] for r in idx.docs.select("doc_id", "dl").collect()}
    assert dls[0] == 0 and dls[1] == 0 and dls[2] == 0 and dls[3] == 2
    hits = idx.topk(["hello"], k=5).collect()
    assert [r["doc_id"] for r in hits] == [3]
    assert idx.topk(["nothing"], k=5).collect() == []


def test_unicode_content(spark, tmp_path):
    """Analyzer contract: identifiers are ASCII [A-Za-z0-9_] runs;
    non-ASCII splits identifiers but never crashes any path."""
    d = str(tmp_path / "edge2")
    corpus = _mk_corpus(
        spark, ["héllo wörld naïve", "日本語のテキスト def foo_bar", "emoji 🚀 rocketLaunch"]
    )
    build_index(spark, corpus, d, n_groups=1, block_range=64)
    idx = PhysicalIndex(spark, d)
    # 'héllo' -> idents 'h' (dropped) + 'llo'
    assert [r["doc_id"] for r in idx.topk(["llo"], k=5).collect()] == [0]
    assert [r["doc_id"] for r in idx.topk(["foo_bar"], k=5).collect()] == [1]
    assert [r["doc_id"] for r in idx.topk(["launch"], k=5).collect()] == [2]


def test_block_boundary_doc_ids(spark, tmp_path):
    """Docs exactly at block_range multiples land in the right blocks
    and decode back exactly."""
    br = 64
    rows = {0, br - 1, br, br + 1, 2 * br, 5 * br - 1}
    corpus = spark.createDataFrame(
        [(i, "r", f"p{i}", "c", "x", "boundary marker" if i in rows else "filler pad")
         for i in range(5 * br)],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path / "edge3")
    build_index(spark, corpus, d, n_groups=2, block_range=br)
    idx = PhysicalIndex(spark, d)
    got = sorted(
        r["doc_id"] for r in idx.export(["boundary"], ["doc_id"]).collect()
    )
    assert got == sorted(rows)


def test_high_tf(spark, tmp_path):
    d = str(tmp_path / "edge4")
    corpus = _mk_corpus(spark, ["spam " * 5000, "spam once here"])
    build_index(spark, corpus, d, n_groups=1, block_range=64)
    idx = PhysicalIndex(spark, d)
    hits = idx.topk(["spam"], k=2).collect()
    assert [r["doc_id"] for r in hits] == [0, 1]  # tf=5000 outranks tf=1
    row = idx.postings.filter(F.col("term") == "spam").first()
    assert row["max_tf"] == 5000  # varint holds multi-byte values


def test_tokenizer_fuzz_parity(spark):
    """500 seeded random strings (ascii + punctuation + unicode):
    Spark expression tokenizer == pure-Python mirror on every one."""
    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + "_ ./-:(){}\n\tÀéñ中🚀"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, t string"
    )
    got = {
        r["id"]: list(r["toks"])
        for r in df.select("id", tokens_array("t").alias("toks")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == py_tokenize(c), repr(c)


def test_dup_clusters_chain_and_star(spark):
    """Min-label propagation resolves transitive chains and stars:
    a-b, b-c, c-d is ONE cluster rooted at min id; disjoint pairs keep
    their own roots; isolated docs never appear (no edges)."""
    from katta_spark.ops.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain -> cluster 1
         (10, 11), (10, 12),          # star  -> cluster 10
         (20, 21)],                   # pair  -> cluster 20
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster"]
           for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_parser_const_score_malformed_forms():
    """^= fuzz: malformed constant-score inputs parse to SOMETHING
    sane (no crash) and well-formed ones round-trip."""
    from katta_spark.fulltext.qparse import ConstScore, parse_lucene

    for q in ("^=2", "term^=", "term^=x", "a^=1^=2", "()^=3", '"a b"^=',
              "f:^=2", "term^= 2"):
        parse_lucene(q)  # must not raise
    n = parse_lucene("term^=2.5")
    assert isinstance(n, ConstScore) and n.value == 2.5
    # boost-of-const scales the constant (Lucene semantics)
    b = parse_lucene("(term^=2)^3")
    assert isinstance(b, ConstScore) and b.value == 6.0


def test_keep_best_per_cluster_survivorship(spark):
    """Chain a-b-c + pair d-e + singleton f: exactly one survivor per
    cluster, the highest metric, ties by doc_id."""
    from katta_spark.ops.dedup import dup_clusters, keep_best_per_cluster

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], ["doc_a", "doc_b"]
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (4, 7), (5, 7), (6, 1)],
        ["doc_id", "n_chars"],
    )
    clus = dup_clusters(pairs)
    out = {r["doc_id"]: (r["cluster"], r["n_chars"])
           for r in keep_best_per_cluster(docs, clus).collect()}
    # cluster {1,2,3} -> 2 (metric 99); {4,5} -> 4 (tie 7, min id);
    # 6 is a singleton survivor
    assert out == {2: (1, 99), 4: (4, 7), 6: (6, 1)}
