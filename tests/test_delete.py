"""Deletion semantics: tombstones filter immediately with unchanged
stats (Lucene deleted-docs bitset); expunge rewrites the index and
scores reflect the shrunken corpus (forceMergeDeletes).

Reference probes: katta-core/src/test/java/com/ivyft/katta/lucene/
IndexDeleteTest.java, TermDeleteTest.java."""

import pytest
from pyspark.sql import functions as F

from katta_spark.corpus import synthetic_corpus, with_ingest_columns
from katta_spark.index import (
    PhysicalIndex,
    build_index,
    delete_docs,
    expunge_deletes,
)

from tests.oracle import PyBM25


@pytest.fixture(scope="module")
def del_setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("del") / "idx")
    corpus = with_ingest_columns(synthetic_corpus(spark, 500))
    build_index(spark, corpus, d, n_groups=1, block_range=128)
    pdf = corpus.select("doc_id", "content").toPandas()
    oracle = PyBM25(
        [(int(r.doc_id), r.content) for r in pdf.itertuples(index=False)]
    )
    return d, pdf, oracle


def test_tombstones_filter_with_old_stats(spark, del_setup):
    d, pdf, oracle = del_setup
    base = PhysicalIndex(spark, d)
    full = [
        (r["doc_id"], r["score"])
        for r in base.topk(["import"], k=500).collect()
    ]
    victims = [doc for doc, _ in full[:5]]
    delete_docs(spark, d, victims)

    idx = PhysicalIndex(spark, d)
    # stats unchanged pre-expunge (Lucene semantics)
    assert idx.stats["n_docs"] == 500
    got = [(r["doc_id"], r["score"]) for r in idx.topk(["import"], k=10).collect()]
    # = the full ranking minus the victims, scores untouched
    want = [x for x in full if x[0] not in set(victims)][:10]
    assert got == want
    # every surface excludes them
    assert idx.count(["import"]).first()["n_hits"] == len(full) - 5
    assert (
        idx.export(["import"], ["doc_id"])
        .filter(F.col("doc_id").isin(victims))
        .count()
        == 0
    )


def test_expunge_rewrites_and_rescores(spark, del_setup):
    d, pdf, oracle = del_setup
    tomb = [
        r["doc_id"]
        for r in PhysicalIndex(spark, d)
        .topk(["import"], k=5, use_wand=False)
        .collect()
    ]
    # (tombstones from the previous test may already cover these)
    delete_docs(spark, d, tomb)
    deleted = set(
        r["doc_id"]
        for r in spark.read.parquet(f"{d}/tombstones").distinct().collect()
    )
    rep = expunge_deletes(spark, d)
    assert rep["expunged"] == len(deleted)

    idx = PhysicalIndex(spark, d)
    assert idx.stats["n_docs"] == 500 - len(deleted)
    assert idx.tombstones is None  # cleared; WAND path live again

    survivor_oracle = PyBM25(
        [
            (int(r.doc_id), r.content)
            for r in pdf.itertuples(index=False)
            if int(r.doc_id) not in deleted
        ]
    )
    for q, m in [(["import"], "or"), (["parse", "request"], "and"),
                 (["nebula", "quark"], "or")]:
        got = idx.topk(q, k=10, mode=m).collect()
        want = survivor_oracle.topk(q, k=10, mode=m)
        assert [r["doc_id"] for r in got] == [doc for doc, _ in want], q
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(s, abs=1e-9)


def test_phrase_survives_expunge(spark, del_setup):
    """Positional postings must round-trip the expunge decode-rebuild:
    phrase results after expunge equal the surviving subset, scored
    against the shrunken corpus."""
    d, pdf, oracle = del_setup
    idx = PhysicalIndex(spark, d)  # post-expunge state from prior test
    assert idx.stats.get("positions")
    got = {r["doc_id"] for r in idx.phrase_scored(
        ["parse", "http", "request"]).collect()}
    import re

    from katta_spark.tokenizer import py_tokenize

    live = {int(r["doc_id"]) for r in idx.docs.select("doc_id").collect()}
    want = set()
    for r in pdf.itertuples(index=False):
        if int(r.doc_id) not in live:
            continue
        toks = py_tokenize(r.content)
        if any(toks[i:i + 3] == ["parse", "http", "request"]
               for i in range(len(toks) - 2)):
            want.add(int(r.doc_id))
    assert got == want and got


def test_delete_by_query(spark, tmp_path):
    """Solr deleteByQuery: every match of the Lucene-syntax query is
    tombstoned (boolean trees included), non-matches survive, and a
    second identical delete is a no-op for results."""
    from katta_spark.index import delete_by_query

    d = str(tmp_path / "idx_dbq")
    corpus = with_ingest_columns(synthetic_corpus(spark, 400))
    build_index(spark, corpus, d, n_groups=1, block_range=128)
    base = PhysicalIndex(spark, d)
    n_match = base.count(["quark"]).first()["n_hits"]
    n_import = base.count(["import"]).first()["n_hits"]
    assert n_match > 0

    n = delete_by_query(spark, d, "quark")
    assert n == n_match

    idx = PhysicalIndex(spark, d)
    assert idx.count(["quark"]).first()["n_hits"] == 0
    # docs matching 'import' but not 'quark' are still live
    survivors = idx.count(["import"]).first()["n_hits"]
    both = base.matched_docs(["import", "quark"], mode="and").count()
    assert survivors == n_import - both

    # boolean-tree delete: matches of (parse AND request) vanish too
    n2 = PhysicalIndex(spark, d).count(["parse", "request"],
                                       mode="and").first()["n_hits"]
    deleted2 = delete_by_query(spark, d, "parse AND request")
    assert deleted2 == n2
    assert PhysicalIndex(spark, d).count(
        ["parse", "request"], mode="and").first()["n_hits"] == 0
