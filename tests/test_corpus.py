import hashlib

from pyspark.sql import functions as F

from katta_spark.corpus import synthetic_corpus, with_ingest_columns


def test_sha256_invariant(pandas_docs):
    """Per-row ingest invariant (BASELINE.json input_hint): stored
    content_sha256 equals an independently computed sha256."""
    for r in pandas_docs.itertuples(index=False):
        assert (
            hashlib.sha256(r.content.encode()).hexdigest() == r.content_sha256
        )


def test_doc_id_dense_and_stable(spark, docs):
    n = docs.count()
    ids = docs.select("doc_id")
    assert ids.distinct().count() == n
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    assert (lo, hi) == (0, n - 1)


def test_doc_id_follows_global_key_order(spark, docs):
    """doc_id i is exactly the i-th row in (repo, path, commit) order
    — the dense-rank contract the monotonic-id fast path must uphold
    (range partition boundaries + cached row order)."""
    rows = docs.select("repo", "path", "commit", "doc_id").collect()
    ordered = sorted(rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    assert [r["doc_id"] for r in ordered] == list(range(len(rows)))


def test_doc_id_parallelism_invariant(spark, corpus, docs):
    """doc_id assignment is identical regardless of input partitioning."""
    again = with_ingest_columns(corpus.repartition(13))
    diff = (
        docs.select("doc_id", "content_sha256")
        .exceptAll(again.select("doc_id", "content_sha256"))
        .count()
    )
    assert diff == 0


def test_corpus_deterministic(spark, corpus):
    a = corpus.orderBy("repo", "path").limit(5).collect()
    b = synthetic_corpus(spark, 2000).orderBy("repo", "path").limit(5).collect()
    assert a == b


def test_skew_property(spark, docs):
    """FIXTURES.md §1: hot code terms in >50% of docs so salted build
    paths are genuinely exercised."""
    n = docs.count()
    hot = docs.filter(F.col("content").contains("import")).count()
    assert hot / n > 0.5
    hot2 = docs.filter(F.col("content").contains("return")).count()
    assert hot2 / n > 0.5
