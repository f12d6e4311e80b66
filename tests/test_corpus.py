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


def test_murmur3_known_vectors():
    """The standard MurmurHash3 x86-32 test vectors — the public
    oracle for bit-identity with Katta's StringHash
    (util/StringHash.java, seed 0)."""
    from katta_spark.corpus import murmur3_x86_32 as m

    assert m(b"") == 0
    assert m(b"hello") == 613153351
    assert m(b"foo") == -156908512
    # tail-length coverage (1..3 trailing bytes after the 4-byte body)
    assert m(b"a") != m(b"ab") != m(b"abc") != m(b"abcd")


def test_shard_route_matches_java_semantics(spark, docs):
    """micro = abs(java-truncated hash % P); start = micro - micro %
    step (DefaultDataWriter.java:171-184) — recomputed row-by-row in
    pure python over a sample."""
    from katta_spark.corpus import murmur3_x86_32, shard_route

    P, STEP = 37, 5  # non-power-of-two to exercise trunc-vs-floor
    routed = shard_route(
        docs.select("path"), "path", shard_partitions=P, shard_step=STEP
    )
    rows = routed.limit(200).collect()
    assert rows
    saw_negative_hash = False
    for r in rows:
        h = murmur3_x86_32(r["path"].encode("utf-8"))
        saw_negative_hash |= h < 0
        micro = abs(h - int(h / P) * P)
        assert r["micro_shard"] == micro
        assert r["shard_start"] == micro - micro % STEP
    assert saw_negative_hash  # the Java trunc-% branch was exercised
    assert routed.filter(
        (F.col("micro_shard") < 0) | (F.col("micro_shard") >= P)
    ).count() == 0
