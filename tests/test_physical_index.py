"""End-to-end tests of the physical index: build metrics/lineage,
rank-identity vs the pure-Python BM25 oracle (the Lucene-style
reference), WAND == exhaustive, resume-from-checkpoint, incremental
commits, skew bounds, parallelism invariance.

Reference query set: FIXTURES.md §2."""

import pytest
from pyspark.sql import functions as F

from katta_spark.corpus import synthetic_corpus, with_ingest_columns
from katta_spark.fulltext import query as Q
from katta_spark.fulltext.analysis import LogicalIndex
from katta_spark.index import PhysicalIndex, build_index, load_manifest

from tests.conftest import BLOCK_RANGE, N_DOCS, N_GROUPS
from tests.oracle import PyBM25

QUERY_SET = [
    (["import"], "or"),               # hot term (>50% of docs)
    (["xylophonequarknebula3"], "or"),  # rare needle
    (["user"], "or"),                 # camelCase sub-token
    (["getusername"], "or"),          # unsplit compound
    (["chunk"], "or"),                # snake_case sub-token
    (["parse", "request"], "and"),    # boolean AND
    (["nebula", "quark"], "or"),      # boolean OR
    (["block", "max", "score"], "or"),
    (["missingtermzzz"], "or"),       # no hits
    (["import", "missingtermzzz"], "and"),  # AND with a dead term
]


@pytest.fixture(scope="module")
def py_oracle(pandas_docs):
    return PyBM25(
        [(int(r.doc_id), r.content) for r in pandas_docs.itertuples(index=False)]
    )


@pytest.fixture(scope="module")
def lindex(docs):
    return LogicalIndex.build(docs, text_col="content").cache()


# --------------------------------------------------------------- build


def test_manifest_lineage_and_metrics(index_dir):
    m = load_manifest(index_dir)
    assert len(m) == N_GROUPS
    for e in m:
        assert e["status"] == "done"
        assert e["bytes"] > 0
        assert "lineage" in e and "group_expr" in e["lineage"]
    assert sum(e["n_docs_group"] for e in m) == N_DOCS
    assert sum(e["n_postings"] for e in m) > N_DOCS  # > 1 posting/doc


def test_stats(pindex, py_oracle):
    assert pindex.stats["n_docs"] == py_oracle.n
    assert pindex.stats["avgdl"] == pytest.approx(py_oracle.avgdl, abs=1e-9)


def test_term_catalog_matches_oracle(pindex, py_oracle):
    rows = {r["term"]: int(r["df"]) for r in pindex.terms.collect()}
    assert rows == dict(py_oracle.df)


# -------------------------------------------------------- rank identity


@pytest.mark.parametrize("qterms,mode", QUERY_SET)
def test_topk_rank_identical_to_oracle(pindex, py_oracle, qterms, mode):
    got = pindex.topk(qterms, k=10, mode=mode).collect()
    want = py_oracle.topk(qterms, k=10, mode=mode)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)


@pytest.mark.parametrize("qterms,mode", QUERY_SET)
def test_wand_equals_exhaustive(pindex, qterms, mode):
    w = pindex.topk(qterms, k=10, mode=mode).collect()
    e = pindex.topk(qterms, k=10, mode=mode, use_wand=False).collect()
    assert [(r["doc_id"], r["score"]) for r in w] == [
        (r["doc_id"], r["score"]) for r in e
    ]


def test_physical_equals_logical(pindex, lindex):
    for qterms, mode in QUERY_SET[:6]:
        p = pindex.topk(qterms, k=10, mode=mode).collect()
        l = Q.topk(lindex, qterms, k=10, mode=mode).collect()
        assert [r["doc_id"] for r in p] == [r["doc_id"] for r in l]
        for a, b in zip(p, l):
            assert a["score"] == pytest.approx(b["score"], abs=1e-9)


def test_offset_pagination(pindex, py_oracle):
    got = pindex.topk(["import"], k=20, offset=60).collect()
    want = py_oracle.topk(["import"], k=20, offset=60)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    # page boundaries consistent: page2 directly follows page1
    p1 = pindex.topk(["import"], k=60).collect()
    assert len(p1) == 60 and p1[-1]["score"] >= got[0]["score"]


def test_field_filter(pindex, py_oracle, pandas_docs):
    got = pindex.topk(["class"], k=10, filters={"lang": "python"}).collect()
    langs = dict(zip(pandas_docs.doc_id, pandas_docs.lang))
    want = [
        (d, s)
        for d, s in py_oracle.topk(["class"], k=10**9)
        if langs[d] == "python"
    ][:10]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]


# ----------------------------------------------------- aggregate surface


def test_count(pindex, py_oracle):
    assert (
        pindex.count(["import"]).first()["n_hits"]
        == len(py_oracle.matches(["import"]))
    )
    assert (
        pindex.count(["parse", "request"], mode="and").first()["n_hits"]
        == len(py_oracle.matches(["parse", "request"], mode="and"))
    )


def test_group_facet(pindex, py_oracle, pandas_docs):
    langs = dict(zip(pandas_docs.doc_id, pandas_docs.lang))
    matched = py_oracle.matches(["return"])
    want_groups = sorted({langs[d] for d in matched})
    got_groups = sorted(
        r["lang"] for r in pindex.group_values(["return"], "lang").collect()
    )
    assert got_groups == want_groups

    from collections import Counter

    cnt = Counter(langs[d] for d in matched)
    want_facet = sorted(cnt.items(), key=lambda x: (-x[1], x[0]))[:3]
    got_facet = [
        (r["lang"], r["cnt"])
        for r in pindex.facet(["return"], "lang", n=3).collect()
    ]
    assert got_facet == want_facet


def test_range_facet(pindex, py_oracle):
    got = {
        r["bucket_start"]: r["cnt"]
        for r in pindex.range_facet(["def"], "dl", 0.0, 100.0, 10.0).collect()
    }
    from collections import Counter

    dls = {d: py_oracle.dl[d] for d in py_oracle.matches(["def"])}
    want = Counter(
        (dl // 10) * 10.0 for dl in dls.values() if 0 <= dl < 100
    )
    assert got == dict(want)


def test_sorted_query(pindex, pandas_docs, py_oracle):
    got = pindex.sorted_query(
        ["import"], [("repo", "asc")], ["doc_id", "repo"], limit=20
    ).collect()
    repos = dict(zip(pandas_docs.doc_id, pandas_docs.repo))
    want = sorted(
        ((repos[d], d) for d in py_oracle.matches(["import"])),
    )[:20]
    assert [(r["repo"], r["doc_id"]) for r in got] == want


def test_fetch_details(pindex):
    hits = pindex.topk(["import"], k=5)
    out = pindex.fetch_details(hits, ["repo", "lang", "content_sha256"]).collect()
    assert len(out) == 5
    assert set(out[0].asDict()) == {"doc_id", "score", "repo", "lang",
                                    "content_sha256"}


# ------------------------------------------------------- resume / commit


def test_checkpoint_resume(spark, corpus, pindex, tmp_path):
    d = str(tmp_path / "idx_resume")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, corpus, d, n_groups=N_GROUPS,
                    block_range=BLOCK_RANGE, fail_after_groups=1)
    m1 = load_manifest(d)
    assert len(m1) == 1  # one group committed before the crash

    rep = build_index(spark, corpus, d, n_groups=N_GROUPS,
                      block_range=BLOCK_RANGE)
    assert rep["groups_skipped"] == [m1[0]["group"]]
    assert len(load_manifest(d)) == N_GROUPS

    resumed = PhysicalIndex(spark, d)
    for qterms, mode in QUERY_SET[:4]:
        a = resumed.topk(qterms, k=10, mode=mode).collect()
        b = pindex.topk(qterms, k=10, mode=mode).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]


def test_incremental_commit_matches_full_build(spark, tmp_path):
    """Two commits (the blck ingest comm/fsh analogue) must produce an
    index identical in results to one full build over the union."""
    full = with_ingest_columns(synthetic_corpus(spark, 600))
    first = full.filter(F.col("doc_id") < 300)
    second = full.filter(F.col("doc_id") >= 300)

    d_full = str(tmp_path / "full")
    d_inc = str(tmp_path / "inc")
    build_index(spark, full, d_full, n_groups=2, block_range=64)
    build_index(spark, first, d_inc, n_groups=2, block_range=64, commit="c0")
    build_index(spark, second, d_inc, n_groups=2, block_range=64, commit="c1")

    a = PhysicalIndex(spark, d_full)
    b = PhysicalIndex(spark, d_inc)
    assert a.stats["n_docs"] == b.stats["n_docs"] == 600
    assert a.stats["avgdl"] == pytest.approx(b.stats["avgdl"], abs=1e-12)
    assert (
        a.terms.exceptAll(b.terms).count() == 0
        and b.terms.exceptAll(a.terms).count() == 0
    )
    for qterms, mode in QUERY_SET[:6]:
        ra = a.topk(qterms, k=10, mode=mode).collect()
        rb = b.topk(qterms, k=10, mode=mode).collect()
        assert [(r["doc_id"], r["score"]) for r in ra] == [
            (r["doc_id"], r["score"]) for r in rb
        ]


def test_snapshot_commits_rank_identical_to_subset_build(spark, tmp_path):
    """Opening the 2-commit index pinned to commit c0 (time travel)
    must be indistinguishable — stats, catalog, every ranking — from
    an index that only ever ingested c0's docs; and later tombstones
    must NOT apply to the snapshot."""
    from katta_spark.index.delete import delete_docs

    full = with_ingest_columns(synthetic_corpus(spark, 600))
    first = full.filter(F.col("doc_id") < 300)
    second = full.filter(F.col("doc_id") >= 300)

    d_inc = str(tmp_path / "inc")
    d_c0 = str(tmp_path / "only_c0")
    build_index(spark, first, d_inc, n_groups=2, block_range=64, commit="c0")
    build_index(spark, second, d_inc, n_groups=2, block_range=64, commit="c1")
    build_index(spark, first, d_c0, n_groups=2, block_range=64)

    snap = PhysicalIndex(spark, d_inc, commits=["c0"])
    ref = PhysicalIndex(spark, d_c0)
    # manifest-derived stats: exact, no Spark job at open
    assert snap.stats["n_docs"] == ref.stats["n_docs"] == 300
    assert snap.stats["avgdl"] == pytest.approx(ref.stats["avgdl"], abs=1e-12)
    # snapshot catalog == subset build's catalog (exact df/cf)
    assert (
        snap.terms.exceptAll(ref.terms).count() == 0
        and ref.terms.exceptAll(snap.terms).count() == 0
    )
    for qterms, mode in QUERY_SET[:6]:
        a = snap.topk(qterms, k=10, mode=mode).collect()
        b = ref.topk(qterms, k=10, mode=mode).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ], (qterms, mode)

    # the snapshot scans are partition-pruned to the pinned commit:
    # commit appears as a PartitionFilter and the docs files actually
    # read are exactly c0's
    plan = snap.postings.filter(
        F.col("term") == "import"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "commit" in plan
    n_read = snap.docs.select(F.input_file_name()).distinct().count()
    from pathlib import Path as _P
    n_c0 = len(list((_P(d_inc) / "docs" / "commit=c0").rglob("*.parquet")))
    n_all = len(list((_P(d_inc) / "docs").rglob("*.parquet")))
    assert 0 < n_read <= n_c0 < n_all

    # tombstone a live c0 doc AFTER the snapshot point: current handle
    # hides it, the snapshot still returns it (read-as-written)
    victim = int(snap.topk(["import"], k=1).first()["doc_id"])
    delete_docs(spark, d_inc, [victim])
    cur = PhysicalIndex(spark, d_inc)
    assert cur.docs.filter(F.col("doc_id") == victim).count() == 0
    snap2 = PhysicalIndex(spark, d_inc, commits=["c0"])
    assert snap2.docs.filter(F.col("doc_id") == victim).count() == 1

    with pytest.raises(ValueError, match="unknown commit"):
        PhysicalIndex(spark, d_inc, commits=["c9"])


def test_path_field_queries(spark, tmp_path):
    """Field-scoped postings ('path:'-prefixed terms): scoring and
    mixed-field boolean queries rank-identical to the oracle."""
    c = with_ingest_columns(synthetic_corpus(spark, 400))
    d = str(tmp_path / "idx_path")
    build_index(spark, c, d, path_col="path", n_groups=1, block_range=128)
    idx = PhysicalIndex(spark, d)

    assert idx.count(["path:src"]).first()["n_hits"] == 400

    pdf = c.select("doc_id", "content", "path").toPandas()
    oracle = PyBM25(
        [(int(r.doc_id), r.content) for r in pdf.itertuples(index=False)],
        paths={int(r.doc_id): r.path for r in pdf.itertuples(index=False)},
    )
    for q, m in [(["path:py"], "or"), (["import", "path:src"], "and"),
                 (["path:module1", "chunk"], "or")]:
        got = idx.topk(q, k=10, mode=m).collect()
        want = oracle.topk(q, k=10, mode=m)
        assert [r["doc_id"] for r in got] == [doc for doc, _ in want], q
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(s, abs=1e-9)


def test_phrase_query(spark, tmp_path):
    """Phrase = consecutive analyzed tokens: docs with the terms
    scattered (AND-match) must NOT appear; scores equal the AND BM25
    sum of the phrase terms."""
    rows = [
        (0, "alpha beta gamma here"),        # phrase "alpha beta": yes
        (1, "beta alpha and more beta"),     # both terms, wrong order
        (2, "alpha filler beta"),            # both terms, not adjacent
        (3, "xx alpha beta"),                # yes
        (4, "alphabeta together"),           # compound, not the phrase
        (5, "alpha beta alpha beta"),        # yes (twice)
    ]
    corpus = spark.createDataFrame(
        [(i, "r", f"p{i}", "c", "x", t) for i, t in rows],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path / "idx_phrase")
    build_index(spark, corpus, d, n_groups=1, block_range=64)
    idx = PhysicalIndex(spark, d)
    got = idx.phrase_topk(["alpha", "beta"], k=10).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 3, 5]
    # scores equal the plain AND scores of the same docs
    and_scores = {
        r["doc_id"]: r["score"]
        for r in idx.topk(["alpha", "beta"], mode="and", k=10).collect()
    }
    for r in got:
        assert r["score"] == pytest.approx(and_scores[r["doc_id"]], abs=1e-12)


def test_count_fast_path(pindex, py_oracle):
    """Single-term count comes from the catalog (no decode) and must
    equal the decode-path count."""
    fast = pindex.count(["import"]).first()["n_hits"]
    slow = pindex.matched_docs(["import"]).count()
    assert fast == slow == len(py_oracle.matches(["import"]))
    assert pindex.count(["zzz_missing"]).first()["n_hits"] == 0


def test_compaction(spark, tmp_path):
    """Compaction (the segment-merge/optimize analogue) rewrites many
    commits into one layout with identical query results."""
    from katta_spark.index import compact_postings
    from katta_spark.index.build import load_manifest

    full = with_ingest_columns(synthetic_corpus(spark, 600))
    d = str(tmp_path / "idx_c")
    build_index(spark, full.filter(F.col("doc_id") < 300), d,
                n_groups=2, block_range=64, commit="c0")
    build_index(spark, full.filter(F.col("doc_id") >= 300), d,
                n_groups=2, block_range=64, commit="c1")
    before = PhysicalIndex(spark, d)
    snap = {
        (qs := tuple(q)): [
            (r["doc_id"], r["score"])
            for r in before.topk(list(qs), k=10, mode=m).collect()
        ]
        for q, m in QUERY_SET[:5]
    }
    rep = compact_postings(spark, d)
    assert rep["compacted"] == ["c0", "c1"]
    m = load_manifest(d)
    assert [e["commit"] for e in m] == [rep["new_commit"]]
    after = PhysicalIndex(spark, d)
    for qs, want in snap.items():
        got = [
            (r["doc_id"], r["score"])
            for r in after.topk(list(qs), k=10).collect()
        ]
        assert got == want
    # a post-compaction commit still lands correctly
    extra = with_ingest_columns(synthetic_corpus(spark, 700)).filter(
        F.col("doc_id") >= 600
    )
    build_index(spark, extra, d, n_groups=1, block_range=64, commit="c2")
    assert PhysicalIndex(spark, d).stats["n_docs"] == 700


# ---------------------------------------------------------- scale props


def test_skew_blocks_bounded(pindex):
    """Hot terms are split across doc-range blocks: no (term, block)
    group ever exceeds block_range postings — the explicit salting
    guarantee of the build shuffle."""
    mx = pindex.postings.agg(F.max("n")).first()[0]
    assert mx <= BLOCK_RANGE
    hot_blocks = pindex.postings.filter(F.col("term") == "import").count()
    assert hot_blocks == N_DOCS // BLOCK_RANGE + (N_DOCS % BLOCK_RANGE > 0)


def test_multi_topk_rank_identical_to_per_query(pindex):
    """Batched multi-query results are rank-identical (ids AND exact
    scores) to running each query alone; a query whose term doesn't
    exist simply contributes no rows; the whole batch is ONE postings
    scan (a single FileScan of the postings parquet in the plan)."""
    qmap = {
        "hot": ["import", "return"],
        "needle": ["xylophonequarknebula7"],
        "conj": ["parse", "request"],
        "none": ["zzznotaterm"],
    }
    got = pindex.multi_topk(qmap, k=7).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    assert "none" not in by_q
    for qid in ("hot", "needle", "conj"):
        solo = [
            (r["doc_id"], r["score"])
            for r in pindex.topk(qmap[qid], k=7).collect()
        ]
        assert by_q[qid] == solo, qid
    # one postings FileScan feeds the whole batch (plus the broadcast
    # catalog scan) — N queries never mean N scans
    plan = pindex.multi_topk(qmap, k=7)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("/postings") <= 2


def test_multi_topk_and_mode(pindex, py_oracle):
    got = pindex.multi_topk(
        {"a": ["parse", "request"], "b": ["merge", "sorted"]},
        k=5, mode="and",
    ).collect()
    for qid, terms in (("a", ["parse", "request"]), ("b", ["merge", "sorted"])):
        want = py_oracle.topk(terms, k=5, mode="and")
        rows = [
            (r["doc_id"], round(r["score"], 9))
            for r in got if r["qid"] == qid
        ]
        assert rows == [(d, round(s, 9)) for d, s in want], qid


def test_parallelism_invariance(spark, index_dir):
    """Same results (exact doc_ids AND exact float64 scores) at
    different shuffle parallelism — the in-session stand-in for the
    N vs 4N cluster-size rank-identity requirement."""
    results = {}
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for p in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", p)
            idx = PhysicalIndex(spark, index_dir)
            results[p] = [
                (r["doc_id"], r["score"])
                for r in idx.topk(["import", "return"], k=25).collect()
            ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert results["3"] == results["17"]


def test_query_cache_hit_and_invalidation(spark, tmp_path):
    """Solr queryResultCache parity: second identical call is a
    cache HIT with identical rows; a new commit re-keys (the 'new
    searcher' flush) and the re-computed result sees the new doc."""
    from pyspark.sql import functions as F

    from katta_spark.corpus import synthetic_corpus, with_ingest_columns
    from katta_spark.index.cache import QueryCache

    d = str(tmp_path / "idx")
    base = with_ingest_columns(synthetic_corpus(spark, 300))
    build_index(spark, base, d, n_groups=1, block_range=128)
    idx = PhysicalIndex(spark, d)
    qc = QueryCache(idx, str(tmp_path / "qcache"))
    first = [(r["doc_id"], round(r["score"], 9))
             for r in qc.topk(["def"], k=5).collect()]
    again = [(r["doc_id"], round(r["score"], 9))
             for r in qc.topk(["def"], k=5).collect()]
    assert first == again
    assert qc.misses == 1 and qc.hits == 1

    # new commit -> new searcher generation -> key changes
    more = with_ingest_columns(synthetic_corpus(spark, 320)).filter(
        F.col("doc_id") >= 300
    ).drop("doc_id", "content_sha256")
    build_index(spark, more, d, n_groups=1, block_range=128,
                commit="c1")
    idx2 = PhysicalIndex(spark, d)
    qc2 = QueryCache(idx2, str(tmp_path / "qcache"))
    fresh = qc2.topk(["def"], k=5).collect()
    assert qc2.misses == 1  # re-keyed, not served stale
    assert len(fresh) == 5
