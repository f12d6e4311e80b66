"""Node-tier grouping / discovery surfaces: collapse, result
grouping, significant_terms, MoreLikeThis — each must be
rank-identical to the Spark tier on the same index (LocalSearcher),
and the sharded scatter-gather merges are covered in
test_multi_index.py against the union-built oracle.

Reference surfaces: Solr CollapsingQParserPlugin / result grouping
and Lucene MoreLikeThis reach the reference through its SolrQuery
pass-through (katta-client/.../client/LuceneClient.java:255-276);
significant_terms is the ES dual of Solr MLT's representative terms.
"""

import numpy as np
import pandas as pd

from katta_spark.index.serve import LocalSearcher


def test_serve_collapse_matches_spark(pindex, index_dir):
    ls = LocalSearcher(index_dir)
    for terms, mode in [(["import", "return"], "or"),
                        (["scan", "merge"], "and")]:
        want = [(r["doc_id"], round(r["score"], 9), r["lang"])
                for r in pindex.collapse_topk(terms, "lang", k=8,
                                              mode=mode).collect()]
        out = ls.collapse_topk(terms, "lang", k=8, mode=mode)
        got = [(int(r.doc_id), round(float(r.score), 9), r.lang)
               for r in out.itertuples(index=False)]
        assert got == want, (terms, mode)


def test_serve_group_matches_spark(pindex, index_dir):
    ls = LocalSearcher(index_dir)
    want = sorted(
        [(r["lang"], r["doc_id"], round(r["score"], 9), r["rank"])
         for r in pindex.group_topk(["import", "table"], "lang",
                                    k_per_group=3).collect()]
    )
    out = ls.group_topk(["import", "table"], "lang", k_per_group=3)
    got = sorted(
        [(r.lang, int(r.doc_id), round(float(r.score), 9), int(r.rank))
         for r in out.itertuples(index=False)]
    )
    assert got == want


def test_serve_significant_terms_matches_spark(pindex, index_dir):
    ls = LocalSearcher(index_dir)
    want = [(r["term"], r["df_fg"], r["df_bg"], r["lift"])
            for r in pindex.significant_terms(["table"],
                                              m_terms=8).collect()]
    out = ls.significant_terms(["table"], m_terms=8)
    got = [(r.term, int(r.df_fg), int(r.df_bg), float(r.lift))
           for r in out.itertuples(index=False)]
    assert got == want


def test_serve_more_like_this_matches_spark(pindex, index_dir):
    ls = LocalSearcher(index_dir)
    for src in (5, 42):
        want = [(r["doc_id"], round(r["score"], 9))
                for r in pindex.more_like_this(src, m_terms=5,
                                               k=10).collect()]
        got = [(d, round(s, 9)) for d, s in
               ls.more_like_this(src, m_terms=5, k=10)]
        assert got == want, src
    assert ls.more_like_this(10**9) == []


def test_serve_collapse_null_group_single_bucket(spark, tmp_path):
    """NULL collapse values form ONE group at both tiers (Solr
    nullPolicy=collapse)."""
    import pyspark.sql.functions as F

    from katta_spark.index import PhysicalIndex, build_index
    from katta_spark.corpus import synthetic_corpus, with_ingest_columns

    d = str(tmp_path / "idx")
    docs = with_ingest_columns(synthetic_corpus(spark, 300)).withColumn(
        "lang",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    build_index(spark, docs, d, n_groups=1, block_range=64)
    idx = PhysicalIndex(spark, d)
    ls = LocalSearcher(d)
    want = [(r["doc_id"], round(r["score"], 9))
            for r in idx.collapse_topk(["import"], "lang",
                                       k=10).collect()]
    out = ls.collapse_topk(["import"], "lang", k=10)
    got = [(int(r.doc_id), round(float(r.score), 9))
           for r in out.itertuples(index=False)]
    assert got == want
    # exactly one NULL head can appear
    assert int(out["lang"].isna().sum()) <= 1


def test_mlt_tombstoned_source_returns_empty(spark, corpus, tmp_path):
    """MoreLikeThis from a DELETED doc returns empty at every tier —
    recommending from a tombstoned source would resurrect it (the
    delete rule get_docs enforces for realtime get)."""
    from katta_spark.index import PhysicalIndex, build_index
    from katta_spark.index.delete import delete_docs

    d = str(tmp_path / "idx")
    build_index(spark, corpus.limit(300), d, n_groups=1, block_range=64)
    idx = PhysicalIndex(spark, d)
    src = int(idx.matched_docs(["import"]).limit(1).first()["doc_id"])
    assert idx.more_like_this(src, k=5).count() > 0  # live: answers
    delete_docs(spark, d, [src])
    idx = PhysicalIndex(spark, d)
    assert idx.more_like_this(src, k=5).count() == 0
    ls = LocalSearcher(d)
    assert ls.more_like_this(src, k=5) == []


def test_highlight_empty_terms_plain_snippet(pindex, index_dir):
    """An empty term list yields plain leading snippets with NO
    markers at both tiers (the degenerate regex '()' must never
    interleave pre/post between characters)."""
    ls = LocalSearcher(index_dir)
    hits = ls.topk(["import"], k=3)
    out = ls.highlight(hits, [], width=40)
    assert all("<em>" not in s for s in out["snippet"])
    assert all(len(s) <= 40 for s in out["snippet"])
    sp = pindex.highlight(
        pindex.topk(["import"], k=3), [], width=40
    ).collect()
    assert all("<em>" not in r["snippet"] for r in sp)


def test_date_gap_spec_multi_unit_refuses(index_dir):
    """'+1DAY'/'+1DAYS'/'DAY' are the same unit; a MULTI-unit gap
    ('+2DAY') raises instead of silently returning 1-unit buckets."""
    import pytest

    from katta_spark.ops.timeseries import gap_unit

    assert gap_unit("DAY") == gap_unit("+1DAY") == gap_unit("+1DAYS")
    with pytest.raises(ValueError):
        gap_unit("+2DAY")
    with pytest.raises(ValueError):
        gap_unit("FORTNIGHT")


def test_sigterms_sampler_bounded_and_deterministic(index_dir):
    """max_fg caps the foreground with a deterministic hash-uniform
    sample: repeated calls agree exactly, n_fg is capped, and the
    sampled top terms stay plausible (subset of vocabulary, lift
    ordering intact)."""
    ls = LocalSearcher(index_dir)
    _, n_full = ls._sigterms_fg(["import"], "or")
    vc1, n1 = ls._sigterms_fg(["import"], "or", max_fg=50)
    vc2, n2 = ls._sigterms_fg(["import"], "or", max_fg=50)
    assert n1 == n2 == 50 < n_full
    pd.testing.assert_series_equal(vc1.sort_index(), vc2.sort_index())
    out = ls.significant_terms(["import"], m_terms=5, max_fg=50)
    assert len(out) <= 5
    assert (out["lift"].to_numpy()[:-1]
            >= out["lift"].to_numpy()[1:]).all()


def test_serve_facet_options_match_spark(spark, tmp_path):
    """facet.field options (missing / sort=index / prefix /
    mincount) are option-for-option identical to the Spark tier at
    the node tier, including the NULL bucket and nulls-last rule."""
    import pyspark.sql.functions as F

    from katta_spark.corpus import synthetic_corpus, with_ingest_columns
    from katta_spark.index import PhysicalIndex, build_index

    d = str(tmp_path / "idx")
    docs = with_ingest_columns(synthetic_corpus(spark, 400)).withColumn(
        "lang",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    build_index(spark, docs, d, n_groups=1, block_range=64)
    idx = PhysicalIndex(spark, d)
    ls = LocalSearcher(d)
    for kw in [dict(), dict(missing=True), dict(sort="index"),
               dict(sort="index", missing=True), dict(prefix="p"),
               dict(mincount=20), dict(missing=True, mincount=20)]:
        want = [(r["lang"], r["cnt"])
                for r in idx.facet(["import"], "lang", n=10,
                                   **kw).collect()]
        got = ls.facet(["import"], "lang", n=10, **kw)
        assert got == want, kw


def test_serve_interval_facet_and_facet_queries_match_spark(pindex,
                                                            index_dir):
    ls = LocalSearcher(index_dir)
    ivals = [("small", 0, 120, True, False),
             ("mid", 100, 300, True, False),
             ("large", 250, 10**6, True, True)]
    want = [(r["label"], r["cnt"])
            for r in pindex.interval_facet(["data"], "dl",
                                           ivals).collect()]
    assert ls.interval_facet(["data"], "dl", ivals) == want
    qmap = {"qa": ["table"], "qb": ["dup", "key"],
            "qzero": ["nosuchterm"]}
    want = [(r["facet_q"], r["cnt"])
            for r in pindex.facet_queries(qmap).collect()]
    assert ls.facet_queries(qmap) == want


def test_serve_rare_terms_and_facet_stats_match_spark(pindex,
                                                      index_dir):
    ls = LocalSearcher(index_dir)
    want = [(r["path"], r["cnt"])
            for r in pindex.rare_terms(["scan"], "path",
                                       max_count=2, n=10).collect()]
    assert ls.rare_terms(["scan"], "path", max_count=2,
                         n=10) == want
    sp = pindex.facet_stats(["table"], "lang", "dl").collect()
    want = [(r["lang"], r["n"], r["min_v"], r["max_v"],
             round(r["sum_v"], 6), round(r["mean_v"], 6))
            for r in sp]
    out = ls.facet_stats(["table"], "lang", "dl")
    got = [(r.lang, int(r.n), float(r.min_v), float(r.max_v),
            round(float(r.sum_v), 6), round(float(r.mean_v), 6))
           for r in out.itertuples(index=False)]
    assert got == want


def test_serve_term_vectors_adjacency_sampler_match_spark(pindex,
                                                          index_dir):
    ls = LocalSearcher(index_dir)
    want = sorted(
        (r["doc_id"], r["term"], r["tf"], r["df"],
         round(r["tfidf"], 9))
        for r in pindex.term_vectors([3, 11]).collect()
    )
    out = ls.term_vectors([3, 11])
    got = sorted(
        (int(r.doc_id), r.term, int(r.tf), int(r.df),
         round(float(r.tfidf), 9))
        for r in out.itertuples(index=False)
    )
    assert got == want
    qmap = {"qa": ["table"], "qb": ["dup", "key"],
            "qc": ["spark", "vector"]}
    want = [(r["key1"], r["key2"], r["cnt"])
            for r in pindex.adjacency_matrix(qmap).collect()]
    assert ls.adjacency_matrix(qmap) == want
    want = sorted(
        (r["doc_id"], round(r["score"], 9), r["lang"],
         r["rank_in_key"])
        for r in pindex.diversified_sampler(
            ["import", "table"], "lang", max_per_key=2,
            shard_size=6).collect()
    )
    out = ls.diversified_sampler(["import", "table"], "lang",
                                 max_per_key=2, shard_size=6)
    got = sorted(
        (int(r.doc_id), round(float(r.score), 9), r.lang,
         int(r.rank_in_key))
        for r in out.itertuples(index=False)
    )
    assert got == want


def test_serve_gscore_ngroups_expand_match_spark(pindex, index_dir):
    ls = LocalSearcher(index_dir)
    for sm in ("sum", "avg", "max", "min"):
        want = [(r["lang"], r["n_hits"], round(r["score"], 6))
                for r in pindex.group_score_topk(
                    ["import", "table"], "lang", score_mode=sm,
                    k=6).collect()]
        out = ls.group_score_topk(["import", "table"], "lang",
                                  score_mode=sm, k=6)
        got = [(r.lang, int(r.n_hits), round(float(r.score), 6))
               for r in out.itertuples(index=False)]
        assert got == want, sm
    row = pindex.ngroups(["import"], "lang").first()
    assert ls.ngroups(["import"], "lang") == \
        (row["n_groups"], row["n_hits"])
    want = sorted(
        (r["lang"], r["doc_id"], round(r["score"], 9), r["exp_rank"])
        for r in pindex.expand_topk(["import", "table"], "lang",
                                    k=4, n_expand=2).collect()
    )
    out = ls.expand_topk(["import", "table"], "lang", k=4, n_expand=2)
    got = sorted(
        (r.lang, int(r.doc_id), round(float(r.score), 9),
         int(r.exp_rank)) for r in out.itertuples(index=False)
    )
    assert got == want


def test_serve_suggesters_and_fmetric_match_spark(pindex, index_dir):
    ls = LocalSearcher(index_dir)
    want = [(r["term"], r["df"])
            for r in pindex.suggest_regex("(s|b).*", n=10).collect()]
    assert ls.suggest_regex("(s|b).*", n=10) == want
    want = [(r["term"], r["df"])
            for r in pindex.suggest_infix("ar", n=10).collect()]
    assert ls.suggest_infix("ar", n=10) == want
    want = [(r["lang"], r["cnt"], round(r["metric_avg"], 6))
            for r in pindex.facet_by_metric(["table"], "lang", "dl",
                                            n=5).collect()]
    out = ls.facet_by_metric(["table"], "lang", "dl", n=5)
    got = [(r.lang, int(r.cnt), round(float(r.metric_avg), 6))
           for r in out.itertuples(index=False)]
    assert got == want


def test_suggest_regex_preserves_shorthand_classes(pindex, index_dir):
    r"""Regression (round-4 ADVICE): lowercasing the pattern turned
    \S into \s (and \D into \d, \W into \w), silently inverting the
    class — suggest_regex(r'\S+') matched nothing.  Both tiers must
    compile the ORIGINAL pattern case-insensitively instead."""
    ls = LocalSearcher(index_dir)
    got = ls.suggest_regex(r"\S+", n=10)
    assert got, r"\S+ must match every (non-field) term"
    want = [(r["term"], r["df"])
            for r in pindex.suggest_regex(r"\S+", n=10).collect()]
    assert got == want
    # Uppercase literals still match the lowercased catalog
    # (case-insensitive compile, Solr terms.regex FLAG_INSENSITIVE).
    assert ls.suggest_regex("(S|B).*", n=10) == \
        ls.suggest_regex("(s|b).*", n=10)
    # \d must keep meaning "digit": no term is all-digits in the
    # synthetic corpus vocabulary unless it really is.
    only_digits = ls.suggest_regex(r"\d+", n=50)
    assert all(t.isdigit() for t, _ in only_digits)


def test_fmetric_all_null_bucket_ranks_last():
    """Regression (round-4 ADVICE): a facet bucket whose metric
    values are all NULL must merge to metric_avg NULL and rank LAST
    (Spark desc_nulls_last), not 0.0 ranked among real averages."""
    import pandas as pd
    from katta_spark.index.serve import _fmetric_finalize

    parts = pd.DataFrame({
        "lang": ["en", "en", "de", "fr"],
        "cnt": [2, 1, 3, 2],
        "sum_v": [4.0, 2.0, 0.0, -6.0],
        "n_v": [2, 1, 0, 2],   # 'de' bucket: all metric values NULL
    })
    out = _fmetric_finalize(parts, "lang", n=3)
    # en avg = 6/3 = 2.0, fr avg = -3.0, de = NULL -> last
    assert list(out["lang"]) == ["en", "fr", "de"]
    assert out["metric_avg"].isna().tolist() == [False, False, True]
