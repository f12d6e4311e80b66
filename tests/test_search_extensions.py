"""Search-surface extensions: search-after cursor pagination,
minimum-should-match, pivot facets, spellcheck, and function-query
boosts — each checked against the pure-Python BM25 oracle or an
independent Python mirror.

Reference parity: cursorMark/searchAfter and dismax mm are part of
the Solr surface the reference reaches through its SolrQuery
pass-through (katta-core/.../lib/lucene/LuceneServer.java:1314-1353
parses the full query string; the client forwards arbitrary Solr
params)."""

import pytest

from tests.oracle import PyBM25


@pytest.fixture(scope="module")
def py_oracle(pandas_docs):
    return PyBM25(
        [
            (int(r.doc_id), r.content)
            for r in pandas_docs.itertuples(index=False)
        ]
    )


# ------------------------------------------------------- cursor paging

def test_cursor_pages_tile_full_ranking(pindex, py_oracle):
    """Three k=7 pages chained by (score, doc_id) cursors reproduce
    the oracle's first 21 ranks exactly — page N+1 starts exactly
    where page N ended, no dup, no gap."""
    terms = ["import", "table"]
    want = py_oracle.topk(terms, k=21)
    got = []
    after = None
    for _ in range(3):
        page = pindex.topk(terms, k=7, after=after).collect()
        got += [(r["doc_id"], r["score"]) for r in page]
        after = (page[-1]["score"], page[-1]["doc_id"])
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_cursor_equals_offset_slice(pindex):
    """Cursor page 2 == offset slice [k, 2k) on both the WAND and the
    exhaustive paths (the two paths share score determinism)."""
    terms = ["scan", "key"]
    for wand in (True, False):
        p1 = pindex.topk(terms, k=6, use_wand=wand).collect()
        cur = (p1[-1]["score"], p1[-1]["doc_id"])
        by_cursor = pindex.topk(terms, k=6, after=cur, use_wand=wand).collect()
        by_offset = pindex.topk(terms, k=6, offset=6, use_wand=wand).collect()
        assert [(r["doc_id"], r["score"]) for r in by_cursor] == [
            (r["doc_id"], r["score"]) for r in by_offset
        ]


def test_cursor_past_end_is_empty(pindex, py_oracle):
    """A cursor at (or past) the worst hit yields an empty page, not
    an error — the client's loop termination condition."""
    terms = ["xylophonequarknebula7"]  # needle term: few matches
    all_hits = pindex.topk(terms, k=10**6, use_wand=False).collect()
    if not all_hits:
        pytest.skip("needle term absent from this corpus")
    last = all_hits[-1]
    nxt = pindex.topk(
        terms, k=5, after=(last["score"], last["doc_id"])
    ).collect()
    assert nxt == []


def test_search_response_cursor(pindex):
    """Envelope + cursor: numFound stays whole-set (Solr cursorMark
    semantics), pages tile, next_cursor(empty) ends the loop."""
    r1 = pindex.search_response("import", k=5)
    rows1 = r1.hits.collect()
    cur = pindex.next_cursor(rows1)
    r2 = pindex.search_response("import", k=5, after=cur)
    rows2 = r2.hits.collect()
    assert r2.num_found == r1.num_found
    full = pindex.search_response("import", k=10).hits.collect()
    assert [r["doc_id"] for r in rows1 + rows2] == [
        r["doc_id"] for r in full
    ]
    assert pindex.next_cursor([]) is None


# ---------------------------------------------------------- min match

def test_min_match_matches_python(pindex, py_oracle):
    # terms chosen to co-occur partially: mm=2 must be a strict
    # subset of OR and a strict superset of AND (asserted below so
    # the test cannot go vacuous if the corpus generator changes)
    terms = ["import", "parse", "request"]
    got = pindex.topk(terms, k=15, min_match=2).collect()
    ts = sorted(set(terms))
    cand = [
        d
        for d, c in py_oracle.tf.items()
        if sum(1 for t in ts if t in c) >= 2
    ]
    scored = sorted(
        ((d, py_oracle.score(d, ts)) for d in cand),
        key=lambda x: (-x[1], x[0]),
    )[:15]
    assert [r["doc_id"] for r in got] == [d for d, _ in scored]
    for r, (_, s) in zip(got, scored):
        assert r["score"] == pytest.approx(s, abs=1e-9)
    # non-vacuity: the mm=2 candidate set sits strictly between AND
    # and OR for this term set
    n_and = len(
        [d for d, c in py_oracle.tf.items()
         if sum(1 for t in ts if t in c) == 3]
    )
    n_or = len(py_oracle.matches(ts))
    assert n_and < len(cand) < n_or
    assert len(cand) > 0


def test_min_match_bounds(pindex, py_oracle):
    """mm=1 degrades to OR; mm=n_terms equals AND."""
    terms = ["scan", "merge"]
    as_or = pindex.topk(terms, k=10).collect()
    mm1 = pindex.topk(terms, k=10, min_match=1).collect()
    assert [(r["doc_id"], r["score"]) for r in mm1] == [
        (r["doc_id"], r["score"]) for r in as_or
    ]
    as_and = pindex.topk(terms, k=10, mode="and").collect()
    mm2 = pindex.topk(terms, k=10, min_match=2).collect()
    assert [(r["doc_id"], r["score"]) for r in mm2] == [
        (r["doc_id"], r["score"]) for r in as_and
    ]


# --------------------------------------------------------- pivot facet

def test_pivot_facet_matches_python(pindex, py_oracle, pandas_docs):
    meta = {
        int(r.doc_id): (r.lang, r.repo)
        for r in pandas_docs.itertuples(index=False)
    }
    got = pindex.pivot_facet(["import"], "lang", "repo", n1=2, n2=2).collect()
    pairs: dict[tuple, int] = {}
    for d in py_oracle.matches(["import"]):
        pairs[meta[d]] = pairs.get(meta[d], 0) + 1
    parent: dict[str, int] = {}
    for (l, _), c in pairs.items():
        parent[l] = parent.get(l, 0) + c
    top_parents = sorted(parent, key=lambda l: (-parent[l], l))[:2]
    want = []
    for l in top_parents:
        kids = sorted(
            ((c, r) for (pl, r), c in pairs.items() if pl == l),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        for c, r in kids:
            want.append((l, parent[l], r, c))
    assert [
        (r["lang"], r["parent_cnt"], r["repo"], r["cnt"]) for r in got
    ] == want


# ---------------------------------------------------------- spellcheck

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_spellcheck_matches_python(pindex, py_oracle):
    word = "imprt"  # one deletion from 'import'
    got = pindex.spellcheck(word, max_edits=2, n=5).collect()
    cands = [
        (t, _lev(t, word), d)
        for t, d in py_oracle.df.items()
        if 0 < _lev(t, word) <= 2
    ]
    want = sorted(cands, key=lambda x: (x[1], -x[2], x[0]))[:5]
    assert [(r["term"], r["dist"], r["df"]) for r in got] == want
    assert any(r["term"] == "import" for r in got)


def test_spellcheck_excludes_exact_and_field_terms(pindex):
    rows = pindex.spellcheck("import", max_edits=2, n=20).collect()
    assert all(r["term"] != "import" for r in rows)
    assert all(":" not in r["term"] for r in rows)


# ------------------------------------------------------ suggest_phrase

def test_suggest_phrase_matches_python(pindex, py_oracle, pandas_docs):
    """ES phrase suggester mirror: per-position catalog candidates
    (lev<=2, incl. the word itself at dist 0), phrase lattice ranked
    by add-1 smoothed bigram log-likelihood minus the edit penalty."""
    import itertools
    import math
    from collections import Counter

    from katta_spark.tokenizer import py_tokenize

    words, max_edits, per_word, n = ["imprt", "retur"], 2, 3, 5
    got = pindex.suggest_phrase(
        words, max_edits=max_edits, per_word=per_word, n=n
    ).collect()

    big: Counter = Counter()
    vocab: set = set()
    for r in pandas_docs.itertuples(index=False):
        toks = py_tokenize(r.content)
        vocab.update(toks)
        big.update(zip(toks, toks[1:]))
    hist: Counter = Counter()
    for (w1, _), c in big.items():
        hist[w1] += c
    v = float(len(vocab))

    cands = []
    for w in words:
        cs = [
            (t, _lev(t, w), d)
            for t, d in py_oracle.df.items()
            if ":" not in t
            and abs(len(t) - len(w)) <= max_edits
            and _lev(t, w) <= max_edits
        ]
        cs.sort(key=lambda x: (x[1], -x[2], x[0]))
        cands.append([(t, dist) for t, dist, _ in cs[:per_word]])

    scored = []
    for combo in itertools.product(*cands):
        terms = [t for t, _ in combo]
        dist = sum(d for _, d in combo)
        lp = sum(
            math.log(
                (big.get((a, b), 0) + 1.0) / (hist.get(a, 0) + v)
            )
            for a, b in zip(terms, terms[1:])
        )
        scored.append((" ".join(terms), dist, lp - 1.0 * dist))
    scored.sort(key=lambda x: (-x[2], x[0]))
    want = scored[:n]

    assert [(r["phrase"], r["total_dist"]) for r in got] == [
        (p, d) for p, d, _ in want
    ]
    for r, (_, _, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-6)
    # the obvious correction ranks first
    assert got[0]["phrase"] == "import return"


# ------------------------------------------------------------- dismax

def test_dismax_matches_python_max(pindex, py_oracle):
    """tie=0: per-doc score is the MAX of per-clause BM25 scores."""
    terms = ["import", "table", "scan"]
    got = pindex.dismax_topk(terms, tie=0.0, k=15).collect()
    scored = []
    for d in py_oracle.matches(terms):
        per = [py_oracle.score(d, [t]) for t in terms
               if t in py_oracle.tf[d]]
        scored.append((d, max(per)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    want = scored[:15]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_dismax_tie1_equals_or_sum(pindex):
    """tie=1.0 degrades to the plain OR sum (max + 1*(sum-max))."""
    terms = ["scan", "merge"]
    dm = pindex.dismax_topk(terms, tie=1.0, k=10).collect()
    od = pindex.topk(terms, k=10, use_wand=False).collect()
    assert [r["doc_id"] for r in dm] == [r["doc_id"] for r in od]
    for a, b in zip(dm, od):
        assert a["score"] == pytest.approx(b["score"], abs=1e-9)


# ---------------------------------------------------------- facet.query

def test_facet_queries_match_python(pindex, py_oracle):
    qmap = {"has_import": ["import"], "both": ["scan", "merge"],
            "none": ["xylophonequarknebula7zz"]}
    got = {
        r["facet_q"]: r["cnt"]
        for r in pindex.facet_queries(qmap, mode="and").collect()
    }
    want = {
        label: len(py_oracle.matches(terms, mode="and"))
        for label, terms in qmap.items()
    }
    assert got == want
    assert got["none"] == 0  # Solr parity: zero-hit queries report 0


# --------------------------------------------------------- boost func

def test_boost_func_matches_python(pindex, py_oracle):
    from pyspark.sql import functions as F

    terms = ["table"]
    boost = F.lit(1.0) + F.lit(1.0) / (
        F.lit(1.0) + F.col("dl").cast("double") / F.lit(100.0)
    )
    got = pindex.topk_boosted(terms, boost, k=12).collect()
    scored = [
        (
            d,
            py_oracle.score(d, terms)
            * (1.0 + 1.0 / (1.0 + py_oracle.dl[d] / 100.0)),
        )
        for d in py_oracle.matches(terms)
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    want = scored[:12]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)
    # the multiplier really applied: every boosted score exceeds the
    # plain BM25 score of the same doc (boost > 1 by construction)
    plain = {
        r["doc_id"]: r["score"]
        for r in pindex.scored_docs(terms).collect()
    }
    assert all(r["score"] > plain[r["doc_id"]] for r in got)


# ------------------------------------------------- significant terms

def test_significant_terms_matches_python(pindex, py_oracle, pandas_docs):
    """lift ranking == an independent Python mirror over the stored
    docs; query terms excluded; lift > 1 for genuinely foreground-
    concentrated terms."""
    from collections import Counter

    from katta_spark.tokenizer import py_tokenize

    qterms, min_df, m = ["parse"], 2, 10
    term_sets = {
        int(r.doc_id): set(py_tokenize(r.content))
        for r in pandas_docs.itertuples(index=False)
    }
    fg_ids = [d for d, ts in term_sets.items() if "parse" in ts]
    n_fg, n_all = len(fg_ids), len(term_sets)
    df_fg = Counter(t for d in fg_ids for t in term_sets[d])
    df_bg = Counter(t for ts in term_sets.values() for t in ts)
    rows = [
        (t, c, df_bg[t], (c / n_fg) / (df_bg[t] / n_all))
        for t, c in df_fg.items()
        if c >= min_df and t not in qterms
    ]
    rows.sort(key=lambda r: (-r[3], -r[1], r[0]))
    want = [(t, fg, bg, round(lift, 6)) for t, fg, bg, lift in rows[:m]]

    got = [
        (r["term"], r["df_fg"], r["df_bg"], r["lift"])
        for r in pindex.significant_terms(qterms, m_terms=m,
                                          min_df=min_df).collect()
    ]
    assert got == want
    assert all(r[3] > 1.0 for r in got[:3])  # head terms are enriched


def test_sorted_by_func_matches_python(pindex, py_oracle):
    """Function-query sort: matches of 'import' ordered by |dl-50|
    asc equals the python mirror (doc_id tie-break)."""
    from pyspark.sql import functions as F

    got = [
        (r["doc_id"], r["sortv"])
        for r in pindex.sorted_by_func(
            ["import"], F.abs(F.col("dl") - F.lit(50)),
            ["doc_id"], 12,
        ).collect()
    ]
    want = sorted(
        ((d, abs(py_oracle.dl[d] - 50)) for d in py_oracle.matches(["import"])),
        key=lambda x: (x[1], x[0]),
    )[:12]
    assert got == want


def test_ngroups_counts_distinct_groups(pindex, py_oracle, pandas_docs):
    langs = {
        int(r.doc_id): r.lang for r in pandas_docs.itertuples(index=False)
    }
    m = py_oracle.matches(["import"])
    row = pindex.ngroups(["import"], "lang").collect()[0]
    assert row["n_hits"] == len(m)
    assert row["n_groups"] == len({langs[d] for d in m})


def test_span_first_matches_python(pindex, py_oracle, pandas_docs):
    """SpanFirst(import, end): exactly the docs whose first 'import'
    falls in the first `end` analyzed positions, BM25-ranked."""
    from katta_spark.tokenizer import py_tokenize

    end = 4
    got = [(r["doc_id"], r["score"])
           for r in pindex.span_first_topk("import", end, k=200).collect()]
    want = []
    for r in pandas_docs.itertuples(index=False):
        toks = py_tokenize(r.content)
        if "import" in toks[:end]:
            want.append((int(r.doc_id), py_oracle.score(int(r.doc_id),
                                                        ["import"])))
    want.sort(key=lambda x: (-x[1], x[0]))
    assert [d for d, _ in got] == [d for d, _ in want[:200]]
    for (d, s), (_, ws) in zip(got, want):
        assert s == pytest.approx(ws, abs=1e-9)


def test_span_first_is_monotone_in_end(pindex, py_oracle):
    """Matches grow monotonically with the window and never exceed
    the unconstrained term match set ('import' leads most synthetic
    files, so the first-window set is large by construction — the
    position filter is exercised by test_span_first_matches_python,
    which pins exact membership per doc)."""
    allm = set(py_oracle.matches(["import"]))
    big = 10**6
    m1 = {r["doc_id"] for r in pindex.span_first_topk("import", 1, k=big).collect()}
    m3 = {r["doc_id"] for r in pindex.span_first_topk("import", 3, k=big).collect()}
    assert m1 <= m3 <= allm and m1


def test_suggest_infix_contains_and_ranks(pindex, py_oracle):
    got = [(r["term"], r["df"]) for r in pindex.suggest_infix("ar", n=8).collect()]
    want = sorted(
        ((t, df) for t, df in py_oracle.df.items() if "ar" in t),
        key=lambda x: (-x[1], x[0]),
    )[:8]
    assert got == want


def test_explain_score_parts_sum_to_query_score(pindex, py_oracle):
    """debugQuery parity: per-term parts sum to the engine's BM25
    score for the doc, and tf/df match the python oracle."""
    terms = ["import", "parse"]
    hit = pindex.topk(terms, k=1).collect()[0]
    parts = pindex.explain_score(hit["doc_id"], terms).collect()
    assert abs(sum(p["part"] for p in parts) - hit["score"]) < 1e-9
    for p in parts:
        assert p["df"] == py_oracle.df[p["term"]]
        assert p["part"] == pytest.approx(
            py_oracle.score(hit["doc_id"], [p["term"]]), abs=1e-9
        )


def test_segments_info_matches_manifest(pindex):
    rows = pindex.segments_info().collect()
    assert rows and all(r["status"] == "done" for r in rows)
    assert sum(r["n_postings"] for r in rows) > 0
    assert {(r["commit"], r["group"]) for r in rows} == {
        ("c0", g) for g in range(len(rows))
    }


def test_span_first_plan_pruned_positional_no_docs(pindex):
    """SpanFirst reads ONLY the pruned positional postings scan: the
    term filter is pushed, position columns are read, and the docs
    table (toks/content) appears nowhere in the plan."""
    df = pindex.span_first_topk("import", 4, k=10)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "pos_lens" in plan
    assert "toks" not in plan and "content" not in plan


def test_topk_sorted_composite_matches_python(pindex, py_oracle, pandas_docs):
    """sort=score desc, dl asc: composite order with doc_id final
    tie-break matches the python mirror."""
    dls = {int(r.doc_id): py_oracle.dl[int(r.doc_id)]
           for r in pandas_docs.itertuples(index=False)}
    got = [(r["doc_id"], r["dl"])
           for r in pindex.topk_sorted(["import"], [("dl", "asc")],
                                       k=15).collect()]
    want = sorted(
        ((d, dls[d]) for d in py_oracle.matches(["import"])),
        key=lambda x: (-py_oracle.score(x[0], ["import"]), x[1], x[0]),
    )[:15]
    assert got == want


def test_suggest_regex_whole_term_anchored(pindex, py_oracle):
    import re

    got = [(r["term"], r["df"])
           for r in pindex.suggest_regex("im.*t|pa.s.*", n=10).collect()]
    pat = re.compile(r"^(?:im.*t|pa.s.*)$")
    want = sorted(
        ((t, df) for t, df in py_oracle.df.items() if pat.match(t)),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert got == want and got


# --------------------------------------------------------------- rerank

def test_rerank_matches_python(pindex, py_oracle):
    """Solr ReRankQParser parity against the pure-Python oracle:
    top-N candidates by the main query, combined = main + W*rerank
    (0 when the rerank query misses the candidate), reordered, k.
    Non-vacuity asserted: the rerank must actually reorder the
    candidate prefix AND at least one candidate must be missed by
    the rerank query (exercising the coalesce-to-main branch)."""
    main, rq, n, w, k = ["import", "table"], ["parse", "scan"], 25, 2.0, 10
    cand = py_oracle.topk(main, k=n)
    rset = set(py_oracle.matches(rq))
    want = sorted(
        (
            (d, s + (w * py_oracle.score(d, rq) if d in rset else s * 0.0))
            for d, s in cand
        ),
        key=lambda x: (-x[1], x[0]),
    )[:k]
    got = pindex.rerank_topk(main, rq, rerank_docs=n, weight=w, k=k).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)
    # non-vacuous: reordering happened and some candidate missed rq
    assert [d for d, _ in want] != [d for d, _ in cand[:k]]
    assert any(d not in rset for d, _ in cand)


def test_rerank_window_is_closed(pindex, py_oracle):
    """Docs outside the top-N window can never enter the reranked
    result (Solr reRankDocs semantics) — even when a doc just past
    the cutoff would outscore everything under the combined score."""
    main, rq = ["import", "table"], ["parse", "scan"]
    small = pindex.rerank_topk(main, rq, rerank_docs=5, weight=50.0,
                               k=5).collect()
    cand_ids = {d for d, _ in py_oracle.topk(main, k=5)}
    assert {r["doc_id"] for r in small} <= cand_ids


def test_rerank_stage2_plan_prunes_blocks(pindex):
    """Scale pin: stage 2's postings scan must carry BOTH pruning
    joins — term DataFilters AND the broadcast block_id join — so the
    rerank never decodes blocks without a candidate."""
    plan = pindex.rerank_topk(
        ["import"], ["parse"], rerank_docs=10, k=5
    )._jdf.queryExecution().executedPlan().toString()
    # two broadcast joins on the stage-2 side: block_id prune + combine
    assert plan.count("BroadcastHashJoin") >= 3
    assert "block_id" in plan


# -------------------------------------------------------------- span not

def _py_span_not(py_oracle, pandas_docs, include, exclude, pre, post, k):
    from katta_spark.tokenizer import py_tokenize
    from katta_spark.fulltext.analysis import B, K1

    out = []
    for r in pandas_docs.itertuples(index=False):
        toks = py_tokenize(r.text if hasattr(r, "text") else r.content)
        inc_pos = [i for i, t in enumerate(toks) if t == include]
        exc_pos = {i for i, t in enumerate(toks) if t == exclude}
        surv = sum(
            1
            for p in inc_pos
            if not any(q in exc_pos for q in range(p - pre, p + post + 1))
        )
        if surv:
            dl = py_oracle.dl[int(r.doc_id)]
            tfn = surv * (K1 + 1.0) / (
                surv + K1 * (1.0 - B + B * dl / py_oracle.avgdl)
            )
            out.append((int(r.doc_id), py_oracle.idf(include) * tfn))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_span_not_matches_python(pindex, py_oracle, pandas_docs):
    """SpanNot parity vs a positional python mirror; non-vacuity:
    the exclusion must reduce the surviving-span count (and hence
    the score) of at least one matching doc vs the plain term query."""
    got = pindex.span_not_topk("import", "sys", pre=2, post=2,
                               k=12).collect()
    want = _py_span_not(py_oracle, pandas_docs, "import", "sys", 2, 2, 12)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)
    plain = dict(py_oracle.topk(["import"], k=10**6))
    surv_all = dict(
        _py_span_not(py_oracle, pandas_docs, "import", "sys", 2, 2, 10**6)
    )
    assert any(
        d in plain and s < plain[d] - 1e-12 for d, s in surv_all.items()
    )  # exclusion really fired (reduced tf somewhere)


def test_span_not_zero_window_equals_plain_topk(pindex):
    """pre=post=0 excludes only same-position overlap, which distinct
    terms never have — must equal the single-term top-k exactly."""
    a = pindex.span_not_topk("scan", "table", pre=0, post=0, k=10).collect()
    b = pindex.topk(["scan"], k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_span_not_rejects_same_term(pindex):
    with pytest.raises(ValueError):
        pindex.span_not_topk("scan", "scan")


def test_rrf_fuse_hand_computed(spark):
    """ES RRF on two tiny shortlists: hand-computed 1/(60+rank) sums,
    overlap doubles up, single-list docs keep one contribution."""
    from katta_spark.ops.search_eval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0), (4, 1.0)],  # rank by score desc, id asc
        "doc_id long, score double",
    )
    b = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (1, 0.7)],
        "doc_id long, cos double",
    )
    got = rrf_fuse([(a, "score"), (b, "cos")], n=10).collect()
    # a-ranks: 1->1, 2->2, 3->3, 4->4 ; b-ranks: 3->1, 5->2, 1->3
    want = {
        1: round(1 / 61 + 1 / 63, 6),
        2: round(1 / 62, 6),
        3: round(1 / 63 + 1 / 61, 6),
        4: round(1 / 64, 6),
        5: round(1 / 62, 6),
    }
    n_lists = {1: 2, 2: 1, 3: 2, 4: 1, 5: 1}
    assert {r["doc_id"]: r["rrf_score"] for r in got} == want
    assert {r["doc_id"]: r["n_lists"] for r in got} == n_lists
    # ordering: rrf_score desc, doc_id asc (1 and 3 tie -> 1 first)
    assert [r["doc_id"] for r in got] == [1, 3, 2, 5, 4]
    # n truncates on the rounded-score/id ordering
    assert [r["doc_id"] for r in rrf_fuse([(a, "score"), (b, "cos")],
                                          n=2).collect()] == [1, 3]


def test_rank_eval_known_metrics(spark):
    """Hand-computed P@k / MRR / NDCG on a tiny judged run."""
    import math

    from pyspark.sql import functions as F

    from katta_spark.ops.search_eval import rank_eval

    res = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2), ("q", 12, 3), ("q", 13, 4)],
        "qid string, doc_id long, rank int",
    )
    judg = spark.createDataFrame(
        [("q", 11, 1.0), ("q", 13, 1.0), ("q", 99, 1.0)],
        "qid string, doc_id long, grade double",
    )
    row = rank_eval(res, judg, k=4).first()
    assert row["n_judged"] == 3
    assert row["p_at_k"] == 0.5                       # 2 of 4
    assert row["mrr"] == 0.5                          # first hit rank 2
    dcg = 1 / math.log2(3) + 1 / math.log2(5)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert row["ndcg"] == round(dcg / idcg, 6)

    # query with no relevant judgments scores 0, not NULL
    res2 = spark.createDataFrame([("z", 1, 1)],
                                 "qid string, doc_id long, rank int")
    j2 = spark.createDataFrame([("z", 2, 0.0)],
                               "qid string, doc_id long, grade double")
    r2 = rank_eval(res2, j2, k=4).first()
    assert (r2["n_judged"], r2["mrr"], r2["ndcg"]) == (0, 0.0, 0.0)


def test_phrase_prefix_matches_python(pindex, py_oracle, pandas_docs):
    """Mirror: expand the prefix against the analyzed vocabulary
    (term order, cap 50), verify the consecutive phrase, score the
    BM25 sum over words + every expansion present in the doc."""
    from katta_spark.tokenizer import py_tokenize

    words, prefix, cap, k = ["class"], "h", 50, 10
    toks = {
        int(r.doc_id): py_tokenize(r.content)
        for r in pandas_docs.itertuples(index=False)
    }
    vocab = sorted({t for ts in toks.values() for t in ts})
    alts = [t for t in vocab if t.startswith(prefix)][:cap]
    assert alts, "test premise: prefix expands to something"
    m = len(words) + 1
    verified = set()
    for d, ts in toks.items():
        for i in range(len(ts) - m + 1):
            if ts[i:i + len(words)] == words and ts[i + m - 1] in alts:
                verified.add(d)
                break
    scored = {
        d: py_oracle.score(d, sorted(set(words) | set(alts)))
        for d in verified
    }
    want = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
    got = pindex.phrase_prefix_topk(words, prefix, k=k,
                                    max_expansions=cap).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]


def test_rank_feature_reorders_beyond_bm25_topk(pindex, py_oracle):
    """Mirror: final = BM25 + boost*v/(v+pivot) over the dl field,
    ranked across ALL matches."""
    terms, boost, pivot, k = ["import"], 5.0, 10.0, 10
    dl = py_oracle.dl
    scored = {
        d: py_oracle.score(d, terms)
        + boost * dl[d] / (dl[d] + pivot)
        for d in py_oracle.matches(terms)
    }
    want = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
    got = pindex.rank_feature_topk(terms, "dl", pivot=pivot, k=k,
                                   boost=boost).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]


def test_decay_functions_reference_points(spark, pindex, py_oracle):
    """ES decay contract: value at origin scores 1.0, at
    origin±scale (past offset) exactly `decay`, linear hits 0 outside
    its support; and the boosted ranking matches a python mirror."""
    import math

    from katta_spark.fulltext.scoring import _decay_params, decay_col

    df = spark.createDataFrame(
        [(200.0,), (350.0,), (50.0,), (1000.0,)], ["n_chars"])
    g = df.select(
        decay_col("gauss", "n_chars", 200.0, 150.0).alias("v")).collect()
    assert g[0]["v"] == 1.0
    assert abs(g[1]["v"] - 0.5) < 1e-12 and abs(g[2]["v"] - 0.5) < 1e-12
    lin = df.select(
        decay_col("linear", "n_chars", 200.0, 150.0).alias("v")).collect()
    assert lin[0]["v"] == 1.0 and abs(lin[1]["v"] - 0.5) < 1e-12
    assert lin[3]["v"] == 0.0  # outside the linear support

    # end-to-end mirror on the index: BM25 * gauss(dl)
    terms, origin, scale = ["import"], 30.0, 20.0
    p = _decay_params("gauss", origin, scale, 0.0, 0.5)
    scored = {
        d: py_oracle.score(d, terms)
        * math.exp(-((abs(py_oracle.dl[d] - origin)) ** 2)
                   / (2.0 * p["sigma2"]))
        for d in py_oracle.matches(terms)
    }
    want = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:10]
    got = pindex.topk_boosted(
        terms, decay_col("gauss", "dl", origin, scale), k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]


def test_linear_fuse_hand_computed(spark):
    """Two 3-item shortlists with known ranges: normalized weighted
    contributions sum; a single-score list normalizes to 1.0."""
    a = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], ["doc_id", "s"])
    b = spark.createDataFrame([(2, 7.0)], ["doc_id", "c"])
    from katta_spark.ops.search_eval import linear_fuse

    got = {r["doc_id"]: (r["lin_score"], r["n_lists"])
           for r in linear_fuse(
               [(a, "s", 0.5), (b, "c", 2.0)], n=10).collect()}
    # doc 2: 0.5*0.5 + 2.0*1.0 (degenerate range -> 1.0) = 2.25
    assert got[2] == (2.25, 2)
    assert got[1] == (0.5, 1)
    assert got[3] == (0.0, 1)


def test_linear_fuse_affine_invariance(spark):
    """Min-max normalization makes the fusion invariant to a
    positive affine transform (a*s + b, a > 0) of any one list's
    scores — the property that makes mixing BM25 with cosine sane."""
    from pyspark.sql import functions as F

    from katta_spark.ops.search_eval import linear_fuse

    a = spark.createDataFrame(
        [(1, 10.0), (2, 7.0), (3, 1.0)], ["doc_id", "s"])
    b = spark.createDataFrame(
        [(2, 0.9), (3, 0.5), (4, 0.1)], ["doc_id", "c"])
    base = [(r["doc_id"], r["lin_score"]) for r in
            linear_fuse([(a, "s", 0.6), (b, "c", 0.4)], n=10).collect()]
    a2 = a.select("doc_id", (F.col("s") * 3.5 + 100.0).alias("s"))
    scaled = [(r["doc_id"], r["lin_score"]) for r in
              linear_fuse([(a2, "s", 0.6), (b, "c", 0.4)],
                          n=10).collect()]
    assert scaled == base


def test_span_within_matches_python(pindex, py_oracle, pandas_docs):
    """Any-pair containment mirror: q of 'key' survives when some
    (fast, order) pair with order_pos - fast_pos <= width covers
    it; tf = surviving count, single-term BM25 on 'key'."""
    from katta_spark.tokenizer import py_tokenize

    lit, b1, b2, width = "key", "fast", "order", 4
    want_scores = {}
    for r in pandas_docs.itertuples(index=False):
        toks = py_tokenize(r.content)
        qs = [i for i, t in enumerate(toks) if t == lit]
        p1s = [i for i, t in enumerate(toks) if t == b1]
        p2s = [i for i, t in enumerate(toks) if t == b2]
        surv = sum(
            1 for q in qs
            if any(p1 <= q <= p2 <= p1 + width
                   for p1 in p1s for p2 in p2s)
        )
        if surv:
            d = int(r.doc_id)
            from katta_spark.fulltext.analysis import B, K1

            idf = py_oracle.idf(lit)
            dl = py_oracle.dl[d]
            tfn = (surv * (K1 + 1)) / (
                surv + K1 * (1 - B + B * dl / py_oracle.avgdl))
            want_scores[d] = idf * tfn
    want = sorted(want_scores.items(), key=lambda x: (-x[1], x[0]))[:10]
    got = pindex.span_within_topk(lit, b1, b2, k=10, width=width).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]


# -------------------------------------------- most_fields / distance / parent

def test_most_fields_sums_variants_with_own_df(spark, tmp_path):
    """ES most_fields: each variant keeps its OWN df and every
    matching variant's BM25 SUMS per doc — docs matching in both
    fields outrank single-field matches (unlike cross_fields' max)."""
    import math

    from katta_spark.index import PhysicalIndex, build_index
    from katta_spark.fulltext.analysis import B, K1

    # 'alpha' is a content token in docs 0-2 and the tag of docs 2-8
    rows = []
    for i in range(12):
        body = "alpha base word" if i < 3 else "base word other"
        tag = "alpha" if 2 <= i < 9 else "beta"
        rows.append((i, body, tag))
    df = spark.createDataFrame(rows, "doc_id long, content string, tag string")
    d = str(tmp_path / "mf_idx")
    build_index(spark, df, d, n_groups=2, block_range=64,
                store_positions=False, field_cols=["tag"])
    idx = PhysicalIndex(spark, d)

    got = {r["doc_id"]: r["score"]
           for r in idx.most_fields_topk(["alpha"], ["content", "tag"],
                                         k=12).collect()}
    n, avgdl = 12.0, 3.0
    def idf(dfc):
        return math.log(1.0 + (n - dfc + 0.5) / (dfc + 0.5))
    def tfn(tf, dl):
        return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
    want = {}
    for i in range(12):
        s = 0.0
        if i < 3:
            s += idf(3) * tfn(1, 3)       # content variant, df=3
        if 2 <= i < 9:
            s += idf(7) * tfn(1, 3)       # tag variant, OWN df=7
        if s:
            want[i] = s
    assert set(got) == set(want)
    for i, s in want.items():
        assert got[i] == pytest.approx(s, abs=1e-9), i
    # doc 2 matches both variants and must rank strictly first
    top = max(want.items(), key=lambda x: (x[1], -x[0]))
    assert top[0] == 2


def test_distance_feature_boosts_near_origin(pindex, py_oracle):
    """Mirror: final = BM25 + boost*pivot/(pivot+|dl-origin|) over the
    dl field, ranked across ALL matches; docs at the origin gain the
    full boost."""
    terms, boost, origin, pivot, k = ["import"], 5.0, 30.0, 10.0, 10
    dl = py_oracle.dl
    scored = {
        d: py_oracle.score(d, terms)
        + boost * pivot / (pivot + abs(dl[d] - origin))
        for d in py_oracle.matches(terms)
    }
    want = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
    got = pindex.distance_feature_topk(terms, "dl", origin=origin,
                                       pivot=pivot, k=k,
                                       boost=boost).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]
    for r in got:
        assert r["score"] == pytest.approx(
            r["feat_score"] + scored[r["doc_id"]]
            - (boost * pivot / (pivot + abs(dl[r["doc_id"]] - origin))),
            abs=1e-9,
        )


def test_has_parent_children_inherit_group_score(pindex, py_oracle,
                                                 pandas_docs):
    """Mirror: every doc (matching or not) carries its lang group's
    aggregate hit score; ties break by doc_id."""
    terms, k = ["import"], 15
    langs = {int(r.doc_id): r.lang
             for r in pandas_docs.itertuples(index=False)}
    per = {}
    for d in py_oracle.matches(terms):
        per.setdefault(langs[d], []).append(
            round(py_oracle.score(d, terms), 6))
    for mode, fn in (("max", max), ("sum", sum)):
        pscore = {g: round(fn(v), 6) for g, v in per.items()}
        rows = sorted(
            ((d, g, pscore[g]) for d, g in langs.items() if g in pscore),
            key=lambda x: (-x[2], x[0]),
        )[:k]
        got = pindex.has_parent_topk(terms, "lang", k=k,
                                     score_mode=mode).collect()
        assert [(r["doc_id"], r["parent"]) for r in got] == [
            (d, g) for d, g, _ in rows
        ], mode
        for r, (_, _, s) in zip(got, rows):
            assert r["score"] == pytest.approx(s, abs=1e-6), mode


def test_terms_set_per_doc_threshold(pindex, py_oracle, pandas_docs):
    """Mirror: doc matches when its distinct matched-term count >=
    (doc_id % 2 + 1); score is the plain OR BM25 sum."""
    terms, k = ["import", "scan", "merge"], 15
    want_rows = []
    for d in py_oracle.matches(terms):
        nt = sum(1 for t in set(terms) if t in py_oracle.tf[d])
        req = d % 2 + 1
        if nt >= req:
            want_rows.append((d, py_oracle.score(d, terms), nt))
    want_rows.sort(key=lambda x: (-x[1], x[0]))
    want = want_rows[:k]
    got = pindex.terms_set_topk(terms, "doc_id % 2 + 1", k=k).collect()
    assert [(r["doc_id"], round(r["score"], 9), r["n_matched"])
            for r in got] == [(d, round(s, 9), nt) for d, s, nt in want]
    # a threshold above len(terms) matches nothing
    assert pindex.terms_set_topk(terms, "99", k=5).count() == 0


def test_boosting_demotes_not_excludes(pindex, py_oracle):
    """Mirror: positive hits keep BM25 unless they also match the
    negative query (x nb); nb=1.0 degrades to the plain OR ranking."""
    pos, neg, nb, k = ["import"], ["scan"], 0.25, 15
    negset = set(py_oracle.matches(neg))
    scored = {
        d: py_oracle.score(d, pos) * (nb if d in negset else 1.0)
        for d in py_oracle.matches(pos)
    }
    want = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
    got = pindex.boosting_topk(pos, neg, negative_boost=nb, k=k).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]
    # demoted docs are still present (not excluded like a NOT clause)
    all_rows = pindex.boosting_topk(pos, neg, negative_boost=nb,
                                    k=len(scored)).collect()
    assert {r["doc_id"] for r in all_rows} == set(scored)
    ident = pindex.boosting_topk(pos, neg, negative_boost=1.0, k=10).collect()
    plain = pindex.topk(pos, k=10, use_wand=False).collect()
    assert [r["doc_id"] for r in ident] == [r["doc_id"] for r in plain]


def test_random_score_deterministic_seeded(pindex, py_oracle):
    """Mirror: score = hash_bucket(seed || doc_id)/N_BUCKETS (md5
    device); same seed reproduces exactly, different seed reshuffles."""
    import hashlib

    from katta_spark.ops.sampling import N_BUCKETS

    def rnd(doc_id, seed):
        h = hashlib.md5((seed + str(doc_id)).encode()).hexdigest()
        return round((int(h[:8], 16) % N_BUCKETS) / N_BUCKETS, 6)

    terms, k = ["import"], 12
    matched = py_oracle.matches(terms)
    want = sorted(((d, rnd(d, "s1")) for d in matched),
                  key=lambda x: (-x[1], x[0]))[:k]
    got = pindex.random_score_topk(terms, seed="s1", k=k).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == want
    again = pindex.random_score_topk(terms, seed="s1", k=k).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]
    other = pindex.random_score_topk(terms, seed="s2", k=k).collect()
    assert [r["doc_id"] for r in other] != [r["doc_id"] for r in got]


def test_combined_fields_term_centric(spark, tmp_path):
    """combined_fields vs most_fields on the same corpus: tf sums
    ACROSS fields before saturation and df is the union doc-set size
    — python mirror computes both expectations."""
    import math

    from katta_spark.fulltext.analysis import B, K1
    from katta_spark.index import PhysicalIndex, build_index

    # 'alpha' is a DOUBLE content token in docs 0-2 and the tag of
    # docs 2-8 (doc 2 has both: combined tf = 3)
    rows = []
    for i in range(12):
        body = "alpha alpha base" if i < 3 else "base word other"
        tag = "alpha" if 2 <= i < 9 else "beta"
        rows.append((i, body, tag))
    df = spark.createDataFrame(rows, "doc_id long, content string, tag string")
    d = str(tmp_path / "cf_idx")
    build_index(spark, df, d, n_groups=2, block_range=64,
                store_positions=False, field_cols=["tag"])
    idx = PhysicalIndex(spark, d)

    got = {r["doc_id"]: r["score"]
           for r in idx.combined_fields_topk(["alpha"], ["content", "tag"],
                                             k=12).collect()}
    n, avgdl = 12.0, 3.0
    union_df = len({0, 1, 2} | set(range(2, 9)))  # 9 docs
    idf = math.log(1.0 + (n - union_df + 0.5) / (union_df + 0.5))
    def tfn(tf, dl):
        return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
    want = {}
    for i in range(12):
        tfc = (2 if i < 3 else 0) + (1 if 2 <= i < 9 else 0)
        if tfc:
            want[i] = idf * tfn(tfc, 3)
    assert set(got) == set(want)
    for i, s in want.items():
        assert got[i] == pytest.approx(s, abs=1e-9), i
    # term-centric saturation: doc 2 (tf 2+1) must outrank docs 0-1
    # (tf 2) and docs 3-8 (tf 1), but by LESS than a linear sum would
    assert got[2] > got[0] > got[3]
    assert got[2] - got[0] < got[0] - got[3]


def test_distance_feature_null_field_keeps_bm25(spark, tmp_path):
    """A doc MISSING the numeric field keeps its plain BM25 (ES's
    additive distance_feature never sinks docs without the field) —
    feat_score coalesces to 0.0 instead of NULL-poisoning the sum."""
    from katta_spark.corpus import with_ingest_columns
    from katta_spark.index import PhysicalIndex, build_index

    rows = [
        ("r", f"p{i}.py", "c0", "python", "import alpha beta",
         10.0 * i if i != 1 else None)
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
              " content string, stars double"
    )
    d = str(tmp_path / "df_idx")
    build_index(spark, with_ingest_columns(df), d, n_groups=1,
                block_range=64)
    idx = PhysicalIndex(spark, d)
    got = {r["doc_id"]: (r["score"], r["feat_score"])
           for r in idx.distance_feature_topk(
               ["alpha"], "stars", origin=0.0, pivot=10.0, k=10,
               boost=5.0).collect()}
    assert len(got) == 4
    # identical content => identical BM25; doc with stars=0 at the
    # origin gets the full boost, the NULL doc gets exactly +0
    feats = {d: f for d, (_, f) in got.items()}
    base = {d: s - f for d, (s, f) in got.items()}
    assert len({round(b, 9) for b in base.values()}) == 1
    null_doc = [d for d, f in feats.items() if f == 0.0]
    assert len(null_doc) == 1
    full_boost = [d for d, f in feats.items() if f == 5.0]
    assert len(full_boost) == 1


def test_fuse_guards_reject_unbounded_inputs(spark):
    """Round-4 guard: the fusion windows are single-partition by
    design (shortlists only); an oversized input must fail loudly
    instead of silently one-partition-sorting it.  The guard is
    IN-PLAN (limit(cap+1) + assert_true) so it costs zero extra jobs
    and structurally bounds the window input; the error surfaces at
    execution."""
    import pytest
    from pyspark.sql import functions as F

    from katta_spark.ops.search_eval import linear_fuse, rrf_fuse

    big = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), F.rand(7).alias("score")
    )
    ok = big.limit(20)
    with pytest.raises(Exception, match="bounded top-k"):
        rrf_fuse([(ok, "score"), (big, "score")],
                 max_list_rows=1000).collect()
    with pytest.raises(Exception, match="bounded top-k"):
        linear_fuse([(big, "score", 1.0)], max_list_rows=1000).collect()
    # bounded inputs still fuse fine under the same cap
    assert rrf_fuse([(ok, "score"), (ok, "score")],
                    max_list_rows=1000, n=5).count() == 5
    assert linear_fuse([(ok, "score", 0.5), (ok, "score", 0.5)],
                       max_list_rows=1000, n=5).count() == 5
