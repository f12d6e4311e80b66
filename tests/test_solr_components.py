"""Solr component surfaces over the physical index: TermsComponent
(suggest), StatsComponent (field_stats), result grouping
(group_topk), MoreLikeThis — each checked against an independent
pure-Python mirror."""

import math

import pytest

from katta_spark.tokenizer import py_tokenize

from tests.oracle import PyBM25


@pytest.fixture(scope="module")
def py_oracle(pandas_docs):
    return PyBM25(
        [
            (int(r.doc_id), r.content)
            for r in pandas_docs.itertuples(index=False)
        ]
    )


def test_suggest_prefix_by_df(pindex, py_oracle):
    got = pindex.suggest("pa", n=5).collect()
    want = sorted(
        (
            (t, d)
            for t, d in py_oracle.df.items()
            if t.startswith("pa")
        ),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert [(r["term"], r["df"]) for r in got] == want
    # prefix with no matches is empty, not an error
    assert pindex.suggest("zzzz", n=5).count() == 0


def test_field_stats_matches_python(pindex, py_oracle):
    got = pindex.field_stats(["quark"], "dl").first()
    docs = py_oracle.matches(["quark"])
    vals = [float(py_oracle.dl[d]) for d in docs]
    assert got["n"] == len(vals)
    assert got["min_v"] == min(vals)
    assert got["max_v"] == max(vals)
    assert got["sum_v"] == pytest.approx(sum(vals), abs=1e-9)
    assert got["mean_v"] == pytest.approx(
        sum(vals) / len(vals), abs=1e-9
    )


def test_group_topk_matches_python(pindex, py_oracle, pandas_docs):
    langs = {
        int(r.doc_id): r.lang for r in pandas_docs.itertuples(index=False)
    }
    got = pindex.group_topk(["import"], "lang", k_per_group=3).collect()
    per_group: dict[str, list] = {}
    for d in py_oracle.matches(["import"]):
        per_group.setdefault(langs[d], []).append(
            (-py_oracle.score(d, ["import"]), d)
        )
    want = set()
    for lang, lst in per_group.items():
        for rank, (negs, d) in enumerate(sorted(lst)[:3], 1):
            want.add((lang, d, round(-negs, 9), rank))
    assert {
        (r["lang"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in got
    } == want


def test_more_like_this_matches_python(pindex, py_oracle, pandas_docs):
    src_id = 7
    content = pandas_docs.set_index("doc_id").loc[src_id, "content"]
    tf: dict[str, int] = {}
    for t in py_tokenize(content):
        tf[t] = tf.get(t, 0) + 1
    rep = sorted(
        tf,
        key=lambda t: (-tf[t] * py_oracle.idf(t), t),
    )[:5]
    scored = {
        d: py_oracle.score(d, rep)
        for d in py_oracle.matches(rep, "or")
        if d != src_id
    }
    want = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:10]
    got = pindex.more_like_this(src_id, m_terms=5, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]
    # the source doc never appears in its own MLT results
    assert src_id not in {r["doc_id"] for r in got}


def test_mlt_rep_terms_uses_idf_not_raw_tf(pindex, py_oracle):
    """High-tf but corpus-common terms (import, tf=2 in doc 0) must
    rank below rare needle terms (quark, df=#needle-docs) in the
    representative set — i.e. the selection really is tf*idf, not tf.
    With m_terms=3 doc 0's reps are its two singleton needle tokens +
    'quark', so every result doc is a needle doc."""
    got = pindex.more_like_this(0, m_terms=3, k=10).collect()
    quark_docs = set(py_oracle.matches(["quark"]))
    assert 0 < len(got) <= 10
    assert all(r["doc_id"] in quark_docs for r in got)
    assert all(r["doc_id"] != 0 for r in got)


def test_collapse_topk_matches_python(pindex, py_oracle, pandas_docs):
    """Field collapsing: one best doc per lang (tie doc_id asc),
    collapsed set re-ranked globally — CollapsingQParserPlugin
    semantics."""
    langs = {
        int(r.doc_id): r.lang for r in pandas_docs.itertuples(index=False)
    }
    got = pindex.collapse_topk(["import"], "lang", k=5).collect()
    best: dict[str, tuple[float, int]] = {}
    for d in py_oracle.matches(["import"]):
        key = (-py_oracle.score(d, ["import"]), d)
        if langs[d] not in best or key < best[langs[d]]:
            best[langs[d]] = key
    want = sorted(
        ((lang, d, -negs) for lang, (negs, d) in best.items()),
        key=lambda x: (-x[2], x[1]),
    )[:5]
    assert [
        (r["lang"], r["doc_id"], round(r["score"], 9)) for r in got
    ] == [(lang, d, round(s, 9)) for lang, d, s in want]
    # collapse invariant: at most one doc per group value
    assert len({r["lang"] for r in got}) == len(got)


def test_term_vectors_matches_python(pindex, py_oracle, pandas_docs):
    """TermVectorComponent: per-doc (term, tf, df, tfidf) equals the
    python tokenize + corpus-df mirror, for exactly the asked docs."""
    ids = [3, 11]
    texts = pandas_docs.set_index("doc_id").loc[ids, "content"]
    got = pindex.term_vectors(ids).collect()
    assert {r["doc_id"] for r in got} == set(ids)
    for doc_id in ids:
        tf: dict[str, int] = {}
        for t in py_tokenize(texts.loc[doc_id]):
            tf[t] = tf.get(t, 0) + 1
        rows = {
            r["term"]: (r["tf"], r["df"], round(r["tfidf"], 9))
            for r in got
            if r["doc_id"] == doc_id
        }
        want = {
            t: (
                n,
                py_oracle.df[t],
                round(n * py_oracle.idf(t), 9),
            )
            for t, n in tf.items()
        }
        assert rows == want


def test_elevate_topk_pins_and_excludes(pindex, py_oracle):
    """QueryElevation: pinned ids occupy ranks 1..n in the GIVEN
    order (unmatched pins score 0.0), excluded ids vanish, organic
    BM25 fills the tail."""
    organic = sorted(
        ((d, py_oracle.score(d, ["import"]))
         for d in py_oracle.matches(["import"])),
        key=lambda x: (-x[1], x[0]),
    )
    # pin: one matching doc (from mid-ranking) + one NON-matching doc
    pin_match = organic[5][0]
    non_match = next(
        d for d in sorted(py_oracle.tf) if "import" not in py_oracle.tf[d]
    )
    excl = organic[0][0]  # the organic #1 must disappear
    got = pindex.elevate_topk(
        ["import"], elevate_ids=[non_match, pin_match],
        k=8, exclude_ids=[excl],
    ).collect()
    got.sort(key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got[:2]] == [non_match, pin_match]
    assert got[0]["score"] == 0.0 and got[0]["elevated"]
    assert round(got[1]["score"], 9) == round(organic[5][1], 9)
    tail_want = [
        d for d, _ in organic
        if d not in {excl, pin_match, non_match}
    ][:6]
    assert [r["doc_id"] for r in got[2:]] == tail_want
    assert all(not r["elevated"] for r in got[2:])
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_join_topk_matches_python(pindex, py_oracle, pandas_docs):
    """Join qparser ({!join from=lang to=lang}parse as fq): top-k for
    'import' restricted to docs whose lang appears among the langs of
    docs matching 'parse' — join filters, never scores."""
    langs = {
        int(r.doc_id): r.lang for r in pandas_docs.itertuples(index=False)
    }
    got = pindex.join_topk(
        ["import"], "lang", "lang", ["parse"], k=8
    ).collect()
    allowed_langs = {langs[d] for d in py_oracle.matches(["parse"])}
    cand = [
        (d, py_oracle.score(d, ["import"]))
        for d in py_oracle.matches(["import"])
        if langs[d] in allowed_langs
    ]
    want = sorted(cand, key=lambda x: (-x[1], x[0]))[:8]
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]


def test_join_topk_no_inner_matches_is_empty(pindex):
    assert pindex.join_topk(
        ["import"], "lang", "lang", ["zzzznotaterm"], k=5
    ).count() == 0


def test_interval_facet_overlapping_counts(pindex, py_oracle):
    iv = [("a", 0, 40, True, False), ("b", 20, 400, True, True)]
    got = {
        r["label"]: r["cnt"]
        for r in pindex.interval_facet(["quark"], "dl", iv).collect()
    }
    vals = [py_oracle.dl[d] for d in py_oracle.matches(["quark"])]
    assert got == {
        "a": sum(1 for v in vals if 0 <= v < 40),
        "b": sum(1 for v in vals if 20 <= v <= 400),
    }
    # overlap region [20, 40) is counted in BOTH intervals
    both = sum(1 for v in vals if 20 <= v < 40)
    if both:
        assert got["a"] + got["b"] > len(vals)


def test_range_facet_other_partitions_matches(pindex, py_oracle):
    got = pindex.range_facet_other(["quark"], "dl", 30.0, 60.0).first()
    vals = [py_oracle.dl[d] for d in py_oracle.matches(["quark"])]
    assert got["before"] == sum(1 for v in vals if v < 30)
    assert got["between"] == sum(1 for v in vals if 30 <= v < 60)
    assert got["after"] == sum(1 for v in vals if v >= 60)
    assert got["before"] + got["between"] + got["after"] == len(vals)


def test_facet_stats_per_bucket(pindex, py_oracle, pandas_docs):
    langs = {
        int(r.doc_id): r.lang for r in pandas_docs.itertuples(index=False)
    }
    rows = pindex.facet_stats(["quark"], "lang", "dl").collect()
    per: dict[str, list[float]] = {}
    for d in py_oracle.matches(["quark"]):
        per.setdefault(langs[d], []).append(float(py_oracle.dl[d]))
    assert [r["lang"] for r in rows] == sorted(per)
    for r in rows:
        vals = per[r["lang"]]
        assert r["n"] == len(vals)
        assert r["min_v"] == min(vals)
        assert r["max_v"] == max(vals)
        assert r["mean_v"] == pytest.approx(sum(vals) / len(vals), abs=1e-6)


def test_expand_topk_members_follow_collapsed_heads(pindex, py_oracle,
                                                    pandas_docs):
    """Expand rows are exactly ranks 2..n+1 of each head group from
    the collapsed top-k (python mirror)."""
    field = "lang"
    meta = {int(r.doc_id): getattr(r, field)
            for r in pandas_docs.itertuples(index=False)}
    terms = ["import"]
    by_group: dict = {}
    for d in py_oracle.matches(terms):
        by_group.setdefault(meta[d], []).append(
            (-py_oracle.score(d, terms), d)
        )
    heads = sorted(
        (min(v), g) for g, v in by_group.items()
    )[:3]
    want = []
    for (_, _), g in [((0, 0), g) for _, g in heads]:
        members = sorted(by_group[g])[1:3]
        want += [(g, d, round(-s, 6), i + 1)
                 for i, (s, d) in enumerate(members)]
    want.sort(key=lambda x: (x[0], x[3]))
    got = [(r[field], r["doc_id"], round(r["score"], 6), r["exp_rank"])
           for r in pindex.expand_topk(terms, field, k=3,
                                       n_expand=2).collect()]
    assert got == want


def test_facet_missing_and_sort_index(spark, tmp_path):
    """facet.missing adds the NULL bucket; facet.sort=index orders
    buckets by value (Solr FacetComponent semantics) — on a corpus
    where some docs have no value for the facet field."""
    from katta_spark.index import PhysicalIndex, build_index

    rows = [
        (i, f"alpha beta doc{i}", None if i % 3 == 0 else f"g{i % 2}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string, grp string")
    d = str(tmp_path / "facet_idx")
    build_index(spark, df, d, n_groups=2, block_range=64,
                store_positions=False)
    idx = PhysicalIndex(spark, d)

    default = idx.facet(["alpha"], "grp", n=10).collect()
    assert all(r["grp"] is not None for r in default)
    assert {(r["grp"], r["cnt"]) for r in default} == {("g0", 4), ("g1", 4)}

    with_missing = idx.facet(["alpha"], "grp", n=10, missing=True).collect()
    assert {(r["grp"], r["cnt"]) for r in with_missing} == {
        ("g0", 4), ("g1", 4), (None, 4)
    }
    # nulls last within the ordering
    assert with_missing[-1]["grp"] is None

    by_index = idx.facet(["alpha"], "grp", n=10, sort="index",
                         missing=True).collect()
    assert [r["grp"] for r in by_index] == ["g0", "g1", None]


def test_facet_prefix_and_mincount(spark, tmp_path):
    """facet.prefix keeps only buckets starting with the prefix (and
    never the NULL bucket, as in Solr); facet.mincount drops buckets
    below the count floor."""
    from katta_spark.index import PhysicalIndex, build_index

    rows = [
        (0, "alpha one", "apple"), (1, "alpha two", "apricot"),
        (2, "alpha three", "apple"), (3, "alpha four", "banana"),
        (4, "alpha five", "banana"), (5, "alpha six", "ap"),
        (6, "alpha seven", None), (7, "beta eight", "apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string, grp string")
    d = str(tmp_path / "facet_prefix_idx")
    build_index(spark, df, d, n_groups=2, block_range=64,
                store_positions=False)
    idx = PhysicalIndex(spark, d)

    got = idx.facet(["alpha"], "grp", n=10, prefix="ap").collect()
    assert {(r["grp"], r["cnt"]) for r in got} == {
        ("apple", 2), ("apricot", 1), ("ap", 1)
    }
    # prefix composes with missing=True but NULL never matches a prefix
    got = idx.facet(["alpha"], "grp", n=10, prefix="ap",
                    missing=True).collect()
    assert all(r["grp"] is not None for r in got)

    got = idx.facet(["alpha"], "grp", n=10, mincount=2).collect()
    assert {(r["grp"], r["cnt"]) for r in got} == {
        ("apple", 2), ("banana", 2)
    }
    got = idx.facet(["alpha"], "grp", n=10, prefix="ap",
                    mincount=2).collect()
    assert {(r["grp"], r["cnt"]) for r in got} == {("apple", 2)}


def test_adjacency_matrix_pairwise_counts(pindex, py_oracle):
    """ES adjacency_matrix mirror: per-filter counts on the diagonal,
    intersection counts off-diagonal, empty intersections omitted."""
    qmap = {"a": ["import"], "b": ["table", "scan"], "c": ["quark"]}
    got = {
        (r["key1"], r["key2"]): r["cnt"]
        for r in pindex.adjacency_matrix(qmap).collect()
    }
    sets = {k: set(py_oracle.matches(t)) for k, t in qmap.items()}
    want = {}
    for k1 in sorted(qmap):
        for k2 in sorted(qmap):
            if k1 <= k2 and sets[k1] & sets[k2]:
                want[(k1, k2)] = len(sets[k1] & sets[k2])
    assert got == want
    # diagonal equals the plain facet.query counts
    for k in qmap:
        assert got[(k, k)] == len(sets[k])


def test_rare_terms_is_the_facet_tail(pindex, py_oracle, pandas_docs):
    """rare_terms returns exactly the buckets with cnt <= max_count,
    count-ascending — the complement of facet's head."""
    langs = {
        int(r.doc_id): r.lang for r in pandas_docs.itertuples(index=False)
    }
    counts: dict[str, int] = {}
    for d in py_oracle.matches(["quark"]):
        counts[langs[d]] = counts.get(langs[d], 0) + 1
    for mc in (1, 2, 10**6):
        got = [(r[0], r["cnt"])
               for r in pindex.rare_terms(["quark"], "lang",
                                          max_count=mc, n=50).collect()]
        want = sorted(((v, c) for v, c in counts.items() if c <= mc),
                      key=lambda x: (x[1], x[0]))
        assert got == want, mc


def test_common_terms_low_df_drives_matching(pindex, py_oracle):
    """CommonTermsQuery: pick a (rare, common) pair from the corpus
    df table; candidates = rare-term docs only, scores include the
    common term's contribution; all-common falls back to plain OR."""
    items = sorted(py_oracle.df.items(), key=lambda x: x[1])
    rare = next(t for t, d in items if 0 < d <= py_oracle.n * 0.1)
    common = next(t for t, d in reversed(items)
                  if d > py_oracle.n * 0.1 and not t.startswith("path:"))
    got = [(r["doc_id"], r["score"])
           for r in pindex.common_terms_topk([common, rare], k=10,
                                             max_df_frac=0.1).collect()]
    cand = set(py_oracle.matches([rare]))
    want = sorted(((d, py_oracle.score(d, [common, rare])) for d in cand),
                  key=lambda x: (-x[1], x[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-6)

    # all terms common -> fallback: identical to plain OR topk
    c2 = next(t for t, d in reversed(items)
              if d > py_oracle.n * 0.1 and t != common
              and not t.startswith("path:"))
    fb = [(r["doc_id"], round(r["score"], 6))
          for r in pindex.common_terms_topk([common, c2], k=10,
                                            max_df_frac=0.1).collect()]
    plain = [(r["doc_id"], round(r["score"], 6))
             for r in pindex.topk([common, c2], k=10).collect()]
    assert fb == plain


def test_cross_fields_blends_df_and_takes_best_field(spark, tmp_path):
    """BlendedTermQuery semantics on a corpus where the same word
    lives in content AND a keyword field: one blended df (max over
    variants) feeds every variant's IDF; per doc the best variant
    wins; python mirror computes the expectation."""
    import math

    from katta_spark.index import PhysicalIndex, build_index
    from katta_spark.fulltext.analysis import B, K1

    # 'alpha' is a content token in docs 0-2 and the tag of docs 3-8
    rows = []
    for i in range(12):
        body = "alpha base word" if i < 3 else "base word other"
        tag = "alpha" if 3 <= i < 9 else "beta"
        rows.append((i, body, tag))
    df = spark.createDataFrame(rows, "doc_id long, content string, tag string")
    d = str(tmp_path / "xf_idx")
    build_index(spark, df, d, n_groups=2, block_range=64,
                store_positions=False, field_cols=["tag"])
    idx = PhysicalIndex(spark, d)

    got = {r["doc_id"]: r["score"]
           for r in idx.cross_fields_topk(["alpha"], ["content", "tag"],
                                          k=12).collect()}
    # python mirror
    n, avgdl = 12.0, 3.0
    bdf = max(3, 6)                       # blended: max(content df, tag df)
    idf = math.log(1.0 + (n - bdf + 0.5) / (bdf + 0.5))
    def tfn(tf, dl):
        return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
    want = {}
    for i in range(12):
        scores = []
        if i < 3:
            scores.append(idf * tfn(1, 3))        # content variant
        if 3 <= i < 9:
            scores.append(idf * tfn(1, 3))        # tag variant (tf=1, dl=3)
        if scores:
            want[i] = max(scores)
    assert set(got) == set(want)
    for i, s in want.items():
        assert got[i] == pytest.approx(s, abs=1e-9), i


def test_diversified_sampler_matches_python(pindex, py_oracle,
                                            pandas_docs):
    """Python mirror: per-lang rank by (score desc, doc_id asc),
    quota 2, global top-5 by the same order."""
    langs = {
        int(r.doc_id): r.lang for r in pandas_docs.itertuples(index=False)
    }
    terms = ["import"]
    per_key: dict[str, list] = {}
    for d in py_oracle.matches(terms):
        per_key.setdefault(langs[d], []).append(
            (-py_oracle.score(d, terms), d)
        )
    kept = []
    for lang, lst in per_key.items():
        for rank, (negs, d) in enumerate(sorted(lst)[:2], 1):
            kept.append((negs, d, lang, rank))
    want = [(d, round(-negs, 9), lang, rank)
            for negs, d, lang, rank in sorted(kept)[:5]]
    got = pindex.diversified_sampler(terms, "lang", max_per_key=2,
                                     shard_size=5).collect()
    assert [
        (r["doc_id"], round(r["score"], 9), r["lang"], r["rank_in_key"])
        for r in got
    ] == want
    # quota actually binds: never more than 2 rows per lang
    per = {}
    for r in got:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    assert max(per.values()) <= 2


def test_facet_by_metric_orders_by_subagg(pindex, py_oracle,
                                          pandas_docs):
    """Buckets ordered by avg dl of the matches, not by count."""
    metric = {int(r.doc_id): r.lang
              for r in pandas_docs.itertuples(index=False)}
    per = {}
    for d in py_oracle.matches(["import"]):
        per.setdefault(metric[d], []).append(py_oracle.dl[d])
    want = sorted(
        ((lang, len(v), round(sum(v) / len(v), 6))
         for lang, v in per.items()),
        key=lambda x: (-x[2], x[0]),
    )[:5]
    got = [(r["lang"], r["cnt"], r["metric_avg"]) for r in
           pindex.facet_by_metric(["import"], "lang", "dl",
                                  n=5).collect()]
    assert got == want


def test_diversified_sampler_plan_takeordered(pindex):
    """The global sample cut is TakeOrderedAndProject (per-partition
    top-k + tiny merge), never a global sort; the per-key quota is a
    keyed window."""
    out = pindex.diversified_sampler(["import"], "lang",
                                     max_per_key=2, shard_size=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(lang" in plan


def test_group_score_modes_match_python(pindex, py_oracle,
                                        pandas_docs):
    """score_mode sum/max/avg against a python mirror; max agrees
    with field collapse's group ordering."""
    langs = {int(r.doc_id): r.lang
             for r in pandas_docs.itertuples(index=False)}
    per = {}
    for d in py_oracle.matches(["import"]):
        per.setdefault(langs[d], []).append(
            round(py_oracle.score(d, ["import"]), 6))
    for mode, fn in (("sum", sum), ("max", max),
                     ("avg", lambda v: sum(v) / len(v))):
        want = sorted(
            ((lang, len(v), round(fn(v), 6)) for lang, v in per.items()),
            key=lambda x: (-x[2], x[0]),
        )[:5]
        got = [(r["lang"], r["n_hits"], r["score"]) for r in
               pindex.group_score_topk(["import"], "lang",
                                       score_mode=mode, k=5).collect()]
        assert got == want, mode
