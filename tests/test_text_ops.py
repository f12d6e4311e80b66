"""Training-data text ops added in round 2: boilerplate scrub and
within-document repetition signals — python-mirror parity on the
test corpus, plus edge cases on a hand-built frame."""

import re

import pytest

from katta_spark.ops import text
from katta_spark.tokenizer import py_tokenize


def _py_clean(s: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"<[^>]*>", " ", s)).strip()


def test_clean_text_matches_python(spark, docs, pandas_docs):
    got = {
        r["doc_id"]: (r["clean"], r["n_removed"])
        for r in text.clean_text(docs, text_col="content").collect()
    }
    for r in pandas_docs.itertuples(index=False):
        want = _py_clean(r.content)
        assert got[int(r.doc_id)] == (want, len(r.content) - len(want))


def test_clean_text_strips_tags_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "<p>hello   <b>world</b></p>\n\n  done "), (2, "")],
        "doc_id long, content string",
    )
    rows = {
        r["doc_id"]: r for r in text.clean_text(df).collect()
    }
    assert rows[1]["clean"] == "hello world done"
    assert rows[2]["clean"] == ""
    assert rows[2]["n_removed"] == 0


def test_repetition_matches_python(spark, docs, pandas_docs):
    got = {
        r["doc_id"]: r
        for r in text.repetition_ratio(docs, text_col="content").collect()
    }
    for r in pandas_docs.itertuples(index=False):
        lines = [l for l in r.content.split("\n") if l.strip(" ")]
        toks = py_tokenize(r.content)
        g = got[int(r.doc_id)]
        assert g["n_lines"] == len(lines)
        assert g["n_distinct_lines"] == len(set(lines))
        want_l = 1.0 - len(set(lines)) / len(lines) if lines else 0.0
        want_t = 1.0 - len(set(toks)) / len(toks) if toks else 0.0
        assert g["dup_line_ratio"] == pytest.approx(want_l, abs=1e-12)
        assert g["dup_token_ratio"] == pytest.approx(want_t, abs=1e-12)


def test_repetition_empty_doc_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "same line\nsame line\nsame line")],
        "doc_id long, content string",
    )
    rows = {r["doc_id"]: r for r in text.repetition_ratio(df).collect()}
    assert rows[1]["dup_line_ratio"] == 0.0
    assert rows[1]["dup_token_ratio"] == 0.0
    assert rows[2]["dup_line_ratio"] == pytest.approx(2.0 / 3.0)


def _py_bpe_est(s: str, chunk: int = 4) -> tuple[int, int]:
    pre = re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", s)
    return len(pre), sum((len(p) + chunk - 1) // chunk for p in pre)


def test_bpe_token_estimate_matches_python(spark, docs, pandas_docs):
    got = {
        r["doc_id"]: (r["n_pretok"], r["n_tokens_est"])
        for r in text.bpe_token_estimate(docs, text_col="content").collect()
    }
    for r in pandas_docs.itertuples(index=False):
        assert got[int(r.doc_id)] == _py_bpe_est(r.content)


def test_bpe_token_estimate_edges(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a"), (4, "internationalization 12345 !!")],
        "doc_id long, content string",
    )
    rows = {
        r["doc_id"]: (r["n_pretok"], r["n_tokens_est"])
        for r in text.bpe_token_estimate(df).collect()
    }
    assert rows[1] == (0, 0)
    assert rows[2] == (0, 0)
    assert rows[3] == (1, 1)
    # 20-char word -> 5 chunks; 5-digit run -> 2; two bangs -> 1 each
    assert rows[4] == (4, 9)


# ---------------------------------------------------------------- pii scrub

def _py_pii(s: str) -> tuple[str, int, int, int]:
    counts = []
    for pat, rep in [
        (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
        (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
        (r"\+\d{7,15}", "<PHONE>"),
    ]:
        counts.append(len(re.findall(pat, s)))
        s = re.sub(pat, rep, s)
    return (s, *counts)


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.user+tag@example.co.uk or b@x.io today"),
            (2, "server at 10.0.0.1 and 192.168.1.255, call +4915112345678"),
            (3, "an email inside a host a@1.2.3.4.com is one email, no ip left"),
            (4, "nothing sensitive here"),
            (5, ""),
        ],
        "doc_id long, content string",
    )
    got = {
        r["doc_id"]: (r["scrubbed"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in text.pii_scrub(df).collect()
    }
    assert got[1] == ("mail <EMAIL> or <EMAIL> today", 2, 0, 0)
    assert got[2] == ("server at <IP> and <IP>, call <PHONE>", 0, 2, 1)
    # email replaced first, so the dotted quad inside it never counts as ip
    assert got[3] == ("an email inside a host <EMAIL> is one email, no ip left", 1, 0, 0)
    assert got[4] == ("nothing sensitive here", 0, 0, 0)
    assert got[5] == ("", 0, 0, 0)


def test_pii_scrub_matches_python(spark, docs, pandas_docs):
    got = {
        r["doc_id"]: (r["scrubbed"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in text.pii_scrub(docs, text_col="content").collect()
    }
    for r in pandas_docs.itertuples(index=False):
        assert got[int(r.doc_id)] == _py_pii(r.content)


# ---------------------------------------------------------------- ngram top

def test_ngram_top_matches_python(spark, docs, pandas_docs):
    from collections import Counter

    c: Counter = Counter()
    for r in pandas_docs.itertuples(index=False):
        toks = py_tokenize(r.content)
        c.update(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
    # total order: count desc, ngram asc
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["ngram"], r["n_occurrences"])
        for r in text.ngram_top(docs, n=2, k=20, text_col="content").collect()
    ]
    assert got == expect


def test_ngram_top_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "alpha beta alpha beta"), (4, "alpha beta")],
        "doc_id long, content string",
    )
    got = [
        (r["ngram"], r["n_occurrences"])
        for r in text.ngram_top(df, n=2, k=5).collect()
    ]
    assert got == [("alpha beta", 3), ("beta alpha", 1)]


def test_lm_buckets_per_lang_terciles(spark):
    """Buckets are per-language equal-frequency; within a language,
    every head doc scores >= every tail doc (6-dp rounded)."""
    from katta_spark.ops.text import lm_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = lm_buckets(docs, text_col="text", n_buckets=3).collect()
    per = {}
    for r in out:
        per.setdefault(r["lang"], []).append(r)
    assert sum(len(v) for v in per.values()) == docs.count()
    for lang, rows in per.items():
        sizes = [0, 0, 0]
        for r in rows:
            sizes[r["bucket"] - 1] += 1
        assert max(sizes) - min(sizes) <= 1  # ntile balance
        head = [r["avg_logprob"] for r in rows if r["bucket"] == 1]
        tail = [r["avg_logprob"] for r in rows if r["bucket"] == 3]
        assert min(head) >= max(tail)


def test_token_entropy_matches_python(docs):
    """Engine entropy equals the python mirror over the same tokens;
    uniform docs have H = ln(n_distinct), constant docs H = 0."""
    import math
    from collections import Counter

    from katta_spark.ops.text import token_entropy
    from katta_spark.tokenizer import py_tokenize

    sample = docs.limit(80)
    got = {r["doc_id"]: (r["n_tokens"], r["entropy"])
           for r in token_entropy(sample, text_col="content").collect()}
    for r in sample.select("doc_id", "content").collect():
        toks = py_tokenize(r["content"])
        n = len(toks)
        if n == 0:
            assert got[r["doc_id"]] == (0, 0.0)
            continue
        cnt = Counter(toks)
        h = math.log(n) - sum(f * math.log(f) for f in cnt.values()) / n
        assert got[r["doc_id"]][0] == n
        assert abs(got[r["doc_id"]][1] - round(h, 6)) <= 1e-6


def test_pmi_top_matches_python(spark):
    """PMI top-k equals an exact python mirror over the same corpus
    (real documents table; min_count filters the unstable tail)."""
    import math
    from collections import Counter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from katta_spark.ops.text import pmi_top

    got = [
        (r["ngram"], r["n_ab"], r["pmi"])
        for r in pmi_top(docs, k=15, min_count=5, text_col="text").collect()
    ]
    uni, big = Counter(), Counter()
    n_big = 0
    for r in docs.select("text").collect():
        toks = py_tokenize(r["text"])
        uni.update(toks)
        big.update(" ".join(p) for p in zip(toks, toks[1:]))
        n_big += max(len(toks) - 1, 0)
    n_tok = sum(uni.values())
    rows = []
    for g, nab in big.items():
        if nab < 5:
            continue
        a, b = g.split(" ")
        pmi = math.log((nab / n_big) / ((uni[a] / n_tok) * (uni[b] / n_tok)))
        rows.append((g, nab, round(pmi, 6)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    assert got == rows[:15]


def test_chunk_texts_tile_with_overlap(spark):
    """Chunks tile each doc: chunk k starts at k·stride, length
    min(size, n−start); reconstructing from stride-prefixes gives the
    token stream back."""
    from katta_spark.ops.text import chunk_texts

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(40)
    out = {}
    for r in chunk_texts(docs, size=10, stride=6, text_col="text").collect():
        out.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
            r["n_tokens"], r["chunk"]
        )
    for r in docs.select("doc_id", "text").collect():
        toks = py_tokenize(r["text"])
        chunks = out.get(r["doc_id"], {})
        if not toks:
            assert chunks == {}
            continue
        n_expected = (len(toks) - 1) // 6 + 1
        assert sorted(chunks) == list(range(n_expected))
        for k, (nt, ch) in chunks.items():
            want = toks[k * 6 : k * 6 + 10]
            assert nt == len(want)
            assert ch == " ".join(want)


def test_curate_verdict_composes_signals(spark):
    """keep is exactly the AND of the four component thresholds
    (recomputed from the component ops themselves)."""
    from katta_spark.ops.text import (
        curate, langid, pii_scrub, quality_score, repetition_ratio,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(120)
    out = {r["doc_id"]: r for r in curate(docs, text_col="text").collect()}
    q = {r["doc_id"]: round(r["quality"], 6)
         for r in quality_score(docs, text_col="text").collect()}
    rr = {r["doc_id"]: round(r["dup_line_ratio"], 6)
          for r in repetition_ratio(docs, text_col="text").collect()}
    pii = {r["doc_id"]: r["n_email"] + r["n_ipv4"] + r["n_phone"]
           for r in pii_scrub(docs, text_col="text").collect()}
    for d, row in out.items():
        want = q[d] >= 0.3 and rr[d] <= 0.5 and pii[d] <= 0
        assert row["keep"] == want
    assert any(r["keep"] for r in out.values())


def test_tokenizer_evaluated_once_not_per_lambda_element(spark):
    """Regression pin for the O(tokens^2) bug: the tokenizer regex
    must appear ONCE in each op's optimized plan — never inside the
    per-element transform lambda (which re-runs it per window/chunk/
    bigram)."""
    from katta_spark.ops.dedup import duplicate_spans
    from katta_spark.ops.text import chunk_texts, ngram_top, pmi_top

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(20)

    def audit(df, max_evals):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # the fix materializes the array as a named _toks column; the
        # buggy shape inlines the tokenizer into the window lambda
        assert "_toks" in plan
        assert plan.count("regexp_extract_all") <= max_evals

    audit(chunk_texts(docs, size=8, stride=4, text_col="text"), 1)
    audit(ngram_top(docs, n=2, text_col="text"), 1)
    audit(duplicate_spans(
        docs.withColumnRenamed("text", "content"), width=4), 3)
    # pmi: bigram/unigram/total branches, one LINEAR eval each
    audit(pmi_top(docs, k=5, min_count=1, text_col="text"), 5)


def test_curate_plan_is_single_scan_no_joins(spark):
    from katta_spark.ops.text import curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (curate(docs, text_col="text")
            ._jdf.queryExecution().optimizedPlan().toString())
    assert plan.count("Relation [") == 1 and "Join" not in plan


def test_keywords_tfidf_matches_python(docs):
    """Top-m TF-IDF keyword extraction vs a pure-python mirror:
    identical (doc, term, tf, rank) sets and scores."""
    import math
    from collections import Counter

    from katta_spark.ops.text import keywords_tfidf
    from katta_spark.tokenizer import py_tokenize

    rows = docs.select("doc_id", "content").collect()
    tfs = {int(r["doc_id"]): Counter(py_tokenize(r["content"]))
           for r in rows}
    n = len(tfs)
    dfc = Counter(t for c in tfs.values() for t in c)
    want = {}
    for d, c in tfs.items():
        scored = sorted(
            ((t, tf, tf * math.log(1.0 + n / dfc[t])) for t, tf in c.items()),
            key=lambda x: (-x[2], x[0]),
        )[:4]
        for rk, (t, tf, s) in enumerate(scored, 1):
            want[(d, rk)] = (t, tf, s)
    got = keywords_tfidf(docs, m=4).collect()
    assert len(got) == len(want)
    for r in got:
        t, tf, s = want[(r["doc_id"], r["rank"])]
        assert r["term"] == t and r["tf"] == tf
        assert r["score"] == pytest.approx(round(s, 6), abs=1e-9)


def test_bigram_lm_matches_python(spark):
    """Smoothed bigram conditionals vs a naive python mirror: counts,
    history totals, vocabulary size, and the add-k formula."""
    import math

    from katta_spark.tokenizer import py_tokenize

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "a cat sat"),
        (3, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = text.bigram_lm(df, k=100, add_k=0.5, min_count=1).collect()

    big: dict = {}
    vocab = set()
    for _, txt in rows:
        toks = py_tokenize(txt)
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    hist: dict = {}
    for (a, _), c in big.items():
        hist[a] = hist.get(a, 0) + c
    assert len(got) == len(big)
    for r in got:
        key = (r["w1"], r["w2"])
        assert r["n_ab"] == big[key] and r["n_a"] == hist[r["w1"]]
        want = math.log((big[key] + 0.5) / (hist[r["w1"]] + 0.5 * len(vocab)))
        assert r["logp"] == pytest.approx(want, abs=1e-6)
    # ordering: n_ab desc then (w1, w2) asc
    keys = [(-r["n_ab"], r["w1"], r["w2"]) for r in got]
    assert keys == sorted(keys)


def test_string_stats_hand_computed(spark):
    """'aab' + 'b' (NULL doc excluded): 4 chars {a:2, b:2} -> H = 1
    bit; lengths over the two non-null docs."""
    df = spark.createDataFrame(
        [(0, "aab"), (1, "b"), (2, None)], ["doc_id", "text"])
    r = text.string_stats(df, text_col="text").collect()[0]
    assert r["n_docs"] == 2
    assert r["min_len"] == 1 and r["max_len"] == 3
    assert r["avg_len"] == 2.0
    assert r["entropy"] == 1.0


def test_multi_terms_orders_by_count_then_key(spark):
    df = spark.createDataFrame(
        [("en", "web"), ("en", "web"), ("de", "web"), ("en", "book"),
         ("de", "book")],
        ["lang", "source"])
    out = [(r["lang"], r["source"], r["n"])
           for r in text.multi_terms(df, ["lang", "source"], 3).collect()]
    assert out == [("en", "web", 2), ("de", "book", 1),
                   ("de", "web", 1)]


def test_categorize_text_masks_numbers(spark):
    df = spark.createDataFrame(
        [(0, "GET /api/v2/user/1234 took 98.5 ms"),
         (1, "GET /api/v2/user/77 took 3.2 ms"),
         (2, "cache flush 0xdeadbeef done"),
         (3, "GET /api/v2/user/9 took 11 ms")],
        ["doc_id", "text"])
    out = text.categorize_text(df, text_col="text", m=5).collect()
    # "v2" is not a standalone numeric token (no word boundary
    # between v and 2), so it survives the mask — ES behaves the same
    assert out[0]["template"] == "get /api/v2/user/<num> took <num> ms"
    assert out[0]["n"] == 3
    assert out[0]["example"] == "GET /api/v2/user/1234 took 98.5 ms"
    assert out[1]["template"] == "cache flush <num> done"


def test_vocab_kl_properties(spark):
    """KL(a||a-shaped) == 0; disjoint vocabularies give symmetric
    positive divergences; python mirror agrees exactly."""
    import math

    df = spark.createDataFrame(
        [(0, "alpha beta alpha", "a"), (1, "alpha beta alpha", "b")],
        ["doc_id", "text", "src"])
    r = text.vocab_kl(df, "src", "a", "b", text_col="text").collect()[0]
    assert r["kl_ab"] == 0.0 and r["kl_ba"] == 0.0

    df2 = spark.createDataFrame(
        [(0, "alpha alpha", "a"), (1, "beta", "b")],
        ["doc_id", "text", "src"])
    r2 = text.vocab_kl(df2, "src", "a", "b", text_col="text",
                       add_k=0.5).collect()[0]
    V, na, nb, k = 2, 2, 1, 0.5
    pa = {"alpha": (2 + k) / (na + k * V), "beta": (0 + k) / (na + k * V)}
    pb = {"alpha": (0 + k) / (nb + k * V), "beta": (1 + k) / (nb + k * V)}
    kl_ab = sum(pa[t] * math.log(pa[t] / pb[t]) for t in pa)
    kl_ba = sum(pb[t] * math.log(pb[t] / pa[t]) for t in pb)
    assert abs(r2["kl_ab"] - round(kl_ab, 6)) < 1e-9
    assert abs(r2["kl_ba"] - round(kl_ba, 6)) < 1e-9
    assert r2["n_terms"] == V and r2["n_a"] == na and r2["n_b"] == nb


def test_bigram_logprob_matches_python(spark):
    """Hand corpus mirror: add-1 smoothed p(w2|w1) with history
    counts from the bigram table and V = unigram vocab; short docs
    score 0 over 0 bigrams."""
    import math

    rows = [(0, "aa bb aa bb"), (1, "aa bb"), (2, "cc"), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
           for r in text.bigram_logprob(df, text_col="text",
                                        add_k=1.0).collect()}
    # corpus bigrams: (aa,bb)x3, (bb,aa)x1 ; hist: aa=3, bb=1 ;
    # V=3 (aa,bb,cc)
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (1 + 3)
    lp0 = (2 * math.log(p_ab) + 1 * math.log(p_ba)) / 3
    assert got[0] == (3, round(lp0, 6))
    assert got[1] == (1, round(math.log(p_ab), 6))
    assert got[2] == (0, 0.0) and got[3] == (0, 0.0)


def test_paragraph_dedup_first_occurrence_wins(spark):
    """Global line dedup: the earliest (doc_id, pos) copy of a long
    line survives, later copies are cut; short lines always kept;
    in-document order preserved."""
    from katta_spark.ops.text import paragraph_dedup

    header = "x" * 40  # the repeated boilerplate line
    rows = [
        (1, f"{header}\nunique one line that is long enough\n{{}}"),
        (2, f"{header}\nanother unique long line here okay\n{{}}"),
        (3, f"short\n{header}"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    out = {r["doc_id"]: r["content"]
           for r in paragraph_dedup(df, min_chars=20).collect()}
    assert out[1] == f"{header}\nunique one line that is long enough\n{{}}"
    assert out[2] == "another unique long line here okay\n{}"
    assert out[3] == "short"  # header cut, short line kept


def test_scrub_invisible_strips_and_counts(spark):
    from katta_spark.ops.text import scrub_invisible

    rows = [
        (1, "plain text"),
        (2, "a​b‮c﻿"),        # zero-width, RLO, BOM
        (3, "tab\tand\nnewline kept\x07"),   # bell stripped, \t\n kept
        # bidi ISOLATES (LRI/RLI/FSI/PDI U+2066-2069) — the primary
        # Trojan-Source controls, distinct from the legacy
        # embedding/override range U+202A-202E
        (4, "a⁦b⁧c⁨d⁩e"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    out = {r["doc_id"]: (r["content"], r["n_removed"])
           for r in scrub_invisible(df).collect()}
    assert out[1] == ("plain text", 0)
    assert out[2] == ("abc", 3)
    assert out[3] == ("tab\tand\nnewline kept", 1)
    assert out[4] == ("abcde", 4)
