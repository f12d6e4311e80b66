"""Analyzer-chain config: StopFilter (build-side stopwords, query
symmetry) and query-time SynonymFilter expansion — the
schema.xml:306-378 plug points beyond the per-field analyzer kinds."""

import pytest
from pyspark.sql import functions as F

from katta_spark.index import PhysicalIndex, build_index
from katta_spark.tokenizer import py_tokenize

from tests.oracle import PyBM25

STOPS = ["import", "os"]


@pytest.fixture(scope="module")
def py_oracle(pandas_docs):
    return PyBM25(
        [
            (int(r.doc_id), r.content)
            for r in pandas_docs.itertuples(index=False)
        ]
    )


@pytest.fixture(scope="module")
def stop_index(spark, tmp_path_factory):
    rows = [
        (0, "import os\nimport sys\ndef parse(): return value"),
        (1, "import sys\nparse parse value"),
        (2, "os path join value merge"),
        (3, "def merge(): pass  # no keywords here"),
        (4, "import os\nimport os\nvalue"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path_factory.mktemp("katta_stop") / "idx")
    build_index(
        spark,
        df.withColumn("repo", F.lit("r")).withColumn(
            "path", F.concat(F.lit("p"), F.col("doc_id"))
        ).withColumn("commit", F.lit("c")),
        d,
        n_groups=1,
        block_range=64,
        stopwords=STOPS,
    )
    return PhysicalIndex(spark, d), {i: t for i, t in rows}


@pytest.fixture(scope="module")
def stop_oracle(stop_index):
    _, rows = stop_index
    return PyBM25(
        [
            (d, " ".join(t for t in py_tokenize(c) if t not in STOPS))
            for d, c in rows.items()
        ]
    )


def test_stopwords_absent_from_index(stop_index):
    idx, _ = stop_index
    cat = {r["term"] for r in idx.terms.collect()}
    assert not (set(STOPS) & cat)
    # dl is the POST-filter token count (BM25 norms see it)
    dls = {
        r["doc_id"]: r["dl"]
        for r in idx.docs.select("doc_id", "dl").collect()
    }
    assert dls[4] == 1  # "import os import os value" -> [value]


def test_stopword_query_degrades_not_empties(stop_index, stop_oracle):
    idx, _ = stop_index
    # AND with a stopword = conjunction of the remaining terms
    got = idx.topk(["parse", "import"], mode="and", k=10).collect()
    want = stop_oracle.topk(["parse"], k=10)
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]
    # all-stopword query matches nothing
    assert idx.topk(STOPS, k=10).count() == 0
    assert idx.count(["import"]).first()["n_hits"] == 0
    # query-string front door strips too
    assert idx.query("parse AND import", k=10).count() == len(want)


def test_phrase_across_removed_stopword(stop_index):
    idx, _ = stop_index
    # doc 0 tokens after filter: [sys, def, parse, return, value]
    # original text had "import sys\ndef parse" — removing the
    # stopword renumbers positions densely, so the post-filter
    # neighbours match as a phrase
    hits = idx.phrase_topk(["sys", "def"], k=5).collect()
    assert [r["doc_id"] for r in hits] == [0]
    # a phrase CONTAINING a stopword drops it before matching
    hits2 = idx.phrase_topk(["import", "sys", "def"], k=5).collect()
    assert [r["doc_id"] for r in hits2] == [0]
    # all-stopword phrase matches nothing
    assert idx.phrase_topk(["import", "os"], k=5).count() == 0


def test_synonym_expansion_query_time(pindex, py_oracle):
    syn = {"parse": ["merge"]}
    got = {
        int(r["doc_id"]): r["score"]
        for r in pindex.query_scored("parse", synonyms=syn).collect()
    }
    want_docs = py_oracle.matches(["parse", "merge"], "or")
    assert set(got) == set(want_docs)
    for d in want_docs:
        assert got[d] == pytest.approx(
            py_oracle.score(d, ["merge", "parse"]), abs=1e-9
        )
    # AND: the expanded group satisfies its conjunct as a unit
    got_and = {
        int(r["doc_id"]): r["score"]
        for r in pindex.query_scored(
            "parse AND request", synonyms=syn
        ).collect()
    }
    want_and = {
        d
        for d in py_oracle.matches(["request"])
        if d in py_oracle.matches(["parse", "merge"], "or")
    }
    assert set(got_and) == want_and
    # the flat fast path is bypassed when a synonym applies: ranked
    # slice still correct
    top = pindex.query("parse", k=5, synonyms=syn).collect()
    ranked = sorted(got.items(), key=lambda x: (-x[1], x[0]))[:5]
    assert [(r["doc_id"], round(r["score"], 9)) for r in top] == [
        (d, round(s, 9)) for d, s in ranked
    ]


def test_index_default_synonyms_and_incremental_inherit(
    spark, tmp_path_factory
):
    rows = [(0, "alpha beta"), (1, "gamma beta"), (2, "alpha gamma")]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path_factory.mktemp("katta_syn") / "idx")
    build_index(
        spark, df, d, n_groups=1, block_range=64,
        stopwords=["beta"], synonyms={"alpha": ["gamma"]},
    )
    idx = PhysicalIndex(spark, d)
    assert idx.stats["stopwords"] == ["beta"]
    # stats-default synonyms apply without a query-time override
    got = {r["doc_id"] for r in idx.query_scored("alpha").collect()}
    assert got == {0, 1, 2}
    # an incremental commit inherits the stopword set
    more = spark.createDataFrame(
        [(10, "beta beta alpha")], "doc_id long, content string"
    )
    build_index(spark, more, d, n_groups=1, commit="c1")
    idx2 = PhysicalIndex(spark, d)
    assert idx2.stats["stopwords"] == ["beta"]
    dls = {
        r["doc_id"]: r["dl"]
        for r in idx2.docs.select("doc_id", "dl").collect()
    }
    assert dls[10] == 1


# --------------------------- token filters (fold + minimal stem)


@pytest.fixture(scope="module")
def filtered_index(spark, tmp_path_factory):
    rows = [
        (0, "café tables naïve merge"),
        (1, "cafe table merge status"),
        (2, "classes class pass"),
        (3, "bus buses status basis windows"),
        (4, "Señor résumé values value"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path_factory.mktemp("katta_filt") / "idx")
    build_index(
        spark,
        df.withColumn("repo", F.lit("r")).withColumn(
            "path", F.concat(F.lit("p"), F.col("doc_id"))
        ).withColumn("commit", F.lit("c")),
        d,
        n_groups=1,
        block_range=64,
        token_filters=["ascii_fold", "stem_plural"],
    )
    return PhysicalIndex(spark, d), {i: t for i, t in rows}


def _py_chain(text):
    from katta_spark.tokenizer import py_fold_text, py_stem_token

    return [py_stem_token(t) for t in py_tokenize(py_fold_text(text))]


def test_token_filters_fold_and_stem_index_terms(filtered_index):
    idx, rows = filtered_index
    terms = {r["term"] for r in idx.terms.collect()}
    # folded: café -> cafe (not 'caf'); señor -> senor; naïve -> naive
    assert {"cafe", "senor", "naive", "resume"} <= terms
    assert "caf" not in terms
    # stemmed: tables/values/windows lose the plural s; classes -> classe
    # (the minimal stemmer strips ONE final s after a non-s/u/i char);
    # status/basis/bus survive untouched
    assert {"table", "value", "window", "classe"} <= terms
    assert {"status", "basis", "bus"} <= terms
    assert "tables" not in terms and "values" not in terms


def test_token_filters_query_symmetry_and_rank_identity(filtered_index):
    idx, rows = filtered_index
    oracle = PyBM25([(d, " ".join(_py_chain(c))) for d, c in rows.items()])
    # query with the accented plural form: folds + stems to 'table'
    got = [(r["doc_id"], r["score"]) for r in idx.topk(["tablés"], k=10).collect()]
    want = oracle.topk(["table"], k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d, s), (_, ws) in zip(got, want):
        assert s == pytest.approx(ws, abs=1e-9)
    # stopword-free AND across both filters
    got = [r["doc_id"] for r in idx.topk(["cafés", "merges"], mode="and").collect()]
    assert got == [d for d, _ in oracle.topk(["cafe", "merge"], mode="and")]


def test_token_filters_inherited_by_later_commits(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("katta_filt2") / "idx")
    base = spark.createDataFrame(
        [(0, "tables windows")], "doc_id long, content string"
    ).withColumn("repo", F.lit("r")).withColumn("path", F.lit("p0")).withColumn(
        "commit", F.lit("c")
    )
    more = spark.createDataFrame(
        [(1, "tables merge")], "doc_id long, content string"
    ).withColumn("repo", F.lit("r")).withColumn("path", F.lit("p1")).withColumn(
        "commit", F.lit("c")
    )
    build_index(spark, base, d, n_groups=1, block_range=64,
                token_filters=["stem_plural"])
    # second commit passes NO filters — must inherit stem_plural
    build_index(spark, more, d, n_groups=1, block_range=64, commit="c1")
    idx = PhysicalIndex(spark, d)
    assert idx.stats["token_filters"] == ["stem_plural"]
    got = sorted(r["doc_id"] for r in idx.topk(["table"], k=10).collect())
    assert got == [0, 1]


def test_token_filter_oracle_sql_matches_python_chain(tmp_path):
    """The DuckDB mirror (index_ctes(token_filters=...)) produces the
    same token multiset as the python chain — the oracle path for any
    folded/stemmed index."""
    from collections import Counter

    import duckdb
    import pandas as pd

    from katta_spark.oracle_sql import index_ctes

    rows = [
        (0, "café tables naïve merge"),
        (1, "Señor résumé values class classes bus status"),
    ]
    p = str(tmp_path / "documents.parquet")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    sql = (
        index_ctes(token_filters=["ascii_fold", "stem_plural"])
        + "\nSELECT doc_id, term, tf FROM tf ORDER BY doc_id, term"
    )
    got = {(d, t): n for d, t, n in con.execute(sql).fetchall()}
    want = {}
    for d, text in rows:
        for t, n in Counter(_py_chain(text)).items():
            want[(d, t)] = n
    assert got == want


def test_analyze_text_debug_surface(stop_index, filtered_index):
    """Solr /analysis/field parity: positions in raw-token order,
    stopwords shown dropped (kept=False, term NULL), fold+stem
    applied exactly as the index stored them."""
    idx, _ = stop_index
    rows = idx.analyze_text("import os def parse").collect()
    assert [(r["position"], r["raw"], r["term"], r["kept"])
            for r in rows] == [
        (0, "import", None, False),
        (1, "os", None, False),
        (2, "def", "def", True),
        (3, "parse", "parse", True),
    ]
    fidx, _ = filtered_index
    frows = fidx.analyze_text("Café tables").collect()
    assert [(r["raw"], r["term"]) for r in frows] == [
        ("cafe", "cafe"), ("tables", "table")
    ]
