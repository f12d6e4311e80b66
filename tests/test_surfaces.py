"""Tests for the operational surfaces: query-string parsing,
export scan, SQL views, streaming ingest commits."""

import pytest
from pyspark.sql import functions as F

from katta_spark.fulltext.qparse import parse_query
from katta_spark.index import PhysicalIndex
from katta_spark.streaming import stream_build


def test_parse_query_basic():
    p = parse_query("parse request")
    assert p.terms == ["parse", "request"] and p.mode == "or" and not p.filters


def test_parse_query_and_filters():
    p = parse_query("parse AND request lang:python")
    assert p.terms == ["parse", "request"]
    assert p.mode == "and"
    assert p.filters == {"lang": "python"}


def test_parse_query_analyzes_terms():
    p = parse_query("getUserName")
    assert p.terms == ["get", "user", "name", "getusername"]


def test_search_query_string(pindex):
    # explicit AND before the field clause: Lucene semantics make a
    # SHOULD field clause non-gating when MUSTs exist, so the legacy
    # equivalent of a mandatory filter is the all-AND form
    p = parse_query("parse AND request lang:python")
    via_str = pindex.search("parse AND request AND lang:python", k=5).collect()
    via_api = pindex.topk(p.terms, k=5, mode=p.mode, filters=p.filters).collect()
    assert [(r["doc_id"], r["score"]) for r in via_str] == [
        (r["doc_id"], r["score"]) for r in via_api
    ]
    assert len(via_str) == 5


def test_export(pindex):
    out = pindex.export(
        ["xylophonequarknebula3"], ["doc_id", "repo", "lang", "content"]
    )
    rows = out.collect()
    assert len(rows) == 1 and "xylophoneQuarkNebula3" in rows[0]["content"]
    # paging surface: toLocalIterator streams without a full collect
    it = pindex.export(["import"], ["doc_id"]).toLocalIterator()
    first = next(it)
    assert first["doc_id"] >= 0


def test_highlight_snippets(pindex, pandas_docs):
    """Snippet window contains the wrapped query term; snippet text
    (markers stripped) is a substring of the stored content; hit
    columns pass through untouched."""
    hits = pindex.topk(["import"], k=5)
    out = pindex.highlight(hits, ["import"], width=40).collect()
    assert len(out) == 5
    contents = {
        int(r.doc_id): r.content
        for r in pandas_docs.itertuples(index=False)
    }
    for r in out:
        assert "<em>import</em>" in r["snippet"]
        raw = r["snippet"].replace("<em>", "").replace("</em>", "")
        assert raw in contents[r["doc_id"]]
        assert len(raw) <= 40
    # a doc with no term occurrence snippets from the start of text
    nohit = pindex.docs.select("doc_id").limit(1).withColumn(
        "score", F.lit(0.0)
    )
    row = pindex.highlight(nohit, ["zzznotaterm"], width=25).first()
    assert row["snippet"] == contents[row["doc_id"]][:25]


def test_sql_views(pindex, spark):
    pindex.register_views("t")
    n = spark.sql("SELECT count(*) AS n FROM t_docs").first()["n"]
    assert n == pindex.stats["n_docs"]
    hot = spark.sql(
        "SELECT sum(n) AS df FROM t_postings WHERE term = 'import'"
    ).first()["df"]
    cat = spark.sql(
        "SELECT df FROM t_terms WHERE term = 'import'"
    ).first()["df"]
    assert hot == cat > 0


def test_percolate_batch_and_stream_parity(spark, tmp_path, docs):
    """Standing queries match the same (doc, qid) pairs in batch and
    over a readStream of the same rows — the operator is stateless so
    append mode needs no state store; AND mode requires every term."""
    from katta_spark.streaming import percolate

    queries = {
        "imports": ["import"],
        "parse_req": ["parse", "request"],
        "nothing": ["zzznotaterm"],
    }
    src_docs = docs.select("doc_id", "content")
    batch = {
        (r["doc_id"], r["qid"])
        for r in percolate(src_docs, queries, mode="and").collect()
    }
    assert batch and all(q != "nothing" for _, q in batch)
    # independent python check: AND semantics over analyzed tokens
    from katta_spark.tokenizer import py_tokenize

    want = set()
    for r in src_docs.collect():
        toks = set(py_tokenize(r["content"]))
        for qid, terms in queries.items():
            if set(terms) <= toks:
                want.add((r["doc_id"], qid))
    assert batch == want

    src = tmp_path / "perc_src"
    src.mkdir()
    src_docs.write.mode("overwrite").parquet(str(src / "docs.parquet"))
    stream = spark.readStream.schema(src_docs.schema).parquet(
        str(src / "docs.parquet")
    )
    q = (
        percolate(stream, queries, mode="and")
        .writeStream.format("memory")
        .queryName("perc_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r["doc_id"], r["qid"])
        for r in spark.sql("SELECT * FROM perc_out").collect()
    }
    assert streamed == batch


def test_streaming_ingest_commits(spark, tmp_path, docs):
    """File-stream ingest: each micro-batch becomes a manifest commit;
    results equal a batch build over the same rows."""
    from katta_spark.index.build import load_manifest

    src = tmp_path / "stream_src"
    sample = docs.filter(F.col("doc_id") < 400)
    sample.write.parquet(str(src / "p0"))
    stream = (
        spark.readStream.schema(sample.schema).parquet(str(src / "*"))
    )
    idx_dir = str(tmp_path / "stream_idx")
    q = stream_build(
        stream, idx_dir, str(tmp_path / "ckpt"), n_groups=1, block_range=128
    )
    q.awaitTermination(120)
    m = load_manifest(idx_dir)
    assert len(m) >= 1 and all(e["commit"].startswith("s") for e in m)
    sidx = PhysicalIndex(spark, idx_dir)
    assert sidx.stats["n_docs"] == 400
    got = [r["doc_id"] for r in sidx.topk(["import"], k=5).collect()]
    assert len(got) == 5 and all(d < 400 for d in got)


def test_percolate_lucene_matches_evaluator(spark, pindex, docs):
    """Lucene-string percolation matches the INDEX evaluator's match
    sets query-for-query (the percolator is the dual of search: same
    grammar, same semantics, no index)."""
    from katta_spark.streaming.percolate import percolate_lucene

    queries = {
        "q_and": "parse AND request",
        "q_not": "import -chunk",
        "q_phrase": '"parse http request"',
        "q_wild": "xylo*",
        "q_nested": "(nebula OR quark) AND import",
        "q_range": "import AND dl:[40 TO 60]",
    }
    from pyspark.sql import functions as F

    from katta_spark.tokenizer import tokens_array

    src = docs.select(
        "doc_id", "content",
        F.size(tokens_array("content")).cast("long").alias("dl"),
    )
    got: dict = {}
    for r in percolate_lucene(src, queries).collect():
        got.setdefault(r["qid"], set()).add(r["doc_id"])
    for qid, q in queries.items():
        want = {
            r["doc_id"]
            for r in pindex.query_scored(q).collect()
        }
        assert got.get(qid, set()) == want, qid


def test_percolate_lucene_stream_append(spark, tmp_path, docs):
    """The compiled conditions are stateless Column exprs — the same
    plan runs in streaming append mode with no state store."""
    from katta_spark.streaming.percolate import percolate_lucene

    queries = {"pr": "parse AND request", "imp": "import -chunk"}
    src_docs = docs.select("doc_id", "content").limit(300)
    batch = {
        (r["doc_id"], r["qid"])
        for r in percolate_lucene(src_docs, queries).collect()
    }
    d = tmp_path / "perc_luc"
    d.mkdir()
    src_docs.write.mode("overwrite").parquet(str(d / "docs.parquet"))
    stream = spark.readStream.schema(src_docs.schema).parquet(
        str(d / "docs.parquet")
    )
    q = (
        percolate_lucene(stream, queries)
        .writeStream.format("memory")
        .queryName("perc_luc_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        (r["doc_id"], r["qid"])
        for r in spark.sql("SELECT * FROM perc_luc_out").collect()
    }
    assert streamed == batch and batch


def test_curate_batch_stream_parity(spark, tmp_path):
    """The one-pass curation verdict is a stateless narrow plan —
    identical output on a readStream of the same rows (the filter
    stage of a streaming ingest pipeline)."""
    from katta_spark.ops.text import curate

    src_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200).select("doc_id", "text")
    batch = {(r["doc_id"], r["keep"])
             for r in curate(src_docs, text_col="text").collect()}
    d = tmp_path / "curate_src"
    d.mkdir()
    src_docs.write.mode("overwrite").parquet(str(d / "docs.parquet"))
    stream = spark.readStream.schema(src_docs.schema).parquet(
        str(d / "docs.parquet")
    )
    q = (
        curate(stream, text_col="text")
        .writeStream.format("memory").queryName("curate_out")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {(r["doc_id"], r["keep"])
                for r in spark.sql("SELECT * FROM curate_out").collect()}
    assert streamed == batch and any(k for _, k in batch)


def test_percolate_lucene_short_docs_phrase_edge(spark):
    """Docs shorter than the phrase never error (window sequence /
    slice index edge) and never match."""
    from katta_spark.streaming.percolate import percolate_lucene

    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, "key agg value")],
        "doc_id long, content string",
    )
    rows = percolate_lucene(df, {"p": '"key agg value extra"',
                                 "q": '"key agg"'}).collect()
    assert {(r["doc_id"], r["qid"]) for r in rows} == {(3, "q")}
