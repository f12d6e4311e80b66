"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over the sf0.001 corpus.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
training-data ops); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent SQL generated from the same
tokenizer/BM25 constants as the engine (katta_spark.oracle_sql).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from katta_spark.fulltext import query as Q
from katta_spark.fulltext.analysis import LogicalIndex
from katta_spark import oracle_ops as OO
from katta_spark import oracle_sql as O
from katta_spark.fulltext import scoring as _scoring
from katta_spark.index import PhysicalIndex, build_index
from katta_spark.ops import dedup, sampling, similarity, text

_INDEX_CACHE: dict[str, LogicalIndex] = {}
_PHYS_CACHE: dict[str, PhysicalIndex] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _index(spark: SparkSession, sf_dir: str) -> LogicalIndex:
    idx = _INDEX_CACHE.get(sf_dir)
    if idx is None:
        idx = LogicalIndex.build(_docs(spark, sf_dir), text_col="text").cache()
        _INDEX_CACHE[sf_dir] = idx
    return idx


def _round_score(df: DataFrame, col: str = "score", nd: int = 6) -> DataFrame:
    return df.withColumn(col, F.round(F.col(col), nd))


ENGINE_ERA = 4  # bump when the on-disk index layout/schema changes


def _source_fingerprint(sf_dir: str, name: str = "documents.parquet") -> dict:
    """Filesystem-level identity of a source table:
    (path, size, mtime_ns) per file + the engine era.  Pure stat()
    calls — no Spark job on index open."""
    p = Path(sf_dir) / name
    files = sorted(p.rglob("*")) if p.is_dir() else [p]
    return {
        "era": ENGINE_ERA,
        "files": [
            [f.name, f.stat().st_size, f.stat().st_mtime_ns]
            for f in files
            if f.is_file()
        ],
    }


def phys_index(spark: SparkSession, sf_dir: str,
               cache_root: str = "/tmp/katta_phys") -> PhysicalIndex:
    """Physical (compressed-postings) index over the documents table,
    built once per sf dir and reopened from disk afterwards."""
    idx = _PHYS_CACHE.get(sf_dir)
    if idx is None:
        import json
        import shutil

        d = f"{cache_root}/{Path(sf_dir).name}"
        stats_p = Path(f"{d}/stats.json")  # written last = build complete
        src_meta = _source_fingerprint(sf_dir)
        meta_p = Path(f"{d}/_source_meta.json")
        fresh = False
        if stats_p.exists() and meta_p.exists():
            try:  # stale/incompatible cache from an older engine build
                st = json.loads(stats_p.read_text())
                # no Spark job: the guard compares the source parquet
                # files' (path, size, mtime) fingerprint recorded at
                # build time — catches content changes even at equal
                # row count (and schema-era changes via ENGINE_ERA)
                fresh = (
                    "block_range" in st
                    and json.loads(meta_p.read_text()) == src_meta
                )
            except Exception:
                fresh = False
        if not fresh:
            shutil.rmtree(d, ignore_errors=True)
            corpus = _docs(spark, sf_dir).select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("text").alias("content"),
                "lang", "source", "n_chars",
            )
            build_index(spark, corpus, d, n_groups=4, block_range=1024,
                        field_cols=["lang", "source"])
            meta_p.write_text(json.dumps(src_meta))
        idx = PhysicalIndex(spark, d)
        _PHYS_CACHE[sf_dir] = idx
    return idx


# ------------------------------------------------------------------ entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the compressed-postings index over the sf0.001
    corpus (resumes from cache after the first call), answer BM25
    top-10 for (table OR spark) with block-max WAND, join hits back
    to stored fields."""
    idx = phys_index(spark, "/root/testdata/sf0.001")
    hits = idx.topk(["table", "spark"], k=10, mode="or")
    return _round_score(idx.fetch_details(hits, ["lang", "source"]))


# ---------------------------------------------------------------- queries

def _q_topk(terms, k=10, mode="or", filters=None, offset=0):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _round_score(
            Q.topk(_index(spark, sf_dir), terms, k=k, mode=mode, filters=filters, offset=offset)
        )

    return run


def q_ft_count(spark, sf_dir):
    return Q.count_query(_index(spark, sf_dir), ["dup", "key"], mode="or")


def q_ft_group_langs(spark, sf_dir):
    return Q.group_values(_index(spark, sf_dir), ["dup"], "lang")


def q_ft_facet_lang(spark, sf_dir):
    return Q.facet(_index(spark, sf_dir), ["table"], "lang", n=5)


def q_ft_range_facet(spark, sf_dir):
    return Q.range_facet(
        _index(spark, sf_dir), ["scan"], "n_chars", start=0.0, end=500.0, gap=50.0, min_count=1
    )


def q_ft_sorted(spark, sf_dir):
    return Q.sorted_query(
        _index(spark, sf_dir),
        ["merge"],
        sort_cols=[("source", "asc"), ("n_chars", "desc")],
        fields=["doc_id", "source", "n_chars"],
        limit=20,
    )


def q_ft_fetch(spark, sf_dir):
    idx = _index(spark, sf_dir)
    hits = Q.topk(idx, ["dup"], k=5)
    return _round_score(Q.fetch_details(hits, idx.corpus, ["lang", "source"]))


def q_ft_term_catalog(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return idx.terms.orderBy(F.desc("df"), F.asc("term")).limit(100)


def q_ft_stats(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return idx.stats.select("n_docs", F.round("avgdl", 6).alias("avgdl"))


def _q_phys_topk(terms, k=10, mode="or", filters=None, offset=0, wand=True):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _round_score(
            phys_index(spark, sf_dir).topk(
                terms, k=k, mode=mode, filters=filters, offset=offset,
                use_wand=wand,
            )
        )

    return run


def _q_qstr(q, k=10, offset=0):
    """Lucene-syntax query-string search over the physical index
    (parser -> boolean evaluator -> ranked slice)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _round_score(
            phys_index(spark, sf_dir).query(q, k=k, offset=offset)
        )

    return run


def q_phys_phrase(spark, sf_dir):
    return _round_score(
        phys_index(spark, sf_dir).phrase_topk(["order", "fast"], k=10)
    )


def q_ft_near(spark, sf_dir):
    """Unordered proximity (SpanNear inOrder=false): 'merge' and
    'sort' within a 4-position window, any order."""
    return _round_score(
        phys_index(spark, sf_dir).near_topk(["merge", "sort"], slop=2, k=10)
    )


_STOPWORDS = ["data", "row"]
_STOP_CACHE: dict[str, PhysicalIndex] = {}


def phys_index_stop(spark: SparkSession, sf_dir: str,
                    cache_root: str = "/tmp/katta_phys_stop"
                    ) -> PhysicalIndex:
    """A second physical index built with a StopFilter analyzer chain
    (build_index(stopwords=...)): stopwords are dropped BEFORE dl /
    positions, so scores differ from the main index by design."""
    idx = _STOP_CACHE.get(sf_dir)
    if idx is None:
        import json
        import shutil

        d = f"{cache_root}/{Path(sf_dir).name}"
        src_meta = _source_fingerprint(sf_dir)
        meta_p = Path(f"{d}/_source_meta.json")
        fresh = (
            Path(f"{d}/stats.json").exists()
            and meta_p.exists()
            and json.loads(meta_p.read_text()) == src_meta
        )
        if not fresh:
            shutil.rmtree(d, ignore_errors=True)
            corpus = _docs(spark, sf_dir).select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("text").alias("content"),
                "lang", "source", "n_chars",
            )
            build_index(spark, corpus, d, n_groups=2, block_range=1024,
                        stopwords=_STOPWORDS, store_positions=False)
            meta_p.write_text(json.dumps(src_meta))
        idx = PhysicalIndex(spark, d)
        _STOP_CACHE[sf_dir] = idx
    return idx


_SNAP_CACHE: dict[str, PhysicalIndex] = {}


def phys_index_snap(spark: SparkSession, sf_dir: str,
                    cache_root: str = "/tmp/katta_phys_snap"
                    ) -> PhysicalIndex:
    """A 2-commit index (even doc_ids -> commit c0, odd -> c1) opened
    PINNED to c0: Iceberg-style time travel over the commit layout —
    stats, IDF and every ranking reflect only the pinned commit."""
    idx = _SNAP_CACHE.get(sf_dir)
    if idx is None:
        import json
        import shutil

        d = f"{cache_root}/{Path(sf_dir).name}"
        src_meta = _source_fingerprint(sf_dir)
        meta_p = Path(f"{d}/_source_meta.json")
        fresh = (
            Path(f"{d}/stats.json").exists()
            and meta_p.exists()
            and json.loads(meta_p.read_text()) == src_meta
        )
        if not fresh:
            shutil.rmtree(d, ignore_errors=True)
            corpus = _docs(spark, sf_dir).select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("text").alias("content"),
                "lang", "source", "n_chars",
            )
            even = corpus.filter(F.col("doc_id") % 2 == 0)
            odd = corpus.filter(F.col("doc_id") % 2 == 1)
            build_index(spark, even, d, n_groups=1, block_range=1024,
                        store_positions=False, commit="c0")
            build_index(spark, odd, d, n_groups=1, block_range=1024,
                        store_positions=False, commit="c1")
            meta_p.write_text(json.dumps(src_meta))
        idx = PhysicalIndex(spark, d, commits=["c0"])
        _SNAP_CACHE[sf_dir] = idx
    return idx


def q_phys_snapshot(spark, sf_dir):
    """Snapshot (time-travel) read: the 2-commit index pinned at c0
    must rank exactly like an index that only ever saw the even docs
    — the oracle recomputes BM25 over that restricted corpus."""
    return _round_score(
        phys_index_snap(spark, sf_dir).topk(["table", "spark"], k=10)
    )


def q_stop_and(spark, sf_dir):
    """AND query containing a stopword over the StopFilter index: the
    query analyzer drops the stopword (Lucene symmetry), degrading to
    the remaining conjunction; BM25 norms use the post-filter dl."""
    return _round_score(
        phys_index_stop(spark, sf_dir).topk(["table", "data"], mode="and")
    )


def q_synonym(spark, sf_dir):
    """Query-time synonym expansion: 'sort' scores as the OR group
    (sort, order), scores summed per doc."""
    return _round_score(
        phys_index(spark, sf_dir).query(
            "sort", synonyms={"sort": ["order"]}
        )
    )


def q_phys_highlight(spark, sf_dir):
    """Top-k + snippet generation (Lucene/Solr highlighter parity):
    a 60-char window around the first query-term occurrence with
    in-window occurrences wrapped in <em> markers — JVM expressions
    only."""
    idx = phys_index(spark, sf_dir)
    hits = idx.topk(["batch"], k=5)
    return _round_score(
        idx.highlight(hits, ["batch"], width=60, text_col="content")
    )


def q_terms_suggest(spark, sf_dir):
    """Solr TermsComponent: top-df content terms under a prefix."""
    return phys_index(spark, sf_dir).suggest("s", n=10)


def q_field_stats(spark, sf_dir):
    """Solr StatsComponent: numeric summary over the matching docs."""
    out = phys_index(spark, sf_dir).field_stats(["scan"], "n_chars")
    return out.select(
        "n", "min_v", "max_v",
        F.round("sum_v", 6).alias("sum_v"),
        F.round("mean_v", 6).alias("mean_v"),
    )


_INTERVALS = [
    ("small", 0, 120, True, False),
    ("mid", 100, 300, True, False),
    ("large", 250, 100000, True, True),
]


def q_ft_interval_facet(spark, sf_dir):
    """Solr facet.interval: overlapping interval counts, one agg pass."""
    return phys_index(spark, sf_dir).interval_facet(
        ["data"], "n_chars", _INTERVALS
    )


def q_ft_range_other(spark, sf_dir):
    """Solr facet.range.other=all: before/between/after counts."""
    return phys_index(spark, sf_dir).range_facet_other(
        ["scan"], "n_chars", 100.0, 300.0
    )


def q_ft_facet_stats(spark, sf_dir):
    """Solr stats.facet: numeric field summary per facet bucket."""
    out = phys_index(spark, sf_dir).facet_stats(["table"], "lang", "n_chars")
    return out.select(
        "lang", "n", "min_v", "max_v",
        F.round("sum_v", 6).alias("sum_v"),
        F.round("mean_v", 6).alias("mean_v"),
    )


def q_group_topk(spark, sf_dir):
    """Solr result grouping: top-3 hits per lang."""
    return _round_score(
        phys_index(spark, sf_dir).group_topk(["table"], "lang", k_per_group=3)
    )


def q_ft_phrase_prefix(spark, sf_dir):
    """ES match_phrase_prefix '"fast s*"': last slot expands to <=50
    catalog terms in term order (Lucene's rewrite cap), then one
    multi-phrase positional scan."""
    return _round_score(
        phys_index(spark, sf_dir).phrase_prefix_topk(
            ["fast"], "s", k=10, max_expansions=50)
    )


def q_ft_rank_feature(spark, sf_dir):
    """ES rank_feature (saturation): BM25 + 2*v/(v+250) over
    n_chars, ranked over ALL matches (not a top-k re-rank)."""
    out = phys_index(spark, sf_dir).rank_feature_topk(
        ["table"], "n_chars", pivot=250.0, k=10, boost=2.0)
    return out.select(
        "doc_id",
        F.round("score", 6).alias("score"),
        F.round("feat_score", 6).alias("feat_score"),
    )


def q_diversified_sampler(spark, sf_dir):
    """ES diversified_sampler: best 20 'table' hits, at most 2 per
    lang — per-key quota window + global TakeOrderedAndProject."""
    return _round_score(
        phys_index(spark, sf_dir).diversified_sampler(
            ["table"], "lang", max_per_key=2, shard_size=20)
    )


def q_mlt(spark, sf_dir):
    """MoreLikeThis: docs similar to doc 7 via its top tf-idf terms."""
    return _round_score(
        phys_index(spark, sf_dir).more_like_this(7, m_terms=5, k=10)
    )


_MULTI_Q = {"qa": ["table"], "qb": ["dup", "key"], "qc": ["spark", "vector"]}


def q_multi_topk(spark, sf_dir):
    """Batched top-k: three queries answered by ONE pruned postings
    scan + one shuffle (the reference's N concurrent scatter-gathers
    collapsed into one job)."""
    return _round_score(
        phys_index(spark, sf_dir).multi_topk(_MULTI_Q, k=5)
    )


def q_percolate(spark, sf_dir):
    """Percolation: standing queries matched against documents with a
    stateless narrow plan (streaming-ready, zero state store)."""
    from katta_spark.streaming import percolate

    return percolate(
        _docs(spark, sf_dir), _MULTI_Q, text_col="text", mode="or"
    )


def q_phys_count(spark, sf_dir):
    return phys_index(spark, sf_dir).count(["dup", "key"], mode="or")


def q_serve_topk(spark, sf_dir):
    """Serving-tier top-k (LocalSearcher: node-local pyarrow read +
    the same numpy kernels, NO Spark job in the query path — Katta's
    LuceneServer node tier).  Wrapped back into a DataFrame only for
    the oracle gate; rank-identical to ft_phys_topk by construction."""
    from katta_spark.index.serve import LocalSearcher

    idx = phys_index(spark, sf_dir)  # ensures the on-disk index exists
    hits = LocalSearcher(idx.index_dir).topk(["table"], k=10)
    return spark.createDataFrame(
        [(int(d), round(float(s), 6)) for d, s in hits],
        "doc_id long, score double",
    )


def q_serve_lucene(spark, sf_dir):
    """Serving-tier Lucene query string: the reference's front door
    (q parse -> boolean eval) answered node-locally by the numpy
    evaluator — rank-identical to ft_q_nested's cluster path and
    checked against the same SQL oracle."""
    from katta_spark.index.serve import LocalSearcher

    idx = phys_index(spark, sf_dir)
    hits = LocalSearcher(idx.index_dir).query("(dup OR key) AND table", k=10)
    return spark.createDataFrame(
        [(int(d), round(float(s), 6)) for d, s in hits],
        "doc_id long, score double",
    )


def q_serve_stats(spark, sf_dir):
    """Node-tier StatsComponent (same oracle as ft_field_stats):
    count/min/max/sum/mean over the matches, no Spark job in the
    query path."""
    from katta_spark.index.serve import LocalSearcher

    idx = phys_index(spark, sf_dir)
    st = LocalSearcher(idx.index_dir).field_stats(["scan"], "n_chars")
    return spark.createDataFrame(
        [(int(st["n"]), float(st["min_v"]), float(st["max_v"]),
          round(float(st["sum_v"]), 6), round(float(st["mean_v"]), 6))],
        "n long, min_v double, max_v double, sum_v double, mean_v double",
    )


def q_serve_pivot_facet(spark, sf_dir):
    """Scatter-gather pivot facet over the shard set (full per-shard
    histograms, exact merge) — same oracle as ft_pivot_facet."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.pivot_facet(["table"], "lang", "source", n1=3, n2=2)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(a), int(b), str(c), int(d)) for a, b, c, d in rows],
        "lang string, parent_cnt long, source string, cnt long",
    )


def q_serve_suggest_regex(spark, sf_dir):
    """terms.regex across shards — full candidate sets, exact df
    sums; same oracle as ft_suggest_regex."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.suggest_regex("(s|b).*", n=10)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(t), int(d)) for t, d in rows], "term string, df long"
    )


def q_serve_suggest_infix(spark, sf_dir):
    """AnalyzingInfixSuggester across shards; same oracle as
    ft_suggest_infix."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.suggest_infix("a", n=10)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(t), int(d)) for t, d in rows], "term string, df long"
    )


def q_serve_facet_by_metric(spark, sf_dir):
    """Scatter facet-by-metric — per-shard (cnt, sum) partials merged
    then rounded once; same oracle as ft_facet_by_metric."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.facet_by_metric(["table"], "lang", "n_chars", n=5)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(r.lang), int(r.cnt), round(float(r.metric_avg), 6))
         for r in out.itertuples(index=False)],
        "lang string, cnt long, metric_avg double",
    )


def q_serve_group_score(spark, sf_dir):
    """Sharded group-score ranking — per-shard associative partials
    over globally-scored hits; same oracle as ft_group_score."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.group_score_topk(["table"], "lang",
                                  score_mode="sum", k=5)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(r.lang), int(r.n_hits), round(float(r.score), 6))
         for r in out.itertuples(index=False)],
        "lang string, n_hits long, score double",
    )


def q_serve_ngroups(spark, sf_dir):
    """Sharded group.ngroups — per-shard distinct value sets union
    exactly; same oracle as ft_ngroups."""
    sh = _sharded(spark, sf_dir)
    try:
        n_groups, n_hits = sh.ngroups(["table"], "source")
    finally:
        sh.close()
    return spark.createDataFrame(
        [(int(n_groups), int(n_hits))], "n_groups long, n_hits long"
    )


def q_serve_expand(spark, sf_dir):
    """Sharded ExpandComponent — one group_topk scatter ranked to
    n_expand+1; same oracle as ft_expand."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.expand_topk(["table"], "source", k=5, n_expand=2)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(r.source), int(r.doc_id), round(float(r.score), 6),
          int(r.exp_rank)) for r in out.itertuples(index=False)],
        "source string, doc_id long, score double, exp_rank int",
    )


def q_serve_term_vectors(spark, sf_dir):
    """Sharded TermVectorComponent — tf from each id's owning shard,
    df/tfidf from the merged catalog; same oracle as
    ft_term_vectors."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.term_vectors([3, 7, 11])
    finally:
        sh.close()
    return spark.createDataFrame(
        [(int(r.doc_id), str(r.term), int(r.tf), int(r.df),
          round(float(r.tfidf), 6))
         for r in out.itertuples(index=False)],
        "doc_id long, term string, tf long, df long, tfidf double",
    )


def q_serve_adjacency(spark, sf_dir):
    """Sharded adjacency_matrix — per-shard bitset matrices summed
    over disjoint doc sets; same oracle as ft_adjacency."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.adjacency_matrix(_MULTI_Q)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(a), str(b), int(c)) for a, b, c in rows],
        "key1 string, key2 string, cnt long",
    )


def q_serve_diversified(spark, sf_dir):
    """Sharded diversified_sampler — group_topk scatter + one global
    cut; same oracle as ft_diversified."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.diversified_sampler(["table"], "lang", max_per_key=2,
                                     shard_size=20)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(int(r.doc_id), round(float(r.score), 6), str(r.lang),
          int(r.rank_in_key)) for r in out.itertuples(index=False)],
        "doc_id long, score double, lang string, rank_in_key int",
    )


def q_serve_rare_terms(spark, sf_dir):
    """ES rare_terms across shards — full per-shard histograms make
    the long tail exact (a shard-locally-rare but globally-common
    value can never slip under max_count); same oracle as
    ft_rare_terms."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.rare_terms(["scan"], "source", max_count=18, n=10)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(v), int(c)) for v, c in rows], "source string, cnt long"
    )


def q_serve_facet_stats(spark, sf_dir):
    """Scatter stats.facet — per-shard per-value (n,min,max,sum)
    partials merged exactly; same oracle as ft_facet_stats."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.facet_stats(["table"], "lang", "n_chars")
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(r.lang), int(r.n), float(r.min_v), float(r.max_v),
          round(float(r.sum_v), 6), round(float(r.mean_v), 6))
         for r in out.itertuples(index=False)],
        "lang string, n long, min_v double, max_v double, "
        "sum_v double, mean_v double",
    )


def q_serve_interval_facet(spark, sf_dir):
    """Scatter facet.interval — per-shard counts summed over disjoint
    doc sets; same oracle as ft_interval_facet."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.interval_facet(["data"], "n_chars", _INTERVALS)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(v), int(c)) for v, c in rows], "label string, cnt long"
    )


def q_serve_facet_query(spark, sf_dir):
    """Solr facet.query across shards — each label a bitset count
    sum; same oracle as ft_facet_query."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.facet_queries(_MULTI_Q)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(v), int(c)) for v, c in rows], "facet_q string, cnt long"
    )


def q_serve_envelope(spark, sf_dir):
    """Sharded search envelope (QueryResponse parity), flattened for
    the oracle: each hit row carries numFound and maxScore — hits
    from the WAND scatter, numFound from the bitset count sum — plus
    the round-4 completeness fields (ClientResult.isComplete /
    getMissingShards parity): shards_total, n_shards_failed."""
    sh = _sharded(spark, sf_dir)
    try:
        env = sh.search(["dup", "key"], k=8)
    finally:
        sh.close()
    h = env["hits"]
    return spark.createDataFrame(
        [(int(d), round(float(s), 6), int(env["num_found"]),
          round(float(env["max_score"]), 6),
          int(env["shards_total"]), len(env["shards_failed"]))
         for d, s in zip(h["doc_id"], h["score"])],
        "doc_id long, score double, num_found long, max_score double,"
        " shards_total long, n_shards_failed long",
    )


def q_serve_facet_index(spark, sf_dir):
    """Scatter facet with facet.sort=index — full per-shard
    histograms make every facet option exact at the merge; same
    oracle as ft_facet_index."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.facet(["table"], "source", n=10, sort="index")
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(v), int(c)) for v, c in rows],
        "source string, cnt long",
    )


def q_serve_facet_prefix(spark, sf_dir):
    """Scatter facet with facet.prefix + facet.mincount — same
    oracle as ft_facet_prefix."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.facet(["table"], "source", n=20, prefix="src1",
                        mincount=2)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(v), int(c)) for v, c in rows],
        "source string, cnt long",
    )


def q_serve_collapse(spark, sf_dir):
    """Scatter-gather field collapse (Solr {!collapse}): per-shard
    FULL per-value head maps on the corpus-wide score scale (df
    exchange), one client re-collapse — same oracle as
    ft_collapse."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.collapse_topk(["table"], "lang", k=10)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(int(r.doc_id), round(float(r.score), 6), str(r.lang))
         for r in out.itertuples(index=False)],
        "doc_id long, score double, lang string",
    )


def q_serve_group(spark, sf_dir):
    """Scatter-gather result grouping (Solr group.field): per-shard
    per-value top-k merged by one client re-rank — same oracle as
    ft_group_topk."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.group_topk(["table"], "lang", k_per_group=3)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(r.lang), int(r.doc_id), round(float(r.score), 6),
          int(r.rank)) for r in out.itertuples(index=False)],
        "lang string, doc_id long, score double, rank int",
    )


def q_serve_sig_terms(spark, sf_dir):
    """Scatter-gather significant_terms: per-shard foreground
    histograms summed over disjoint doc sets, background dfs from
    the merged catalog (two exact rounds, no ES shard-shortlist
    approximation) — same oracle as ft_sig_terms."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.significant_terms(["scan"], m_terms=10, min_df=2)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(str(r.term), int(r.df_fg), int(r.df_bg), float(r.lift))
         for r in out.itertuples(index=False)],
        "term string, df_fg long, df_bg long, lift double",
    )


def q_serve_mlt(spark, sf_dir):
    """Scatter-gather MoreLikeThis: source tokens from the owning
    shard, rep terms picked with merged-catalog dfs, rep-term OR as
    a sharded top-k — same oracle as ft_mlt."""
    sh = _sharded(spark, sf_dir)
    try:
        hits = sh.more_like_this(7, m_terms=5, k=10)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(int(d), round(float(s), 6)) for d, s in hits],
        "doc_id long, score double",
    )


def q_serve_highlight(spark, sf_dir):
    """Node-tier highlighter: same hits (node topk is rank-identical
    to the Spark tier), same snippet semantics mirrored in python —
    checked against the same SQL oracle as ft_phys_highlight."""
    from katta_spark.index.serve import LocalSearcher

    idx = phys_index(spark, sf_dir)
    srv = LocalSearcher(idx.index_dir)
    hl = srv.highlight(srv.topk(["batch"], k=5), ["batch"], width=60,
                       text_col="content")
    return spark.createDataFrame(
        [(int(d), round(float(s), 6), str(t))
         for d, s, t in zip(hl["doc_id"], hl["score"], hl["snippet"])],
        "doc_id long, score double, snippet string",
    )


def q_serve_spellcheck(spark, sf_dir):
    """Scatter-gather spellcheck (SpellCheckComponent at node
    latency): each shard contributes its FULL within-max_edits
    candidate set, dfs summed over disjoint doc sets, one global
    (dist asc, df desc, term asc) cut — same oracle as
    ft_spellcheck because the shards partition the same corpus."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.spellcheck("tabel", max_edits=2, n=5)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(t, int(d), int(df)) for t, d, df in rows],
        "term string, dist int, df long",
    )


def q_serve_count(spark, sf_dir):
    """Serving-tier totalHits — the reference's published headline op
    (0.081 s scatter-gather count), answered node-locally."""
    from katta_spark.index.serve import LocalSearcher

    idx = phys_index(spark, sf_dir)
    n = LocalSearcher(idx.index_dir).count(["dup", "key"])
    return spark.createDataFrame([(n,)], "n_hits long")


_SHARD_DIRS_CACHE: dict[str, list[str]] = {}


def shard_dirs(spark, sf_dir,
               cache_root: str = "/tmp/katta_shards") -> list[str]:
    """Two shard indexes over a BLOCK-ALIGNED doc_id split of the
    documents table — the serving tier's multi-shard fixture (the
    reference deploys an index as a shard SET, one Lucene dir per
    node).  The split boundary (256) is a multiple of the shard
    block_range (128), so ShardedSearcher's block-aligned namespacing
    reproduces the ORIGINAL doc_ids (shard B's offset = ceil(256/128)
    *128 = 256) and the DuckDB oracle applies unchanged."""
    dirs = _SHARD_DIRS_CACHE.get(sf_dir)
    if dirs is None:
        import json
        import shutil

        root = f"{cache_root}/{Path(sf_dir).name}"
        da, db = f"{root}/shard_a", f"{root}/shard_b"
        src_meta = _source_fingerprint(sf_dir)
        meta_p = Path(f"{root}/_source_meta.json")
        fresh = False
        if meta_p.exists() and Path(f"{db}/stats.json").exists():
            try:
                fresh = json.loads(meta_p.read_text()) == src_meta
            except Exception:
                fresh = False
        if not fresh:
            shutil.rmtree(root, ignore_errors=True)
            corpus = _docs(spark, sf_dir).select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("text").alias("content"),
                "lang", "source", "n_chars",
            )
            a = corpus.filter(F.col("doc_id") < 256)
            b = corpus.filter(F.col("doc_id") >= 256).withColumn(
                "doc_id", F.col("doc_id") - 256
            )
            for part, d in ((a, da), (b, db)):
                build_index(spark, part, d, n_groups=2, block_range=128,
                            field_cols=["lang", "source"])
            meta_p.write_text(json.dumps(src_meta))
        dirs = _SHARD_DIRS_CACHE[sf_dir] = [da, db]
    return dirs


def _sharded(spark, sf_dir):
    from katta_spark.index.serve import ShardedSearcher

    return ShardedSearcher(shard_dirs(spark, sf_dir))


def q_serve_lucene_sharded(spark, sf_dir):
    """Cross-shard Lucene-string search — the reference's primary
    query RPC (Client.java:562-649 scatter; LuceneServer.java:661-690
    parse+search per node): full q+fq AST evaluated per shard with
    the merged-catalog dfs (getDocFreqs exchange), Hit.compareTo
    merge over namespaced ids.  The block-aligned split makes the
    namespaced ids equal the original doc_ids, so the oracle is the
    same SQL as ft_serve_lucene."""
    sh = _sharded(spark, sf_dir)
    try:
        hits = sh.query("(dup OR key) AND table", k=10)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(int(d), round(float(s), 6)) for d, s in hits],
        "doc_id long, score double",
    )


def q_serve_replica(spark, sf_dir):
    """Replica-aware scatter failover (round 5): shard B's PRIMARY
    copy is destroyed mid-session; the scatter re-dispatches its task
    to the byte-identical replica dir before declaring the shard
    failed (NodeInteraction.java:141-205 re-selects a different
    replica node; ShuffleNodeSelectionPolicy.java:25-40 drops the
    dead copy from rotation).  Results must be rank-identical to the
    healthy ft_serve_lucene_sharded query — same oracle SQL."""
    import shutil
    import tempfile

    from katta_spark.index.serve import ShardedSearcher

    da, db = shard_dirs(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="katta_replica_")
    pb, rb = f"{tmp}/primary_b", f"{tmp}/replica_b"
    shutil.copytree(db, pb)
    shutil.copytree(db, rb)
    sh = ShardedSearcher([da, pb], replicas={pb: [rb]})
    try:
        shutil.rmtree(pb)  # lose the primary copy mid-session
        hits = sh.query("(dup OR key) AND table", k=10)
        m = sh.metrics()
        assert sh.shards_failed == [], sh.shards_failed
        assert m["n_replica_failovers"] >= 1, m
    finally:
        sh.close()
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(int(d), round(float(s), 6)) for d, s in hits],
        "doc_id long, score double",
    )


def q_serve_phrase_sharded(spark, sf_dir):
    """Cross-shard POSITIONAL phrase (the quoted-string front door
    scattered): each shard verifies positions locally, scores with
    global df via the exchange, disjoint doc sets merge exactly."""
    sh = _sharded(spark, sf_dir)
    try:
        hits = sh.query('"order fast"', k=10)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(int(d), round(float(s), 6)) for d, s in hits],
        "doc_id long, score double",
    )


def q_serve_sorted(spark, sf_dir):
    """Serving-tier field-sorted top-k (TopFieldCollector node RPC,
    LuceneServer.java:1629-1636; FieldSortComparator merge :44-87)
    scattered over both shards — identical rows to the Spark tier's
    sorted_query (same null rule, same doc_id tie-break)."""
    sh = _sharded(spark, sf_dir)
    try:
        out = sh.sorted_query(
            ["merge"], [("source", "asc"), ("n_chars", "desc")],
            ["doc_id", "source", "n_chars"], 20)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(int(r.doc_id), str(r.source), int(r.n_chars))
         for r in out.itertuples(index=False)],
        "doc_id long, source string, n_chars long",
    )


def q_serve_range_facet(spark, sf_dir):
    """Serving-tier numeric facetByRange (FacetRangeCall node RPC,
    LuceneServer.java:1197-1258; DateRangeFactory.java:43-77 for the
    date units) — per-shard full histograms summed over disjoint doc
    sets, one min_count cut."""
    sh = _sharded(spark, sf_dir)
    try:
        rows = sh.range_facet(["scan"], "n_chars", 0.0, 500.0, 50.0)
    finally:
        sh.close()
    return spark.createDataFrame(
        [(float(b), int(c)) for b, c in rows],
        "bucket_start double, cnt long",
    )


def q_phys_facet(spark, sf_dir):
    return phys_index(spark, sf_dir).facet(["table"], "lang", n=5)


def q_phys_facet_index(spark, sf_dir):
    """facet.sort=index (Solr): buckets in value order, not count
    order — same one hash-agg shuffle, different merge order."""
    return phys_index(spark, sf_dir).facet(
        ["table"], "source", n=10, sort="index"
    )


def q_phys_facet_prefix(spark, sf_dir):
    """facet.prefix + facet.mincount (Solr): only buckets whose value
    starts with 'src1' and holds >= 2 matches — the prefix prunes
    BEFORE the hash agg, so the shuffle carries only candidate
    buckets."""
    return phys_index(spark, sf_dir).facet(
        ["table"], "source", n=20, prefix="src1", mincount=2
    )


def q_ft_suggest_phrase(spark, sf_dir):
    """ES phrase suggester ('did you mean'): catalog spellcheck
    candidates per position, phrase lattice ranked by the corpus
    bigram LM minus an edit penalty."""
    return phys_index(spark, sf_dir).suggest_phrase(
        ["tabl", "scann"], max_edits=2, per_word=3, n=5
    )


_RANK_EVAL_QUERIES = [("q1", ["table", "scan"]), ("q2", ["dup"])]


def q_ft_rank_eval(spark, sf_dir):
    """Offline ranking-quality evaluation (ES _rank_eval / TREC):
    P@10, MRR, NDCG@10 of two engine BM25 runs against binary
    judgment sets — one broadcast judgment join + two hash aggs."""
    from pyspark.sql import Window

    from katta_spark.ops.search_eval import rank_eval

    idx = phys_index(spark, sf_dir)
    res = None
    for qid, terms in _RANK_EVAL_QUERIES:
        t = idx.topk(terms, k=10).select(
            F.lit(qid).alias("qid"), "doc_id", "score"
        )
        t = t.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("score"), F.asc("doc_id")
                )
            ),
        ).drop("score")
        res = t if res is None else res.unionByName(t)
    docs = _docs(spark, sf_dir)
    judg = (
        docs.filter(F.col("lang") == "en")
        .select(F.lit("q1").alias("qid"), "doc_id",
                F.lit(1.0).alias("grade"))
        .unionByName(
            docs.filter(F.col("source") == "src1")
            .select(F.lit("q2").alias("qid"), "doc_id",
                    F.lit(1.0).alias("grade"))
        )
    )
    return rank_eval(res, judg, k=10)


def q_ft_rrf(spark, sf_dir):
    """ES 8 hybrid search: the BM25 top-20 over documents fused with
    the exact-cosine top-20 over embeddings (query = vec 0's stored
    embedding; documents.doc_id and embeddings.vec_id share the id
    space) by reciprocal-rank fusion, 1/(60+rank)."""
    from katta_spark.ops.search_eval import rrf_fuse

    bm = phys_index(spark, sf_dir).topk(["table", "scan"], k=20)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    vec = similarity.cosine_join_topk(
        emb.filter(F.col("vec_id") != 0), qdf, k=20
    ).select(F.col("vec_id").alias("doc_id"), "cos")
    return rrf_fuse([(bm, "score"), (vec, "cos")], n=10)


def q_ft_linear_fuse(spark, sf_dir):
    """ES 8 linear retriever: the same hybrid pair as ft_rrf fused
    by weighted min-max-normalized scores (BM25 0.7, cosine 0.3)."""
    from katta_spark.ops.search_eval import linear_fuse

    bm = phys_index(spark, sf_dir).topk(["table", "scan"], k=20)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    vec = similarity.cosine_join_topk(
        emb.filter(F.col("vec_id") != 0), qdf, k=20
    ).select(F.col("vec_id").alias("doc_id"), "cos")
    return linear_fuse([(bm, "score", 0.7), (vec, "cos", 0.3)], n=10)


def q_text_bigram_lp(spark, sf_dir):
    """Per-doc score under the corpus's add-1 smoothed bigram LM
    (CCNet-style perplexity filter, one order above unigram)."""
    from katta_spark.ops import text as _text

    return _text.bigram_logprob(_docs(spark, sf_dir), text_col="text",
                                add_k=1.0)


def q_text_vocab_kl(spark, sf_dir):
    """Corpus-drift report: smoothed two-way unigram KL between
    sources src1 and src2 — one conditional vocabulary hash agg."""
    from katta_spark.ops import text as _text

    return _text.vocab_kl(_docs(spark, sf_dir), "source", "src1",
                          "src2", text_col="text")


def q_phys_cross_fields(spark, sf_dir):
    """ES cross_fields / Lucene BlendedTermQuery: 'table' and 'src1'
    each searched across content + source with per-word blended df,
    best-field score per word, words summed."""
    return _round_score(
        phys_index(spark, sf_dir).cross_fields_topk(
            ["table", "src1"], ["content", "source"], k=10
        )
    )


def q_phys_most_fields(spark, sf_dir):
    """ES multi_match type=most_fields: 'table' and 'src1' each
    looked up in content + source with each variant's OWN df; a
    doc's score is the SUM of every matching variant's BM25."""
    return _round_score(
        phys_index(spark, sf_dir).most_fields_topk(
            ["table", "src1"], ["content", "source"], k=10
        )
    )


def q_phys_combined_fields(spark, sf_dir):
    """ES combined_fields (the term-centric 4th multi_match mode):
    'table' and 'src1' searched over content + source as ONE virtual
    field — per-doc tf sums across fields before saturation, df is
    the union doc-set size."""
    return _round_score(
        phys_index(spark, sf_dir).combined_fields_topk(
            ["table", "src1"], ["content", "source"], k=10
        )
    )


def q_ft_distance_feature(spark, sf_dir):
    """ES distance_feature over n_chars: BM25 + 2*100/(100+|v-200|)
    — proximity-to-origin boosting over ALL matches."""
    out = phys_index(spark, sf_dir).distance_feature_topk(
        ["table"], "n_chars", origin=200.0, pivot=100.0, k=10, boost=2.0)
    return out.select(
        "doc_id",
        F.round("score", 6).alias("score"),
        F.round("feat_score", 6).alias("feat_score"),
    )


def q_ft_has_parent(spark, sf_dir):
    """ES has_parent with score: every doc inherits its lang group's
    MAX hit score for 'table' — the inverse of has_child."""
    return phys_index(spark, sf_dir).has_parent_topk(
        ["table"], "lang", k=10, score_mode="max")


def q_ft_terms_set(spark, sf_dir):
    """ES terms_set: docs matching at least (doc_id % 2 + 1) of
    {table, scan, key} — per-document minimum_should_match read from
    the doc's own fields."""
    return _round_score(
        phys_index(spark, sf_dir).terms_set_topk(
            ["table", "scan", "key"], "doc_id % 2 + 1", k=10
        )
    )


def q_ft_boosting(spark, sf_dir):
    """ES boosting query: 'table' hits, demoted x0.3 (not excluded)
    when they also match 'scan'."""
    return _round_score(
        phys_index(spark, sf_dir).boosting_topk(
            ["table"], ["scan"], negative_boost=0.3, k=10)
    )


def q_ft_random_score(spark, sf_dir):
    """ES function_score random_score (boost_mode=replace):
    deterministic seeded sample ordering of 'table' matches via the
    shared md5 hash_bucket device."""
    return phys_index(spark, sf_dir).random_score_topk(
        ["table"], seed="r2", k=10)


def q_phys_common_terms(spark, sf_dir):
    """Lucene CommonTermsQuery: 'dup' (rare) must match, 'table'
    (common, df ~78% of N) only boosts scores of those candidates —
    the common term's posting list never floods the match set."""
    return _round_score(
        phys_index(spark, sf_dir).common_terms_topk(
            ["table", "dup"], k=10, max_df_frac=0.1
        )
    )


def q_phys_rare_terms(spark, sf_dir):
    """ES rare_terms: long-tail source buckets (cnt <= 18) among docs
    matching 'scan' — exact single hash agg, count-asc order."""
    return phys_index(spark, sf_dir).rare_terms(
        ["scan"], "source", max_count=18, n=10
    )


def q_phys_fetch(spark, sf_dir):
    idx = phys_index(spark, sf_dir)
    return _round_score(idx.fetch_details(idx.topk(["dup"], k=5), ["lang", "source"]))


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dup_groups(_docs(spark, sf_dir), text_col="text")


def q_text_token_stats(spark, sf_dir):
    return _round_score(
        text.token_stats(_docs(spark, sf_dir), text_col="text"),
        col="avg_token_len",
    )


def q_text_quality(spark, sf_dir):
    df = text.quality_score(_docs(spark, sf_dir), text_col="text")
    for c in ("alpha_ratio", "stop_ratio", "quality"):
        df = _round_score(df, col=c)
    return df


def q_text_fingerprint(spark, sf_dir):
    return text.fingerprint(_docs(spark, sf_dir), text_col="text")


def q_text_paragraph_dedup(spark, sf_dir):
    """C4-style global line dedup: a line >= 30 chars appearing in
    several docs survives only at its earliest (doc_id, pos); short
    structural lines always kept; docs reassembled in order."""
    return text.paragraph_dedup(
        _docs(spark, sf_dir), text_col="text", min_chars=30)


def q_src_warc_roundtrip(spark, sf_dir):
    """WARC source (Common Crawl's format): one REAL WARC/1.0 record
    is built per doc, then the record walker parses the bytes back —
    headers, Content-Length-delimited payload, utf-8 octets."""
    from katta_spark.sources import attach_warc_payload, parse_warc_records

    return parse_warc_records(attach_warc_payload(_docs(spark, sf_dir)))


def q_text_scrub_invisible(spark, sf_dir):
    """Invisible-character scrub (zero-width / bidi Trojan-Source /
    C0 controls): a zero-width space + RLO are deterministically
    injected for doc_id%3=0, then stripped — n_removed audits the
    injection exactly."""
    dirty = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("\u200b\u202e"), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return text.scrub_invisible(dirty, text_col="text")


def q_text_clean(spark, sf_dir):
    """Boilerplate scrub: tag-strip + whitespace-collapse, per doc."""
    return text.clean_text(_docs(spark, sf_dir), text_col="text")


def q_text_repetition(spark, sf_dir):
    """Within-document repetition signals (duplicate-line and
    duplicate-token fractions — Gopher-style repetition filters)."""
    df = text.repetition_ratio(_docs(spark, sf_dir), text_col="text")
    for c in ("dup_line_ratio", "dup_token_ratio"):
        df = _round_score(df, col=c)
    return df


def q_sim_cosine_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = similarity.cosine_join_topk(
        emb.filter(F.col("vec_id") != 0), queries_df, k=10
    )
    return _round_score(out.select("vec_id", "cos"), col="cos")


_KNN_Q = None


def _knn_qvec():
    """Deterministic literal query vector (dims=64): cos(1+i) — the
    repo's seedless-constant convention, identical in the oracle."""
    global _KNN_Q
    if _KNN_Q is None:
        import math

        _KNN_Q = [math.cos(1 + i) for i in range(64)]
    return _KNN_Q


def q_sim_mmr(spark, sf_dir):
    """MMR diversified re-rank over the exact cosine top-30
    shortlist (lam=0.7, k=10) — greedy argmax in one numpy kernel
    per group.  Iterative, but k is a constant, so the oracle
    UNROLLS the greedy into k chained materialized CTE stages
    (oracle_ops.mmr_sql) — full value-hash check, not rows-only."""
    from katta_spark.ops import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = _knn_qvec()
    import math as _m

    qn = _m.sqrt(sum(x * x for x in qv)) or 1.0
    qarr = F.array(*[F.lit(float(x)) for x in qv])
    cos = similarity._dot(F.col("embedding"), qarr) / (
        similarity._norm(F.col("embedding")) * F.lit(qn)
    )
    short = (
        emb.select("vec_id", "embedding", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(30)
    )
    return similarity.mmr_rerank(short, qv, k=10, lam=0.7).select(
        "rank", "vec_id", "mmr", "rel"
    )


def q_sim_knn_dot(spark, sf_dir):
    """Exact MIPS top-k (inner product) — the unnormalized-embedding
    metric; one narrow JVM fold pass + TakeOrderedAndProject."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.knn_topk(emb, _knn_qvec(), k=10, metric="dot")


def q_sim_knn_l2(spark, sf_dir):
    """Exact euclidean top-k (lower = closer, ranked asc)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.knn_topk(emb, _knn_qvec(), k=10, metric="euclidean")


def q_sim_project(spark, sf_dir):
    """JL random projection 64 -> 4 dims (deterministic seedless
    planes), exploded to scalar rows for engine-portable comparison."""
    from katta_spark.ops.similarity import random_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p = random_project(emb, dims=64, out_dims=4)
    return p.select("vec_id", F.posexplode("projected").alias("dim", "val"))


def ann_index_dir(spark, sf_dir, cache_root: str = "/tmp/katta_ann") -> str:
    """Signature-partitioned ANN index over the embeddings table
    (minus the query vector 0), built once per sf dir."""
    import json
    import shutil

    from katta_spark.ops import ann_index as AI

    d = f"{cache_root}/{Path(sf_dir).name}"
    src_meta = _source_fingerprint(sf_dir, "embeddings.parquet")
    meta_p = Path(f"{d}/_source_meta.json")
    if not (
        Path(f"{d}/_meta.json").exists()
        and meta_p.exists()
        and json.loads(meta_p.read_text()) == src_meta
    ):
        shutil.rmtree(d, ignore_errors=True)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            F.col("vec_id") != 0
        )
        dims = len(emb.select("embedding").first()["embedding"])
        AI.build_ann_index(emb, d, dims=dims, planes_per_table=12, n_tables=1)
        meta_p.write_text(json.dumps(src_meta))
    return d


def ivf_index_dir(spark, sf_dir, cache_root: str = "/tmp/katta_ivf") -> str:
    """IVF-flat index (centroid-partitioned) over the embeddings
    table (minus the query vector 0), built once per sf dir."""
    import json
    import shutil

    from katta_spark.ops import ann_index as AI

    d = f"{cache_root}/{Path(sf_dir).name}"
    src_meta = _source_fingerprint(sf_dir, "embeddings.parquet")
    meta_p = Path(f"{d}/_source_meta.json")
    if not (
        Path(f"{d}/_meta.json").exists()
        and meta_p.exists()
        and json.loads(meta_p.read_text()) == src_meta
    ):
        shutil.rmtree(d, ignore_errors=True)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            F.col("vec_id") != 0
        )
        # quantizer="seed": the bitwise-deterministic smallest-id
        # quantizer so the DuckDB oracle mirrors assignment exactly;
        # production default is k-means|| + Lloyd (coarse_centroids)
        AI.build_ivf_index(emb, d, n_centroids=16, quantizer="seed")
        meta_p.write_text(json.dumps(src_meta))
    return d


def sq_index_dir(spark, sf_dir, cache_root: str = "/tmp/katta_sq") -> str:
    """int8 scalar-quantized index over the embeddings table (minus
    query vector 0), built once per sf dir."""
    import json
    import shutil

    from katta_spark.ops import ann_index as AI

    d = f"{cache_root}/{Path(sf_dir).name}"
    src_meta = _source_fingerprint(sf_dir, "embeddings.parquet")
    meta_p = Path(f"{d}/_source_meta.json")
    if not (
        Path(f"{d}/_meta.json").exists()
        and meta_p.exists()
        and json.loads(meta_p.read_text()) == src_meta
    ):
        shutil.rmtree(d, ignore_errors=True)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            F.col("vec_id") != 0
        )
        AI.build_sq_index(emb, d)
        meta_p.write_text(json.dumps(src_meta))
    return d


def q_sim_sq_ann(spark, sf_dir):
    """int8 scalar-quantized kNN (ES int8 quantized vector search):
    approximate cosine over the codes, exact rescoring of the top-30
    on the stored raw vectors, exact top-10 returned."""
    from katta_spark.ops import ann_index as AI

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x)
          for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = AI.sq_query(spark, sq_index_dir(spark, sf_dir), qv, k=10,
                      rerank=30)
    return _round_score(out, col="cos")


def q_sim_ivf_ann(spark, sf_dir):
    """ANN from the IVF-flat index: nprobe nearest centroids, exact
    rerank inside their partitions (partition-pruned read)."""
    from katta_spark.ops import ann_index as AI

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = AI.ivf_query(spark, ivf_index_dir(spark, sf_dir), qv, k=10, nprobe=2)
    return _round_score(out, col="cos")


_IVF_FILT_CACHE: dict[str, str] = {}


def ivf_filt_index_dir(spark, sf_dir, cache_root: str = "/tmp/katta_ivf_filt"
                       ) -> str:
    """IVF index carrying the label metadata column (meta_cols) so
    filtered vector search pushes its predicate into the probe scan."""
    import json
    import shutil

    from katta_spark.ops import ann_index as AI

    d = _IVF_FILT_CACHE.get(sf_dir)
    if d:
        return d
    d = f"{cache_root}/{Path(sf_dir).name}"
    src_meta = _source_fingerprint(sf_dir, "embeddings.parquet")
    meta_p = Path(f"{d}/_source_meta.json")
    if not (
        Path(f"{d}/_meta.json").exists()
        and meta_p.exists()
        and json.loads(meta_p.read_text()) == src_meta
    ):
        shutil.rmtree(d, ignore_errors=True)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            F.col("vec_id") != 0
        )
        AI.build_ivf_index(emb, d, n_centroids=16, meta_cols=["label"],
                           quantizer="seed")
        meta_p.write_text(json.dumps(src_meta))
    _IVF_FILT_CACHE[sf_dir] = d
    return d


def q_sim_ivf_filtered(spark, sf_dir):
    """Filtered vector search: metadata predicate (label = 2) applied
    INSIDE the probed partition scan, before any distance math."""
    from katta_spark.ops import ann_index as AI

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x)
          for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = AI.ivf_query(
        spark, ivf_filt_index_dir(spark, sf_dir), qv, k=10, nprobe=4,
        where=F.col("label") == 2,
    )
    return _round_score(out, col="cos")


def q_sim_ivf_batch(spark, sf_dir):
    """Batched ANN: two query vectors answered by ONE partition-pruned
    scan of the IVF index (union of probes; per-qid rank window) —
    the ANN dual of ft_multi_topk."""
    from katta_spark.ops import ann_index as AI

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = {
        str(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin([0, 1])).collect()
    }
    out = AI.ivf_query_batch(
        spark, ivf_index_dir(spark, sf_dir), qs, k=10, nprobe=2
    )
    return _round_score(out, col="cos")


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    within-cluster cosine pairs >= 0.3 drop the higher id — the
    quadratic compare confined inside clusters, never all-pairs."""
    from katta_spark.ops.dedup import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(emb, n_centroids=8, threshold=0.3,
                          quantizer="seed").orderBy(
        "vec_id"
    )


def q_dedup_embed_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs: LSH bucket-join candidates +
    exact cosine verify (threshold picked for a non-trivial result on
    the uniform-random test embeddings)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.cosine_dup_pairs(
        emb, threshold=0.25, dims=64, n_planes=4, n_tables=2
    )
    return _round_score(out, col="cos")


def q_sim_lsh_ann(spark, sf_dir):
    """ANN served from the PERSISTED signature-partitioned index:
    the probe is a partition-pruned read, not a corpus scan (same
    bucket semantics as similarity.lsh_bucket_ann, same oracle)."""
    from katta_spark.ops import ann_index as AI

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = AI.ann_query(spark, ann_index_dir(spark, sf_dir), qv, k=10)
    return _round_score(out, col="cos")


def _mm_payload(spark, sf_dir):
    from katta_spark.ops import multimodal as mm

    return mm.attach_fake_payload(
        _docs(spark, sf_dir), modality="image", seed_col="text"
    )


def q_mm_image_meta(spark, sf_dir):
    from katta_spark.ops import multimodal as mm

    return mm.decode_image_meta(_mm_payload(spark, sf_dir))


def q_mm_pgm_meta(spark, sf_dir):
    """REAL image decode (no stub): deterministic binary-PGM payloads
    are generated per doc, then the engine PARSES the actual bytes
    back (P5 header + raster); the oracle states the generator's
    dimension formulas, so the parse round-trip is what's checked."""
    from katta_spark.ops import multimodal as mm

    return mm.pgm_meta(mm.attach_pgm_payload(_docs(spark, sf_dir)))


def q_mm_pgm_features(spark, sf_dir):
    """REAL raster features over parsed PGM pixels: global + quadrant
    means (floor-half splits), shared half-up 6dp rounding."""
    from katta_spark.ops import multimodal as mm

    out = mm.pgm_quadrant_features(
        mm.attach_pgm_payload(_docs(spark, sf_dir)))
    return out.select(
        "doc_id", *[F.col("features")[i].alias(f"f{i}") for i in range(5)]
    )


def q_mm_stream_frames(spark, sf_dir):
    """REAL frame sampling (no stub): multi-frame concatenated-P5
    streams are generated, then the engine WALKS the container frame
    by frame (each frame's length from its own parsed header) and
    samples every 2nd frame."""
    from katta_spark.ops import multimodal as mm

    return mm.pgm_stream_sample(
        mm.attach_pgm_stream(_docs(spark, sf_dir)), every=2)


def q_mm_wav_meta(spark, sf_dir):
    """REAL audio decode (no stub): deterministic PCM WAV payloads
    generated per doc, parsed BACK by a real RIFF chunk walker."""
    from katta_spark.ops import multimodal as mm

    return mm.wav_meta(mm.attach_wav_payload(_docs(spark, sf_dir)))


def q_mm_wav_features(spark, sf_dir):
    """REAL audio triage over decoded PCM: RMS / zero crossings /
    mean abs — the silence/clipping/energy pass of an audio ingest."""
    from katta_spark.ops import multimodal as mm

    return mm.wav_features(mm.attach_wav_payload(_docs(spark, sf_dir)))


def q_mm_byte_stats(spark, sf_dir):
    """REAL (stub-free) binary triage: byte-distribution entropy /
    distinct bytes / zero ratio per payload — one Arrow numpy
    kernel, zero shuffle."""
    from katta_spark.ops import multimodal as mm

    return mm.binary_byte_stats(_mm_payload(spark, sf_dir))


def q_mm_frame_sample(spark, sf_dir):
    from katta_spark.ops import multimodal as mm

    frames = mm.sample_frames(_mm_payload(spark, sf_dir), every=4, max_frames=3)
    return frames.select(
        "doc_id", "frame_idx", F.lower(F.hex("frame")).alias("frame_hex")
    )


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _fmt_ts(df, col, out):
    df = df.withColumn(out, F.date_format(F.col(col), "yyyy-MM-dd HH:mm:ss"))
    return df if out == col else df.drop(col)


def q_ts_date_facet(spark, sf_dir):
    from katta_spark.ops import timeseries as TS

    out = TS.date_range_facet(_events(spark, sf_dir), "ts", "DAY")
    return _fmt_ts(out, "bucket_start", "bucket").select("bucket", "cnt")


def q_ts_window_agg(spark, sf_dir):
    from katta_spark.ops import timeseries as TS

    out = TS.window_agg(_events(spark, sf_dir), "ts", "1 hour", key_col="event_type")
    return _fmt_ts(out, "win_start", "win").select(
        "win", "event_type", "n", "sum_value", "avg_value"
    )


def q_ts_corr(spark, sf_dir):
    """Per-event-type Pearson correlation between value and the
    props.k JSON property: one six-moment hash agg, closed formula
    on rounded moments."""
    from katta_spark.ops import timeseries as TS

    e = TS.json_props(_events(spark, sf_dir), "props", "k")
    return TS.group_corr(e, "event_type", "value", "prop_k")


def q_ts_ohlc(spark, sf_dir):
    """OHLC candlestick bars per (hour, event_type): one min_by/max_by
    hash agg — open/close tie-broken by event_id, shuffle O(buckets)."""
    from katta_spark.ops import timeseries as TS

    out = TS.ohlc_bars(_events(spark, sf_dir), "ts", "1 hour",
                       key_col="event_type", id_col="event_id")
    return _fmt_ts(out, "win_start", "win").select(
        "win", "event_type", "n", "open", "high", "low", "close"
    )


def q_ts_session_agg(spark, sf_dir):
    from katta_spark.ops import timeseries as TS

    out = TS.session_agg(_events(spark, sf_dir), "ts", "user_id", gap="30 minutes")
    return _fmt_ts(out, "session_start", "session_start").select(
        "user_id", "session_start", "n"
    )


def q_ts_sliding_window(spark, sf_dir):
    """Hopping windows: 2-hour width sliding every hour (each event in
    two windows)."""
    from katta_spark.ops import timeseries as TS

    out = TS.sliding_window_agg(_events(spark, sf_dir), "ts", "2 hours", "1 hour")
    return _fmt_ts(out, "win_start", "win").select(
        "win", "n", "sum_value", "avg_value"
    )


def q_ts_gap_fill(spark, sf_dir):
    """LOCF gap fill: 12-hour grid per user (users 0-2), forward-filled."""
    from katta_spark.ops import timeseries as TS

    ev = _events(spark, sf_dir).filter(F.col("user_id") < 3)
    out = TS.gap_fill(ev, "ts", "user_id", "value", step="12 hours")
    return _fmt_ts(out, "grid_ts", "grid_ts").select(
        "user_id", "grid_ts", "value"
    )


def q_ts_top_events(spark, sf_dir):
    """Top-3 event types per day — ES 'terms agg in a date histogram'."""
    from katta_spark.ops import timeseries as TS

    out = TS.window_top_keys(_events(spark, sf_dir), "ts", "1 day",
                             "event_type", k=3)
    return _fmt_ts(out, "win_start", "win").select(
        "win", "event_type", "n", "rank"
    )


_DM_NOW = "2024-01-25 13:47:33"
_DM_LO, _DM_HI = "NOW/DAY-7DAYS", "NOW/HOUR+1HOURS"


def q_ts_date_math(spark, sf_dir):
    """Solr date-math range (DateMathParser grammar): count + span of
    events in [NOW/DAY-7DAYS, NOW/HOUR+1HOURS) with NOW pinned."""
    from katta_spark.ops.timeseries import date_math_col

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    now = F.to_timestamp(F.lit(_DM_NOW))
    lo = date_math_col(now, _DM_LO)
    hi = date_math_col(now, _DM_HI)
    return ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def q_ts_json(spark, sf_dir):
    from katta_spark.ops import timeseries as TS

    e = TS.json_props(_events(spark, sf_dir), "props", "k", "int")
    return (
        e.groupBy("event_type")
        .agg(F.round(F.avg("prop_k"), 6).alias("avg_k"))
        .orderBy("event_type")
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir).withColumnRenamed("text", "content"),
        num_hashes=16,
        bands=4,
    )


def q_dedup_simhash(spark, sf_dir):
    return dedup.simhash64(_docs(spark, sf_dir), text_col="text")


def q_dedup_keep_best(spark, sf_dir):
    """Dedup survivorship: one doc per MinHash near-dup cluster, the
    longest (n_chars) survives, ties by doc_id — the rule pipelines
    apply after cluster resolution."""
    pairs = dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir).withColumnRenamed("text", "content"),
        num_hashes=16,
        bands=4,
    )
    clus = dedup.dup_clusters(pairs)
    return dedup.keep_best_per_cluster(
        _docs(spark, sf_dir), clus, metric_col="n_chars")


def q_dedup_clusters(spark, sf_dir):
    """Transitive near-dup cluster resolution over the MinHash-LSH
    candidate pairs: every doc labeled with its cluster's min doc_id
    (the canonical survivor) via iterative min-label propagation."""
    pairs = dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir).withColumnRenamed("text", "content"),
        num_hashes=16,
        bands=4,
    )
    return dedup.dup_clusters(pairs)


_MIX_WEIGHTS = {"src0": 1.0, "src1": 2.0, "src2": 0.5, "src3": 1.5}


def q_pipe_length_batches(spark, sf_dir):
    """Dynamic batching by length: size-range buckets fill fixed-count
    batches in (size, doc_id) order; every row reports its batch's
    padding waste — the loader prep that cuts padding FLOPs."""
    from katta_spark.ops.packing import length_bucket_batches

    return length_bucket_batches(_docs(spark, sf_dir), "n_chars",
                                 batch_size=8)


def q_pipe_mixture_order(spark, sf_dir):
    """Deterministic interleaved training order: per-source hash
    shuffle, interleave key rank/weight, one global sort — replayable
    data mixing (weight 2x => 2x frequency per unit of stream)."""
    from katta_spark.ops.sampling import mixture_order

    return mixture_order(_docs(spark, sf_dir), _MIX_WEIGHTS)


def q_pipe_leakage_split(spark, sf_dir):
    """Near-dup-aware train/test split: the split decision is per
    MinHash duplicate CLUSTER, so near-duplicates never straddle
    train and test (eval-leakage prevention)."""
    pairs = dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir).withColumnRenamed("text", "content"),
        num_hashes=16,
        bands=4,
    )
    clusters = dedup.dup_clusters(pairs)
    return sampling.leakage_safe_split(
        _docs(spark, sf_dir), clusters, test_pct=10, salt="split"
    )


def q_dedup_simhash_pairs(spark, sf_dir):
    return dedup.simhash_candidate_pairs(
        _docs(spark, sf_dir), max_hamming=3, text_col="text"
    )


def q_dedup_fingerprint(spark, sf_dir):
    fp = text.fingerprint(_docs(spark, sf_dir), text_col="text")
    return (
        fp.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def q_text_langid(spark, sf_dir):
    return text.langid(_docs(spark, sf_dir), text_col="text")


def q_dedup_ngram_jaccard(spark, sf_dir):
    return _round_score(
        dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5, n=3, text_col="text"),
        col="jaccard",
    )


def q_dedup_containment(spark, sf_dir):
    """Containment dedup (|A∩B| / min(|A|,|B|) over 3-gram shingles):
    catches short-doc-inside-long-doc pairs Jaccard misses."""
    return _round_score(
        dedup.containment_pairs(
            _docs(spark, sf_dir), threshold=0.8, n=3, text_col="text"
        ),
        col="containment",
    )


def q_ft_cursor(spark, sf_dir):
    """Search-after deep pagination (Lucene searchAfter / Solr
    cursorMark): page 2 is sliced by the (score, doc_id) cursor of
    page 1's last hit — the heap stays at k for ANY page depth,
    unlike offset pagination whose merge is O(depth).  The cursor is
    client state (a bounded k-row collect), exactly as a cursorMark
    round-trips through a real client."""
    idx = phys_index(spark, sf_dir)
    page1 = idx.topk(["table"], k=5).collect()
    last = page1[-1]
    return _round_score(
        idx.topk(["table"], k=5, after=(last["score"], last["doc_id"]))
    )


def q_ft_min_match(spark, sf_dir):
    """Minimum-should-match (Solr dismax mm=2): OR semantics with a
    floor — docs must match >= 2 of the 3 query terms."""
    return _round_score(
        phys_index(spark, sf_dir).topk(
            ["table", "dup", "key"], k=10, min_match=2
        )
    )


def q_ft_pivot_facet(spark, sf_dir):
    """Two-level pivot facet (Solr facet.pivot): top langs by match
    count, top sources within each."""
    return phys_index(spark, sf_dir).pivot_facet(
        ["table"], "lang", "source", n1=3, n2=2
    )


def q_ft_spellcheck(spark, sf_dir):
    """SpellCheckComponent: closest catalog terms to the misspelling
    'tabel' by (edit distance, df)."""
    return phys_index(spark, sf_dir).spellcheck("tabel", max_edits=2, n=5)


def q_ft_facet_query(spark, sf_dir):
    """Solr facet.query: hit counts of three standing sub-queries in
    one job (label-pruned scans, aggregation-only — no doc lists)."""
    return phys_index(spark, sf_dir).facet_queries(_MULTI_Q)


def q_ft_adjacency(spark, sf_dir):
    """ES adjacency_matrix: per-filter and pairwise-intersection hit
    counts of the three standing sub-queries — labeled matched-set
    union + one doc_id self-join + one pair hash agg."""
    return phys_index(spark, sf_dir).adjacency_matrix(_MULTI_Q)


def q_ft_collapse(spark, sf_dir):
    """Field collapsing (Solr {!collapse field=lang}): one best doc
    per language, collapsed set re-ranked globally."""
    return _round_score(
        phys_index(spark, sf_dir).collapse_topk(["table"], "lang", k=10)
    )


def q_ft_join(spark, sf_dir):
    """Join qparser (Solr fq={!join from=source to=source}dup):
    top-k for 'table' restricted to docs sharing a source with any
    doc matching 'dup' — the join clause filters, never scores."""
    return _round_score(
        phys_index(spark, sf_dir).join_topk(
            ["table"], "source", "source", ["dup"], k=10
        )
    )


def q_ft_term_vectors(spark, sf_dir):
    """TermVectorComponent (tv=true): per-doc term/tf/df/tfidf
    vectors for three docs — shuffle-free slice + catalog join."""
    return _round_score(
        phys_index(spark, sf_dir).term_vectors([3, 7, 11]), col="tfidf"
    )


def q_ft_elevate(spark, sf_dir):
    """QueryElevationComponent (elevate.xml): docs 7 and 3 pinned to
    the top in that order, doc 11 excluded, organic BM25 filling the
    rest."""
    return _round_score(
        phys_index(spark, sf_dir).elevate_topk(
            ["table"], elevate_ids=[7, 3], k=10, exclude_ids=[11]
        )
    )


def q_text_bpe_tokens(spark, sf_dir):
    """BPE-ish LLM token-cost estimate: regex pre-tokenization +
    ceil(len/4) subword sum, pure column algebra."""
    return text.bpe_token_estimate(_docs(spark, sf_dir), text_col="text")


def q_text_bpe_pairs(spark, sf_dir):
    """Round 0 of distributed BPE training (Sennrich et al. 2016):
    top-20 adjacent char pairs over the term vocabulary, weighted by
    corpus term frequency — the pass every merge round repeats."""
    from katta_spark.ops import bpe

    v = bpe.initial_vocab(_docs(spark, sf_dir), text_col="text")
    return (
        bpe.pair_counts(v)
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


def q_text_lm_buckets(spark, sf_dir):
    """CCNet-style per-language LM terciles (head/middle/tail by
    corpus-unigram typicality)."""
    from katta_spark.ops import text as T

    return T.lm_buckets(_docs(spark, sf_dir), text_col="text",
                        lang_col="lang", n_buckets=3)


def q_text_pii_scrub(spark, sf_dir):
    """PII redaction (emails / IPv4 / intl phones -> typed
    placeholders) with per-class counts — narrow regexp column
    algebra; the full per-doc output is compared, so the oracle
    checks Java-regex/RE2 dialect parity byte-for-byte."""
    return text.pii_scrub(_docs(spark, sf_dir), text_col="text")


def q_text_ngram_top(spark, sf_dir):
    """Corpus top-20 bigrams under the code tokenizer (count desc,
    ngram asc — a total order, so top-k is engine-independent)."""
    return text.ngram_top(_docs(spark, sf_dir), n=2, k=20, text_col="text")


def q_pipe_hash_split(spark, sf_dir):
    """Deterministic train/val/test split (split membership a pure
    function of doc_id — survives repartitioning and reruns),
    aggregated per (split, lang)."""
    return (
        sampling.hash_split(_docs(spark, sf_dir), key_col="doc_id")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_text_unigram_lp(spark, sf_dir):
    """Corpus-unigram LM typicality score: avg ln p(token) per doc,
    tf pre-aggregated before the catalog join (map-side combine)."""
    return text.unigram_logprob(_docs(spark, sf_dir), text_col="text")


def q_text_keywords(spark, sf_dir):
    """Per-doc top-5 TF-IDF keywords (document tagging): tf
    pre-aggregated before the df join, per-doc rank over the
    aggregated pair table."""
    return text.keywords_tfidf(_docs(spark, sf_dir), m=5, text_col="text")


def q_text_code_quality(spark, sf_dir):
    """StarCoder-style source-file quality signals (line lengths,
    comment/blank ratios, alphanumeric fraction) + keep flag —
    narrow JVM column algebra."""
    return text.code_quality(_docs(spark, sf_dir), text_col="text")


def q_ft_sig_terms(spark, sf_dir):
    """Significant-terms aggregation (ES-style): content terms
    overrepresented in docs matching 'scan' vs the corpus, by lift."""
    return phys_index(spark, sf_dir).significant_terms(
        ["scan"], m_terms=10, min_df=2
    )


def q_ft_get(spark, sf_dir):
    """Realtime get (Solr /get): stored fields for three ids straight
    off the docs store — no query, the id filter pushes to the scan."""
    return phys_index(spark, sf_dir).get_docs(
        [3, 7, 11], ["lang", "source", "n_chars"]
    )


def q_text_nfc(spark, sf_dir):
    """Unicode NFC normalization (Arrow-batched pandas UDF — the one
    sanctioned Python hot path: Spark has no built-in normalizer)."""
    return text.nfc_normalize(_docs(spark, sf_dir), text_col="text")


def q_dedup_spans(spark, sf_dir):
    """Exact duplicated-span detection (Lee et al. ACL'22 substring
    dedup, rolling-hash shape): every 8-token window occurring more
    than once in the corpus.  One shuffle (count window over the
    64-bit span hash), no self-join."""
    return dedup.duplicate_spans(_docs(spark, sf_dir), width=8,
                                 text_col="text")


def q_dedup_span_stats(spark, sf_dir):
    """Per-doc share of tokens covered by duplicated 8-token spans —
    the 'mostly boilerplate' curation signal."""
    return dedup.dup_span_stats(_docs(spark, sf_dir), width=8,
                                text_col="text")


def q_dedup_trim_spans(spark, sf_dir):
    """Substring-dedup removal pass (Lee et al. ACL'22): duplicated
    8-token windows keep their first occurrence corpus-wide; all other
    occurrences are cut and the doc rewritten from surviving tokens."""
    return dedup.trim_duplicate_spans(_docs(spark, sf_dir), width=8,
                                      text_col="text")


def q_sketch_kmv_vocab(spark, sf_dir):
    """KMV distinct-term cardinality sketch over the corpus
    vocabulary (ops/sketch.py): one narrow pass, per-partition
    k-smallest Arrow kernel, k-item global merge."""
    from katta_spark.ops import sketch
    from katta_spark.tokenizer import explode_tokens

    terms = explode_tokens(_docs(spark, sf_dir), "text", [])
    return sketch.kmv_distinct(terms, "term", k=256)


def q_sketch_bloom(spark, sf_dir):
    """Vocabulary bloom filter (m=4096 bits, k=3 md5-derived
    hashes): built as a set-bit position table over the distinct
    corpus tokens, then probed for a mix of present and absent
    words — False is definitive absence, True is membership up to
    the fp rate.  Both build and probe are bit-identical in DuckDB."""
    from katta_spark.ops import sketch
    from katta_spark.tokenizer import explode_tokens

    terms = explode_tokens(_docs(spark, sf_dir), "text", [])
    bloom = sketch.bloom_build(terms, "term", m_bits=4096, k_hashes=3)
    probes = spark.createDataFrame(
        [("table",), ("scan",), ("zebrafish",), ("quuxplugh",)],
        "probe string",
    )
    return sketch.bloom_contains(bloom, probes, "probe",
                                 m_bits=4096, k_hashes=3)


_CMS_PROBES = ["table", "scan", "zebrafish", "quuxplugh"]


def q_sketch_cms(spark, sf_dir):
    """Count-min sketch of corpus token frequencies (width=512,
    depth=3): bounded (row, cell, cnt) counter table from ONE
    map-side-combined hash agg, probed with min-over-rows estimates
    — never underestimates, bit-identical md5 cells in DuckDB."""
    from katta_spark.ops import sketch
    from katta_spark.tokenizer import explode_tokens

    terms = explode_tokens(_docs(spark, sf_dir), "text", [])
    cms = sketch.cms_build(terms, "term", width=512, depth=3)
    probes = spark.createDataFrame(
        [(p,) for p in _CMS_PROBES], "probe string"
    )
    return sketch.cms_query(cms, probes, "probe", width=512, depth=3)


def q_sketch_len_quantile(spark, sf_dir):
    """Power-of-two bucket quantiles of document length: exact
    integer bucketing (length(bin(v))), <= 64-row histogram."""
    from katta_spark.ops import sketch

    return sketch.bit_quantiles(
        _docs(spark, sf_dir), "n_chars", qs=(0.5, 0.9, 0.99)
    )


def q_pipe_decontam(spark, sf_dir):
    """Benchmark decontamination: 5-gram overlap of every doc against
    a benchmark slice (doc_id % 37 == 0).  Engine joins on 8-byte
    xxhash64 n-gram keys with the benchmark inventory broadcast; the
    oracle joins on the n-gram strings — identical at test scale,
    collision odds 2^-64 at any scale (conservative direction)."""
    from katta_spark.ops import decontam

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 37 == 0)
    return decontam.ngram_overlap(d, bench, n=5, threshold=0.5,
                                  text_col="text")


def q_pipe_decontam_fuzzy(spark, sf_dir):
    """FUZZY decontamination (MinHash-LSH against the benchmark
    slice): corpus docs band-colliding with a benchmark doc, with the
    16-slot signature-agreement Jaccard estimate — catches the
    paraphrased leakage the exact n-gram pass misses.  Benchmark
    buckets/signatures broadcast; corpus signed once."""
    from katta_spark.ops import decontam

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 37 == 0)
    return decontam.minhash_decontaminate(d, bench, text_col="text",
                                          threshold=0.5)


def q_pipe_dsir(spark, sf_dir):
    """DSIR importance resampling: top-50 docs by Gumbel-perturbed
    hashed-n-gram log importance weight toward the lang='de' slice as
    the target distribution.  Feature hashing, smoothing, and the
    hash-derived Gumbel noise are engine-identical, so the SELECTED
    SET matches DuckDB exactly (not just statistically)."""
    from katta_spark.ops import dsir

    d = _docs(spark, sf_dir)
    return dsir.dsir_select(d, d.filter(F.col("lang") == "de"), k=50,
                            text_col="text")


def q_pipe_pack(spark, sf_dir):
    """Greedy sequence packing: docs packed per source in doc_id
    order into 2000-char-budget training sequences; the recursive-CTE
    oracle replays the identical greedy recurrence."""
    from katta_spark.ops import packing

    return packing.pack_greedy(
        _docs(spark, sf_dir), budget=2000, size_col="n_chars",
        group_col="source",
    )


def q_pipe_temperature(spark, sf_dir):
    """Temperature-resampled language mixing (q_l ∝ n_l^0.7 over
    the skewed lang column): the head language is deterministically
    downsampled toward the flattened distribution, rare languages
    keep everything — the multilingual-training resampling recipe,
    rerun/partition invariant."""
    out = sampling.temperature_sample(
        _docs(spark, sf_dir), group_col="lang", alpha=0.7
    )
    return out.select("doc_id", F.col("lang").cast("string").alias("grp"))


def q_pipe_pack_text(spark, sf_dir):
    """Materialized training sequences: packed docs concatenated in
    pack order (order restored engine-independently by sorting
    (offset, text) structs)."""
    from katta_spark.ops import packing

    d = _docs(spark, sf_dir)
    packed = packing.pack_greedy(d, budget=2000, size_col="n_chars",
                                 group_col="source")
    return packing.pack_texts(d, packed, text_col="text")


def q_pipe_sample(spark, sf_dir):
    """Deterministic ~10% hash sample counted per lang: the bucket is
    uniform per doc_id, so the rate holds inside every stratum
    without a per-stratum pass."""
    return (
        sampling.stratified_sample(_docs(spark, sf_dir), rate=0.1, key_col="doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_pipe_source_report(spark, sf_dir):
    """Per-source mixing report: docs, chars, language spread,
    dominant language — the dashboard in front of the quota knobs."""
    from katta_spark.ops.sampling import source_report

    return source_report(_docs(spark, sf_dir))


def q_pipe_top_per_source(spark, sf_dir):
    """Source mixing: best 5 docs per source by quality score
    (rounded to 6 before ranking on BOTH engines so tie geometry is
    identical), tie-break doc_id asc."""
    q = text.quality_score(_docs(spark, sf_dir), text_col="text").select(
        "doc_id", F.round("quality", 6).alias("quality")
    )
    d = _docs(spark, sf_dir).select("doc_id", "source")
    joined = q.join(d, "doc_id").select("source", "doc_id", "quality")
    out = sampling.top_n_per_group(
        joined, "source", 5, [F.desc("quality"), F.asc("doc_id")]
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


def q_ft_span_first(spark, sf_dir):
    """SpanFirstQuery: 'scan' within the first 5 analyzed positions,
    BM25-ranked — runs on the pruned positional postings scan."""
    return _round_score(
        phys_index(spark, sf_dir).span_first_topk("scan", 5, k=10)
    )


def q_ft_span_not(spark, sf_dir):
    """SpanNotQuery: 'scan' occurrences with no 'table' within 2
    positions either side; tf = surviving spans, BM25-rescored —
    positional exclusion on the pruned postings scan."""
    return _round_score(
        phys_index(spark, sf_dir).span_not_topk(
            "scan", "table", pre=2, post=2, k=10
        )
    )


def q_ft_multi_phrase(spark, sf_dir):
    """Lucene MultiPhraseQuery: '"(order|batch) scan"' — slot 1
    accepts either alternative (synonym-expanded phrase), positional
    verify on the pruned postings scan, BM25 sum over present
    alternatives."""
    return _round_score(
        phys_index(spark, sf_dir).multi_phrase_topk(
            [["order", "batch"], ["scan"]], k=10
        )
    )


def q_ft_suggest_infix(spark, sf_dir):
    """AnalyzingInfixSuggester: terms CONTAINING 'ab' ranked by df."""
    return phys_index(spark, sf_dir).suggest_infix("a", n=10)


def q_ft_percolate_lucene(spark, sf_dir):
    """Percolation with full Lucene-syntax standing queries (AND,
    phrase, NOT) — stateless Column conditions, no index."""
    from katta_spark.streaming.percolate import percolate_lucene

    d = _docs(spark, sf_dir).select("doc_id", F.col("text").alias("content"))
    out = percolate_lucene(
        d, {"q_and": "table AND scan", "q_phrase": '"key agg"',
            "q_not": "batch -stream"},
    )
    return out.orderBy("doc_id", "qid")


def q_ft_sort_score_field(spark, sf_dir):
    """Composite sort (Solr sort=score desc, n_chars asc): one scored
    pass joined to the stored sort field, TakeOrderedAndProject."""
    out = phys_index(spark, sf_dir).topk_sorted(
        ["scan"], [("n_chars", "asc")], k=12
    )
    return _round_score(out)


def q_ft_suggest_regex(spark, sf_dir):
    """TermsComponent terms.regex: catalog terms fully matching
    (s|b).* ranked by df."""
    return phys_index(spark, sf_dir).suggest_regex("(s|b).*", n=10)


def q_ft_expand(spark, sf_dir):
    """ExpandComponent: next-2 hidden members of each collapsed
    source group for 'table' (same scored pass as the collapse)."""
    return _round_score(
        phys_index(spark, sf_dir).expand_topk(
            ["table"], "source", k=5, n_expand=2
        )
    )


def q_ft_q_fq(spark, sf_dir):
    """q + fq front door (LuceneServer.parse: every fq ANDs into the
    main query): q='table', fq=['lang:en', 'n_chars:[100 TO 400]']."""
    return _round_score(
        phys_index(spark, sf_dir).query(
            "table", fq=["lang:en", "n_chars:[100 TO 400]"]
        )
    )


def q_ft_explain(spark, sf_dir):
    """Score explanation (Solr debugQuery / Lucene Explanation):
    per-term BM25 breakdown for doc 7 on a two-term query."""
    out = phys_index(spark, sf_dir).explain_score(7, ["table", "scan"])
    return out.select(
        "term", "tf", "df",
        F.round("idf", 6).alias("idf"),
        F.round("tfnorm", 6).alias("tfnorm"),
        F.round("part", 6).alias("part"),
    )


def q_ft_sort_func(spark, sf_dir):
    """Function-query sort (Solr sort=abs(sub(n_chars,250)) asc):
    matches of 'scan' ordered by distance from 250 chars."""
    expr = F.abs(F.col("n_chars").cast("long") - F.lit(250))
    return phys_index(spark, sf_dir).sorted_by_func(
        ["scan"], expr, ["doc_id", "n_chars"], 15
    )


def q_ft_ngroups(spark, sf_dir):
    """Solr group.ngroups: distinct source groups among matches of
    'table', beside the raw hit count."""
    return phys_index(spark, sf_dir).ngroups(["table"], "source")


def q_ts_asof(spark, sf_dir):
    """AS-OF join: every click event carries the latest purchase
    value at-or-before it for the same user (union + per-key ordered
    window — one shuffle, never a range self-join)."""
    from katta_spark.ops import timeseries as TS

    ev = _events(spark, sf_dir)
    out = TS.asof_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "ts", "user_id", "value",
    )
    return (
        _fmt_ts(out, "ts", "ts")
        .select(
            "event_id", "user_id", "ts",
            F.round("asof_value", 6).alias("asof_value"),
        )
        .orderBy("event_id")
    )


def q_ts_zscore(spark, sf_dir):
    """Per-event-type standard score (anomaly signal): one hash agg
    for the moments, broadcast back over the stream."""
    from katta_spark.ops import timeseries as TS

    out = TS.zscore(_events(spark, sf_dir), "event_type", "value")
    return out.select("event_id", "event_type", "z").orderBy("event_id")


def q_ts_rate(spark, sf_dir):
    """Per-user discrete derivative (delta and per-second rate)
    between consecutive events — the PromQL-style gauge derivative;
    one shuffle on user_id, two-row-deep window state."""
    from katta_spark.ops import timeseries as TS

    out = TS.rate(
        _events(spark, sf_dir), "ts", "user_id", "value",
        order_cols=["event_id"],
    )
    return out.select("event_id", "user_id", "delta", "rate_per_s").orderBy(
        "event_id"
    )


def q_ts_counter_rate(spark, sf_dir):
    """PromQL counter rate with reset handling: a per-user decrease
    counts as a restart (increase = the new value), same two-row
    lag-window plan as ts_rate."""
    from katta_spark.ops import timeseries as TS

    out = TS.counter_rate(
        _events(spark, sf_dir), "ts", "user_id", "value",
        order_cols=["event_id"],
    )
    return out.select("event_id", "user_id", "increase",
                      "rate_per_s").orderBy("event_id")


def q_ts_ewma(spark, sf_dir):
    """Per-user EWMA smoothing (ES moving_fn ewma): pandas C-loop
    recurrence per key group, one shuffle, recursive-CTE oracle."""
    from katta_spark.ops import timeseries as TS

    out = TS.ewma(
        _events(spark, sf_dir), "ts", "user_id", "value",
        alpha=0.3, order_cols=["event_id"],
    )
    return out.select("event_id", "user_id", "value",
                      "ewma").orderBy("event_id")


def q_ts_running(spark, sf_dir):
    """Per-user running sum/count ordered by (ts, event_id) — the
    odometer view; one shuffle on user_id."""
    from katta_spark.ops import timeseries as TS

    out = TS.running_agg(
        _events(spark, sf_dir), "ts", "user_id", "value",
        order_cols=["event_id"],
    )
    return out.select("event_id", "user_id", "run_sum", "run_n").orderBy(
        "event_id"
    )


def q_text_bigram_lm(spark, sf_dir):
    """Top-20 add-1 smoothed bigram conditionals (min_count=2): the
    head of the transition table a distributed n-gram LM trainer
    materializes — two hash aggs + a one-row vocabulary broadcast."""
    return text.bigram_lm(_docs(spark, sf_dir), k=20, add_k=1.0,
                          min_count=2, text_col="text")


def q_text_pmi(spark, sf_dir):
    """Top bigram collocations by pointwise mutual information
    (min_count=5) — multi-word-expression mining."""
    return text.pmi_top(_docs(spark, sf_dir), k=20, min_count=5,
                        text_col="text")


def q_ts_cardinality(spark, sf_dir):
    """Exact distinct users per event type (ES cardinality agg)."""
    from katta_spark.ops import timeseries as TS

    return TS.distinct_cardinality(_events(spark, sf_dir), "event_type",
                                   "user_id")


def q_ts_top_hits(spark, sf_dir):
    """Top-3 events by value per type (ES top_hits agg)."""
    from katta_spark.ops import timeseries as TS

    out = TS.top_hits(_events(spark, sf_dir), "event_type", 3,
                      order_col="value", id_col="event_id")
    return out.withColumn("rank", F.col("rank").cast("int"))


def q_ts_percentiles(spark, sf_dir):
    """Exact per-type value percentiles (ES percentiles-agg shape)."""
    from katta_spark.ops import timeseries as TS

    return TS.percentiles(_events(spark, sf_dir), "event_type", "value")


def q_ts_auto_histogram(spark, sf_dir):
    """ES auto_date_histogram: data-driven interval (<=20 aligned
    buckets) chosen by integer-exact arithmetic on a one-row bounds
    table, broadcast back into one hash agg."""
    from katta_spark.ops import timeseries as TS

    out = TS.auto_date_histogram(_events(spark, sf_dir), "ts",
                                 target_buckets=20)
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        "interval_s", "n",
    )


def q_ts_rolling(spark, sf_dir):
    """Per-user rolling mean/min/max over the last 5 events — bounded
    row frame, one shuffle."""
    from katta_spark.ops import timeseries as TS

    out = TS.rolling_agg(_events(spark, sf_dir), "ts", "user_id",
                         "value", n=5, order_cols=["event_id"])
    return out.select("event_id", "user_id", "value", "roll_mean",
                      "roll_min", "roll_max").orderBy("event_id")


def q_ts_bucket_pipeline(spark, sf_dir):
    """ES pipeline aggs (cumulative_sum / derivative / bucket_script)
    over a daily date-histogram — one hash agg to a bounded bucket
    table, window over buckets only."""
    from katta_spark.ops import timeseries as TS

    out = TS.bucket_pipeline(_events(spark, sf_dir), "ts", "1 day",
                             "value")
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        "bucket_sum", "n", "cum_sum", "deriv", "avg_per_doc",
    )


def q_ts_bucket_sort(spark, sf_dir):
    """ES bucket_sort pipeline agg: the 3 busiest days after skipping
    the top 2 (from=2, size=3) — sort + slice over the bucket table
    only."""
    from katta_spark.ops import timeseries as TS

    out = TS.bucket_sort(_events(spark, sf_dir), "ts", "1 day",
                         "value", sort_on="bucket_sum", size=3, frm=2)
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        "bucket_sum", "n", "avg_per_doc",
    )


def q_ts_bucket_selector(spark, sf_dir):
    """ES bucket_selector pipeline agg: only the days whose event
    count exceeds 40 AND per-event average value is positive."""
    from katta_spark.ops import timeseries as TS

    out = TS.bucket_selector(_events(spark, sf_dir), "ts", "1 day",
                             "n > 40 AND avg_per_doc > 0", "value")
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        "bucket_sum", "n", "avg_per_doc",
    )


def q_ts_extended_stats(spark, sf_dir):
    """ES extended_stats per event_type — one keyed five-moment
    hash agg, population variance + sigma bounds."""
    from katta_spark.ops import timeseries as TS

    return TS.extended_stats(_events(spark, sf_dir), "event_type",
                             "value", sigma=2.0)


def q_ts_value_histogram(spark, sf_dir):
    """ES numeric histogram (min_doc_count=0): interval-25 buckets,
    empty buckets emitted from a one-row sequence axis."""
    from katta_spark.ops import timeseries as TS

    return TS.value_histogram(_events(spark, sf_dir), "value",
                              interval=25.0)


def q_ts_normalize(spark, sf_dir):
    """ES normalize pipeline agg: daily bucket sums ->
    percent_of_sum + rescale_0_1 over the bucket axis."""
    from katta_spark.ops import timeseries as TS

    out = TS.normalize_buckets(_events(spark, sf_dir), "ts", "1 day",
                               "value")
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        "bucket_sum", "pct_of_sum", "rescaled",
    )


def q_text_categorize(spark, sf_dir):
    """ES categorize_text (log-template mining): deterministic
    event-derived messages, numbers masked to <num>, one hash agg on
    the template."""
    from katta_spark.ops import text

    msgs = _events(spark, sf_dir).select(
        F.concat(
            F.lit("user "), F.col("user_id").cast("string"),
            F.lit(" did "), F.col("event_type"),
            F.lit(" k="), F.get_json_object("props", "$.k"),
        ).alias("message")
    )
    return text.categorize_text(msgs, text_col="message", m=10)


def q_ts_change_point(spark, sf_dir):
    """ES change_point (level-shift argmax over daily bucket sums):
    two cumulative windows over the bounded bucket table."""
    from katta_spark.ops import timeseries as TS

    out = TS.change_point(_events(spark, sf_dir), "ts", "1 day",
                          "value")
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        "before_mean", "after_mean", "delta",
    )


def q_ts_weighted_avg(spark, sf_dir):
    """ES weighted_avg per event_type, weight = the props.k counter
    — one keyed hash agg over derived columns."""
    from katta_spark.ops import timeseries as TS

    e = _events(spark, sf_dir).withColumn(
        "w", F.get_json_object("props", "$.k").cast("double")
    )
    return TS.weighted_avg(e, "event_type", "value", "w")


def q_ts_serial_diff(spark, sf_dir):
    """ES serial_diff (lag-7 seasonal differencing over daily
    buckets)."""
    from katta_spark.ops import timeseries as TS

    out = TS.serial_diff(_events(spark, sf_dir), "ts", "1 day",
                         "value", lag=7)
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        "bucket_sum", "sdiff",
    )


def q_ts_cum_cardinality(spark, sf_dir):
    """ES cumulative_cardinality (exact): first-seen bucket per user
    + running sum over the daily bucket axis."""
    from katta_spark.ops import timeseries as TS

    out = TS.cumulative_cardinality(_events(spark, sf_dir), "ts",
                                    "1 day", "user_id")
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        "new_keys", "cum_distinct",
    )


def q_graph_expand(spark, sf_dir):
    """Solr graph qparser ({!graph from to maxDepth=2}): BFS from
    customer 1 over namespaced customer->order->supplier edges —
    one broadcast-frontier semi-join per hop."""
    from katta_spark.ops.graph import graph_expand

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e1 = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
        .alias("src"),
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string"))
        .alias("dst"),
    )
    e2 = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string"))
        .alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
        .alias("dst"),
    )
    return graph_expand(e1.unionByName(e2), "src", "dst",
                        ["c1"], max_hops=2)


def q_freq_item_sets(spark, sf_dir):
    """ES frequent_item_sets (sizes 1-2): supplier co-occurrence in
    order baskets — basket-keyed self-join bounded by basket width."""
    from katta_spark.ops.sampling import frequent_item_sets

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return frequent_item_sets(li, "l_orderkey", "l_suppkey",
                              min_support=2, n=20)


def q_ft_group_score(spark, sf_dir):
    """ES has_child / Lucene block-join score_mode=sum: langs ranked
    by the SUM of their hits' BM25 scores for 'table'."""
    return phys_index(spark, sf_dir).group_score_topk(
        ["table"], "lang", score_mode="sum", k=5)


def q_ft_span_within(spark, sf_dir):
    """Lucene SpanWithinQuery: 'key' contained inside a
    (fast .. order) pair at most 4 apart — three-term pruned
    positional scan, surviving-position BM25."""
    return _round_score(
        phys_index(spark, sf_dir).span_within_topk(
            "key", "fast", "order", k=10, width=4)
    )


def q_ft_facet_by_metric(spark, sf_dir):
    """ES terms agg ordered by sub-aggregation: top langs among
    'table' matches by avg n_chars (not by doc count)."""
    return phys_index(spark, sf_dir).facet_by_metric(
        ["table"], "lang", "n_chars", n=5)


def q_ts_rollup(spark, sf_dir):
    """TSDB downsample store (hourly) + rollup-aware daily query —
    count/sum/min/max fold associatively, avg derives, raw events
    are read exactly once at store-build."""
    import shutil

    from katta_spark.ops import timeseries as TS

    d = f"/tmp/katta_rollup/{Path(sf_dir).name}"
    src_meta = _source_fingerprint(sf_dir, "events.parquet")
    meta_p = Path(f"{d}/_source_meta.json")
    import json as _json
    if not (
        Path(f"{d}/_meta.json").exists()
        and meta_p.exists()
        and _json.loads(meta_p.read_text()) == src_meta
    ):
        shutil.rmtree(d, ignore_errors=True)
        TS.downsample_store(_events(spark, sf_dir), d, "ts", "1 hour",
                            "value")
        meta_p.write_text(_json.dumps(src_meta))
    out = TS.rollup_query(spark, d, "1 day")
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        "n", "vsum", "vavg", "vmin", "vmax",
    )


def q_ts_transitions(spark, sf_dir):
    """Event-type Markov transition matrix per user (journey/Sankey
    source): one keyed lag window + one pair hash agg."""
    from katta_spark.ops import timeseries as TS

    return TS.transition_matrix(_events(spark, sf_dir), "ts",
                                "user_id", "event_type",
                                order_cols=["event_id"])


def q_ts_eql_sequence(spark, sf_dir):
    """ES EQL 'sequence by user [view][click][purchase] with
    maxspan=12h' — the funnel chain with the anchor carried through,
    span-filtered (earliest-anchor semantics, documented)."""
    from katta_spark.ops import timeseries as TS

    out = TS.eql_sequence(_events(spark, sf_dir), "ts", "user_id",
                          "event_type", ["view", "click", "purchase"],
                          maxspan_minutes=720)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        F.date_format("t0", fmt).alias("t0"),
        F.date_format("t_last", fmt).alias("t_last"),
        "span_s",
    )


def q_ts_stats_bucket(spark, sf_dir):
    """ES sibling pipeline aggs (stats_bucket + keyed min/max_bucket)
    over daily bucket sums — one global agg over the bucket table."""
    from katta_spark.ops import timeseries as TS

    out = TS.stats_bucket(_events(spark, sf_dir), "ts", "1 day",
                          "value")
    return out.select(
        "n_buckets", "bucket_avg", "bucket_sum_total",
        F.date_format("min_bucket_key", "yyyy-MM-dd HH:mm:ss")
        .alias("min_bucket_key"),
        "min_bucket_sum",
        F.date_format("max_bucket_key", "yyyy-MM-dd HH:mm:ss")
        .alias("max_bucket_key"),
        "max_bucket_sum",
    )


def q_ts_heatmap(spark, sf_dir):
    """Kibana/Grafana activity heatmap: dow x hour counts + avg —
    one 168-key hash agg."""
    from katta_spark.ops import timeseries as TS

    return TS.activity_heatmap(_events(spark, sf_dir), "ts", "value")


def q_ts_boxplot(spark, sf_dir):
    """ES boxplot agg per event_type — one keyed hash agg, five
    order statistics from one percentile pass."""
    from katta_spark.ops import timeseries as TS

    return TS.boxplot(_events(spark, sf_dir), "event_type", "value")


def q_ts_ttest(spark, sf_dir):
    """ES t_test agg (Welch's) comparing value between click and
    view events — one conditional-moment hash agg."""
    from katta_spark.ops import timeseries as TS

    return TS.t_test(_events(spark, sf_dir), "event_type",
                     "click", "view", "value")


def q_text_string_stats(spark, sf_dir):
    """ES string_stats (+ entropy): length four-stat and corpus
    character-distribution Shannon entropy — char hash agg is
    alphabet-bounded after map-side combine."""
    from katta_spark.ops import text

    return text.string_stats(_docs(spark, sf_dir), text_col="text")


def q_text_multi_terms(spark, sf_dir):
    """ES multi_terms agg over (lang, source) — compound-key hash
    agg + global top-N."""
    from katta_spark.ops import text

    return text.multi_terms(_docs(spark, sf_dir),
                            ["lang", "source"], size=10)


def q_ts_funnel(spark, sf_dir):
    """Ordered funnel view -> click -> purchase: per-step keyed
    min-aggs chained on shrinking key sets."""
    from katta_spark.ops import timeseries as TS

    return TS.funnel(_events(spark, sf_dir), "ts", "user_id",
                     "event_type", ["view", "click", "purchase"])


def q_ts_retention(spark, sf_dir):
    """Weekly cohort retention matrix (cohort = first-event week):
    two shuffles — cohort min-agg + distinct activity pairs."""
    from katta_spark.ops import timeseries as TS

    out = TS.retention(_events(spark, sf_dir), "ts", "user_id",
                       period="week", max_periods=8)
    return out.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
        "period_n", "n_active",
    )


def q_ts_pct_ranks(spark, sf_dir):
    """ES percentile_ranks: CDF at fixed probes per event type — one
    conditional-mean hash agg, never a sort."""
    from katta_spark.ops import timeseries as TS

    return TS.percentile_ranks(_events(spark, sf_dir), "event_type",
                               "value", values=(10.0, 50.0, 90.0))


def q_ts_mad(spark, sf_dir):
    """Per-type median + median absolute deviation (robust anomaly
    baseline): two keyed percentile aggs, AQE-broadcast median join."""
    from katta_spark.ops import timeseries as TS

    return TS.mad(_events(spark, sf_dir), "event_type", "value")


def q_text_chunks(spark, sf_dir):
    """Overlapping token-window chunks (RAG splitter): 24-token
    chunks, stride 16, over the first docs (bounded output)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    return text.chunk_texts(d, size=24, stride=16, text_col="text").orderBy(
        "doc_id", "chunk_id"
    )


def q_pipe_rollup(spark, sf_dir):
    """Hierarchical corpus budget: (lang, source) counts + subtotals
    at every rollup level in one pass (Spark native rollup)."""
    from katta_spark.ops.sampling import rollup_report

    return rollup_report(_docs(spark, sf_dir), ["lang", "source"])


def q_pipe_composite(spark, sf_dir):
    """ES composite aggregation page: next 15 (event_type, user_id)
    groups strictly after the ('error', 50) key tuple — the keyset
    predicate prunes already-paged groups BEFORE the shuffle."""
    from katta_spark.ops.sampling import composite_page

    return composite_page(
        _events(spark, sf_dir), ["event_type", "user_id"], 15,
        after=("error", 50), value_col="value",
    )


def q_pipe_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis priorities from the md5 hash-uniform):
    25 docs, weight = n_chars."""
    from katta_spark.ops.sampling import weighted_sample

    return weighted_sample(_docs(spark, sf_dir), 25, "n_chars").select(
        "doc_id", "es_key"
    )


def q_text_curate(spark, sf_dir):
    """End-to-end curation verdict: quality + repetition + PII +
    language signals composed into one keep/drop column — the
    filter stage every training pipeline runs before dedup."""
    return text.curate(_docs(spark, sf_dir), text_col="text").orderBy(
        "doc_id"
    )


def q_text_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the token distribution (nats) —
    low entropy flags repetitive/boilerplate text."""
    return text.token_entropy(_docs(spark, sf_dir), text_col="text")


def q_ft_dismax(spark, sf_dir):
    """DisjunctionMax (Solr dismax qf): the same query searched as a
    content term AND a scored field posting; best clause wins, the
    other tie-breaks at 0.3.  Two clauses, so the float combine is
    order-exact against the oracle."""
    return _round_score(
        phys_index(spark, sf_dir).dismax_topk(
            ["table", "lang:en"], tie=0.3, k=10
        )
    )


def q_ft_boost_func(spark, sf_dir):
    """Function-query boost (Solr boost=recip(...)): BM25 * a
    length-decay function of the stored n_chars field, re-ranked
    after the multiplication."""
    boost = F.lit(1.0) + F.lit(1.0) / (
        F.lit(1.0) + F.col("n_chars").cast("double") / F.lit(500.0)
    )
    return _round_score(
        phys_index(spark, sf_dir).topk_boosted(["table"], boost, k=10)
    )


def q_ft_decay_gauss(spark, sf_dir):
    """ES function_score gauss decay on n_chars (origin 200, scale
    150): BM25 * decay over ALL matches, exhaustive re-rank."""
    from katta_spark.fulltext.scoring import decay_col

    boost = decay_col("gauss", "n_chars", origin=200.0, scale=150.0)
    return _round_score(
        phys_index(spark, sf_dir).topk_boosted(["table"], boost, k=10)
    )


def q_ft_decay_linear(spark, sf_dir):
    """ES function_score linear decay (origin 250, scale 200, offset
    25, decay 0.3) — zero outside the support, exact at scale."""
    from katta_spark.fulltext.scoring import decay_col

    boost = decay_col("linear", "n_chars", origin=250.0, scale=200.0,
                      offset=25.0, decay=0.3)
    return _round_score(
        phys_index(spark, sf_dir).topk_boosted(["scan"], boost, k=10)
    )


def q_ft_rerank(spark, sf_dir):
    """Solr ReRankQParser: top-40 by the main query rescored by a
    second query (combined = main + 1.5*rerank), reordered, top-10.
    Stage 2 decodes only candidate blocks (doc-range pruned)."""
    return _round_score(
        phys_index(spark, sf_dir).rerank_topk(
            ["table"], ["spark", "data"],
            rerank_docs=40, weight=1.5, k=10,
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- fulltext query engine (Katta parity; SURVEY.md §2) ---
        "ft_topk_common": _q_topk(["table"]),
        "ft_topk_rare": _q_topk(["dup"]),
        "ft_and": _q_topk(["spark", "vector"], mode="and"),
        "ft_or": _q_topk(["dup", "key"], mode="or"),
        "ft_filter": _q_topk(["query"], filters={"lang": "en"}),
        "ft_paginate": _q_topk(["batch"], k=20, offset=60),
        "ft_count": q_ft_count,
        "ft_group_langs": q_ft_group_langs,
        "ft_facet_lang": q_ft_facet_lang,
        "ft_range_facet": q_ft_range_facet,
        "ft_sorted": q_ft_sorted,
        "ft_fetch": q_ft_fetch,
        "ft_term_catalog": q_ft_term_catalog,
        "ft_stats": q_ft_stats,
        # --- physical compressed-postings index (same semantics,
        #     served from varint posting blocks + block-max WAND) ---
        "ft_phys_topk": _q_phys_topk(["table"]),
        "ft_phys_wand_or": _q_phys_topk(["spark", "data", "key"], k=15),
        "ft_phys_and": _q_phys_topk(["spark", "vector"], mode="and"),
        "ft_phys_filter": _q_phys_topk(["query"], filters={"lang": "en"}),
        "ft_phys_paginate": _q_phys_topk(["batch"], k=20, offset=60),
        "ft_phys_count": q_phys_count,
        "ft_serve_topk": q_serve_topk,
        "ft_serve_count": q_serve_count,
        "ft_serve_lucene": q_serve_lucene,
        "ft_serve_lucene_sharded": q_serve_lucene_sharded,
        "ft_serve_replica": q_serve_replica,
        "ft_serve_phrase_sharded": q_serve_phrase_sharded,
        "ft_serve_sorted": q_serve_sorted,
        "ft_serve_range_facet": q_serve_range_facet,
        "ft_serve_spellcheck": q_serve_spellcheck,
        "ft_serve_highlight": q_serve_highlight,
        "ft_serve_stats": q_serve_stats,
        "ft_serve_pivot_facet": q_serve_pivot_facet,
        "ft_serve_envelope": q_serve_envelope,
        "ft_serve_interval_facet": q_serve_interval_facet,
        "ft_serve_rare_terms": q_serve_rare_terms,
        "ft_serve_term_vectors": q_serve_term_vectors,
        "ft_serve_group_score": q_serve_group_score,
        "ft_serve_suggest_regex": q_serve_suggest_regex,
        "ft_serve_suggest_infix": q_serve_suggest_infix,
        "ft_serve_facet_by_metric": q_serve_facet_by_metric,
        "ft_serve_ngroups": q_serve_ngroups,
        "ft_serve_expand": q_serve_expand,
        "ft_serve_adjacency": q_serve_adjacency,
        "ft_serve_diversified": q_serve_diversified,
        "ft_serve_facet_stats": q_serve_facet_stats,
        "ft_serve_facet_query": q_serve_facet_query,
        "ft_serve_facet_index": q_serve_facet_index,
        "ft_serve_facet_prefix": q_serve_facet_prefix,
        "ft_serve_collapse": q_serve_collapse,
        "ft_serve_group": q_serve_group,
        "ft_serve_sig_terms": q_serve_sig_terms,
        "ft_serve_mlt": q_serve_mlt,
        "ft_phys_facet": q_phys_facet,
        "ft_facet_index": q_phys_facet_index,
        "ft_facet_prefix": q_phys_facet_prefix,
        "ft_rare_terms": q_phys_rare_terms,
        "ft_common_terms": q_phys_common_terms,
        "ft_cross_fields": q_phys_cross_fields,
        "ft_most_fields": q_phys_most_fields,
        "ft_combined_fields": q_phys_combined_fields,
        "ft_distance_feature": q_ft_distance_feature,
        "ft_has_parent": q_ft_has_parent,
        "ft_terms_set": q_ft_terms_set,
        "ft_boosting": q_ft_boosting,
        "ft_random_score": q_ft_random_score,
        "ft_rank_eval": q_ft_rank_eval,
        "ft_rrf": q_ft_rrf,
        "ft_suggest_phrase": q_ft_suggest_phrase,
        "ft_phys_fetch": q_phys_fetch,
        "ft_phys_phrase": q_phys_phrase,
        "ft_multi_phrase": q_ft_multi_phrase,
        "ft_near": q_ft_near,
        "ft_phys_snapshot": q_phys_snapshot,
        "ft_phys_highlight": q_phys_highlight,
        "ft_suggest": q_terms_suggest,
        "ft_field_stats": q_field_stats,
        "ft_interval_facet": q_ft_interval_facet,
        "ft_range_other": q_ft_range_other,
        "ft_facet_stats": q_ft_facet_stats,
        "ft_group_topk": q_group_topk,
        "ft_diversified": q_diversified_sampler,
        "ft_phrase_prefix": q_ft_phrase_prefix,
        "ft_rank_feature": q_ft_rank_feature,
        "ft_mlt": q_mlt,
        "ft_multi_topk": q_multi_topk,
        "ft_percolate": q_percolate,
        "ft_percolate_lucene": q_ft_percolate_lucene,
        "ft_cursor": q_ft_cursor,
        "ft_min_match": q_ft_min_match,
        "ft_pivot_facet": q_ft_pivot_facet,
        "ft_spellcheck": q_ft_spellcheck,
        "ft_boost_func": q_ft_boost_func,
        "ft_decay_gauss": q_ft_decay_gauss,
        "ft_decay_linear": q_ft_decay_linear,
        "ft_dismax": q_ft_dismax,
        "ft_rerank": q_ft_rerank,
        "ft_facet_query": q_ft_facet_query,
        "ft_adjacency": q_ft_adjacency,
        "ft_collapse": q_ft_collapse,
        "ft_join": q_ft_join,
        "ft_term_vectors": q_ft_term_vectors,
        "ft_elevate": q_ft_elevate,
        "ft_get": q_ft_get,
        "ft_sig_terms": q_ft_sig_terms,
        "ft_sort_func": q_ft_sort_func,
        "ft_span_first": q_ft_span_first,
        "ft_span_not": q_ft_span_not,
        "ft_explain": q_ft_explain,
        "ft_q_fq": q_ft_q_fq,
        "ft_expand": q_ft_expand,
        "ft_sort_score_field": q_ft_sort_score_field,
        "ft_suggest_regex": q_ft_suggest_regex,
        "ft_suggest_infix": q_ft_suggest_infix,
        "ft_ngroups": q_ft_ngroups,
        # --- Lucene-syntax query strings through the parser +
        #     boolean evaluator (reference front door parity:
        #     LuceneServer.parse, LuceneServer.java:1314-1353) ---
        "ft_q_not": _q_qstr("table -scan"),
        "ft_q_range": _q_qstr("scan AND n_chars:[100 TO 300]"),
        "ft_q_nested": _q_qstr("(dup OR key) AND table"),
        "ft_q_phrase": _q_qstr('"key agg"'),
        "ft_q_wildcard": _q_qstr("s*"),
        "ft_q_boost": _q_qstr("table^2 OR spark"),
        "ft_q_must": _q_qstr("+table spark"),
        "ft_q_field": _q_qstr("table AND lang:en"),
        "ft_q_field_or": _q_qstr("dup OR source:src3"),
        "ft_q_matchall": _q_qstr("*:*"),
        "ft_q_slop": _q_qstr('"window stream"~3'),
        "ft_q_fuzzy": _q_qstr("batc~2"),
        "ft_q_regex": _q_qstr("/tab(le)?[0-9]*/"),
        "ft_q_const": _q_qstr("(dup OR key)^=1.5 OR table"),
        "ft_q_synonym": q_synonym,
        "ft_stop_and": q_stop_and,
        # --- training-data pipeline ops ---
        "dedup_exact": q_dedup_exact,
        "dedup_fingerprint": q_dedup_fingerprint,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_containment": q_dedup_containment,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_keep_best": q_dedup_keep_best,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "text_langid": q_text_langid,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "text_fingerprint": q_text_fingerprint,
        "text_clean": q_text_clean,
        "text_paragraph_dedup": q_text_paragraph_dedup,
        "text_scrub_invisible": q_text_scrub_invisible,
        "src_warc_roundtrip": q_src_warc_roundtrip,
        "text_repetition": q_text_repetition,
        "text_bpe_tokens": q_text_bpe_tokens,
        "text_bpe_pairs": q_text_bpe_pairs,
        "text_pii_scrub": q_text_pii_scrub,
        "text_ngram_top": q_text_ngram_top,
        "text_unigram_lp": q_text_unigram_lp,
        "text_keywords": q_text_keywords,
        "text_entropy": q_text_entropy,
        "text_curate": q_text_curate,
        "text_pmi": q_text_pmi,
        "text_bigram_lm": q_text_bigram_lm,
        "text_chunks": q_text_chunks,
        "text_lm_buckets": q_text_lm_buckets,
        "text_nfc": q_text_nfc,
        "text_code_quality": q_text_code_quality,
        "sketch_kmv_vocab": q_sketch_kmv_vocab,
        "sketch_bloom": q_sketch_bloom,
        "sketch_cms": q_sketch_cms,
        "sim_mmr": q_sim_mmr,
        "sketch_len_quantile": q_sketch_len_quantile,
        "dedup_spans": q_dedup_spans,
        "dedup_span_stats": q_dedup_span_stats,
        "dedup_trim_spans": q_dedup_trim_spans,
        "pipe_hash_split": q_pipe_hash_split,
        "pipe_leakage_split": q_pipe_leakage_split,
        "pipe_length_batches": q_pipe_length_batches,
        "pipe_mixture_order": q_pipe_mixture_order,
        "pipe_decontam": q_pipe_decontam,
        "pipe_decontam_fuzzy": q_pipe_decontam_fuzzy,
        "pipe_dsir": q_pipe_dsir,
        "pipe_pack": q_pipe_pack,
        "pipe_pack_text": q_pipe_pack_text,
        "pipe_temperature": q_pipe_temperature,
        "pipe_sample": q_pipe_sample,
        "pipe_top_per_source": q_pipe_top_per_source,
        "pipe_source_report": q_pipe_source_report,
        "pipe_rollup": q_pipe_rollup,
        "pipe_composite": q_pipe_composite,
        "pipe_weighted_sample": q_pipe_weighted_sample,
        "sim_cosine_topk": q_sim_cosine_topk,
        "sim_project": q_sim_project,
        "sim_knn_dot": q_sim_knn_dot,
        "sim_knn_l2": q_sim_knn_l2,
        "sim_lsh_ann": q_sim_lsh_ann,
        "sim_ivf_ann": q_sim_ivf_ann,
        "sim_ivf_batch": q_sim_ivf_batch,
        "sim_ivf_filtered": q_sim_ivf_filtered,
        "dedup_embed_cosine": q_dedup_embed_cosine,
        "dedup_semantic": q_dedup_semantic,
        "mm_image_meta": q_mm_image_meta,
        "mm_pgm_meta": q_mm_pgm_meta,
        "mm_pgm_features": q_mm_pgm_features,
        "mm_wav_meta": q_mm_wav_meta,
        "mm_wav_features": q_mm_wav_features,
        "mm_stream_frames": q_mm_stream_frames,
        "mm_byte_stats": q_mm_byte_stats,
        "mm_frame_sample": q_mm_frame_sample,
        # --- time-series ops over the events table ---
        "ts_date_facet": q_ts_date_facet,
        "ts_window_agg": q_ts_window_agg,
        "ts_ohlc": q_ts_ohlc,
        "ts_corr": q_ts_corr,
        "ts_session_agg": q_ts_session_agg,
        "ts_sliding_window": q_ts_sliding_window,
        "ts_gap_fill": q_ts_gap_fill,
        "ts_asof": q_ts_asof,
        "ts_zscore": q_ts_zscore,
        "ts_percentiles": q_ts_percentiles,
        "ts_mad": q_ts_mad,
        "ts_pct_ranks": q_ts_pct_ranks,
        "ts_rolling": q_ts_rolling,
        "ts_bucket_pipeline": q_ts_bucket_pipeline,
        "ts_bucket_sort": q_ts_bucket_sort,
        "ts_bucket_selector": q_ts_bucket_selector,
        "ts_boxplot": q_ts_boxplot,
        "ts_extended_stats": q_ts_extended_stats,
        "ts_value_histogram": q_ts_value_histogram,
        "ts_normalize": q_ts_normalize,
        "text_categorize": q_text_categorize,
        "ts_change_point": q_ts_change_point,
        "ts_weighted_avg": q_ts_weighted_avg,
        "ts_heatmap": q_ts_heatmap,
        "ts_rollup": q_ts_rollup,
        "ts_stats_bucket": q_ts_stats_bucket,
        "ts_transitions": q_ts_transitions,
        "ts_eql_sequence": q_ts_eql_sequence,
        "ts_serial_diff": q_ts_serial_diff,
        "ts_cum_cardinality": q_ts_cum_cardinality,
        "ft_facet_by_metric": q_ft_facet_by_metric,
        "ft_group_score": q_ft_group_score,
        "ft_span_within": q_ft_span_within,
        "ft_linear_fuse": q_ft_linear_fuse,
        "sim_sq_ann": q_sim_sq_ann,
        "graph_expand": q_graph_expand,
        "pipe_freq_item_sets": q_freq_item_sets,
        "text_vocab_kl": q_text_vocab_kl,
        "text_bigram_lp": q_text_bigram_lp,
        "ts_ttest": q_ts_ttest,
        "text_string_stats": q_text_string_stats,
        "text_multi_terms": q_text_multi_terms,
        "ts_auto_histogram": q_ts_auto_histogram,
        "ts_funnel": q_ts_funnel,
        "ts_retention": q_ts_retention,
        "ts_cardinality": q_ts_cardinality,
        "ts_top_hits": q_ts_top_hits,
        "ts_running": q_ts_running,
        "ts_ewma": q_ts_ewma,
        "ts_rate": q_ts_rate,
        "ts_counter_rate": q_ts_counter_rate,
        "ts_top_events": q_ts_top_events,
        "ts_json": q_ts_json,
        "ts_date_math": q_ts_date_math,
    }


# ----------------------------------------------------------------- oracle

def oracle_sql() -> dict[str, str]:
    ctes = O.index_ctes()
    out: dict[str, str] = {
        "ft_topk_common": O.topk_sql(["table"]),
        "ft_topk_rare": O.topk_sql(["dup"]),
        "ft_and": O.topk_sql(["spark", "vector"], mode="and"),
        "ft_or": O.topk_sql(["dup", "key"], mode="or"),
        "ft_filter": O.topk_sql(["query"], filter_sql="lang = 'en'"),
        "ft_paginate": O.topk_sql(["batch"], k=20, offset=60),
        "ft_count": f"""{ctes}{O.matched_sql(["dup", "key"])}
SELECT count(*) AS n_hits FROM matched""",
        "ft_group_langs": f"""{ctes}{O.matched_sql(["dup"])}
SELECT DISTINCT d.lang FROM documents d JOIN matched m ON d.doc_id = m.doc_id""",
        "ft_facet_lang": f"""{ctes}{O.matched_sql(["table"])}
SELECT lang, count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
GROUP BY lang ORDER BY cnt DESC, lang ASC LIMIT 5""",
        "ft_range_facet": f"""{ctes}{O.matched_sql(["scan"])}
SELECT 0.0 + floor((CAST(n_chars AS DOUBLE) - 0.0) / 50.0) * 50.0 AS bucket_start,
       count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
WHERE CAST(n_chars AS DOUBLE) >= 0.0 AND CAST(n_chars AS DOUBLE) < 500.0
GROUP BY bucket_start HAVING count(*) >= 1 ORDER BY bucket_start""",
        "ft_sorted": f"""{ctes}{O.matched_sql(["merge"])}
SELECT doc_id, source, n_chars FROM (
  SELECT d.doc_id, d.source, d.n_chars
  FROM documents d JOIN matched m ON d.doc_id = m.doc_id
  ORDER BY d.source ASC, d.n_chars DESC, d.doc_id ASC LIMIT 20
)""",
        "ft_fetch": O.topk_fetch_sql(["dup"], k=5, fields=["lang", "source"]),
        # physical index: identical semantics to the logical engine,
        # so the oracles are the same SQL
        "ft_phys_topk": O.topk_sql(["table"]),
        "ft_phys_wand_or": O.topk_sql(["spark", "data", "key"], k=15),
        "ft_phys_and": O.topk_sql(["spark", "vector"], mode="and"),
        "ft_phys_filter": O.topk_sql(["query"], filter_sql="lang = 'en'"),
        "ft_phys_paginate": O.topk_sql(["batch"], k=20, offset=60),
        "ft_phys_count": f"""{ctes}{O.matched_sql(["dup", "key"])}
SELECT count(*) AS n_hits FROM matched""",
        "ft_serve_topk": O.topk_sql(["table"]),
        "ft_serve_lucene": O.lucene_topk_sql(
            [("dup", 1.0), ("key", 1.0), ("table", 1.0)],
            must_doc_sql=[
                O.term_docs_sql(["table"]),
                O.term_docs_sql(["dup", "key"]),
            ],
        ),
        "ft_serve_count": f"""{ctes}{O.matched_sql(["dup", "key"])}
SELECT count(*) AS n_hits FROM matched""",
        "ft_serve_lucene_sharded": O.lucene_topk_sql(
            [("dup", 1.0), ("key", 1.0), ("table", 1.0)],
            must_doc_sql=[
                O.term_docs_sql(["table"]),
                O.term_docs_sql(["dup", "key"]),
            ],
        ),
        # replica failover must be invisible in the results: the
        # oracle is the HEALTHY sharded query's SQL unchanged
        "ft_serve_replica": O.lucene_topk_sql(
            [("dup", 1.0), ("key", 1.0), ("table", 1.0)],
            must_doc_sql=[
                O.term_docs_sql(["table"]),
                O.term_docs_sql(["dup", "key"]),
            ],
        ),
        "ft_serve_phrase_sharded": O.phrase_sql(["order", "fast"], k=10),
        "ft_serve_spellcheck": O.spellcheck_sql("tabel", max_edits=2,
                                                n=5),
        "ft_serve_highlight": O.highlight_sql(["batch"], k=5, width=60),
        "ft_serve_sorted": f"""{ctes}{O.matched_sql(["merge"])}
SELECT doc_id, source, n_chars FROM (
  SELECT d.doc_id, d.source, d.n_chars
  FROM documents d JOIN matched m ON d.doc_id = m.doc_id
  ORDER BY d.source ASC, d.n_chars DESC, d.doc_id ASC LIMIT 20
)""",
        "ft_serve_range_facet": f"""{ctes}{O.matched_sql(["scan"])}
SELECT 0.0 + floor((CAST(n_chars AS DOUBLE) - 0.0) / 50.0) * 50.0 AS bucket_start,
       count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
WHERE CAST(n_chars AS DOUBLE) >= 0.0 AND CAST(n_chars AS DOUBLE) < 500.0
GROUP BY bucket_start HAVING count(*) >= 1 ORDER BY bucket_start""",
        "ft_phys_facet": f"""{ctes}{O.matched_sql(["table"])}
SELECT lang, count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
GROUP BY lang ORDER BY cnt DESC, lang ASC LIMIT 5""",
        "ft_facet_index": f"""{ctes}{O.matched_sql(["table"])}
SELECT source, count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
GROUP BY source ORDER BY source ASC LIMIT 10""",
        "ft_facet_prefix": f"""{ctes}{O.matched_sql(["table"])}
SELECT source, count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
WHERE d.source LIKE 'src1%'
GROUP BY source HAVING count(*) >= 2
ORDER BY cnt DESC, source ASC LIMIT 20""",
        "ft_serve_term_vectors": O.term_vectors_sql([3, 7, 11]),
        "ft_serve_suggest_regex": f"""{O.index_ctes()}
SELECT term, df FROM dfv
WHERE regexp_full_match(term, '(s|b).*') AND NOT contains(term, ':')
ORDER BY df DESC, term ASC LIMIT 10""",
        "ft_serve_suggest_infix": O.suggest_infix_sql("a", n=10),
        "ft_serve_facet_by_metric": O.facet_by_metric_sql(
            ["table"], "lang", "n_chars", n=5),
        "ft_serve_group_score": O.group_score_sql(
            ["table"], "lang", score_mode="sum", k=5),
        "ft_serve_ngroups": f"""{ctes}{O.matched_sql(["table"])}
SELECT CAST(count(DISTINCT d.source) AS BIGINT) AS n_groups,
       CAST(count(*) AS BIGINT) AS n_hits
FROM documents d JOIN matched m ON d.doc_id = m.doc_id""",
        "ft_serve_expand": O.expand_sql(["table"], "source", k=5,
                                        n_expand=2),
        "ft_serve_adjacency": O.adjacency_matrix_sql(_MULTI_Q),
        "ft_serve_diversified": O.diversified_sampler_sql(
            ["table"], "lang", max_per_key=2, shard_size=20),
        "ft_serve_rare_terms": f"""{ctes}{O.matched_sql(["scan"])}
SELECT source, count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
WHERE d.source IS NOT NULL
GROUP BY source HAVING count(*) <= 18
ORDER BY cnt ASC, source ASC LIMIT 10""",
        "ft_serve_facet_stats": O.facet_stats_sql(["table"], "lang",
                                                  "n_chars"),
        "ft_serve_interval_facet": O.interval_facet_sql(
            ["data"], "n_chars", _INTERVALS
        ),
        "ft_serve_facet_query": O.facet_queries_sql(_MULTI_Q),
        "ft_serve_envelope": f"""{ctes}{O._scored_ctes(["dup", "key"], 8)}
SELECT t.doc_id, round(t.score, 6) AS score,
       (SELECT count(*) FROM scored) AS num_found,
       (SELECT round(max(score), 6) FROM scored) AS max_score,
       CAST(2 AS BIGINT) AS shards_total,
       CAST(0 AS BIGINT) AS n_shards_failed
FROM top t""",
        "ft_serve_facet_index": f"""{ctes}{O.matched_sql(["table"])}
SELECT source, count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
GROUP BY source ORDER BY source ASC LIMIT 10""",
        "ft_serve_facet_prefix": f"""{ctes}{O.matched_sql(["table"])}
SELECT source, count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
WHERE d.source LIKE 'src1%'
GROUP BY source HAVING count(*) >= 2
ORDER BY cnt DESC, source ASC LIMIT 20""",
        "ft_common_terms": O.common_terms_sql(
            ["table", "dup"], k=10, max_df_frac=0.1
        ),
        "ft_most_fields": O.most_fields_sql(
            ["table", "src1"], ["content", "source"], k=10
        ),
        "ft_combined_fields": O.combined_fields_sql(
            ["table", "src1"], ["content", "source"], k=10
        ),
        "ft_distance_feature": O.distance_feature_sql(
            ["table"], "n_chars", origin=200.0, pivot=100.0, k=10,
            boost=2.0,
        ),
        "ft_has_parent": O.has_parent_sql(
            ["table"], "lang", k=10, score_mode="max"
        ),
        "ft_terms_set": O.terms_set_sql(
            ["table", "scan", "key"], "doc_id % 2 + 1", k=10
        ),
        "ft_boosting": O.boosting_sql(
            ["table"], ["scan"], negative_boost=0.3, k=10
        ),
        "ft_random_score": O.random_score_sql(["table"], seed="r2", k=10),
        "ft_cross_fields": O.cross_fields_sql(
            ["table", "src1"], ["content", "source"], k=10
        ),
        "ft_suggest_phrase": O.suggest_phrase_sql(
            ["tabl", "scann"], max_edits=2, per_word=3, n=5
        ),
        "ft_rrf": O.rrf_sql(["table", "scan"], k_each=20, n=10),
        "ft_rank_eval": O.rank_eval_sql(
            _RANK_EVAL_QUERIES,
            [("q1", "lang = 'en'"), ("q2", "source = 'src1'")],
            k=10,
        ),
        "ft_rare_terms": f"""{ctes}{O.matched_sql(["scan"])}
SELECT source, count(*) AS cnt
FROM documents d JOIN matched m ON d.doc_id = m.doc_id
WHERE d.source IS NOT NULL
GROUP BY source HAVING count(*) <= 18
ORDER BY cnt ASC, source ASC LIMIT 10""",
        "ft_phys_fetch": O.topk_fetch_sql(["dup"], k=5, fields=["lang", "source"]),
        "ft_phys_phrase": O.phrase_sql(["order", "fast"], k=10),
        "ft_multi_phrase": O.multi_phrase_sql(
            [["order", "batch"], ["scan"]], k=10
        ),
        "ft_near": O.near_sql(["merge", "sort"], slop=2, k=10),
        "ft_phys_snapshot": O.topk_sql(
            ["table", "spark"], k=10, docs_where="doc_id % 2 = 0"
        ),
        "ft_phys_highlight": O.highlight_sql(["batch"], k=5, width=60),
        "ft_suggest": O.suggest_sql("s", n=10),
        "ft_field_stats": O.field_stats_sql(["scan"], "n_chars"),
        "ft_interval_facet": O.interval_facet_sql(
            ["data"], "n_chars", _INTERVALS
        ),
        "ft_range_other": O.range_other_sql(["scan"], "n_chars", 100.0, 300.0),
        "ft_facet_stats": O.facet_stats_sql(["table"], "lang", "n_chars"),
        "ft_group_topk": O.group_topk_sql(["table"], "lang", k_per_group=3),
        "ft_diversified": O.diversified_sampler_sql(
            ["table"], "lang", max_per_key=2, shard_size=20),
        "ft_phrase_prefix": O.phrase_prefix_sql(
            ["fast"], "s", k=10, max_expansions=50),
        "ft_rank_feature": O.rank_feature_sql(
            ["table"], "n_chars", pivot=250.0, k=10, boost=2.0),
        "ft_mlt": O.mlt_sql(7, m_terms=5, k=10),
        "ft_multi_topk": O.multi_topk_sql(_MULTI_Q, k=5),
        "ft_percolate": O.percolate_sql(_MULTI_Q),
        # cursor page 2 of size k == rank slice [k, 2k): the oracle
        # states the CONTRACT (rank identity), the engine path proves
        # the cursor mechanics (no offset in its plan — tested)
        "ft_cursor": O.topk_sql(["table"], k=5, offset=5),
        "ft_min_match": O.min_match_topk_sql(["dup", "key", "table"], 2, k=10),
        "ft_pivot_facet": O.pivot_facet_sql(["table"], "lang", "source",
                                            n1=3, n2=2),
        "ft_serve_stats": O.field_stats_sql(["scan"], "n_chars"),
        "ft_serve_pivot_facet": O.pivot_facet_sql(
            ["table"], "lang", "source", n1=3, n2=2),
        "ft_serve_collapse": O.collapse_topk_sql(["table"], "lang",
                                                 k=10),
        "ft_serve_group": O.group_topk_sql(["table"], "lang",
                                           k_per_group=3),
        "ft_serve_sig_terms": O.significant_terms_sql(["scan"],
                                                      m_terms=10,
                                                      min_df=2),
        "ft_serve_mlt": O.mlt_sql(7, m_terms=5, k=10),
        "ft_spellcheck": O.spellcheck_sql("tabel", max_edits=2, n=5),
        "ft_boost_func": O.boosted_topk_sql(
            ["table"],
            "1.0 + 1.0 / (1.0 + CAST(d.n_chars AS DOUBLE) / 500.0)",
            k=10,
        ),
        "ft_dismax": O.dismax_sql(
            ["table"], [("lang", "en")], tie=0.3, k=10
        ),
        "ft_decay_gauss": O.boosted_topk_sql(
            ["table"],
            _scoring.decay_sql("gauss", "n_chars", origin=200.0,
                               scale=150.0),
            k=10,
        ),
        "ft_decay_linear": O.boosted_topk_sql(
            ["scan"],
            _scoring.decay_sql("linear", "n_chars", origin=250.0,
                               scale=200.0, offset=25.0, decay=0.3),
            k=10,
        ),
        "ft_rerank": O.rerank_sql(
            ["table"], ["spark", "data"], rerank_docs=40, weight=1.5, k=10
        ),
        "ft_facet_query": O.facet_queries_sql(_MULTI_Q),
        "ft_adjacency": O.adjacency_matrix_sql(_MULTI_Q),
        "ft_collapse": O.collapse_topk_sql(["table"], "lang", k=10),
        "ft_join": O.join_topk_sql(["table"], "source", "source", ["dup"], k=10),
        "ft_term_vectors": O.term_vectors_sql([3, 7, 11]),
        "ft_elevate": O.elevate_topk_sql(
            ["table"], elevate_ids=[7, 3], k=10, exclude_ids=[11]
        ),
        "ft_get": """
SELECT doc_id, lang, source, n_chars
FROM documents WHERE doc_id IN (3, 7, 11)""",
        "ft_sig_terms": O.significant_terms_sql(["scan"], m_terms=10,
                                                min_df=2),
        # Lucene-syntax queries: boolean-evaluator oracles
        "ft_q_not": O.lucene_topk_sql(
            [("table", 1.0)], not_doc_sql=[O.term_docs_sql(["scan"])]
        ),
        "ft_q_range": O.lucene_topk_sql(
            [("scan", 1.0)],
            filter_sql=(
                "CAST(n_chars AS DOUBLE) >= 100.0"
                " AND CAST(n_chars AS DOUBLE) <= 300.0"
            ),
        ),
        "ft_q_nested": O.lucene_topk_sql(
            [("dup", 1.0), ("key", 1.0), ("table", 1.0)],
            must_doc_sql=[
                O.term_docs_sql(["table"]),
                O.term_docs_sql(["dup", "key"]),
            ],
        ),
        "ft_q_phrase": O.phrase_sql(["key", "agg"], k=10),
        "ft_q_wildcard": O.lucene_topk_sql([], like_patterns=["s%"]),
        "ft_q_boost": O.lucene_topk_sql([("table", 2.0), ("spark", 1.0)]),
        "ft_percolate_lucene": O.percolate_lucene_sql(),
        "ft_span_first": O.span_first_sql("scan", 5, k=10),
        "ft_span_not": O.span_not_sql("scan", "table", pre=2, post=2, k=10),
        "ft_explain": O.explain_sql(7, ["table", "scan"]),
        "ft_expand": O.expand_sql(["table"], "source", k=5, n_expand=2),
        "ft_sort_score_field": f"""{O.index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({O.score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats WHERE tf.term = 'scan' GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score, n_chars FROM (
  SELECT s.doc_id, s.score, d.n_chars
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
  ORDER BY s.score DESC, d.n_chars ASC, s.doc_id ASC LIMIT 12)""",
        "ft_suggest_regex": f"""{O.index_ctes()}
SELECT term, df FROM dfv
WHERE regexp_full_match(term, '(s|b).*') AND NOT contains(term, ':')
ORDER BY df DESC, term ASC LIMIT 10""",
        "ft_q_fq": O.lucene_topk_sql(
            [("table", 1.0)],
            field_terms=[("lang", "en", 1.0)],
            require_all=True,
            filter_sql=(
                "CAST(n_chars AS DOUBLE) >= 100"
                " AND CAST(n_chars AS DOUBLE) <= 400"
            ),
        ),
        "ft_suggest_infix": O.suggest_infix_sql("a", n=10),
        "ft_sort_func": f"""{ctes}{O.matched_sql(["scan"])}
SELECT doc_id, n_chars, sortv FROM (
  SELECT d.doc_id, d.n_chars, abs(CAST(d.n_chars AS BIGINT) - 250) AS sortv
  FROM documents d JOIN matched m ON d.doc_id = m.doc_id
  ORDER BY sortv ASC, d.doc_id ASC LIMIT 15)""",
        "ft_ngroups": f"""{ctes}{O.matched_sql(["table"])}
SELECT CAST(count(DISTINCT d.source) AS BIGINT) AS n_groups,
       CAST(count(*) AS BIGINT) AS n_hits
FROM documents d JOIN matched m ON d.doc_id = m.doc_id""",
        "ft_q_const": O.lucene_topk_sql(
            [("table", 1.0)],
            const_parts=[(O.term_docs_sql(["dup", "key"], "or"), 1.5)],
        ),
        "ft_q_must": O.lucene_topk_sql(
            [("table", 1.0), ("spark", 1.0)],
            must_doc_sql=[O.term_docs_sql(["table"])],
        ),
        "ft_q_field": O.lucene_topk_sql(
            [("table", 1.0)],
            field_terms=[("lang", "en", 1.0)],
            require_all=True,
        ),
        "ft_q_field_or": O.lucene_topk_sql(
            [("dup", 1.0)], field_terms=[("source", "src3", 1.0)]
        ),
        "ft_q_matchall": """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM documents ORDER BY score DESC, doc_id ASC LIMIT 10""",
        "ft_q_slop": O.sloppy_phrase2_sql("window", "stream", slop=3, k=10),
        "ft_q_fuzzy": O.lucene_topk_sql([], edit_patterns=[("batc", 2)]),
        "ft_q_regex": O.lucene_topk_sql(
            [], regex_patterns=["tab(le)?[0-9]*"]
        ),
        "ft_q_synonym": O.lucene_topk_sql([("sort", 1.0), ("order", 1.0)]),
        "ft_stop_and": O.topk_sql(
            ["table", "data"], mode="and", stopwords=_STOPWORDS
        ),
        "ft_term_catalog": f"""{ctes}
SELECT term, df, cf FROM dfv ORDER BY df DESC, term ASC LIMIT 100""",
        "ft_stats": f"""{ctes}
SELECT n_docs, round(avgdl, 6) AS avgdl FROM stats""",
        # --- ops ---
        "dedup_exact": """
SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY md5(text) HAVING count(*) > 1""",
        "dedup_fingerprint": OO.fingerprint_dup_sql(),
        "dedup_ngram_jaccard": OO.ngram_jaccard_sql(threshold=0.5, n=3),
        "dedup_containment": OO.containment_sql(threshold=0.8, n=3),
        "dedup_minhash_lsh": OO.minhash_lsh_sql(num_hashes=16, bands=4, n=3),
        "dedup_clusters": OO.dup_clusters_sql(
            OO.minhash_lsh_sql(num_hashes=16, bands=4, n=3)
        ),
        "dedup_keep_best": OO.keep_best_sql(
            OO.minhash_lsh_sql(num_hashes=16, bands=4, n=3)
        ),
        "dedup_simhash": OO.simhash_sql(),
        "dedup_simhash_pairs": OO.simhash_pairs_sql(max_hamming=3),
        "text_langid": OO.langid_sql(),
        "text_quality": OO.quality_sql(),
        "text_clean": OO.clean_text_sql(),
        "text_paragraph_dedup": OO.paragraph_dedup_sql(min_chars=30),
        "text_scrub_invisible": OO.scrub_invisible_sql(),
        "src_warc_roundtrip": OO.warc_roundtrip_sql(),
        "text_repetition": OO.repetition_sql(),
        "text_bpe_tokens": OO.bpe_tokens_sql(),
        "text_bpe_pairs": O.bpe_pairs_sql(20),
        "text_pii_scrub": OO.pii_scrub_sql(),
        "text_ngram_top": OO.ngram_top_sql(n=2, k=20),
        "text_unigram_lp": OO.unigram_lp_sql(),
        "text_keywords": OO.keywords_sql(m=5),
        "text_entropy": OO.token_entropy_sql(),
        "text_curate": OO.curate_sql(),
        "text_pmi": OO.pmi_top_sql(20, 5),
        "text_bigram_lm": OO.bigram_lm_sql(20, 1.0, 2),
        "sim_mmr": OO.mmr_sql(_knn_qvec(), k=10, lam=0.7,
                              shortlist_n=30),
        "sim_knn_dot": OO.knn_topk_sql(
            [__import__("math").cos(1 + i) for i in range(64)], 10, "dot"
        ),
        "sim_knn_l2": OO.knn_topk_sql(
            [__import__("math").cos(1 + i) for i in range(64)], 10,
            "euclidean"
        ),
        "text_chunks": OO.chunk_texts_sql(24, 16, docs_where="doc_id < 50"),
        "text_lm_buckets": OO.lm_buckets_sql(3),
        "text_nfc": OO.nfc_sql(),
        "text_code_quality": OO.code_quality_sql(),
        "sketch_kmv_vocab": OO.kmv_vocab_sql(k=256),
        "sketch_bloom": OO.bloom_sql(
            ["table", "scan", "zebrafish", "quuxplugh"],
            m_bits=4096, k_hashes=3,
        ),
        "sketch_cms": OO.cms_sql(_CMS_PROBES, width=512, depth=3),
        "sketch_len_quantile": OO.bit_quantiles_sql((0.5, 0.9, 0.99)),
        "dedup_spans": OO.duplicate_spans_sql(width=8),
        "dedup_span_stats": OO.dup_span_stats_sql(width=8),
        "dedup_trim_spans": OO.trim_spans_sql(width=8),
        "pipe_hash_split": OO.hash_split_sql(),
        "pipe_leakage_split": OO.leakage_safe_split_sql(10, "split"),
        "pipe_length_batches": OO.length_batches_sql(batch_size=8),
        "pipe_mixture_order": OO.mixture_order_sql(_MIX_WEIGHTS),
        "pipe_decontam": OO.decontam_sql(n=5, threshold=0.5),
        "pipe_decontam_fuzzy": OO.minhash_decontam_sql(
            "doc_id % 37 = 0", threshold=0.5),
        "pipe_dsir": OO.dsir_select_sql(k=50, target_where="lang = 'de'"),
        "pipe_pack": OO.pack_greedy_sql(budget=2000, group_col="source",
                                        size_expr="n_chars"),
        "pipe_pack_text": OO.pack_texts_sql(budget=2000, group_col="source",
                                            size_expr="n_chars"),
        "pipe_temperature": OO.temperature_sample_sql(group_col="lang",
                                                      alpha=0.7),
        "pipe_sample": OO.stratified_sample_sql(rate=0.1),
        "pipe_top_per_source": OO.top_per_source_sql(n=5),
        "pipe_source_report": OO.source_report_sql(),
        "pipe_rollup": OO.rollup_report_sql(("lang", "source")),
        "pipe_composite": OO.composite_page_sql(
            ("event_type", "user_id"), 15, ("error", 50), "value"
        ),
        "pipe_weighted_sample": OO.weighted_sample_sql(25),
        "text_token_stats": f"""{ctes}
SELECT d.doc_id,
       CAST(count(t.term) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT t.term) AS BIGINT) AS n_distinct,
       round(CAST(coalesce(sum(length(t.term)), 0) AS DOUBLE)
             / greatest(count(t.term), 1), 6) AS avg_token_len
FROM documents d LEFT JOIN tok t ON d.doc_id = t.doc_id
GROUP BY d.doc_id""",
        "text_fingerprint": f"""{ctes}
SELECT d.doc_id,
       md5(coalesce(array_to_string(list_sort(array_agg(DISTINCT t.term)), ' '), '')) AS fingerprint
FROM documents d LEFT JOIN tok t ON d.doc_id = t.doc_id
GROUP BY d.doc_id""",
        "sim_cosine_topk": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT e.vec_id,
    list_sum(list_transform(generate_series(1, len(e.embedding)),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
        i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))) AS cos
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
)
SELECT vec_id, round(cos, 6) AS cos
FROM (SELECT * FROM c ORDER BY cos DESC, vec_id ASC LIMIT 10)""",
        "sim_lsh_ann": OO.lsh_ann_sql(dims=64, n_planes=12, k=10),
        "sim_project": OO.random_project_sql(64, 4),
        "sim_ivf_ann": OO.ivf_ann_sql(n_centroids=16, nprobe=2, k=10),
        "sim_ivf_filtered": OO.ivf_ann_sql(
            n_centroids=16, nprobe=4, k=10, filter_sql="label = 2"
        ),
        "sim_ivf_batch": OO.ivf_batch_sql(query_ids=[0, 1], n_centroids=16,
                                          nprobe=2, k=10),
        "dedup_embed_cosine": OO.cosine_dup_sql(
            threshold=0.25, dims=64, n_planes=4, n_tables=2
        ),
        "dedup_semantic": OO.semantic_dedup_sql(
            n_centroids=8, threshold=0.3
        ),
        "mm_image_meta": OO.mm_image_meta_sql(),
        "mm_pgm_meta": OO.pgm_meta_sql(),
        "mm_pgm_features": OO.pgm_features_sql(),
        "mm_wav_meta": OO.wav_meta_sql(),
        "mm_wav_features": OO.wav_features_sql(),
        "mm_stream_frames": OO.pgm_stream_sql(every=2),
        "mm_byte_stats": OO.mm_byte_stats_sql(),
        "mm_frame_sample": OO.mm_frames_sql(every=4, max_frames=3),
        "ts_date_facet": OO.ts_date_facet_sql("day"),
        "ts_window_agg": OO.ts_window_agg_sql(1),
        "ts_ohlc": OO.ts_ohlc_sql(1),
        "ts_corr": OO.ts_corr_sql(),
        "ts_session_agg": OO.ts_session_agg_sql(30),
        "ts_sliding_window": OO.ts_sliding_window_sql(7200, 3600),
        "ts_gap_fill": OO.ts_gap_fill_sql("12 hours", "user_id < 3"),
        "ts_asof": OO.ts_asof_sql("click", "purchase"),
        "ts_zscore": OO.ts_zscore_sql(),
        "ts_percentiles": OO.ts_percentiles_sql(),
        "ts_mad": OO.ts_mad_sql(),
        "ts_pct_ranks": OO.ts_percentile_ranks_sql((10.0, 50.0, 90.0)),
        "ts_rolling": OO.ts_rolling_sql(5),
        "ts_bucket_pipeline": OO.ts_bucket_pipeline_sql("1 day"),
        "ts_bucket_sort": OO.ts_bucket_sort_sql(
            "1 day", sort_on="bucket_sum", size=3, frm=2
        ),
        "ts_bucket_selector": OO.ts_bucket_selector_sql(
            "n > 40 AND avg_per_doc > 0", "1 day"
        ),
        "ts_boxplot": OO.ts_boxplot_sql(),
        "ts_extended_stats": OO.ts_extended_stats_sql(2.0),
        "ts_value_histogram": OO.ts_value_histogram_sql(25.0),
        "ts_normalize": OO.ts_normalize_sql("1 day"),
        "text_categorize": OO.text_categorize_sql(10),
        "ts_change_point": OO.ts_change_point_sql("1 day"),
        "ts_weighted_avg": OO.ts_weighted_avg_sql(),
        "ts_heatmap": OO.ts_heatmap_sql(),
        "ts_rollup": OO.ts_rollup_sql("1 hour", "1 day"),
        "ts_stats_bucket": OO.ts_stats_bucket_sql("1 day"),
        "ts_transitions": OO.ts_transitions_sql(),
        "ts_eql_sequence": OO.ts_eql_sequence_sql(
            ["view", "click", "purchase"], 720),
        "ts_serial_diff": OO.ts_serial_diff_sql("1 day", 7),
        "ts_cum_cardinality": OO.ts_cumulative_cardinality_sql(
            "1 day", "user_id"),
        "ft_facet_by_metric": O.facet_by_metric_sql(
            ["table"], "lang", "n_chars", n=5),
        "ft_group_score": O.group_score_sql(
            ["table"], "lang", score_mode="sum", k=5),
        "ft_span_within": O.span_within_sql(
            "key", "fast", "order", width=4, k=10),
        "ft_linear_fuse": O.linear_fuse_sql(
            ["table", "scan"], k_each=20, w_bm=0.7, w_vec=0.3, n=10),
        "text_vocab_kl": O.vocab_kl_sql("source", "src1", "src2"),
        "graph_expand": OO.graph_expand_sql("c1", 2),
        "text_bigram_lp": OO.bigram_lp_sql(1.0),
        "sim_sq_ann": O.sq_ann_sql(k=10, rerank=30),
        "pipe_freq_item_sets": OO.frequent_item_sets_sql(2, 20),
        "ts_ttest": OO.ts_ttest_sql("click", "view"),
        "text_string_stats": OO.text_string_stats_sql(),
        "text_multi_terms": OO.text_multi_terms_sql(["lang", "source"], 10),
        "ts_auto_histogram": OO.ts_auto_histogram_sql(20),
        "ts_funnel": OO.ts_funnel_sql(["view", "click", "purchase"]),
        "ts_retention": OO.ts_retention_sql(8),
        "ts_cardinality": OO.ts_cardinality_sql(),
        "ts_top_hits": OO.ts_top_hits_sql(3),
        "ts_running": OO.ts_running_sql(),
        "ts_ewma": OO.ts_ewma_sql(0.3),
        "ts_rate": OO.ts_rate_sql(),
        "ts_counter_rate": OO.ts_counter_rate_sql(),
        "ts_top_events": OO.ts_top_events_sql("1 day", 3),
        "ts_json": OO.ts_json_sql(),
        "ts_date_math": OO.ts_date_math_sql(_DM_NOW, _DM_LO, _DM_HI),
    }
    return out
