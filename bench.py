"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Covers:
- physical index build over the documents table (files/sec),
- the reference query set (BM25 WAND top-k, AND/OR, filter,
  pagination, count, facet, fetch) — per-query median seconds,
- a synthetic source-code corpus build at bench scale
  (``$SPARK_GRAFT_BENCH_DOCS``, default 100k rows of the
  BASELINE.json input shape) — the index-build throughput headline,
- training-data ops (minhash-LSH dedup, quality scoring, cosine
  top-k) over the same tables.

Usage: python bench.py            # one JSON line to stdout
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from katta_spark.corpus import synthetic_corpus  # noqa: E402
from katta_spark.index import PhysicalIndex, build_index  # noqa: E402
from katta_spark.ops import dedup, similarity, text  # noqa: E402
from katta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def bench_tmpdir(prefix: str) -> str:
    """Index scratch on tmpfs when available: the single shared disk
    of the sandbox otherwise dominates right-after-build reads."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def timed(fn, repeats: int = REPEATS, sink: list | None = None) -> float:
    """Median wall seconds of ``repeats`` executions (collect-driven);
    raw samples optionally appended to ``sink`` for percentiles."""
    samples = []
    for _ in range(repeats):
        t0 = time.monotonic()
        fn()
        samples.append(time.monotonic() - t0)
    if sink is not None:
        sink.extend(samples)
    return round(statistics.median(samples), 4)


def main() -> None:
    t_all = time.monotonic()
    spark = get_spark(
        app_name="katta_bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}
    extra: dict[str, object] = {"cpus": CPUS}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # ---- physical index build over the documents corpus -----------------
    idx_dir = bench_tmpdir("katta_bench_idx_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    corpus = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").alias("content"),
        "lang", "source", "n_chars",
    )
    t0 = time.monotonic()
    build_index(spark, corpus, idx_dir, n_groups=4, block_range=1024,
                field_cols=["lang", "source"])
    build_s = time.monotonic() - t0
    queries["index_build_docs"] = round(build_s, 4)
    extra["docs_files_per_sec"] = round(n_docs / build_s, 1)
    idx = PhysicalIndex(spark, idx_dir)
    idx.topk(["the"], k=3).collect()  # untimed warm (listing + workers)

    # ---- reference query set over the built index -----------------------
    def run(df):
        return lambda: df().collect()

    qset = {
        "q_topk_common": run(lambda: idx.topk(["table"], k=10)),
        "q_topk_rare": run(lambda: idx.topk(["dup"], k=10)),
        "q_and": run(lambda: idx.topk(["spark", "vector"], mode="and")),
        "q_or3": run(lambda: idx.topk(["spark", "data", "key"], k=15)),
        "q_filter": run(lambda: idx.topk(["query"], filters={"lang": "en"})),
        "q_paginate": run(lambda: idx.topk(["batch"], k=20, offset=60)),
        "q_count": run(lambda: idx.count(["dup", "key"])),
        "q_facet": run(lambda: idx.facet(["table"], "lang", n=5)),
        "q_fetch": run(
            lambda: idx.fetch_details(idx.topk(["dup"], k=5), ["lang", "source"])
        ),
        # Lucene-syntax front door: parser + boolean evaluator
        "q_phrase": run(lambda: idx.phrase_topk(["order", "fast"], k=10)),
        "q_lucene_nested": run(lambda: idx.query("(dup OR key) AND table")),
        "q_lucene_not": run(lambda: idx.query("table -scan")),
        "q_wildcard": run(lambda: idx.query("s*")),
        "q_field_scored": run(lambda: idx.query("table AND lang:en")),
        "q_fuzzy": run(lambda: idx.query("batc~2")),
        "q_synonym": run(
            lambda: idx.query("sort", synonyms={"sort": ["order"]})
        ),
        "q_highlight": run(
            lambda: idx.highlight(
                idx.topk(["batch"], k=5), ["batch"], width=60
            )
        ),
        # 3 queries in ONE scan+shuffle — compare to q_topk_common×3
        "q_multi_batch3": run(
            lambda: idx.multi_topk(
                {"a": ["table"], "b": ["dup", "key"],
                 "c": ["spark", "vector"]}, k=10
            )
        ),
        # round-2 Solr surfaces
        "q_min_match": run(
            lambda: idx.topk(["spark", "data", "key"], k=10, min_match=2)
        ),
        "q_pivot_facet": run(
            lambda: idx.pivot_facet(["table"], "lang", "source", n1=3, n2=2)
        ),
        "q_spellcheck": run(lambda: idx.spellcheck("tabel", max_edits=2, n=5)),
        "q_boost_func": run(
            lambda: idx.topk_boosted(
                ["table"],
                F.lit(1.0) + F.lit(1.0)
                / (F.lit(1.0) + F.col("n_chars").cast("double") / F.lit(500.0)),
                k=10,
            )
        ),
    }
    # search-after cursor: same page as q_paginate (hits 61-80) but via
    # a client-held cursor — contrast the two numbers directly
    _c60 = idx.topk(["batch"], k=60).collect()[-1]
    qset["q_cursor_page4"] = run(
        lambda: idx.topk(
            ["batch"], k=20, after=(_c60["score"], _c60["doc_id"])
        )
    )
    CORE = {  # round-1 query classes, kept separate for comparability
        "q_topk_common", "q_topk_rare", "q_and", "q_or3", "q_filter",
        "q_paginate", "q_count", "q_facet", "q_fetch",
    }
    samples: list[float] = []
    core_samples: list[float] = []
    for name, fn in qset.items():
        queries[name] = timed(
            fn, sink=samples if name not in CORE else core_samples
        )
    samples.extend(core_samples)
    core_samples.sort()
    extra["query_core_p50_ms"] = round(
        statistics.median(core_samples) * 1000, 1
    )
    samples.sort()
    extra["query_p50_ms"] = round(statistics.median(samples) * 1000, 1)
    extra["query_p99_ms"] = round(
        samples[min(len(samples) - 1, int(len(samples) * 0.99))] * 1000, 1
    )
    extra["query_max_ms"] = round(max(samples) * 1000, 1)

    # ---- serving tier (node-local, no Spark job in the query path) ------
    # Katta answers queries from node-local shards (LuceneServer RPC,
    # 0.081 s published count over 881,722 docs); LocalSearcher is
    # that tier here — same index files, same kernels, rank-identical
    # (tests/test_serve.py), measured at the same corpus as q_* above.
    from katta_spark.index.serve import LocalSearcher

    # qcache_size=0: the serve_* rows measure COLD kernel work each
    # repeat (round-comparable); warm-cache latency is its own row
    lsrv = LocalSearcher(idx_dir, qcache_size=0)
    lsrv.topk(["the"], k=3)  # untimed warm (datasets + imports)
    serve_set = {
        "serve_topk_common": lambda: lsrv.topk(["table"], k=10),
        "serve_topk_rare": lambda: lsrv.topk(["dup"], k=10),
        "serve_and": lambda: lsrv.topk(["spark", "vector"], mode="and"),
        "serve_or3": lambda: lsrv.topk(["spark", "data", "key"], k=15),
        "serve_paginate": lambda: lsrv.topk(["batch"], k=20, offset=60),
        "serve_count": lambda: lsrv.count(["dup", "key"]),
        "serve_fetch": lambda: lsrv.search(
            ["dup"], k=5, fields=["lang", "source"]
        ),
        # Lucene-string front door, node-local (parser + numpy eval)
        "serve_lucene_nested": lambda: lsrv.query("(dup OR key) AND table"),
        "serve_lucene_not": lambda: lsrv.query("table -scan"),
        "serve_phrase": lambda: lsrv.query('"order fast"'),
        # r3 node surfaces: TopFieldCollector sort + facetByRange
        "serve_sorted": lambda: lsrv.sorted_query(
            ["table"], [("lang", "asc"), ("dl", "desc")],
            ["doc_id", "lang", "dl"], 10),
        "serve_range_facet": lambda: lsrv.range_facet(
            ["table"], "dl", 0.0, 400.0, 50.0),
        "serve_collapse": lambda: lsrv.collapse_topk(["table"], "lang",
                                                     k=10),
        "serve_group": lambda: lsrv.group_topk(["table"], "lang",
                                               k_per_group=3),
        "serve_sig_terms": lambda: lsrv.significant_terms(["scan"],
                                                          m_terms=10),
        "serve_mlt": lambda: lsrv.more_like_this(7, m_terms=5, k=10),
        "serve_spellcheck": lambda: lsrv.spellcheck("tabel",
                                                    max_edits=2, n=5),
        "serve_highlight": lambda: lsrv.highlight(
            lsrv.topk(["batch"], k=5), ["batch"], width=60),
    }
    srv_samples: list[float] = []
    for name, fn in serve_set.items():
        queries[name] = timed(fn, sink=srv_samples)
    # r4: queryResultCache hot path — one cold fill, then repeats are
    # served from the node's in-memory LRU (Solr queryResultCache
    # parity; invalidated on refresh()).  Kept OUT of srv_samples so
    # serve_p50/p99 stay round-comparable (cold-path percentiles).
    lsrv_warm = LocalSearcher(idx_dir)
    lsrv_warm.topk(["table"], k=10)
    lsrv_warm.query("(dup OR key) AND table")
    queries["serve_warm_topk"] = timed(
        lambda: lsrv_warm.topk(["table"], k=10))
    queries["serve_warm_lucene"] = timed(
        lambda: lsrv_warm.query("(dup OR key) AND table"))
    # r5: scatter tier — 2-shard split of the same corpus (block-
    # aligned boundary so namespaced ids match): cold scatter latency
    # (process-pool fan-out + df exchange + merge) and the
    # scatter-tier queryResultCache hot path.  The two shard builds
    # are their own row (index_build_shards — adds to total wall vs
    # r4; see BENCH/BASELINE.md); all rows kept OUT of srv_samples.
    from katta_spark.index.serve import ShardedSearcher

    sh_root = bench_tmpdir("katta_bench_shards_")
    half = max(1024, (n_docs // 2 // 1024) * 1024)
    sa_dir, sb_dir = f"{sh_root}/shard_a", f"{sh_root}/shard_b"
    t0 = time.monotonic()
    build_index(spark, corpus.filter(F.col("doc_id") < half), sa_dir,
                n_groups=2, block_range=1024,
                field_cols=["lang", "source"])
    build_index(
        spark,
        corpus.filter(F.col("doc_id") >= half)
        .withColumn("doc_id", F.col("doc_id") - half),
        sb_dir, n_groups=2, block_range=1024,
        field_cols=["lang", "source"],
    )
    queries["index_build_shards"] = round(time.monotonic() - t0, 4)
    ssrv_cold = ShardedSearcher([sa_dir, sb_dir], scache_size=0)
    ssrv_cold.topk(["the"], k=3)  # pool + worker handles warm
    queries["serve_scatter_topk"] = timed(
        lambda: ssrv_cold.topk(["table"], k=10))
    queries["serve_scatter_count"] = timed(
        lambda: ssrv_cold.count(["dup", "key"]))
    ssrv_cold.close()
    ssrv_warm = ShardedSearcher([sa_dir, sb_dir])
    ssrv_warm.topk(["table"], k=10)  # cold fill
    queries["serve_warm_scatter"] = timed(
        lambda: ssrv_warm.topk(["table"], k=10))
    ssrv_warm.close()
    shutil.rmtree(sh_root, ignore_errors=True)
    srv_samples.sort()
    extra["serve_p50_ms"] = round(
        statistics.median(srv_samples) * 1000, 1
    )
    extra["serve_p99_ms"] = round(
        srv_samples[min(len(srv_samples) - 1,
                        int(len(srv_samples) * 0.99))] * 1000, 1
    )

    # ---- training-data ops ----------------------------------------------
    queries["op_dedup_minhash"] = timed(
        lambda: dedup.minhash_lsh_pairs(
            docs.withColumnRenamed("text", "content"), num_hashes=16, bands=4
        ).count(),
        repeats=1,
    )
    queries["op_text_quality"] = timed(
        lambda: text.quality_score(docs, text_col="text").count(), repeats=1
    )
    q_emb = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    queries["op_sim_cosine"] = timed(
        lambda: similarity.cosine_join_topk(
            emb.filter(F.col("vec_id") != 0), q_emb, k=10
        ).collect(),
        repeats=1,
    )
    queries["op_simhash_pairs"] = timed(
        lambda: dedup.simhash_candidate_pairs(
            docs.withColumnRenamed("text", "content"), max_hamming=3
        ).count(),
        repeats=1,
    )
    queries["op_dup_spans"] = timed(
        lambda: dedup.duplicate_spans(
            docs.withColumnRenamed("text", "content"), width=8
        ).count(),
        repeats=1,
    )
    from katta_spark.ops import decontam, packing

    queries["op_decontam"] = timed(
        lambda: decontam.ngram_overlap(
            docs, docs.filter(F.col("doc_id") % 37 == 0), n=5,
            text_col="text",
        ).count(),
        repeats=1,
    )
    queries["op_pack_greedy"] = timed(
        lambda: packing.pack_greedy(
            docs, 2000, size_col="n_chars", group_col="source"
        ).count(),
        repeats=1,
    )
    queries["op_unigram_lp"] = timed(
        lambda: text.unigram_logprob(docs, text_col="text").count(),
        repeats=1,
    )
    # r4: distributed-rank mixture order (the round-3 verdict's one
    # scale-killer, now range-partitioned — no single-partition sort)
    from katta_spark.ops import sampling as SAMPL

    queries["op_mixture_order"] = timed(
        lambda: SAMPL.mixture_order(
            docs, {f"src{i}": 1.0 + (i % 3) for i in range(20)}
        ).count(),
        repeats=1,
    )
    from katta_spark.ops import timeseries as TSOPS

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    queries["op_asof_join"] = timed(
        lambda: TSOPS.asof_join(
            events.filter(F.col("event_type") == "click"),
            events.filter(F.col("event_type") == "purchase"),
            "ts", "user_id", "value",
        ).count(),
        repeats=1,
    )
    queries["op_percentiles"] = timed(
        lambda: TSOPS.percentiles(events, "event_type", "value").count(),
        repeats=1,
    )
    queries["op_pmi_top"] = timed(
        lambda: text.pmi_top(docs, k=20, min_count=5,
                             text_col="text").count(),
        repeats=1,
    )
    queries["op_chunk_texts"] = timed(
        lambda: text.chunk_texts(docs, size=64, stride=48,
                                 text_col="text").count(),
        repeats=1,
    )
    # persisted ANN index: build once, then partition-pruned probes
    from katta_spark.ops import ann_index as AI

    ann_dir = bench_tmpdir("katta_bench_ann_")
    shutil.rmtree(ann_dir, ignore_errors=True)
    emb_corpus = emb.filter(F.col("vec_id") != 0)
    dims = len(emb_corpus.select("embedding").first()["embedding"])
    queries["op_ann_index_build"] = timed(
        lambda: AI.build_ann_index(
            emb_corpus, ann_dir, dims=dims, planes_per_table=12, n_tables=1
        ),
        repeats=1,
    )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    queries["op_ann_query"] = timed(
        lambda: AI.ann_query(spark, ann_dir, qv, k=10).collect()
    )
    shutil.rmtree(ann_dir, ignore_errors=True)
    # IVF-flat index: centroid partitions, nprobe-pruned probes
    ivf_dir = bench_tmpdir("katta_bench_ivf_")
    shutil.rmtree(ivf_dir, ignore_errors=True)
    queries["op_ivf_index_build"] = timed(
        lambda: AI.build_ivf_index(emb_corpus, ivf_dir, n_centroids=16,
                                   quantizer="seed"),
        repeats=1,
    )
    queries["op_ivf_query"] = timed(
        lambda: AI.ivf_query(spark, ivf_dir, qv, k=10, nprobe=2).collect()
    )
    shutil.rmtree(ivf_dir, ignore_errors=True)
    # production quantizer: k-means|| seeding + Lloyd (r3; the seed
    # build above stays the r01/r02-comparable number)
    ivfkm_dir = bench_tmpdir("katta_bench_ivfkm_")
    shutil.rmtree(ivfkm_dir, ignore_errors=True)
    queries["op_ivf_kmeans_build"] = timed(
        lambda: AI.build_ivf_index(emb_corpus, ivfkm_dir, n_centroids=16),
        repeats=1,
    )
    shutil.rmtree(ivfkm_dir, ignore_errors=True)

    # ---- synthetic source-code corpus at bench scale --------------------
    synth_dir = bench_tmpdir("katta_bench_synth_")
    shutil.rmtree(synth_dir, ignore_errors=True)
    t0 = time.monotonic()
    build_index(
        spark,
        synthetic_corpus(spark, BENCH_DOCS),
        synth_dir,
        n_groups=2,
        doc_id_method="hash" if BENCH_DOCS > 10**6 else "rank",
    )
    synth_s = time.monotonic() - t0
    queries["index_build_synth"] = round(synth_s, 4)
    extra["synth_docs"] = BENCH_DOCS
    extra["synth_files_per_sec"] = round(BENCH_DOCS / synth_s, 1)
    sidx = PhysicalIndex(spark, synth_dir)
    sidx.topk(["def"], k=3).collect()  # untimed warm
    queries["q_synth_hot_wand"] = timed(
        lambda: sidx.topk(["import", "return"], k=10).collect()
    )
    queries["q_synth_needle"] = timed(
        lambda: sidx.topk(["xylophonequarknebula7"], k=10).collect()
    )

    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(synth_dir, ignore_errors=True)
    spark.stop()

    sf = Path(SF_DIR).name.replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "index-build throughput + BM25 query latency "
                          "(physical WAND index) + training-data ops",
                "value": round(time.monotonic() - t_all, 2),
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
