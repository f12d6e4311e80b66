"""Serving-tier latency at matched reference scale (~1M docs).

The reference's one published query latency is an 81 ms scatter-
gather count over 881,722 docs on 2 nodes (manual/doc/Katta-Hive.md:
63-70).  This tool reproduces the regime: the deterministic
1,000,000-doc source-code corpus (body_reps=8), indexed once as a
union (LocalSearcher = one node) and once as 8 shard indexes
(ShardedSearcher = the scatter-gather client over 8 node-local
shards), then the serving-tier query set measured warm, median of 5.

Round-3 paths under test (VERDICT r2 "Next round" items 1-4):
  - count: per-(term,block) doc-id bitsets, bitwise union/intersect
  - query: full Lucene-string scatter across shards (cross-shard df
    exchange) — previously single-shard only
  - sorted_query / range_facet at the node tier

Usage: python tools/bench_serving.py [--docs 1000000] [--shards 8]
Prints one JSON line `SERVING {...}`; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med5(fn):
    xs = []
    for _ in range(5):
        t0 = time.monotonic()
        fn()
        xs.append(time.monotonic() - t0)
    return round(statistics.median(xs) * 1000.0, 1)  # ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--build-mode", choices=("concurrent", "sequential"),
                    default="concurrent",
                    help="concurrent (round 5, FAIR scheduler pools + "
                         "thread-submitted builds — one driver fills "
                         "local[32], the cluster shape) or the old "
                         "sequential loop")
    ap.add_argument("--shuffle-partitions", type=int, default=32,
                    help="spark.sql.shuffle.partitions — raise past "
                         "the core count at 30M+ docs so per-task "
                         "agg state fits the heap (the standard "
                         "partition-sizing lever, same as a cluster)")
    ap.add_argument("--spark-local", default=None,
                    help="spark.local.dir override — at 30M docs the "
                         "shuffle spill must leave /dev/shm (tmpfs "
                         "shares RAM with the JVM heap)")
    ap.add_argument("--build-workers", type=int, default=4,
                    help="concurrent shard builds in flight: each "
                         "build holds its own shuffle/agg state in "
                         "the SHARED single-JVM heap (a cluster gives "
                         "each its own executors) — 8-way at 10M docs "
                         "OOMs a 24g heap, 4-way fits")
    args = ap.parse_args()

    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    import pyspark.sql.functions as F

    from katta_spark.corpus import synthetic_corpus, with_ingest_columns
    from katta_spark.index import build_index
    from katta_spark.index.serve import LocalSearcher, ShardedSearcher
    from katta_spark.session import get_spark

    shm = tempfile.mkdtemp(prefix="katta_serve_bench_", dir="/dev/shm")
    spark = get_spark(app_name="bench_serving", master="local[32]",
                      shuffle_partitions=args.shuffle_partitions,
                      extra_conf={"spark.local.dir":
                                  args.spark_local or f"{shm}/local",
                                  # concurrent shard builds share the
                                  # executor fairly (one driver fills
                                  # local[32] the way a cluster's
                                  # per-shard builders would)
                                  "spark.scheduler.mode": "FAIR"})
    spark.sparkContext.setLogLevel("ERROR")

    n = args.docs
    full = with_ingest_columns(
        synthetic_corpus(spark, n, body_reps=args.reps)
    )
    t0 = time.monotonic()
    build_index(spark, full, f"{shm}/union", n_groups=8)
    t_union = time.monotonic() - t0
    per = n // args.shards

    def build_shard(s: int) -> str:
        lo = s * per
        hi = n if s == args.shards - 1 else (s + 1) * per
        part = full.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).withColumn("doc_id", F.col("doc_id") - lo)
        d = f"{shm}/shard{s}"
        # per-thread FAIR pool: each shard build is its own job
        # stream; outputs are deterministic (doc ids are given, the
        # build partitions by term range), so concurrent == sequential
        # logically — pinned by tests/test_concurrent_build.py
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"shard{s}")
        try:
            build_index(spark, part, d, n_groups=1)
        finally:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", None)
        return d

    t0 = time.monotonic()
    if args.build_mode == "concurrent":
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=max(1, min(args.build_workers, args.shards))
        ) as ex:
            shard_dirs = list(ex.map(build_shard, range(args.shards)))
    else:
        shard_dirs = [build_shard(s) for s in range(args.shards)]
    t_shards = time.monotonic() - t0
    spark.stop()

    # qcache_size=0: cold-path latency each repeat (the round-3
    # regime — round 4 added a queryResultCache that would otherwise
    # serve med5's repeats from memory); warm-cache rows are
    # measured separately below.  scache_size=0 on the scatter for
    # the same reason (round 5 added the scatter-tier cache).
    ls = LocalSearcher(f"{shm}/union", qcache_size=0)
    sh = ShardedSearcher(shard_dirs, scache_size=0)

    # adversarial-skew probe (round 5): the HOTTEST content term in
    # the corpus — the worst case for "per-query work is bounded by
    # posting geometry" (a term in most docs means posting geometry
    # ~= corpus size; these rows pin what that costs).
    import pyarrow.dataset as pads

    cat = pads.dataset(f"{shm}/union/terms").to_table(
        columns=["term", "df"]).to_pandas()
    cat = cat.groupby("term", as_index=False)["df"].sum()
    hot = cat.sort_values(["df", "term"],
                          ascending=[False, True]).iloc[0]
    hot_term = str(hot["term"])

    qset = {
        "or_top10": lambda s: s.topk(["import", "return"], k=10,
                                     mode="or"),
        "and_top10": lambda s: s.topk(["scan", "merge"], k=10,
                                      mode="and"),
        "count_or": lambda s: s.count(["import", "return"]),
        "lucene_nested": lambda s: s.query("(scan OR merge) AND import",
                                           k=10),
        # fields exclude doc_id: the sharded tier namespaces ids by
        # block-aligned offsets, so raw ids differ from the union
        # build by construction (relative order is preserved)
        "sorted_top10": lambda s: s.sorted_query(
            ["import"], [("lang", "asc"), ("dl", "desc")],
            ["lang", "dl"], 10),
        "range_facet": lambda s: s.range_facet(
            ["import"], "dl", 0.0, 400.0, 50.0),
        # doc_id dropped for parity: the sharded tier namespaces ids
        # by block-aligned offsets (same caveat as sorted_top10);
        # rank-identity INCLUDING ids is covered by the block-aligned
        # union oracle in tests/test_multi_index.py
        "collapse": lambda s: s.collapse_topk(
            ["import", "return"], "lang", k=10).drop(columns=["doc_id"]),
        "group_topk": lambda s: s.group_topk(
            ["import"], "lang", k_per_group=3).drop(columns=["doc_id"]),
        "sig_terms_and": lambda s: s.significant_terms(
            ["scan", "merge"], mode="and", m_terms=10),
        # ES shard_min_doc_count pruning: kills the singleton-tail
        # exchange (the bulk of a code corpus's vocabulary); only
        # meaningful sharded — the local handle ignores the kwarg
        "sig_terms_pruned": lambda s: s.significant_terms(
            ["scan", "merge"], mode="and", m_terms=10,
            **({"shard_min_df": 2}
               if hasattr(s, "shards") else {})),
        "mlt": lambda s: s.more_like_this(7, m_terms=5, k=10),
        # skew rows: hot-term count/topk/facet (term picked from the
        # catalog at run time — reported in out["skew_term"])
        "hot_count": lambda s: s.count([hot_term]),
        "hot_topk": lambda s: s.topk([hot_term], k=10),
        "hot_and_rare": lambda s: s.topk([hot_term, "merge"], k=10,
                                         mode="and"),
        "hot_facet": lambda s: s.facet([hot_term], "lang", n=7),
    }
    out = {
        "n_docs": n, "shards": args.shards, "reps": args.reps,
        "build_mode": args.build_mode,
        "build_union_s": round(t_union, 1),
        "build_shards_s": round(t_shards, 1),
        # one doc == one source file: the build-throughput headline
        "build_files_per_sec": round(n / t_union, 1),
        "local_ms": {}, "sharded_ms": {}, "parity": {},
        "skew_term": {"term": hot_term,
                      "df_ratio": round(float(hot["df"]) / n, 3)},
    }
    NO_PARITY = {"sig_terms_pruned"}  # ES shard_min_doc_count mode:
    # approximate by design, only applied on the sharded side
    for name, q in qset.items():
        a, b = q(ls), q(sh)
        if name in NO_PARITY:
            out["parity"][name] = "approx-by-design"
        elif hasattr(a, "values"):
            out["parity"][name] = bool(
                a.values.tolist() == b.values.tolist()
            )
        else:
            out["parity"][name] = bool(a == b)
        out["local_ms"][name] = med5(lambda q=q: q(ls))
        out["sharded_ms"][name] = med5(lambda q=q: q(sh))
    # r4 queryResultCache hot path: one cold fill, repeats served
    # from the node's in-memory LRU (flushed on refresh())
    warm = LocalSearcher(f"{shm}/union")
    warm.count(["import", "return"])
    warm.query("(scan OR merge) AND import", k=10)
    out["local_warm_ms"] = {
        "count_or": med5(lambda: warm.count(["import", "return"])),
        "lucene_nested": med5(
            lambda: warm.query("(scan OR merge) AND import", k=10)),
    }
    sh.close()
    shutil.rmtree(shm, ignore_errors=True)
    print("SERVING " + json.dumps(out))


if __name__ == "__main__":
    main()
