"""Query-rate load test over the physical index.

The reference ships a dedicated load-test tool that replays a query
mix against the deployed shards and reports sustained queries/sec
(katta-core/.../tool/loadtest/, SURVEY §2.11 "Query-rate load test").
This is its Spark-side analogue: a fixed MIXED workload — hot-term,
rare-term, AND-conjunction, zero-hit needle, multi-term OR — replayed
against a built :class:`PhysicalIndex` in the two service shapes a
deployment actually runs:

- **sequential**: one Spark job per query — the latency a single
  interactive client sees, dominated at small corpora by the
  job-scheduling floor (the analogue of the reference's per-RPC
  overhead);
- **batched**: ``--batch`` queries fused into ONE postings scan via
  ``multi_topk`` — how a serving tier amortizes the scatter-gather
  at high request rates (the reference batches at the Hadoop-RPC
  layer the same way; here the batch shares a single term-pruned
  scan + one block_id exchange).

Prints one JSON line with sequential QPS, batched QPS, and the
amortization speedup.  Deterministic workload (query i = mix[i % 8]),
no random state.

``--tier serve`` replays the same mix against the SERVING tier
instead (LocalSearcher + an 8-shard ShardedSearcher) — the shape the
reference's load tool actually hits (node RPCs, not MapReduce jobs):
sequential node QPS cold (query cache off), node QPS warm (the Solr
queryResultCache hot path), and scatter QPS across shards.

Usage: python tools/loadtest.py [--docs 100000] [--cpus 32]
       [--queries 96] [--batch 16] [--reps 2] [--tier spark|serve]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from katta_spark.corpus import synthetic_corpus  # noqa: E402
from katta_spark.index import PhysicalIndex, build_index  # noqa: E402
from katta_spark.session import get_spark  # noqa: E402

# hot / rare / AND / zero-hit needle / OR3 mix — same classes the
# reference load tool cycles through (term frequencies span ~60% of
# docs down to zero hits, so the scan-pruning path is exercised on
# every shape)
MIX: list[tuple[list[str], str]] = [
    (["import"], "or"),
    (["parse", "request"], "and"),
    (["block", "max", "score"], "or"),
    (["xylophonequarknebula7"], "or"),  # 1-hit needle (rare-term path)
    (["return"], "or"),
    (["spark", "vector"], "and"),
    (["batch", "stream"], "or"),
    (["quark"], "or"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--queries", type=int, default=96,
                    help="total queries per shape (multiple of batch)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2,
                    help="body_reps (doc size) for the corpus")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tier", choices=["spark", "serve"],
                    default="spark")
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args()
    if args.tier == "serve":
        return serve_tier(args)

    shm = tempfile.mkdtemp(
        prefix="katta_loadtest_",
        dir="/dev/shm" if Path("/dev/shm").is_dir() else None,
    )
    try:
        spark = get_spark(
            app_name="katta_loadtest", master=f"local[{args.cpus}]",
            shuffle_partitions=args.cpus,
            extra_conf={"spark.local.dir": f"{shm}/local"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        idx_dir = f"{shm}/idx"
        build_index(
            spark, synthetic_corpus(spark, args.docs, body_reps=args.reps),
            idx_dir, n_groups=1, block_range=1024,
        )
        idx = PhysicalIndex(spark, idx_dir)
        # warm every hot path outside the measured window (JIT, Arrow
        # workers, file listing) — a serving tier runs warm
        for q, m in MIX:
            idx.topk(q, k=args.k, mode=m).collect()

        n = (args.queries // args.batch) * args.batch

        # -- sequential: one job per query --------------------------------
        t0 = time.monotonic()
        for i in range(n):
            q, m = MIX[i % len(MIX)]
            idx.topk(q, k=args.k, mode=m).collect()
        seq_s = time.monotonic() - t0

        # -- batched: --batch queries fused into one scan ------------------
        # (or-mode batch: multi_topk shares one pruned scan + exchange)
        t0 = time.monotonic()
        for start in range(0, n, args.batch):
            qmap = {
                f"q{start + j}": MIX[(start + j) % len(MIX)][0]
                for j in range(args.batch)
            }
            idx.multi_topk(qmap, k=args.k).collect()
        bat_s = time.monotonic() - t0

        print(json.dumps({
            "metric": "query-rate load test (sequential vs batched QPS)",
            "docs": args.docs,
            "cpus": args.cpus,
            "n_queries": n,
            "batch_size": args.batch,
            "sequential_qps": round(n / seq_s, 1),
            "batched_qps": round(n / bat_s, 1),
            "speedup": round(seq_s / bat_s, 2),
            "seq_wall_s": round(seq_s, 2),
            "batch_wall_s": round(bat_s, 2),
        }))
        spark.stop()
    finally:
        shutil.rmtree(shm, ignore_errors=True)


def serve_tier(args) -> None:
    """Node-tier replay of the same mix: sequential QPS on one
    LocalSearcher cold (qcache off) and warm (the queryResultCache
    hot path — the reference nodes cache the same way), plus scatter
    QPS across ``--shards`` shard indexes."""
    import pyspark.sql.functions as F

    from katta_spark.corpus import with_ingest_columns
    from katta_spark.index.serve import LocalSearcher, ShardedSearcher

    shm = tempfile.mkdtemp(
        prefix="katta_loadtest_srv_",
        dir="/dev/shm" if Path("/dev/shm").is_dir() else None,
    )
    try:
        spark = get_spark(
            app_name="katta_loadtest_srv", master=f"local[{args.cpus}]",
            shuffle_partitions=args.cpus,
            extra_conf={"spark.local.dir": f"{shm}/local"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        full = with_ingest_columns(
            synthetic_corpus(spark, args.docs, body_reps=args.reps)
        )
        build_index(spark, full, f"{shm}/union", n_groups=1,
                    block_range=1024)
        per = args.docs // args.shards
        dirs = []
        for s in range(args.shards):
            lo = s * per
            hi = args.docs if s == args.shards - 1 else (s + 1) * per
            part = full.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).withColumn("doc_id", F.col("doc_id") - lo)
            d = f"{shm}/shard{s}"
            build_index(spark, part, d, n_groups=1, block_range=1024)
            dirs.append(d)
        spark.stop()

        n = args.queries

        def replay(fn):
            t0 = time.monotonic()
            for i in range(n):
                q, m = MIX[i % len(MIX)]
                fn(q, m)
            return time.monotonic() - t0

        cold = LocalSearcher(f"{shm}/union", qcache_size=0)
        for q, m in MIX:
            cold.topk(q, k=args.k, mode=m)  # warm files/JIT, no cache
        cold_s = replay(lambda q, m: cold.topk(q, k=args.k, mode=m))

        warm = LocalSearcher(f"{shm}/union")
        for q, m in MIX:
            warm.topk(q, k=args.k, mode=m)  # fill the result cache
        warm_s = replay(lambda q, m: warm.topk(q, k=args.k, mode=m))

        sh = ShardedSearcher(dirs)
        for q, m in MIX:
            sh.topk(q, k=args.k, mode=m)
        scat_s = replay(lambda q, m: sh.topk(q, k=args.k, mode=m))
        sh.close()

        print(json.dumps({
            "metric": "serving-tier load test (node QPS cold/warm + scatter)",
            "docs": args.docs, "shards": args.shards, "n_queries": n,
            "node_cold_qps": round(n / cold_s, 1),
            "node_warm_qps": round(n / warm_s, 1),
            "scatter_qps": round(n / scat_s, 1),
            "cache_speedup": round(cold_s / warm_s, 1),
        }))
    finally:
        shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
