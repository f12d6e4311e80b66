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

Usage: python tools/loadtest.py [--docs 100000] [--cpus 32]
       [--queries 96] [--batch 16] [--reps 2]
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
    args = ap.parse_args()

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


if __name__ == "__main__":
    main()
