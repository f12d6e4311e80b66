"""Per-phase two-parallelism profile of the index build.

Complements tools/bench_scaling.py: instead of one end-to-end wall,
this times the three dominant phases separately at two parallelism
levels (fresh JVM each, warmup excluded), because the sandbox VM's
CPU-grant noise hits short windows — per-phase speedups on quiet
minutes are the most trustworthy scaling signal (see
BENCH/BASELINE.md "Cross-run variance").

Phases:
  ingest   corpus exprs + dense ids + sha256 + tokenize + docs write
  posting  explode(+positions) -> tf aggregate -> block encode -> write
  terms    catalog aggregation + layout write

Usage: python tools/bench_phases.py [--docs 100000] [--levels 2,8]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from katta_spark.session import get_spark
from katta_spark.corpus import synthetic_corpus, with_ingest_columns
from katta_spark.tokenizer import tokens_array
from katta_spark.index.build import _group_expr, build_posting_blocks, tokens_with_tf
from pyspark.sql import functions as F

cpus, n_docs, reps = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
shm = tempfile.mkdtemp(prefix=f"katta_ph_{{cpus}}_", dir="/dev/shm")
spark = get_spark(app_name=f"phase{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus,
                  extra_conf={{"spark.local.dir": f"{{shm}}/local"}})
spark.sparkContext.setLogLevel("ERROR")
# warmup all hot paths (JIT, Arrow workers, codegen)
from katta_spark.index import build_index
build_index(spark, synthetic_corpus(spark, 3000), f"{{shm}}/warm", n_groups=1)
shutil.rmtree(f"{{shm}}/warm", ignore_errors=True)

# each phase sequence runs TWICE in the same JVM; per-phase min is
# reported (the first pass at real size still pays C2 compilation of
# the hot loops — a long-lived cluster runs steady-state)
t = {{}}
for rep in range(2):
    t0 = time.monotonic()
    docs = with_ingest_columns(synthetic_corpus(spark, n_docs, body_reps=reps))
    docs = docs.withColumn("toks", tokens_array("content")).withColumn(
        "dl", F.size("toks").cast("long")
    ).withColumn("g", _group_expr(1, 4096))
    docs.write.mode("overwrite").partitionBy("g").parquet(f"{{shm}}/docs")
    t["ingest"] = min(t.get("ingest", 1e9), round(time.monotonic() - t0, 2))

    dc = spark.read.parquet(f"{{shm}}/docs")
    t0 = time.monotonic()
    blocks = build_posting_blocks(
        tokens_with_tf(dc, "content", positions=True), 50.0, 4096
    )
    blocks.write.mode("overwrite").parquet(f"{{shm}}/postings")
    t["posting"] = min(t.get("posting", 1e9), round(time.monotonic() - t0, 2))

    t0 = time.monotonic()
    pa = spark.read.parquet(f"{{shm}}/postings")
    pa.groupBy("term").agg(F.sum("n").alias("df"), F.sum("cf").alias("cf")) \\
      .repartitionByRange(max(cpus // 4, 1), "term") \\
      .sortWithinPartitions("term").write.mode("overwrite") \\
      .parquet(f"{{shm}}/terms")
    t["terms"] = min(t.get("terms", 1e9), round(time.monotonic() - t0, 2))

spark.stop()
shutil.rmtree(shm, ignore_errors=True)
print("RESULT " + json.dumps({{"cpus": cpus, **t}}))
"""


def run_level(cpus: int, n_docs: int, reps: int) -> dict:
    code = WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_docs), str(reps)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--best-of", type=int, default=2)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    res = {}
    for c in levels:
        runs = [run_level(c, args.docs, args.reps) for _ in range(args.best_of)]
        res[c] = {
            ph: min(r[ph] for r in runs) for ph in ("ingest", "posting", "terms")
        }
    lo, hi = levels
    print(f"| phase | {lo}-core s | {hi}-core s | speedup |")
    print("|---|---|---|---|")
    for ph in ("ingest", "posting", "terms"):
        sp = res[lo][ph] / res[hi][ph] if res[hi][ph] else float("nan")
        print(f"| {ph} | {res[lo][ph]} | {res[hi][ph]} | {sp:.2f}x |")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
