"""SparkSession factory with scale-appropriate defaults.

Settings chosen for a multi-executor cluster reading very large
inputs, applied identically in local mode so test plans match
cluster plans:

- AQE on (runtime coalescing + skew-join splitting is the backstop
  behind our explicit salting);
- Arrow transfer on (every Python kernel is a vectorized pandas UDF);
- UTC session timezone (oracle comparisons against DuckDB);
- shuffle partitions sized to cores locally (overridden per-job at
  scale via spark.sql.shuffle.partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "katta_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = cores if inner == "*" else max(int(inner), 1)
        else:
            shuffle_partitions = 2 * cores

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing sizes by COMPRESSED shuffle bytes; the
        # build's ingest stages (tokenize + sha256 over text) are
        # CPU-bound per row, so the 1 MB default min-partition-size
        # coalesces a small corpus to a handful of tasks and
        # undersubscribes the cluster.  64 KB keeps parallelismFirst
        # honest at small scale; at warehouse scale partitions are
        # orders of magnitude past either floor and nothing changes.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # collect_list/collect_set aggregations (posting-list build:
        # positions per (doc, term), posting structs per (term, block))
        # run on ObjectHashAggregateExec, which ABANDONS hash
        # aggregation for a full sort after only 128 distinct keys by
        # default — the sort is memory-bandwidth-bound and was the
        # posting phase's scaling limiter (interleaved A/B at 8 cores:
        # ~1.5-2x faster with the hash path).  4M keys × ~100 B ≈
        # 400 MB/task worst case before the sort fallback trips, which
        # an executor sized for 128 MB input splits handles; the
        # fallback remains the safety valve above that.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "4000000",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
