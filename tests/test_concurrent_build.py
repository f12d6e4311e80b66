"""Concurrent per-shard builds (round 5): thread-submitted
build_index calls under FAIR scheduler pools must produce LOGICALLY
identical indexes to the sequential loop — same stats, same term
catalog, same postings totals, rank-identical queries.  (Parquet part
file NAMES contain task UUIDs, so byte-level identity is not a
meaningful target; logical identity is what serving depends on.)

This pins the determinism claim behind tools/bench_serving.py's
default concurrent build mode — one driver fills local[N] the way a
cluster's per-shard builders would, instead of paying the sequential
8x wall (round-4 probe: 1,159 s sequential vs 392 s union at 10M)."""

from concurrent.futures import ThreadPoolExecutor

import pyarrow.dataset as pa_ds
import pytest
from pyspark.sql import functions as F

from katta_spark.corpus import synthetic_corpus, with_ingest_columns
from katta_spark.index import build_index
from katta_spark.index.serve import ShardedSearcher

N_DOCS = 1024
N_SHARDS = 4
PER = N_DOCS // N_SHARDS  # 256, a multiple of block_range below
BR = 128


def _build(spark, full, root: str, concurrent: bool) -> list[str]:
    def one(s: int) -> str:
        part = full.filter(
            (F.col("doc_id") >= s * PER) & (F.col("doc_id") < (s + 1) * PER)
        ).withColumn("doc_id", F.col("doc_id") - s * PER)
        d = f"{root}/shard{s}"
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"shard{s}")
        try:
            build_index(spark, part, d, n_groups=1, block_range=BR)
        finally:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", None)
        return d

    if concurrent:
        with ThreadPoolExecutor(max_workers=N_SHARDS) as ex:
            return list(ex.map(one, range(N_SHARDS)))
    return [one(s) for s in range(N_SHARDS)]


@pytest.fixture(scope="module")
def both_builds(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cbuild")
    full = with_ingest_columns(synthetic_corpus(spark, N_DOCS))
    seq = _build(spark, full, str(root / "seq"), concurrent=False)
    conc = _build(spark, full, str(root / "conc"), concurrent=True)
    return seq, conc


def test_concurrent_build_logically_identical(both_builds):
    import json
    from pathlib import Path

    seq, conc = both_builds
    for ds, dc in zip(seq, conc):
        ss = json.loads((Path(ds) / "stats.json").read_text())
        sc = json.loads((Path(dc) / "stats.json").read_text())
        for k in ("n_docs", "avgdl", "block_range", "k1", "b",
                  "positions", "id_bits"):
            assert ss[k] == sc[k], (k, ds)
        # term catalogs identical row-for-row
        ts = pa_ds.dataset(f"{ds}/terms").to_table(
            columns=["term", "df"]).to_pandas().sort_values(
            ["term"]).reset_index(drop=True)
        tc = pa_ds.dataset(f"{dc}/terms").to_table(
            columns=["term", "df"]).to_pandas().sort_values(
            ["term"]).reset_index(drop=True)
        assert ts.equals(tc), ds
        # postings totals identical (same rows, same blocks)
        ps = pa_ds.dataset(f"{ds}/postings", partitioning="hive")
        pc = pa_ds.dataset(f"{dc}/postings", partitioning="hive")
        assert ps.count_rows() == pc.count_rows()


def test_concurrent_build_rank_identical_serving(both_builds):
    seq, conc = both_builds
    sh_s = ShardedSearcher(seq, scache_size=0)
    sh_c = ShardedSearcher(conc, scache_size=0)
    try:
        for q in (["import", "return"], ["scan", "merge"]):
            assert sh_s.topk(q, k=10) == sh_c.topk(q, k=10)
            assert sh_s.count(q) == sh_c.count(q)
        assert sh_s.query("(scan OR merge) AND import", k=10) == \
            sh_c.query("(scan OR merge) AND import", k=10)
    finally:
        sh_s.close()
        sh_c.close()
