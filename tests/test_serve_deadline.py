"""Query deadlines, scatter retry, and partial results — the round-4
operational-hardening surfaces.

Reference contract: LuceneServer wraps every shard search in a
TimeLimitingCollector at 75% of the client budget
(LuceneServer.java:1555-1564, fraction :435-437; client budget
LuceneClient.java:182); NodeInteraction re-dispatches a failed
shard's work to another node (NodeInteraction.java:141-205); the
client returns partial results with the missing-shard set when the
budget expires (ClientResultReceiver.java:147-166,
ClientResult.isComplete / getMissingShards)."""

import os
import signal
import time

import pytest
from pyspark.sql import functions as F

from katta_spark.corpus import synthetic_corpus, with_ingest_columns
from katta_spark.index import build_index
from katta_spark.index.serve import (
    LocalSearcher,
    QueryTimeout,
    ShardedSearcher,
    _shard_count_task,
    _shard_facet_task,
    _shard_search_task,
)

BR = 256


@pytest.fixture(scope="module")
def two_shards(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("deadline")
    full = with_ingest_columns(synthetic_corpus(spark, 600))
    a = full.filter(F.col("doc_id") < 256)
    b = full.filter(F.col("doc_id") >= 256).withColumn(
        "doc_id", F.col("doc_id") - 256
    )
    da, db = str(root / "shard_a"), str(root / "shard_b")
    build_index(spark, a, da, n_groups=2, block_range=BR)
    build_index(spark, b, db, n_groups=2, block_range=BR)
    return da, db


# ---------------------------------------------------------------- kernel

def test_querytimeout_is_timeouterror():
    """ONE timeout exception surface: whether the worker kernel
    aborts first (QueryTimeout) or the parent's budget race wins
    (TimeoutError), a caller catching TimeoutError sees both."""
    assert issubclass(QueryTimeout, TimeoutError)


def test_kernel_deadline_raises(two_shards):
    da, _ = two_shards
    ls = LocalSearcher(da)
    # an already-expired budget aborts in the first kernel check
    with pytest.raises(TimeoutError):
        ls.topk(["import"], k=5, timeout_ms=0)
    with pytest.raises(QueryTimeout):
        ls.search(["import"], k=5, timeout_ms=0)
    with pytest.raises(QueryTimeout):
        ls.query("import OR table", k=5, timeout_ms=0)
    # deadline is cleared afterwards: the same handle answers
    # untimed queries and generous budgets identically
    want = ls.topk(["import"], k=5)
    assert ls.topk(["import"], k=5, timeout_ms=60_000) == want
    assert ls._deadline is None


def test_stored_field_surfaces_abort_on_budget(two_shards):
    """Round-5 non-kernel deadline coverage: the stored-field
    surfaces (facet / sorted_query / range facet / significant_terms)
    check the armed deadline between scan batches — the reference
    bounds EVERY collector, including facet/group calls
    (LuceneServer.java:1555-1564), not just scoring."""
    da, _ = two_shards
    ls = LocalSearcher(da, qcache_size=0)
    with pytest.raises(QueryTimeout):
        ls.facet(["import"], "lang", timeout_ms=0)
    with pytest.raises(QueryTimeout):
        ls.sorted_query(["import"], [("path", "asc")],
                        ["doc_id", "path"], 5, timeout_ms=0)
    with pytest.raises(QueryTimeout):
        ls.range_facet(["import"], "dl", 0.0, 1000.0, 100.0,
                       timeout_ms=0)
    with pytest.raises(QueryTimeout):
        ls.significant_terms(["import"], timeout_ms=0)
    # deadline cleared: untimed calls answer, budgets are generous
    assert ls.facet(["import"], "lang")
    assert ls.facet(["import"], "lang", timeout_ms=60_000) == \
        ls.facet(["import"], "lang")
    assert ls._deadline is None


def test_worker_deadline_covers_stored_surfaces(two_shards, monkeypatch):
    """The scatter worker's process-wide deadline (armed by
    _deadline_task at 75% of the budget) aborts stored-field scans
    in-worker — a timed-out worker running a facet or sig_terms scan
    frees itself instead of staying wedged through the scan."""
    import katta_spark.index.serve as serve_mod

    da, _ = two_shards
    ls = LocalSearcher(da, qcache_size=0)
    monkeypatch.setattr(serve_mod, "_WORKER_DEADLINE", 0.0)
    with pytest.raises(QueryTimeout):
        ls.facet(["import"], "lang")
    with pytest.raises(QueryTimeout):
        ls.significant_terms(["import"])
    with pytest.raises(QueryTimeout):
        ls.sorted_query(["import"], [("path", "asc")],
                        ["doc_id", "path"], 5)
    monkeypatch.setattr(serve_mod, "_WORKER_DEADLINE", None)
    assert ls.facet(["import"], "lang")


# --------------------------------------------------------------- scatter

def _slow_count_task(payload):
    d = payload[0]
    if "shard_b" in d:
        time.sleep(3.0)
    return _shard_count_task(payload)


def _slow_search_task(payload):
    d = payload[0]
    if "shard_b" in d:
        time.sleep(3.0)
    return _shard_search_task(payload)


def test_scatter_timeout_partial_count(two_shards):
    da, db = two_shards
    sh = ShardedSearcher([da, db], timeout_ms=700, complete=False)
    try:
        exact_a = LocalSearcher(da).count(["import"])
        t0 = time.monotonic()
        got = sum(sh._scatter(
            _slow_count_task,
            [(s.index_dir, {"terms": ["import"], "mode": "or"})
             for s in sh.shards],
        ))
        took = time.monotonic() - t0
        # returned within ~the budget, not after the slow shard
        assert took < 2.5
        assert got == exact_a
        assert sh.shards_failed == [db]
    finally:
        sh.close()


def test_scatter_timeout_complete_raises(two_shards):
    da, db = two_shards
    sh = ShardedSearcher([da, db], timeout_ms=500, complete=True)
    try:
        with pytest.raises(TimeoutError, match="shard"):
            sh._scatter(
                _slow_count_task,
                [(s.index_dir, {"terms": ["import"], "mode": "or"})
                 for s in sh.shards],
            )
    finally:
        sh.close()


def test_search_envelope_reports_missing_shards(two_shards, monkeypatch):
    import katta_spark.index.serve as serve_mod

    da, db = two_shards
    sh = ShardedSearcher([da, db], complete=False)
    try:
        # full run first: completeness fields on the happy path
        env = sh.search(["import"], k=5)
        assert env["shards_total"] == 2
        assert env["shards_failed"] == [] and env["complete"] is True
        n_full = env["num_found"]
        # per-query budget; shard_b's task hangs past it
        monkeypatch.setattr(serve_mod, "_shard_search_task",
                            _slow_search_task)
        env = sh.search(["import"], k=5, timeout_ms=700)
        assert env["complete"] is False
        assert env["shards_failed"] == [db]
        assert env["shards_total"] == 2
        assert 0 < env["num_found"] < n_full
        assert len(env["hits"]) > 0
    finally:
        sh.close()


def test_untimed_scatter_unchanged(two_shards):
    """No budget, no failures: scatter results identical to the
    per-shard truth (the pre-round-4 exact contract)."""
    da, db = two_shards
    sh = ShardedSearcher([da, db])
    try:
        assert sh.count(["import"]) == (
            LocalSearcher(da).count(["import"])
            + LocalSearcher(db).count(["import"])
        )
        env = sh.search(["import"], k=3)
        assert env["complete"] is True and env["shards_failed"] == []
    finally:
        sh.close()


# ----------------------------------------------------------------- retry

_KILL_SENTINEL = "/tmp/katta_kill_once_sentinel"


def _kill_once_count_task(payload):
    d = payload[0]
    if "shard_b" in d and not os.path.exists(_KILL_SENTINEL):
        with open(_KILL_SENTINEL, "w") as f:
            f.write("1")
        os.kill(os.getpid(), signal.SIGKILL)
    return _shard_count_task(payload)


def test_scatter_retries_dead_worker_once(two_shards):
    """A SIGKILLed pool worker (BrokenProcessPool) gets the shard's
    task re-dispatched once to a fresh pool — exact results, no
    partial, complete=True never trips."""
    da, db = two_shards
    if os.path.exists(_KILL_SENTINEL):
        os.unlink(_KILL_SENTINEL)
    sh = ShardedSearcher([da, db], complete=True)
    try:
        got = sum(sh._scatter(
            _kill_once_count_task,
            [(s.index_dir, {"terms": ["import"], "mode": "or"})
             for s in sh.shards],
        ))
        want = (LocalSearcher(da).count(["import"])
                + LocalSearcher(db).count(["import"]))
        assert got == want
        assert sh.shards_failed == []
    finally:
        sh.close()
        if os.path.exists(_KILL_SENTINEL):
            os.unlink(_KILL_SENTINEL)


def _slow_collect_task(payload):
    from katta_spark.index.serve import _shard_collect_task

    if "shard_b" in payload[0]:
        time.sleep(3.0)
    return _shard_collect_task(payload)


def test_sharded_query_budget_spans_both_rounds(two_shards, monkeypatch):
    """The two-round Lucene-string scatter shares ONE client budget;
    a shard that misses the df exchange is excluded from evaluation
    too (consistent idf), and under complete=False the answer is the
    surviving shard's exact ranking."""
    import katta_spark.index.serve as serve_mod

    da, db = two_shards
    # scache off: the repeated identical query must RE-SCATTER here
    # (a cache hit would — correctly, but not what this test pins —
    # serve the full cached result instead of the partial)
    sh = ShardedSearcher([da, db], complete=False, scache_size=0)
    try:
        want_full = sh.query("(import OR table) AND scan", k=5)
        assert sh.shards_failed == []
        monkeypatch.setattr(serve_mod, "_shard_collect_task",
                            _slow_collect_task)
        t0 = time.monotonic()
        got = sh.query("(import OR table) AND scan", k=5,
                       timeout_ms=700)
        assert time.monotonic() - t0 < 2.5
        assert sh.shards_failed == [db]
        # shard_a occupies offset 0, so its namespaced ids equal its
        # local ids: the partial answer is shard_a's exact ranking
        # under shard_a-local idf
        only_a = LocalSearcher(da, qcache_size=0)
        want = only_a.query("(import OR table) AND scan", k=5)
        assert [d for d, _ in got] == [d for d, _ in want]
        assert got != want_full or len(want_full) == len(want)
    finally:
        sh.close()


def test_sharded_refresh_preserves_policy(two_shards):
    """refresh() re-opens shards but must keep the handle's budget
    and partial-result policy."""
    da, db = two_shards
    sh = ShardedSearcher([da, db], timeout_ms=1234, complete=False)
    try:
        sh.count(["import"])
        sh.refresh()
        assert sh.timeout_ms == 1234 and sh.complete is False
        assert sh.count(["import"]) > 0
    finally:
        sh.close()


def test_metrics_surfaces(two_shards):
    """node_metrics / metrics counters: cache stats move, scatter
    counters count, failures recorded — the client-side view of the
    reference's node metrics registry."""
    da, db = two_shards
    ls = LocalSearcher(da)
    ls.topk(["import"], k=3)
    ls.topk(["import"], k=3)
    m = ls.node_metrics()
    assert m["qcache_hits"] == 1 and m["qcache_misses"] == 1
    assert m["qcache_hit_rate"] == 0.5 and m["qcache_entries"] == 1
    assert m["n_docs"] > 0 and m["tombstones"] == 0

    sh = ShardedSearcher([da, db], timeout_ms=700, complete=False)
    try:
        sh.count(["import"])
        sh._scatter(
            _slow_count_task,
            [(s.index_dir, {"terms": ["import"], "mode": "or"})
             for s in sh.shards],
        )
        sm = sh.metrics()
        assert sm["n_scatters"] == 2
        assert sm["n_shard_failures"] == 1
        assert sm["last_shards_failed"] == [db]
        assert len(sm["per_shard"]) == 2
    finally:
        sh.close()


def test_all_shards_failed_raises_even_tolerant(two_shards, monkeypatch):
    """Zero surviving shards has no meaningful partial result: even
    complete=False raises a clear TimeoutError (Solr shards.tolerant
    behaves the same) instead of pushing an empty list into every
    merge surface's concat."""
    da, db = two_shards
    sh = ShardedSearcher([da, db], complete=False)
    try:
        with pytest.raises(TimeoutError, match="all shards"):
            sh._scatter(
                _sleep_both_task,
                [(s.index_dir, {"terms": ["import"], "mode": "or"})
                 for s in sh.shards],
                timeout_ms=400,
            )
        assert sorted(sh.shards_failed) == sorted([da, db])
    finally:
        sh.close()


def _sleep_both_task(payload):
    time.sleep(3.0)
    return _shard_count_task(payload)


def _boom_task(payload):
    if "shard_b" in payload[0]:
        raise ValueError("no such field: bogus")
    return _shard_count_task(payload)


def _slow_then_facet_task(payload):
    from katta_spark.index.serve import _shard_facet_task

    if "shard_b" in payload[0]:
        time.sleep(0.7)
    return _shard_facet_task(payload)


def test_stored_field_scatter_worker_not_wedged(two_shards):
    """Cascade test for a STORED-FIELD scatter: the slow worker blows
    the budget; its armed deadline aborts the facet task's stored
    read in-worker (QueryTimeout) instead of running the scan to
    completion, so the SAME pool serves the next scatter with full
    results — no queue backs up behind a wedged scan."""
    da, db = two_shards
    sh = ShardedSearcher([da, db], timeout_ms=300, complete=False)
    try:
        cat = sh._merged_cat(["import"])
        payloads = sh._payloads(["import"], cat,
                                {"field": "lang", "mode": "or"})
        t0 = time.monotonic()
        sh._scatter(_slow_then_facet_task, payloads)
        assert time.monotonic() - t0 < 2.0
        assert sh.shards_failed == [db]
        pool = sh._pool
        time.sleep(0.8)  # let worker b finish its in-worker abort
        got = sh._scatter(_shard_facet_task, payloads)
        assert sh.shards_failed == [] and len(got) == 2
        assert sh._pool is pool, "pool was torn down"
    finally:
        sh.close()


def test_task_exception_keeps_pool_and_raises_original(two_shards):
    """A deterministic task error must NOT tear down the healthy
    pool (the workers' warm shard caches survive) and must surface
    the ORIGINAL exception under complete=True; under complete=False
    the shard is dropped without a retry."""
    da, db = two_shards
    sh = ShardedSearcher([da, db], complete=True)
    try:
        sh.count(["import"])  # build the pool
        pool_before = sh._pool
        with pytest.raises(ValueError, match="bogus"):
            sh._scatter(
                _boom_task,
                [(s.index_dir, {"terms": ["import"], "mode": "or"})
                 for s in sh.shards],
            )
        # the failing shard is marked even on the complete=True
        # task-exception raise path, consistent with timeout/broken
        assert sh.shards_failed == [db]
        assert sh.metrics()["n_shard_failures"] == 1
        assert sh._pool is pool_before, "healthy pool was torn down"
        # pool still serves queries
        assert sh.count(["import"]) > 0

        sh.complete = False
        got = sh._scatter(
            _boom_task,
            [(s.index_dir, {"terms": ["import"], "mode": "or"})
             for s in sh.shards],
        )
        assert len(got) == 1 and sh.shards_failed == [db]
        assert sh._pool is pool_before
    finally:
        sh.close()
