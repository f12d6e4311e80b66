"""Stateful streaming dedup: emit each content digest's FIRST
occurrence across the whole stream, drop later duplicates.

The custom-stateful-operator pattern (applyInPandasWithState): state
is keyed by content digest; a key's state is a single seen-flag, so
state size is O(distinct digests) and eviction can be bounded with a
timeout when the dedup horizon is finite.  This is the streaming
companion of ops/dedup.exact_dup_groups for continuous ingest
pipelines (batch dedups the corpus; this dedups the firehose).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "seen boolean"


def _dedup_fn(key: tuple, batches: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    seen = state.exists
    for pdf in batches:
        if seen:
            continue
        seen = True
        state.update((True,))
        yield pdf.iloc[:1]  # first occurrence only


def stream_dedup_exact(stream: DataFrame, text_col: str = "content") -> DataFrame:
    """Streaming DataFrame -> same schema + ``content_md5``, exact
    duplicates (by md5 of ``text_col``) dropped across ALL
    micro-batches, first occurrence wins."""
    keyed = stream.withColumn("content_md5", F.md5(F.col(text_col)))
    out_schema = keyed.schema
    return (
        keyed.groupBy("content_md5")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_minhash(
    stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "content",
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Streaming NEAR-duplicate dedup: each micro-batch's docs are
    MinHash-banded (:func:`katta_spark.ops.dedup.band_buckets`) and a
    doc survives only if none of its LSH buckets collide with a
    previously-emitted doc — the streaming companion of
    ``minhash_lsh_pairs`` for continuous ingest.

    Semantics (greedy first-wins, the standard streaming-LSH rule):

    - cross-batch: a doc sharing >=1 band bucket with any EARLIER
      survivor is dropped;
    - in-batch: among docs clean of the store, a doc survives iff it
      is the min ``doc_id`` in EVERY one of its buckets (a doc that
      collides only with a smaller DROPPED doc is dropped too —
      conservative by design, the approximation window is one
      micro-batch).

    State is a durable parquet bucket store (survivors' buckets,
    partitioned by batch) instead of executor-memory GroupState:
    at 100 TB the seen-set outgrows any state store RAM, a disk
    store survives cluster restarts without checkpoint replay, and
    both per-batch joins BROADCAST the micro-batch side (the store
    is never shuffled).  Replay-safe: batch ``b`` reads only
    partitions ``< b`` and overwrites its own output/store
    partitions, so a redelivered batch recomputes bit-identically.
    At warehouse scale, compact the store periodically and
    bucket/sort it by ``bucket`` so the semi-join prunes files.
    """
    from katta_spark.ops.dedup import band_buckets

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        bb = band_buckets(batch, num_hashes, bands, n, text_col).cache()
        try:
            seen = None
            try:
                seen = spark.read.parquet(store_dir).filter(
                    F.col("batch") < batch_id
                )
            except Exception:
                seen = None
            if seen is not None:
                hit = (
                    seen.join(
                        F.broadcast(bb.select("band", "bucket").distinct()),
                        ["band", "bucket"],
                        "left_semi",
                    )
                    .select("band", "bucket")
                    .distinct()
                )
                dirty = (
                    bb.join(F.broadcast(hit), ["band", "bucket"], "left_semi")
                    .select("doc_id")
                    .distinct()
                )
                cand = bb.join(dirty, "doc_id", "left_anti")
            else:
                cand = bb
            mins = cand.groupBy("band", "bucket").agg(
                F.min("doc_id").alias("_min_id")
            )
            keep = (
                cand.join(mins, ["band", "bucket"])
                .groupBy("doc_id")
                .agg(
                    F.max(
                        (F.col("doc_id") != F.col("_min_id")).cast("int")
                    ).alias("_loses")
                )
                .filter(F.col("_loses") == 0)
                .select("doc_id")
            )
            batch.join(keep, "doc_id", "left_semi").write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/batch={batch_id}")
            bb.join(keep, "doc_id", "left_semi").select(
                "band", "bucket"
            ).write.mode("overwrite").parquet(
                f"{store_dir}/batch={batch_id}"
            )
        finally:
            bb.unpersist()

    w = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time:
        w = w.trigger(processingTime=processing_time)
    elif available_now:
        w = w.trigger(availableNow=True)
    return w.start()
