"""Streaming ingest: a corpus stream becomes searchable via
incremental index commits.

The Spark re-expression of Katta's blck ingest loop — clients spool
rows to the master (``add``), an explicit ``comm`` makes a
commit-<id> directory, ``fsh`` triggers the node-side merge into live
shards (katta-core/.../protocol/MasterStorageProtocol.java:160-214,
lib/writer/DefaultDataWriter.java:240-389,
operation/node/NodeIndexMergeOperation.java:92-165).  Here each
micro-batch IS a commit: ``foreachBatch`` runs the same
``build_index`` used for batch builds with ``commit=s<batch_id>``,
so the commit/visibility semantics (readers see whole commits only)
and the resume story (the manifest) are identical to batch.  Katta's
trade-off applies unchanged: data is searchable after its commit,
not in real time (README.md:25 "不支持适时更新").

Use ``trigger(availableNow=True)`` for catch-up ingest or a
processing-time trigger for continuous micro-batching; Spark's
checkpointLocation makes delivery exactly-once per batch id, and
``build_index``'s manifest makes replayed batches idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from katta_spark.index.build import build_index


def stream_build(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "content",
    n_groups: int = 1,
    block_range: int = 4096,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Attach an index-commit sink to a streaming corpus DataFrame.

    Every micro-batch becomes one index commit ``s<batch_id>``
    (skipped if already in the manifest — replay-safe)."""

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        build_index(
            batch.sparkSession,
            batch,
            index_dir,
            text_col=text_col,
            n_groups=n_groups,
            commit=f"s{batch_id}",
            block_range=block_range,
        )

    w = stream.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time:
        w = w.trigger(processingTime=processing_time)
    elif available_now:
        w = w.trigger(availableNow=True)
    return w.start()
