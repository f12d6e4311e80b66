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
