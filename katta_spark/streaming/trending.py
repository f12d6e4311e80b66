"""Streaming trending terms over a document firehose.

The monitoring op a live search cluster runs beside ingest ("what is
being written about RIGHT NOW"): tokenize the incoming document
stream with the SAME JVM expression chain the index build uses
(katta_spark.tokenizer.tokens_array — so the stream's vocabulary is
the index's vocabulary), count terms per tumbling EVENT-TIME window
under a watermark, and rank the top movers per window at read time.

Scale shape: the streaming agg state is keyed (window × term) and the
watermark bounds how many windows stay open, so state is
O(open-windows × active vocabulary); the explode happens before the
shuffle but after a distinct-per-doc projection (one row per
(doc, term), not per occurrence) when ``per_doc=True`` — the df-style
count that trend detection wants (a single spammy doc can't fake a
trend).  Top-k runs over the finalized bounded bucket table, never
inside the stream.

Reference anchor: Katta has no streaming engine (SURVEY §2.9) — this
is part of the beyond-reference streaming tier (ingest, dedup,
percolate, trending) built on Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katta_spark.tokenizer import tokens_array


def windowed_term_counts(stream: DataFrame, ts_col: str = "ts",
                         text_col: str = "content",
                         duration: str = "1 hour",
                         watermark: str = "2 hours",
                         per_doc: bool = True) -> DataFrame:
    """(win_start, term, cnt) — streaming tumbling-window term
    counts.  ``per_doc=True`` counts each term once per document
    (document frequency — the trend signal); False counts
    occurrences.  The same expression works verbatim on a batch
    DataFrame (parity tested)."""
    toks = tokens_array(F.col(text_col))
    if per_doc:
        toks = F.array_distinct(toks)
    exploded = stream.select(
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.explode(toks).alias("term"),
    )
    if stream.isStreaming:
        exploded = exploded.withWatermark("_ts", watermark)
    return exploded.groupBy(
        F.window(F.col("_ts"), duration)["start"].alias("win_start"),
        "term",
    ).agg(F.count(F.lit(1)).alias("cnt"))


def top_terms_per_window(counts: DataFrame, n: int = 5) -> DataFrame:
    """(win_start, term, cnt, rank) — the read-side top-k over the
    finalized (bounded) window × term table; ties by term asc."""
    from pyspark.sql import Window

    w = Window.partitionBy("win_start").orderBy(
        F.desc("cnt"), F.asc("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(n))
        .orderBy("win_start", "rank")
    )
