"""Scalable corpus sketches: cardinality + quantile estimation that
stays bit-reproducible across engines.

Unlike HLL / t-digest (whose estimates depend on implementation
internals, so no independent SQL oracle can verify them), these
sketches use exact integer bucketing over md5-derived hashes — DuckDB
reproduces every output bit — while keeping the 100 TB cost profile
of a sketch:

- :func:`kmv_distinct` — K-Minimum-Values cardinality (Bar-Yossef et
  al., RANDOM'02).  One narrow pass; each partition emits at most
  ``k`` 60-bit hashes (Arrow ``mapInPandas`` kernel — no shuffle of
  the input), the global merge is a distinct + TakeOrdered over
  ``k x partitions`` rows.  Estimate = ``(k-1) * 2^60 / h_k``.
- :func:`bit_histogram` / :func:`bit_quantiles` — value-distribution
  profile via power-of-two buckets (``bucket = bit_length(v)``,
  exact integer arithmetic, no float log so no cross-engine rounding
  hazard); one map-side-combined groupBy producing <= 64 rows;
  quantiles read off the cumulative histogram.

Reference parity: Katta surfaces only exact counts (the count RPC,
katta-core/.../lib/lucene/LuceneServer.java:700-760); these are
beyond-reference ops for profiling training corpora where exact
count-distinct would itself be a full shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit hash: 15 hex digits of md5 — positive in a signed 64-bit
# lane and bit-identical in Spark and DuckDB (the repo-wide md5
# convention, see ops/dedup.py).
_H60_SCALE = float(1 << 60)


def h60(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row ``(k_used, kth_hash, est_distinct)`` KMV cardinality
    estimate for ``df[col]``.

    If fewer than ``k`` distinct hashes exist the count is exact
    (``est_distinct = k_used``); otherwise the estimator
    ``(k-1) / max_normalized_hash``.  Standard error ~ ``1/sqrt(k)``.

    Scale shape: the corpus pass is narrow (hash projection +
    per-partition k-smallest kernel, no shuffle); only
    ``<= k x n_partitions`` candidate hashes ever leave a partition.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        best: "np.ndarray | None" = None
        for pdf in batches:
            h = pdf["h"].to_numpy()
            best = h if best is None else np.concatenate([best, h])
            best = np.unique(best)  # sorted + distinct
            if best.size > k:
                best = best[:k]
        if best is not None and best.size:
            yield pd.DataFrame({"h": best})

    local = (
        df.select(h60(col).alias("h"))
        .filter(F.col("h").isNotNull())
        .mapInPandas(kernel, "h long")
    )
    # distinct across partitions (same value can survive in several
    # partitions' local top-k), then a k-item TakeOrdered merge.
    top = local.distinct().orderBy("h").limit(k)
    return top.agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").alias("kth_hash"),
    ).select(
        "k_used",
        "kth_hash",
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(
            F.floor(
                F.lit(float(k - 1)) * F.lit(_H60_SCALE) / F.col("kth_hash")
            ).cast("long")
        )
        .alias("est_distinct"),
    )


def bit_histogram(df: DataFrame, col: str) -> DataFrame:
    """``(bits, n)`` — power-of-two buckets of a non-negative integer
    column: ``bits = length(bin(v))`` covers ``[2^(bits-1), 2^bits)``
    (and value 0 lands in bits=1, matching ``bin(0) = '0'``)."""
    return (
        df.select(
            F.length(F.bin(F.col(col).cast("long"))).alias("bits")
        )
        .groupBy("bits")
        .agg(F.count("*").alias("n"))
    )


def bit_quantiles(
    df: DataFrame, col: str, qs: Sequence[float] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """``(q, bits, ub, cum_n)`` — bucketed quantile profile: for each
    ``q``, the first histogram bucket where the cumulative count
    reaches ``q * total``; ``ub = 2^bits - 1`` is the bucket's
    inclusive upper bound (the quantile's over-estimate).

    The whole computation after :func:`bit_histogram` runs on
    <= 64 rows — the single-partition windows are free.
    """
    hist = bit_histogram(df, col)
    w = Window.orderBy("bits").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bits",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    cand = cum.select(
        "*",
        F.explode(
            F.array(*[F.lit(float(q)) for q in qs])
        ).alias("q"),
    ).filter(F.col("cum_n") >= F.col("q") * F.col("total"))
    first = Window.partitionBy("q").orderBy("bits")
    return (
        cand.withColumn("_rn", F.row_number().over(first))
        .filter(F.col("_rn") == 1)
        .select(
            "q",
            "bits",
            F.expr("shiftleft(CAST(1 AS BIGINT), bits) - 1").alias("ub"),
            "cum_n",
        )
    )
