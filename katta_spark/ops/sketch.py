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


def cms_build(df: DataFrame, col: str, width: int = 1024,
              depth: int = 4, weight_col: str | None = None) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) over ``df[col]``
    as its COUNTER TABLE — one ``(row, cell, cnt)`` row per nonzero
    counter (<= depth * width rows, regardless of input size).

    Cell for hash row j = h60("j:" || value) mod width — the repo's
    engine-portable md5 convention, so an SQL oracle reproduces every
    counter exactly.  ``weight_col`` supports weighted counts (e.g.
    tf instead of 1).

    Scale shape: ONE hash agg with map-side combine over an
    explode(depth) projection; the result is bounded and
    broadcastable.  Merging sketches from two corpora = union +
    re-agg on (row, cell) — the sketch is a linear projection."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    c = F.col(col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                (h60(F.concat(F.lit(f"{j}:"), c)) % F.lit(int(width)))
                .cast("long")
                .alias("cell"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(cells).alias("rc"), w.alias("_w"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_query(cms: DataFrame, probes: DataFrame, probe_col: str,
              width: int = 1024, depth: int = 4) -> DataFrame:
    """``(probe, est)`` — count-min frequency estimate for every
    probe: min over the probe's ``depth`` counters (missing counter =
    0).  Never underestimates; overestimate probability shrinks
    geometrically with depth.

    Plan shape: probes explode to depth ``(row, cell)`` rows, one
    equi-join against the bounded counter table (AQE broadcasts the
    small side), then a per-probe ``min``."""
    c = F.col(probe_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                (h60(F.concat(F.lit(f"{j}:"), c)) % F.lit(int(width)))
                .cast("long")
                .alias("cell"),
            )
            for j in range(depth)
        ]
    )
    ppos = probes.select(
        F.col(probe_col).alias("probe"), F.explode(cells).alias("rc")
    ).select("probe", F.col("rc.row").alias("row"),
             F.col("rc.cell").alias("cell"))
    return (
        ppos.join(cms, ["row", "cell"], "left")
        .groupBy("probe")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .orderBy("probe")
    )


def _bloom_positions(col: Column, m_bits: int, k_hashes: int) -> Column:
    """Array of the value's ``k_hashes`` bloom bit positions: position
    j = h60("j:" || value) mod m — the repo's engine-portable md5
    convention, so DuckDB reproduces every bit."""
    c = col.cast("string")
    return F.array(
        *[
            (h60(F.concat(F.lit(f"{j}:"), c)) % F.lit(int(m_bits)))
            .cast("long")
            for j in range(k_hashes)
        ]
    )


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 16,
                k_hashes: int = 3) -> DataFrame:
    """Bloom filter over ``df[col]`` as its SET-BIT POSITION TABLE —
    one ``(pos)`` row per set bit (<= min(m_bits, k * distinct
    values) rows).

    The position-set form is engine-portable (an SQL oracle can
    reproduce it bit-for-bit) and distributes: build is one narrow
    hash projection + distinct (shuffle O(set bits), never the
    corpus); a dense bitmap for export is one
    ``groupBy(pos div 64) bit_or`` away.  Membership testing never
    false-negatives; false-positive rate follows the standard
    ``(1 - e^{-kn/m})^k``."""
    return (
        df.select(F.col(col))
        .filter(F.col(col).isNotNull())
        .select(
            F.explode(
                _bloom_positions(F.col(col), m_bits, k_hashes)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_contains(bloom: DataFrame, probes: DataFrame, probe_col: str,
                   m_bits: int = 1 << 16, k_hashes: int = 3) -> DataFrame:
    """``(probe, maybe)`` — bloom membership verdict for every probe
    (same ``m_bits``/``k_hashes`` as the build).  ``maybe=False`` is
    definitive absence; ``True`` is presence up to the filter's
    false-positive rate.

    Plan shape: probes explode to k position rows, one equi-join
    against the position table (AQE broadcasts whichever side is
    small — the probe list for lookups, the <= m-row filter when
    probing a stream), then a per-probe ``bool_and``."""
    ppos = probes.select(
        F.col(probe_col).alias("probe"),
        F.explode(
            _bloom_positions(F.col(probe_col), m_bits, k_hashes)
        ).alias("pos"),
    )
    hit = bloom.withColumn("_hit", F.lit(True))
    return (
        ppos.join(hit, "pos", "left")
        .groupBy("probe")
        .agg(F.bool_and(F.coalesce("_hit", F.lit(False))).alias("maybe"))
        .orderBy("probe")
    )
