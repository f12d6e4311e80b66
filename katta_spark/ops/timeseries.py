"""Time-series operators over event tables.

Reference parity: Katta's facetByRange with date gaps — units
YEAR/MONTH/DAY/HOUR/MINUTE/SECOND parsed from '+1YEAR'-style specs
(katta-core/.../lib/lucene/group/DateRangeFactory.java:43-77, range
stepping :86-230, dispatch LuceneServer.java:1197-1258).  Spark's
``date_trunc``/``window``/``session_window`` express the same
bucketing declaratively, with partial aggregation and AQE for free.

Beyond the reference (training-data pipeline needs): tumbling-window
aggregation, per-key session windows, JSON property extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# DateRangeFactory.java:46-76 unit tokens -> Spark date_trunc units
DATE_UNITS = {
    "YEAR": "year", "MONTH": "month", "DAY": "day",
    "HOUR": "hour", "MINUTE": "minute", "SECOND": "second",
}


def gap_unit(spec: str) -> str:
    """Normalize a date-gap spec (``DAY``, ``+1DAY``, ``+1DAYS``) to
    its calendar unit key.  A MULTI-unit gap (``+2DAY``) raises
    instead of silently flooring to one unit — 1-day buckets for a
    2-day request is a wrong answer with no error signal; plural
    forms (Solr accepts ``+1DAYS``) are accepted."""
    import re

    m = re.fullmatch(r"\+?(\d*)\s*([A-Z]+?)S?", spec.strip().upper())
    if not m or m.group(2) not in DATE_UNITS:
        raise ValueError(f"unsupported date gap {spec!r}")
    if m.group(1) not in ("", "1"):
        raise ValueError(
            f"multi-unit date gap {spec!r} unsupported — use a "
            "coarser unit or the numeric range facet"
        )
    return m.group(2)


def parse_date_math(expr: str) -> list[tuple]:
    """Solr DateMathParser grammar (the subset Katta's Solr queries
    use): leading ``NOW``, then any sequence of ``/UNIT`` (floor) and
    ``±N UNIT[S]`` (calendar arithmetic) — e.g.
    ``NOW/DAY-7DAYS+3HOURS``.  Returns [("trunc", unit) | ("add", n,
    unit)]; raises ValueError on malformed input."""
    import re

    s = expr.strip().upper()
    if not s.startswith("NOW"):
        raise ValueError(f"date math must start with NOW: {expr!r}")
    ops: list[tuple] = []
    pat = re.compile(r"/([A-Z]+?)S?(?![A-Z])|([+-])(\d+)([A-Z]+?)S?(?![A-Z])")
    i = 3
    while i < len(s):
        m = pat.match(s, i)
        if m is None:
            raise ValueError(f"bad date math at {s[i:]!r} in {expr!r}")
        if m.group(1) is not None:
            unit = DATE_UNITS.get(m.group(1))
            if unit is None:
                raise ValueError(f"unknown unit {m.group(1)!r} in {expr!r}")
            ops.append(("trunc", unit))
        else:
            unit = DATE_UNITS.get(m.group(4))
            if unit is None:
                raise ValueError(f"unknown unit {m.group(4)!r} in {expr!r}")
            n = int(m.group(2) + m.group(3))  # signed count
            ops.append(("add", n, unit))
        i = m.end()
    return ops


def date_math_col(now, expr: str):
    """Spark Column for a Solr date-math string applied to ``now``
    (a timestamp Column): floors via date_trunc, arithmetic via
    calendar INTERVAL literals (month-clamping matches SQL engines)."""
    c = now
    for op in parse_date_math(expr):
        if op[0] == "trunc":
            c = F.date_trunc(op[1], c)
        else:
            c = c + F.expr(f"INTERVAL {op[1]} {op[2].upper()}")
    return c


def date_math_sql(now_sql: str, expr: str) -> str:
    """DuckDB SQL fragment for the SAME parsed date-math ops — the
    oracle side is generated from the one parser so the two engines'
    calendar semantics (not two parsers) are what gets compared."""
    c = now_sql
    for op in parse_date_math(expr):
        if op[0] == "trunc":
            c = f"date_trunc('{op[1]}', {c})"
        else:
            sign = "+" if op[1] >= 0 else "-"
            c = f"({c} {sign} INTERVAL {abs(op[1])} {op[2].upper()})"
    return c


def date_range_facet(df: DataFrame, ts_col: str, unit: str,
                     min_count: int = 1) -> DataFrame:
    """(bucket_start timestamp, cnt) histogram at a calendar unit —
    Katta's date facetByRange, one hash aggregation."""
    trunc = DATE_UNITS[gap_unit(unit)]
    return (
        df.groupBy(F.date_trunc(trunc, F.col(ts_col)).alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy("bucket_start")
    )


def window_agg(df: DataFrame, ts_col: str, duration: str,
               value_col: str = "value",
               key_col: str | None = None) -> DataFrame:
    """Tumbling-window aggregate: (win_start, [key], n, sum_value,
    avg_value).  Epoch-aligned, identical semantics batch or
    streaming (``readStream`` + watermark reuses this verbatim)."""
    keys = [F.window(F.col(ts_col), duration)["start"].alias("win_start")]
    if key_col:
        keys.append(F.col(key_col))
    return (
        df.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
        .orderBy(*[k for k in ["win_start", key_col] if k is not None])
    )


def ohlc_bars(df: DataFrame, ts_col: str, duration: str,
              value_col: str = "value", key_col: str | None = None,
              id_col: str | None = None) -> DataFrame:
    """OHLC downsampling bars (the TSDB candlestick rollup: open /
    high / low / close of ``value_col`` per epoch-aligned window
    [and key]).

    Plan shape: ONE hash aggregation — ``min_by``/``max_by`` carry
    (value, order-key) partial states through the map-side combine,
    so the shuffle is O(buckets), never a sort or a per-bucket window
    function over the raw events.  ``id_col`` breaks equal-timestamp
    ties so open/close are deterministic under duplicate timestamps
    (rerun/partitioning invariant)."""
    ordk = F.struct(
        F.col(ts_col), *([F.col(id_col)] if id_col else [])
    )
    keys = [F.window(F.col(ts_col), duration)["start"].alias("win_start")]
    if key_col:
        keys.append(F.col(key_col))
    v = F.col(value_col)
    return (
        df.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min_by(v, ordk), 6).alias("open"),
            F.round(F.max(v), 6).alias("high"),
            F.round(F.min(v), 6).alias("low"),
            F.round(F.max_by(v, ordk), 6).alias("close"),
        )
        .orderBy(*[k for k in ["win_start", key_col] if k is not None])
    )


def sliding_window_agg(df: DataFrame, ts_col: str, width: str, hop: str,
                       value_col: str = "value") -> DataFrame:
    """Hopping-window aggregate (win_start, n, sum_value, avg_value):
    every event lands in ``width/hop`` overlapping windows.

    ``F.window(ts, width, hop)`` expands each row to its covering
    windows JVM-side before ONE hash aggregation — shuffle grows by
    the (small, constant) overlap factor, never a self-join or a
    per-window pass.  Epoch-aligned like :func:`window_agg`, so batch
    and Structured Streaming produce identical buckets."""
    return (
        df.groupBy(
            F.window(F.col(ts_col), width, hop)["start"].alias("win_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
        .orderBy("win_start")
    )


def gap_fill(df: DataFrame, ts_col: str, key_col: str,
             value_col: str = "value", step: str = "1 hour") -> DataFrame:
    """Regular-grid resample with forward fill (LOCF) per key:
    (key, grid_ts, value).  The grid runs from each key's first to
    last observation at a fixed ``step``; every grid point carries the
    most recent observation at-or-before it (ties at one timestamp are
    averaged first, so the fill is deterministic).

    Plan shape: one agg for per-key bounds, ``sequence`` + explode for
    the grid (no driver loop, no cross join), then last-non-null over
    a per-key ordered window — state is partitioned by key, so the
    sort never concentrates on one task.  The first grid point always
    coincides with the key's first observation, so the fill is never
    null."""
    from pyspark.sql import Window

    obs = df.groupBy(key_col, ts_col).agg(
        F.avg(value_col).alias("_v")
    )
    grid = (
        df.groupBy(key_col)
        .agg(F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi"))
        .select(
            key_col,
            F.explode(
                F.expr(f"sequence(_lo, _hi, interval {step})")
            ).alias("_t"),
        )
        .withColumn("_v", F.lit(None).cast("double"))
        .withColumn("_src", F.lit(1))
    )
    unioned = grid.unionByName(
        obs.select(
            key_col,
            F.col(ts_col).alias("_t"),
            "_v",
            F.lit(0).alias("_src"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("_f", F.last("_v", ignorenulls=True).over(w))
        .filter(F.col("_src") == 1)
        .select(
            key_col,
            F.col("_t").alias("grid_ts"),
            F.round("_f", 6).alias("value"),
        )
        .orderBy(key_col, "grid_ts")
    )


def asof_join(left: DataFrame, right: DataFrame, ts_col: str,
              key_col: str, value_col: str = "value",
              out_col: str = "asof_value") -> DataFrame:
    """AS-OF join: every ``left`` row gains the most recent ``right``
    value at-or-before its timestamp, per key (the kdb+/QuestDB
    ``asof join``, DuckDB ``ASOF JOIN``).  Left rows with no prior
    right observation keep NULL — left-outer semantics.

    Plan shape: never a range self-join (O(n·m) worst case).  Right
    observations at the same (key, ts) are averaged first so the
    carried value is deterministic, then both sides union into ONE
    stream and a per-key ordered window carries the last non-null
    right value forward — one shuffle on ``key_col``, window state
    partitioned per key, linear in rows.  This is the shape that
    survives 100 TB: the sort is per-key and the right side is
    pre-aggregated, so no reducer ever materializes a cross product.

    Ties at one timestamp: the right observation sorts BEFORE the
    left row (``_side`` 0 < 1), so "at-or-before" is inclusive —
    identical to DuckDB's ``ON l.ts >= r.ts``.
    """
    from pyspark.sql import Window

    robs = (
        right.groupBy(key_col, ts_col)
        .agg(F.avg(value_col).alias("__asof_rv"))
        .withColumn("__asof_side", F.lit(0))
    )
    l2 = left.withColumn("__asof_side", F.lit(1))
    u = l2.unionByName(robs, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(out_col, F.last("__asof_rv", ignorenulls=True).over(w))
        .filter(F.col("__asof_side") == 1)
        .drop("__asof_rv", "__asof_side")
    )


def window_top_keys(df: DataFrame, ts_col: str, duration: str,
                    key_col: str, k: int = 3) -> DataFrame:
    """(win_start, key, n, rank) — top-k keys per tumbling window: the
    Elasticsearch 'terms aggregation inside a date histogram' shape.
    ONE hash agg keyed on (window, key); the rank window runs over the
    aggregated counts (cardinality windows x keys, tiny next to the
    event stream) partitioned per window.  Ties break key-ascending."""
    from pyspark.sql import Window

    agg = df.groupBy(
        F.window(F.col(ts_col), duration)["start"].alias("win_start"),
        F.col(key_col),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("win_start").orderBy(F.desc("n"), F.asc(key_col))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("win_start", "rank")
    )


def session_agg(df: DataFrame, ts_col: str, key_col: str,
                gap: str = "30 minutes") -> DataFrame:
    """Per-key session windows (gap-based): (key, session_start, n).

    ``session_window`` is Spark's native stateful sessionization —
    in batch it compiles to a sort-based aggregation per key; in
    streaming the same expression maintains session state with
    watermark eviction."""
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            key_col,
            F.col("session_window")["start"].alias("session_start"),
            "n",
        )
        .orderBy(key_col, "session_start")
    )


def json_props(df: DataFrame, json_col: str, field: str,
               out_type: str = "int") -> DataFrame:
    """Extract a JSON property as a typed column — F.get_json_object
    stays JVM-side (Jackson), no UDF."""
    return df.withColumn(
        f"prop_{field}",
        F.get_json_object(F.col(json_col), f"$.{field}").cast(out_type),
    )


def counter_rate(df: DataFrame, ts_col: str, key_col: str,
                 value_col: str = "value",
                 order_cols: list[str] | None = None) -> DataFrame:
    """Per-key COUNTER derivative with reset handling (PromQL
    ``rate()`` over a monotone counter): increase = value - lag, but
    a decrease means the counter reset to ~0 and restarted, so the
    increase is the new value itself — Prometheus's exact reset rule.
    First event per key: NULL; duplicate timestamps: NULL rate.

    Same plan as :func:`rate` — ONE shuffle on ``key_col``, two-row
    lag-window state, never whole-partition buffering."""
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_v = F.lag(value_col).over(w)
    sec = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6)
    elapsed = sec - F.lag(sec).over(w)
    raw = F.col(value_col) - prev_v
    increase = F.when(prev_v.isNull(), F.lit(None).cast("double")).when(
        raw < 0, F.col(value_col).cast("double")
    ).otherwise(raw)
    return df.withColumn(
        "increase", F.round(increase, 6) + F.lit(0.0)
    ).withColumn(
        "rate_per_s",
        F.round(F.when(elapsed > 0, increase / elapsed), 6) + F.lit(0.0),
    )


def ewma(df: DataFrame, ts_col: str, key_col: str,
         value_col: str = "value", alpha: float = 0.3,
         order_cols: list[str] | None = None,
         out_col: str = "ewma") -> DataFrame:
    """Per-key exponentially weighted moving average (the ES
    ``moving_fn`` ewma / PromQL smoothing shape): ``y_0 = x_0``,
    ``y_i = (1-alpha)*y_{i-1} + alpha*x_i`` — the pandas
    ``adjust=False`` recurrence, which is bit-identical to the naive
    double recurrence (verified by test), so a recursive-CTE SQL
    oracle reproduces it exactly.

    Scale shape: ONE shuffle on ``key_col``; the recurrence is
    inherently sequential per key, so each key's series lands in one
    Arrow group and runs through pandas' C ewm loop (no per-row
    Python).  A telemetry key's series fits an executor; for
    unbounded series, segment and carry ``(weight, value)`` tail
    state — the recurrence composes over segments."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    order_by = [ts_col] + list(order_cols or [])
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, DoubleType())]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort")
        y = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        # + 0.0 collapses IEEE -0.0 (cross-engine hash hazard)
        pdf[out_col] = y.round(6) + 0.0
        return pdf

    return df.groupBy(key_col).applyInPandas(kernel, out_schema)


def group_corr(df: DataFrame, key_col: str, x_col: str, y_col: str,
               out_col: str = "corr") -> DataFrame:
    """Per-group Pearson correlation between two numeric columns —
    the "does metric X track metric Y per segment" diagnostic.

    ONE hash aggregation for the six moments (n, Σx, Σy, Σx², Σy²,
    Σxy) with map-side combine, then the closed formula.  Moments are
    rounded to 6dp BEFORE the formula (the :func:`zscore` trick) so
    engines that sum in different orders agree exactly; groups with
    zero variance in either series yield NULL.  Rows with a NULL in
    either column are dropped (pairwise-complete, SQL corr
    semantics)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(x), 6).alias("_sx"),
            F.round(F.sum(y), 6).alias("_sy"),
            F.round(F.sum(x * x), 6).alias("_sxx"),
            F.round(F.sum(y * y), 6).alias("_syy"),
            F.round(F.sum(x * y), 6).alias("_sxy"),
        )
    )
    n = F.col("n").cast("double")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    denx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    deny = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    corr = F.when(
        (denx > 0) & (deny > 0),
        F.round(num / F.sqrt(denx * deny), 6),
    )
    return agg.select(key_col, "n", corr.alias(out_col)).orderBy(key_col)


def zscore(df: DataFrame, key_col: str, value_col: str = "value",
           out_col: str = "z") -> DataFrame:
    """Per-group standard score: z = (value − mean_g) / std_g with
    sample stddev per ``key_col`` group — the basic anomaly signal
    over an event stream.  ONE hash agg for the per-group moments,
    broadcast back into a narrow pass over the stream (group
    cardinality is tiny next to the events).  Mean/std are rounded
    to 6dp BEFORE the z computation so independently-summed engines
    agree exactly; single-row groups (std 0/NULL) yield NULL z."""
    stats = df.groupBy(key_col).agg(
        F.round(F.avg(value_col), 6).alias("_mu"),
        F.round(F.stddev_samp(value_col), 6).alias("_sd"),
    )
    z = F.when(
        F.col("_sd") > 0,
        F.round((F.col(value_col) - F.col("_mu")) / F.col("_sd"), 6),
    )
    return (
        df.join(F.broadcast(stats), key_col)
        .withColumn(out_col, z)
        .drop("_mu", "_sd")
    )


def running_agg(df: DataFrame, ts_col: str, key_col: str,
                value_col: str = "value",
                order_cols: list[str] | None = None) -> DataFrame:
    """Per-key running (cumulative) sum and count ordered by time —
    the balance/odometer view of an event stream.  One shuffle on
    ``key_col``; window state is per-key and streamed in order, so
    no reducer materializes more than a key's partition.
    ``order_cols`` extends the sort key for a total order under
    timestamp ties (pass a unique id!)."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("run_sum", F.round(F.sum(value_col).over(w), 6))
        .withColumn("run_n", F.count(F.lit(1)).over(w))
    )


def percentiles(df: DataFrame, key_col: str, value_col: str = "value",
                probs: tuple = (0.5, 0.95, 0.99)) -> DataFrame:
    """(key, n, p50, p95, ...) — exact linear-interpolation percentiles
    per group (the ES percentiles-agg shape, but exact rather than
    t-digest: reproducible across engines and reruns).  Spark's
    ``percentile`` is a sort-based exact aggregate; state is per
    (group, distinct value), fine for event-stream value domains.  At
    100 TB swap in ``percentile_approx`` — documented trade, the
    call-site shape is identical."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in probs:
        name = f"p{str(p).replace('0.', '')}"
        aggs.append(
            F.round(F.percentile(F.col(value_col), F.lit(p)), 6).alias(name)
        )
    return df.groupBy(key_col).agg(*aggs).orderBy(key_col)


def boxplot(df: DataFrame, key_col: str,
            value_col: str = "value") -> DataFrame:
    """ES ``boxplot`` aggregation: per group ``(n, vmin, q1, q2, q3,
    vmax)``.  Exact linear-interpolation quantiles rather than ES's
    TDigest — reproducible across engines (same trade as
    :func:`percentiles`; swap ``percentile_approx`` in at 100 TB,
    call-site shape identical).

    Scale shape: ONE keyed hash agg; the five order statistics share
    the group's sorted state inside a single ``percentile`` aggregate
    pass."""
    v = F.col(value_col)
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(v).alias("vmin"),
            F.round(F.percentile(v, F.lit(0.25)), 6).alias("q1"),
            F.round(F.percentile(v, F.lit(0.5)), 6).alias("q2"),
            F.round(F.percentile(v, F.lit(0.75)), 6).alias("q3"),
            F.max(v).alias("vmax"),
        )
        .orderBy(key_col)
    )


def t_test(df: DataFrame, type_col: str, group_a: str, group_b: str,
           value_col: str = "value") -> DataFrame:
    """ES ``t_test`` aggregation (heteroscedastic / Welch's
    two-sample): compare ``value_col`` between the ``group_a`` and
    ``group_b`` populations of ``type_col``.  Returns one row
    ``(n_a, n_b, mean_a, mean_b, t_stat)`` with
    ``t = (m_a - m_b) / sqrt(s_a^2/n_a + s_b^2/n_b)`` (sample
    variances).

    Scale shape: ONE conditional hash agg over the scan (six
    conditional moments: n / Σv / Σv² per side), no shuffle beyond
    the single global agg — the ES implementation's per-shard moment
    merge is exactly Spark's partial aggregation.  Moments are
    rounded to 6dp BEFORE the formula (the :func:`group_corr` trick)
    so engines that sum in different orders agree exactly."""
    a = F.col(type_col) == F.lit(group_a)
    b = F.col(type_col) == F.lit(group_b)
    v = F.col(value_col).cast("double")
    agg = df.agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(b, 1)).alias("n_b"),
        F.round(F.sum(F.when(a, v)), 6).alias("_sa"),
        F.round(F.sum(F.when(b, v)), 6).alias("_sb"),
        F.round(F.sum(F.when(a, v * v)), 6).alias("_saa"),
        F.round(F.sum(F.when(b, v * v)), 6).alias("_sbb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    m_a = F.col("_sa") / na
    m_b = F.col("_sb") / nb
    # sample variance from rounded moments: (Σv² - n·m²) / (n-1)
    v_a = (F.col("_saa") - na * m_a * m_a) / (na - 1)
    v_b = (F.col("_sbb") - nb * m_b * m_b) / (nb - 1)
    t = (m_a - m_b) / F.sqrt(v_a / na + v_b / nb)
    return agg.select(
        "n_a", "n_b",
        F.round(m_a, 6).alias("mean_a"),
        F.round(m_b, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
    )


def extended_stats(df: DataFrame, key_col: str,
                   value_col: str = "value",
                   sigma: float = 2.0) -> DataFrame:
    """ES ``extended_stats`` aggregation: per group count / min /
    max / sum / avg / sum_of_squares / variance / std_deviation
    (population, the ES default) and the ±``sigma`` std-deviation
    bounds.

    Scale shape: ONE keyed hash agg (n, Σv, Σv², min, max) with
    map-side combine; moments rounded to 6dp before the formulas
    (the :func:`group_corr` trick) so engines agree exactly."""
    v = F.col(value_col).cast("double")
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.round(F.sum(v), 6).alias("_s"),
        F.round(F.sum(v * v), 6).alias("_ss"),
    )
    n = F.col("n").cast("double")
    mean = F.col("_s") / n
    var = F.col("_ss") / n - mean * mean
    std = F.sqrt(var)
    sg = F.lit(float(sigma))
    return agg.select(
        key_col, "n", "vmin", "vmax",
        F.round("_s", 6).alias("vsum"),
        F.round(mean, 6).alias("avg"),
        F.round("_ss", 6).alias("sum_sq"),
        F.round(var, 6).alias("variance"),
        F.round(std, 6).alias("std_dev"),
        F.round(mean + sg * std, 6).alias("std_upper"),
        F.round(mean - sg * std, 6).alias("std_lower"),
    ).orderBy(key_col)


def value_histogram(df: DataFrame, value_col: str = "value",
                    interval: float = 10.0) -> DataFrame:
    """ES numeric ``histogram`` aggregation with ``min_doc_count=0``:
    fixed-``interval`` buckets aligned at 0 over the data's min..max
    span, EMPTY BUCKETS EMITTED — ``(bucket, n)``.

    Scale shape: one hash agg on the aligned bucket + one min/max
    agg to a ONE-ROW bounds table; the dense bucket axis is a
    ``sequence`` explode of that single row (bucket-count-sized,
    never data-sized) left-joined to the counts."""
    iv = float(interval)
    b = F.floor(F.col(value_col) / F.lit(iv)).cast("long")
    counts = df.groupBy(b.alias("_b")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = df.agg(
        F.min(b).alias("_lo"), F.max(b).alias("_hi")
    )
    axis = bounds.select(
        F.explode(F.sequence("_lo", "_hi")).alias("_b")
    )
    return (
        axis.join(counts, "_b", "left")
        .select(
            F.round(F.col("_b") * F.lit(iv), 6).alias("bucket"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
        .orderBy("bucket")
    )


def normalize_buckets(df: DataFrame, ts_col: str, duration: str,
                      value_col: str = "value") -> DataFrame:
    """ES ``normalize`` pipeline aggregation over a date-histogram
    parent: per tumbling bucket ``sum``, then ``percent_of_sum``
    (bucket share of the grand total × 100) and ``rescale_0_1``
    across the bucket axis.

    Scale shape: one hash agg to the bounded bucket table, then the
    normalizing constants come from an unpartitioned window over
    THAT table (bucket-count rows, never raw events)."""
    from pyspark.sql import Window

    bucket = F.window(F.col(ts_col).cast("timestamp"), duration)
    agg = df.groupBy(bucket["start"].alias("bucket_start")).agg(
        F.round(F.sum(F.col(value_col)), 6).alias("bucket_sum")
    )
    w = Window.partitionBy()
    tot = F.sum("bucket_sum").over(w)
    mn = F.min("bucket_sum").over(w)
    mx = F.max("bucket_sum").over(w)
    return (
        agg.withColumn(
            "pct_of_sum",
            F.round(F.col("bucket_sum") / tot * 100, 6),
        )
        .withColumn(
            "rescaled",
            F.round((F.col("bucket_sum") - mn) / (mx - mn), 6),
        )
        .orderBy("bucket_start")
    )


AUTO_HISTO_LADDER = [
    1, 5, 10, 30, 60, 300, 600, 1800, 3600, 10800, 43200,
    86400, 604800, 2592000, 31536000,
]


def auto_date_histogram(df: DataFrame, ts_col: str,
                        target_buckets: int = 20,
                        ladder: list[int] | None = None) -> DataFrame:
    """ES ``auto_date_histogram``: the bucket interval is chosen FROM
    THE DATA — the smallest ladder step whose aligned bucket count
    fits ``target_buckets`` (largest step if none fits).  Fixed-second
    ladder up to 1y (ES's calendar months approximated by 30d —
    documented deviation).  Returns ``(bucket_start, interval_s, n)``.

    Scale shape: one min/max agg produces a ONE-ROW bounds table; the
    interval choice is a chained conditional on that row
    (integer-exact ``div`` arithmetic, no float rounding at bucket
    edges), broadcast-cross-joined back; then one hash agg on the
    aligned bucket.  Two passes over the scan, no extra shuffle."""
    lad = list(ladder or AUTO_HISTO_LADDER)
    us_col = F.unix_micros(F.col(ts_col).cast("timestamp"))
    b = df.agg(F.min(us_col).alias("_mn"), F.max(us_col).alias("_mx"))
    chosen = F.lit(int(lad[-1]))
    for iv in reversed(lad[:-1]):
        ivu = int(iv) * 1_000_000
        nb = F.expr(f"(_mx div {ivu}) - (_mn div {ivu}) + 1")
        chosen = F.when(
            nb <= F.lit(int(target_buckets)), F.lit(int(iv))
        ).otherwise(chosen)
    bounds = b.select(chosen.alias("_iv"))
    out = df.crossJoin(F.broadcast(bounds))
    ivu_col = F.col("_iv").cast("long") * F.lit(1_000_000)
    bucket_us = us_col - (us_col % ivu_col)
    return (
        out.groupBy(
            F.timestamp_micros(bucket_us).alias("bucket_start"),
            F.col("_iv").alias("interval_s"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket_start")
    )


def bucket_pipeline(df: DataFrame, ts_col: str, duration: str,
                    value_col: str = "value",
                    key_col: str | None = None) -> DataFrame:
    """ES pipeline aggregations over a date-histogram parent: per
    tumbling ``duration`` bucket compute ``sum``/``count``, then the
    sibling pipeline metrics — ``cum_sum`` (ES ``cumulative_sum``),
    ``deriv`` (ES ``derivative``: this bucket's sum minus the
    previous bucket's), and ``avg_per_doc`` (ES ``bucket_script``
    ratio sum/count).  Reference parity: Elasticsearch pipeline aggs
    run over the PARENT histogram's bucket table, so the window here
    orders buckets, not events.

    Scale shape: one hash agg shrinks events to a bucket table
    (buckets = time-range / interval — bounded and tiny regardless of
    input rows), then the pipeline window runs over that bucket
    table: partitioned by ``key_col`` when given, else a single
    partition of bucket-count rows — never a window over raw
    events."""
    from pyspark.sql import Window

    agg = _bucket_table(df, ts_col, duration, value_col, key_col)
    w = (
        Window.partitionBy(key_col) if key_col else Window.partitionBy()
    ).orderBy("bucket_start")
    cum = Window.partitionBy(*([key_col] if key_col else [])).orderBy(
        "bucket_start"
    ).rowsBetween(Window.unboundedPreceding, 0)
    keys = [key_col] if key_col else []
    return (
        agg.withColumn("cum_sum", F.round(F.sum("bucket_sum").over(cum), 6))
        .withColumn(
            "deriv",
            F.round(
                F.col("bucket_sum") - F.lag("bucket_sum", 1).over(w), 6
            ),
        )
        .select(*keys, "bucket_start", "bucket_sum", "n", "cum_sum",
                "deriv", "avg_per_doc")
        .orderBy(*keys, "bucket_start")
    )


def _bucket_table(df: DataFrame, ts_col: str, duration: str,
                  value_col: str, key_col: str | None) -> DataFrame:
    """Shared parent date-histogram: one hash agg shrinking events to
    (key?, bucket_start, bucket_sum, n, avg_per_doc) — the bounded
    bucket table every ES pipeline agg here runs over."""
    bucket = F.window(F.col(ts_col).cast("timestamp"), duration)
    keys = ([F.col(key_col)] if key_col else []) + [
        bucket["start"].alias("bucket_start")
    ]
    return df.groupBy(*keys).agg(
        F.round(F.sum(F.col(value_col)), 6).alias("bucket_sum"),
        F.count(F.lit(1)).alias("n"),
    ).withColumn("avg_per_doc", F.round(F.col("bucket_sum") / F.col("n"), 6))


def bucket_sort(df: DataFrame, ts_col: str, duration: str,
                value_col: str = "value", key_col: str | None = None,
                sort_on: str = "bucket_sum", ascending: bool = False,
                size: int = 5, frm: int = 0) -> DataFrame:
    """ES ``bucket_sort`` pipeline aggregation: order the parent
    date-histogram's buckets by one of their own metrics
    (``bucket_sum`` / ``n`` / ``avg_per_doc``) and keep the
    ``[frm, frm+size)`` slice — "top busiest days", page 2 of bucket
    pages.  Ties break by bucket_start asc (and key asc) so the cut
    is deterministic.

    Scale shape: the sort + slice runs over the BUCKET table (rows =
    time-range / interval, bounded regardless of input size) — with
    ``frm == 0`` it is a TakeOrderedAndProject; with an offset the
    row_number window still only ever sees bucket rows, never
    events."""
    b = _bucket_table(df, ts_col, duration, value_col, key_col)
    order = [
        F.col(sort_on).asc() if ascending else F.col(sort_on).desc(),
        F.col("bucket_start").asc(),
    ] + ([F.col(key_col).asc()] if key_col else [])
    if frm <= 0:
        return b.orderBy(*order).limit(int(size))
    from pyspark.sql import Window

    w = Window.partitionBy().orderBy(*order)
    return (
        b.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > int(frm))
                & (F.col("_rn") <= int(frm) + int(size)))
        .drop("_rn")
    )


def bucket_selector(df: DataFrame, ts_col: str, duration: str,
                    having: str, value_col: str = "value",
                    key_col: str | None = None) -> DataFrame:
    """ES ``bucket_selector`` pipeline aggregation: drop parent
    histogram buckets failing a predicate over their OWN aggregates
    (``having`` is a SQL boolean over ``bucket_sum`` / ``n`` /
    ``avg_per_doc`` — the ES bucket_script-as-gate).  Monitoring
    shape: "only the hours whose error total exceeded X".

    Scale shape: one hash agg to the bounded bucket table, then a
    row filter on it — the predicate never touches raw events."""
    b = _bucket_table(df, ts_col, duration, value_col, key_col)
    return b.filter(F.expr(having)).orderBy(
        *([key_col] if key_col else []), "bucket_start"
    )


def rolling_agg(df: DataFrame, ts_col: str, key_col: str,
                value_col: str = "value", n: int = 5,
                order_cols: list[str] | None = None) -> DataFrame:
    """Per-key ROW-based rolling statistics over the last ``n``
    events (inclusive): mean / min / max — the ES ``moving_fn`` with
    a fixed window size, or pandas ``rolling(n)`` with
    ``min_periods=1``.  Adds ``roll_mean``, ``roll_min``,
    ``roll_max``.

    Scale shape: ONE shuffle on ``key_col``; ``rowsBetween(-(n-1),
    0)`` keeps a bounded n-row frame per key — streaming-friendly
    state, never whole-partition buffering."""
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(int(n) - 1), 0)
    )
    v = F.col(value_col)
    return (
        df.withColumn("roll_mean", F.round(F.avg(v).over(w), 6) + F.lit(0.0))
        .withColumn("roll_min", F.min(v).over(w))
        .withColumn("roll_max", F.max(v).over(w))
    )


def funnel(df: DataFrame, ts_col: str, key_col: str, type_col: str,
           steps: list[str]) -> DataFrame:
    """Ordered funnel: how many keys (users) reached each step, where
    step i counts only if it happened AT OR AFTER the key's earliest
    completion of step i-1 (the product-analytics funnel; each step's
    timestamp is the earliest valid one).  Returns ``(step, n_keys)``
    with steps in funnel order.

    Scale shape: one keyed min-agg per step, each over the
    type-filtered (pushed-down) slice of the events scan, chained by
    broadcast-friendly per-key joins — rows per join side = keys that
    survived the previous step, monotonically shrinking."""
    cur = None
    counts = []
    for i, s in enumerate(steps):
        step_rows = df.filter(F.col(type_col) == F.lit(s))
        if cur is not None:
            step_rows = step_rows.join(cur, key_col).filter(
                F.col(ts_col) >= F.col("_prev_ts")
            )
        cur = step_rows.groupBy(key_col).agg(
            F.min(ts_col).alias("_prev_ts")
        )
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("n_keys")).select(
                F.lit(i).alias("step_idx"), F.lit(s).alias("step"),
                "n_keys",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("step_idx")


def retention(df: DataFrame, ts_col: str, key_col: str,
              period: str = "week", max_periods: int = 8) -> DataFrame:
    """Cohort retention matrix: keys are cohorted by the period of
    their FIRST event; ``(cohort, period_n, n_active)`` counts how
    many of each cohort were active n periods later (period 0 = the
    cohort size).  ``period``: "day" or "week" (fixed 7-day weeks
    anchored like date_trunc).

    Scale shape: one keyed min-agg for the cohort assignment, one
    distinct over (cohort, period_n, key) — two shuffles total; the
    cohort table joins back broadcast-or-shuffle per AQE."""
    trunc = F.date_trunc(period, F.col(ts_col))
    firsts = df.groupBy(key_col).agg(
        F.min(trunc).alias("_cohort")
    )
    step_days = 7 if period == "week" else 1
    j = df.join(firsts, key_col).select(
        F.col("_cohort").alias("cohort"),
        (
            F.datediff(trunc, F.col("_cohort")) / F.lit(step_days)
        ).cast("long").alias("period_n"),
        F.col(key_col),
    ).filter(F.col("period_n") < int(max_periods))
    return (
        j.distinct()
        .groupBy("cohort", "period_n")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort", "period_n")
    )


def mad(df: DataFrame, key_col: str,
        value_col: str = "value") -> DataFrame:
    """(key, n, med, mad) — per-group median and median absolute
    deviation, the robust anomaly baseline (|x - med| > k*MAD flags
    outliers without the mean's sensitivity to the outliers
    themselves).  Exact linear-interpolation medians, reproducible
    across engines; the flagging predicate is a narrow comparison the
    caller composes.

    Plan shape: one exact-percentile hash agg for the medians, the
    per-key median row (one row per key) joined back — AQE broadcasts
    it — then a second percentile agg over the deviations.  Two
    shuffles total, both keyed on ``key_col``.  At 100 TB swap
    ``percentile`` for ``percentile_approx`` — same call-site
    shape."""
    med = df.groupBy(key_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("_med")
    )
    dev = df.join(med, key_col).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    return (
        dev.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("_med"), 6).alias("med"),
            F.round(F.percentile(F.col("_adev"), F.lit(0.5)), 6).alias("mad"),
        )
        .orderBy(key_col)
    )


def percentile_ranks(df: DataFrame, key_col: str,
                     value_col: str = "value",
                     values: tuple = (0.0, 50.0, 100.0)) -> DataFrame:
    """(key, n, pr_<v>...) — the ES ``percentile_ranks`` aggregation:
    for each probe value, the percentage of the group's observations
    at or below it (the CDF evaluated at the probes — the inverse of
    the percentiles agg).  ONE hash agg of conditional means; exact,
    reproducible, map-side combined — never a sort."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for v in values:
        name = "pr_" + str(v).replace(".", "_").replace("-", "m")
        aggs.append(
            F.round(
                F.avg(
                    (F.col(value_col) <= F.lit(float(v))).cast("double")
                ) * 100.0,
                6,
            ).alias(name)
        )
    return df.groupBy(key_col).agg(*aggs).orderBy(key_col)


def distinct_cardinality(df: DataFrame, key_col: str,
                         value_col: str) -> DataFrame:
    """(key, n_events, n_distinct) — exact per-group distinct count
    (the ES cardinality agg, exact rather than HLL: reproducible).
    One hash agg; Spark expands countDistinct into a two-phase
    partial-distinct plan automatically.  At 100 TB swap in
    ``approx_count_distinct`` — same call-site shape."""
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(value_col).alias("n_distinct"),
        )
        .orderBy(key_col)
    )


def top_hits(df: DataFrame, key_col: str, n: int,
             order_col: str = "value",
             id_col: str = "event_id") -> DataFrame:
    """(key, id, value, rank) — the n best rows per group by
    ``order_col`` desc (the ES top_hits agg inside a terms agg).
    One shuffle on the group key; rank window ties break id-asc
    (total order, engine-independent)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(key_col, id_col, order_col, "rank")
        .orderBy(key_col, "rank")
    )


def rate(df: DataFrame, ts_col: str, key_col: str,
         value_col: str = "value",
         order_cols: list[str] | None = None) -> DataFrame:
    """Per-key discrete derivative between consecutive events: delta
    = value - lag(value), rate = delta / seconds elapsed (the
    PromQL-style derivative of a gauge; telemetry's second most
    common transform after the running sum).  The first event of
    each key has NULL delta/rate; zero-elapsed pairs (duplicate
    timestamps) yield NULL rate rather than inf.

    Scale shape: ONE shuffle on ``key_col``, lag windows stream each
    key's partition in time order — state is two rows deep, no
    whole-partition buffering.  ``order_cols`` appends tie-breaks
    for deterministic ordering under duplicate timestamps."""
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_v = F.lag(value_col).over(w)
    # microsecond-exact fractional seconds (unix_timestamp truncates;
    # NTZ won't cast to double — go through unix_micros, tz-invariant
    # for differences)
    sec = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6)
    elapsed = sec - F.lag(sec).over(w)
    delta = F.col(value_col) - prev_v
    # + 0.0 collapses IEEE -0.0 to +0.0 (engines disagree on the
    # sign of a rounded-to-zero result; the value hash must not)
    return df.withColumn("delta", F.round(delta, 6) + F.lit(0.0)).withColumn(
        "rate_per_s",
        F.round(F.when(elapsed > 0, delta / elapsed), 6) + F.lit(0.0),
    )


def change_point(df: DataFrame, ts_col: str, duration: str,
                 value_col: str = "value") -> DataFrame:
    """ES ``change_point`` aggregation, deterministic level-shift
    variant: over the tumbling-``duration`` bucket sums, the split
    bucket that maximizes |mean(before) - mean(after)| (ES's
    step-change detector without the p-value machinery — the argmax
    is the same).  One row ``(bucket_start, before_mean, after_mean,
    delta)``; the split bucket starts the AFTER side, and both sides
    must be non-empty.

    Scale shape: one hash agg shrinks events to the bounded bucket
    table; the split scan is two cumulative windows over THAT table
    (bucket-count rows), then one argmax via TakeOrdered(1)."""
    from pyspark.sql import Window

    bucket = F.window(F.col(ts_col).cast("timestamp"), duration)
    agg = df.groupBy(bucket["start"].alias("bucket_start")).agg(
        F.round(F.sum(F.col(value_col)), 6).alias("bucket_sum")
    )
    w = Window.partitionBy().orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = Window.partitionBy()
    cand = (
        agg.withColumn("_nb", F.count(F.lit(1)).over(w))
        .withColumn("_sb", F.sum("bucket_sum").over(w))
        .withColumn("_n", F.count(F.lit(1)).over(tot))
        .withColumn("_s", F.sum("bucket_sum").over(tot))
        .filter(F.col("_nb") >= 1)
        .filter(F.col("_n") - F.col("_nb") >= 1)
    )
    before = F.col("_sb") / F.col("_nb")
    after = (F.col("_s") - F.col("_sb")) / (F.col("_n") - F.col("_nb"))
    out = cand.select(
        "bucket_start",
        F.round(before, 6).alias("before_mean"),
        F.round(after, 6).alias("after_mean"),
        F.round(F.abs(after - before), 6).alias("delta"),
    )
    return out.orderBy(F.desc("delta"), F.asc("bucket_start")).limit(1)


def weighted_avg(df: DataFrame, key_col: str, value_col: str,
                 weight_col: str) -> DataFrame:
    """ES ``weighted_avg`` aggregation per group: Σ(v·w)/Σw, NULL
    weights treated as 0 contribution (row skipped), matching ES's
    missing-value skip.  ONE keyed hash agg; sums rounded to 6dp
    before the division (engine-agreement discipline)."""
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    agg = (
        df.filter(v.isNotNull() & w.isNotNull())
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(v * w), 6).alias("_vw"),
            F.round(F.sum(w), 6).alias("_w"),
        )
    )
    return agg.select(
        key_col, "n",
        F.round(F.col("_vw") / F.col("_w"), 6).alias("wavg"),
    ).orderBy(key_col)


def serial_diff(df: DataFrame, ts_col: str, duration: str,
                value_col: str = "value", lag: int = 7) -> DataFrame:
    """ES ``serial_diff`` pipeline aggregation: the bucket metric
    minus its value ``lag`` buckets earlier (seasonal differencing —
    lag 7 on daily buckets removes the weekly cycle).  NULL for the
    first ``lag`` buckets, like ES.

    Scale shape: one hash agg to the bounded bucket table; the lag
    window runs over bucket-count rows only."""
    from pyspark.sql import Window

    bucket = F.window(F.col(ts_col).cast("timestamp"), duration)
    agg = df.groupBy(bucket["start"].alias("bucket_start")).agg(
        F.round(F.sum(F.col(value_col)), 6).alias("bucket_sum")
    )
    w = Window.partitionBy().orderBy("bucket_start")
    return (
        agg.withColumn(
            "sdiff",
            F.round(
                F.col("bucket_sum") - F.lag("bucket_sum", int(lag)).over(w),
                6,
            ),
        )
        .orderBy("bucket_start")
    )


def cumulative_cardinality(df: DataFrame, ts_col: str, duration: str,
                           key_col: str = "user_id") -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline aggregation (exact):
    per tumbling bucket, the number of DISTINCT ``key_col`` values
    seen in that bucket or any earlier one — the "total unique users
    so far" curve.  Exact identity: a key's first-seen bucket is
    where it increments the curve, so cumulative cardinality =
    running sum of first-seen counts.

    Scale shape: one min-agg per key (hash agg, map-side combine) +
    one bucket-count hash agg + a running sum over the bounded
    bucket axis — never a distinct-per-prefix blowup."""
    from pyspark.sql import Window

    bucket = F.window(F.col(ts_col).cast("timestamp"), duration)[
        "start"
    ]
    first_seen = df.groupBy(key_col).agg(
        F.min(bucket).alias("bucket_start")
    )
    per_bucket = first_seen.groupBy("bucket_start").agg(
        F.count(F.lit(1)).alias("new_keys")
    )
    # every histogram bucket that has events appears (ES emits the
    # full parent histogram), with new_keys=0 where nothing is new
    axis = df.groupBy(bucket.alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("_n")
    ).select("bucket_start")
    w = Window.partitionBy().orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        axis.join(per_bucket, "bucket_start", "left")
        .withColumn("new_keys", F.coalesce(F.col("new_keys"), F.lit(0)))
        .withColumn("cum_distinct", F.sum("new_keys").over(w))
        .orderBy("bucket_start")
    )


def activity_heatmap(df: DataFrame, ts_col: str,
                     value_col: str = "value") -> DataFrame:
    """(dow, hour, n, avg_value) — the day-of-week × hour-of-day
    activity matrix (the Kibana/Grafana heatmap panel).  ``dow``:
    0 = Sunday … 6 = Saturday (both engines normalized to the same
    convention).  ONE hash agg on a 168-key space — map-side combine
    collapses each partition before the shuffle."""
    ts = F.col(ts_col).cast("timestamp")
    return (
        df.groupBy(
            (F.dayofweek(ts) - F.lit(1)).alias("dow"),
            F.hour(ts).alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col(value_col)), 6).alias("avg_value"),
        )
        .orderBy("dow", "hour")
    )


def downsample_store(df: DataFrame, out_dir: str, ts_col: str,
                     duration: str = "1 hour",
                     value_col: str = "value") -> dict:
    """TSDB downsampling (ES rollup / downsample API): persist the
    fine-grained bucket aggregates ``(bucket_start, n, vsum, vmin,
    vmax)`` so coarser queries never touch raw events again.  The
    stored moments are exactly the re-aggregable set — count/sum/
    min/max compose associatively, and avg is DERIVED (sum/count) so
    rollup-of-rollup is lossless.

    Scale shape: one hash agg + a date-partitioned write (daily
    directories -> time-range queries prune files)."""
    import json as _json
    from pathlib import Path as _Path

    bucket = F.window(F.col(ts_col).cast("timestamp"), duration)
    agg = df.groupBy(bucket["start"].alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col(value_col)), 6).alias("vsum"),
        F.min(F.col(value_col)).alias("vmin"),
        F.max(F.col(value_col)).alias("vmax"),
    ).withColumn("day", F.to_date("bucket_start"))
    agg.write.mode("overwrite").partitionBy("day").parquet(out_dir)
    meta = {"kind": "rollup", "duration": duration,
            "ts_col": ts_col, "value_col": value_col}
    (_Path(out_dir) / "_meta.json").write_text(_json.dumps(meta))
    return meta


def rollup_query(spark, store_dir: str,
                 duration: str = "1 day") -> DataFrame:
    """(bucket_start, n, vsum, vavg, vmin, vmax) at a COARSER
    ``duration``, re-aggregated from the downsample store — the
    rollup-aware search path (ES _rollup_search): count/sum/min/max
    fold associatively, avg derives from the folded sums, and no raw
    event is read.

    Scale shape: one scan of the (already tiny) rollup table + one
    hash agg on the coarser bucket."""
    bucket = F.window(F.col("bucket_start"), duration)
    agg = (
        spark.read.parquet(store_dir)
        .groupBy(bucket["start"].alias("bucket_start"))
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("vsum"), 6).alias("vsum"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
    return agg.select(
        "bucket_start", "n", "vsum",
        F.round(F.col("vsum") / F.col("n"), 6).alias("vavg"),
        "vmin", "vmax",
    ).orderBy("bucket_start")


def stats_bucket(df: DataFrame, ts_col: str, duration: str,
                 value_col: str = "value") -> DataFrame:
    """ES sibling pipeline aggregations over a date-histogram parent
    — ``stats_bucket`` + keyed ``max_bucket``/``min_bucket`` in one
    row: (n_buckets, bucket_avg, bucket_sum_total, min_bucket_key,
    min_bucket_sum, max_bucket_key, max_bucket_sum).  The keyed
    extremes use ``min_by``/``max_by`` with (metric, bucket) structs
    so ties break on the earliest bucket, deterministically.

    Scale shape: one hash agg to the bounded bucket table, then ONE
    global aggregate over bucket-count rows."""
    bucket = F.window(F.col(ts_col).cast("timestamp"), duration)
    agg = df.groupBy(bucket["start"].alias("bucket_start")).agg(
        F.round(F.sum(F.col(value_col)), 6).alias("bucket_sum")
    )
    us = F.unix_micros(F.col("bucket_start"))
    # min side: (sum, +time) -> min sum, tie -> earliest bucket;
    # max side: (sum, -time) -> max sum, tie -> earliest bucket too
    tmin = F.struct(F.col("bucket_sum"), us)
    tmax = F.struct(F.col("bucket_sum"), (-us))
    return agg.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(F.avg("bucket_sum"), 6).alias("bucket_avg"),
        F.round(F.sum("bucket_sum"), 6).alias("bucket_sum_total"),
        F.min_by("bucket_start", tmin).alias("min_bucket_key"),
        F.min("bucket_sum").alias("min_bucket_sum"),
        F.max_by("bucket_start", tmax).alias("max_bucket_key"),
        F.max("bucket_sum").alias("max_bucket_sum"),
    )


def transition_matrix(df: DataFrame, ts_col: str, key_col: str,
                      type_col: str,
                      order_cols: list[str] | None = None) -> DataFrame:
    """(from_type, to_type, n, prob) — the event-type Markov
    transition matrix over per-key event sequences (the product-
    analytics journey/Sankey source): consecutive-event pairs within
    each key in (ts, order_cols) order, counted and normalized per
    source type.  ``prob`` rounds to 6dp from integer counts, so the
    two engines agree exactly.

    Scale shape: ONE shuffle on ``key_col`` for the lag window (a
    two-row frame), one pair hash agg (type-alphabet-squared keys),
    and the per-source totals come from a window over THAT tiny
    table."""
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return (
        pairs.withColumn(
            "prob",
            F.round(
                F.col("n").cast("double") / F.sum("n").over(tot), 6
            ),
        )
        .orderBy("from_type", "to_type")
    )


def eql_sequence(df: DataFrame, ts_col: str, key_col: str,
                 type_col: str, steps: list[str],
                 maxspan_minutes: int = 60) -> DataFrame:
    """ES EQL ``sequence by <key> [s1] [s2] … with maxspan=Nm`` —
    keys whose earliest ordered completion chain of ``steps`` fits
    inside ``maxspan``: (key, t0, t_last, span_s) per matching key.

    Semantics note (documented simplification vs EQL's sliding
    matcher): the chain is EARLIEST-ANCHORED — step 1's earliest
    occurrence anchors the match, and each later step takes its
    earliest occurrence at-or-after the previous step (the
    :func:`funnel` chain); the key matches iff that canonical
    chain's total span fits.  Deterministic and oracle-checkable;
    a key whose only fitting chain starts at a LATER step-1 event
    does not match.

    Scale shape: the funnel's chained keyed min-aggs (shrinking
    broadcast-friendly joins), one final span filter — never a
    per-event sequence scan."""
    cur = None
    t0 = None
    for i, s in enumerate(steps):
        step_rows = df.filter(F.col(type_col) == F.lit(s))
        if cur is not None:
            step_rows = step_rows.join(cur, key_col).filter(
                F.col(ts_col) >= F.col("_prev_ts")
            )
        agg_cols = [F.min(ts_col).alias("_prev_ts")]
        if i > 0:
            agg_cols.append(F.min("_t0").alias("_t0"))
        cur = step_rows.groupBy(key_col).agg(*agg_cols)
        if i == 0:
            cur = cur.withColumn("_t0", F.col("_prev_ts"))
    span = (
        F.unix_micros(F.col("_prev_ts").cast("timestamp"))
        - F.unix_micros(F.col("_t0").cast("timestamp"))
    ) / F.lit(1_000_000.0)
    return (
        cur.withColumn("span_s", F.round(span, 6))
        .filter(F.col("span_s") <= float(maxspan_minutes) * 60.0)
        .select(
            key_col,
            F.col("_t0").alias("t0"),
            F.col("_prev_ts").alias("t_last"),
            "span_s",
        )
        .orderBy(key_col)
    )
