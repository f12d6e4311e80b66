"""Deterministic sampling / split operators for training-data
pipelines: reproducible train/val/test splits, rate-based stratified
sampling, and per-group quota selection (source mixing).

Why not ``df.sample()``: Spark's sampler is seed-stable only for a
fixed partitioning — repartition the input (or rerun at a different
parallelism) and the sampled set changes.  Training pipelines need
the membership of every row to be a pure function of the ROW, so the
split survives re-partitioning, incremental re-runs, and engine
changes.  Everything here keys off the first 8 hex digits of
``md5(salt || key)`` — the repo-wide oracle-checkable hash convention
(same trick as :mod:`katta_spark.ops.dedup`), bit-identical in Spark
and DuckDB.

Scale shape: :func:`hash_split` and :func:`stratified_sample` are
pure map stages — zero shuffle at any corpus size.  :func:`top_n_per_group`
is one hash shuffle on the group key, with an optional salted
pre-filter pass for skewed groups (a 10^9-row group never hits one
reducer's sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket space for split/sample decisions — weights resolve to
#: integer bucket boundaries, so engines agree exactly
N_BUCKETS = 10_000

DEFAULT_WEIGHTS: dict[str, float] = {"train": 0.9, "val": 0.05, "test": 0.05}


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, N_BUCKETS): first 32 bits of
    md5(salt || key) mod N_BUCKETS.  JVM-side (md5/conv/pmod), no
    Python; DuckDB mirror:
    ``CAST(concat('0x', substr(md5(salt || key), 1, 8)) AS BIGINT) % 10000``.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(N_BUCKETS))


def split_boundaries(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket) per split, cumulative in dict
    order; the last split absorbs rounding remainders."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out: list[tuple[str, int]] = []
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        out.append((name, round(acc * N_BUCKETS)))
    out[-1] = (out[-1][0], N_BUCKETS)
    return out


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Append a ``split`` column assigning every row to a named split
    by deterministic hash bucket.  Membership is a pure function of
    (salt, key) — stable across partitionings, reruns, engines, and
    incremental appends (a new row never moves an old row's split).

    Narrow, zero shuffle.  ``salt`` derives independent splits from
    the same keys (e.g. per-epoch held-out rotation).
    """
    b = hash_bucket(F.col(key_col), salt)
    expr = None
    for name, hi in split_boundaries(weights or DEFAULT_WEIGHTS):
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows whose hash bucket
    falls under ``rate * N_BUCKETS``.  Because the bucket is uniform
    per key, the rate holds within every stratum of any column that
    is independent of the key hash — one sampler serves all strata
    (no per-stratum pass).  Narrow, zero shuffle, reproducible."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(hash_bucket(F.col(key_col), salt) < int(round(rate * N_BUCKETS)))


def top_n_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_by: list[Column],
    prefilter_salt: int = 0,
) -> DataFrame:
    """Per-group quota selection (source mixing: "best n docs per
    source"): rank rows inside each group by ``order_by`` (caller
    must make it a TOTAL order — include a unique key as the last
    tie-break) and keep ranks 1..n as column ``rank``.

    One hash shuffle on ``group_col``.  For skewed groups set
    ``prefilter_salt=s``: a first window over (group, bucket%s) cuts
    each group to at most s*n survivors BEFORE the global per-group
    window, so no single reducer ever sorts a whole 10^9-row group —
    the classic salted two-phase top-k, exact because per-group rank
    order is preserved by the salted prefilter."""
    if prefilter_salt > 1:
        s = F.pmod(F.xxhash64(*df.columns), F.lit(prefilter_salt))
        w1 = Window.partitionBy(F.col(group_col), s).orderBy(*order_by)
        df = (
            df.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= n)
            .drop("_rn1")
        )
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= n)


def temperature_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.7,
    target_total: int | None = None,
) -> DataFrame:
    """(grp, n_docs, q, rate, bucket_thr) — temperature-resampled
    source-mixing rates (the multilingual-training recipe: sampling
    probability q_s ∝ n_s^alpha flattens the source distribution as
    alpha -> 0).  ``rate`` is the per-doc inclusion rate that yields
    an expected ``target_total`` draws (default: the corpus size),
    capped at 1 (this operator downsamples; upsampling is an epoch
    concern).  ``bucket_thr`` resolves the rate to an integer bucket
    threshold so membership is engine-exact.

    One groupBy on the group key + a one-row broadcast — the corpus
    itself is never shuffled."""
    counts = df.groupBy(F.col(group_col).cast("string").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = counts.agg(
        F.sum("n_docs").alias("_n_total"),
        F.sum(F.pow("n_docs", F.lit(alpha))).alias("_z"),
    )
    q = F.pow("n_docs", F.lit(alpha)) / F.col("_z")
    t = F.lit(target_total).cast("double") if target_total else F.col(
        "_n_total").cast("double")
    rate = F.least(F.lit(1.0), q * t / F.col("n_docs"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "n_docs",
            F.round(q, 6).alias("q"),
            F.round(rate, 6).alias("rate"),
            F.round(rate * N_BUCKETS, 0).cast("long").alias("bucket_thr"),
        )
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.7,
    target_total: int | None = None,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature-mixed subsample: keeps the rows whose
    hash bucket falls under their group's :func:`temperature_rates`
    threshold.  Membership is a pure function of (salt, key, group
    counts) — rerun/partition invariant.  One small broadcast join."""
    rates = temperature_rates(df, group_col, alpha, target_total).select(
        F.col("grp").alias("_tkey"), F.col("bucket_thr").alias("_thr")
    )
    return (
        df.withColumn("_grp", F.col(group_col).cast("string"))
        .join(F.broadcast(rates), F.col("_grp") == F.col("_tkey"))
        .filter(hash_bucket(F.col(key_col), salt) < F.col("_thr"))
        .drop("_grp", "_tkey", "_thr")
    )


def source_report(
    docs: DataFrame,
    group_col: str = "source",
    lang_col: str = "lang",
    size_col: str = "n_chars",
) -> DataFrame:
    """(source, n_docs, total_chars, n_langs, top_lang) — the source
    mixing budget report every curation pipeline keeps in front of the
    temperature/quota knobs (:func:`temperature_rates`,
    :func:`top_n_per_group`).

    ONE hash agg keyed on the (source, lang) pair does all the work;
    the totals roll up and the dominant language ranks over the
    aggregated pair counts (cardinality |sources| x |langs| — tiny),
    so the corpus is scanned exactly once.  Ties break lang-asc."""
    from pyspark.sql import Window

    pairs = docs.groupBy(group_col, lang_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(size_col).cast("long")).alias("_chars"),
    )
    totals = pairs.groupBy(group_col).agg(
        F.sum("_n").alias("n_docs"),
        F.sum("_chars").alias("total_chars"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("_n"), F.asc(lang_col)
    )
    top = (
        pairs.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(group_col, F.col(lang_col).alias("top_lang"))
    )
    return totals.join(top, group_col).orderBy(group_col)


def rollup_report(
    docs: DataFrame,
    cols: list[str],
    size_col: str = "n_chars",
    all_label: str = "(all)",
) -> DataFrame:
    """Hierarchical corpus totals with subtotals at every prefix level
    (lang, source, ...) -> (lang, (all)) -> ((all), (all)): the
    GROUP BY ROLLUP report a curation pipeline prints before choosing
    mixing weights.  Spark's native ``rollup`` computes every level in
    ONE pass with partial (map-side) aggregation — never one job per
    level.  Subtotal positions are labelled ``all_label`` via
    ``F.grouping`` so they can't be confused with genuine NULL keys."""
    agg = docs.rollup(*cols).agg(
        *[F.grouping(c).alias(f"_g_{c}") for c in cols],
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(size_col).cast("long")).alias("total_chars"),
    )
    sel = [
        F.when(F.col(f"_g_{c}") == 1, F.lit(all_label))
        .otherwise(F.col(c)).alias(c)
        for c in cols
    ]
    return agg.select(*sel, "n_docs", "total_chars").orderBy(*cols)


def composite_page(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    after: tuple | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """One page of an ES composite aggregation: paginate a grouped
    aggregation by KEYSET (``after`` = the last key tuple of the
    previous page), never by offset.  Returns the next ``n`` groups in
    key order with ``n_rows`` (+ ``sum_value`` when ``value_col``).

    Scale shape: the keyset predicate is applied to the RAW rows
    BEFORE the aggregation — group keys partition rows, so
    ``(k1,k2) > after`` drops already-paged groups pre-shuffle and
    deep pages get cheaper, not costlier (offset pagination re-aggs
    and discards).  One hash agg + TakeOrdered per page; the tuple
    compare is decomposed into simple column predicates that reach
    the parquet scan as pushed DataFilters."""
    out = df
    if after is not None:
        # lexicographic (k1,k2,..) > after, decomposed into an
        # OR-of-ANDs over simple column comparisons — unlike a struct
        # compare, these push down to the parquet scan as DataFilters
        # (plan-pinned in tests), so already-paged groups are skipped
        # at the file-read level, not just pre-shuffle
        lits = [
            F.lit(v).cast(df.schema[c].dataType)
            for c, v in zip(key_cols, after)
        ]
        cond = None
        for i in range(len(key_cols)):
            branch = F.col(key_cols[i]) > lits[i]
            for j in range(i):
                branch = (F.col(key_cols[j]) == lits[j]) & branch
            cond = branch if cond is None else cond | branch
        out = out.filter(cond)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if value_col:
        aggs.append(
            (F.round(F.sum(value_col), 6) + F.lit(0.0)).alias("sum_value")
        )
    return (
        out.groupBy(*key_cols).agg(*aggs)
        .orderBy(*[F.col(c).asc() for c in key_cols]).limit(n)
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, the A-ES one-pass reduction): each
    row draws u = hash-uniform(0,1) from md5(salt || key) and keeps
    priority ``-ln(u) / w``; the global n smallest priorities are the
    sample.  Inclusion probability is proportional to weight, and the
    draw is a pure function of (salt, key) — partition/rerun/engine
    invariant, unlike ``rand()``.

    Plan: narrow priority computation + TakeOrderedAndProject (per-
    partition top-n, then a tiny merge) — no global sort of the
    corpus.  Rows with non-positive weight are excluded (never
    sampled), matching the A-ES domain.  Returns the sampled rows
    with their priority as ``es_key`` (rounded; ties break key-asc)."""
    # u in (0, 1]: (h32 + 1) / 2^32 over the first 32 md5 bits
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967296.0)
    pri = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("es_key", F.round(pri, 6))
        .orderBy(F.asc("es_key"), F.asc(key_col))
        .limit(n)
    )


def frequent_item_sets(df: DataFrame, basket_col: str, item_col: str,
                       min_support: int = 2, n: int = 20) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation (market-basket mining),
    bounded to sizes 1 and 2 — the sizes ES mines eagerly before its
    ECLAT recursion: ``(items, support)`` for every single item and
    every unordered item PAIR co-occurring in at least
    ``min_support`` baskets, top-``n`` by support desc / items asc.

    Scale shape: one distinct projection (basket, item), a keyed
    self-join on the basket id for pairs — the join fan-out is
    items-per-basket squared, bounded by basket width, never corpus
    width — then one hash agg per size.  No FP-tree state; at 100 TB
    the basket-keyed shuffle is the only big movement."""
    b, i = F.col(basket_col).cast("string"), F.col(item_col).cast("string")
    bi = df.select(b.alias("_b"), i.alias("_i")).distinct()
    singles = (
        bi.groupBy("_i").agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= int(min_support))
        .select(F.array("_i").alias("items"), "support")
    )
    l, r = bi.alias("l"), bi.alias("r")
    pairs = (
        l.join(r, F.col("l._b") == F.col("r._b"))
        .filter(F.col("l._i") < F.col("r._i"))
        .groupBy(F.col("l._i").alias("_a"), F.col("r._i").alias("_c"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= int(min_support))
        .select(F.array("_a", "_c").alias("items"), "support")
    )
    return (
        singles.unionByName(pairs)
        .orderBy(F.desc("support"), F.asc("items"))
        .limit(int(n))
    )


def leakage_safe_split(docs: DataFrame, clusters: DataFrame,
                       id_col: str = "doc_id",
                       test_pct: int = 10,
                       salt: str = "split") -> DataFrame:
    """(id, cluster_rep, split) — near-dup-aware train/test split:
    the split decision is made per DUPLICATE CLUSTER, not per
    document, so near-duplicates never straddle train and test (the
    leakage that silently inflates eval scores; the reason The
    Stack / Dolma splits deduplicate before splitting).

    ``clusters`` is :func:`katta_spark.ops.dedup.dup_clusters` output
    (doc_id, cluster); docs absent from it are singleton clusters of
    themselves.  The bucket is :func:`hash_bucket` of the cluster
    representative — the repo's ONE deterministic, partition-stable
    split device — so membership is reproducible on any layout.

    Scale shape: one left join onto the (small) cluster map + narrow
    hash arithmetic; no shuffle beyond the join."""
    c = clusters.select(
        F.col("doc_id").alias(id_col), F.col("cluster")
    )
    joined = docs.select(id_col).join(c, id_col, "left")
    rep = F.coalesce(F.col("cluster"), F.col(id_col))
    bucket = hash_bucket(rep, salt=salt)
    cut = int(test_pct) * N_BUCKETS // 100
    return joined.select(
        id_col,
        rep.alias("cluster_rep"),
        F.when(bucket < cut, F.lit("test"))
        .otherwise(F.lit("train")).alias("split"),
    )


def _dist_rank(df: DataFrame, sort_cols: list[str], rank_col: str,
               group_col: str | None = None,
               num_parts: int | None = None) -> DataFrame:
    """1-based dense row_number over the TOTAL order ``sort_cols``
    (globally, or within each ``group_col`` value) WITHOUT a
    single-partition window — the distributed zipWithIndex shape:

    1. ``repartitionByRange(sort_cols)`` + ``sortWithinPartitions``
       — partition ids ordered the same as the sort key, each
       partition ~|df|/P rows (range boundaries from Spark's sample).
    2. one tiny aggregate: rows per (partition[, group]) — P (or
       P x n_groups) rows collected to the driver.
    3. cumulative offsets per group broadcast back; a narrow
       ``mapInPandas`` adds offset + partition-local running index.

    The result is a pure function of the sort key (``sort_cols``
    must be a total order — include a unique id last), so it is
    identical at ANY parallelism / partition-boundary placement —
    the determinism contract mixture_order exists for.  Nothing in
    the plan sorts more than one partition's worth of rows; the
    sorted intermediate is persisted so the count pass and the rank
    pass share one range shuffle (a few slim columns per row).

    ``group_col`` values must be non-null (ranks restart per
    contiguous group run; the caller filters nulls)."""
    import numpy as np
    from pyspark import StorageLevel

    spark = df.sparkSession
    p = int(num_parts or spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        df.repartitionByRange(p, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    gcols = [group_col] if group_col else []
    per_g: dict[object, list[tuple[int, int]]] = {}
    for r in d.groupBy("_pid", *gcols).count().collect():
        g = r[group_col] if group_col else None
        per_g.setdefault(g, []).append((int(r["_pid"]), int(r["count"])))
    offsets: dict[tuple[int, object], int] = {}
    for g, lst in per_g.items():
        lst.sort()
        acc = 0
        for pid, c in lst:
            offsets[(pid, g)] = acc
            acc += c
    boff = spark.sparkContext.broadcast(offsets)
    gname = group_col
    # fresh StructType — .add() would mutate d's cached schema
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(d.schema.fields) + [T.StructField(rank_col, T.LongType())]
    )

    def add_rank(batches):
        nxt = None          # next 1-based rank to assign
        cur_g = None        # current group run (grouped mode)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            if gname is None:
                if nxt is None:
                    nxt = boff.value.get((pid, None), 0) + 1
                ranks = np.arange(nxt, nxt + n, dtype="int64")
                nxt += n
            else:
                gv = pdf[gname].to_numpy()
                cuts = np.flatnonzero(gv[1:] != gv[:-1]) + 1
                starts = np.concatenate(([0], cuts))
                ends = np.concatenate((cuts, [n]))
                ranks = np.empty(n, dtype="int64")
                for s, e in zip(starts, ends):
                    g = gv[s]
                    if nxt is None or g != cur_g:
                        cur_g = g
                        nxt = boff.value.get((pid, g), 0) + 1
                    ranks[s:e] = np.arange(nxt, nxt + (e - s))
                    nxt += e - s
            yield pdf.assign(**{rank_col: ranks})

    out = d.mapInPandas(add_rank, schema=out_schema).drop("_pid")
    # the persisted intermediate rides along so callers chaining two
    # ranks (mixture_order) can release the earlier stage's cache
    # once the later stage has materialized its own
    out._katta_cache = d
    return out


def mixture_order(docs: DataFrame, weights: dict[str, float],
                  group_col: str = "source",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, grp, pos) — a DETERMINISTIC interleaved training
    order over a multi-source corpus: source ``g``'s i-th document
    (in hash-shuffled order, the shared hash_bucket device) lands at
    key ``(i + 1) / weight[g]``, so after the global sort sources
    interleave in proportion to their weights (weight 2x => docs
    appear 2x as often per unit of stream) — the data-mixing order a
    training run replays identically from any checkpoint.  Sources
    missing from ``weights`` are dropped (weight 0).

    Scale shape (round 4): NO single-partition window anywhere —
    both ranks go through :func:`_dist_rank` (range-partitioned
    sort + broadcast cumulative offsets + partition-local running
    index).  The old plan put the whole corpus through one
    ``Window.partitionBy()`` (global) and one partition PER SOURCE
    (a handful of huge partitions at 100 TB); now nothing sorts
    more than one range-partition's worth of rows, and the output
    is bit-identical at any parallelism (tested at 2 vs 17
    partitions).

    The returned frame carries ONE cached slim projection (~30 B/row)
    for cheap reuse; release it with ``result.katta_cache.unpersist()``
    once the order is materialized (long-lived drivers calling this
    repeatedly should always release)."""
    wmap = F.create_map(*[
        F.lit(x) for kv in weights.items() for x in (kv[0], float(kv[1]))
    ])
    slim = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(group_col).cast("string").alias("grp"),
    ).withColumn("_w", wmap[F.col("grp")]).filter(
        F.col("_w").isNotNull() & (F.col("_w") > 0)
    )
    shuffled = slim.withColumn(
        "_h", hash_bucket(F.col("doc_id"), salt="mix")
    )
    r1 = _dist_rank(shuffled, ["grp", "_h", "doc_id"], "_r",
                    group_col="grp")
    keyed = r1.withColumn(
        "_key", F.col("_r").cast("double") / F.col("_w")
    ).select("doc_id", "grp", "_key")
    r2 = _dist_rank(keyed, ["_key", "grp", "doc_id"], "pos")
    # stage 2's own persisted intermediate is materialized (its count
    # pass ran inside _dist_rank), so stage 1's cache is no longer on
    # the serving path — release it.  A later eviction of stage 2's
    # cache recomputes from source through the same partitioner
    # instance (range bounds are fixed at plan time), so results
    # cannot drift.  NOTE: mixture_order is EAGER (two tiny count
    # jobs run at construction) and the returned frame holds ONE
    # cached slim projection (~30 B/row) for reuse.
    r1._katta_cache.unpersist()
    out = r2.select("doc_id", "grp", "pos")
    # PUBLIC release handle (documented): long-lived drivers calling
    # mixture_order repeatedly should unpersist() this once they have
    # materialized/written the order, or the ~30 B/row MEMORY_AND_DISK
    # caches accumulate for the session.  Re-reading the frame after
    # release recomputes through the same fixed range partitioner, so
    # results cannot drift.
    out.katta_cache = r2._katta_cache
    return out
