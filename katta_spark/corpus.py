"""Corpus substrate: the source-code table the engine indexes.

Input shape (BASELINE.json input_hint): ``(repo string, path string,
commit string, lang string, content string)`` plus engine-derived
``doc_id``, ``content_sha256``, ``doc_len``.

Two providers:

- :func:`synthetic_corpus` — a deterministic, seed-free (pure
  arithmetic) generator of code-like rows, built entirely from Spark
  expressions over ``spark.range`` so it scales to any size without
  driver-side materialization.  Mirrors the reference's sample index
  generator (katta-core/.../tool/SampleIndexGenerator.java, CLI
  ``generateIndex`` at katta-client/.../Katta.java:1057-1074) but
  with the FIXTURES.md §1 skew + needle properties.
- :func:`corpus_from_documents` — maps the driver's
  ``documents.parquet`` table onto the corpus shape so every engine
  operator can be oracle-checked against DuckDB over the same file.

The per-row ingest invariant is ``content_sha256 = sha2(content,256)``
— the analogue of Katta's ``index.done`` integrity marker
(katta-hadoop/.../LuceneOutputWriter.java:298-303), enforced per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "python", "java", "go", "js", "rust", "c"]
EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs", "c": "c"}

_CAMEL_POOL = [
    "getUserName", "parseHttpRequest", "readFileChunk", "buildIndexShard",
    "mergeSortedRuns", "computeBlockMax", "openSearcherHandle", "scanPostingList",
]
_SNAKE_POOL = [
    "read_file_chunk", "write_posting_block", "term_catalog_merge",
    "shard_route_murmur", "block_max_score", "doc_gap_varint",
]
_FILLER = ["data", "value", "index", "shard", "query", "score", "term", "block"]

NEEDLE_EVERY = 97  # one needle token per 97 docs: xylophoneQuarkNebula{i//97}


def synthetic_corpus(spark: SparkSession, n_docs: int,
                     body_reps: int = 1) -> DataFrame:
    """Deterministic code-like corpus of ``n_docs`` rows.

    Pure column arithmetic on ``spark.range`` — identical content for
    a given ``i`` at any parallelism, any scale.  Skew property
    (FIXTURES.md §1): ``import`` in ~60% and ``return`` in ~70% of
    docs, so hot-term handling is genuinely exercised.

    ``body_reps`` repeats the code body (needle kept unique) to reach
    realistic source-file sizes — 1 rep is ~0.3 KB; real repos
    average several KB/file, so benches use ~8-16 reps.
    """
    i = F.col("id")
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (i % 7 + 1).cast("int"))
    ext = F.element_at(
        F.create_map(*[F.lit(x) for kv in EXT.items() for x in kv]), lang
    )
    repo = F.format_string("org%d/repo%d", (i % 7).cast("int"), (i % 101).cast("int"))
    path = F.format_string(
        "src/pkg%d/Module%d.%s", (i % 13).cast("int"), (i % 997).cast("int"), ext
    )
    camel = F.element_at(
        F.array(*[F.lit(x) for x in _CAMEL_POOL]), (i % len(_CAMEL_POOL) + 1).cast("int")
    )
    camel2 = F.element_at(
        F.array(*[F.lit(x) for x in _CAMEL_POOL]),
        ((i * 3 + 1) % len(_CAMEL_POOL) + 1).cast("int"),
    )
    snake = F.element_at(
        F.array(*[F.lit(x) for x in _SNAKE_POOL]), (i % len(_SNAKE_POOL) + 1).cast("int")
    )
    filler = F.element_at(
        F.array(*[F.lit(x) for x in _FILLER]), (i % len(_FILLER) + 1).cast("int")
    )
    # variable tf: filler word repeated 1..5 times; doc length varies
    repeated = F.array_join(F.array_repeat(filler, (i % 5 + 1).cast("int")), " ")
    needle = F.when(
        i % NEEDLE_EVERY == 0,
        F.format_string(" xylophoneQuarkNebula%d", (i / NEEDLE_EVERY).cast("int")),
    ).otherwise(F.lit(""))
    kw_import = F.when(i % 10 < 6, F.lit("import os\nimport sys\n")).otherwise(F.lit(""))
    kw_return = F.when(i % 10 < 7, F.lit("    return result\n")).otherwise(F.lit(""))
    core = F.concat(
        kw_import,
        F.lit("def "), snake, F.lit("(arg):\n    "),
        camel, F.lit("('x')\n    "),
        F.lit("class Handler: pass\n    "),
        camel2, F.lit("(arg)\n"),
        kw_return,
        F.lit("# "), repeated, F.lit("\n"),
    )
    if body_reps > 1:
        core = F.repeat(core, body_reps)
    body = F.concat(core, needle)
    commit = F.sha1(F.concat_ws(":", repo, path, i.cast("string")))
    return spark.range(n_docs).select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        body.alias("content"),
    )


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's documents table onto the corpus shape."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("repo"),
        F.format_string("doc/%d.txt", F.col("doc_id")).alias("path"),
        F.sha1(F.col("text")).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )


def dense_ids(df: DataFrame, key_cols: list[str],
              out_col: str = "doc_id") -> DataFrame:
    """Dense 0..N-1 ids in global ``key_cols`` order, WITHOUT a
    single-partition window (the naive ``row_number().over(orderBy)``
    serializes the whole table through one task — an Amdahl wall at
    scale).  Instead: range-partition by key, rank within each
    partition in parallel, then add per-partition offsets (one tiny
    driver-side cumulative sum over partition counts).

    The range-partitioned frame is persisted while the two passes run
    so both see the same partition boundaries (RangePartitioner
    samples its bounds); at warehouse scale this intermediate would be
    a parquet/Iceberg staging write instead of a cache.
    """
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        df.repartitionByRange(nparts, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    part = part.persist()
    counts = {
        int(r["_pid"]): int(r["n"])
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(counts) for x in (pid, offsets[pid])]
    )
    # second pass: rows come back from the cache partition-ordered and
    # already key-sorted, so the within-partition sequence number is
    # read straight off monotonically_increasing_id (= task_pid << 33
    # | row_seq) — NO Window.partitionBy(_pid) pass, which would
    # re-shuffle and re-sort the whole table a second time (measured
    # as the largest single cost of the ingest phase).  The cache
    # guarantees both passes see identical partition boundaries and
    # row order; cached partition i is read by task i, so the
    # embedded task pid equals the stored _pid.
    seq = F.monotonically_increasing_id() - F.shiftleft(
        F.col("_pid").cast("long"), 33
    )
    out = part.withColumn(
        out_col,
        (seq + F.element_at(off_map, F.col("_pid")).cast("long")),
    ).drop("_pid")
    return out


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (Austin Appleby's public-domain
    algorithm), returned as a SIGNED Java int — byte-for-byte the
    hash Katta routes rows with (util/StringHash.java, seed 0).
    Spark's built-in ``hash()`` is also murmur3-32 but hardcodes
    seed 42, so routing parity needs this explicit implementation."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def shard_route(df: DataFrame, key_col: str, shard_partitions: int,
                shard_step: int,
                out_cols: tuple[str, str] = ("micro_shard", "shard_start")
                ) -> DataFrame:
    """Katta's murmur3 row routing, bit-identical
    (lib/writer/DefaultDataWriter.java:171-184): micro-shard =
    ``abs(murmur3_x86_32(key, seed=0) % shardPartitions)`` (Java %
    keeps the dividend's sign; abs after), covering shard range
    start = ``micro - micro % shardStep``.  The hash runs as an
    Arrow-batched pandas UDF over the key column — build-side
    routing only, never in a query path."""
    from pyspark.sql.functions import pandas_udf

    p, step = int(shard_partitions), int(shard_step)

    # Java's % is a remainder truncated toward zero — python's %
    # floors for negative dividends, so truncate explicitly
    def _micro(keys):
        def one(s: str) -> int:
            h = murmur3_x86_32(str(s).encode("utf-8"))
            r = h - int(h / p) * p
            return abs(r)
        return keys.map(one)

    micro = pandas_udf(_micro, "int")

    m = micro(F.col(key_col))
    mc, sc = out_cols
    return df.withColumn(mc, m).withColumn(
        sc, (F.col(mc) - F.col(mc) % F.lit(step)).cast("int")
    )


def with_ingest_columns(df: DataFrame, doc_id_method: str = "rank") -> DataFrame:
    """Attach ``doc_id`` + ``content_sha256``.

    ``rank``: dense rank over (repo, path, commit) — stable across
    runs and parallelism levels (FIXTURES.md §1), computed by the
    parallel two-pass scheme in :func:`dense_ids`.  ``hash``:
    ``xxhash64(key)`` — the sort-free assignment for builds where a
    total order is unnecessary (stable, collision-checked
    downstream); mirrors Katta's hash routing of rowIds
    (lib/writer/DefaultDataWriter.java:171-184).  NOTE: hash ids are
    sparse, which defeats doc-gap compression — dense rank is the
    production path.
    """
    out = df
    if "doc_id" not in df.columns:
        if doc_id_method == "rank":
            out = dense_ids(df, ["repo", "path", "commit"])
        else:
            out = out.withColumn(
                "doc_id", F.xxhash64(F.concat_ws("\x1f", "repo", "path", "commit"))
            )
    return out.withColumn("content_sha256", F.sha2(F.col("content"), 256))
