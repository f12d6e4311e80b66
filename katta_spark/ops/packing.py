"""Sequence packing for training pipelines: concatenate documents
into fixed-budget training sequences ("packs") with a deterministic
greedy fill.

No reference analogue (training-data op beyond zhenqin/katta).

Semantics: within each group (shard / source / file — the unit a real
pipeline packs independently), documents are taken in ``order_col``
order and appended to the current pack while it stays within
``budget``; the first doc that would overflow starts a new pack.  A
document larger than the budget gets a pack of its own.  The result
is a pure function of (group, order, sizes) — partition-layout and
rerun invariant, unlike anything seeded from Spark task ids.

Scale shape (100 TB): packing is inherently sequential WITHIN a
group — the parallel unit is the group, exactly like the reference
pipelines that pack per output shard.  ``applyInPandas`` gives one
Arrow-batched kernel per group (one shuffle on group_col); the loop
inside is O(docs-in-group) integer arithmetic.  Groups must be
shard-sized (the same constraint any packer has); at warehouse scale
use the output-shard key as ``group_col``.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "doc_id long, grp string, pack_id long, pack_offset long, size long"
)


def _pack_kernel(budget: int):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord", kind="mergesort").reset_index(drop=True)
        packs, offs = [], []
        pack, acc = 0, 0
        for s in pdf["_size"].astype("int64"):
            if acc > 0 and acc + s > budget:
                pack += 1
                acc = 0
            packs.append(pack)
            offs.append(acc)
            acc += int(s)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "grp": pdf["_grp"],
                "pack_id": pd.Series(packs, dtype="int64"),
                "pack_offset": pd.Series(offs, dtype="int64"),
                "size": pdf["_size"].astype("int64"),
            }
        )

    return kernel


def pack_greedy(
    docs: DataFrame,
    budget: int,
    size_col: str,
    group_col: str,
    order_col: str = "doc_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, grp, pack_id, pack_offset, size): greedy fixed-budget
    packing per group.  ``pack_id`` counts packs within the group from
    0; ``pack_offset`` is the doc's start position inside its pack."""
    slim = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(group_col).cast("string").alias("_grp"),
        F.col(order_col).alias("_ord"),
        F.col(size_col).cast("long").alias("_size"),
    )
    return slim.groupBy("_grp").applyInPandas(
        _pack_kernel(int(budget)), PACK_SCHEMA
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill report over :func:`pack_greedy` output:
    (grp, pack_id, n_docs, total, fill)."""
    return packed.groupBy("grp", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("size").alias("total"),
        F.round(F.sum("size") / F.lit(float(budget)), 6).alias("fill"),
    )


def pack_texts(
    docs: DataFrame,
    packed: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize :func:`pack_greedy` output into training sequences:
    (grp, pack_id, n_docs, seq) with ``seq`` the pack's documents
    concatenated in pack order.

    One join back to the docs (on the id — narrow payload: only
    text_col survives pruning) + one hash shuffle on (grp, pack_id);
    in-pack order is restored engine-independently by sorting the
    collected (pack_offset, text) structs, so the output is
    deterministic under any partitioning."""
    slim = docs.select(F.col(id_col).cast("long").alias("doc_id"), text_col)
    joined = packed.join(slim, "doc_id")
    return (
        joined.groupBy("grp", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pack_offset"), F.col(text_col)
                            )
                        )
                    ),
                    lambda s: s[text_col],
                ),
                sep,
            ).alias("seq"),
        )
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "doc_id",
    shuffle: bool = False,
    data_format: str = "parquet",
) -> dict:
    """Materialize a training dataset as exactly ``n_shards``
    deterministic parquet shards + a content manifest.

    With ``shuffle=True`` rows are additionally SORTED inside each
    shard by a salted md5 of the key — a deterministic global
    pseudo-random training order (read shards in shard order, rows in
    file order) that no ``df.orderBy(rand())`` can reproduce across
    reruns.

    Shard assignment is a pure function of the row key (md5 bucket,
    the same family as :mod:`katta_spark.ops.sampling`): re-running
    the writer over ANY partitioning/ordering of the same rows
    produces byte-identical shard membership — which
    ``df.repartition(n)`` alone does NOT guarantee (round-robin is
    task-layout dependent).  Reproducible shards are what make a
    training run's data addressable and a resume auditable.

    ``data_format`` selects the on-disk encoding: ``parquet``
    (default) or ``json`` — JSON-Lines, one object per row, the
    interchange format most LLM training loaders ingest directly.
    Shard membership, ordering, and the manifest digest are
    format-independent (computed from the rows, not the bytes).

    Plan: one hash shuffle on the shard id, then a ``partitionBy``
    write so each ``shard=`` directory is one compact file.  The
    manifest (written LAST = write complete, the same done-marker
    contract as the index build) records per-shard row counts and an
    order-insensitive xor-of-xxhash64 content digest, so a reader can
    verify a shard without re-listing the dataset.
    """
    import json
    from pathlib import Path

    shard = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
               16, 10)
        .cast("long") % n_shards
    ).cast("int").alias("shard")
    out = df.select(shard, "*")
    writer = out.repartition(n_shards, "shard")
    if shuffle:
        # the sort must LEAD with the partition column: FileFormatWriter
        # re-sorts any task whose rows aren't ordered by the partition
        # cols (non-stable — it would scramble a bare md5 order), but
        # recognizes an existing (shard, ...) sort prefix and keeps it
        writer = writer.sortWithinPartitions(
            F.col("shard"),
            F.md5(F.concat(F.lit("shuf:"), F.col(key_col).cast("string"))),
        )
    if data_format not in ("parquet", "json"):
        raise ValueError(f"unknown data_format {data_format!r}")
    w = writer.write.mode("overwrite").partitionBy("shard")
    if data_format == "json":
        w.json(out_dir)  # JSON-Lines: one object per line
    else:
        w.parquet(out_dir)
    stats = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(F.xxhash64(F.col(key_col).cast("string")))
            .alias("digest"),
        )
        .collect()
    )
    manifest = {
        "n_shards": int(n_shards),
        "format": data_format,
        "key_col": key_col,
        "shards": {
            int(r["shard"]): {"rows": int(r["rows"]),
                              "digest": int(r["digest"])}
            for r in stats
        },
    }
    (Path(out_dir) / "_manifest.json").write_text(
        json.dumps(manifest, indent=1)
    )
    return manifest


def length_bucket_batches(docs: DataFrame, size_col: str,
                          batch_size: int = 8,
                          id_col: str = "doc_id",
                          bucket_edges: tuple = (64, 128, 256, 512,
                                                 1024, 2048)) -> DataFrame:
    """(doc_id, size, bucket, batch_id, batch_max, padding) — dynamic
    batching by length: sequences bucket into size ranges
    (``bucket_edges`` are exclusive upper bounds; the last bucket is
    open), each bucket fills fixed-count batches in deterministic
    (size, doc_id) order, and every row reports its batch's padding
    waste ``batch_max - size`` (what the batch pads it to).  The
    training-loader prep that cuts padding FLOPs versus naive random
    batching — near-equal lengths share a batch.

    Scale shape: one narrow projection, one window per bucket
    partition (bucket count is a constant, rows within a bucket sort
    by size — Spark range-partitions the window), one batch-max
    window over (bucket, batch_id).  No shuffle carries text."""
    from pyspark.sql import Window

    edges = sorted(set(int(e) for e in bucket_edges))
    bucket = F.lit(len(edges))  # open top bucket
    for i, e in reversed(list(enumerate(edges))):
        bucket = F.when(F.col("size") < F.lit(e), F.lit(i)).otherwise(
            bucket
        )
    slim = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(size_col).cast("long").alias("size"),
    ).withColumn("bucket", bucket)
    w = Window.partitionBy("bucket").orderBy("size", "doc_id")
    ranked = slim.withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / F.lit(int(batch_size)))
        .cast("long"),
    )
    bw = Window.partitionBy("bucket", "batch_id")
    return ranked.withColumn(
        "batch_max", F.max("size").over(bw)
    ).withColumn(
        "padding", F.col("batch_max") - F.col("size")
    ).select("doc_id", "size", "bucket", "batch_id", "batch_max",
             "padding")
