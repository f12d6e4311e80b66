"""Persisted ANN signature index: the 100 TB similarity-search path.

Round-1 ANN (similarity.lsh_bucket_ann) recomputed every vector's LSH
signature with a full corpus scan per query.  This module makes the
signature a PARTITION of the stored table instead:

- :func:`build_ann_index` writes the embeddings table once,
  partitioned by ``(tbl, sig)`` — ``tbl`` = LSH table index (classic
  multi-table LSH), ``sig`` = that table's hyperplane signature.  The
  hash family is the same deterministic seedless one as
  :mod:`katta_spark.ops.similarity` (plane coefficients
  cos(1 + j*dims + d)), so results are bit-identical to the scan
  variants and SQL-oracle-checkable.
- :func:`ann_query` computes the query's signature driver-side (a few
  hundred flops), then reads ONLY the probed buckets: the
  ``sig IN (...)`` predicate is a parquet PartitionFilter, so Spark
  lists and reads just those directories — at 100 TB each probe
  touches ~corpus/2^planes of the data instead of all of it.
  Multi-probe (Hamming-radius bit flips) and multi-table union both
  stay partition-pruned.

Write layout: one hash-shuffle on (tbl, sig) before the partitioned
write so each bucket is a single compact file, not shuffle_partitions
fragments.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from katta_spark.ops.similarity import (
    _query_sig,
    cosine_topk,
    hyperplane_bits,
)


def build_ann_index(
    embeddings: DataFrame,
    out_dir: str,
    dims: int,
    planes_per_table: int = 12,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Write the signature-partitioned ANN index.  Returns the meta
    dict (also persisted as ``_meta.json``; written last = build
    complete)."""
    parts: DataFrame | None = None
    for t in range(n_tables):
        sig = hyperplane_bits(
            F.col(vec_col), dims, planes_per_table, t * planes_per_table
        )
        p = embeddings.select(
            F.lit(t).alias("tbl"),
            sig.alias("sig"),
            F.col(id_col),
            F.col(vec_col),
        )
        parts = p if parts is None else parts.unionByName(p)
    (
        parts.repartition("tbl", "sig")
        .write.mode("overwrite")
        .partitionBy("tbl", "sig")
        .parquet(out_dir)
    )
    meta = {
        "dims": int(dims),
        "planes_per_table": int(planes_per_table),
        "n_tables": int(n_tables),
        "id_col": id_col,
        "vec_col": vec_col,
    }
    (Path(out_dir) / "_meta.json").write_text(json.dumps(meta, indent=1))
    return meta


def _wanted_sigs(
    query_vec: list[float], dims: int, n_planes: int, offset: int, probes: int
) -> list[int]:
    q_sig = _query_sig(query_vec, dims, n_planes, offset)
    wanted = {q_sig}
    if probes >= 1:
        wanted |= {q_sig ^ (1 << j) for j in range(n_planes)}
    if probes >= 2:
        wanted |= {
            q_sig ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    return sorted(wanted)


def ann_candidates(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    probes: int = 0,
) -> DataFrame:
    """Partition-pruned candidate set (id, vec) for a query vector:
    union of the probed buckets across all tables, deduplicated."""
    meta = json.loads((Path(index_dir) / "_meta.json").read_text())
    df = spark.read.parquet(index_dir)
    cond = None
    for t in range(meta["n_tables"]):
        sigs = _wanted_sigs(
            query_vec,
            meta["dims"],
            meta["planes_per_table"],
            t * meta["planes_per_table"],
            probes,
        )
        c = (F.col("tbl") == t) & F.col("sig").isin(sigs)
        cond = c if cond is None else (cond | c)
    cand = df.filter(cond).select(meta["id_col"], meta["vec_col"])
    if meta["n_tables"] > 1:
        cand = cand.dropDuplicates([meta["id_col"]])
    return cand


def ann_query(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    probes: int = 0,
) -> DataFrame:
    """(id, cos) top-k by exact cosine WITHIN the probed buckets —
    identical results to similarity.lsh_bucket_ann /
    lsh_tables_ann on the same parameters, but served from a
    partition-pruned read instead of a corpus scan."""
    meta = json.loads((Path(index_dir) / "_meta.json").read_text())
    cand = ann_candidates(spark, index_dir, query_vec, probes)
    return cosine_topk(
        cand, query_vec, k, id_col=meta["id_col"], vec_col=meta["vec_col"]
    )
