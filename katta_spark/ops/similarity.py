"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k against one query
  vector: dot products via ``F.zip_with`` + ``F.aggregate`` (pure
  JVM column algebra, no Python).  The correctness baseline.
- :func:`cosine_join_topk` — exact top-k for MANY query vectors at
  once (broadcast the queries, one pass over the corpus).
- :func:`lsh_bucket_ann` — random-hyperplane LSH bucketing: the
  100 TB path.  Hyperplane j, dim d uses the deterministic seedless
  coefficient cos(1 + j*dims + d) so the engine and any oracle can
  reproduce the planes exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cos) top-k by cosine vs a literal query vector,
    cos desc / id asc."""
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def cosine_join_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k neighbors per query vector: broadcast the query set
    against the corpus, window-rank per query.  (q_id, vec_id, cos)."""
    from pyspark.sql import Window

    j = embeddings.crossJoin(F.broadcast(queries))
    cos = _dot(F.col(vec_col), F.col(q_vec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(q_vec_col))
    )
    scored = j.select(F.col(q_id_col), F.col(id_col), cos.alias("cos"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def hyperplane_bits(
    vec_col: Column, dims: int, n_planes: int = 16
) -> Column:
    """LSH signature: bit j = sign(dot(vec, plane_j)) with the
    deterministic plane coefficients cos(1 + j*dims + d)."""
    sig = F.lit(0).cast("long")
    for j in range(n_planes):
        plane = F.array(
            *[F.lit(math.cos(1.0 + j * dims + d)) for d in range(dims)]
        )
        bit = F.when(_dot(vec_col, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + F.shiftleft(bit, j)
    return sig


def lsh_bucket_ann(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dims: int = 64,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict the exact cosine scan to the query's LSH bucket
    (plus nothing — single-probe).  At 100 TB: partition the corpus
    by signature so a probe is a partition-pruned scan."""
    sig = hyperplane_bits(F.col(vec_col), dims, n_planes)
    q_sig_bits = 0
    for j in range(n_planes):
        dot = sum(
            float(query_vec[d]) * math.cos(1.0 + j * dims + d) for d in range(dims)
        )
        q_sig_bits |= (1 if dot > 0 else 0) << j
    bucket = embeddings.withColumn("_sig", sig).filter(F.col("_sig") == q_sig_bits)
    return cosine_topk(bucket.drop("_sig"), query_vec, k, id_col, vec_col)
