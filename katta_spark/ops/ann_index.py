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


def _cos_to_literal(vec_col, cvec: list[float]):
    """cos(vec_col, literal vector) as a pure JVM fold — element-order
    sequential summation, bitwise-reproducible by any oracle that sums
    in list order."""
    import math

    from katta_spark.ops.similarity import _dot, _norm

    c = F.array(*[F.lit(float(x)) for x in cvec])
    cn = math.sqrt(sum(x * x for x in cvec)) or 1.0
    return _dot(vec_col, c) / (_norm(vec_col) * F.lit(cn))


def _assign_cid(vec_col, centroids: list[list[float]]):
    """argmax-cosine centroid id (tie-break cid asc) as a pure JVM
    fold over broadcast centroid literals — no shuffle, no Python."""
    elems = [
        F.struct(
            (-_cos_to_literal(vec_col, cv)).alias("nc"),
            F.lit(cid).alias("cid"),
        )
        for cid, cv in enumerate(centroids)
    ]
    return F.array_min(F.array(*elems))["cid"]


def _assign_expr(vec_col, centroids: list[list[float]]):
    """Centroid assignment, picked by k: the JVM expression fold for
    small k (whole-stage codegen, bitwise-reproducible by the SQL
    oracle — all oracle-checked builds use k <= 32) and the Arrow
    matmul kernel past ~32 centroids, where the fold's codegen
    compile time grows superlinearly with k.  Same argmax, same
    lowest-index tie-break."""
    if len(centroids) <= 32:
        return _assign_cid(vec_col, centroids)
    return _argmax_cid_kernel(centroids)(vec_col)


def kmeans_refine(
    embeddings: DataFrame,
    init_centroids: list[list[float]],
    iters: int = 5,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd k-means refinement of IVF coarse centroids.

    Each iteration is ONE map-side-combinable shuffle: assignment is
    narrow (:func:`_assign_expr` — JVM argmax fold at small k, Arrow
    matmul kernel past ~32 centroids), recentering is
    ``groupBy(cid).agg(avg(emb[0]), ..., avg(emb[d-1]))`` — per-dim
    built-in aggregates with partial combine, so shuffle volume is
    ``k x d`` partials per input partition, never the vectors.
    Empty clusters keep their previous centroid.  The k-means|| seed
    the original docstring promised lives in the caller's hands as
    ``init_centroids`` (the deterministic smallest-id sample is the
    default seed in :func:`build_ivf_index`).
    """
    cents = [list(map(float, c)) for c in init_centroids]
    if not cents:
        return cents
    dims = len(cents[0])
    for _ in range(max(0, iters)):
        aggs = [F.count("*").alias("_n")] + [
            F.avg(F.col(vec_col)[d]).alias(f"m{d}") for d in range(dims)
        ]
        rows = (
            embeddings.select(
                _assign_expr(F.col(vec_col), cents).alias("cid"), vec_col
            )
            .groupBy("cid")
            .agg(*aggs)
            .collect()
        )
        new = {r["cid"]: [float(r[f"m{d}"]) for d in range(dims)] for r in rows}
        cents = [new.get(cid, old) for cid, old in enumerate(cents)]
    return cents


def _cand_matrix(cand: list[list[float]]):
    import numpy as np

    C = np.asarray(cand, dtype=np.float64)
    n = np.linalg.norm(C, axis=1)
    n[n == 0.0] = 1.0
    return C / n[:, None]


def _min_d2_kernel(cand: list[list[float]]):
    """pandas_udf: min over candidates of 2*(1-cos(v, c)) — one numpy
    matmul per Arrow batch against the broadcast L2-normalized
    candidate matrix; scales to hundreds of candidates where a JVM
    greatest() fold would explode codegen."""
    import numpy as np
    import pandas as pd

    Cn = _cand_matrix(cand)

    def d2(v):
        M = np.stack(v.to_numpy())
        mn = np.linalg.norm(M, axis=1)
        mn[mn == 0.0] = 1.0
        best = ((M / mn[:, None]) @ Cn.T).max(axis=1)
        return pd.Series(np.maximum(2.0 - 2.0 * best, 0.0))

    return F.pandas_udf(d2, "double")


def _argmax_cid_kernel(cand: list[list[float]]):
    """pandas_udf: argmax-cosine candidate index (tie-break lowest
    index — numpy argmax's rule, matching :func:`_assign_cid`)."""
    import numpy as np
    import pandas as pd

    Cn = _cand_matrix(cand)

    def cid(v):
        M = np.stack(v.to_numpy())
        mn = np.linalg.norm(M, axis=1)
        mn[mn == 0.0] = 1.0
        return pd.Series(
            np.argmax((M / mn[:, None]) @ Cn.T, axis=1).astype("int32")
        )

    return F.pandas_udf(cid, "int")


def kmeans_parallel_seed(
    embeddings: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rounds: int = 4,
    oversample: int | None = None,
    salt: str = "kmpp",
) -> list[list[float]]:
    """k-means|| seeding (Bahmani et al., "Scalable k-means++",
    VLDB 2012) — the warehouse-scale replacement for the smallest-id
    sample quantizer: on clustered data a seed sample lands many
    centroids in one dense region, skewing cluster sizes (which
    unbalances SemDeDup's O(sum |c_i|^2) pair work) and ANN recall.

    Deterministic by construction (no RNG state): the start center is
    the smallest-id vector; each round computes every point's cosine
    distance to the current center set (a narrow JVM fold over
    broadcast literals), sums it in one aggregate (phi), and samples
    each point independently with probability ``l*d2/phi`` using the
    repo's md5 hash-uniform convention (``md5(salt||round||id)`` ->
    [0,1)) — the paper's independent sampling with a seeded hash as
    the coin.  After ``rounds`` the ~``1 + rounds*l`` candidates are
    weighted by how many points they own (one count aggregate) and
    reduced to ``k`` on the driver by the GREEDY weighted k-means++
    rule (pick the candidate maximizing weight x distance-to-chosen,
    deterministic tie-break) — candidates and weights are the only
    collects, both bounded by the oversampling factor, never by N.

    Distances use ``2*(1-cos)`` — squared euclidean on L2-normalized
    vectors — so seeding, assignment (:func:`_assign_cid`) and Lloyd
    refinement (:func:`kmeans_refine`) all agree on geometry.

    The per-round distance/ownership passes are Arrow ``pandas_udf``
    kernels over the broadcast candidate MATRIX, not JVM expression
    folds: the candidate set grows to ``1 + rounds*l`` (hundreds at
    production k), and a ``greatest()`` fold over hundreds of
    per-centroid cosine expressions explodes codegen compile time,
    while the kernel is one numpy matmul per Arrow batch at any
    candidate count.  The final k-way IVF assignment keeps the
    bounded JVM fold (:func:`_assign_cid`)."""
    import numpy as np

    l = int(oversample or 2 * k)
    first = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(1)
        .collect()
    )
    if not first:
        return []
    cand: list[list[float]] = [[float(x) for x in first[0][vec_col]]]
    seen = {first[0][id_col]}
    for r in range(max(0, rounds)):
        # persist: phi and the coin-flip filter both consume the
        # min-d2 pass — without the cache each round runs the full
        # corpus distance kernel TWICE (measured; at warehouse scale
        # that doubles seeding cost)
        scored = embeddings.select(
            F.col(id_col), F.col(vec_col),
            _min_d2_kernel(cand)(F.col(vec_col)).alias("_d2"),
        ).persist()
        phi = scored.agg(F.sum("_d2").alias("s")).first()["s"]
        if not phi or phi <= 0.0:
            scored.unpersist()
            break  # every point sits on a center already
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}|{r}|"),
                            F.col(id_col).cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(1 << 52))
        )
        picked = (
            scored.filter(
                u < F.col("_d2") * F.lit(float(l) / float(phi))
            )
            .select(id_col, vec_col)
            .collect()  # expected ~l rows per round (independent coins)
        )
        scored.unpersist()
        for row in picked:
            if row[id_col] not in seen:
                seen.add(row[id_col])
                cand.append([float(x) for x in row[vec_col]])
    if len(cand) <= k:
        return cand
    # weight candidates by ownership count — one aggregate
    wrows = (
        embeddings.select(
            _argmax_cid_kernel(cand)(F.col(vec_col)).alias("_cid")
        )
        .groupBy("_cid")
        .count()
        .collect()
    )
    w = np.zeros(len(cand), dtype=np.float64)
    for row in wrows:
        w[int(row["_cid"])] = float(row["count"])
    C = np.asarray(cand, dtype=np.float64)
    norms = np.linalg.norm(C, axis=1)
    norms[norms == 0.0] = 1.0
    Cn = C / norms[:, None]
    # greedy weighted k-means++ reduction (deterministic: argmax with
    # smallest-index tie-break via numpy argmax)
    chosen = [int(np.argmax(w))]
    d2c = 2.0 - 2.0 * (Cn @ Cn[chosen[0]])
    d2c = np.maximum(d2c, 0.0)
    while len(chosen) < k:
        gain = w * d2c
        gain[chosen] = -1.0
        nxt = int(np.argmax(gain))
        if gain[nxt] <= 0.0:
            break  # fewer than k distinct candidate positions
        chosen.append(nxt)
        d2c = np.minimum(d2c, np.maximum(2.0 - 2.0 * (Cn @ Cn[nxt]), 0.0))
    return [cand[i] for i in chosen]


def coarse_centroids(
    embeddings: DataFrame,
    k: int,
    quantizer: str = "kmeans",
    kmeans_iters: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """The shared coarse quantizer for IVF/SemDeDup.  ``kmeans``
    (default): k-means|| seeding + Lloyd refinement — the scale-true
    path.  ``seed``: the smallest-id sample — bitwise-deterministic
    for SQL-oracle-checked builds (Lloyd's float-avg recentering is
    reproducible only up to summation order)."""
    if quantizer not in ("kmeans", "seed"):
        raise ValueError(f"unknown quantizer {quantizer!r}")
    if quantizer == "kmeans":
        cents = kmeans_parallel_seed(
            embeddings, k, vec_col=vec_col, id_col=id_col
        )
        iters = 3 if kmeans_iters is None else int(kmeans_iters)
    else:
        rows = (
            embeddings.orderBy(F.col(id_col).asc())
            .limit(int(k))
            .select(id_col, vec_col)
            .collect()
        )
        cents = [[float(x) for x in r[vec_col]] for r in rows]
        iters = int(kmeans_iters or 0)
    if iters:
        cents = kmeans_refine(
            embeddings, cents, iters=iters, vec_col=vec_col
        )
    return cents


def build_ivf_index(
    embeddings: DataFrame,
    out_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int | None = None,
    meta_cols: list[str] | None = None,
    quantizer: str = "kmeans",
) -> dict:
    """IVF-flat index: vectors partitioned by nearest-centroid id.

    Coarse quantizer (:func:`coarse_centroids`): ``kmeans`` (default)
    is k-means|| seeding + Lloyd refinement — on clustered corpora a
    naive sample skews cluster sizes and recall; ``seed`` keeps the
    smallest-id sample, bitwise-reproducible by a SQL oracle (the
    mode oracle-gated builds pin).  Assignment is argmax-cosine with
    tie-break centroid_id asc, computed per row as a JVM expression
    fold over the broadcast centroid literals — no shuffle, no cross
    join, no Python.  The write is partitioned by ``cid`` so a probe
    reads only its centroid's directories.

    ``meta_cols`` carries metadata columns (labels, timestamps,
    source tags) into the index files so FILTERED vector search
    (:func:`ivf_query` ``where=``) pushes its predicate straight into
    the probed parquet scan — the standard vector-DB metadata-filter
    feature, with no post-hoc join back to a side table."""
    centroids = coarse_centroids(
        embeddings, int(n_centroids), quantizer=quantizer,
        kmeans_iters=kmeans_iters, vec_col=vec_col, id_col=id_col,
    )
    assigned = embeddings.select(
        _assign_expr(F.col(vec_col), centroids).alias("cid"),
        F.col(id_col),
        F.col(vec_col),
        *[F.col(c) for c in (meta_cols or [])],
    )
    (
        assigned.repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(out_dir)
    )
    meta = {
        "kind": "ivf",
        "n_centroids": len(centroids),
        "centroids": centroids,
        "id_col": id_col,
        "vec_col": vec_col,
        "meta_cols": sorted(meta_cols or []),
    }
    (Path(out_dir) / "_meta.json").write_text(json.dumps(meta, indent=1))
    return meta


def append_to_ivf_index(embeddings: DataFrame, index_dir: str) -> dict:
    """Incremental vector ingest: assign NEW vectors to the existing
    (frozen) centroids and append their ``cid=`` partitions — the
    vector-index analogue of the text index's commit appends.  Probes
    pick up appended files with no handle invalidation (partition
    pruning is directory-based).  Quantizer drift under a shifting
    distribution is handled by a periodic rebuild with
    ``kmeans_iters>0``, same as any IVF system."""
    meta = json.loads((Path(index_dir) / "_meta.json").read_text())
    assigned = embeddings.select(
        _assign_expr(F.col(meta["vec_col"]), meta["centroids"]).alias("cid"),
        F.col(meta["id_col"]),
        F.col(meta["vec_col"]),
    )
    (
        assigned.repartition("cid")
        .write.mode("append")
        .partitionBy("cid")
        .parquet(index_dir)
    )
    return meta


def ivf_query(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    where=None,
) -> DataFrame:
    """(id, cos) top-k by exact cosine within the ``nprobe`` nearest
    centroids' partitions.  Centroid ranking is a driver-side handful
    of flops over the stored centroid list (sequential float64 sums,
    ordering cos desc / cid asc); the data read is partition-pruned to
    the probed ``cid=`` directories.

    ``where`` (a Column over index columns, e.g. ``F.col("label") ==
    3`` when the index was built with ``meta_cols=["label"]``) is a
    metadata pre-filter: it applies INSIDE the probed scan — Catalyst
    pushes it to the parquet files alongside the partition pruning —
    so candidates are filtered before any distance math (filtered
    vector search, not post-filtering of the top-k)."""
    import math

    meta = json.loads((Path(index_dir) / "_meta.json").read_text())
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def cos(cv: list[float]) -> float:
        dot = 0.0
        nc = 0.0
        for a, b in zip(cv, query_vec):
            dot += float(a) * float(b)
            nc += float(a) * float(a)
        return dot / ((math.sqrt(nc) or 1.0) * qn)

    ranked = sorted(
        ((cos(cv), cid) for cid, cv in enumerate(meta["centroids"])),
        key=lambda t: (-t[0], t[1]),
    )
    probe = [cid for _, cid in ranked[: max(nprobe, 1)]]
    df = spark.read.parquet(index_dir).filter(F.col("cid").isin(probe))
    if where is not None:
        df = df.filter(where)
    return cosine_topk(
        df.select(meta["id_col"], meta["vec_col"]),
        query_vec,
        k,
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
    )


def _pq_codebooks(sample_vecs: list[list[float]],
                  centroids: list[list[float]],
                  m: int, n_codes: int) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: the residual sub-vectors of the
    ``n_codes`` smallest-id sample vectors, one codebook per subspace.
    Same design trade as the IVF coarse quantizer — a deterministic
    sample instead of per-subspace k-means, so every build is exactly
    reproducible by the python mirror (swap in k-means per subspace at
    warehouse scale; nothing else changes)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    S = np.asarray(sample_vecs, dtype=np.float64)
    subdim = S.shape[1] // m
    Sn = np.linalg.norm(S, axis=1)
    Sn[Sn == 0] = 1.0
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0] = 1.0
    cos = (S @ C.T) / (Sn[:, None] * Cn[None, :])
    cid = np.argmax(cos, axis=1)
    R = S - C[cid]
    return [
        [
            [float(x) for x in R[c, s * subdim:(s + 1) * subdim]]
            for c in range(n_codes)
        ]
        for s in range(m)
    ]


def make_pq_encoder(centroids: list[list[float]],
                    codebooks: list[list[list[float]]],
                    id_col: str, vec_col: str):
    """Arrow-batched PQ encoder kernel for ``mapInPandas``: per batch,
    one matmul assigns coarse centroids (argmax cosine, first-wins
    ties) and one distance matrix per subspace picks the nearest code
    for the residual — all numpy float64, zero per-row Python."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    CB = np.asarray(codebooks, dtype=np.float64)  # m x n_codes x subdim
    m, _, subdim = CB.shape
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0] = 1.0

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Vn = np.linalg.norm(V, axis=1)
            Vn[Vn == 0] = 1.0
            cos = (V @ C.T) / (Vn[:, None] * Cn[None, :])
            cid = np.argmax(cos, axis=1)
            R = V - C[cid]
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                Rs = R[:, s * subdim:(s + 1) * subdim]
                d2 = ((Rs[:, None, :] - CB[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "cid": cid.astype("int32"),
                    id_col: pdf[id_col].to_numpy(),
                    "codes": list(codes),
                }
            )

    return kernel


def build_ivfpq_index(
    embeddings: DataFrame,
    out_dir: str,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int | None = None,
    meta_cols: list[str] | None = None,
    quantizer: str = "kmeans",
) -> dict:
    """IVF-PQ index: coarse centroid partitioning + product-quantized
    residual codes, NO stored vectors.

    This is the memory story at 100 TB: a 64-dim float64 vector is 512
    bytes; its PQ row is ``m`` one-byte-range codes (m=8 here) + id —
    a ~50x shrink, which is what lets the probe set live in executor
    memory / page cache when the raw corpus cannot.  Scoring is ADC
    (asymmetric distance computation, Jégou et al. TPAMI'11): the
    query builds per-subspace lookup tables against each probed
    centroid and candidates are scored by ``m`` table lookups — a JVM
    expression fold over broadcast LUT literals, no Python, no
    vector-width work per row.

    Layout mirrors :func:`build_ivf_index` (``cid=`` partitioned,
    frozen quantizer in ``_meta.json``, meta written last)."""
    sample_n = max(n_centroids, n_codes)
    rows = (
        embeddings.orderBy(id_col)
        .limit(sample_n)
        .select(id_col, vec_col)
        .collect()
    )
    # the PQ codebook seed stays the smallest-id sample in both modes
    # (it quantizes per-subspace value ranges, not cluster geometry);
    # the COARSE quantizer follows the same kmeans/seed switch as IVF
    vecs = [[float(x) for x in r[vec_col]] for r in rows]
    if quantizer == "seed" and kmeans_iters is None:
        centroids = vecs[:n_centroids]
    else:
        centroids = coarse_centroids(
            embeddings, int(n_centroids), quantizer=quantizer,
            kmeans_iters=kmeans_iters, vec_col=vec_col, id_col=id_col,
        )
    dims = len(centroids[0])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    codebooks = _pq_codebooks(vecs[:n_codes], centroids, m, n_codes)
    enc = make_pq_encoder(centroids, codebooks, id_col, vec_col)
    id_type = dict(embeddings.select(id_col, vec_col).dtypes)[id_col]
    encoded = embeddings.select(id_col, vec_col).mapInPandas(
        enc, schema=f"cid int, {id_col} {id_type}, codes array<int>"
    )
    (
        encoded.repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(out_dir)
    )
    meta = {
        "kind": "ivfpq",
        "n_centroids": len(centroids),
        "m": int(m),
        "n_codes": int(n_codes),
        "centroids": centroids,
        "codebooks": codebooks,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    (Path(out_dir) / "_meta.json").write_text(json.dumps(meta, indent=1))
    return meta


def ivfpq_query(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    shortlist: int | None = None,
    rerank_embeddings: DataFrame | None = None,
) -> DataFrame:
    """(id, cos) top-k by ADC-approximate cosine within the ``nprobe``
    nearest centroids' partitions.

    Per probed centroid the driver builds two m x n_codes tables from
    the frozen codebooks: LUT_dot[s][c] = q_s · (centroid_s + cb[s][c])
    and LUT_n2[s][c] = ||centroid_s + cb[s][c]||² — the reconstruction
    dot-product and norm both decompose per subspace, so the
    approximate cosine is m lookups + one sqrt per candidate.  The
    tables ride a broadcast join on ``cid``; scoring is a JVM
    ``aggregate`` fold (no Python per row).

    ``rerank_embeddings``: optional exact re-ranking — the ADC
    ``shortlist`` (default 4k) broadcast-semi-joins the original
    embeddings table and exact cosine reorders it; the heavy table is
    touched only for shortlist ids."""
    import math

    meta = json.loads((Path(index_dir) / "_meta.json").read_text())
    id_col = meta["id_col"]
    cents = meta["centroids"]
    cbs = meta["codebooks"]
    m = meta["m"]
    subdim = len(cents[0]) // m
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0

    def cos_c(cv):
        dot = sum(float(a) * float(b) for a, b in zip(cv, query_vec))
        nc = math.sqrt(sum(float(a) * float(a) for a in cv)) or 1.0
        return dot / (nc * qn)

    ranked = sorted(
        ((cos_c(cv), cid) for cid, cv in enumerate(cents)),
        key=lambda t: (-t[0], t[1]),
    )
    probe = [cid for _, cid in ranked[: max(nprobe, 1)]]

    lut_rows = []
    for cid in probe:
        cv = cents[cid]
        ld, ln = [], []
        for s in range(m):
            qs = query_vec[s * subdim:(s + 1) * subdim]
            row_d, row_n = [], []
            for code in range(meta["n_codes"]):
                rec = [
                    float(cv[s * subdim + j]) + float(cbs[s][code][j])
                    for j in range(subdim)
                ]
                row_d.append(sum(float(a) * b for a, b in zip(qs, rec)))
                row_n.append(sum(b * b for b in rec))
            ld.append(row_d)
            ln.append(row_n)
        lut_rows.append((cid, ld, ln))
    lut = spark.createDataFrame(
        lut_rows,
        "cid int, ld array<array<double>>, ln array<array<double>>",
    )

    df = spark.read.parquet(index_dir).filter(F.col("cid").isin(probe))
    seq = F.sequence(F.lit(1), F.lit(m))
    dot = F.aggregate(
        seq,
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at("ld", s), F.element_at("codes", s) + 1
        ),
    )
    n2 = F.aggregate(
        seq,
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at("ln", s), F.element_at("codes", s) + 1
        ),
    )
    scored = df.join(F.broadcast(lut), "cid").select(
        F.col(id_col).alias("id"),
        (dot / (F.greatest(F.sqrt(n2), F.lit(1e-300)) * F.lit(qn))).alias(
            "cos"
        ),
    )
    if rerank_embeddings is None:
        return scored.orderBy(F.desc("cos"), F.asc("id")).limit(k)
    sl = shortlist or max(4 * k, k)
    cand = (
        scored.orderBy(F.desc("cos"), F.asc("id"))
        .limit(sl)
        .select(F.col("id").alias(id_col))
    )
    vec_col = meta["vec_col"]
    exact = rerank_embeddings.join(
        F.broadcast(cand), id_col, "left_semi"
    ).select(id_col, vec_col)
    return cosine_topk(exact, query_vec, k, id_col=id_col, vec_col=vec_col)


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


def ivf_query_batch(
    spark: SparkSession,
    index_dir: str,
    queries: dict[str, list[float]],
    k: int = 10,
    nprobe: int = 2,
    where=None,
) -> DataFrame:
    """(qid, id, cos): N ANN queries answered by ONE partition-pruned
    scan — the batched dual of :func:`ivf_query`, the same collapse
    the fulltext engine does in ``multi_topk`` (N scatter-gathers ->
    one job).

    Driver side ranks each query against the tiny stored centroid
    list; the data read is pruned to the UNION of all probed ``cid=``
    directories, and each row is scored only against the queries that
    probed its partition (the (qid, cid, qvec) table is broadcast, so
    the probe join adds no shuffle).  Per-query top-k via one rank
    window over the scored candidates."""
    import math

    from pyspark.sql import Window

    meta = json.loads((Path(index_dir) / "_meta.json").read_text())
    id_col, vec_col = meta["id_col"], meta["vec_col"]

    def cos(qv: list[float], cv: list[float]) -> float:
        dot = sum(float(a) * float(b) for a, b in zip(cv, qv))
        nc = math.sqrt(sum(float(a) * float(a) for a in cv)) or 1.0
        nq = math.sqrt(sum(float(b) * float(b) for b in qv)) or 1.0
        return dot / (nc * nq)

    rows = []
    for qid, qv in queries.items():
        ranked = sorted(
            ((cos(qv, cv), cid) for cid, cv in enumerate(meta["centroids"])),
            key=lambda t: (-t[0], t[1]),
        )
        qn = math.sqrt(sum(float(x) * float(x) for x in qv)) or 1.0
        for _, cid in ranked[: max(nprobe, 1)]:
            rows.append((str(qid), int(cid),
                         [float(x) for x in qv], float(qn)))
    qdf = spark.createDataFrame(
        rows, "qid string, cid int, qvec array<double>, qnorm double"
    )
    union_cids = sorted({r[1] for r in rows})

    df = spark.read.parquet(index_dir).filter(F.col("cid").isin(union_cids))
    if where is not None:
        # metadata pre-filter (see ivf_query): pushed into the scan
        df = df.filter(where)
    v = F.col(vec_col)
    dot = F.aggregate(
        F.zip_with(v, F.col("qvec"),
                   lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(v, F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    scored = (
        df.join(F.broadcast(qdf), "cid")
        .select(
            "qid",
            F.col(id_col).alias("id"),
            (dot / (F.greatest(vnorm, F.lit(1e-300)) * F.col("qnorm")))
            .alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "cos")
    )


def build_sq_index(
    embeddings: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """int8 scalar-quantized vector index — the Elasticsearch
    ``int8_hnsw``-style storage trade (quantized codes drive the
    scan; raw vectors are kept alongside for exact rescoring,
    exactly like ES's rescore-on-raw).

    Per-vector symmetric quantization: ``scale = max|v_i| / 127``,
    ``code_i = floor(v_i/scale + 0.5)`` (an explicit half-up
    formula, identical in Spark and the SQL oracle — never the
    engines' round()), plus the code L2 norm so approximate cosine
    needs no decode: ``cos ≈ Σ q_i·c_i / (|q| · |c|)`` (the per-
    vector scale cancels in cosine).  All column algebra, no Python,
    no shuffle — the build is a pure map + one write."""
    v = F.col(vec_col)
    scale = F.greatest(
        F.aggregate(
            v, F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
        ),
        F.lit(1e-30),
    ) / F.lit(127.0)
    codes = F.transform(
        v, lambda x: F.floor(x.cast("double") / F.col("_scale")
                             + F.lit(0.5)).cast("int")
    )
    enc = (
        embeddings.select(
            F.col(id_col), v, scale.alias("_scale")
        )
        .select(
            id_col, vec_col,
            F.col("_scale").alias("scale"),
            codes.alias("codes"),
        )
        .withColumn(
            "code_norm",
            F.sqrt(
                F.aggregate(
                    F.col("codes"), F.lit(0.0),
                    lambda acc, c: acc
                    + c.cast("double") * c.cast("double"),
                )
            ),
        )
    )
    enc.write.mode("overwrite").parquet(out_dir)
    meta = {"kind": "sq8", "id_col": id_col, "vec_col": vec_col}
    (Path(out_dir) / "_meta.json").write_text(json.dumps(meta, indent=1))
    return meta


def sq_query(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 0,
) -> DataFrame:
    """(id, cos) top-k by APPROXIMATE cosine over the int8 codes
    (integer-dot fold — the scan never touches the raw floats); with
    ``rerank`` > 0, the top-``rerank`` approximate candidates are
    rescored by EXACT cosine on the stored raw vectors (ES's
    rescore-on-raw), and the exact top-k of that shortlist returns.

    Scale shape: one narrow scan over (codes, code_norm) — 4x fewer
    vector bytes than float32 — a TakeOrderedAndProject cut, and the
    rerank only ever decodes ``rerank`` rows."""
    import math

    meta = json.loads((Path(index_dir) / "_meta.json").read_text())
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    df = spark.read.parquet(index_dir)
    dot = F.aggregate(
        F.zip_with(
            F.col("codes"), qlit, lambda c, q: c.cast("double") * q
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    approx = df.select(
        F.col(meta["id_col"]),
        F.col(meta["vec_col"]),
        (dot / (F.col("code_norm") * F.lit(qn))).alias("cos_approx"),
    )
    if not rerank:
        return (
            approx.orderBy(F.desc("cos_approx"), F.asc(meta["id_col"]))
            .limit(int(k))
            .select(
                meta["id_col"],
                F.round("cos_approx", 6).alias("cos"),
            )
        )
    cand = approx.orderBy(
        F.desc("cos_approx"), F.asc(meta["id_col"])
    ).limit(int(rerank))
    return cosine_topk(
        cand.select(meta["id_col"], meta["vec_col"]),
        query_vec, k,
        id_col=meta["id_col"], vec_col=meta["vec_col"],
    )
