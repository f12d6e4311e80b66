"""DSIR-style data selection: hashed n-gram importance resampling.

The standard recipe for steering a web-scale pretraining corpus
toward a target domain (Xie et al., "Data Selection for Language
Models via Importance Resampling", NeurIPS 2023): featurize every
document as a bag of HASHED token n-grams (unigrams + bigrams into a
fixed bucket space), fit smoothed categorical models of the target
sample (p) and the raw corpus (q) over the buckets, score each raw
document with its log importance weight ``log w(x) = sum_f cnt_f *
(ln p_f - ln q_f)``, and resample by Gumbel-perturbed top-k (which
draws WITHOUT replacement proportionally to w — the Gumbel-max
trick).

No reference analogue (training-data op beyond zhenqin/katta).

Everything is oracle-checkable: feature hashing uses the repo-wide
md5 convention (bit-identical in Spark and DuckDB), and the Gumbel
noise is derived from a hash of the doc id rather than an RNG, so
selection is a pure function of (corpus, target, salt) — stable
across partitionings, reruns, and engines.

Scale shape (100 TB raw corpus, small curated target):

- featurization is one explode + map-side-combinable groupBy per
  corpus — the only wide op, O(doc x distinct-bucket) rows out;
- both bucket distributions aggregate those pairs (tiny);
- the log-ratio table is <= ``n_features`` rows — BROADCAST into the
  per-doc weight join, so scoring the raw corpus is one broadcast
  join + one hash re-aggregation, never a shuffle of the corpus
  against the target;
- top-k selection is a global TakeOrdered (heap of k per partition).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from katta_spark.ops.sampling import N_BUCKETS, hash_bucket
from katta_spark.tokenizer import tokens_array

#: hashed feature space; the DSIR paper uses 10^4 buckets
N_FEATURES = 8192


def _feature_bucket(feat: Column, n_features: int, salt: str) -> Column:
    """Deterministic bucket in [0, n_features): first 32 bits of
    md5(salt || feature) — same convention as ops.sampling/dedup."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), feat)), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(n_features))


def feature_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = N_FEATURES,
    salt: str = "",
) -> DataFrame:
    """(doc_id, bucket, cnt) — hashed unigram+bigram counts per doc,
    multiplicity kept (DSIR models occurrence counts, not presence).

    One explode + one map-side-combinable groupBy; rows out are
    bounded by docs x min(doc features, n_features)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_array(text_col).alias("t")
    )
    bi_idx = F.when(
        F.size("t") >= 2, F.sequence(F.lit(0), F.size("t") - 2)
    ).otherwise(F.array().cast("array<int>"))
    feats = F.concat(
        F.col("t"),
        F.transform(
            bi_idx, lambda i: F.concat_ws(" ", F.slice("t", i + 1, 2))
        ),
    )
    return (
        toks.select("doc_id", F.explode(feats).alias("feat"))
        .select(
            "doc_id",
            _feature_bucket(F.col("feat"), n_features, salt).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _log_ratio(
    raw_fc: DataFrame,
    target_fc: DataFrame,
    n_features: int,
    alpha: float,
) -> DataFrame:
    """(bucket, lr) over every bucket seen in the RAW corpus:
    ``lr = ln p_hat(bucket) - ln q_hat(bucket)`` with add-alpha
    smoothing (buckets unseen in the target still get finite mass).
    Buckets absent from raw never appear in a raw doc, so the table
    is complete for scoring; it is <= n_features rows — broadcast."""
    q = raw_fc.groupBy("bucket").agg(F.sum("cnt").alias("cq"))
    p = target_fc.groupBy("bucket").agg(F.sum("cnt").alias("cp"))
    tq = q.agg(F.sum("cq").alias("_tq"))
    tp = p.agg(F.sum("cp").alias("_tp"))
    a = float(alpha)
    denom = F.lit(a * n_features)
    joined = (
        q.join(p, "bucket", "left")
        .crossJoin(F.broadcast(tq))
        .crossJoin(F.broadcast(tp))
    )
    lr = F.log(
        (F.coalesce(F.col("cp"), F.lit(0)).cast("double") + F.lit(a))
        / (F.col("_tp").cast("double") + denom)
    ) - F.log(
        (F.col("cq").cast("double") + F.lit(a))
        / (F.col("_tq").cast("double") + denom)
    )
    return joined.select("bucket", lr.alias("lr"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = N_FEATURES,
    alpha: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """(doc_id, n_feats, logw) for every raw document: the log
    importance weight of the doc under the hashed-n-gram bag model,
    ``sum over features of cnt * (ln p_f - ln q_f)``, rounded to 6
    decimals (cross-engine float-sum convention).  Docs with no
    features score 0 (no evidence either way)."""
    raw_fc = feature_counts(raw, text_col, id_col, n_features, salt)
    tgt_fc = feature_counts(target, text_col, id_col, n_features, salt)
    lr = F.broadcast(_log_ratio(raw_fc, tgt_fc, n_features, alpha))
    per = (
        raw_fc.join(lr, "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("lr")).alias("_logw"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.round(F.coalesce("_logw", F.lit(0.0)), 6).alias("logw"),
        )
    )


def gumbel_key(logw: Column, id_col: Column, salt: str = "") -> Column:
    """Gumbel-perturbed key: ``logw + G`` with ``G = -ln(-ln(u))``
    and ``u`` a deterministic uniform in (0,1) hashed from the doc id
    (``(bucket + 0.5) / N_BUCKETS`` — never 0 or 1, so G is finite).
    Top-k by this key samples k docs without replacement with
    probability proportional to the importance weight (Gumbel-max),
    yet is reproducible and engine-portable."""
    u = (hash_bucket(id_col, salt) + F.lit(0.5)) / F.lit(float(N_BUCKETS))
    return logw + (-F.log(-F.log(u)))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = N_FEATURES,
    alpha: float = 1.0,
    salt: str = "",
    gumbel: bool = True,
) -> DataFrame:
    """Top-``k`` raw documents by (optionally Gumbel-perturbed) log
    importance weight: (doc_id, logw, key), key desc / doc_id asc.
    ``gumbel=False`` degenerates to deterministic top-k by weight
    (the 'top-k variant' ablation in the DSIR paper)."""
    w = dsir_weights(raw, target, text_col, id_col, n_features, alpha, salt)
    key = (
        gumbel_key(F.col("logw"), F.col("doc_id"), salt)
        if gumbel
        else F.col("logw")
    )
    return (
        w.withColumn("key", F.round(key, 6))
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(int(k))
        .select("doc_id", "logw", "key")
    )


def py_gumbel(u: float) -> float:
    """Python mirror of the Gumbel transform (test oracle)."""
    return -math.log(-math.log(u))
