"""Benchmark decontamination: token n-gram overlap of a training
corpus against an evaluation/benchmark set — the standard
13-gram-style decontamination pass of LLM training pipelines, with
the n configurable.

No reference analogue (training-data op beyond zhenqin/katta); the
n-gram machinery is shared with :mod:`katta_spark.ops.dedup`.

Scale shape (100 TB corpus vs a benchmark set of ~10^6 n-grams):

- the benchmark inventory is tiny next to the corpus: distinct it,
  hash it to 8-byte keys, and BROADCAST it into the corpus-side
  explode — the corpus is scanned once and the only wide operation is
  the per-doc count re-aggregation (map-side combinable);
- join keys are ``xxhash64(shingle)`` (8 bytes) rather than shingle
  strings (~10x narrower broadcast; a 2^-64 hash collision marks a
  clean doc contaminated — an error in the conservative direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katta_spark.ops.dedup import _shingles


def ngram_overlap(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    bench_text_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination report against ``bench``:
    ``(doc_id, n_ngrams, n_matched, overlap, contaminated)`` where
    ``overlap`` is the fraction of the doc's DISTINCT token n-grams
    present anywhere in the benchmark set.  Docs shorter than ``n``
    tokens have zero n-grams and report overlap 0.0 (nothing to
    leak)."""
    bench_text_col = bench_text_col or text_col
    sh = _shingles(corpus, text_col, n).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )
    bset = F.broadcast(
        _shingles(bench, bench_text_col, n)
        .select(F.xxhash64("shingle").alias("h"))
        .distinct()
    )
    per = (
        sh.join(bset.withColumn("_hit", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
        )
    )
    frac = F.coalesce(
        F.col("n_matched").cast("double") / F.col("n_ngrams"), F.lit(0.0)
    )
    return (
        corpus.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.round(frac, 6).alias("overlap"),
            (frac >= F.lit(threshold)).alias("contaminated"),
        )
    )


def minhash_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    bench_text_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """FUZZY decontamination: ``(doc_id, bench_id, n_bands,
    jaccard_est, contaminated)`` for every corpus doc whose MinHash
    signature collides with a benchmark doc in >=1 LSH band —
    catches paraphrased / partially-edited benchmark leakage the
    exact n-gram pass (:func:`ngram_overlap`) misses, the companion
    check LLM training pipelines run alongside it.  ``jaccard_est``
    is the signature-agreement estimate (fraction of the
    ``num_hashes`` MinHash slots that agree — with 16 hashes every
    value is an exact multiple of 1/16, so the threshold compare is
    bit-deterministic and SQL-mirrorable).

    ``exclude_self`` (default True) drops doc_id == bench_id pairs —
    correct ONLY when the benchmark is carved from the corpus and
    shares its id space (every bench doc would otherwise trivially
    flag itself).  Pass ``exclude_self=False`` for an INDEPENDENT
    benchmark table: there an id collision is coincidence, and
    dropping the pair would silently hide a genuine verbatim leak.

    Scale shape (100 TB corpus vs a benchmark of ~10^4-10^6 docs):
    the benchmark's banded buckets AND signatures are tiny —
    both BROADCAST; the corpus is shingled and signed ONCE (the same
    docs x bands shuffle as minhash_lsh_pairs, never docs^2), and the
    candidate id set (bounded by benchmark size x bucket collisions,
    not corpus size) broadcasts back into the corpus signature side
    so no corpus-wide shuffle follows the band join."""
    from katta_spark.ops.dedup import band_buckets, minhash_signatures

    bench_text_col = bench_text_col or text_col
    cb = band_buckets(corpus, num_hashes, bands, n, text_col)
    bb = band_buckets(bench, num_hashes, bands, n, bench_text_col)
    cand = cb.join(
        F.broadcast(bb.withColumnRenamed("doc_id", "bench_id")),
        ["band", "bucket"],
    )
    if exclude_self:
        cand = cand.filter(F.col("doc_id") != F.col("bench_id"))
    cand = cand.groupBy("doc_id", "bench_id").agg(
        F.count(F.lit(1)).alias("n_bands")
    )
    sig_c = minhash_signatures(corpus, num_hashes, n, text_col).join(
        F.broadcast(cand.select("doc_id").distinct()), "doc_id",
        "left_semi",
    )
    sig_b = (
        minhash_signatures(bench, num_hashes, n, bench_text_col)
        .withColumnRenamed("doc_id", "bench_id")
        .withColumnRenamed("minhash", "mh_b")
    )
    agree = (
        cand.join(sig_c, "doc_id")
        .join(F.broadcast(sig_b), ["bench_id", "h_idx"])
        .groupBy("doc_id", "bench_id", "n_bands")
        .agg(
            F.avg(
                (F.col("minhash") == F.col("mh_b")).cast("double")
            ).alias("est")
        )
    )
    return agree.select(
        "doc_id", "bench_id", "n_bands",
        F.round("est", 6).alias("jaccard_est"),
        (F.col("est") >= F.lit(threshold)).alias("contaminated"),
    )
