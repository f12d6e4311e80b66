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
