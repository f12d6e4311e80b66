"""Logical index model: term frequencies, document lengths, global stats.

This is the DataFrame-level definition of the inverted index.  The
materialized engine (build.py / search.py) persists these as
compressed posting blocks; the logical form is also directly
executable, which is what the driver's oracle-checked queries use.

The global term catalog (``doc_freqs``) restores the reference's
deprecated global-IDF exchange — "first call getDocFreqs() ... then
pass back into search(). This way you get uniform scoring across all
the nodes" (katta-core/.../lib/lucene/LuceneServer.java:76-82;
deprecated carrier lib/lucene/DocumentFrequencyWritable.java:49) —
as a broadcastable aggregate, making BM25 scores shard-count
invariant (precondition for rank-identity at any parallelism).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katta_spark.tokenizer import explode_tokens

K1 = 1.2
B = 0.75


def term_freqs(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, term, tf) — map-side partial aggregation is automatic."""
    toks = explode_tokens(corpus, text_col, ["doc_id"])
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def doc_lens(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, dl) for every doc — dl=0 for token-less docs.

    Computed as size(tokens) per row: no shuffle at all (narrow), vs
    the explode->groupBy alternative which shuffles every token.
    """
    from katta_spark.tokenizer import tokens_array

    return corpus.select(
        "doc_id", F.size(tokens_array(text_col)).cast("long").alias("dl")
    )


def corpus_stats(dl: DataFrame) -> DataFrame:
    """Single row (n_docs, avgdl). avgdl = total tokens / total docs."""
    return dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).cast("double").alias("avgdl"),
    )


def doc_freqs(tf: DataFrame) -> DataFrame:
    """Global term catalog (term, df, cf) — the merged shard dictionary."""
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


def idf_expr(df_col, n_col):
    """Lucene BM25Similarity idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return F.log(
        F.lit(1.0)
        + (n_col.cast("double") - df_col.cast("double") + F.lit(0.5))
        / (df_col.cast("double") + F.lit(0.5))
    )


def tfnorm_expr(tf_col, dl_col, avgdl_col):
    """tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), float64 end-to-end."""
    tf_d = tf_col.cast("double")
    return (tf_d * F.lit(K1 + 1.0)) / (
        tf_d
        + F.lit(K1)
        * (F.lit(1.0 - B) + F.lit(B) * dl_col.cast("double") / avgdl_col)
    )


@dataclass
class LogicalIndex:
    """Bundle of the index-model DataFrames over one corpus."""

    corpus: DataFrame  # doc_id + stored fields
    tf: DataFrame  # (doc_id, term, tf)
    dl: DataFrame  # (doc_id, dl)
    stats: DataFrame  # 1 row: (n_docs, avgdl)
    terms: DataFrame  # (term, df, cf) — global catalog

    @classmethod
    def build(cls, corpus: DataFrame, text_col: str = "content") -> "LogicalIndex":
        tf = term_freqs(corpus, text_col)
        dl = doc_lens(corpus, text_col)
        return cls(
            corpus=corpus,
            tf=tf,
            dl=dl,
            stats=corpus_stats(dl),
            terms=doc_freqs(tf),
        )

    def cache(self) -> "LogicalIndex":
        self.tf.cache()
        self.dl.cache()
        return self
