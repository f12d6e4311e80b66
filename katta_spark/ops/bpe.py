"""Distributed BPE vocabulary training (Sennrich et al., ACL 2016).

A training-data pipeline needs its tokenizer trained on the corpus it
will tokenize; at 100 TB the pair-counting pass is the distributed
part.  The shape that scales: aggregate the corpus ONCE into a
(term, count) vocabulary table (shuffle O(distinct terms) after
map-side combine — the classic Sennrich optimization), then run every
merge round over that vocabulary table only.  At web scale the vocab
is millions of rows while the corpus is trillions of tokens, so the
rounds are orders of magnitude cheaper than the single corpus pass.

Merge application is a JVM ``aggregate`` fold over the symbol array —
left-to-right, non-overlapping, exactly the reference greedy semantics
— so no Python touches the hot path.  Each round costs one hash
aggregation over the vocab; the winning pair is the only thing that
reaches the driver.

No counterpart in the reference (Katta serves Lucene analyzers);
BPE here plays the role schema.xml's analyzer chain plays there —
the tokenizer the engine ships alongside the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katta_spark.tokenizer import tokens_array


def term_vocab(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(term, cnt) — corpus term-occurrence counts, the one pass that
    touches every document.  Map-side combine makes the shuffle
    O(distinct terms)."""
    return (
        corpus.select(F.explode(tokens_array(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _char_symbols(term) -> F.Column:
    """Initial symbolization: one single-character symbol per char
    (the (?=.) lookahead stops ``split`` from emitting a trailing
    empty symbol)."""
    return F.split(term, "(?!^)(?=.)")


def initial_vocab(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(term, cnt, symbols) — the round-0 state: every term char-split."""
    return term_vocab(corpus, text_col).withColumn(
        "symbols", _char_symbols(F.col("term"))
    )


def pair_counts(vocab: DataFrame, symbols_col: str = "symbols",
                cnt_col: str = "cnt") -> DataFrame:
    """(a, b, cnt) — adjacent-symbol-pair counts over the vocabulary,
    weighted by term frequency.  One explode + hash agg; rows exploded
    = total symbols across DISTINCT terms only."""
    s = F.col(symbols_col)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(s) - 1),
        lambda i: F.struct(
            F.element_at(s, i).alias("a"),
            F.element_at(s, i + 1).alias("b"),
        ),
    )
    return (
        vocab.filter(F.size(s) >= 2)
        .select(F.explode(pairs).alias("p"), F.col(cnt_col))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum(cnt_col).alias("cnt"))
    )


def apply_merge(symbols, left: str, right: str):
    """Column expr: merge every left-to-right, non-overlapping
    adjacent (left, right) occurrence in the symbol array into one
    symbol — the reference BPE greedy merge, as a JVM ``aggregate``
    fold (no UDF)."""
    l_ = left.replace("\\", "\\\\").replace("'", "\\'")
    r_ = right.replace("\\", "\\\\").replace("'", "\\'")
    col_sql = symbols if isinstance(symbols, str) else None
    if col_sql is None:
        raise ValueError("pass the symbols column NAME (SQL identifier)")
    return F.expr(
        f"""
        aggregate(
          sequence(0, size({col_sql}) - 1),
          named_struct('acc', array()::array<string>, 'skip', false),
          (st, i) -> IF(st.skip,
            named_struct('acc', st.acc, 'skip', false),
            IF(i < size({col_sql}) - 1
                 AND {col_sql}[i] = '{l_}' AND {col_sql}[i + 1] = '{r_}',
               named_struct('acc',
                 array_append(st.acc, '{l_}' || '{r_}'), 'skip', true),
               named_struct('acc',
                 array_append(st.acc, {col_sql}[i]), 'skip', false))),
          st -> st.acc)
        """
    )


def bpe_train(corpus: DataFrame, n_merges: int,
              text_col: str = "content") -> tuple[list[tuple], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns ``(merges, vocab)``: ``merges`` is the ordered list of
    ``(left, right, cnt)`` rules; ``vocab`` the final symbolized
    vocabulary DataFrame (term, cnt, symbols).

    Driver loop: one hash-agg job per round over the (cached) vocab
    table; ties break (cnt desc, a asc, b asc) so training is
    deterministic under any partitioning.  The vocab is re-cached
    every round and the previous round unpersisted, keeping lineage
    and memory bounded for large ``n_merges``.
    """
    vocab = initial_vocab(corpus, text_col).cache()
    merges: list[tuple] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((a, b, int(c)))
        prev = vocab
        vocab = prev.withColumn("symbols", apply_merge("symbols", a, b)).cache()
        vocab.count()  # materialize before dropping the parent cache
        prev.unpersist()
    return merges, vocab
