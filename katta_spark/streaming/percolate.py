"""Percolation: standing term queries matched against a DOCUMENT
stream — the dual of a search index (queries are registered, documents
arrive; Lucene calls this the Monitor/"percolator" pattern).  Katta's
blck pipeline pushes document streams into shards for later search
(protocol/MasterStorageProtocol.java:160-214); percolation answers the
standing queries at ingest time instead, with no index round-trip.

Scale shape: completely STATELESS — per document, each standing
query's match test is a pure Column expression over the analyzed
token array (arrays_overlap for OR, forall/array_contains for AND),
so the operator runs in streaming append mode with zero state store,
survives any parallelism, and never shuffles.  The registered query
set is compiled into the plan (bounded, like a broadcast); thousands
of standing queries are fine, millions belong in an index-of-queries
(out of scope here, as for the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from katta_spark.tokenizer import tokens_array


def _match_cond(toks: Column, terms: list[str], mode: str) -> Column:
    tl = F.array(*[F.lit(t) for t in sorted(set(terms))])
    if mode == "or":
        return F.arrays_overlap(toks, tl)
    return F.forall(tl, lambda t: F.array_contains(toks, t))


def percolate(docs: DataFrame, queries: dict[str, list[str]],
              text_col: str = "content", id_col: str = "doc_id",
              mode: str = "or") -> DataFrame:
    """(id_col, qid) — one row per (document, standing query) match.

    Works identically on a batch DataFrame and on a readStream
    DataFrame (stateless narrow plan → append mode); batch/stream
    parity is tested.  ``mode`` applies to every query: "or" = any
    term present, "and" = all terms present."""
    # tokenize ONCE into a named column: the tokenizer expression
    # would otherwise re-evaluate per standing query (and, for phrase
    # windows, per position)
    base = docs.withColumn("__toks", tokens_array(text_col))
    toks = F.col("__toks")
    cases = [
        F.when(_match_cond(toks, terms, mode), F.lit(qid))
        for qid, terms in sorted(queries.items())
    ]
    matched = F.filter(F.array(*cases), lambda x: x.isNotNull())
    return base.select(F.col(id_col), F.explode(matched).alias("qid"))


def _lucene_cond(node, toks: Column, row) -> Column:
    """Compile a parsed Lucene AST node into a STATELESS match
    Column over the analyzed token array (MATCH-only — the Lucene
    percolator contract has no scores).  ``row`` resolves stored
    fields for field clauses."""
    from functools import reduce

    from katta_spark.fulltext.qparse import (
        Bool, ConstScore, Fuzzy, MatchAll, Phrase, RangeQ, Regex, Term,
        Wildcard,
    )

    def rec(n) -> Column:
        if isinstance(n, Term):
            if n.field is None:
                return F.array_contains(toks, n.text)
            return F.lower(row(n.field).cast("string")) == n.text
        if isinstance(n, Phrase):
            if n.field is not None:
                return F.lower(row(n.field).cast("string")) == n.words[0]
            m = len(n.words)
            want = F.array(*[F.lit(w) for w in n.words])
            return (F.size(toks) >= m) & F.exists(
                F.sequence(F.lit(1), F.size(toks) - m + 1),
                lambda i: F.slice(toks, i, m) == want,
            )
        if isinstance(n, Wildcard):
            pat = n.pattern.replace("%", r"\%").replace("_", r"\_")
            pat = pat.replace("*", "%").replace("?", "_")
            if n.field is None:
                return F.exists(toks, lambda t: t.like(pat))
            return F.lower(row(n.field).cast("string")).like(pat)
        if isinstance(n, Fuzzy):
            if n.field is None:
                return F.exists(
                    toks,
                    lambda t: F.levenshtein(t, F.lit(n.text)) <= n.max_edits,
                )
            return (
                F.levenshtein(
                    F.lower(row(n.field).cast("string")), F.lit(n.text)
                ) <= n.max_edits
            )
        if isinstance(n, Regex):
            anchored = f"^(?:{n.pattern})$"
            if n.field is None:
                return F.exists(toks, lambda t: t.rlike(anchored))
            return F.lower(row(n.field).cast("string")).rlike(anchored)
        if isinstance(n, RangeQ):
            c = row(n.field).cast("double")
            cond = F.lit(True)
            if n.lo is not None:
                cond = cond & (c >= float(n.lo) if n.incl_lo
                               else c > float(n.lo))
            if n.hi is not None:
                cond = cond & (c <= float(n.hi) if n.incl_hi
                               else c < float(n.hi))
            return cond
        if isinstance(n, MatchAll):
            return F.lit(True)
        if isinstance(n, ConstScore):
            return rec(n.child)
        assert isinstance(n, Bool)
        conds = []
        if n.must:
            conds.append(reduce(lambda a, b: a & b, map(rec, n.must)))
        if n.should and not n.must:
            # pure-SHOULD: at least one optional clause must match
            conds.append(reduce(lambda a, b: a | b, map(rec, n.should)))
        for mn in n.must_not:
            conds.append(~rec(mn))
        if not conds:
            return F.lit(False)
        from functools import reduce as red

        return red(lambda a, b: a & b, conds)

    return rec(node)


def percolate_lucene(docs: DataFrame, queries: dict[str, str],
                     text_col: str = "content",
                     id_col: str = "doc_id") -> DataFrame:
    """(id_col, qid) — percolation with FULL Lucene-syntax standing
    queries (the reference front-door grammar: boolean nesting,
    NOT/±, phrases, wildcards, fuzzy, regex, ranges, field clauses).
    Each query string parses once (driver-side) and compiles to a
    stateless Column condition over the analyzed token array — the
    same zero-state append-mode shape as :func:`percolate`, so it
    runs identically on batch and readStream inputs.  Match-only
    (no scores), per the Lucene percolator contract."""
    from katta_spark.fulltext.qparse import parse_lucene

    base = docs.withColumn("__toks", tokens_array(text_col))
    toks = F.col("__toks")  # named: evaluated once per row, not per
    # query / per phrase position (see percolate)

    def row(field: str) -> Column:
        return F.col(field)

    cases = [
        F.when(_lucene_cond(parse_lucene(q), toks, row), F.lit(qid))
        for qid, q in sorted(queries.items())
    ]
    matched = F.filter(F.array(*cases), lambda x: x.isNotNull())
    return base.select(F.col(id_col), F.explode(matched).alias("qid"))
