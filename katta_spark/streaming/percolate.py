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
    toks = tokens_array(text_col)
    cases = [
        F.when(_match_cond(toks, terms, mode), F.lit(qid))
        for qid, terms in sorted(queries.items())
    ]
    matched = F.filter(F.array(*cases), lambda x: x.isNotNull())
    return docs.select(F.col(id_col), F.explode(matched).alias("qid"))
