"""Query surface: BM25 top-k, count, group, facet, range-facet, sorted
pagination, document fetch — the full query capability set of the
reference (operator inventory SURVEY.md §2), executed as Catalyst
plans over a :class:`~katta_spark.fulltext.analysis.LogicalIndex`.

Reference parity map:
- top-k search  -> LuceneServer SearchCall (lib/lucene/LuceneServer.java:1509-1552)
  with the exact client tie-break score desc, doc_id asc (Hit.compareTo,
  lib/lucene/Hit.java:126-139); Spark executes the global merge as
  TakeOrderedAndProject — structurally Katta's per-shard heap + merge.
- count         -> LuceneServer.count (LuceneServer.java:768-773)
- group         -> FunctionAllGroupsCollector (LuceneServer.java:1726-1764)
- facet         -> FacetV2Call two-pass grouping (LuceneServer.java:1904-1971)
- range facet   -> FacetRangeCall (LuceneServer.java:1197-1304, 2022-2065)
- sorted query  -> TopFieldCollector + typed merge (LuceneServer.java:931-961,
  1629-1636; Hits.fieldSort Hits.java:123-134)
- offset paging -> offset+limit pushed per shard, slice at client
  (LuceneServer.java:654-658; QueryResponse.java:125-140) — Spark's
  orderBy().offset().limit() does the same slice after the merge.
- fetch         -> getDetail stored-field fetch (LuceneServer.java:716-759)
  as a broadcast hash join (hits are tiny).

Filters (``fq``) are non-scoring conjunctive predicates, exactly
Katta's q+fq MUST conjunction (LuceneServer.java:1322-1352).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from katta_spark.fulltext.analysis import LogicalIndex, idf_expr, tfnorm_expr

Filters = dict[str, object] | None


def _filter_docs(index: LogicalIndex, filters: Filters) -> DataFrame | None:
    """doc_id set satisfying the fq equality filters, or None."""
    if not filters:
        return None
    cond = None
    for col, val in filters.items():
        c = F.col(col) == F.lit(val)
        cond = c if cond is None else (cond & c)
    return index.corpus.filter(cond).select("doc_id")


def scored_postings(index: LogicalIndex, qterms: list[str]) -> DataFrame:
    """(doc_id, term, score) per matching posting of the query terms.

    Physical shape: postings fetch filtered by term (partition/
    rowgroup pruning in the materialized engine), broadcast join with
    the per-term catalog slice and the 1-row stats, shuffle join with
    doc lengths.
    """
    terms = sorted(set(qterms))
    q = index.tf.filter(F.col("term").isin(terms))
    cat = index.terms.filter(F.col("term").isin(terms))
    q = q.join(F.broadcast(cat.select("term", "df")), "term")
    q = q.crossJoin(F.broadcast(index.stats))
    q = q.join(index.dl, "doc_id")
    score = idf_expr(F.col("df"), F.col("n_docs")) * tfnorm_expr(
        F.col("tf"), F.col("dl"), F.col("avgdl")
    )
    return q.select("doc_id", "term", score.alias("score"))


def matched_docs(
    index: LogicalIndex, qterms: list[str], mode: str = "or", filters: Filters = None
) -> DataFrame:
    """doc_id set matching the boolean query (no scores)."""
    terms = sorted(set(qterms))
    m = index.tf.filter(F.col("term").isin(terms))
    if mode == "and" and len(terms) > 1:
        m = (
            m.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("_nt"))
            .filter(F.col("_nt") == len(terms))
        )
    docs = m.select("doc_id").distinct()
    fd = _filter_docs(index, filters)
    if fd is not None:
        docs = docs.join(fd, "doc_id", "left_semi")
    return docs


def topk(
    index: LogicalIndex,
    qterms: list[str],
    k: int = 10,
    mode: str = "or",
    filters: Filters = None,
    offset: int = 0,
) -> DataFrame:
    """BM25 top-k: (doc_id, score), score desc / doc_id asc, sliced
    ``[offset, offset+k)``."""
    terms = sorted(set(qterms))
    sp = scored_postings(index, terms)
    agg = sp.groupBy("doc_id").agg(
        F.sum("score").alias("score"), F.count(F.lit(1)).alias("_nt")
    )
    if mode == "and" and len(terms) > 1:
        agg = agg.filter(F.col("_nt") == len(terms))
    fd = _filter_docs(index, filters)
    if fd is not None:
        agg = agg.join(fd, "doc_id", "left_semi")
    out = agg.select("doc_id", "score").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    if offset:
        out = out.offset(offset)
    return out.limit(k)


def count_query(
    index: LogicalIndex, qterms: list[str], mode: str = "or", filters: Filters = None
) -> DataFrame:
    """1-row (n_hits) — Katta's count() never materializes hits."""
    return matched_docs(index, qterms, mode, filters).agg(
        F.count(F.lit(1)).alias("n_hits")
    )


def group_values(
    index: LogicalIndex,
    qterms: list[str],
    field: str,
    mode: str = "or",
    filters: Filters = None,
) -> DataFrame:
    """Distinct values of ``field`` among matching docs."""
    docs = matched_docs(index, qterms, mode, filters)
    return (
        index.corpus.join(docs, "doc_id", "left_semi").select(field).distinct()
    )


def facet(
    index: LogicalIndex,
    qterms: list[str],
    field: str,
    n: int = 10,
    mode: str = "or",
    filters: Filters = None,
) -> DataFrame:
    """(field, cnt) top-n by cnt desc, field asc."""
    docs = matched_docs(index, qterms, mode, filters)
    return (
        index.corpus.join(docs, "doc_id", "left_semi")
        .groupBy(field)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(field))
        .limit(n)
    )


def range_facet(
    index: LogicalIndex,
    qterms: list[str],
    field: str,
    start: float,
    end: float,
    gap: float,
    min_count: int = 1,
    mode: str = "or",
    filters: Filters = None,
) -> DataFrame:
    """Histogram of ``field`` over [start,end) with step ``gap``:
    (bucket_start, cnt), cnt >= min_count, ordered by bucket_start."""
    docs = matched_docs(index, qterms, mode, filters)
    v = F.col(field).cast("double")
    bucket = F.floor((v - F.lit(float(start))) / F.lit(float(gap)))
    return (
        index.corpus.join(docs, "doc_id", "left_semi")
        .filter((v >= F.lit(float(start))) & (v < F.lit(float(end))))
        .select((F.lit(float(start)) + bucket * F.lit(float(gap))).alias("bucket_start"))
        .groupBy("bucket_start")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy("bucket_start")
    )


def sorted_query(
    index: LogicalIndex,
    qterms: list[str],
    sort_cols: list[tuple[str, str]],
    fields: list[str],
    limit: int,
    offset: int = 0,
    mode: str = "or",
    filters: Filters = None,
) -> DataFrame:
    """Field-sorted matching docs, paginated. ``sort_cols`` is a list
    of (column, 'asc'|'desc'); doc_id asc is always the final
    tie-break (deterministic pagination)."""
    docs = matched_docs(index, qterms, mode, filters)
    order: list[Column] = [
        F.asc(c) if d == "asc" else F.desc(c) for c, d in sort_cols
    ]
    order.append(F.asc("doc_id"))
    out = index.corpus.join(docs, "doc_id", "left_semi").orderBy(*order)
    if offset:
        out = out.offset(offset)
    return out.limit(limit).select(*fields)


def fetch_details(
    hits: DataFrame, corpus: DataFrame, fields: list[str]
) -> DataFrame:
    """Join top-k hits back to stored fields — broadcast hash join
    (hits are tiny), replacing Katta's per-hit getDetail RPC loop
    (katta-client/.../LuceneClient.java:319-360)."""
    cols = ["doc_id", *[f for f in fields if f != "doc_id"]]
    return F.broadcast(hits).join(corpus.select(*cols), "doc_id")
