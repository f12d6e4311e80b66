"""Search-quality evaluation: the ES ``_rank_eval`` API / TREC eval
surface over any (qid, doc_id, rank) result table.

Reference anchor: the reference exposes search quality only through
its load-test harness (katta-core loadtest tooling); offline ranking
metrics are the modern equivalent every search migration runs before
switching engines — so the op takes OUR engine's rankings plus a
judgment table and scores them.

Metrics per query (all standard definitions):
- ``p_at_k``  — precision at k: relevant-in-top-k / k;
- ``mrr``     — reciprocal rank of the FIRST relevant hit (0 if none);
- ``ndcg``    — DCG@k / ideal-DCG@k with the (2^grade - 1) gain form.

Scale shape: one join of the rank-filtered results against the
judgment table (broadcast — judgments are the small side by
construction), two hash aggs (per-query metrics, ideal-DCG ranks via
a per-qid window over the judgments), zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: hard ceiling on a fusion shortlist — the fuse windows are
#: single-partition BY DESIGN (they run over top-k lists, never the
#: corpus); feeding an unbounded DataFrame would silently become a
#: one-partition sort of everything.  Past this, fail loudly.
FUSE_MAX_LIST_ROWS = 100_000


def _guard_msg(op: str, cap: int) -> str:
    return (
        f"{op} fuses bounded top-k shortlists only, but got an "
        f"input with more than {cap} rows - cut it with "
        f".limit()/topk before fusing (the per-list rank/min-max "
        f"window is single-partition on purpose and would "
        f"otherwise sort the whole input on one core)"
    )


def rrf_fuse(lists: list[tuple[DataFrame, str]], id_col: str = "doc_id",
             k_const: int = 60, n: int = 10,
             max_list_rows: int = FUSE_MAX_LIST_ROWS) -> DataFrame:
    """ES 8 hybrid-search reciprocal rank fusion: fuse N ranked
    shortlists (e.g. a BM25 top-k and a vector-kNN top-k) into one
    ranking with ``score = sum_i 1 / (k_const + rank_i)``, where
    ``rank_i`` is the 1-based position in list *i* under the standard
    (score desc, id asc) tie-break; ids absent from a list contribute
    nothing for it — exactly the ES ``rrf`` retriever semantics.

    ``lists``: (shortlist DataFrame, its score column name) pairs;
    each must already be a bounded top-k result.  Scale shape: the
    per-list rank window is single-partition ON PURPOSE — it runs
    over <= k rows, never the corpus — and the fuse is one tiny hash
    agg, so cost is O(sum of shortlist sizes) regardless of corpus
    size.  Returns (id, rrf_score, n_lists), rrf_score desc / id asc
    (rounded score drives the ordering so near-ulp sum differences
    cannot flip ranks across engines).  Inputs larger than
    ``max_list_rows`` raise AT EXECUTION — the guard is an in-plan
    ``limit(cap+1)`` + ``assert_true(rank <= cap)``, so it bounds the
    single-partition window structurally and costs ZERO extra jobs
    (a pre-count probe would re-run each shortlist's whole upstream
    lineage once per fuse)."""
    cap = int(max_list_rows)
    parts = []
    for df, score_col in lists:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        rk = F.row_number().over(w)
        # guard folded INTO the load-bearing rank column (a dropped
        # assert column would be pruned by Catalyst and never run)
        guarded = F.when(rk <= F.lit(cap), rk).otherwise(
            F.raise_error(_guard_msg("rrf_fuse", cap)).cast("int")
        )
        parts.append(
            df.limit(cap + 1)
            .select(F.col(id_col), guarded.alias("_rk"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(
                F.sum(
                    F.lit(1.0)
                    / (F.lit(float(k_const)) + F.col("_rk").cast("double"))
                ),
                6,
            ).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(int(n))
    )


def rank_eval(results: DataFrame, judgments: DataFrame, k: int = 10,
              qid_col: str = "qid", id_col: str = "doc_id",
              rank_col: str = "rank",
              grade_col: str = "grade") -> DataFrame:
    """(qid, n_judged, p_at_k, mrr, ndcg) — one row per query.

    ``results``: (qid, doc_id, rank) with rank starting at 1 in
    engine order.  ``judgments``: (qid, doc_id, grade) with grade >
    0 meaning relevant (graded values feed NDCG's gain).  Queries
    with no relevant judgment score 0 across the board rather than
    being dropped."""
    kk = int(k)
    r = results.filter(F.col(rank_col) <= kk).join(
        F.broadcast(
            judgments.select(
                F.col(qid_col), F.col(id_col),
                F.col(grade_col).cast("double").alias("_g"),
            )
        ),
        [qid_col, id_col],
        "left",
    ).withColumn("_g", F.coalesce("_g", F.lit(0.0)))
    gain = F.pow(F.lit(2.0), F.col("_g")) - F.lit(1.0)
    disc = F.log2(F.col(rank_col).cast("double") + F.lit(1.0))
    per = r.groupBy(qid_col).agg(
        (F.sum((F.col("_g") > 0).cast("int")) / F.lit(float(kk)))
        .alias("_p"),
        F.max(
            F.when(F.col("_g") > 0,
                   F.lit(1.0) / F.col(rank_col).cast("double"))
        ).alias("_rr"),
        F.sum(gain / disc).alias("_dcg"),
    )
    # ideal DCG@k from the judgment table itself (grade desc, id asc)
    jw = Window.partitionBy(qid_col).orderBy(
        F.col(grade_col).cast("double").desc(), F.col(id_col).asc()
    )
    ideal = (
        judgments.filter(F.col(grade_col) > 0)
        .withColumn("_ir", F.row_number().over(jw))
        .filter(F.col("_ir") <= kk)
        .groupBy(qid_col)
        .agg(
            F.count(F.lit(1)).alias("n_judged"),
            F.sum(
                (F.pow(F.lit(2.0), F.col(grade_col).cast("double"))
                 - F.lit(1.0))
                / F.log2(F.col("_ir").cast("double") + F.lit(1.0))
            ).alias("_idcg"),
        )
    )
    out = per.join(ideal, qid_col, "left")
    return out.select(
        F.col(qid_col),
        F.coalesce("n_judged", F.lit(0)).alias("n_judged"),
        F.round("_p", 6).alias("p_at_k"),
        F.round(F.coalesce("_rr", F.lit(0.0)), 6).alias("mrr"),
        F.round(
            F.when(
                F.coalesce("_idcg", F.lit(0.0)) > 0,
                F.col("_dcg") / F.col("_idcg"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg"),
    ).orderBy(qid_col)


def linear_fuse(lists: list[tuple[DataFrame, str, float]],
                id_col: str = "doc_id", n: int = 10,
                max_list_rows: int = FUSE_MAX_LIST_ROWS) -> DataFrame:
    """ES 8 ``linear`` retriever: fuse N shortlists by WEIGHTED
    MIN-MAX-NORMALIZED scores — ``score = sum_i w_i * (s_i - min_i)
    / (max_i - min_i)`` over each list's own score range (a
    single-score list normalizes to 1.0, ES convention); ids absent
    from a list contribute 0 for it.

    ``lists``: (shortlist DataFrame, score column, weight) triples;
    each must already be a bounded top-k.  Scale shape: per-list
    min/max come from an unpartitioned window over <= k rows (never
    the corpus), the fuse is one tiny hash agg — O(sum of shortlist
    sizes).  Normalized contributions are rounded to 6dp BEFORE the
    weighted sum so near-ulp differences cannot flip ranks across
    engines.  Returns (id, lin_score, n_lists).  Inputs larger than
    ``max_list_rows`` raise AT EXECUTION (same zero-extra-job guard
    as :func:`rrf_fuse`: in-plan limit + assert on the window
    count)."""
    cap = int(max_list_rows)
    parts = []
    for df, score_col, weight in lists:
        w = Window.partitionBy()
        s = F.col(score_col).cast("double")
        rng = F.max(s).over(w) - F.min(s).over(w)
        norm = F.when(rng > 0, (s - F.min(s).over(w)) / rng).otherwise(
            F.lit(1.0)
        )
        contrib = F.lit(float(weight)) * F.round(norm, 6)
        # guard folded INTO the load-bearing contribution column
        # (see rrf_fuse: a dropped assert column would be pruned)
        guarded = F.when(
            F.count(F.lit(1)).over(w) <= F.lit(cap), contrib
        ).otherwise(
            F.raise_error(_guard_msg("linear_fuse", cap)).cast("double")
        )
        parts.append(
            df.limit(cap + 1).select(F.col(id_col),
                                     guarded.alias("_c"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(F.sum("_c"), 6).alias("lin_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("lin_score"), F.asc(id_col))
        .limit(int(n))
    )
