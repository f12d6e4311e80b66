"""DuckDB oracle-SQL builders for the driver's correctness gate.

Every fragment is generated from the SAME constants as the engine
(tokenizer regexes, BM25 k1/b) so the Spark implementation and the
SQL oracle cannot drift.  The driver pre-registers the testdata
parquet files as views named ``documents``, ``embeddings``, etc.
"""

from __future__ import annotations

from katta_spark.fulltext.analysis import B, K1
from katta_spark.tokenizer import duckdb_tokens_sql

DOCS = "documents"


def index_ctes(stopwords: list[str] = (),
               docs_where: str | None = None,
               token_filters: list[str] = ()) -> str:
    """Shared CTE prefix: tok / tf / dl / stats / dfv over documents —
    the SQL mirror of :class:`katta_spark.fulltext.analysis.LogicalIndex`.
    ``stopwords`` mirrors build_index(stopwords=...): dropped from tok
    before dl/tf, so BM25 norms see the post-filter length.
    ``docs_where`` restricts the corpus (snapshot-read oracles): stats,
    df and scores are all computed over the restricted set, exactly as
    a commit-pinned PhysicalIndex does."""
    docs_src = (
        f"(SELECT * FROM {DOCS} WHERE {docs_where})" if docs_where else DOCS
    )
    text_expr = "text"
    if "ascii_fold" in token_filters:
        from katta_spark.tokenizer import fold_text_sql

        text_expr = fold_text_sql("text")
    tok = duckdb_tokens_sql(docs_src, "doc_id", text_expr)
    if stopwords:
        stops = ", ".join(
            "'" + s.replace("'", "''") + "'" for s in sorted(set(stopwords))
        )
        tok = f"SELECT * FROM ({tok}) WHERE term NOT IN ({stops})"
    if "stem_plural" in token_filters:
        from katta_spark.tokenizer import stem_token_sql

        tok = (
            f"SELECT doc_id, {stem_token_sql('term')} AS term "
            f"FROM ({tok})"
        )
    return f"""WITH tok AS ({tok}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT d.doc_id, count(t.term) AS dl
       FROM {docs_src} d LEFT JOIN tok t ON d.doc_id = t.doc_id GROUP BY d.doc_id),
stats AS (SELECT count(*) AS n_docs,
                 CAST((SELECT count(*) FROM tok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
          FROM {docs_src}),
dfv AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term)"""


def score_sql() -> str:
    """Per-posting BM25 score — parenthesized exactly like the Spark
    expression tree in analysis.idf_expr/tfnorm_expr."""
    idf = (
        "ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(dfv.df AS DOUBLE) + 0.5)"
        " / (CAST(dfv.df AS DOUBLE) + 0.5))"
    )
    tfn = (
        f"(CAST(tf.tf AS DOUBLE) * {K1 + 1.0!r}) / (CAST(tf.tf AS DOUBLE)"
        f" + {K1!r} * ({1.0 - B!r} + {B!r} * CAST(dl.dl AS DOUBLE) / stats.avgdl))"
    )
    return f"{idf} * {tfn}"


def _term_list(terms: list[str]) -> str:
    inner = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"({inner})"


def _scored_ctes(
    terms: list[str],
    k: int,
    mode: str = "or",
    filter_sql: str | None = None,
    offset: int = 0,
) -> str:
    """CTE suffix producing ``top(doc_id, score)`` — the k-slice of the
    BM25-scored matching docs, tie-break score desc / doc_id asc."""
    n_terms = len(set(terms))
    having = f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    flt = (
        f"AND tf.doc_id IN (SELECT doc_id FROM {DOCS} WHERE {filter_sql})"
        if filter_sql
        else ""
    )
    off = f"OFFSET {offset}" if offset else ""
    return f""",
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf
  JOIN dfv ON tf.term = dfv.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)} {flt}
  GROUP BY tf.doc_id {having}
),
top AS (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k} {off})"""


def topk_sql(
    terms: list[str],
    k: int = 10,
    mode: str = "or",
    filter_sql: str | None = None,
    offset: int = 0,
    stopwords: list[str] = (),
    docs_where: str | None = None,
) -> str:
    qt = [t for t in terms if t not in set(stopwords)]
    ctes = index_ctes(stopwords, docs_where)
    return f"""{ctes}{_scored_ctes(qt, k, mode, filter_sql, offset)}
SELECT doc_id, round(score, 6) AS score FROM top"""


def topk_fetch_sql(terms: list[str], k: int, fields: list[str]) -> str:
    cols = ", ".join(f"d.{f}" for f in fields)
    return f"""{index_ctes()}{_scored_ctes(terms, k)}
SELECT t.doc_id, round(t.score, 6) AS score, {cols}
FROM top t JOIN {DOCS} d ON t.doc_id = d.doc_id"""


def phrase_sql(phrase: list[str], k: int = 10) -> str:
    """Phrase top-k oracle: AND-scored candidates intersected with
    docs whose ordered token list contains the phrase consecutively."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    m = len(phrase)
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    conj = " AND ".join(
        f"toks[i + {d}] = '{t.replace(chr(39), chr(39)*2)}'"
        for d, t in enumerate(phrase)
    )
    return f"""{index_ctes()},
tokl AS ({tokl}),
verified AS (
  SELECT doc_id FROM tokl
  WHERE len(toks) >= {m}
    AND len(list_filter(generate_series(1, len(toks) - {m - 1}),
                        i -> {conj})) > 0
),
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf
  JOIN dfv ON tf.term = dfv.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(phrase)}
  GROUP BY tf.doc_id HAVING count(*) = {len(set(phrase))}
),
top AS (
  SELECT s.doc_id, s.score FROM scored s JOIN verified v ON s.doc_id = v.doc_id
  ORDER BY s.score DESC, s.doc_id ASC LIMIT {k}
)
SELECT doc_id, round(score, 6) AS score FROM top"""


def multi_phrase_sql(slots: list[list[str]], k: int = 10) -> str:
    """MultiPhraseQuery top-k oracle: verified = docs whose ordered
    token list contains, consecutively, one alternative from every
    slot; score = BM25 sum over every alternative present in the doc
    (no HAVING — absent alternatives contribute 0), mirroring
    make_multi_phrase_kernel."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    m = len(slots)
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")

    def slot_cond(d: int, alts: list[str]) -> str:
        vals = ", ".join(
            "'" + t.replace("'", "''") + "'" for t in sorted(set(alts))
        )
        if len(set(alts)) == 1:
            return f"toks[i + {d}] = {vals}"
        return f"toks[i + {d}] IN ({vals})"

    conj = " AND ".join(slot_cond(d, s) for d, s in enumerate(slots))
    all_terms = sorted({t for s in slots for t in s})
    return f"""{index_ctes()},
tokl AS ({tokl}),
verified AS (
  SELECT doc_id FROM tokl
  WHERE len(toks) >= {m}
    AND len(list_filter(generate_series(1, len(toks) - {m - 1}),
                        i -> {conj})) > 0
),
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf
  JOIN dfv ON tf.term = dfv.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(all_terms)}
  GROUP BY tf.doc_id
),
top AS (
  SELECT s.doc_id, s.score FROM scored s JOIN verified v ON s.doc_id = v.doc_id
  ORDER BY s.score DESC, s.doc_id ASC LIMIT {k}
)
SELECT doc_id, round(score, 6) AS score FROM top"""


def near_sql(terms: list[str], slop: int = 0, k: int = 10) -> str:
    """Unordered-proximity top-k oracle: verified = docs with some
    (m+slop)-position window containing ALL distinct terms (any
    order); score = BM25 sum of the terms."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    qterms = sorted(set(t.lower() for t in terms))
    m = len(qterms)
    limit = m - 1 + slop
    tlist = "[" + ", ".join(
        "'" + t.replace("'", "''") + "'" for t in qterms
    ) + "]"
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    return f"""{index_ctes()},
tokl AS ({tokl}),
verified AS (
  SELECT doc_id FROM tokl
  WHERE len(list_filter(generate_series(1, len(toks)),
        i -> list_has_all(list_slice(toks, i, i + {limit}), {tlist}))) > 0
),
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf
  JOIN dfv ON tf.term = dfv.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(qterms)}
  GROUP BY tf.doc_id HAVING count(*) = {m}
),
top AS (
  SELECT s.doc_id, s.score FROM scored s JOIN verified v ON s.doc_id = v.doc_id
  ORDER BY s.score DESC, s.doc_id ASC LIMIT {k}
)
SELECT doc_id, round(score, 6) AS score FROM top"""


def span_not_sql(include: str, exclude: str, pre: int = 0, post: int = 0,
                 k: int = 10) -> str:
    """SpanNot oracle (mirror of PhysicalIndex.span_not_topk):
    surviving positions of ``include`` = those with no ``exclude``
    token in the window [p-pre, p+post]; score = single-term BM25
    with tf = surviving count, idf from the include term's df."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    a = include.lower().replace("'", "''")
    x = exclude.lower().replace("'", "''")
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    idf = (
        "ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(dfv.df AS DOUBLE)"
        " + 0.5) / (CAST(dfv.df AS DOUBLE) + 0.5))"
    )
    tfn = (
        f"(CAST(s.tfp AS DOUBLE) * {K1 + 1.0!r}) / (CAST(s.tfp AS DOUBLE)"
        f" + {K1!r} * ({1.0 - B!r} + {B!r} * CAST(dl.dl AS DOUBLE)"
        " / stats.avgdl))"
    )
    return f"""{index_ctes()},
tokl AS ({tokl}),
surv AS (
  SELECT doc_id,
         len(list_filter(generate_series(1, len(toks)),
             p -> toks[p] = '{a}'
                  AND NOT list_contains(
                        list_slice(toks, greatest(1, p - {int(pre)}),
                                   p + {int(post)}), '{x}'))) AS tfp
  FROM tokl
),
scored AS (
  SELECT s.doc_id, {idf} * {tfn} AS score
  FROM surv s
  JOIN dl ON s.doc_id = dl.doc_id
  JOIN dfv ON dfv.term = '{a}'
  CROSS JOIN stats
  WHERE s.tfp > 0
)
SELECT doc_id, round(score, 6) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT {int(k)})"""


def field_score_sql(field: str, value_lower: str) -> str:
    """BM25 score of a scored FIELD term (build_index field_cols):
    tf = 1 (one keyword posting per doc), dl = content dl, df = docs
    with that field value."""
    fdf = (
        f"(SELECT count(*) FROM {DOCS} "
        f"WHERE lower(CAST({field} AS VARCHAR)) = '{value_lower}')"
    )
    idf = (
        f"ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST({fdf} AS DOUBLE) + 0.5)"
        f" / (CAST({fdf} AS DOUBLE) + 0.5))"
    )
    tfn = (
        f"(1.0 * {K1 + 1.0!r}) / (1.0"
        f" + {K1!r} * ({1.0 - B!r} + {B!r} * CAST(dl.dl AS DOUBLE) / stats.avgdl))"
    )
    return f"{idf} * {tfn}"


def lucene_topk_sql(
    terms: list[tuple[str, float]],
    field_terms: list[tuple[str, str, float]] = (),
    like_patterns: list[str] = (),
    edit_patterns: list[tuple[str, int]] = (),
    regex_patterns: list[str] = (),
    const_parts: list[tuple[str, float]] = (),
    require_all: bool = False,
    must_doc_sql: list[str] = (),
    not_doc_sql: list[str] = (),
    filter_sql: str | None = None,
    k: int = 10,
    offset: int = 0,
) -> str:
    """Oracle for the boolean query evaluator: per-clause score parts
    UNION'd then summed per doc, with doc-set constraints.

    ``terms``          scored content terms with boosts.
    ``field_terms``    (field, lowercased value, boost) scored field
                       postings clauses.
    ``like_patterns``  wildcard clauses — every content term matching
                       the LIKE pattern scores (expand-and-score).
    ``edit_patterns``  fuzzy clauses (text, max_edits) — every content
                       term within classic levenshtein distance scores.
    ``regex_patterns`` RegexpQuery clauses — every content term the
                       regex FULLY matches scores (keep patterns in
                       the Java/RE2-portable subset).
    ``const_parts``    constant-score clauses (doc_id SELECT, value):
                       every doc in the set contributes exactly
                       ``value`` (Lucene ``atom^=N``).
    ``require_all``    flat-AND: every terms/field_terms clause must
                       match (wildcards excluded from the count).
    ``must_doc_sql``   list of SELECTs yielding doc_id sets the doc
                       must belong to (nested MUST sub-queries).
    ``not_doc_sql``    doc_id sets the doc must NOT belong to.
    """
    parts = []
    for t, boost in terms:
        tq = t.replace("'", "''")
        parts.append(
            f"""  SELECT tf.doc_id, {score_sql()} * {float(boost)!r} AS s,
         1 AS is_clause
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats WHERE tf.term = '{tq}'"""
        )
    for fld, val, boost in field_terms:
        vq = val.replace("'", "''")
        parts.append(
            f"""  SELECT d.doc_id, {field_score_sql(fld, vq)} * {float(boost)!r} AS s,
         1 AS is_clause
  FROM {DOCS} d JOIN dl ON d.doc_id = dl.doc_id CROSS JOIN stats
  WHERE lower(CAST(d.{fld} AS VARCHAR)) = '{vq}'"""
        )
    for pat in like_patterns:
        parts.append(
            f"""  SELECT tf.doc_id, {score_sql()} AS s, 0 AS is_clause
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats WHERE tf.term LIKE '{pat}'"""
        )
    for txt, dist in edit_patterns:
        tq = txt.replace("'", "''")
        parts.append(
            f"""  SELECT tf.doc_id, {score_sql()} AS s, 0 AS is_clause
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats WHERE levenshtein(tf.term, '{tq}') <= {int(dist)}"""
        )
    for pat in regex_patterns:
        pq = pat.replace("'", "''")
        parts.append(
            f"""  SELECT tf.doc_id, {score_sql()} AS s, 0 AS is_clause
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats WHERE regexp_full_match(tf.term, '{pq}')"""
        )
    for dsql, val in const_parts:
        parts.append(
            f"""  SELECT doc_id, {float(val)!r} AS s, 1 AS is_clause
  FROM ({dsql}) GROUP BY doc_id"""
        )
    union = "\nUNION ALL\n".join(parts)
    n_clauses = len(terms) + len(field_terms) + len(const_parts)
    having = (
        f"HAVING sum(is_clause) = {n_clauses}"
        if require_all and n_clauses > 1
        else ""
    )
    conds = []
    for m in must_doc_sql:
        conds.append(f"doc_id IN ({m})")
    for nm in not_doc_sql:
        conds.append(f"doc_id NOT IN ({nm})")
    if filter_sql:
        conds.append(f"doc_id IN (SELECT doc_id FROM {DOCS} WHERE {filter_sql})")
    where = ("WHERE " + " AND ".join(conds)) if conds else ""
    off = f"OFFSET {offset}" if offset else ""
    return f"""{index_ctes()},
parts AS (
{union}
),
scored AS (
  SELECT doc_id, sum(s) AS score FROM parts GROUP BY doc_id {having}
),
top AS (SELECT * FROM scored {where}
        ORDER BY score DESC, doc_id ASC LIMIT {k} {off})
SELECT doc_id, round(score, 6) AS score FROM top"""


def rank_eval_sql(queries: list[tuple[str, list[str]]],
                  judgments: list[tuple[str, str]],
                  k: int = 10) -> str:
    """Oracle for ops.search_eval.rank_eval over engine BM25 top-k
    runs: ``queries`` = [(qid, terms)], ``judgments`` = [(qid,
    where-clause over documents)] with binary grade 1."""
    res_parts = []
    for qid, terms in queries:
        res_parts.append(f"""
  SELECT * FROM (
    SELECT '{qid}' AS qid, doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
    FROM (SELECT tf.doc_id, sum({score_sql()}) AS score
          FROM tf
          JOIN dfv ON tf.term = dfv.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN stats
          WHERE tf.term IN {_term_list(terms)}
          GROUP BY tf.doc_id)
  ) WHERE rank <= {int(k)}""")
    judg_parts = [
        f"SELECT '{qid}' AS qid, doc_id, 1.0 AS grade FROM {DOCS}"
        f" WHERE {where}"
        for qid, where in judgments
    ]
    return f"""{index_ctes()},
res AS ({'UNION ALL'.join(res_parts)}),
judg AS ({' UNION ALL '.join(judg_parts)}),
r AS (
  SELECT res.qid, res.rank, coalesce(j.grade, 0.0) AS g
  FROM res LEFT JOIN judg j
    ON res.qid = j.qid AND res.doc_id = j.doc_id
),
per AS (
  SELECT qid,
         sum(CASE WHEN g > 0 THEN 1 ELSE 0 END) / {float(k)!r} AS p,
         max(CASE WHEN g > 0 THEN 1.0 / rank END) AS rr,
         sum((pow(2.0, g) - 1.0) / log2(rank + 1.0)) AS dcg
  FROM r GROUP BY qid
),
ideal AS (
  SELECT qid, CAST(count(*) AS BIGINT) AS n_judged,
         sum((pow(2.0, grade) - 1.0) / log2(ir + 1.0)) AS idcg
  FROM (SELECT qid, grade, doc_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY grade DESC, doc_id ASC) AS ir
        FROM judg WHERE grade > 0)
  WHERE ir <= {int(k)} GROUP BY qid
)
SELECT p.qid, coalesce(i.n_judged, 0) AS n_judged,
       round(p.p, 6) AS p_at_k,
       round(coalesce(p.rr, 0.0), 6) AS mrr,
       round(CASE WHEN coalesce(i.idcg, 0.0) > 0
             THEN p.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg
FROM per p LEFT JOIN ideal i ON p.qid = i.qid ORDER BY p.qid"""


def cross_fields_sql(words: list[str], fields: list[str],
                     k: int = 10) -> str:
    """Oracle for PhysicalIndex.cross_fields_topk: per-word blended
    df (greatest over the word's variants), per-variant BM25 with the
    blended IDF, per-word max, per-doc sum."""
    def fdf(f: str, w: str) -> str:
        return (f"(SELECT count(*) FROM {DOCS} "
                f"WHERE lower(CAST({f} AS VARCHAR)) = '{w}')")

    def cdf(w: str) -> str:
        return f"(SELECT coalesce(max(df), 0) FROM dfv WHERE term = '{w}')"

    parts = []
    for w in sorted({x.lower().replace("'", "''") for x in words}):
        dfs = [cdf(w) if f == "content" else fdf(f, w) for f in fields]
        bdf = ("greatest(" + ", ".join(dfs) + ")") if len(dfs) > 1 else dfs[0]
        idf = (
            f"ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST({bdf} AS DOUBLE)"
            f" + 0.5) / (CAST({bdf} AS DOUBLE) + 0.5))"
        )
        for f in fields:
            tfn_field = (
                f"(1.0 * {K1 + 1.0!r}) / (1.0 + {K1!r} * ({1.0 - B!r}"
                f" + {B!r} * CAST(dl.dl AS DOUBLE) / stats.avgdl))"
            )
            if f == "content":
                tfn = (
                    f"(CAST(tf.tf AS DOUBLE) * {K1 + 1.0!r})"
                    f" / (CAST(tf.tf AS DOUBLE) + {K1!r} * ({1.0 - B!r}"
                    f" + {B!r} * CAST(dl.dl AS DOUBLE) / stats.avgdl))"
                )
                parts.append(
                    f"SELECT tf.doc_id, '{w}' AS word, {idf} * {tfn} AS s\n"
                    f"  FROM tf JOIN dl ON tf.doc_id = dl.doc_id"
                    f" CROSS JOIN stats WHERE tf.term = '{w}'"
                )
            else:
                parts.append(
                    f"SELECT d.doc_id, '{w}' AS word,"
                    f" {idf} * {tfn_field} AS s\n"
                    f"  FROM {DOCS} d JOIN dl ON d.doc_id = dl.doc_id"
                    f" CROSS JOIN stats"
                    f" WHERE lower(CAST(d.{f} AS VARCHAR)) = '{w}'"
                )
    union = "\nUNION ALL\n".join(parts)
    return f"""{index_ctes()},
vs AS (
{union}
),
wmax AS (SELECT doc_id, word, max(s) AS s FROM vs GROUP BY doc_id, word),
scored AS (SELECT doc_id, sum(s) AS score FROM wmax GROUP BY doc_id)
SELECT doc_id, round(score, 6) AS score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"""


def most_fields_sql(words: list[str], fields: list[str],
                    k: int = 10) -> str:
    """Oracle for PhysicalIndex.most_fields_topk: each variant keeps
    its OWN df (no blending), every matching variant's BM25 is summed
    per doc — the ES most_fields complement of cross_fields."""
    parts = []
    for w in sorted({x.lower().replace("'", "''") for x in words}):
        for f in fields:
            if f == "content":
                parts.append(
                    f"SELECT tf.doc_id, {score_sql()} AS s\n"
                    f"  FROM tf JOIN dfv ON tf.term = dfv.term"
                    f" JOIN dl ON tf.doc_id = dl.doc_id"
                    f" CROSS JOIN stats WHERE tf.term = '{w}'"
                )
            else:
                parts.append(
                    f"SELECT d.doc_id, {field_score_sql(f, w)} AS s\n"
                    f"  FROM {DOCS} d JOIN dl ON d.doc_id = dl.doc_id"
                    f" CROSS JOIN stats"
                    f" WHERE lower(CAST(d.{f} AS VARCHAR)) = '{w}'"
                )
    union = "\nUNION ALL\n".join(parts)
    return f"""{index_ctes()},
vs AS (
{union}
),
scored AS (SELECT doc_id, sum(s) AS score FROM vs GROUP BY doc_id)
SELECT doc_id, round(score, 6) AS score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"""


def combined_fields_sql(words: list[str], fields: list[str],
                        k: int = 10) -> str:
    """Oracle for PhysicalIndex.combined_fields_topk: per (doc,
    word) tf sums ACROSS fields before the saturation curve; df =
    |union of the variants' doc sets|; content dl/avgdl norms."""
    parts = []
    for w in sorted({x.lower().replace("'", "''") for x in words}):
        for f in fields:
            if f == "content":
                parts.append(
                    f"SELECT tf.doc_id, '{w}' AS word,"
                    f" CAST(tf.tf AS BIGINT) AS tf, dl.dl AS dl\n"
                    f"  FROM tf JOIN dl ON tf.doc_id = dl.doc_id"
                    f" WHERE tf.term = '{w}'"
                )
            else:
                parts.append(
                    f"SELECT d.doc_id, '{w}' AS word,"
                    f" CAST(1 AS BIGINT) AS tf, dl.dl AS dl\n"
                    f"  FROM {DOCS} d JOIN dl ON d.doc_id = dl.doc_id"
                    f" WHERE lower(CAST(d.{f} AS VARCHAR)) = '{w}'"
                )
    union = "\nUNION ALL\n".join(parts)
    idf = ("ln(1.0 + (CAST(stats.n_docs AS DOUBLE)"
           " - CAST(dfw.dfc AS DOUBLE) + 0.5)"
           " / (CAST(dfw.dfc AS DOUBLE) + 0.5))")
    tfn = (
        f"(CAST(pd.tfc AS DOUBLE) * {K1 + 1.0!r})"
        f" / (CAST(pd.tfc AS DOUBLE) + {K1!r} * ({1.0 - B!r}"
        f" + {B!r} * CAST(pd.dl AS DOUBLE) / stats.avgdl))"
    )
    return f"""{index_ctes()},
vrows AS (
{union}
),
pd AS (SELECT doc_id, word, sum(tf) AS tfc, max(dl) AS dl
       FROM vrows GROUP BY doc_id, word),
dfw AS (SELECT word, count(DISTINCT doc_id) AS dfc
        FROM vrows GROUP BY word),
scored AS (
  SELECT pd.doc_id, sum({idf} * {tfn}) AS score
  FROM pd JOIN dfw ON pd.word = dfw.word CROSS JOIN stats
  GROUP BY pd.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"""


def distance_feature_sql(terms: list[str], field: str, origin: float,
                         pivot: float, k: int = 10, boost: float = 1.0,
                         mode: str = "or") -> str:
    """Oracle for PhysicalIndex.distance_feature_topk: BM25 +
    boost * pivot/(pivot + |field - origin|), ranked over ALL
    matches."""
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    feat = (
        f"coalesce({float(boost)!r} * {float(pivot)!r} / ({float(pivot)!r}"
        f" + abs(CAST(d.{field} AS DOUBLE) - {float(origin)!r})), 0.0)"
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
)
SELECT s.doc_id,
       round(s.score + {feat}, 6) AS score,
       round({feat}, 6) AS feat_score
FROM scored s JOIN {DOCS} d ON s.doc_id = d.doc_id
ORDER BY s.score + {feat} DESC, s.doc_id ASC LIMIT {int(k)}"""


def has_parent_sql(terms: list[str], parent_field: str, k: int = 10,
                   score_mode: str = "max", mode: str = "or") -> str:
    """Oracle for PhysicalIndex.has_parent_topk: children inherit
    their parent group's aggregate hit score (per-hit scores rounded
    to 6dp before the group aggregate, like group_score_sql)."""
    agg = {"sum": "sum", "max": "max", "min": "min", "avg": "avg"}[
        score_mode
    ]
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, round(sum({score_sql()}), 6) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
),
ps AS (
  SELECT d.{parent_field} AS parent, round({agg}(s.score), 6) AS score
  FROM scored s JOIN {DOCS} d ON s.doc_id = d.doc_id
  GROUP BY d.{parent_field}
)
SELECT d.doc_id, d.{parent_field} AS parent, p.score
FROM {DOCS} d JOIN ps p ON d.{parent_field} = p.parent
ORDER BY p.score DESC, d.doc_id ASC LIMIT {int(k)}"""


def terms_set_sql(terms: list[str], min_match_expr: str,
                  k: int = 10) -> str:
    """Oracle for PhysicalIndex.terms_set_topk: per-doc minimum
    should-match threshold from a SQL expression over the doc's own
    stored fields; n_matched = distinct matched query terms."""
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score,
         CAST(count(*) AS INT) AS nt
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id
)
SELECT s.doc_id, round(s.score, 6) AS score, s.nt AS n_matched
FROM scored s JOIN (SELECT doc_id, CAST(({min_match_expr}) AS INT) AS req
                    FROM {DOCS}) d ON s.doc_id = d.doc_id
WHERE s.nt >= d.req
ORDER BY s.score DESC, s.doc_id ASC LIMIT {int(k)}"""


def boosting_sql(pos_terms: list[str], neg_terms: list[str],
                 negative_boost: float = 0.2, k: int = 10,
                 mode: str = "or") -> str:
    """Oracle for PhysicalIndex.boosting_topk: positive-query BM25,
    multiplied by negative_boost for docs also matching the negative
    query."""
    n_terms = len(set(pos_terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(pos_terms)}
  GROUP BY tf.doc_id {having}
),
neg AS (SELECT DISTINCT doc_id FROM tf
        WHERE term IN {_term_list(neg_terms)})
SELECT s.doc_id,
       round(CASE WHEN n.doc_id IS NULL THEN s.score
             ELSE s.score * {float(negative_boost)!r} END, 6) AS score
FROM scored s LEFT JOIN neg n ON s.doc_id = n.doc_id
ORDER BY CASE WHEN n.doc_id IS NULL THEN s.score
         ELSE s.score * {float(negative_boost)!r} END DESC,
         s.doc_id ASC LIMIT {int(k)}"""


def random_score_sql(terms: list[str], seed: str = "", k: int = 10,
                     mode: str = "or") -> str:
    """Oracle for PhysicalIndex.random_score_topk: the shared
    hash_bucket device (md5 first-32-bits mod N_BUCKETS) over
    (seed, doc_id), normalized to [0, 1)."""
    from katta_spark.ops.sampling import N_BUCKETS

    key = (f"concat('{seed}', CAST(m.doc_id AS VARCHAR))"
           if seed else "CAST(m.doc_id AS VARCHAR)")
    rnd = (
        f"CAST(concat('0x', substr(md5({key}), 1, 8)) AS BIGINT)"
        f" % {N_BUCKETS}"
    )
    return f"""{index_ctes()},
m AS (SELECT DISTINCT doc_id FROM ({term_docs_sql(terms, mode)}))
SELECT m.doc_id, round({rnd} / {float(N_BUCKETS)!r}, 6) AS score
FROM m ORDER BY score DESC, m.doc_id ASC LIMIT {int(k)}"""


def common_terms_sql(terms: list[str], k: int = 10,
                     max_df_frac: float = 0.1) -> str:
    """Oracle for PhysicalIndex.common_terms_topk: low-df terms drive
    matching, high-df terms only add score; all-high falls back to
    plain OR (the NOT EXISTS branch)."""
    if max_df_frac >= 1.0:
        cut = repr(float(max_df_frac))
    else:
        cut = (f"({float(max_df_frac)!r}"
               " * (SELECT CAST(n_docs AS DOUBLE) FROM stats))")
    return f"""{index_ctes()},
qdf AS (SELECT term, CAST(df AS DOUBLE) AS df FROM dfv
        WHERE term IN {_term_list(terms)}),
req AS (
  SELECT term FROM qdf
  WHERE df <= {cut}
     OR NOT EXISTS (SELECT 1 FROM qdf WHERE df <= {cut})
),
cand AS (SELECT DISTINCT doc_id FROM tf
         WHERE term IN (SELECT term FROM req)),
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf
  JOIN dfv ON tf.term = dfv.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
    AND tf.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"""


def term_docs_sql(terms: list[str], mode: str = "or") -> str:
    """SELECT of doc_ids matching the terms — a must/not constraint
    fragment for :func:`lucene_topk_sql`."""
    tl = _term_list(terms)
    if mode == "and" and len(set(terms)) > 1:
        return (
            f"SELECT doc_id FROM tf WHERE term IN {tl} "
            f"GROUP BY doc_id HAVING count(DISTINCT term) = {len(set(terms))}"
        )
    return f"SELECT doc_id FROM tf WHERE term IN {tl}"


def significant_terms_sql(terms: list[str], m_terms: int = 10,
                          mode: str = "or", min_df: int = 2) -> str:
    """Oracle for PhysicalIndex.significant_terms (ES-style lift
    ranking of foreground-overrepresented terms)."""
    return f"""{index_ctes()},
matched AS ({term_docs_sql(terms, mode)}),
nfg AS (SELECT CAST(count(*) AS DOUBLE) AS n_fg FROM matched),
fg AS (
  SELECT t.term, count(DISTINCT t.doc_id) AS df_fg
  FROM tf t JOIN matched m ON t.doc_id = m.doc_id
  WHERE t.term NOT IN {_term_list(terms)}
  GROUP BY t.term HAVING count(DISTINCT t.doc_id) >= {int(min_df)}
),
ranked AS (
  SELECT fg.term, fg.df_fg, dfv.df AS df_bg,
         (CAST(fg.df_fg AS DOUBLE) / nfg.n_fg)
         / (CAST(dfv.df AS DOUBLE) / CAST(stats.n_docs AS DOUBLE)) AS lift
  FROM fg JOIN dfv ON fg.term = dfv.term
  CROSS JOIN nfg CROSS JOIN stats
)
SELECT term, CAST(df_fg AS BIGINT) AS df_fg, CAST(df_bg AS BIGINT) AS df_bg,
       round(lift, 6) AS lift
FROM (SELECT * FROM ranked
      ORDER BY lift DESC, df_fg DESC, term ASC LIMIT {m_terms})"""


def facet_queries_sql(queries_map: dict[str, list[str]],
                      mode: str = "or") -> str:
    """facet.query oracle: (facet_q, cnt) per standing sub-query
    (mirror of PhysicalIndex.facet_queries)."""
    parts = []
    for label, terms in sorted(queries_map.items()):
        lq = label.replace("'", "''")
        parts.append(
            f"SELECT '{lq}' AS facet_q, CAST(count(DISTINCT doc_id) AS"
            f" BIGINT) AS cnt FROM ({term_docs_sql(terms, mode)})"
        )
    return f"{index_ctes()}\n" + "\nUNION ALL\n".join(parts)


def adjacency_matrix_sql(queries_map: dict[str, list[str]],
                         mode: str = "or") -> str:
    """ES adjacency_matrix oracle: labeled matched sets, self-join on
    doc_id, pair counts with key1 <= key2 (mirror of
    PhysicalIndex.adjacency_matrix)."""
    parts = []
    for label, terms in sorted(queries_map.items()):
        lq = label.replace("'", "''")
        parts.append(
            f"SELECT DISTINCT '{lq}' AS k, doc_id"
            f" FROM ({term_docs_sql(terms, mode)})"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""{index_ctes()},
m AS ({union})
SELECT a.k AS key1, b.k AS key2, count(*) AS cnt
FROM m a JOIN m b ON a.doc_id = b.doc_id
WHERE a.k <= b.k
GROUP BY a.k, b.k
ORDER BY key1, key2"""


def sloppy_phrase2_sql(a: str, b: str, slop: int, k: int = 10) -> str:
    """Two-term proximity oracle: docs where ``a`` precedes ``b``
    within span 1+slop (the engine's ordered-within-window ``"a b"~N``
    semantics), scored as the BM25 sum of both terms."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    ea = a.replace("'", "''")
    eb = b.replace("'", "''")
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    return f"""{index_ctes()},
tokl AS ({tokl}),
verified AS (
  SELECT doc_id FROM tokl
  WHERE len(list_filter(generate_series(1, len(toks)),
        i -> toks[i] = '{ea}' AND len(list_filter(
               generate_series(1, len(toks)),
               j -> toks[j] = '{eb}' AND j > i AND j - i <= {1 + slop})) > 0)) > 0
),
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf
  JOIN dfv ON tf.term = dfv.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list([a, b])}
  GROUP BY tf.doc_id HAVING count(*) = {len({a, b})}
),
top AS (
  SELECT s.doc_id, s.score FROM scored s JOIN verified v ON s.doc_id = v.doc_id
  ORDER BY s.score DESC, s.doc_id ASC LIMIT {k}
)
SELECT doc_id, round(score, 6) AS score FROM top"""


def multi_topk_sql(queries_map: dict[str, list[str]], k: int = 10,
                   mode: str = "or") -> str:
    """Batched multi-query oracle: per-query BM25 top-k slices,
    UNION'd with their qid tags (mirror of PhysicalIndex.multi_topk)."""
    ctes, selects = [], []
    for i, (qid, terms) in enumerate(sorted(queries_map.items())):
        n_terms = len(set(terms))
        having = (
            f"HAVING count(*) = {n_terms}"
            if mode == "and" and n_terms > 1
            else ""
        )
        ctes.append(f"""scored_{i} AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
),
top_{i} AS (SELECT * FROM scored_{i}
            ORDER BY score DESC, doc_id ASC LIMIT {k})""")
        q = qid.replace("'", "''")
        selects.append(
            f"SELECT '{q}' AS qid, doc_id, round(score, 6) AS score"
            f" FROM top_{i}"
        )
    return (
        f"{index_ctes()},\n"
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


def percolate_sql(queries_map: dict[str, list[str]], mode: str = "or") -> str:
    """Percolation oracle: (doc_id, qid) for every document matching a
    standing query (any term for "or", all terms for "and")."""
    parts = []
    for qid, terms in sorted(queries_map.items()):
        tl = _term_list(terms)
        n_terms = len(set(terms))
        if mode == "and" and n_terms > 1:
            sel = (
                f"SELECT doc_id FROM tf WHERE term IN {tl} "
                f"GROUP BY doc_id HAVING count(DISTINCT term) = {n_terms}"
            )
        else:
            sel = f"SELECT DISTINCT doc_id FROM tf WHERE term IN {tl}"
        q = qid.replace("'", "''")
        parts.append(f"SELECT doc_id, '{q}' AS qid FROM ({sel})")
    return f"{index_ctes()}\n" + "\nUNION ALL\n".join(parts)


def suggest_sql(prefix: str, n: int = 10) -> str:
    """TermsComponent oracle: top-n content terms by df with the
    prefix, tie-break term asc."""
    p = prefix.lower().replace("'", "''")
    return f"""{index_ctes()}
SELECT term, df FROM dfv WHERE term LIKE '{p}%'
ORDER BY df DESC, term ASC LIMIT {n}"""


def field_stats_sql(terms: list[str], field: str, mode: str = "or") -> str:
    """StatsComponent oracle: count/min/max/sum/mean of a numeric
    field over the matching docs."""
    return f"""{index_ctes()}{matched_sql(terms, mode)}
SELECT count(CAST(d.{field} AS DOUBLE)) AS n,
       min(CAST(d.{field} AS DOUBLE)) AS min_v,
       max(CAST(d.{field} AS DOUBLE)) AS max_v,
       round(sum(CAST(d.{field} AS DOUBLE)), 6) AS sum_v,
       round(avg(CAST(d.{field} AS DOUBLE)), 6) AS mean_v
FROM {DOCS} d JOIN matched m ON d.doc_id = m.doc_id"""


def interval_facet_sql(terms: list[str], field: str,
                       intervals: list[tuple], mode: str = "or") -> str:
    """facet.interval oracle: per-interval FILTER counts over the
    matched docs (overlap allowed — a doc counts in every interval)."""
    rows = []
    for label, lo, hi, lo_incl, hi_incl in intervals:
        lop = ">=" if lo_incl else ">"
        hip = "<=" if hi_incl else "<"
        lbl = label.replace("'", "''")
        rows.append(
            f"SELECT '{lbl}' AS label, count(*) FILTER "
            f"(WHERE v {lop} {float(lo)!r} AND v {hip} {float(hi)!r}) AS cnt "
            f"FROM vals"
        )
    body = "\nUNION ALL\n".join(rows)
    return f"""{index_ctes()}{matched_sql(terms, mode)},
vals AS (SELECT CAST(d.{field} AS DOUBLE) AS v
         FROM {DOCS} d JOIN matched m ON d.doc_id = m.doc_id)
SELECT label, cnt FROM ({body}) ORDER BY label"""


def range_other_sql(terms: list[str], field: str, start: float,
                    end: float, mode: str = "or") -> str:
    """facet.range.other=all oracle: (before, between, after)."""
    return f"""{index_ctes()}{matched_sql(terms, mode)},
vals AS (SELECT CAST(d.{field} AS DOUBLE) AS v
         FROM {DOCS} d JOIN matched m ON d.doc_id = m.doc_id)
SELECT count(*) FILTER (WHERE v < {float(start)!r}) AS before,
       count(*) FILTER (WHERE v >= {float(start)!r} AND v < {float(end)!r})
         AS "between",
       count(*) FILTER (WHERE v >= {float(end)!r}) AS "after"
FROM vals"""


def facet_stats_sql(terms: list[str], facet_field: str, stat_field: str,
                    mode: str = "or") -> str:
    """stats.facet oracle: field_stats per facet value."""
    return f"""{index_ctes()}{matched_sql(terms, mode)}
SELECT d.{facet_field},
       count(CAST(d.{stat_field} AS DOUBLE)) AS n,
       min(CAST(d.{stat_field} AS DOUBLE)) AS min_v,
       max(CAST(d.{stat_field} AS DOUBLE)) AS max_v,
       round(sum(CAST(d.{stat_field} AS DOUBLE)), 6) AS sum_v,
       round(avg(CAST(d.{stat_field} AS DOUBLE)), 6) AS mean_v
FROM {DOCS} d JOIN matched m ON d.doc_id = m.doc_id
GROUP BY d.{facet_field} ORDER BY d.{facet_field}"""


def bpe_pairs_sql(k: int = 20) -> str:
    """Round-0 BPE pair-count oracle: adjacent char pairs of every
    distinct term weighted by its corpus frequency (dfv.cf)."""
    return f"""{index_ctes()},
pairs AS (
  SELECT substr(term, i, 1) AS a, substr(term, i + 1, 1) AS b, cf
  FROM (SELECT term, cf, unnest(generate_series(1, len(term) - 1)) AS i
        FROM dfv))
SELECT a, b, CAST(sum(cf) AS BIGINT) AS cnt FROM pairs
GROUP BY a, b ORDER BY cnt DESC, a ASC, b ASC LIMIT {k}"""


def group_topk_sql(terms: list[str], group_field: str,
                   k_per_group: int = 3, mode: str = "or") -> str:
    """Result-grouping oracle: top-k hits per value of
    ``group_field`` (score desc, doc_id asc within group)."""
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
),
ranked AS (
  SELECT d.{group_field}, s.doc_id, s.score,
    CAST(row_number() OVER (
      PARTITION BY d.{group_field}
      ORDER BY s.score DESC, s.doc_id ASC) AS INT) AS rank
  FROM scored s JOIN {DOCS} d ON s.doc_id = d.doc_id
)
SELECT {group_field}, doc_id, round(score, 6) AS score, rank
FROM ranked WHERE rank <= {k_per_group}"""


def collapse_topk_sql(terms: list[str], collapse_field: str,
                      k: int = 10, mode: str = "or") -> str:
    """Field-collapsing oracle: best-scoring doc per value of
    ``collapse_field`` (tie doc_id asc), collapsed set ranked
    globally, top-k (mirror of PhysicalIndex.collapse_topk)."""
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
),
collapsed AS (
  SELECT s.doc_id, s.score, d.{collapse_field},
         row_number() OVER (PARTITION BY d.{collapse_field}
                            ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN {DOCS} d ON s.doc_id = d.doc_id
)
SELECT doc_id, round(score, 6) AS score, {collapse_field}
FROM collapsed WHERE rn = 1
ORDER BY score DESC, doc_id ASC LIMIT {int(k)}"""


def term_vectors_sql(doc_ids: list[int]) -> str:
    """TermVectorComponent oracle: (doc_id, term, tf, df, tfidf) for
    the given docs, tfidf = tf × catalog BM25 idf."""
    ids = ", ".join(str(int(d)) for d in sorted(set(doc_ids)))
    idf = (
        "ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(dfv.df AS DOUBLE)"
        " + 0.5) / (CAST(dfv.df AS DOUBLE) + 0.5))"
    )
    return f"""{index_ctes()}
SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf, dfv.df,
       round(CAST(tf.tf AS DOUBLE) * {idf}, 6) AS tfidf
FROM tf JOIN dfv ON tf.term = dfv.term CROSS JOIN stats
WHERE tf.doc_id IN ({ids})"""


def elevate_topk_sql(terms: list[str], elevate_ids: list[int],
                     k: int = 10, exclude_ids: list[int] = (),
                     mode: str = "or") -> str:
    """QueryElevation oracle: pinned ids first in the given order
    (score 0.0 when unmatched), excluded ids dropped, organic BM25
    ranking filling the remaining slots (mirror of
    PhysicalIndex.elevate_topk)."""
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    vals = ", ".join(
        f"({i}, {int(d)})" for i, d in enumerate(elevate_ids)
    )
    drop = sorted({int(d) for d in exclude_ids} | {int(d) for d in elevate_ids})
    drop_sql = ", ".join(str(d) for d in drop)
    n_org = max(int(k) - len(elevate_ids), 0)
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
),
elev(pos, doc_id) AS (VALUES {vals}),
etop AS (
  SELECT e.doc_id, coalesce(s.score, 0.0) AS score, e.pos, TRUE AS elevated
  FROM elev e LEFT JOIN scored s ON e.doc_id = s.doc_id
),
otop AS (
  SELECT doc_id, score, NULL AS pos, FALSE AS elevated
  FROM scored WHERE doc_id NOT IN ({drop_sql})
  ORDER BY score DESC, doc_id ASC LIMIT {n_org}
),
united AS (SELECT * FROM etop UNION ALL SELECT * FROM otop),
ranked AS (
  SELECT CAST(row_number() OVER (
           ORDER BY elevated DESC, pos ASC NULLS LAST,
                    score DESC, doc_id ASC) AS INT) AS rank,
         doc_id, round(score, 6) AS score, elevated
  FROM united
)
SELECT rank, doc_id, score, elevated FROM ranked WHERE rank <= {int(k)}"""


def mlt_sql(doc_id: int, m_terms: int = 5, k: int = 10) -> str:
    """MoreLikeThis oracle: the source doc's top ``m_terms`` by tf·idf
    (tie-break term asc) score the corpus as an OR group, source doc
    excluded, top-k."""
    idf = (
        "ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(dfv.df AS DOUBLE)"
        " + 0.5) / (CAST(dfv.df AS DOUBLE) + 0.5))"
    )
    return f"""{index_ctes()},
src AS (
  SELECT term, count(*) AS tf FROM tok WHERE doc_id = {int(doc_id)}
  GROUP BY term
),
rep AS (
  SELECT s.term FROM src s JOIN dfv ON s.term = dfv.term CROSS JOIN stats
  ORDER BY CAST(s.tf AS DOUBLE) * {idf} DESC, s.term ASC LIMIT {m_terms}
),
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN (SELECT term FROM rep) AND tf.doc_id <> {int(doc_id)}
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k})"""


def highlight_sql(terms: list[str], k: int = 10, width: int = 80,
                  pre: str = "<em>", post: str = "</em>") -> str:
    """Top-k + snippet oracle mirroring PhysicalIndex.highlight: a
    ``width``-char window starting near the first case-insensitive
    occurrence of any query term, every in-window occurrence wrapped
    in pre/post markers."""
    import re as _re

    lows = sorted({t.lower() for t in terms})
    locs = ", ".join(
        f"nullif(strpos(lower(d.text), '{t.replace(chr(39), chr(39)*2)}'), 0)"
        for t in lows
    )
    first = f"coalesce(least({locs}), 1)" if len(lows) > 1 else f"coalesce({locs}, 1)"
    pat = "(?i)(" + "|".join(_re.escape(t) for t in lows) + ")"
    return f"""{index_ctes()}{_scored_ctes(terms, k)}
SELECT t.doc_id, round(t.score, 6) AS score,
       regexp_replace(
         substring(d.text, greatest({first} - {max(width // 3, 0)}, 1), {width}),
         '{pat}', '{pre}\\1{post}', 'g') AS snippet
FROM top t JOIN {DOCS} d ON t.doc_id = d.doc_id"""


def pivot_facet_sql(terms: list[str], field1: str, field2: str,
                    n1: int = 5, n2: int = 3, mode: str = "or") -> str:
    """Pivot-facet oracle: (field1, parent_cnt, field2, cnt) for the
    top n1 parents by total match count (tie value asc) and the top
    n2 children within each (cnt desc, value asc) — the flattened
    Solr facet.pivot contract of PhysicalIndex.pivot_facet."""
    return f"""{index_ctes()}{matched_sql(terms, mode)},
pairs AS (
  SELECT d.{field1}, d.{field2}, count(*) AS cnt
  FROM {DOCS} d JOIN matched m ON d.doc_id = m.doc_id
  GROUP BY d.{field1}, d.{field2}
),
parents AS (
  SELECT {field1}, CAST(sum(cnt) AS BIGINT) AS parent_cnt,
         dense_rank() OVER (ORDER BY sum(cnt) DESC, {field1} ASC) AS pr
  FROM pairs GROUP BY {field1}
),
ranked AS (
  SELECT p.{field1}, pa.parent_cnt, p.{field2}, p.cnt,
         row_number() OVER (PARTITION BY p.{field1}
                            ORDER BY p.cnt DESC, p.{field2} ASC) AS cr
  FROM pairs p JOIN parents pa ON p.{field1} = pa.{field1}
  WHERE pa.pr <= {int(n1)}
)
SELECT {field1}, parent_cnt, {field2}, cnt FROM ranked WHERE cr <= {int(n2)}
ORDER BY parent_cnt DESC, {field1} ASC, cnt DESC, {field2} ASC"""


def spellcheck_sql(word: str, max_edits: int = 2, n: int = 5) -> str:
    """SpellCheckComponent oracle: closest content terms to ``word``
    by (edit distance asc, df desc, term asc), distance in
    (0, max_edits]."""
    w = word.lower().replace("'", "''")
    return f"""{index_ctes()}
SELECT term, CAST(levenshtein(term, '{w}') AS INT) AS dist, df
FROM dfv
WHERE levenshtein(term, '{w}') <= {int(max_edits)}
  AND levenshtein(term, '{w}') > 0
ORDER BY dist ASC, df DESC, term ASC LIMIT {int(n)}"""


def suggest_phrase_sql(words: list[str], max_edits: int = 2,
                       per_word: int = 3, n: int = 5,
                       add_k: float = 1.0,
                       edit_penalty: float = 1.0) -> str:
    """Oracle for PhysicalIndex.suggest_phrase: identical per-position
    catalog candidates, bigram/history/vocab counts from the ordered
    token lists, add-k smoothed pair log-probs, edit penalty."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    m = len(words)
    cand_ctes = []
    for i, wd in enumerate(words):
        w = wd.lower().replace("'", "''")
        cand_ctes.append(f"""
c{i} AS (
  SELECT term AS w{i}, CAST(levenshtein(term, '{w}') AS INT) AS d{i}, df
  FROM dfv
  WHERE abs(length(term) - {len(wd)}) <= {int(max_edits)}
    AND levenshtein(term, '{w}') <= {int(max_edits)}
  ORDER BY d{i} ASC, df DESC, term ASC LIMIT {int(per_word)}
)""")
    cross = "SELECT * FROM " + " CROSS JOIN ".join(
        f"c{i}" for i in range(m)
    )
    joins, lps = [], []
    for i in range(m - 1):
        joins.append(
            f"LEFT JOIN big b{i} ON ph.w{i} = b{i}.w1"
            f" AND ph.w{i + 1} = b{i}.w2"
        )
        joins.append(f"LEFT JOIN hist h{i} ON ph.w{i} = h{i}.w1")
        lps.append(
            f"ln((CAST(coalesce(b{i}.n_ab, 0) AS DOUBLE)"
            f" + {float(add_k)!r}) / (CAST(coalesce(h{i}.n_a, 0)"
            f" AS DOUBLE) + {float(add_k)!r} * voc.v))"
        )
    phrase = " || ' ' || ".join(f"ph.w{i}" for i in range(m))
    dist = " + ".join(f"ph.d{i}" for i in range(m))
    return f"""{index_ctes()},
tokl AS ({tokl}),
g AS (SELECT unnest(CASE WHEN len(toks) >= 2
        THEN list_transform(generate_series(1, len(toks) - 1),
             i -> struct_pack(w1 := toks[i], w2 := toks[i+1])) ELSE [] END) AS s
      FROM tokl),
big AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n_ab FROM g GROUP BY 1, 2),
hist AS (SELECT w1, sum(n_ab) AS n_a FROM big GROUP BY w1),
voc AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v
        FROM (SELECT unnest(toks) AS term FROM tokl)),
{', '.join(cand_ctes)}
SELECT {phrase} AS phrase,
       CAST({dist} AS INT) AS total_dist,
       round(({' + '.join(lps)})
             - {float(edit_penalty)!r} * ({dist}), 6) AS score
FROM ({cross}) ph
{' '.join(joins)}
CROSS JOIN voc
ORDER BY score DESC, phrase ASC LIMIT {int(n)}"""


def rrf_sql(terms: list[str], k_each: int = 20, k_const: int = 60,
            n: int = 10, q_vec_id: int = 0) -> str:
    """Oracle for ops.search_eval.rrf_fuse over the hybrid pair the
    driver runs: BM25 top-``k_each`` on documents fused with the
    exact-cosine top-``k_each`` on embeddings (query = the stored
    vector of ``q_vec_id``, itself excluded), both ranked with the
    (score desc, id asc) tie-break."""
    dot = (
        "list_sum(list_transform(generate_series(1, len(e.embedding)),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))"
    )
    en = (
        "sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))"
    )
    qn = (
        "sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),"
        " i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))"
    )
    return f"""{index_ctes()}{_scored_ctes(terms, k_each)},
bmr AS (SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
        FROM top),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {int(q_vec_id)}),
cosd AS (SELECT e.vec_id AS doc_id, {dot} / ({en} * {qn}) AS cos
         FROM embeddings e CROSS JOIN q
         WHERE e.vec_id <> {int(q_vec_id)}),
vtop AS (SELECT doc_id, cos FROM cosd
         ORDER BY cos DESC, doc_id ASC LIMIT {int(k_each)}),
vr AS (SELECT doc_id,
              row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS rk
       FROM vtop),
u AS (SELECT * FROM bmr UNION ALL SELECT * FROM vr)
SELECT doc_id,
       round(sum(1.0 / ({int(k_const)} + CAST(rk AS DOUBLE))), 6) AS rrf_score,
       count(*) AS n_lists
FROM u GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id ASC LIMIT {int(n)}"""


def boosted_topk_sql(terms: list[str], boost_sql: str, k: int = 10,
                     mode: str = "or") -> str:
    """Function-query boost oracle: BM25 score times a SQL expression
    over the documents row (alias ``d``), top-k re-ranked AFTER the
    multiplication (mirror of PhysicalIndex.topk_boosted)."""
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
),
boosted AS (
  SELECT s.doc_id, s.score * ({boost_sql}) AS score
  FROM scored s JOIN {DOCS} d ON s.doc_id = d.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM (SELECT * FROM boosted ORDER BY score DESC, doc_id ASC LIMIT {int(k)})"""


def dismax_sql(terms: list[str], field_terms: list[tuple[str, str]] = (),
               tie: float = 0.0, k: int = 10) -> str:
    """DisjunctionMax oracle: per-doc max(clause) + tie*(sum-max)
    over content-term and scored-field-term clauses (mirror of
    PhysicalIndex.dismax_topk)."""
    parts = []
    for t in sorted(set(terms)):
        tq = t.replace("'", "''")
        parts.append(
            f"""  SELECT tf.doc_id, {score_sql()} AS s
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats WHERE tf.term = '{tq}'"""
        )
    for fld, val in field_terms:
        vq = val.lower().replace("'", "''")
        parts.append(
            f"""  SELECT d.doc_id, {field_score_sql(fld, vq)} AS s
  FROM {DOCS} d JOIN dl ON d.doc_id = dl.doc_id CROSS JOIN stats
  WHERE lower(CAST(d.{fld} AS VARCHAR)) = '{vq}'"""
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""{index_ctes()},
parts AS (
{union}
),
scored AS (
  SELECT doc_id, max(s) + {float(tie)!r} * (sum(s) - max(s)) AS score
  FROM parts GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT {int(k)})"""


def rerank_sql(main_terms: list[str], rq_terms: list[str],
               rerank_docs: int = 60, weight: float = 2.0,
               k: int = 10, mode: str = "or") -> str:
    """ReRank oracle (mirror of PhysicalIndex.rerank_topk): main
    query's top-``rerank_docs`` candidates, combined = main +
    weight * rerank (0 for candidates the rerank query misses),
    reordered, top-k."""
    having = (
        f"HAVING count(*) = {len(set(main_terms))}"
        if mode == "and" and len(set(main_terms)) > 1
        else ""
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(main_terms)}
  GROUP BY tf.doc_id {having}
),
cand AS (SELECT * FROM scored ORDER BY score DESC, doc_id ASC
         LIMIT {int(rerank_docs)}),
rr AS (
  SELECT tf.doc_id, sum({score_sql()}) AS rscore
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(rq_terms)}
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM (
  SELECT c.doc_id AS doc_id,
         c.score + {float(weight)!r} * coalesce(rr.rscore, 0.0) AS score
  FROM cand c LEFT JOIN rr ON c.doc_id = rr.doc_id
  ORDER BY score DESC, c.doc_id ASC LIMIT {int(k)})"""


def min_match_topk_sql(terms: list[str], min_match: int, k: int = 10) -> str:
    """Minimum-should-match oracle: OR-scored docs matching at least
    ``min_match`` distinct query terms (Solr dismax mm), top-k."""
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id HAVING count(*) >= {int(min_match)}
)
SELECT doc_id, round(score, 6) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT {int(k)})"""


def matched_sql(terms: list[str], mode: str = "or", filter_sql: str | None = None) -> str:
    """CTE-suffix producing ``matched(doc_id)``."""
    n_terms = len(set(terms))
    having = f"HAVING count(DISTINCT term) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    flt = f"AND doc_id IN (SELECT doc_id FROM {DOCS} WHERE {filter_sql})" if filter_sql else ""
    return f""",
matched AS (
  SELECT doc_id FROM tf WHERE term IN {_term_list(terms)} {flt}
  GROUP BY doc_id {having}
)"""


def join_topk_sql(terms: list[str], from_field: str, to_field: str,
                  inner_terms: list[str], k: int = 10, mode: str = "or",
                  inner_mode: str = "or") -> str:
    """Mirror of PhysicalIndex.join_topk (Solr {!join from=f to=t}q
    as a non-scoring fq): score `terms`, keep docs whose to_field is
    among the from_field values of docs matching `inner_terms`."""
    n_inner = len(set(inner_terms))
    having = (
        f"GROUP BY doc_id HAVING count(DISTINCT term) = {n_inner}"
        if inner_mode == "and" and n_inner > 1
        else "GROUP BY doc_id"
    )
    filter_sql = (
        f"{to_field} IN (SELECT {from_field} FROM {DOCS} WHERE doc_id IN "
        f"(SELECT doc_id FROM tf WHERE term IN {_term_list(inner_terms)} {having}))"
    )
    return topk_sql(terms, k=k, mode=mode, filter_sql=filter_sql)


def suggest_infix_sql(fragment: str, n: int = 10) -> str:
    """AnalyzingInfixSuggester oracle: top-n content terms by df
    CONTAINING the fragment, tie-break term asc."""
    f = fragment.lower().replace("'", "''")
    return f"""{index_ctes()}
SELECT term, df FROM dfv WHERE term LIKE '%{f}%'
ORDER BY df DESC, term ASC LIMIT {n}"""


def span_first_sql(term: str, end: int, k: int = 10) -> str:
    """SpanFirstQuery oracle: BM25 top-k over docs whose first
    occurrence of ``term`` lies within the first ``end`` analyzed
    positions (list_position is 1-based: pos0 < end <=> 1-based <=
    end)."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    tq = term.replace("'", "''")
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    return f"""{index_ctes()},
tokl AS ({tokl}),
fp AS (SELECT doc_id, coalesce(list_position(toks, '{tq}'), 0) AS fp
       FROM tokl),
scored AS (
  SELECT tf.doc_id, {score_sql()} AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats WHERE tf.term = '{tq}')
SELECT doc_id, round(score, 6) AS score
FROM scored JOIN fp USING (doc_id)
WHERE fp.fp BETWEEN 1 AND {int(end)}
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


def percolate_lucene_sql() -> str:
    """Oracle for the ft_percolate_lucene driver query: three
    standing Lucene queries (AND, phrase, NOT) against every doc."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    return f"""WITH tokl AS ({tokl}),
m AS (
  SELECT doc_id, 'q_and' AS qid FROM tokl
  WHERE list_contains(toks, 'table') AND list_contains(toks, 'scan')
  UNION ALL
  SELECT doc_id, 'q_phrase' FROM tokl
  WHERE len(toks) >= 2 AND len(list_filter(
          generate_series(1, len(toks) - 1),
          i -> toks[i] = 'key' AND toks[i+1] = 'agg')) > 0
  UNION ALL
  SELECT doc_id, 'q_not' FROM tokl
  WHERE list_contains(toks, 'batch') AND NOT list_contains(toks, 'stream'))
SELECT doc_id, qid FROM m ORDER BY doc_id, qid"""


def explain_sql(doc_id: int, terms: list[str]) -> str:
    """debugQuery oracle: per-term BM25 breakdown for one doc."""
    idf = (
        "ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(dfv.df AS DOUBLE)"
        " + 0.5) / (CAST(dfv.df AS DOUBLE) + 0.5))"
    )
    tfn = (
        f"(CAST(tf.tf AS DOUBLE) * {K1 + 1.0!r}) / (CAST(tf.tf AS DOUBLE)"
        f" + {K1!r} * ({1.0 - B!r} + {B!r} * CAST(dl.dl AS DOUBLE)"
        f" / stats.avgdl))"
    )
    return f"""{index_ctes()}
SELECT tf.term, CAST(tf.tf AS BIGINT) AS tf, CAST(dfv.df AS BIGINT) AS df,
       round({idf}, 6) AS idf, round({tfn}, 6) AS tfnorm,
       round({idf} * {tfn}, 6) AS part
FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
CROSS JOIN stats
WHERE tf.doc_id = {int(doc_id)} AND tf.term IN {_term_list(terms)}
ORDER BY tf.term"""


def expand_sql(terms: list[str], collapse_field: str, k: int = 10,
               n_expand: int = 2, mode: str = "or") -> str:
    """ExpandComponent oracle: for each group whose head made the
    collapsed top-k, the next n_expand members, score-ranked."""
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
),
ranked AS (
  SELECT s.doc_id, s.score, d.{collapse_field},
         row_number() OVER (PARTITION BY d.{collapse_field}
                            ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN {DOCS} d ON s.doc_id = d.doc_id
),
heads AS (
  SELECT {collapse_field} FROM ranked WHERE rn = 1
  ORDER BY score DESC, doc_id ASC LIMIT {int(k)}
)
SELECT r.{collapse_field}, r.doc_id, round(r.score, 6) AS score,
       CAST(r.rn - 1 AS INT) AS exp_rank
FROM ranked r JOIN heads h USING ({collapse_field})
WHERE r.rn BETWEEN 2 AND {int(n_expand) + 1}
ORDER BY r.{collapse_field}, exp_rank"""


def diversified_sampler_sql(terms: list[str], key_field: str,
                            max_per_key: int = 1, shard_size: int = 100,
                            mode: str = "or") -> str:
    """ES diversified_sampler oracle: per-key rank over the scored
    matches (score desc, doc_id asc), quota filter, global
    top-shard_size by the same order (mirror of
    PhysicalIndex.diversified_sampler)."""
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
),
ranked AS (
  SELECT s.doc_id, s.score, d.{key_field},
    CAST(row_number() OVER (
      PARTITION BY d.{key_field}
      ORDER BY s.score DESC, s.doc_id ASC) AS INT) AS rank_in_key
  FROM scored s JOIN {DOCS} d ON s.doc_id = d.doc_id
)
SELECT doc_id, round(score, 6) AS score, {key_field}, rank_in_key
FROM ranked WHERE rank_in_key <= {int(max_per_key)}
ORDER BY score DESC, doc_id ASC LIMIT {int(shard_size)}"""


def phrase_prefix_sql(words: list[str], prefix: str, k: int = 10,
                      max_expansions: int = 50) -> str:
    """match_phrase_prefix oracle: the prefix slot expands to the
    first ``max_expansions`` catalog terms in term order (Lucene's
    rewrite cap), the phrase verifies positionally, and the score is
    the BM25 sum over every expanded alternative present in the doc
    (mirror of PhysicalIndex.phrase_prefix_topk)."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    m = len(words) + 1
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    pq = prefix.lower().replace("'", "''")
    conds = [
        f"toks[i + {d}] = '" + w.replace("'", "''") + "'"
        for d, w in enumerate(words)
    ]
    conds.append(f"list_contains(alist, toks[i + {m - 1}])")
    conj = " AND ".join(conds)
    return f"""{index_ctes()},
tokl AS ({tokl}),
alt AS (
  SELECT list(term) AS alist FROM (
    SELECT term FROM dfv WHERE term LIKE '{pq}%'
    ORDER BY term LIMIT {int(max_expansions)})),
verified AS (
  SELECT doc_id FROM tokl, alt
  WHERE len(toks) >= {m}
    AND len(list_filter(generate_series(1, len(toks) - {m - 1}),
                        i -> {conj})) > 0
),
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf
  JOIN dfv ON tf.term = dfv.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats, alt
  WHERE tf.term IN {_term_list(words)} OR list_contains(alt.alist, tf.term)
  GROUP BY tf.doc_id
),
top AS (
  SELECT s.doc_id, s.score FROM scored s JOIN verified v ON s.doc_id = v.doc_id
  ORDER BY s.score DESC, s.doc_id ASC LIMIT {k}
)
SELECT doc_id, round(score, 6) AS score FROM top"""


def rank_feature_sql(terms: list[str], feature_field: str,
                     pivot: float, k: int = 10, boost: float = 1.0,
                     mode: str = "or") -> str:
    """rank_feature oracle: BM25 + boost * v/(v+pivot) over the
    stored feature field, ranked over ALL matches (mirror of
    PhysicalIndex.rank_feature_topk)."""
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    sat = (
        f"{float(boost)!r} * CAST(d.{feature_field} AS DOUBLE)"
        f" / (CAST(d.{feature_field} AS DOUBLE) + {float(pivot)!r})"
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, sum({score_sql()}) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
)
SELECT s.doc_id,
       round(s.score + {sat}, 6) AS score,
       round({sat}, 6) AS feat_score
FROM scored s JOIN {DOCS} d ON s.doc_id = d.doc_id
ORDER BY s.score + {sat} DESC, s.doc_id ASC LIMIT {k}"""


def facet_by_metric_sql(terms: list[str], facet_field: str,
                        metric_field: str, n: int = 5,
                        mode: str = "or") -> str:
    """Terms-agg-ordered-by-sub-aggregation oracle (mirror of
    PhysicalIndex.facet_by_metric)."""
    return f"""{index_ctes()},
m AS ({term_docs_sql(terms, mode)}),
agg AS (
  SELECT d.{facet_field}, CAST(count(*) AS BIGINT) AS cnt,
         round(sum(CAST(d.{metric_field} AS DOUBLE)), 6) AS s
  FROM {DOCS} d WHERE d.doc_id IN (SELECT doc_id FROM m)
  GROUP BY d.{facet_field})
SELECT {facet_field}, cnt, round(s / cnt, 6) AS metric_avg
FROM agg ORDER BY metric_avg DESC, {facet_field} ASC LIMIT {int(n)}"""


def linear_fuse_sql(terms: list[str], k_each: int = 20,
                    w_bm: float = 0.7, w_vec: float = 0.3,
                    n: int = 10, q_vec_id: int = 0) -> str:
    """Oracle for ops.search_eval.linear_fuse over the driver's
    hybrid pair: min-max-normalized BM25 top-k + cosine top-k,
    weighted sum (contributions rounded to 6dp before summing)."""
    dot = (
        "list_sum(list_transform(generate_series(1, len(e.embedding)),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))"
    )
    en = (
        "sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))"
    )
    qn = (
        "sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),"
        " i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))"
    )
    norm = (
        "CASE WHEN max({s}) OVER () - min({s}) OVER () > 0"
        " THEN round(({s} - min({s}) OVER ())"
        " / (max({s}) OVER () - min({s}) OVER ()), 6)"
        " ELSE 1.0 END"
    )
    return f"""{index_ctes()}{_scored_ctes(terms, k_each)},
bmn AS (SELECT doc_id, {float(w_bm)!r} * {norm.format(s='score')} AS c
        FROM top),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {int(q_vec_id)}),
cosd AS (SELECT e.vec_id AS doc_id, {dot} / ({en} * {qn}) AS cos
         FROM embeddings e CROSS JOIN q
         WHERE e.vec_id <> {int(q_vec_id)}),
vtop AS (SELECT doc_id, cos FROM cosd
         ORDER BY cos DESC, doc_id ASC LIMIT {int(k_each)}),
vn AS (SELECT doc_id, {float(w_vec)!r} * {norm.format(s='cos')} AS c
       FROM vtop),
u AS (SELECT * FROM bmn UNION ALL SELECT * FROM vn)
SELECT doc_id, round(sum(c), 6) AS lin_score, count(*) AS n_lists
FROM u GROUP BY doc_id
ORDER BY lin_score DESC, doc_id ASC LIMIT {int(n)}"""


def vocab_kl_sql(split_col: str, split_a: str, split_b: str,
                 add_k: float = 0.5) -> str:
    """Oracle for ops.text.vocab_kl: same tokenizer CTE, conditional
    counts over the union vocabulary, add-k smoothed two-way KL."""
    from katta_spark.tokenizer import duckdb_tokens_sql

    a = split_a.replace("'", "''")
    b = split_b.replace("'", "''")
    k = float(add_k)
    tok = duckdb_tokens_sql(
        f"(SELECT * FROM {DOCS}"
        f" WHERE {split_col} IN ('{a}', '{b}'))",
        "doc_id", "text",
    )
    return f"""
WITH tokk AS (
  SELECT t.doc_id, t.term, d.{split_col} = '{a}' AS is_a
  FROM ({tok}) t JOIN {DOCS} d ON t.doc_id = d.doc_id),
counts AS (
  SELECT term,
         sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
  FROM tokk GROUP BY term),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(ca) AS BIGINT) AS n_a,
         CAST(sum(cb) AS BIGINT) AS n_b
  FROM counts),
pq AS (
  SELECT (ca + {k!r}) / (n_a + {k!r} * n_terms) AS p,
         (cb + {k!r}) / (n_b + {k!r} * n_terms) AS q,
         n_terms, n_a, n_b
  FROM counts, tot)
SELECT max(n_terms) AS n_terms, max(n_a) AS n_a, max(n_b) AS n_b,
       round(sum(p * ln(p / q)), 6) AS kl_ab,
       round(sum(q * ln(q / p)), 6) AS kl_ba
FROM pq"""


def group_score_sql(terms: list[str], group_field: str,
                    score_mode: str = "sum", k: int = 10,
                    mode: str = "or") -> str:
    """has_child / block-join score_mode oracle (mirror of
    PhysicalIndex.group_score_topk): per-hit scores rounded to 6dp
    before the group aggregate."""
    agg = {"sum": "sum", "max": "max", "min": "min", "avg": "avg"}[
        score_mode
    ]
    n_terms = len(set(terms))
    having = (
        f"HAVING count(*) = {n_terms}" if mode == "and" and n_terms > 1 else ""
    )
    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, round(sum({score_sql()}), 6) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN {_term_list(terms)}
  GROUP BY tf.doc_id {having}
)
SELECT d.{group_field}, CAST(count(*) AS BIGINT) AS n_hits,
       round({agg}(s.score), 6) AS score
FROM scored s JOIN {DOCS} d ON s.doc_id = d.doc_id
GROUP BY d.{group_field}
ORDER BY score DESC, d.{group_field} ASC LIMIT {int(k)}"""


def sq_ann_sql(k: int = 10, rerank: int = 30, q_vec_id: int = 0) -> str:
    """Oracle for ops.ann_index.build_sq_index + sq_query: the same
    per-vector int8 quantization (scale = max|v|/127, half-up floor
    formula), approximate-cosine shortlist of ``rerank``, exact
    rescoring on the raw vectors, exact top-``k``."""
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings
           WHERE vec_id = {int(q_vec_id)}),
e AS (SELECT vec_id, embedding FROM embeddings
      WHERE vec_id <> {int(q_vec_id)}),
enc AS (
  SELECT vec_id, embedding,
         greatest(list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS scale
  FROM e),
codes AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
           x -> floor(CAST(x AS DOUBLE) / scale + 0.5)) AS c
  FROM enc),
ap AS (
  SELECT vec_id, embedding,
         list_sum(list_transform(generate_series(1, len(c)),
           i -> c[i] * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(c, x -> x * x)))
            * sqrt(list_sum(list_transform(q.qv,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_a
  FROM codes CROSS JOIN q),
short AS (SELECT * FROM ap ORDER BY cos_a DESC, vec_id ASC
          LIMIT {int(rerank)}),
exact AS (
  SELECT s.vec_id,
         list_sum(list_transform(generate_series(1, len(s.embedding)),
           i -> CAST(s.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(s.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qv,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
  FROM short s CROSS JOIN q)
SELECT vec_id, round(cos, 6) AS cos
FROM exact ORDER BY cos DESC, vec_id ASC LIMIT {int(k)}"""


def span_within_sql(little: str, big1: str, big2: str,
                    width: int = 4, k: int = 10) -> str:
    """SpanWithin oracle (mirror of PhysicalIndex.span_within_topk,
    any-pair containment): a little position q survives when some
    big1 at [q-width, q] pairs with some big2 at [q, p1+width];
    score = single-term BM25 with tf = surviving count."""
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    lt = little.lower().replace("'", "''")
    b1 = big1.lower().replace("'", "''")
    b2 = big2.lower().replace("'", "''")
    w = int(width)
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    idf = (
        "ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(dfv.df AS DOUBLE)"
        " + 0.5) / (CAST(dfv.df AS DOUBLE) + 0.5))"
    )
    tfn = (
        f"(CAST(s.tfp AS DOUBLE) * {K1 + 1.0!r}) / (CAST(s.tfp AS DOUBLE)"
        f" + {K1!r} * ({1.0 - B!r} + {B!r} * CAST(dl.dl AS DOUBLE)"
        " / stats.avgdl))"
    )
    return f"""{index_ctes()},
tokl AS ({tokl}),
surv AS (
  SELECT doc_id,
         len(list_filter(generate_series(1, len(toks)),
             q -> toks[q] = '{lt}'
               AND len(list_filter(
                     generate_series(greatest(1, q - {w}), q),
                     p1 -> toks[p1] = '{b1}'
                       AND len(list_filter(
                             generate_series(q,
                               least(len(toks), p1 + {w})),
                             p2 -> toks[p2] = '{b2}')) > 0)) > 0))
           AS tfp
  FROM tokl
),
scored AS (
  SELECT s.doc_id, {idf} * {tfn} AS score
  FROM surv s
  JOIN dl ON s.doc_id = dl.doc_id
  JOIN dfv ON dfv.term = '{lt}'
  CROSS JOIN stats
  WHERE s.tfp > 0
)
SELECT doc_id, round(score, 6) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT {int(k)})"""
