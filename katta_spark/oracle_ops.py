"""DuckDB oracle SQL for the training-data pipeline operators
(dedup / text analysis / similarity), generated from the same
constants as the Spark implementations in katta_spark.ops."""

from __future__ import annotations

from katta_spark.ops.dedup import MERSENNE_P
from katta_spark.ops.text import LANG_PROFILES
from katta_spark.tokenizer import duckdb_tokens_list_sql, duckdb_tokens_sql

DOCS = "documents"

_H32 = "CAST(concat('0x', substr(md5({x}), 1, 8)) AS BIGINT)"


def _shingle_ctes(n: int = 3) -> str:
    """CTEs: tokl(doc_id, toks) and sh(doc_id, shingle) distinct."""
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    grams = ", ".join(f"toks[i+{d}]" for d in range(n))
    return f"""WITH tokl AS ({tokl}),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) >= {n}
         THEN list_transform(generate_series(1, len(toks) - {n - 1}),
                             i -> concat_ws(' ', {grams}))
         ELSE [] END) AS shingle
  FROM tokl
)"""


def ngram_jaccard_sql(threshold: float = 0.5, n: int = 3) -> str:
    return f"""{_shingle_ctes(n)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
  SELECT doc_a, doc_b,
         CAST(n_common AS DOUBLE)
         / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
) WHERE jaccard >= {threshold!r}"""


def containment_sql(threshold: float = 0.8, n: int = 3) -> str:
    """Oracle for ops.dedup.containment_pairs (Broder containment)."""
    return f"""{_shingle_ctes(n)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(containment, 6) AS containment FROM (
  SELECT doc_a, doc_b,
         CAST(n_common AS DOUBLE)
         / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
) WHERE containment >= {threshold!r}"""


def minhash_lsh_sql(num_hashes: int = 16, bands: int = 4, n: int = 3) -> str:
    rpb = num_hashes // bands
    fam = ", ".join(f"({i}, {2 * i + 1}, {i * i + 1})" for i in range(num_hashes))
    return f"""{_shingle_ctes(n)},
fam(h_idx, a, b) AS (VALUES {fam}),
shx AS (SELECT doc_id, {_H32.format(x='shingle')} AS x FROM sh),
mh AS (
  SELECT doc_id, h_idx, min((a * x + b) % {MERSENNE_P}) AS minhash
  FROM shx CROSS JOIN fam GROUP BY doc_id, h_idx
),
banded AS (
  SELECT doc_id, CAST(h_idx // {rpb} AS INT) AS band,
         md5(array_to_string(list_sort(array_agg(concat(h_idx, ':', minhash))), ',')) AS bucket
  FROM mh GROUP BY doc_id, band
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b"""


def minhash_decontam_sql(bench_pred: str, num_hashes: int = 16,
                         bands: int = 4, n: int = 3,
                         threshold: float = 0.5) -> str:
    """Oracle for ops.decontam.minhash_decontaminate with the
    benchmark carved from ``documents`` by ``bench_pred`` (a SQL
    predicate over the doc row, e.g. ``doc_id % 37 = 0``)."""
    rpb = num_hashes // bands
    fam = ", ".join(f"({i}, {2 * i + 1}, {i * i + 1})"
                    for i in range(num_hashes))
    return f"""{_shingle_ctes(n)},
fam(h_idx, a, b) AS (VALUES {fam}),
shx AS (SELECT doc_id, {_H32.format(x='shingle')} AS x FROM sh),
mh AS (
  SELECT doc_id, h_idx, min((a * x + b) % {MERSENNE_P}) AS minhash
  FROM shx CROSS JOIN fam GROUP BY doc_id, h_idx
),
banded AS (
  SELECT doc_id, CAST(h_idx // {rpb} AS INT) AS band,
         md5(array_to_string(list_sort(array_agg(concat(h_idx, ':', minhash))), ',')) AS bucket
  FROM mh GROUP BY doc_id, band
),
bench_ids AS (SELECT doc_id FROM {DOCS} WHERE {bench_pred}),
cand AS (
  SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_bands
  FROM banded c
  JOIN banded b ON c.band = b.band AND c.bucket = b.bucket
  WHERE b.doc_id IN (SELECT doc_id FROM bench_ids)
    AND c.doc_id <> b.doc_id
  GROUP BY 1, 2
),
agree AS (
  SELECT cand.doc_id, cand.bench_id, cand.n_bands,
         avg(CASE WHEN mc.minhash = mb.minhash THEN 1.0 ELSE 0.0 END)
           AS est
  FROM cand
  JOIN mh mc ON mc.doc_id = cand.doc_id
  JOIN mh mb ON mb.doc_id = cand.bench_id AND mb.h_idx = mc.h_idx
  GROUP BY 1, 2, 3
)
SELECT doc_id, bench_id, n_bands, round(est, 6) AS jaccard_est,
       est >= {threshold!r} AS contaminated
FROM agree"""


_H32_HI = "CAST(concat('0x', substr(md5({x}), 9, 8)) AS BIGINT)"


def _simhash_ctes() -> str:
    """CTE prefix ending in sh(doc_id, simhash_hi, simhash_lo) —
    mirror of katta_spark.ops.dedup.simhash64."""
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")

    def bits(col: str) -> str:
        return " + ".join(
            f"CASE WHEN coalesce(list_sum(list_transform({col}, h -> ((h >> {j}) % 2) * 2 - 1)), 0) > 0"
            f" THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
            for j in range(32)
        )

    return f"""WITH tokl AS ({tokl}),
hx AS (SELECT doc_id,
              list_transform(toks, x -> {_H32.format(x='x')}) AS hlo,
              list_transform(toks, x -> {_H32_HI.format(x='x')}) AS hhi
       FROM tokl),
sh AS (SELECT doc_id, CAST({bits('hhi')} AS BIGINT) AS simhash_hi,
              CAST({bits('hlo')} AS BIGINT) AS simhash_lo
       FROM hx)"""


def simhash_sql() -> str:
    return f"""{_simhash_ctes()}
SELECT doc_id, simhash_hi, simhash_lo FROM sh"""


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Band-equality candidate pairs + popcount verify — mirror of
    katta_spark.ops.dedup.simhash_candidate_pairs."""
    return f"""{_simhash_ctes()},
bands AS (
  SELECT doc_id, simhash_hi, simhash_lo, band,
         CASE band WHEN 0 THEN simhash_lo & 65535
                   WHEN 1 THEN (simhash_lo >> 16) & 65535
                   WHEN 2 THEN simhash_hi & 65535
                   ELSE (simhash_hi >> 16) & 65535 END AS val
  FROM sh CROSS JOIN (VALUES (0), (1), (2), (3)) t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash_hi, b.simhash_hi))
            + bit_count(xor(a.simhash_lo, b.simhash_lo)) AS BIGINT) AS hamming
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {max_hamming}"""


def decontam_sql(n: int = 5, threshold: float = 0.5,
                 bench_where: str = "doc_id % 37 = 0") -> str:
    """Oracle for ops.decontam.ngram_overlap with the benchmark set
    defined as the documents matching ``bench_where`` (the engine is
    handed that subset as its bench DataFrame)."""
    return f"""{_shingle_ctes(n)},
bset AS (SELECT DISTINCT shingle FROM sh WHERE {bench_where}),
per AS (
  SELECT s.doc_id, count(*) AS n_ngrams,
         sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_matched
  FROM sh s LEFT JOIN bset b ON s.shingle = b.shingle
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(p.n_matched, 0) AS BIGINT) AS n_matched,
       round(coalesce(CAST(p.n_matched AS DOUBLE) / p.n_ngrams, 0.0), 6)
         AS overlap,
       coalesce(CAST(p.n_matched AS DOUBLE) / p.n_ngrams, 0.0)
         >= {threshold!r} AS contaminated
FROM {DOCS} d LEFT JOIN per p ON d.doc_id = p.doc_id"""


def unigram_lp_sql() -> str:
    """Oracle for ops.text.unigram_logprob (MLE corpus unigram LM)."""
    from katta_spark.oracle_sql import index_ctes

    return f"""{index_ctes()},
tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS total FROM dfv),
per AS (
  SELECT tf.doc_id,
         CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         sum(tf.tf * ln(CAST(dfv.cf AS DOUBLE) / tot.total)) / sum(tf.tf) AS lp
  FROM tf JOIN dfv ON tf.term = dfv.term CROSS JOIN tot
  GROUP BY tf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(coalesce(p.lp, 0.0), 6) AS avg_logprob
FROM {DOCS} d LEFT JOIN per p ON d.doc_id = p.doc_id"""


def keywords_sql(m: int = 5) -> str:
    """Oracle for ops.text.keywords_tfidf (per-doc top-m TF-IDF
    keywords, smooth idf = ln(1 + N/df), tie term asc)."""
    from katta_spark.oracle_sql import index_ctes

    return f"""{index_ctes()},
scored AS (
  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         tf.tf * ln(1.0 + CAST(stats.n_docs AS DOUBLE)
                          / CAST(dfv.df AS DOUBLE)) AS score
  FROM tf JOIN dfv ON tf.term = dfv.term CROSS JOIN stats
),
ranked AS (
  SELECT doc_id, term, tf, score,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term ASC
         ) AS BIGINT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, round(score, 6) AS score, rank
FROM ranked WHERE rank <= {int(m)}"""


def lm_buckets_sql(n_buckets: int = 3) -> str:
    """Oracle for ops.text.lm_buckets: ntile per language over the
    6-dp-rounded unigram LM score (desc), doc_id tie-break."""
    return f"""WITH lp AS ({unigram_lp_sql()})
SELECT p.doc_id, d.lang, p.avg_logprob,
       CAST(ntile({n_buckets}) OVER (
         PARTITION BY d.lang
         ORDER BY p.avg_logprob DESC, p.doc_id ASC) AS INT) AS bucket
FROM lp p JOIN {DOCS} d ON p.doc_id = d.doc_id"""


def code_quality_sql(max_line: int = 1000, max_avg_line: float = 200.0,
                     min_alnum: float = 0.25) -> str:
    """Oracle for ops.text.code_quality (StarCoder-style line/alnum
    filters) — list algebra over string_split lines."""
    return f"""WITH base AS (
  SELECT doc_id,
    len(lines) AS n_lines,
    coalesce(list_sum(list_transform(lines, x -> length(x))), 0) AS sum_len,
    coalesce(list_max(list_transform(lines, x -> length(x))), 0) AS max_len,
    len(list_filter(lines, x -> trim(x) <> '')) AS n_nonblank,
    len(list_filter(lines, x -> starts_with(ltrim(x), '#')
                             OR starts_with(ltrim(x), '//'))) AS n_comment,
    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_alnum,
    length(text) AS n_chars_t
  FROM (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM {DOCS})
)
SELECT doc_id,
  CAST(n_lines AS BIGINT) AS n_lines,
  round(CAST(sum_len AS DOUBLE) / greatest(n_lines, 1), 6) AS avg_line_len,
  CAST(max_len AS BIGINT) AS max_line_len,
  round(CAST(n_comment AS DOUBLE) / greatest(n_nonblank, 1), 6) AS comment_ratio,
  round(CAST(n_lines - n_nonblank AS DOUBLE) / greatest(n_lines, 1), 6) AS blank_ratio,
  round(CAST(n_alnum AS DOUBLE) / greatest(n_chars_t, 1), 6) AS alnum_frac,
  (max_len <= {max_line}
   AND CAST(sum_len AS DOUBLE) / greatest(n_lines, 1) <= {max_avg_line!r}
   AND CAST(n_alnum AS DOUBLE) / greatest(n_chars_t, 1) >= {min_alnum!r})
    AS keep
FROM base"""


def pack_greedy_sql(budget: int = 2000, group_col: str = "source",
                    size_expr: str = "n_chars") -> str:
    """Oracle for ops.packing.pack_greedy: a recursive CTE walks each
    group in doc_id order carrying (pack_id, acc) — the same greedy
    recurrence the Arrow kernel runs."""
    return f"""WITH RECURSIVE ordered AS (
  SELECT CAST({group_col} AS VARCHAR) AS grp, doc_id,
         CAST({size_expr} AS BIGINT) AS size,
         row_number() OVER (PARTITION BY {group_col} ORDER BY doc_id) AS rn
  FROM {DOCS}
),
walk AS (
  SELECT grp, doc_id, size, rn,
         CAST(0 AS BIGINT) AS pack_id,
         CAST(0 AS BIGINT) AS pack_offset,
         size AS acc
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.grp, o.doc_id, o.size, o.rn,
         CASE WHEN w.acc > 0 AND w.acc + o.size > {budget}
              THEN w.pack_id + 1 ELSE w.pack_id END,
         CASE WHEN w.acc > 0 AND w.acc + o.size > {budget}
              THEN CAST(0 AS BIGINT) ELSE w.acc END,
         CASE WHEN w.acc > 0 AND w.acc + o.size > {budget}
              THEN o.size ELSE w.acc + o.size END
  FROM walk w JOIN ordered o ON o.grp = w.grp AND o.rn = w.rn + 1
)
SELECT doc_id, grp, pack_id, pack_offset, size FROM walk"""


def pack_texts_sql(budget: int = 2000, group_col: str = "source",
                   size_expr: str = "n_chars") -> str:
    """Oracle for ops.packing.pack_texts: the greedy walk joined back
    to the docs, texts concatenated in pack-offset order."""
    return f"""SELECT p.grp, p.pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(d.text, chr(10) ORDER BY p.pack_offset) AS seq
FROM ({pack_greedy_sql(budget, group_col, size_expr)}) p
JOIN {DOCS} d ON p.doc_id = d.doc_id
GROUP BY p.grp, p.pack_id"""


def fingerprint_dup_sql() -> str:
    tok = duckdb_tokens_sql(DOCS, "doc_id", "text")
    return f"""WITH tok AS ({tok}),
fp AS (
  SELECT d.doc_id,
         md5(coalesce(array_to_string(list_sort(array_agg(DISTINCT t.term)), ' '), '')) AS fingerprint
  FROM {DOCS} d LEFT JOIN tok t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id
)
SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS n_dups
FROM fp GROUP BY fingerprint HAVING count(*) > 1"""


def quality_sql() -> str:
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    stops = ", ".join(f"'{s}'" for s in LANG_PROFILES["en"])
    return f"""WITH tokl AS ({tokl}),
q AS (
  SELECT d.doc_id,
         length(d.text) AS len_chars,
         CAST(length(regexp_replace(d.text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
           / greatest(length(d.text), 1) AS alpha_ratio,
         CAST(len(list_filter(toks, x -> list_contains([{stops}], x))) AS DOUBLE)
           / greatest(len(toks), 1) AS stop_ratio
  FROM {DOCS} d JOIN tokl t ON d.doc_id = t.doc_id
)
SELECT doc_id, CAST(len_chars AS BIGINT) AS len_chars,
       round(alpha_ratio, 6) AS alpha_ratio,
       round(stop_ratio, 6) AS stop_ratio,
       round(greatest(least(alpha_ratio * (1.0 - abs(stop_ratio - 0.4)), 1.0), 0.0), 6) AS quality
FROM q"""


def _sig_sql(col: str, dims: int, n_planes: int,
             plane_offset: int = 0) -> str:
    """LSH signature of a list column — same deterministic hyperplanes
    cos(1 + j*dims + d) as katta_spark.ops.similarity.hyperplane_bits."""
    terms = []
    for j0 in range(n_planes):
        j = plane_offset + j0
        dot = (
            f"list_sum(list_transform(generate_series(1, {dims}), "
            f"i -> CAST({col}[i] AS DOUBLE) * cos(1.0 + {j * dims} + (i - 1))))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j0} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def random_project_sql(dims: int = 64, out_dims: int = 4,
                       scale: bool = True) -> str:
    """Oracle for ops.similarity.random_project, exploded to
    (vec_id, dim, val) scalar rows — same cos(1 + j*dims + d)
    coefficient family as the LSH planes."""
    import math

    fac = math.sqrt(dims / out_dims) if scale else 1.0
    comps = []
    for j in range(out_dims):
        dot = (
            f"list_sum(list_transform(generate_series(1, {dims}), "
            f"i -> CAST(embedding[i] AS DOUBLE)"
            f" * cos(1.0 + {j * dims} + (i - 1))))"
        )
        comps.append(
            f"SELECT vec_id, {j} AS dim, round({dot} * {fac!r}, 6) AS val "
            f"FROM embeddings"
        )
    return "\nUNION ALL\n".join(comps)


def lsh_ann_sql(dims: int = 64, n_planes: int = 12, k: int = 10) -> str:
    """Single-probe LSH-bucketed ANN: exact cosine within the query's
    hyperplane-signature bucket."""
    dot = (
        "list_sum(list_transform(generate_series(1, len(e.embedding)), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))"
    )
    n_e = (
        "sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))"
    )
    n_q = (
        "sqrt(list_sum(list_transform(generate_series(1, len(q.qv)), "
        "i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))"
    )
    return f"""
WITH q AS (SELECT embedding AS qv, {_sig_sql('embedding', dims, n_planes)} AS sig
           FROM embeddings WHERE vec_id = 0),
e AS (SELECT vec_id, embedding, {_sig_sql('embedding', dims, n_planes)} AS sig
      FROM embeddings WHERE vec_id <> 0),
c AS (SELECT e.vec_id, {dot} / ({n_e} * {n_q}) AS cos
      FROM e JOIN q ON e.sig = q.sig)
SELECT vec_id, round(cos, 6) AS cos
FROM (SELECT * FROM c ORDER BY cos DESC, vec_id ASC LIMIT {k})"""


def ivf_ann_sql(n_centroids: int = 16, nprobe: int = 2, k: int = 10,
                filter_sql: str | None = None) -> str:
    """IVF-flat ANN oracle — mirror of ops.ann_index.build_ivf_index /
    ivf_query: coarse quantizer = the ``n_centroids`` smallest-id
    vectors, assignment = argmax cosine (tie-break cid asc), probe =
    the ``nprobe`` centroids nearest the query, exact rerank within
    the probed partitions.  ``filter_sql`` (over embeddings columns,
    e.g. ``label = 2``) mirrors the engine's metadata pre-filter:
    applied to the candidate rows BEFORE the rerank."""

    def cos(a: str, b: str) -> str:
        dot = (
            f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        )
        na = (
            f"sqrt(list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
        )
        nb = (
            f"sqrt(list_sum(list_transform(generate_series(1, len({b})), "
            f"i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
        )
        return f"{dot} / ({na} * {nb})"

    flt = (
        f"\n    AND a.vec_id IN (SELECT vec_id FROM embeddings"
        f" WHERE {filter_sql})" if filter_sql else ""
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cid,
         embedding AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0
        ORDER BY vec_id ASC LIMIT {n_centroids})
),
probe AS (
  SELECT cid FROM (
    SELECT c.cid, {cos('q.qv', 'c.cvec')} AS pc
    FROM cents c CROSS JOIN q
    ORDER BY pc DESC, c.cid ASC LIMIT {nprobe})
),
assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
      row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {cos('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS rn
    FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0) e
    CROSS JOIN cents c
  ) WHERE rn = 1
),
rer AS (
  SELECT a.vec_id, {cos('a.embedding', 'q.qv')} AS cos
  FROM assign a CROSS JOIN q
  WHERE a.cid IN (SELECT cid FROM probe){flt}
)
SELECT vec_id, round(cos, 6) AS cos
FROM (SELECT * FROM rer ORDER BY cos DESC, vec_id ASC LIMIT {k})"""


def semantic_dedup_sql(n_centroids: int = 16,
                       threshold: float = 0.95) -> str:
    """SemDeDup oracle (mirror of ops.dedup.semantic_dedup):
    smallest-id centroids, argmax-cosine assignment (tie cid asc),
    drop rows with a >= threshold cosine to a lower-id row of the
    same cluster."""

    def cos(a: str, b: str) -> str:
        dot = (
            f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        )
        na = (
            f"sqrt(list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
        )
        nb = (
            f"sqrt(list_sum(list_transform(generate_series(1, len({b})), "
            f"i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
        )
        return f"{dot} / ({na} * {nb})"

    return f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cid,
         embedding AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id ASC LIMIT {int(n_centroids)})
),
assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
      row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {cos('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
drops AS (
  SELECT DISTINCT a.vec_id
  FROM assign a JOIN assign b ON a.cid = b.cid AND b.vec_id < a.vec_id
  WHERE {cos('a.embedding', 'b.embedding')} >= {float(threshold)!r}
)
SELECT a.vec_id AS vec_id, a.cid AS cid,
       a.vec_id NOT IN (SELECT vec_id FROM drops) AS keep
FROM assign a ORDER BY 1"""


def ivf_batch_sql(query_ids: list[int] = (0, 1), n_centroids: int = 16,
                  nprobe: int = 2, k: int = 10) -> str:
    """Oracle for ops.ann_index.ivf_query_batch over the same index
    as sim_ivf_ann (corpus = embeddings minus vec_id 0): per-query
    probe + rerank, unioned with a qid label."""

    def cos(a: str, b: str) -> str:
        dot = (
            f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        )
        na = (
            f"sqrt(list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
        )
        nb = (
            f"sqrt(list_sum(list_transform(generate_series(1, len({b})), "
            f"i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
        )
        return f"{dot} / ({na} * {nb})"

    qids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
WITH qs AS (SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qv
            FROM embeddings WHERE vec_id IN ({qids})),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cid,
         embedding AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0
        ORDER BY vec_id ASC LIMIT {n_centroids})
),
probe AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
      row_number() OVER (PARTITION BY q.qid
        ORDER BY {cos('q.qv', 'c.cvec')} DESC, c.cid ASC) AS rn
    FROM cents c CROSS JOIN qs q
  ) WHERE rn <= {nprobe}
),
assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
      row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {cos('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS rn
    FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0) e
    CROSS JOIN cents c
  ) WHERE rn = 1
),
rer AS (
  SELECT q.qid, a.vec_id AS id, {cos('a.embedding', 'q.qv')} AS cos,
    row_number() OVER (PARTITION BY q.qid
      ORDER BY {cos('a.embedding', 'q.qv')} DESC, a.vec_id ASC) AS rn
  FROM assign a
  JOIN probe p ON a.cid = p.cid
  JOIN qs q ON q.qid = p.qid
)
SELECT qid, id, round(cos, 6) AS cos FROM rer WHERE rn <= {k}"""


def dup_clusters_sql(pairs_sql: str) -> str:
    """(doc_id, cluster) connected components over a candidate-pair
    query — recursive-CTE transitive closure + min per node (mirror
    of katta_spark.ops.dedup.dup_clusters; exact on the small test
    graphs, where the closure stays tiny)."""
    return f"""WITH RECURSIVE pairs AS ({pairs_sql}),
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS doc_id FROM e),
r(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src
)
SELECT src AS doc_id, min(dst) AS cluster FROM r GROUP BY src"""


def keep_best_sql(pairs_sql: str, metric: str = "n_chars") -> str:
    """Survivorship oracle (mirror of ops.dedup.keep_best_per_cluster
    over dup_clusters of ``pairs_sql``): one survivor per transitive
    cluster, highest metric, ties by doc_id; singletons survive."""
    return f"""WITH RECURSIVE pairs AS ({pairs_sql}),
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS doc_id FROM e),
r(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src
),
clus AS (SELECT src AS doc_id, min(dst) AS cluster FROM r GROUP BY src),
lab AS (
  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster, d.{metric}
  FROM {DOCS} d LEFT JOIN clus c ON d.doc_id = c.doc_id
),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster ORDER BY {metric} DESC, doc_id ASC) AS rn
  FROM lab
)
SELECT doc_id, cluster, {metric} FROM rk WHERE rn = 1"""


def cosine_dup_sql(threshold: float = 0.25, dims: int = 64,
                   n_planes: int = 4, n_tables: int = 2) -> str:
    """Embedding-cosine near-dup pairs — mirror of
    katta_spark.ops.similarity.cosine_dup_pairs (same deterministic
    hyperplane family, bucket join per table, exact cosine verify)."""
    tbls = []
    for t in range(n_tables):
        sig = _sig_sql("embedding", dims, n_planes, plane_offset=t * n_planes)
        tbls.append(
            f"SELECT {t} AS tbl, {sig} AS sig, vec_id, embedding FROM embeddings"
        )
    union = " UNION ALL ".join(tbls)
    dot = (
        "list_sum(list_transform(generate_series(1, len(a.embedding)), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    )
    na = (
        "sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))"
    )
    nb = (
        "sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)), "
        "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))"
    )
    return f"""
WITH e AS ({union}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b
    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
),
v AS (
  SELECT c.id_a, c.id_b, {dot} / ({na} * {nb}) AS cos
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.id_a
  JOIN embeddings b ON b.vec_id = c.id_b
)
SELECT id_a, id_b, round(cos, 6) AS cos FROM v WHERE cos >= {threshold!r}"""


def mm_image_meta_sql() -> str:
    """Oracle for the fake image decode: payload = unhex(md5(text)),
    digest = md5(lower-hex(payload)) = md5(md5(text))."""
    return f"""
WITH d AS (SELECT doc_id, md5(md5(text)) AS h FROM {DOCS})
SELECT doc_id,
       16 + CAST(concat('0x', substr(h, 1, 2)) AS INT) % 64 AS width,
       16 + CAST(concat('0x', substr(h, 3, 2)) AS INT) % 64 AS height,
       3 AS channels,
       'fake/md5' AS format
FROM d"""


def mm_frames_sql(every: int = 4, max_frames: int = 3) -> str:
    """Oracle for the fake frame sampler: hex-chained md5 frames."""
    selects = []
    prev = "md5(text)"
    for j in range(max_frames):
        cur = f"md5(concat({prev}, '{format(j, '02x')}'))"
        selects.append(
            f"SELECT doc_id, {j * every} AS frame_idx, {cur} AS frame_hex "
            f"FROM {DOCS}"
        )
        prev = cur
    union = " UNION ALL ".join(selects)
    return f"SELECT * FROM ({union})"


def pgm_meta_sql() -> str:
    """Oracle for ops.multimodal.attach_pgm_payload |> pgm_meta: the
    generator's dimension formulas state what the ENGINE's real P5
    parser must recover from the bytes."""
    return f"""
SELECT doc_id,
       CAST(16 + doc_id % 16 AS INT) AS width,
       CAST(8 + doc_id % 8 AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST((16 + doc_id % 16) * (8 + doc_id % 8) AS BIGINT) AS n_pixels
FROM {DOCS}"""


def pgm_features_sql() -> str:
    """Oracle for pgm_quadrant_features (wide): pixel(r,c) =
    (id*7 + (r*w+c)*13) % 256; quadrant means over floor-half splits;
    the SAME half-up 6dp rounding device as the engine."""
    def mean(rlo, rhi, clo, chi):
        return (
            "floor((SELECT avg((doc_id*7 + (r.r * w + c.c) * 13) % 256)"
            f" FROM (SELECT unnest(generate_series({rlo}, {rhi} - 1)) AS r) r,"
            f"      (SELECT unnest(generate_series({clo}, {chi} - 1)) AS c) c"
            ") * 1e6 + 0.5) / 1e6"
        )

    return f"""
WITH d AS (SELECT doc_id, 16 + doc_id % 16 AS w, 8 + doc_id % 8 AS h
           FROM {DOCS})
SELECT doc_id,
       {mean(0, "h", 0, "w")} AS f0,
       {mean(0, "h // 2", 0, "w // 2")} AS f1,
       {mean(0, "h // 2", "w // 2", "w")} AS f2,
       {mean("h // 2", "h", 0, "w // 2")} AS f3,
       {mean("h // 2", "h", "w // 2", "w")} AS f4
FROM d"""


def pgm_stream_sql(every: int = 2) -> str:
    """Oracle for attach_pgm_stream |> pgm_stream_sample: frames
    0..(2+id%3)-1, sampled every ``every``, 16x8, pixel(f, p) =
    (id*7 + f*19 + p*13) % 256; half-up 6dp mean."""
    return f"""
WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS nf FROM {DOCS}),
fr AS (SELECT doc_id, unnest(generate_series(0, nf - 1)) AS fi FROM d)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
       CAST(16 AS INT) AS width, CAST(8 AS INT) AS height,
       floor((SELECT avg((doc_id * 7 + fi * 19 + p.p * 13) % 256)
              FROM (SELECT unnest(generate_series(0, 127)) AS p) p)
             * 1e6 + 0.5) / 1e6 AS frame_mean
FROM fr WHERE fi % {int(every)} = 0"""


def wav_meta_sql() -> str:
    """Oracle for attach_wav_payload |> wav_meta: generator formulas
    state what the engine's real RIFF chunk walk must recover."""
    return f"""
SELECT doc_id, CAST(1 AS INT) AS channels, CAST(8000 AS INT) AS sample_rate,
       CAST(16 AS INT) AS bits,
       CAST(64 + doc_id % 64 AS BIGINT) AS n_samples
FROM {DOCS}"""


def wav_features_sql() -> str:
    """Oracle for wav_features: sample[i] = ((id*31 + i*17) % 2048)
    - 1024 — integer waveform, exact RMS / zero-crossing / mean-abs;
    the shared half-up 6dp device."""
    return f"""
WITH d AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM {DOCS}),
l AS (SELECT doc_id, n,
        list_transform(generate_series(0, n - 1),
          i -> CAST(((doc_id * 31 + i * 17) % 2048) - 1024 AS DOUBLE))
        AS s
      FROM d)
SELECT doc_id,
  floor(sqrt(list_sum(list_transform(s, x -> x * x)) / n) * 1e6 + 0.5)
    / 1e6 AS rms,
  CAST(list_sum(list_transform(generate_series(1, n - 1),
    i -> CASE WHEN (s[i + 1] < 0) <> (s[i] < 0) THEN 1 ELSE 0 END))
    AS BIGINT) AS zero_crossings,
  floor(list_sum(list_transform(s, x -> abs(x))) / n * 1e6 + 0.5)
    / 1e6 AS mean_abs
FROM l"""


def ts_date_facet_sql(unit: str = "day") -> str:
    return f"""
SELECT strftime(date_trunc('{unit}', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
       count(*) AS cnt
FROM events GROUP BY 1 ORDER BY 1"""


def ts_ohlc_sql(hours: int = 1) -> str:
    """Oracle for ops.timeseries.ohlc_bars: open/close via arg_min /
    arg_max on a zero-padded (epoch_us, event_id) varchar key — the
    scalar mirror of the engine's struct(ts, event_id) ordering (both
    non-negative here, so lexicographic == numeric order)."""
    ordk = "printf('%020d%020d', epoch_us(ts), event_id)"
    return f"""
SELECT strftime(time_bucket(INTERVAL '{hours} hour', ts), '%Y-%m-%d %H:%M:%S') AS win,
       event_type,
       count(*) AS n,
       round(arg_min(value, {ordk}), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(arg_max(value, {ordk}), 6) AS close
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""


def ts_window_agg_sql(hours: int = 1) -> str:
    return f"""
SELECT strftime(time_bucket(INTERVAL '{hours} hour', ts), '%Y-%m-%d %H:%M:%S') AS win,
       event_type,
       count(*) AS n,
       round(sum(value), 6) AS sum_value,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""


def ts_sliding_window_sql(width_s: int = 7200, hop_s: int = 3600) -> str:
    """Oracle for ops.timeseries.sliding_window_agg: each event is
    replicated into its width/hop covering windows via a small
    generate_series cross join, mirroring Spark's window expansion.
    Window starts are epoch-aligned exactly like Spark's
    ``F.window`` (start = hop*floor(epoch/hop) - i*hop)."""
    reps = width_s // hop_s
    start = (
        f"make_timestamp(({hop_s} * CAST(floor(epoch(ts) / {hop_s}) AS BIGINT)"
        f" - g.i * {hop_s}) * 1000000)"
    )
    return f"""
SELECT strftime({start}, '%Y-%m-%d %H:%M:%S') AS win,
       count(*) AS n,
       round(sum(value), 6) AS sum_value,
       round(avg(value), 6) AS avg_value
FROM events, (SELECT unnest(range({reps})) AS i) g
GROUP BY 1 ORDER BY 1"""


def ts_gap_fill_sql(step: str = "12 hours", key_where: str = "user_id < 3"
                    ) -> str:
    """Oracle for ops.timeseries.gap_fill: per-key generate_series
    grid + ASOF join to the latest observation at-or-before each grid
    point (same-timestamp observations averaged first, as the engine
    does)."""
    return f"""
WITH ev AS (SELECT * FROM events WHERE {key_where}),
obs AS (SELECT user_id, ts, avg(value) AS v FROM ev GROUP BY 1, 2),
bounds AS (SELECT user_id, min(ts) AS lo, max(ts) AS hi FROM ev GROUP BY 1),
grid AS (SELECT user_id,
                unnest(generate_series(lo, hi, INTERVAL '{step}')) AS grid_ts
         FROM bounds)
SELECT g.user_id,
       strftime(g.grid_ts, '%Y-%m-%d %H:%M:%S') AS grid_ts,
       round(o.v, 6) AS value
FROM grid g ASOF JOIN obs o
  ON g.user_id = o.user_id AND g.grid_ts >= o.ts
ORDER BY 1, 2"""


def ts_top_events_sql(unit: str = "1 day", k: int = 3) -> str:
    """Oracle for ops.timeseries.window_top_keys (tumbling windows,
    event_type key)."""
    return f"""
WITH agg AS (
  SELECT time_bucket(INTERVAL '{unit}', ts) AS win_start,
         event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT win_start, event_type, n,
         CAST(row_number() OVER (
           PARTITION BY win_start
           ORDER BY n DESC, event_type ASC) AS INT) AS rank
  FROM agg)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win,
       event_type, n, rank
FROM ranked WHERE rank <= {k} ORDER BY 1, 4"""


def ts_session_agg_sql(gap_minutes: int = 30) -> str:
    return f"""
WITH lagd AS (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
),
marks AS (
  SELECT user_id, ts,
         CASE WHEN prev IS NULL OR ts - prev >= INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM lagd
),
sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n
FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start"""


def ts_date_math_sql(now: str, lo_expr: str, hi_expr: str) -> str:
    """Date-math window oracle: both endpoints generated from the
    SAME parse (ops.timeseries.date_math_sql) that drives the Spark
    side — the comparison exercises the two engines' calendar
    semantics, not two parsers."""
    from katta_spark.ops.timeseries import date_math_sql

    now_sql = f"TIMESTAMP '{now}'"
    lo = date_math_sql(now_sql, lo_expr)
    hi = date_math_sql(now_sql, hi_expr)
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n, min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events WHERE ts >= {lo} AND ts < {hi}"""


def ts_corr_sql() -> str:
    """Oracle for ops.timeseries.group_corr over (value, props.k):
    identical six-moment closed formula on 6dp-rounded moments."""
    return """
WITH m AS (
  SELECT event_type,
         count(*) AS n,
         round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
         round(sum(x * x), 6) AS sxx, round(sum(y * y), 6) AS syy,
         round(sum(x * y), 6) AS sxy
  FROM (
    SELECT event_type, value AS x,
           CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DOUBLE) AS y
    FROM events
  ) WHERE x IS NOT NULL AND y IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round((n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS corr
FROM m ORDER BY event_type"""


def ts_json_sql() -> str:
    return """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
FROM events GROUP BY event_type ORDER BY event_type"""


def nfc_sql() -> str:
    """Oracle for ops.text.nfc_normalize (DuckDB's nfc_normalize
    implements the same Unicode canonical composition)."""
    return f"""
SELECT doc_id, nfc_normalize(text) AS text_nfc,
       nfc_normalize(text) <> text AS changed
FROM {DOCS}"""


def clean_text_sql() -> str:
    """Mirror of ops.text.clean_text: tag strip, whitespace collapse,
    trim; n_removed = length delta."""
    clean = (
        "trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'),"
        " '\\s+', ' ', 'g'))"
    )
    return f"""
SELECT doc_id, {clean} AS clean,
       CAST(length(text) - length({clean}) AS BIGINT) AS n_removed
FROM {DOCS}"""


def bpe_tokens_sql(chunk: int = 4) -> str:
    """Mirror of ops.text.bpe_token_estimate: regex pre-tokenization
    (same dialect-portable pattern) + ceil(len/chunk) subword sum."""
    from katta_spark.ops.text import BPE_PRETOK_RE

    return f"""
WITH pre AS (
  SELECT doc_id, regexp_extract_all(text, '{BPE_PRETOK_RE}') AS toks
  FROM {DOCS}
)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_pretok,
  CAST(coalesce(list_sum(list_transform(
      toks, x -> CAST(floor((length(x) + {chunk - 1}) / {chunk}) AS BIGINT)
  )), 0) AS BIGINT) AS n_tokens_est
FROM pre"""


def repetition_sql() -> str:
    """Mirror of ops.text.repetition_ratio: duplicate-line and
    duplicate-token fractions, empty docs scoring 0.0."""
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    return f"""WITH tokl AS ({tokl}),
ln AS (
  SELECT d.doc_id,
         list_filter(string_split(d.text, chr(10)),
                     x -> trim(x) <> '') AS lines
  FROM {DOCS} d
)
SELECT l.doc_id,
  CAST(len(l.lines) AS BIGINT) AS n_lines,
  CAST(len(list_distinct(l.lines)) AS BIGINT) AS n_distinct_lines,
  round(CASE WHEN len(l.lines) = 0 THEN 0.0
        ELSE 1.0 - CAST(len(list_distinct(l.lines)) AS DOUBLE)
                   / CAST(len(l.lines) AS DOUBLE) END, 6) AS dup_line_ratio,
  round(CASE WHEN len(t.toks) = 0 THEN 0.0
        ELSE 1.0 - CAST(len(list_distinct(t.toks)) AS DOUBLE)
                   / CAST(len(t.toks) AS DOUBLE) END, 6) AS dup_token_ratio
FROM ln l JOIN tokl t ON l.doc_id = t.doc_id"""


def langid_sql() -> str:
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    hit_cols = []
    for code, kws in sorted(LANG_PROFILES.items()):
        arr = ", ".join(f"'{k}'" for k in kws)
        hit_cols.append(
            f"len(list_filter(toks, x -> list_contains([{arr}], x))) AS h_{code}"
        )
    codes = sorted(LANG_PROFILES)
    best = "greatest(" + ", ".join(f"h_{c}" for c in codes) + ")"
    case = "CASE " + " ".join(
        f"WHEN h_{c} = best THEN '{c}'" for c in codes
    ) + " END"
    return f"""WITH tokl AS ({tokl}),
hits AS (SELECT doc_id, {", ".join(hit_cols)} FROM tokl),
top AS (SELECT doc_id, {best} AS best, * FROM hits)
SELECT doc_id, {case} AS lang_pred, CAST(best AS BIGINT) AS lang_hits FROM top"""


def warc_roundtrip_sql() -> str:
    """Oracle for sources.warc attach->parse: generator formulas
    state what the real record walk must recover; content_length is
    the utf-8 OCTET length."""
    return f"""
SELECT doc_id, 'response' AS warc_type,
       'https://example.org/doc/' || doc_id AS target_uri,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       text AS payload_text
FROM {DOCS}"""


def scrub_invisible_sql() -> str:
    """Oracle for ops.text.scrub_invisible over a deterministically
    dirtied corpus (zero-width space + RLO injected for doc_id%3=0):
    the same character class in RE2 \\x{...} syntax."""
    cls = (r"[\x{200B}-\x{200F}\x{202A}-\x{202E}\x{2060}-\x{2064}"
           r"\x{2066}-\x{2069}\x{FEFF}\x{0000}-\x{0008}\x{000B}\x{000C}"
           r"\x{000E}-\x{001F}]")
    return f"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN chr(8203) || chr(8238) || text ELSE text END AS text
  FROM {DOCS})
SELECT doc_id,
       regexp_replace(text, '{cls}', '', 'g') AS text,
       CAST(length(text)
            - length(regexp_replace(text, '{cls}', '', 'g')) AS INT)
         AS n_removed
FROM dirty"""


def pii_scrub_sql() -> str:
    """Mirror of ops.text.pii_scrub: sequential redaction, each
    class counted on the text as of its turn (overlaps never double
    count).  Patterns are the shared dialect-portable set
    (ops.text.PII_PATTERNS), so Java regex and RE2 agree."""
    from katta_spark.ops.text import PII_PATTERNS

    cur = "text"
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{rep}', 'g')"
    return f"""
SELECT doc_id, {cur} AS scrubbed, {", ".join(counts)}
FROM {DOCS}"""


def ngram_top_sql(n: int = 2, k: int = 20) -> str:
    """Mirror of ops.text.ngram_top: corpus top-k word n-grams under
    the shared tokenizer, total order (count desc, ngram asc)."""
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    grams = ", ".join(f"toks[i+{d}]" for d in range(n))
    return f"""WITH tokl AS ({tokl}),
g AS (
  SELECT unnest(CASE WHEN len(toks) >= {n}
      THEN list_transform(generate_series(1, len(toks) - {n - 1}),
                          i -> concat_ws(' ', {grams}))
      ELSE [] END) AS ngram
  FROM tokl
)
SELECT ngram, count(*) AS n_occurrences FROM g
GROUP BY ngram ORDER BY n_occurrences DESC, ngram ASC LIMIT {k}"""


def _bucket_sql(key: str = "doc_id", salt: str = "") -> str:
    """DuckDB mirror of ops.sampling.hash_bucket."""
    from katta_spark.ops.sampling import N_BUCKETS

    k = f"concat('{salt}', CAST({key} AS VARCHAR))" if salt else f"CAST({key} AS VARCHAR)"
    return (
        f"CAST(concat('0x', substr(md5({k}), 1, 8)) AS BIGINT)"
        f" % {N_BUCKETS}"
    )


def hash_split_sql(weights: dict[str, float] | None = None) -> str:
    """Mirror of ops.sampling.hash_split aggregated per (split, lang):
    shares split_boundaries() with the Spark side, so the bucket
    boundaries have ONE source of truth."""
    from katta_spark.ops.sampling import DEFAULT_WEIGHTS, split_boundaries

    bounds = split_boundaries(weights or DEFAULT_WEIGHTS)
    case = "CASE " + " ".join(
        f"WHEN bucket < {hi} THEN '{name}'" for name, hi in bounds[:-1]
    ) + f" ELSE '{bounds[-1][0]}' END"
    return f"""
WITH b AS (SELECT lang, {_bucket_sql()} AS bucket FROM {DOCS})
SELECT {case} AS split, lang, count(*) AS n_docs
FROM b GROUP BY 1, 2"""


def stratified_sample_sql(rate: float) -> str:
    """Mirror of ops.sampling.stratified_sample counted per lang."""
    from katta_spark.ops.sampling import N_BUCKETS

    return f"""
SELECT lang, count(*) AS n_docs FROM {DOCS}
WHERE {_bucket_sql()} < {int(round(rate * N_BUCKETS))}
GROUP BY lang"""


def temperature_sample_sql(group_col: str = "source",
                           alpha: float = 0.7) -> str:
    """Oracle for ops.sampling.temperature_sample (target_total =
    corpus size, downsample-capped at rate 1)."""
    from katta_spark.ops.sampling import N_BUCKETS

    return f"""WITH counts AS (
  SELECT CAST({group_col} AS VARCHAR) AS grp, count(*) AS n_docs
  FROM {DOCS} GROUP BY 1
),
tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS n_total,
               sum(pow(n_docs, {alpha!r})) AS z
        FROM counts),
rates AS (
  SELECT grp,
         CAST(round(least(1.0, pow(n_docs, {alpha!r}) / z * n_total / n_docs)
                    * {N_BUCKETS}, 0) AS BIGINT) AS thr
  FROM counts CROSS JOIN tot
)
SELECT d.doc_id, CAST(d.{group_col} AS VARCHAR) AS grp
FROM {DOCS} d JOIN rates r ON CAST(d.{group_col} AS VARCHAR) = r.grp
WHERE {_bucket_sql("d.doc_id")} < r.thr"""


def length_batches_sql(batch_size: int = 8,
                       bucket_edges: tuple = (64, 128, 256, 512,
                                              1024, 2048)) -> str:
    """Oracle for ops.packing.length_bucket_batches over n_chars."""
    edges = sorted(set(int(e) for e in bucket_edges))
    case = "CASE " + " ".join(
        f"WHEN size < {e} THEN {i}" for i, e in enumerate(edges)
    ) + f" ELSE {len(edges)} END"
    return f"""
WITH slim AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS size
              FROM {DOCS}),
b AS (SELECT doc_id, size, {case} AS bucket FROM slim),
r AS (SELECT *, CAST(floor((row_number() OVER (
        PARTITION BY bucket ORDER BY size, doc_id) - 1)
        / {int(batch_size)}) AS BIGINT) AS batch_id FROM b),
m AS (SELECT *, max(size) OVER (PARTITION BY bucket, batch_id)
        AS batch_max FROM r)
SELECT doc_id, size, bucket, batch_id, batch_max,
       batch_max - size AS padding FROM m"""


def mixture_order_sql(weights: dict[str, float],
                      group_col: str = "source") -> str:
    """Oracle for ops.sampling.mixture_order: the shared md5 hash
    device shuffles within source, key = rank/weight, one global
    sort."""
    case = "CASE grp " + " ".join(
        f"WHEN '{g}' THEN {float(w)!r}" for g, w in weights.items()
    ) + " ELSE NULL END"
    return f"""
WITH slim AS (SELECT doc_id, CAST({group_col} AS VARCHAR) AS grp
              FROM {DOCS}),
ww AS (SELECT doc_id, grp, {case} AS w FROM slim),
f AS (SELECT * FROM ww WHERE w IS NOT NULL AND w > 0),
h AS (SELECT *, {_bucket_sql("doc_id", salt="mix")} AS hb FROM f),
k AS (SELECT doc_id, grp,
        CAST(row_number() OVER (PARTITION BY grp ORDER BY hb, doc_id)
             AS DOUBLE) / w AS key
      FROM h)
SELECT doc_id, grp,
       CAST(row_number() OVER (ORDER BY key, grp, doc_id) AS BIGINT)
         AS pos
FROM k"""


def source_report_sql() -> str:
    """Oracle for ops.sampling.source_report."""
    return f"""
WITH pairs AS (
  SELECT source, lang, count(*) AS n,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM {DOCS} GROUP BY source, lang),
totals AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(sum(chars) AS BIGINT) AS total_chars,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM pairs GROUP BY source),
top AS (
  SELECT source, lang AS top_lang FROM (
    SELECT source, lang,
           row_number() OVER (PARTITION BY source
                              ORDER BY n DESC, lang ASC) AS r
    FROM pairs) WHERE r = 1)
SELECT t.source, t.n_docs, t.total_chars, t.n_langs, p.top_lang
FROM totals t JOIN top p ON t.source = p.source ORDER BY t.source"""


def top_per_source_sql(n: int = 5) -> str:
    """Mirror of ops.sampling.top_n_per_group over the quality score:
    best n docs per source by (quality desc, doc_id asc)."""
    return f"""WITH q AS ({quality_sql()}),
r AS (
  SELECT d.source, q.doc_id, q.quality,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY q.quality DESC, q.doc_id ASC) AS rank
  FROM q JOIN {DOCS} d ON d.doc_id = q.doc_id
)
SELECT source, doc_id, quality, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {n}"""


def dsir_select_sql(k: int = 50, target_where: str = "lang = 'de'",
                    n_features: int = 8192, alpha: float = 1.0) -> str:
    """Oracle for ops.dsir.dsir_select (hashed-n-gram importance
    resampling, Gumbel top-k): feature hashing, smoothing, Gumbel
    transform all mirror the Spark side exactly (md5 convention +
    hash-derived uniform), so selection is engine-identical."""
    raw_tok = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    tgt_tok = duckdb_tokens_list_sql(
        f"(SELECT doc_id, text FROM {DOCS} WHERE {target_where})",
        "doc_id", "text")

    def feats(tokl_name: str) -> str:
        return f"""(
  SELECT doc_id,
         CAST(concat('0x', substr(md5(feat), 1, 8)) AS BIGINT)
           % {n_features} AS bucket,
         count(*) AS cnt
  FROM (
    SELECT doc_id, unnest(list_concat(
      toks,
      CASE WHEN len(toks) >= 2
           THEN list_transform(generate_series(1, len(toks) - 1),
                               i -> concat_ws(' ', toks[i], toks[i+1]))
           ELSE [] END)) AS feat
    FROM {tokl_name})
  GROUP BY 1, 2)"""

    a = float(alpha)
    return f"""WITH raw_tokl AS ({raw_tok}),
tgt_tokl AS ({tgt_tok}),
raw_fc AS {feats("raw_tokl")},
tgt_fc AS {feats("tgt_tokl")},
q AS (SELECT bucket, sum(cnt) AS cq FROM raw_fc GROUP BY 1),
p AS (SELECT bucket, sum(cnt) AS cp FROM tgt_fc GROUP BY 1),
tq AS (SELECT CAST(sum(cq) AS DOUBLE) AS tq FROM q),
tp AS (SELECT CAST(sum(cp) AS DOUBLE) AS tp FROM p),
lr AS (
  SELECT q.bucket,
         ln((coalesce(p.cp, 0) + {a!r}) / (tp.tp + {a * n_features!r}))
       - ln((q.cq + {a!r}) / (tq.tq + {a * n_features!r})) AS lr
  FROM q LEFT JOIN p ON q.bucket = p.bucket CROSS JOIN tq CROSS JOIN tp
),
w AS (
  SELECT d.doc_id,
         round(coalesce(s.logw, 0.0), 6) AS logw
  FROM {DOCS} d LEFT JOIN (
    SELECT fc.doc_id, sum(fc.cnt * lr.lr) AS logw
    FROM raw_fc fc JOIN lr ON fc.bucket = lr.bucket
    GROUP BY fc.doc_id) s ON d.doc_id = s.doc_id
),
keyed AS (
  SELECT doc_id, logw,
         round(logw + (-ln(-ln(
           ({_bucket_sql("doc_id")} + 0.5) / 10000.0))), 6) AS key
  FROM w
)
SELECT doc_id, logw, key
FROM (SELECT * FROM keyed ORDER BY key DESC, doc_id ASC LIMIT {int(k)})"""


# ------------------------------------------------------------ sketches

def kmv_vocab_sql(k: int = 256) -> str:
    """Oracle for ops.sketch.kmv_distinct over the corpus vocabulary:
    k smallest distinct 60-bit md5 hashes of the analyzed terms."""
    tok = duckdb_tokens_sql(DOCS, "doc_id", "text")
    return f"""WITH tok AS ({tok}),
h AS (SELECT DISTINCT CAST(concat('0x', substr(md5(term), 1, 15))
                      AS BIGINT) AS h FROM tok),
t AS (SELECT h FROM h ORDER BY h LIMIT {int(k)})
SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash,
       CASE WHEN count(*) < {int(k)} THEN CAST(count(*) AS BIGINT)
            ELSE CAST(floor({float(k - 1)!r} * 1152921504606846976.0
                            / max(h)) AS BIGINT) END AS est_distinct
FROM t"""


def bloom_sql(probes: list[str], m_bits: int = 4096,
              k_hashes: int = 3) -> str:
    """Oracle for ops.sketch.bloom_build + bloom_contains over the
    corpus vocabulary: identical 60-bit md5 positions ("j:" || value
    mod m), LEFT JOIN per probe position, bool_and verdict."""
    tok = duckdb_tokens_sql(DOCS, "doc_id", "text")
    h = ("CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', "
         "{v})), 1, 15)) AS BIGINT) % {m}")
    plist = ", ".join("'" + p.replace("'", "''") + "'" for p in probes)
    return f"""WITH tok AS ({tok}),
vals AS (SELECT DISTINCT term AS v FROM tok),
bloom AS (
  SELECT DISTINCT {h.format(v='v', m=int(m_bits))} AS pos
  FROM vals, (SELECT unnest(range({int(k_hashes)})) AS j)
),
ppos AS (
  SELECT probe, {h.format(v='probe', m=int(m_bits))} AS pos
  FROM (SELECT unnest([{plist}]) AS probe),
       (SELECT unnest(range({int(k_hashes)})) AS j)
)
SELECT p.probe, bool_and(b.pos IS NOT NULL) AS maybe
FROM ppos p LEFT JOIN bloom b ON p.pos = b.pos
GROUP BY p.probe ORDER BY p.probe"""


def cms_sql(probes: list[str], width: int = 512, depth: int = 3) -> str:
    """Oracle for ops.sketch.cms_build + cms_query over corpus token
    occurrences: identical 60-bit md5 cells ("j:" || value mod width),
    bounded counter table, min over depth counters per probe."""
    tok = duckdb_tokens_sql(DOCS, "doc_id", "text")
    h = ("CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', "
         "{v})), 1, 15)) AS BIGINT) % {w}")
    plist = ", ".join("'" + p.replace("'", "''") + "'" for p in probes)
    return f"""WITH tok AS ({tok}),
cms AS (
  SELECT j AS row, {h.format(v='term', w=int(width))} AS cell,
         count(*) AS cnt
  FROM tok, (SELECT unnest(range({int(depth)})) AS j)
  GROUP BY 1, 2
),
ppos AS (
  SELECT probe, j AS row, {h.format(v='probe', w=int(width))} AS cell
  FROM (SELECT unnest([{plist}]) AS probe),
       (SELECT unnest(range({int(depth)})) AS j)
)
SELECT p.probe, min(coalesce(c.cnt, 0)) AS est
FROM ppos p LEFT JOIN cms c ON p.row = c.row AND p.cell = c.cell
GROUP BY p.probe ORDER BY p.probe"""


def composite_page_sql(key_cols: tuple, n: int, after: tuple,
                       value_col: str = "value") -> str:
    """Oracle for ops.sampling.composite_page on events: keyset
    (row-value) pagination over a grouped aggregation."""
    keys = ", ".join(key_cols)
    lits = ", ".join(
        "'" + v.replace("'", "''") + "'" if isinstance(v, str) else repr(v)
        for v in after
    )
    return f"""
SELECT {keys}, count(*) AS n_rows,
       round(sum({value_col}), 6) + 0.0 AS sum_value
FROM events
WHERE ({keys}) > ({lits})
GROUP BY {keys} ORDER BY {keys} LIMIT {int(n)}"""


def bit_quantiles_sql(qs: tuple = (0.5, 0.9, 0.99),
                      col: str = "n_chars") -> str:
    """Oracle for ops.sketch.bit_quantiles on a non-negative integer
    column: power-of-two buckets (bits = length(bin(v))), cumulative
    histogram, first bucket reaching q * total."""
    qlist = ", ".join(repr(float(q)) for q in qs)
    return f"""WITH h AS (
  SELECT length(bin(CAST({col} AS BIGINT))) AS bits, count(*) AS n
  FROM {DOCS} GROUP BY 1),
c AS (SELECT bits,
             CAST(sum(n) OVER (ORDER BY bits) AS BIGINT) AS cum_n,
             CAST(sum(n) OVER () AS BIGINT) AS total
      FROM h),
x AS (
  SELECT q.q, c.bits, c.cum_n,
         row_number() OVER (PARTITION BY q.q ORDER BY c.bits) AS rn
  FROM (SELECT unnest([{qlist}]) AS q) q
  JOIN c ON c.cum_n >= q.q * c.total)
SELECT CAST(q AS DOUBLE) AS q, CAST(bits AS INT) AS bits,
       (CAST(1 AS BIGINT) << bits) - 1 AS ub, cum_n
FROM x WHERE rn = 1"""


# ------------------------------------------------- duplicated spans

def _span_cte(width: int) -> str:
    """CTE ``spans(doc_id, pos, h)`` mirroring ops.dedup._window_spans
    (0-based pos, 60-bit md5 window hash)."""
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    return f"""WITH tokl AS ({tokl}),
spans AS (
  SELECT doc_id, i - 1 AS pos,
         CAST(concat('0x', substr(md5(array_to_string(
           list_slice(toks, i, i + {width - 1}), ' ')), 1, 15))
              AS BIGINT) AS h
  FROM (SELECT doc_id, toks,
          unnest(generate_series(1,
            CASE WHEN len(toks) >= {width}
                 THEN len(toks) - {width - 1} ELSE 0 END)) AS i
        FROM tokl)
)"""


def duplicate_spans_sql(width: int = 8) -> str:
    """Oracle for ops.dedup.duplicate_spans."""
    return f"""{_span_cte(width)}
SELECT doc_id, CAST(pos AS INT) AS pos, n_occ FROM (
  SELECT doc_id, pos,
         CAST(count(*) OVER (PARTITION BY h) AS BIGINT) AS n_occ
  FROM spans)
WHERE n_occ > 1"""


def trim_spans_sql(width: int = 8) -> str:
    """Oracle for ops.dedup.trim_duplicate_spans: winner = lowest
    (doc_id, pos) per duplicated window hash; loser windows' covered
    positions are cut and the doc is rebuilt from surviving tokens."""
    return f"""{_span_cte(width)},
losers AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           count(*) OVER (PARTITION BY h) AS n,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM spans)
  WHERE n > 1 AND rn > 1),
removed AS (
  SELECT DISTINCT doc_id, tpos FROM (
    SELECT doc_id,
           unnest(generate_series(pos, pos + {width - 1})) AS tpos
    FROM losers)),
tokens AS (
  SELECT doc_id, i - 1 AS tpos, toks[i] AS tok
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
        FROM tokl)),
kept AS (
  SELECT t.doc_id, t.tpos, t.tok
  FROM tokens t LEFT JOIN removed r
    ON t.doc_id = r.doc_id AND t.tpos = r.tpos
  WHERE r.doc_id IS NULL),
rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY tpos) AS text_kept
  FROM kept GROUP BY doc_id),
lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tokl)
SELECT l.doc_id, l.n_tokens,
       CAST(l.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(r.text_kept, '') AS text_kept
FROM lens l LEFT JOIN rebuilt r ON l.doc_id = r.doc_id"""


def paragraph_dedup_sql(min_chars: int = 20) -> str:
    """Oracle for ops.text.paragraph_dedup: global first-occurrence
    line dedup (earliest (doc_id, pos) wins), short lines always
    kept, docs reassembled in position order."""
    return f"""
WITH lines AS (
  SELECT doc_id, i AS pos, l[i] AS line
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
        FROM (SELECT doc_id, string_split(text, chr(10)) AS l
              FROM {DOCS}))
),
ranked AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line
                            ORDER BY doc_id, pos) AS rn
  FROM lines WHERE length(line) >= {int(min_chars)}
),
kept AS (
  SELECT doc_id, pos, line FROM lines
  WHERE length(line) < {int(min_chars)}
  UNION ALL
  SELECT doc_id, pos, line FROM ranked WHERE rn = 1
)
SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
FROM kept GROUP BY doc_id"""


def dup_span_stats_sql(width: int = 8) -> str:
    """Oracle for ops.dedup.dup_span_stats."""
    return f"""{_span_cte(width)},
dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS n_occ
    FROM spans)
  WHERE n_occ > 1),
covered AS (
  SELECT doc_id, CAST(count(DISTINCT tpos) AS BIGINT) AS dup_tokens
  FROM (SELECT doc_id,
          unnest(generate_series(pos, pos + {width - 1})) AS tpos
        FROM dup)
  GROUP BY doc_id),
lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
         FROM tokl)
SELECT l.doc_id, l.n_tokens,
       coalesce(c.dup_tokens, 0) AS dup_tokens,
       round(coalesce(c.dup_tokens, 0)
             / greatest(l.n_tokens, 1), 6) AS dup_frac
FROM lens l LEFT JOIN covered c ON l.doc_id = c.doc_id"""


def ts_asof_sql(left_type: str = "click", right_type: str = "purchase"
                ) -> str:
    """Oracle for ops.timeseries.asof_join: DuckDB native ASOF LEFT
    JOIN (largest right ts <= left ts per key; same-ts right rows
    averaged first, exactly as the engine does)."""
    return f"""
WITH l AS (SELECT * FROM events WHERE event_type = '{left_type}'),
r AS (SELECT user_id, ts, avg(value) AS rv
      FROM events WHERE event_type = '{right_type}' GROUP BY 1, 2)
SELECT l.event_id, l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(r.rv, 6) AS asof_value
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id"""


def rollup_report_sql(cols: tuple = ("lang", "source"),
                      all_label: str = "(all)") -> str:
    """Oracle for ops.sampling.rollup_report (GROUP BY ROLLUP with
    GROUPING() disambiguating subtotal rows from genuine NULLs)."""
    sel = ", ".join(
        f"CASE WHEN GROUPING({c}) = 1 THEN '{all_label}' ELSE {c} END AS {c}"
        for c in cols
    )
    clist = ", ".join(cols)
    return f"""
SELECT {sel},
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM {DOCS}
GROUP BY ROLLUP({clist})
ORDER BY {clist}"""


def token_entropy_sql() -> str:
    """Oracle for ops.text.token_entropy: H = ln N - (sum f ln f)/N
    over each doc's token counts (same one-pass algebra as the
    engine, so float summation shapes match)."""
    from katta_spark.oracle_sql import index_ctes

    return f"""{index_ctes()},
per AS (
  SELECT doc_id,
         CAST(sum(tf) AS BIGINT) AS n_tokens,
         sum(tf * ln(CAST(tf AS DOUBLE))) AS sf
  FROM tf GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       coalesce(round(ln(CAST(p.n_tokens AS DOUBLE))
                      - p.sf / p.n_tokens, 6), 0.0) AS entropy
FROM {DOCS} d LEFT JOIN per p ON d.doc_id = p.doc_id"""


def weighted_sample_sql(n: int, weight_expr: str = "n_chars",
                        key_col: str = "doc_id", salt: str = "") -> str:
    """Oracle for ops.sampling.weighted_sample (Efraimidis-Spirakis
    priorities from the repo-standard md5 hash-uniform)."""
    h32 = _H32.format(x=f"concat('{salt}', CAST({key_col} AS VARCHAR))")
    return f"""
SELECT * FROM (
  SELECT doc_id,
         round(-ln((CAST({h32} AS DOUBLE) + 1.0) / 4294967296.0)
               / CAST({weight_expr} AS DOUBLE), 6) AS es_key
  FROM {DOCS}
  WHERE CAST({weight_expr} AS DOUBLE) > 0)
ORDER BY es_key ASC, {key_col} ASC
LIMIT {n}"""


def pmi_top_sql(k: int = 20, min_count: int = 5) -> str:
    """Oracle for ops.text.pmi_top (Church & Hanks PMI over corpus
    bigrams; identical expression tree so float rounding matches)."""
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    return f"""WITH tokl AS ({tokl}),
g AS (SELECT unnest(CASE WHEN len(toks) >= 2
        THEN list_transform(generate_series(1, len(toks) - 1),
             i -> concat_ws(' ', toks[i], toks[i+1])) ELSE [] END) AS ngram
      FROM tokl),
big AS (SELECT ngram, count(*) AS n_ab FROM g
        GROUP BY ngram HAVING count(*) >= {min_count}),
unic AS (SELECT term, count(*) AS n_t
         FROM (SELECT unnest(toks) AS term FROM tokl) GROUP BY term),
tot AS (SELECT CAST(sum(n_t) AS DOUBLE) AS n_tok FROM unic),
totb AS (SELECT CAST(sum(greatest(len(toks) - 1, 0)) AS DOUBLE) AS n_big
         FROM tokl)
SELECT big.ngram, CAST(big.n_ab AS BIGINT) AS n_ab,
       round(ln((CAST(big.n_ab AS DOUBLE) / totb.n_big)
             / ((CAST(a.n_t AS DOUBLE) / tot.n_tok)
                * (CAST(b.n_t AS DOUBLE) / tot.n_tok))), 6) AS pmi
FROM big
JOIN unic a ON a.term = string_split(big.ngram, ' ')[1]
JOIN unic b ON b.term = string_split(big.ngram, ' ')[2]
CROSS JOIN tot CROSS JOIN totb
ORDER BY pmi DESC, big.ngram ASC LIMIT {k}"""


def bigram_lm_sql(k: int = 20, add_k: float = 1.0,
                  min_count: int = 1) -> str:
    """Oracle for ops.text.bigram_lm: add-k smoothed conditional
    bigram probabilities — history counts reduced from the bigram
    table, vocabulary = distinct unigrams, identical formula."""
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    return f"""WITH tokl AS ({tokl}),
g AS (SELECT unnest(CASE WHEN len(toks) >= 2
        THEN list_transform(generate_series(1, len(toks) - 1),
             i -> struct_pack(w1 := toks[i], w2 := toks[i+1])) ELSE [] END) AS s
      FROM tokl),
big AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n_ab FROM g GROUP BY 1, 2),
hist AS (SELECT w1, sum(n_ab) AS n_a FROM big GROUP BY w1),
voc AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v
        FROM (SELECT unnest(toks) AS term FROM tokl))
SELECT big.w1, big.w2, CAST(big.n_ab AS BIGINT) AS n_ab,
       CAST(hist.n_a AS BIGINT) AS n_a,
       round(ln((CAST(big.n_ab AS DOUBLE) + {float(add_k)!r})
                / (CAST(hist.n_a AS DOUBLE) + {float(add_k)!r} * voc.v)),
             6) AS logp
FROM big JOIN hist USING (w1) CROSS JOIN voc
WHERE big.n_ab >= {int(min_count)}
ORDER BY n_ab DESC, w1 ASC, w2 ASC LIMIT {int(k)}"""


def ts_zscore_sql() -> str:
    """Oracle for ops.timeseries.zscore over (event_type, value):
    per-group moments rounded to 6dp BEFORE the z computation,
    exactly as the engine does."""
    return """
WITH stats AS (
  SELECT event_type, round(avg(value), 6) AS mu,
         round(stddev_samp(value), 6) AS sd
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       CASE WHEN s.sd > 0
            THEN round((e.value - s.mu) / s.sd, 6) END AS z
FROM events e JOIN stats s USING (event_type)
ORDER BY e.event_id"""


def ts_rate_sql() -> str:
    """Oracle for ops.timeseries.rate: per-user delta and per-second
    rate between consecutive events (ts, event_id order); epoch math
    in microsecond-exact double seconds, as the engine computes."""
    sec = "(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0)"
    return f"""
SELECT event_id, user_id,
       round(value - lag(value) OVER w, 6) + 0.0 AS delta,
       round(CASE WHEN {sec} - lag({sec}) OVER w > 0
             THEN (value - lag(value) OVER w)
                  / ({sec} - lag({sec}) OVER w) END, 6) + 0.0 AS rate_per_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id"""


def ts_counter_rate_sql() -> str:
    """Oracle for ops.timeseries.counter_rate: PromQL reset rule — a
    decrease means restart, increase = new value itself."""
    sec = "(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0)"
    inc = ("CASE WHEN lag(value) OVER w IS NULL THEN NULL "
           "WHEN value - lag(value) OVER w < 0 THEN value "
           "ELSE value - lag(value) OVER w END")
    return f"""
SELECT event_id, user_id,
       round({inc}, 6) + 0.0 AS increase,
       round(CASE WHEN {sec} - lag({sec}) OVER w > 0
             THEN ({inc}) / ({sec} - lag({sec}) OVER w) END, 6) + 0.0
           AS rate_per_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id"""


def ts_ewma_sql(alpha: float = 0.3) -> str:
    """Oracle for ops.timeseries.ewma: the adjust=False recurrence
    replayed exactly by a recursive CTE (bit-identical arithmetic:
    (1-a)*y + a*x in double on both engines)."""
    a = repr(float(alpha))
    return f"""
WITH RECURSIVE ordered AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
rec AS (
  SELECT event_id, user_id, value, rn, value AS y
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.event_id, o.user_id, o.value, o.rn,
         (1 - {a}) * r.y + {a} * o.value
  FROM ordered o JOIN rec r
    ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT event_id, user_id, value, round(y, 6) + 0.0 AS ewma
FROM rec ORDER BY event_id"""


def ts_running_sql() -> str:
    """Oracle for ops.timeseries.running_agg: per-user cumulative
    sum/count ordered by (ts, event_id)."""
    return """
SELECT event_id, user_id,
       round(sum(value) OVER w, 6) AS run_sum,
       CAST(count(*) OVER w AS BIGINT) AS run_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
ORDER BY event_id"""


def ts_percentiles_sql(probs: tuple = (0.5, 0.95, 0.99)) -> str:
    """Oracle for ops.timeseries.percentiles: DuckDB quantile_cont is
    the same exact linear-interpolation definition as Spark's
    percentile."""
    cols = ", ".join(
        f"round(quantile_cont(value, {p}), 6) AS p{str(p).replace('0.', '')}"
        for p in probs
    )
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n, {cols}
FROM events GROUP BY event_type ORDER BY event_type"""


def ts_auto_histogram_sql(target: int = 20,
                          ladder: list[int] | None = None) -> str:
    """Oracle for ops.timeseries.auto_date_histogram: identical
    integer-div interval choice over the same fixed-second ladder."""
    from katta_spark.ops.timeseries import AUTO_HISTO_LADDER

    lad = list(ladder or AUTO_HISTO_LADDER)
    whens = "\n    ".join(
        f"WHEN (mx // {iv * 1000000}) - (mn // {iv * 1000000}) + 1"
        f" <= {int(target)} THEN {iv}"
        for iv in lad[:-1]
    )
    return f"""
WITH b AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
),
iv AS (
  SELECT CASE
    {whens}
    ELSE {lad[-1]} END AS iv_s
  FROM b
)
SELECT strftime(make_timestamp(epoch_us(ts)
                - (epoch_us(ts) % (CAST(iv_s AS BIGINT) * 1000000))),
                '%Y-%m-%d %H:%M:%S') AS bucket_start,
       iv_s AS interval_s, count(*) AS n
FROM events, iv
GROUP BY bucket_start, iv_s ORDER BY bucket_start"""


def ts_rolling_sql(n: int = 5) -> str:
    """Oracle for ops.timeseries.rolling_agg: last-n-rows frame per
    user in (ts, event_id) order."""
    return f"""
SELECT event_id, user_id, value,
       round(avg(value) OVER w, 6) + 0.0 AS roll_mean,
       min(value) OVER w AS roll_min,
       max(value) OVER w AS roll_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {int(n) - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_id"""


def ts_bucket_pipeline_sql(unit: str = "1 day") -> str:
    """Oracle for ops.timeseries.bucket_pipeline: hash-agg bucket
    table, then cumulative_sum / derivative / bucket_script over the
    ordered buckets — the same round-at-each-step discipline as the
    engine so the running float sums stay bit-comparable."""
    return f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '{unit}', ts) AS bs,
         round(sum(value), 6) AS bucket_sum,
         count(*) AS n
  FROM events GROUP BY 1)
SELECT strftime(bs, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       bucket_sum, n,
       round(sum(bucket_sum) OVER (ORDER BY bs
             ROWS UNBOUNDED PRECEDING), 6) AS cum_sum,
       round(bucket_sum - lag(bucket_sum) OVER (ORDER BY bs), 6)
         AS deriv,
       round(bucket_sum / n, 6) AS avg_per_doc
FROM b ORDER BY bs"""


def _bucket_table_sql(unit: str = "1 day") -> str:
    """Shared parent date-histogram CTE body — the SQL mirror of
    ops.timeseries._bucket_table (no key_col)."""
    return f"""
  SELECT time_bucket(INTERVAL '{unit}', ts) AS bs,
         round(sum(value), 6) AS bucket_sum,
         count(*) AS n,
         round(round(sum(value), 6) / count(*), 6) AS avg_per_doc
  FROM events GROUP BY 1"""


def ts_bucket_sort_sql(unit: str = "1 day", sort_on: str = "bucket_sum",
                       ascending: bool = False, size: int = 5,
                       frm: int = 0) -> str:
    """Oracle for ops.timeseries.bucket_sort: order the bucket table
    by one of its own metrics, slice [frm, frm+size)."""
    direction = "ASC" if ascending else "DESC"
    return f"""
WITH b AS ({_bucket_table_sql(unit)})
SELECT strftime(bs, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       bucket_sum, n, avg_per_doc
FROM b ORDER BY {sort_on} {direction}, bs ASC
LIMIT {int(size)} OFFSET {int(frm)}"""


def ts_bucket_selector_sql(having: str, unit: str = "1 day") -> str:
    """Oracle for ops.timeseries.bucket_selector: keep buckets whose
    own aggregates pass the predicate."""
    return f"""
WITH b AS ({_bucket_table_sql(unit)})
SELECT strftime(bs, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       bucket_sum, n, avg_per_doc
FROM b WHERE {having} ORDER BY bs"""


def ts_funnel_sql(steps: list[str]) -> str:
    """Oracle for ops.timeseries.funnel: chained earliest-valid-step
    CTEs, each step at-or-after the previous step's min ts."""
    ctes = []
    for i, s in enumerate(steps):
        sq = s.replace("'", "''")
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT user_id, min(ts) AS t FROM events "
                f"WHERE event_type = '{sq}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, min(e.ts) AS t "
                f"FROM events e JOIN s{i - 1} p ON e.user_id = p.user_id "
                f"WHERE e.event_type = '{sq}' AND e.ts >= p.t "
                f"GROUP BY e.user_id)"
            )
    selects = [
        f"SELECT {i} AS step_idx, '{s.replace(chr(39), chr(39) * 2)}' AS step,"
        f" (SELECT count(*) FROM s{i}) AS n_keys"
        for i, s in enumerate(steps)
    ]
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects) + "\nORDER BY step_idx")


def ts_retention_sql(max_periods: int = 8) -> str:
    """Oracle for ops.timeseries.retention: weekly cohorts by first
    event, distinct (cohort, week_n, user) activity counts."""
    return f"""
WITH firsts AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort
  FROM events GROUP BY user_id
),
j AS (
  SELECT DISTINCT f.cohort,
         datediff('day', f.cohort, date_trunc('week', e.ts)) // 7
             AS period_n,
         e.user_id
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort, period_n,
       count(*) AS n_active
FROM j WHERE period_n < {int(max_periods)}
GROUP BY cohort, period_n ORDER BY cohort, period_n"""


def ts_percentile_ranks_sql(values: tuple = (0.0, 50.0, 100.0)) -> str:
    """Oracle for ops.timeseries.percentile_ranks: conditional means
    x100 at each probe."""
    cols = ", ".join(
        f"round(avg(CASE WHEN value <= {float(v)!r} THEN 1.0 ELSE 0.0 END)"
        f" * 100.0, 6) AS pr_"
        + str(v).replace(".", "_").replace("-", "m")
        for v in values
    )
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n, {cols}
FROM events GROUP BY event_type ORDER BY event_type"""


def ts_mad_sql() -> str:
    """Oracle for ops.timeseries.mad: per-group median + median
    absolute deviation (quantile_cont = Spark percentile)."""
    return """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       round(first(m.m), 6) AS med,
       round(quantile_cont(abs(e.value - m.m), 0.5), 6) AS mad
FROM events e JOIN med m USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type"""


def chunk_texts_sql(size: int = 32, stride: int = 24,
                    docs_where: str | None = None) -> str:
    """Oracle for ops.text.chunk_texts (token-window chunker)."""
    src = f"(SELECT * FROM {DOCS} WHERE {docs_where})" if docs_where else DOCS
    tokl = duckdb_tokens_list_sql(src, "doc_id", "text")
    return f"""WITH tokl AS ({tokl}),
st AS (
  SELECT doc_id, toks,
         unnest(CASE WHEN len(toks) > 0
                THEN generate_series(0, len(toks) - 1, {stride})
                ELSE [] END) AS s
  FROM tokl)
SELECT doc_id,
       CAST(s / {stride} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(toks, s + 1, s + {size})) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, s + 1, s + {size}), ' ') AS chunk
FROM st ORDER BY doc_id, chunk_id"""


def ts_cardinality_sql() -> str:
    """Oracle for ops.timeseries.distinct_cardinality over
    (event_type, user_id)."""
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type"""


def ts_top_hits_sql(n: int = 3) -> str:
    """Oracle for ops.timeseries.top_hits over events by value."""
    return f"""
SELECT event_type, event_id, value, rank FROM (
  SELECT event_type, event_id, value,
         CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY value DESC, event_id ASC) AS INT) AS rank
  FROM events)
WHERE rank <= {n} ORDER BY event_type, rank"""


def knn_topk_sql(query_vec: list[float], k: int = 10,
                 metric: str = "dot") -> str:
    """Oracle for ops.similarity.knn_topk (dot / euclidean): manual
    list algebra mirroring the engine's fold shape, not DuckDB's
    built-in distance functions, so summation order matches."""
    qs = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    if metric == "dot":
        expr = (f"list_sum(list_transform(generate_series(1, len(embedding)),"
                f" i -> CAST(embedding[i] AS DOUBLE) * ({qs})[i]))")
        order = "score DESC"
    elif metric == "euclidean":
        expr = (f"sqrt(list_sum(list_transform("
                f"generate_series(1, len(embedding)),"
                f" i -> (CAST(embedding[i] AS DOUBLE) - ({qs})[i])"
                f" * (CAST(embedding[i] AS DOUBLE) - ({qs})[i]))))")
        order = "score ASC"
    else:
        raise ValueError(metric)
    return f"""
SELECT vec_id, round({expr}, 6) AS score
FROM embeddings
ORDER BY {order}, vec_id ASC LIMIT {k}"""


def mmr_sql(query_vec: list[float], k: int = 10, lam: float = 0.7,
            shortlist_n: int = 30) -> str:
    """Oracle for ops.similarity.mmr_rerank over the exact cosine
    top-``shortlist_n`` shortlist: the greedy argmax UNROLLS into
    ``k`` chained single-row MATERIALIZED CTE stages (pick r's
    penalty is the max pairwise cosine against picks 0..r-1, CLAMPED
    AT ZERO — the engine kernel's maxsim starts at zeros, so a
    negative similarity never becomes a bonus; pick 0 has no
    penalty; ties by lowest id) — an iterative algorithm stated
    declaratively because k is a constant.  Pairwise sims come from
    one ``shortlist x shortlist`` cross join (bounded 30x30);
    MATERIALIZED is load-bearing: un-materialized, DuckDB re-inlines
    each sel stage ~3x per level — exponential re-evaluation."""
    qs = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    qn = f"sqrt(list_sum(list_transform(CAST({qs} AS DOUBLE[]), x -> x * x)))"
    dot_q = (f"list_sum(list_transform(generate_series(1, len(v)),"
             f" i -> v[i] * ({qs})[i]))")
    ll, inv = repr(float(lam)), repr(1.0 - float(lam))
    parts = [f"""WITH base AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
nn AS MATERIALIZED (
  SELECT vec_id, v,
         CASE WHEN sqrt(list_sum(list_transform(v, x -> x * x))) = 0
              THEN 1.0
              ELSE sqrt(list_sum(list_transform(v, x -> x * x))) END AS nv
  FROM base),
short AS MATERIALIZED (
  SELECT vec_id, v, nv, {dot_q} / (nv * {qn}) AS rel
  FROM nn ORDER BY rel DESC, vec_id ASC LIMIT {int(shortlist_n)}),
sims AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         list_sum(list_transform(generate_series(1, len(a.v)),
           i -> a.v[i] * b.v[i])) / (a.nv * b.nv) AS sim
  FROM short a, short b),
p0 AS MATERIALIZED (SELECT vec_id, rel, {ll} * rel AS score
       FROM short ORDER BY score DESC, vec_id ASC LIMIT 1),
sel1 AS MATERIALIZED (SELECT vec_id FROM p0)"""]
    for r in range(1, int(k)):
        parts.append(f""",
p{r} AS MATERIALIZED (
  SELECT s.vec_id, s.rel,
         {ll} * s.rel - {inv} * (
           SELECT greatest(max(sim), 0.0) FROM sims JOIN sel{r}
             ON sims.ib = sel{r}.vec_id
           WHERE sims.ia = s.vec_id) AS score
  FROM short s
  WHERE s.vec_id NOT IN (SELECT vec_id FROM sel{r})
  ORDER BY score DESC, s.vec_id ASC LIMIT 1),
sel{r + 1} AS MATERIALIZED (SELECT vec_id FROM sel{r}
               UNION ALL SELECT vec_id FROM p{r})""")
    finals = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, vec_id, round(score, 6) AS mmr,"
        f" round(rel, 6) AS rel FROM p{r}"
        for r in range(int(k))
    )
    return "".join(parts) + f"\n{finals}\nORDER BY rank"


def curate_sql(min_quality: float = 0.3, max_dup_line_ratio: float = 0.5,
               max_pii: int = 0) -> str:
    """Oracle for ops.text.curate: the four component oracles
    composed exactly as the engine composes the four ops (each
    signal 6dp-rounded before the keep comparison)."""
    return f"""
SELECT q.doc_id, q.quality, r.dup_line_ratio,
       CAST(p.n_email + p.n_ipv4 + p.n_phone AS BIGINT) AS n_pii,
       l.lang_pred,
       (q.quality >= {min_quality!r}
        AND r.dup_line_ratio <= {max_dup_line_ratio!r}
        AND p.n_email + p.n_ipv4 + p.n_phone <= {int(max_pii)}) AS keep
FROM ({quality_sql()}) q
JOIN ({repetition_sql()}) r ON q.doc_id = r.doc_id
JOIN ({pii_scrub_sql()}) p ON q.doc_id = p.doc_id
JOIN ({langid_sql()}) l ON q.doc_id = l.doc_id
ORDER BY q.doc_id"""


def ts_boxplot_sql() -> str:
    """Oracle for ops.timeseries.boxplot: quantile_cont is the same
    exact linear-interpolation definition as Spark's percentile."""
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       min(value) AS vmin,
       round(quantile_cont(value, 0.25), 6) AS q1,
       round(quantile_cont(value, 0.5), 6) AS q2,
       round(quantile_cont(value, 0.75), 6) AS q3,
       max(value) AS vmax
FROM events GROUP BY event_type ORDER BY event_type"""


def ts_ttest_sql(group_a: str, group_b: str) -> str:
    """Oracle for ops.timeseries.t_test: the same six conditional
    moments rounded to 6dp BEFORE the Welch formula, so both engines
    compute t from identical inputs."""
    a = group_a.replace("'", "''")
    b = group_b.replace("'", "''")
    return f"""
WITH m AS (
  SELECT count(*) FILTER (event_type = '{a}') AS n_a,
         count(*) FILTER (event_type = '{b}') AS n_b,
         round(sum(value) FILTER (event_type = '{a}'), 6) AS sa,
         round(sum(value) FILTER (event_type = '{b}'), 6) AS sb,
         round(sum(value * value) FILTER (event_type = '{a}'), 6) AS saa,
         round(sum(value * value) FILTER (event_type = '{b}'), 6) AS sbb
  FROM events)
SELECT n_a, n_b,
       round(sa / n_a, 6) AS mean_a,
       round(sb / n_b, 6) AS mean_b,
       round((sa / n_a - sb / n_b)
             / sqrt(((saa - n_a * (sa / n_a) * (sa / n_a)) / (n_a - 1)) / n_a
                  + ((sbb - n_b * (sb / n_b) * (sb / n_b)) / (n_b - 1)) / n_b),
             6) AS t_stat
FROM m"""


def text_string_stats_sql() -> str:
    """Oracle for ops.text.string_stats: length four-stat + Shannon
    entropy (base 2) of the corpus character distribution via
    H = log2(T) - (sum c*log2 c)/T over per-char counts."""
    return """
WITH d AS (SELECT text FROM documents WHERE text IS NOT NULL),
lens AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         min(length(text)) AS min_len,
         max(length(text)) AS max_len,
         round(avg(length(text)), 6) AS avg_len
  FROM d),
chars AS (
  SELECT unnest(string_split(text, '')) AS ch FROM d),
cc AS (
  SELECT ch, count(*) AS c FROM chars WHERE length(ch) > 0 GROUP BY ch),
ent AS (
  SELECT round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy
  FROM cc)
SELECT n_docs, min_len, max_len, avg_len, entropy FROM lens, ent"""


def text_multi_terms_sql(keys: list[str], size: int = 10) -> str:
    """Oracle for ops.text.multi_terms: compound-key hash agg +
    count-desc/key-asc top-N."""
    ks = ", ".join(keys)
    order = ", ".join(f"{k} ASC" for k in keys)
    return f"""
SELECT {ks}, CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY {ks}
ORDER BY n DESC, {order} LIMIT {int(size)}"""


def ts_extended_stats_sql(sigma: float = 2.0) -> str:
    """Oracle for ops.timeseries.extended_stats: same rounded
    moments (n, Σv, Σv²) before the population-variance formulas."""
    return f"""
WITH m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         min(value) AS vmin, max(value) AS vmax,
         round(sum(value), 6) AS s,
         round(sum(value * value), 6) AS ss
  FROM events GROUP BY event_type)
SELECT event_type, n, vmin, vmax,
       round(s, 6) AS vsum,
       round(s / n, 6) AS avg,
       round(ss, 6) AS sum_sq,
       round(ss / n - (s / n) * (s / n), 6) AS variance,
       round(sqrt(ss / n - (s / n) * (s / n)), 6) AS std_dev,
       round(s / n + {float(sigma)} * sqrt(ss / n - (s / n) * (s / n)), 6)
         AS std_upper,
       round(s / n - {float(sigma)} * sqrt(ss / n - (s / n) * (s / n)), 6)
         AS std_lower
FROM m ORDER BY event_type"""


def ts_value_histogram_sql(interval: float = 10.0) -> str:
    """Oracle for ops.timeseries.value_histogram: dense bucket axis
    from generate_series over the floor-aligned bounds, left-joined
    counts, empty buckets at n=0."""
    iv = float(interval)
    return f"""
WITH c AS (
  SELECT CAST(floor(value / {iv}) AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
bounds AS (
  SELECT CAST(floor(min(value) / {iv}) AS BIGINT) AS lo,
         CAST(floor(max(value) / {iv}) AS BIGINT) AS hi
  FROM events),
axis AS (SELECT unnest(generate_series(lo, hi)) AS b FROM bounds)
SELECT round(CAST(a.b * {iv} AS DOUBLE), 6) AS bucket,
       COALESCE(c.n, 0) AS n
FROM axis a LEFT JOIN c ON a.b = c.b ORDER BY bucket"""


def ts_normalize_sql(unit: str = "1 day") -> str:
    """Oracle for ops.timeseries.normalize_buckets: bucket sums then
    percent_of_sum / rescale_0_1 from whole-axis window constants."""
    return f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '{unit}', ts) AS bs,
         round(sum(value), 6) AS bucket_sum
  FROM events GROUP BY 1)
SELECT strftime(bs, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       bucket_sum,
       round(bucket_sum / sum(bucket_sum) OVER () * 100, 6)
         AS pct_of_sum,
       round((bucket_sum - min(bucket_sum) OVER ())
             / (max(bucket_sum) OVER () - min(bucket_sum) OVER ()), 6)
         AS rescaled
FROM b ORDER BY bs"""


def text_categorize_sql(m: int = 10) -> str:
    """Oracle for ops.text.categorize_text over the event-derived
    message stream: the same number-masking regex (dialect-portable:
    no lookarounds), count per template, lexicographically smallest
    example."""
    return f"""
WITH msg AS (
  SELECT 'user ' || CAST(user_id AS VARCHAR) || ' did ' || event_type
         || ' k=' || json_extract_string(props, '$.k') AS message
  FROM events),
t AS (
  SELECT trim(regexp_replace(
           regexp_replace(lower(message),
                          '\\b(?:0x[0-9a-f]+|\\d+(?:\\.\\d+)?)\\b',
                          '<num>', 'g'),
           '\\s+', ' ', 'g')) AS template,
         message
  FROM msg)
SELECT template, CAST(count(*) AS BIGINT) AS n, min(message) AS example
FROM t GROUP BY template
ORDER BY n DESC, template ASC LIMIT {int(m)}"""


def ts_change_point_sql(unit: str = "1 day") -> str:
    """Oracle for ops.timeseries.change_point: cumulative prefix
    windows over the bucket table, argmax of the ROUNDED
    level-shift delta (tie-break bucket asc)."""
    return f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '{unit}', ts) AS bs,
         round(sum(value), 6) AS bucket_sum
  FROM events GROUP BY 1),
c AS (
  SELECT bs,
         count(*) OVER (ORDER BY bs
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS nb,
         sum(bucket_sum) OVER (ORDER BY bs
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sb,
         count(*) OVER () AS n,
         sum(bucket_sum) OVER () AS s
  FROM b)
SELECT strftime(bs, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       round(sb / nb, 6) AS before_mean,
       round((s - sb) / (n - nb), 6) AS after_mean,
       round(abs((s - sb) / (n - nb) - sb / nb), 6) AS delta
FROM c WHERE nb >= 1 AND n - nb >= 1
ORDER BY delta DESC, bs ASC LIMIT 1"""


def ts_weighted_avg_sql(
    value_col: str = "value",
    weight_sql: str = "json_extract_string(props, '$.k')",
) -> str:
    """Oracle for ops.timeseries.weighted_avg (per event_type,
    weight = the props.k counter): rounded sums before the
    division."""
    return f"""
WITH f AS (
  SELECT event_type, CAST({value_col} AS DOUBLE) AS v,
         CAST({weight_sql} AS DOUBLE) AS w
  FROM events
  WHERE {value_col} IS NOT NULL AND {weight_sql} IS NOT NULL)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(round(sum(v * w), 6) / round(sum(w), 6), 6) AS wavg
FROM f GROUP BY event_type ORDER BY event_type"""


def ts_serial_diff_sql(unit: str = "1 day", lag: int = 7) -> str:
    """Oracle for ops.timeseries.serial_diff."""
    return f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '{unit}', ts) AS bs,
         round(sum(value), 6) AS bucket_sum
  FROM events GROUP BY 1)
SELECT strftime(bs, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       bucket_sum,
       round(bucket_sum - lag(bucket_sum, {int(lag)}) OVER (ORDER BY bs), 6)
         AS sdiff
FROM b ORDER BY bs"""


def ts_cumulative_cardinality_sql(unit: str = "1 day",
                                  key_col: str = "user_id") -> str:
    """Oracle for ops.timeseries.cumulative_cardinality: first-seen
    bucket per key, running sum over the event-bucket axis."""
    return f"""
WITH fs AS (
  SELECT {key_col},
         min(time_bucket(INTERVAL '{unit}', ts)) AS bs
  FROM events GROUP BY 1),
nk AS (SELECT bs, CAST(count(*) AS BIGINT) AS new_keys FROM fs GROUP BY 1),
axis AS (
  SELECT DISTINCT time_bucket(INTERVAL '{unit}', ts) AS bs FROM events)
SELECT strftime(a.bs, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       COALESCE(nk.new_keys, 0) AS new_keys,
       CAST(sum(COALESCE(nk.new_keys, 0)) OVER (ORDER BY a.bs
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct
FROM axis a LEFT JOIN nk ON a.bs = nk.bs ORDER BY a.bs"""


def graph_expand_sql(seed: str = "c1", max_hops: int = 2) -> str:
    """Oracle for ops.graph.graph_expand over the namespaced
    customer->order->supplier edge table: bounded recursive CTE,
    min hop distance per reached node."""
    s = seed.replace("'", "''")
    return f"""
WITH RECURSIVE edges AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         'o' || CAST(o_orderkey AS VARCHAR) AS dst FROM orders
  UNION ALL
  SELECT 'o' || CAST(l_orderkey AS VARCHAR),
         's' || CAST(l_suppkey AS VARCHAR) FROM lineitem),
walk(node, hops) AS (
  SELECT '{s}', 0
  UNION ALL
  SELECT e.dst, w.hops + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.hops < {int(max_hops)})
SELECT node, CAST(min(hops) AS INT) AS hops
FROM walk GROUP BY node ORDER BY hops, node"""


def frequent_item_sets_sql(min_support: int = 2, n: int = 20) -> str:
    """Oracle for ops.sampling.frequent_item_sets over lineitem
    (basket = order, item = supplier)."""
    return f"""
WITH bi AS (
  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS b,
                  CAST(l_suppkey AS VARCHAR) AS i
  FROM lineitem),
singles AS (
  SELECT [i] AS items, CAST(count(*) AS BIGINT) AS support
  FROM bi GROUP BY i HAVING count(*) >= {int(min_support)}),
pairs AS (
  SELECT [l.i, r.i] AS items, CAST(count(*) AS BIGINT) AS support
  FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i
  GROUP BY l.i, r.i HAVING count(*) >= {int(min_support)})
SELECT items, support FROM (
  SELECT * FROM singles UNION ALL SELECT * FROM pairs)
ORDER BY support DESC, items ASC LIMIT {int(n)}"""


def bigram_lp_sql(add_k: float = 1.0) -> str:
    """Oracle for ops.text.bigram_logprob: ordered token lists ->
    per-doc bigram counts, corpus bigram/history tables reduced from
    them, add-k smoothed ln p(w2|w1) averaged per doc."""
    from katta_spark.oracle_sql import DOCS, index_ctes
    from katta_spark.tokenizer import duckdb_tokens_list_sql

    k = float(add_k)
    tokl = duckdb_tokens_list_sql(DOCS, "doc_id", "text")
    return f"""{index_ctes()},
tokl AS ({tokl}),
dg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM tokl, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 2),
dtf AS (SELECT doc_id, w1, w2, count(*) AS n FROM dg GROUP BY 1, 2, 3),
bg AS (SELECT w1, w2, sum(n) AS n_ab FROM dtf GROUP BY 1, 2),
hist AS (SELECT w1, sum(n_ab) AS n_a FROM bg GROUP BY 1),
vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM dfv),
per AS (
  SELECT dtf.doc_id, CAST(sum(dtf.n) AS BIGINT) AS n_bigrams,
         sum(dtf.n * ln((bg.n_ab + {k!r})
                        / (hist.n_a + {k!r} * vocab.v))) / sum(dtf.n) AS lp
  FROM dtf JOIN bg USING (w1, w2) JOIN hist USING (w1) CROSS JOIN vocab
  GROUP BY dtf.doc_id)
SELECT d.doc_id,
       CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(coalesce(p.lp, 0.0), 6) AS avg_logprob
FROM {DOCS} d LEFT JOIN per p ON d.doc_id = p.doc_id"""


def ts_heatmap_sql() -> str:
    """Oracle for ops.timeseries.activity_heatmap (dow 0=Sunday)."""
    return """
SELECT CAST(date_part('dow', ts) AS INT) AS dow,
       CAST(date_part('hour', ts) AS INT) AS hour,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""


def ts_rollup_sql(fine: str = "1 hour", coarse: str = "1 day") -> str:
    """Oracle for downsample_store + rollup_query: the SAME two-step
    aggregation (fine buckets with rounded sums, then the coarse
    fold) so intermediate rounding matches the store exactly."""
    return f"""
WITH f AS (
  SELECT time_bucket(INTERVAL '{fine}', ts) AS fb,
         CAST(count(*) AS BIGINT) AS n,
         round(sum(value), 6) AS vsum,
         min(value) AS vmin, max(value) AS vmax
  FROM events GROUP BY 1),
c AS (
  SELECT time_bucket(INTERVAL '{coarse}', fb) AS bucket_start,
         CAST(sum(n) AS BIGINT) AS n,
         round(sum(vsum), 6) AS vsum,
         min(vmin) AS vmin, max(vmax) AS vmax
  FROM f GROUP BY 1)
SELECT strftime(bucket_start, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       n, vsum, round(vsum / n, 6) AS vavg, vmin, vmax
FROM c ORDER BY bucket_start"""


def ts_stats_bucket_sql(unit: str = "1 day") -> str:
    """Oracle for ops.timeseries.stats_bucket: min_by/max_by via
    (metric, bucket) ordering with earliest-bucket tie-break."""
    return f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '{unit}', ts) AS bs,
         round(sum(value), 6) AS bucket_sum
  FROM events GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       round(avg(bucket_sum), 6) AS bucket_avg,
       round(sum(bucket_sum), 6) AS bucket_sum_total,
       (SELECT strftime(bs, '%Y-%m-%d %H:%M:%S') FROM b
        ORDER BY bucket_sum ASC, bs ASC LIMIT 1) AS min_bucket_key,
       min(bucket_sum) AS min_bucket_sum,
       (SELECT strftime(bs, '%Y-%m-%d %H:%M:%S') FROM b
        ORDER BY bucket_sum DESC, bs ASC LIMIT 1) AS max_bucket_key,
       max(bucket_sum) AS max_bucket_sum
FROM b"""


def ts_transitions_sql() -> str:
    """Oracle for ops.timeseries.transition_matrix (per-user
    consecutive pairs in (ts, event_id) order)."""
    return """
WITH lagd AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
pairs AS (
  SELECT prev AS from_type, event_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM lagd WHERE prev IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY from_type), 6) AS prob
FROM pairs ORDER BY from_type, to_type"""


def ts_eql_sequence_sql(steps: list[str],
                        maxspan_minutes: int = 60) -> str:
    """Oracle for ops.timeseries.eql_sequence: the funnel chain CTEs
    with the anchor ts carried through, final span filter."""
    ctes = []
    for i, s in enumerate(steps):
        sq = s.replace("'", "''")
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT user_id, min(ts) AS t, min(ts) AS t0 "
                f"FROM events WHERE event_type = '{sq}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, min(e.ts) AS t, "
                f"min(p.t0) AS t0 "
                f"FROM events e JOIN s{i - 1} p ON e.user_id = p.user_id "
                f"WHERE e.event_type = '{sq}' AND e.ts >= p.t "
                f"GROUP BY e.user_id)"
            )
    last = len(steps) - 1
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT user_id,
       strftime(t0, '%Y-%m-%d %H:%M:%S.%f') AS t0,
       strftime(t, '%Y-%m-%d %H:%M:%S.%f') AS t_last,
       round(epoch_us(t - t0) / 1000000.0, 6) AS span_s
FROM s{last}
WHERE epoch_us(t - t0) / 1000000.0 <= {float(maxspan_minutes) * 60.0!r}
ORDER BY user_id""")


def mm_byte_stats_sql() -> str:
    """Oracle for ops.multimodal.binary_byte_stats over the fake
    payload (unhex(md5(text)), 16 bytes): per-byte-pair histogram,
    same log2 entropy fold."""
    return """
WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
b AS (
  SELECT doc_id, substr(hx, 2 * i - 1, 2) AS byte
  FROM p, UNNEST(generate_series(1, 16)) AS t(i)),
c AS (SELECT doc_id, byte, count(*) AS c FROM b GROUP BY 1, 2)
SELECT doc_id, 16 AS byte_len,
       CAST(count(*) AS INT) AS n_distinct,
       round(COALESCE(sum(CASE WHEN byte = '00' THEN c END), 0)
             / 16.0, 6) AS zero_ratio,
       round(log2(16.0) - sum(c * log2(CAST(c AS DOUBLE))) / 16.0, 6)
         AS entropy
FROM c GROUP BY doc_id"""


def leakage_safe_split_sql(test_pct: int = 10,
                           salt: str = "split") -> str:
    """Oracle for ops.sampling.leakage_safe_split over the MinHash
    cluster map: the dup_clusters recursive closure, left-joined to
    documents, split on the shared hash_bucket device applied to the
    cluster representative."""
    from katta_spark.ops.sampling import N_BUCKETS

    cl = dup_clusters_sql(minhash_lsh_sql(num_hashes=16, bands=4, n=3))
    cut = int(test_pct) * N_BUCKETS // 100
    bucket = _bucket_sql("rep", salt)
    return f"""
WITH cl AS ({cl}),
j AS (
  SELECT d.doc_id,
         COALESCE(c.cluster, d.doc_id) AS rep
  FROM documents d LEFT JOIN cl c ON d.doc_id = c.doc_id)
SELECT doc_id, rep AS cluster_rep,
       CASE WHEN {bucket} < {cut} THEN 'test' ELSE 'train' END AS split
FROM j"""
