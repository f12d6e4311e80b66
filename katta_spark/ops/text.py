"""Text-analysis operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built-in-function column algebra (JVM-side, codegen);
the only state is small literal keyword lists (broadcast-free —
compiled into the plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katta_spark.tokenizer import tokens_array

# tiny per-language stopword profiles for the n-gram/keyword heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "es"],
    "zh": ["de", "shi", "le", "zai", "you"],
}


def token_stats(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, avg_token_len) per doc — narrow
    (no shuffle): pure array algebra on the tokenizer output."""
    t = tokens_array(text_col)
    return corpus.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        (
            F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.greatest(F.size(t), F.lit(1))
        ).alias("avg_token_len"),
    )


#: GPT-2-style pre-tokenization classes: letter runs, digit runs,
#: single non-space punctuation.  Kept to a dialect-portable subset
#: (no lookarounds) so Java regex (Spark) and RE2 (DuckDB oracle)
#: agree byte-for-byte.
BPE_PRETOK_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_estimate(corpus: DataFrame, text_col: str = "content",
                       chunk: int = 4) -> DataFrame:
    """(doc_id, n_pretok, n_tokens_est) — LLM-tokenizer cost estimate
    without shipping a tokenizer: GPT-2-ish regex pre-tokenization
    (:data:`BPE_PRETOK_RE`), then each pretoken contributes
    ``ceil(len/chunk)`` subword tokens (BPE merges rarely span more
    than ~4 chars of code).  Narrow column algebra — regex +
    ``aggregate`` over the match array, zero shuffle, zero Python."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOK_RE), 0)
    est = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.floor((F.length(x) + (chunk - 1)) / chunk),
    )
    return corpus.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_pretok"),
        est.alias("n_tokens_est"),
    )


def _quality_exprs(txt, toks) -> dict:
    """Quality-signal Columns over (text, token-array) — shared by
    :func:`quality_score` and the one-pass :func:`curate`."""
    n = F.length(txt)
    alnum = F.length(F.regexp_replace(txt, r"[^A-Za-z0-9 ]", ""))
    stops = F.array(*[F.lit(s) for s in LANG_PROFILES["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
    stop_ratio = n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1))
    alpha_ratio = alnum.cast("double") / F.greatest(n, F.lit(1))
    quality = F.greatest(
        F.least(alpha_ratio * (F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4))), F.lit(1.0)),
        F.lit(0.0),
    )
    return {
        "len_chars": n.cast("long"),
        "alpha_ratio": alpha_ratio,
        "stop_ratio": stop_ratio,
        "quality": quality,
    }


def quality_score(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, len_chars, alpha_ratio, stop_ratio, quality) —
    heuristic curation score in [0,1]:
      - alpha_ratio: fraction of chars that are alphanumeric/space;
      - stop_ratio: fraction of tokens in the english stopword list;
      - quality = alpha_ratio * (1 - |stop_ratio - 0.4|) clamped.
    """
    base = corpus.select(
        "doc_id", F.col(text_col).alias("_txt"),
        tokens_array(text_col).alias("_toks"),
    )
    cols = _quality_exprs(F.col("_txt"), F.col("_toks"))
    return base.select(
        "doc_id", *[c.alias(a) for a, c in cols.items()]
    )


def _langid_exprs(toks) -> dict:
    """(lang_pred, lang_hits) Columns over a token array — argmax of
    per-language keyword hits, tie-break language code asc."""
    def _hits(kws: list[str]):
        arr = F.array(*[F.lit(k) for k in kws])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = F.array(
        *[
            F.struct((-_hits(kws)).alias("neg_hits"), F.lit(code).alias("code"))
            for code, kws in sorted(LANG_PROFILES.items())
        ]
    )
    top = F.array_sort(scores)[0]
    return {
        "lang_pred": top["code"],
        "lang_hits": (-top["neg_hits"]).cast("long"),
    }


def langid(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — argmax of per-language keyword
    hits; deterministic tie-break by language code asc.  The token
    array materializes ONCE (named column) and the five profile
    filters share it."""
    base = corpus.select("doc_id", tokens_array(text_col).alias("_toks"))
    cols = _langid_exprs(F.col("_toks"))
    return base.select(
        "doc_id", *[c.alias(a) for a, c in cols.items()]
    )


def clean_text(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, clean, n_removed) — boilerplate scrub for training
    pipelines: strip HTML/XML tags, collapse whitespace runs to one
    space, trim.  Narrow column algebra (regexp_replace is JVM
    codegen), zero shuffle — a pure map stage at any scale."""
    txt = F.col(text_col)
    no_tags = F.regexp_replace(txt, r"<[^>]*>", " ")
    clean = F.trim(F.regexp_replace(no_tags, r"\s+", " "))
    return corpus.select(
        "doc_id",
        clean.alias("clean"),
        (F.length(txt) - F.length(clean)).cast("long").alias("n_removed"),
    )


def repetition_ratio(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, n_lines, n_distinct_lines, dup_line_ratio,
    dup_token_ratio) — within-document repetition signals
    (Gopher/RefinedWeb-style repetition filters): the fraction of
    non-blank lines that are duplicates of an earlier line, and the
    fraction of tokens that repeat.  Empty docs score 0.0 (nothing
    repeats), not 1.0.  Narrow array algebra, zero shuffle."""
    base = corpus.select(
        "doc_id", F.col(text_col).alias("_txt"),
        tokens_array(text_col).alias("_toks"),
    )
    cols = _repetition_exprs(F.col("_txt"), F.col("_toks"))
    return base.select(
        "doc_id", *[c.alias(a) for a, c in cols.items()]
    )


def _repetition_exprs(txt, toks) -> dict:
    lines = F.filter(
        F.split(txt, "\n"),
        lambda x: F.length(F.trim(x)) > 0,
    )
    n_lines = F.size(lines)
    nd_lines = F.size(F.array_distinct(lines))
    n_toks = F.size(toks)
    nd_toks = F.size(F.array_distinct(toks))

    def ratio(n, nd):
        return F.when(n == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - nd.cast("double") / n.cast("double")
        )

    return {
        "n_lines": n_lines.cast("long"),
        "n_distinct_lines": nd_lines.cast("long"),
        "dup_line_ratio": ratio(n_lines, nd_lines),
        "dup_token_ratio": ratio(n_toks, nd_toks),
    }


#: PII patterns in scrub order (earlier replacements feed later
#: counts, so overlaps — an IP inside an email host — never double
#: count).  Dialect-portable subset: no lookarounds, so Java regex
#: (Spark) and RE2 (DuckDB oracle) match byte-for-byte.  The phone
#: pattern is deliberately conservative (international `+` form
#: only) — a bare 7-digit run in code/data is usually NOT a phone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
]


def pii_scrub(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, scrubbed, n_email, n_ipv4, n_phone) — redact emails,
    IPv4 addresses, and international phone numbers to typed
    placeholders, counting each class.  Counts are taken on the text
    as of that pattern's turn (email first), so an address inside an
    already-redacted span is not re-counted.

    Narrow JVM column algebra (regexp_extract_all + regexp_replace,
    codegen) — a pure map stage, zero shuffle, zero Python at any
    corpus size."""
    scrubbed, counts = _pii_exprs(F.col(text_col))
    return corpus.select(
        "doc_id", scrubbed.alias("scrubbed"),
        *[c.alias(a) for a, c in counts.items()],
    )


def _pii_exprs(txt) -> tuple:
    """(scrubbed Column, {n_<class>: Column}) over a text Column."""
    cur = txt
    counts = {}
    for name, pat, rep in PII_PATTERNS:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(cur, F.lit(pat), F.lit(0))
        ).cast("long")
        cur = F.regexp_replace(cur, pat, rep)
    return cur, counts


def ngram_top(
    corpus: DataFrame, n: int = 2, k: int = 20, text_col: str = "content"
) -> DataFrame:
    """(ngram, n_occurrences) — the k most frequent word n-grams in
    the corpus under the code tokenizer, ties broken by ngram asc
    (a total order, so top-k is engine-independent).

    Scale shape: explode is narrow; the groupBy hash-aggregates with
    map-side partial combine (per-task n-gram counts merge before the
    shuffle), so shuffle volume is O(distinct n-grams), not O(token
    occurrences); the final top-k is a TakeOrderedAndProject merge —
    no global sort."""
    # tokenize ONCE into a named column: referencing the tokenizer
    # expression inside the transform lambda would re-evaluate the
    # whole regex pipeline per array element (O(tokens^2) per doc)
    base = corpus.select(tokens_array(text_col).alias("_toks"))
    t = F.col("_toks")
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(
                " ", *[F.get(t, i + F.lit(d)) for d in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        base.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
    )


def fingerprint(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, fingerprint) — md5 of the sorted distinct token set:
    canonical content fingerprint robust to token order (the classic
    'fingerprint' key for clustering near-identical docs)."""
    t = tokens_array(text_col)
    return corpus.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(t)), " ")).alias("fingerprint"),
    )


def unigram_logprob(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) — corpus-unigram language-model
    score: avg over token occurrences of ln p(token), with p the MLE
    unigram model of the corpus itself (the cheap KenLM-quality proxy
    used to rank documents by 'typicality' in data-curation
    pipelines; lower = weirder).

    Scale shape: per-(doc, term) tf is aggregated BEFORE the
    catalog join (map-side combine turns the token stream into
    distinct doc-term pairs), then one shuffle join on term against
    the unigram catalog — AQE's skew-join handles hot terms.  The
    corpus-total is a one-row broadcast."""
    tok = corpus.select(
        "doc_id", F.explode(tokens_array(text_col)).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    freq = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = freq.agg(F.sum("cf").alias("_total"))
    per = (
        tf.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.log(F.col("cf") / F.col("_total")))
                / F.sum("tf")
            ).alias("lp"),
        )
    )
    return (
        corpus.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(F.coalesce("lp", F.lit(0.0)), 6).alias("avg_logprob"),
        )
    )


def token_entropy(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, n_tokens, entropy) — Shannon entropy (nats) of each
    document's own token distribution: H = -sum p ln p over the doc's
    distinct tokens.  Low entropy flags repetitive/boilerplate text
    (a standard Gopher-family quality signal complementing
    :func:`repetition_ratio`, which looks at adjacency, not the
    distribution).

    Scale shape: explode -> (doc, term) count with map-side combine,
    then ONE hash agg back to doc_id — shuffle is O(distinct doc-term
    pairs), never the token stream, and nothing is corpus-global (no
    catalog join).  Empty docs report entropy 0."""
    tf = (
        corpus.select("doc_id", F.explode(tokens_array(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    per = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * F.log("tf")).alias("_sum_flogf"),
    )
    # H = ln(N) - (1/N) * sum f ln f  (exact algebra; one pass)
    ent = per.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.log("n_tokens") - F.col("_sum_flogf") / F.col("n_tokens"), 6
        ).alias("entropy"),
    )
    return (
        corpus.select("doc_id")
        .join(ent, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
    )


def lm_buckets(corpus: DataFrame, text_col: str = "content",
               lang_col: str = "lang", n_buckets: int = 3) -> DataFrame:
    """(doc_id, lang, avg_logprob, bucket) — CCNet-style per-language
    LM-score buckets (Wenzek et al., LREC 2020): documents ranked by
    corpus-unigram typicality WITHIN their language and cut into
    ``n_buckets`` equal-frequency buckets (1 = head / most typical,
    ``n_buckets`` = tail).  The curation move downstream is to keep
    head+middle or re-weight by bucket.

    Scale shape: the LM score reuses :func:`unigram_logprob`'s
    pre-aggregated one-join plan; the rank window is PARTITIONED BY
    LANGUAGE (per-key sort state, never a global single-partition
    sort).  Ranking uses the 6-dp-rounded score with doc_id
    tie-break, so bucket assignment is deterministic under any
    partitioning and engine-portable."""
    from pyspark.sql import Window

    lp = unigram_logprob(corpus, text_col).select("doc_id", "avg_logprob")
    base = corpus.select("doc_id", lang_col).join(lp, "doc_id")
    w = Window.partitionBy(lang_col).orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    return base.withColumn("bucket", F.ntile(n_buckets).over(w)).select(
        "doc_id", lang_col, "avg_logprob", "bucket"
    )


def code_quality(corpus: DataFrame, text_col: str = "content",
                 max_line: int = 1000, max_avg_line: float = 200.0,
                 min_alnum: float = 0.25) -> DataFrame:
    """(doc_id, n_lines, avg_line_len, max_line_len, comment_ratio,
    blank_ratio, alnum_frac, keep) — StarCoder-style source-file
    quality signals: files with pathological line lengths or a tiny
    alphanumeric fraction (minified/binary-ish blobs) are filtered.
    Narrow column algebra, zero shuffle, zero Python."""
    lines = F.split(F.col(text_col), "\n")
    nonblank = F.filter(lines, lambda x: F.trim(x) != "")
    comments = F.filter(
        nonblank,
        lambda x: F.ltrim(x).startswith("#") | F.ltrim(x).startswith("//"),
    )
    line_lens = F.transform(lines, F.length)
    n_lines = F.size(lines)
    avg_len = (
        F.aggregate(line_lens, F.lit(0).cast("long"), lambda a, x: a + x)
        / F.greatest(n_lines, F.lit(1))
    )
    max_len = F.coalesce(F.array_max(line_lens), F.lit(0))
    alnum = (
        F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9]", ""))
        / F.greatest(F.length(text_col), F.lit(1))
    )
    keep = (
        (max_len <= F.lit(max_line))
        & (avg_len <= F.lit(max_avg_line))
        & (alnum >= F.lit(min_alnum))
    )
    return corpus.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        F.round(avg_len, 6).alias("avg_line_len"),
        max_len.cast("long").alias("max_line_len"),
        F.round(
            F.size(comments) / F.greatest(F.size(nonblank), F.lit(1)), 6
        ).alias("comment_ratio"),
        F.round(
            (n_lines - F.size(nonblank)) / F.greatest(n_lines, F.lit(1)), 6
        ).alias("blank_ratio"),
        F.round(alnum, 6).alias("alnum_frac"),
        keep.alias("keep"),
    )


def nfc_normalize(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, text_nfc, changed) — Unicode NFC normalization
    (compose combining sequences; the canonical first step before any
    hashing/dedup so 'e'+U+0301 and U+00E9 collapse to one form).

    Spark has no built-in Unicode normalizer, so this is the
    sanctioned slow path: an Arrow-batched vectorized pandas UDF
    (never row-at-a-time Python) — narrow, zero shuffle, and the only
    Python hot path in the text ops."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    def _nfc_series(s):  # pd.Series -> pd.Series (scalar pandas UDF)
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x)
            if x is not None else None
        )

    _nfc = pandas_udf(_nfc_series, "string")
    nfc = _nfc(F.col(text_col))
    return corpus.select(
        "doc_id",
        nfc.alias("text_nfc"),
        (nfc != F.col(text_col)).alias("changed"),
    )


def bigram_lm(corpus: DataFrame, k: int = 20, add_k: float = 1.0,
              min_count: int = 1, text_col: str = "content") -> DataFrame:
    """(w1, w2, n_ab, n_a, logp) — the head of an add-k smoothed
    bigram language model's transition table: logp = ln((n_ab +
    add_k) / (n_a + add_k * V)), where n_a counts occurrences of
    ``w1`` as a bigram history (occurrences not in doc-final
    position) and V is the unigram vocabulary size — the distributed
    n-gram LM estimation step (KenLM-style count-then-normalize,
    without backoff).

    Scale shape: bigram counts hash-aggregate with map-side combine
    (shuffle O(bigram vocab), never O(token occurrences)); history
    counts reduce FROM the aggregated bigram table (no second corpus
    pass); V is a one-row broadcast.  ``min_count`` trims the output
    head only — smoothing denominators always use the full counts.
    Top-k by (n_ab desc, w1 asc, w2 asc) — a total order."""
    base = corpus.select(tokens_array(text_col).alias("_toks"))
    t = F.col("_toks")
    grams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.struct(
                F.get(t, i).alias("w1"),
                F.get(t, i + F.lit(1)).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = (
        base.select(F.explode(grams).alias("g"))
        .select(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_ab"))
    )
    hist = big.groupBy("w1").agg(F.sum("n_ab").alias("n_a"))
    vocab = (
        base.select(F.explode(t).alias("term"))
        .agg(F.count_distinct("term").alias("_v"))
    )
    ak = F.lit(float(add_k))
    logp = F.log(
        (F.col("n_ab").cast("double") + ak)
        / (F.col("n_a").cast("double") + ak * F.col("_v").cast("double"))
    )
    return (
        big.filter(F.col("n_ab") >= min_count)
        .join(hist, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("w1", "w2", "n_ab", "n_a", F.round(logp, 6).alias("logp"))
        .orderBy(F.desc("n_ab"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def pmi_top(corpus: DataFrame, k: int = 20, min_count: int = 5,
            text_col: str = "content") -> DataFrame:
    """(ngram, n_ab, pmi) — top-k bigram collocations by pointwise
    mutual information: pmi = ln( p(ab) / (p(a)·p(b)) ) with MLE
    probabilities over the corpus (the classic Church & Hanks
    association measure; data-curation pipelines use it to mine
    multi-word expressions / boilerplate phrases).

    Scale shape: bigram and unigram counts each hash-aggregate with
    map-side combine (shuffle O(vocab), not O(token occurrences));
    the two unigram joins key on the term (AQE handles skewed hot
    words); corpus totals are one-row broadcasts.  ``min_count``
    suppresses the unstable low-frequency tail; ties break ngram asc
    (total order)."""
    # tokenize ONCE into a named column (see ngram_top: the tokenizer
    # expression inside a transform lambda re-evaluates per element)
    base = corpus.select(tokens_array(text_col).alias("_toks"))
    t = F.col("_toks")
    grams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ", F.get(t, i), F.get(t, i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = (
        base.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    uni = (
        base.select(F.explode(t).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_t"))
    )
    n_tok = uni.agg(F.sum("n_t").alias("_n_tok"))
    n_big = (
        base.select(
            F.greatest(F.size(t) - 1, F.lit(0)).alias("_nb")
        ).agg(F.sum("_nb").alias("_n_big"))
    )
    a = F.split(F.col("ngram"), " ")[0]
    b = F.split(F.col("ngram"), " ")[1]
    joined = (
        big.withColumn("_a", a).withColumn("_b", b)
        .join(uni.select(F.col("term").alias("_a"),
                         F.col("n_t").alias("n_a")), "_a")
        .join(uni.select(F.col("term").alias("_b"),
                         F.col("n_t").alias("n_b")), "_b")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_big))
    )
    pmi = F.log(
        (F.col("n_ab").cast("double") / F.col("_n_big"))
        / (
            (F.col("n_a").cast("double") / F.col("_n_tok"))
            * (F.col("n_b").cast("double") / F.col("_n_tok"))
        )
    )
    return (
        joined.select(
            "ngram", "n_ab", F.round(pmi, 6).alias("pmi")
        )
        .orderBy(F.desc("pmi"), F.asc("ngram"))
        .limit(k)
    )


def chunk_texts(corpus: DataFrame, size: int = 32, stride: int = 24,
                text_col: str = "content") -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk) — overlapping token-window
    chunks (the RAG/embedding-pipeline splitter): chunk k covers
    tokens [k·stride, k·stride + size).  ``stride < size`` gives
    sliding overlap; the final chunk may be shorter; empty docs yield
    no chunks.

    Narrow column algebra end to end (tokenize once, ``sequence`` for
    the starts, ``slice`` + explode) — zero shuffle, a pure map stage
    at any corpus size; chunk identity is a pure function of the doc,
    so reruns and repartitions emit identical chunks."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    base = corpus.select("doc_id", tokens_array(text_col).alias("_toks"))
    t = F.col("_toks")
    starts = F.when(
        F.size(t) > 0,
        F.sequence(F.lit(0), F.size(t) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.slice(t, s + 1, size).alias("_toks"),
        ),
    )
    ex = base.select("doc_id", F.explode(chunks).alias("c"))
    return ex.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c._toks").cast("long").alias("n_tokens"),
        F.array_join("c._toks", " ").alias("chunk"),
    )


#: default curation thresholds (each documented at its source op)
CURATE_DEFAULTS = {
    "min_quality": 0.3,
    "max_dup_line_ratio": 0.5,
    "max_pii": 0,
    "langs": None,  # None = any predicted language
}


def curate(corpus: DataFrame, text_col: str = "content",
           min_quality: float = 0.3, max_dup_line_ratio: float = 0.5,
           max_pii: int = 0, langs: list[str] | None = None) -> DataFrame:
    """(doc_id, quality, dup_line_ratio, n_pii, lang_pred, keep) —
    the standard curation verdict: one document survives iff its
    quality score, line-repetition ratio, PII count, and (optionally)
    predicted language all pass.  This is the composition every
    training-data pipeline runs in front of dedup/packing — ONE
    narrow map stage: the four signals are built from the SAME shared
    expression builders as the standalone ops (single source of
    truth) and evaluated in one select over one text/token
    projection — the corpus is scanned exactly once, no self-joins."""
    base = corpus.select(
        "doc_id", F.col(text_col).alias("_txt"),
        tokens_array(text_col).alias("_toks"),
    )
    txt, toks = F.col("_txt"), F.col("_toks")
    quality = F.round(_quality_exprs(txt, toks)["quality"], 6)
    dup_line = F.round(_repetition_exprs(txt, toks)["dup_line_ratio"], 6)
    _, pii_counts = _pii_exprs(txt)
    n_pii = sum(pii_counts.values(), F.lit(0)).cast("long")
    lang_pred = _langid_exprs(toks)["lang_pred"]
    sig = base.select(
        "doc_id",
        quality.alias("quality"),
        dup_line.alias("dup_line_ratio"),
        n_pii.alias("n_pii"),
        lang_pred.alias("lang_pred"),
    )
    keep = (
        (F.col("quality") >= min_quality)
        & (F.col("dup_line_ratio") <= max_dup_line_ratio)
        & (F.col("n_pii") <= max_pii)
    )
    if langs:
        keep = keep & F.col("lang_pred").isin([str(x) for x in langs])
    # no orderBy here: the verdict is a stateless narrow plan that
    # must also run under readStream append mode (callers sort)
    return sig.withColumn("keep", keep)


def keywords_tfidf(corpus: DataFrame, m: int = 5,
                   text_col: str = "content") -> DataFrame:
    """(doc_id, term, tf, score, rank) — the top-``m`` TF-IDF
    keywords of every document (classic keyword extraction /
    document-tagging op; the smooth idf = ln(1 + N/df) keeps
    singleton terms finite).  Ties break term asc for determinism.

    Scale shape: per-(doc, term) tf aggregates BEFORE the df-catalog
    join (map-side combine); the per-doc rank is a window over that
    already-aggregated pair table partitioned by doc_id — rows per
    partition = distinct terms of one doc, never the token stream."""
    from pyspark.sql import Window

    tok = corpus.select(
        "doc_id", F.explode(tokens_array(text_col)).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfv = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = corpus.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfv, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            (
                F.col("tf")
                * F.log(F.lit(1.0) + F.col("_n") / F.col("df"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(m))
        .select("doc_id", "term", "tf",
                F.round("score", 6).alias("score"), "rank")
    )


def string_stats(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """ES ``string_stats`` aggregation (with ``show_distribution``'s
    entropy): one row ``(n_docs, min_len, max_len, avg_len,
    entropy)`` where ``entropy`` is the Shannon entropy (base 2) of
    the corpus-wide CHARACTER distribution — ES computes exactly
    this from its per-shard char-count maps.

    Scale shape: two aggs over the scan — a four-stat length agg,
    and a char-frequency hash agg whose key space is the alphabet
    (bounded, map-side combine shrinks each partition to ≤|alphabet|
    rows before the shuffle); the entropy fold then runs on that
    tiny table.  No per-row Python anywhere."""
    txt = F.col(text_col)
    docs = corpus.filter(txt.isNotNull())
    lens = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.length(txt)).alias("min_len"),
        F.max(F.length(txt)).alias("max_len"),
        F.round(F.avg(F.length(txt)), 6).alias("avg_len"),
    )
    chars = (
        docs.select(F.explode(F.split(txt, "(?!^)")).alias("ch"))
        # a zero-length doc splits to [""] — not a character
        .filter(F.length("ch") > 0)
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ent = (
        chars.agg(
            F.sum("c").alias("_tot"),
            F.sum(F.col("c") * F.log2(F.col("c"))).alias("_clog"),
        )
        .select(
            F.round(
                F.log2(F.col("_tot")) - F.col("_clog") / F.col("_tot"), 6
            ).alias("entropy")
        )
    )
    return lens.crossJoin(F.broadcast(ent))


def multi_terms(corpus: DataFrame, keys: list[str],
                size: int = 10) -> DataFrame:
    """ES ``multi_terms`` aggregation: top-``size`` buckets of the
    COMPOUND key (all of ``keys`` at once, not a nested terms tree),
    ordered by doc count desc with the key tuple as tie-break.

    Scale shape: one hash agg on the compound key + a global
    top-``size`` (TakeOrderedAndProject — no full sort)."""
    agg = corpus.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    order = [F.desc("n")] + [F.asc(k) for k in keys]
    return agg.orderBy(*order).limit(int(size))


def categorize_text(corpus: DataFrame, text_col: str = "content",
                    m: int = 10) -> DataFrame:
    """ES ``categorize_text`` aggregation (log-template mining, the
    deterministic core of drain-style categorizers): messages are
    reduced to a TEMPLATE by masking numeric tokens (integers,
    decimals, hex ids) as ``<num>`` and collapsing whitespace; top
    ``m`` templates by message count, with the lexicographically
    smallest member as the reproducible example.

    Scale shape: template derivation is narrow JVM regex column
    algebra; ONE hash agg on the template (cardinality = distinct
    templates, tiny next to messages) + TakeOrderedAndProject."""
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, r"\b(?:0x[0-9a-f]+|\d+(?:\.\d+)?)\b", "<num>")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return (
        corpus.select(t.alias("template"), F.col(text_col))
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(text_col).alias("example"),
        )
        .orderBy(F.desc("n"), F.asc("template"))
        .limit(int(m))
    )


def vocab_kl(corpus: DataFrame, split_col: str, split_a: str,
             split_b: str, text_col: str = "content",
             add_k: float = 0.5) -> DataFrame:
    """Corpus-drift diagnostic: smoothed KL divergence between the
    unigram token distributions of two document slices (source A vs
    source B) — the data-mixing / domain-shift report a training
    pipeline runs before blending sources (DSIR-adjacent, but a
    corpus-level scalar rather than per-doc weights).

    One row ``(n_terms, n_a, n_b, kl_ab, kl_ba)`` with add-``k``
    smoothing over the UNION vocabulary:
    ``p(t) = (c_a(t)+k) / (n_a+k*V)``, ``KL(a||b) = Σ p·ln(p/q)``.

    Scale shape: ONE conditional hash agg over the exploded tokens
    (key space = vocabulary, map-side combine), then the KL fold
    runs on that vocabulary-sized table.  Zero Python."""
    t = tokens_array(text_col)
    a = F.col(split_col) == F.lit(split_a)
    b = F.col(split_col) == F.lit(split_b)
    toks = (
        corpus.filter(a | b)
        .select(a.alias("_is_a"), F.explode(t).alias("term"))
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("_is_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("_is_a"), 1).otherwise(0)).alias("cb"),
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
    )
    k = float(add_k)
    j = counts.crossJoin(F.broadcast(tot))
    p = (F.col("ca") + F.lit(k)) / (
        F.col("n_a") + F.lit(k) * F.col("n_terms")
    )
    q = (F.col("cb") + F.lit(k)) / (
        F.col("n_b") + F.lit(k) * F.col("n_terms")
    )
    return (
        j.agg(
            F.max("n_terms").alias("n_terms"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_ab"),
            F.round(F.sum(q * F.log(q / p)), 6).alias("kl_ba"),
        )
    )


def bigram_logprob(corpus: DataFrame, text_col: str = "content",
                   add_k: float = 1.0) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) — per-document score under
    the corpus's own add-k smoothed bigram LM (the CCNet-style
    perplexity filter, one order up from :func:`unigram_logprob`):
    avg over a doc's bigram occurrences of ln p(w2|w1) with
    ``p = (n_ab + k) / (n_a + k·V)`` — the same smoothing as
    :func:`bigram_lm` (n_a = occurrences of w1 as a bigram history,
    V = unigram vocabulary).  Docs with < 2 tokens score 0 over 0
    bigrams.

    Scale shape: per-(doc, bigram) counts hash-aggregate BEFORE any
    join (map-side combine — shuffle O(doc-distinct bigrams), never
    O(token occurrences)); the corpus bigram table and history table
    both reduce FROM that aggregate (no second corpus pass); V is a
    one-row broadcast; then one join on the bigram and one on the
    history, both AQE-skew-safe."""
    k = float(add_k)
    base = corpus.select(
        "doc_id", tokens_array(text_col).alias("_toks")
    )
    t = F.col("_toks")
    grams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.slice(t, 1, F.size(t) - 1),
            lambda w, i: F.struct(
                w.alias("w1"), F.element_at(t, i + 2).alias("w2")
            ),
        ),
    ).otherwise(F.array())
    pairs = base.select(
        "doc_id", F.explode(grams).alias("_g")
    ).select("doc_id", F.col("_g.w1").alias("w1"),
             F.col("_g.w2").alias("w2"))
    dtf = pairs.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("n")
    )
    bg = dtf.groupBy("w1", "w2").agg(F.sum("n").alias("n_ab"))
    hist = bg.groupBy("w1").agg(F.sum("n_ab").alias("n_a"))
    vocab = corpus.select(
        F.explode(tokens_array(text_col)).alias("term")
    ).agg(F.countDistinct("term").alias("_v"))
    per = (
        dtf.join(bg, ["w1", "w2"])
        .join(hist, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            (
                F.sum(
                    F.col("n")
                    * F.log(
                        (F.col("n_ab") + F.lit(k))
                        / (F.col("n_a") + F.lit(k) * F.col("_v"))
                    )
                )
                / F.sum("n")
            ).alias("lp"),
        )
    )
    return (
        corpus.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.round(F.coalesce("lp", F.lit(0.0)), 6).alias("avg_logprob"),
        )
    )


def paragraph_dedup(corpus: DataFrame, text_col: str = "content",
                    sep: str = "\n", min_chars: int = 20,
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text) — C4-style GLOBAL line/paragraph deduplication:
    a segment appearing in several documents survives only at its
    earliest (doc_id, position) occurrence; later copies are cut out
    of their documents (the license-header / boilerplate scrub C4
    applies at three-sentence-span granularity — here at ``sep``
    segments).  Segments shorter than ``min_chars`` are structural
    (braces, blank lines) and always kept.

    Scale shape: short segments BYPASS the dedup entirely (they never
    enter the shuffle, which also removes the empty-line skew key);
    long segments shuffle once keyed by content for the
    first-occurrence window, and documents reassemble with one
    hash agg (order restored by an in-row array sort, not a global
    sort)."""
    from pyspark.sql import Window

    lines = corpus.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    short = lines.filter(F.length("line") < int(min_chars))
    w = Window.partitionBy("line").orderBy(id_col, "pos")
    long_first = (
        lines.filter(F.length("line") >= int(min_chars))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    kept = short.unionByName(long_first)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "line"))),
        lambda s: s["line"],
    )
    return kept.groupBy(id_col).agg(
        F.array_join(ordered, sep).alias(text_col)
    )


INVISIBLE_CLASS = (
    "[\u200b-\u200f\u202a-\u202e\u2060-\u2064\u2066-\u2069\ufeff"
    "\u0000-\u0008\u000b\u000c\u000e-\u001f]"
)


def scrub_invisible(corpus: DataFrame, text_col: str = "content",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text, n_removed) — strip INVISIBLE characters:
    zero-width space/joiner family, bidi control characters (the
    Trojan-Source vector in code corpora), word-joiner block, BOM,
    and C0 controls except tab/newline/CR.  ``n_removed`` is the
    per-doc count of stripped characters (the audit signal — a spike
    flags an adversarial or mojibake source).

    Scale shape: one JVM regexp_replace + two length() calls — pure
    narrow column algebra, no Python, no shuffle."""
    cleaned = F.regexp_replace(F.col(text_col), INVISIBLE_CLASS, "")
    return corpus.select(
        F.col(id_col),
        cleaned.alias(text_col),
        (F.length(F.col(text_col)) - F.length(cleaned))
        .cast("int").alias("n_removed"),
    )
