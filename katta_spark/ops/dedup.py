"""Deduplication operators for web-scale corpus curation.

All hashing is built on ``md5`` (available and bit-identical in both
Spark and DuckDB) so every operator is oracle-checkable; at cluster
scale md5 stays JVM-side (no Python in the hot path).

- exact:       hash-groupBy on content digest.
- ngram_jaccard: token n-gram shingles -> shingle-join -> Jaccard;
  exact near-dup, quadratic in cluster size — the verification path.
- minhash_lsh: MinHash signatures (md5-derived 32-bit shingle hashes
  through a (a*x+b) mod p family) banded into LSH buckets; candidate
  pairs come from bucket joins — the 100 TB path (shuffle is
  O(docs x bands), never O(docs^2)).
- simhash:     64-bit sign-aggregated token fingerprint (two 32-bit
  words); near-dup candidate pairs via 4x16-bit band-equality join +
  popcount verify, complete for hamming <= 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katta_spark.tokenizer import tokens_array

MERSENNE_P = (1 << 61) - 1


def exact_dup_groups(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(content_md5, keep_id, n_dups) for every duplicated content.

    ``keep_id`` = min doc_id of the group (the canonical survivor).
    One hash-shuffle; at 100 TB bucket the corpus by the digest.
    """
    return (
        corpus.select(F.md5(F.col(text_col)).alias("content_md5"), "doc_id")
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """Corpus with exact duplicates removed (keep min doc_id)."""
    ranked = corpus.withColumn("_h", F.md5(F.col(text_col)))
    keep = ranked.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    return ranked.join(keep, ["_h", "doc_id"], "left_semi").drop("_h")


def _shingles(corpus: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, shingle) — distinct token n-grams per doc."""
    toks = corpus.select("doc_id", tokens_array(text_col).alias("t"))
    idxs = F.when(
        F.size("t") >= n, F.sequence(F.lit(0), F.size("t") - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(idxs, lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)))
        ).alias("shingle"),
    )
    return sh.distinct()


def ngram_jaccard_pairs(
    corpus: DataFrame, threshold: float = 0.8, n: int = 3, text_col: str = "content"
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with n-gram Jaccard >= t,
    doc_a < doc_b.  Shingle-join keeps it O(pairs sharing a shingle);
    quadratic only inside near-dup clusters — use minhash_lsh first
    at scale and this as the verifier on candidates."""
    sh = _shingles(corpus, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sh_a") + F.col("sh_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def _shingle_hash32() -> F.Column:
    """Deterministic 32-bit integer from a shingle string: the first 8
    hex digits of md5 — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")


def minhash_signatures(
    corpus: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "content",
) -> DataFrame:
    """(doc_id, h_idx, minhash) — num_hashes MinHash values per doc.

    Hash family: h_i(x) = ((a_i*x + b_i) mod p) with p = 2^61-1 and
    deterministic odd coefficients a_i = 2i+1, b_i = i^2+1 (seedless,
    reproducible anywhere, including a SQL oracle)."""
    sh = _shingles(corpus, text_col, n).withColumn("x", _shingle_hash32())
    fam = [(i, 2 * i + 1, i * i + 1) for i in range(num_hashes)]
    fam_df = sh.sparkSession.createDataFrame(fam, "h_idx int, a long, b long")
    return (
        sh.crossJoin(F.broadcast(fam_df))
        .select(
            "doc_id",
            "h_idx",
            ((F.col("a") * F.col("x") + F.col("b")) % F.lit(MERSENNE_P)).alias("hv"),
        )
        .groupBy("doc_id", "h_idx")
        .agg(F.min("hv").alias("minhash"))
    )


def band_buckets(
    corpus: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "content",
) -> DataFrame:
    """(doc_id, band, bucket) — the LSH band buckets of every doc:
    the band's minhash rows folded into one md5 bucket key.  Shared
    by the batch pair-join and the streaming dedup's bucket store."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(corpus, num_hashes, n, text_col)
    return (
        sig.withColumn("band", (F.col("h_idx") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list(F.concat_ws(":", "h_idx", "minhash")))
                )
            ).alias("bucket")
        )
    )


def minhash_lsh_pairs(
    corpus: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "content",
) -> DataFrame:
    """Candidate near-dup pairs (doc_a, doc_b, n_bands) that collide
    in >=1 LSH band.  rows-per-band bucket join: the scalable path —
    shuffle volume is docs x bands, never docs^2."""
    banded = band_buckets(corpus, num_hashes, bands, n, text_col)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, cluster) — connected components over near-dup
    candidate pairs: every doc maps to the MIN doc_id of its
    transitive duplicate cluster (the canonical survivor).  The step a
    real dedup pipeline runs after MinHash/SimHash pair generation
    ("a~b, b~c => keep one of {a,b,c}").

    Iterative min-label propagation (the standard Spark
    connected-components shape, converges in O(diameter) rounds,
    each round one join + one aggregation — no driver-side graph):
    label(v) <- min(label(v), min over neighbors' labels).
    Near-dup clusters are tiny and shallow in practice, so the loop
    exits after 2-4 rounds; ``max_iter`` bounds pathological chains.
    Each round cuts lineage with ``localCheckpoint`` — at warehouse
    scale swap that for a checkpoint/staging-table write (same shape,
    durable), and the convergence count is one small aggregate per
    round (O(diameter) driver round-trips, not per-row driver work).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(
                F.col(id_b).alias("src"), F.col(id_a).alias("dst")
            )
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster", F.col("doc_id"))
    )
    for _ in range(max_iter):
        nb = (
            edges.join(
                labels.withColumnRenamed("doc_id", "dst").withColumnRenamed(
                    "cluster", "nb_cluster"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nb_cluster").alias("nb_min"))
            .withColumnRenamed("src", "doc_id")
        )
        new_labels = (
            labels.join(nb, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster"), F.coalesce("nb_min", F.col("cluster"))
                ).alias("cluster"),
            )
        )
        new_labels = new_labels.localCheckpoint()  # cut the lineage per round
        changed = (
            labels.withColumnRenamed("cluster", "old")
            .join(new_labels, "doc_id")
            .filter(F.col("old") != F.col("cluster"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def simhash64(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, simhash_hi, simhash_lo) — TRUE 64-bit sign-aggregated
    token fingerprint (Charikar similarity hashing), held as two
    32-bit words so every bit operation stays in non-negative BIGINT
    range in both Spark and a SQL oracle.

    bit_j(doc) = 1 iff sum over token occurrences of
    (+1 if bit_j(h64(token)) else -1) > 0, where h64 = first 16 hex
    digits of md5(token) (lo = digits 1-8, hi = digits 9-16).

    Physical shape: explode -> ONE md5 per token occurrence (JVM,
    whole-stage codegen) -> 64 conditional sums with map-side partial
    aggregation -> bit assembly.  Shuffle volume is 64 small ints per
    doc per map partition — linear at any corpus size.  (The earlier
    higher-order-function formulation re-evaluated the md5 transform
    once per bit; explode pays it once.)"""
    toks = corpus.select(
        "doc_id", F.explode(tokens_array(text_col)).alias("tok")
    ).select("doc_id", F.md5("tok").alias("h"))
    t = toks.select(
        "doc_id",
        F.conv(F.substring("h", 1, 8), 16, 10).cast("long").alias("lo"),
        F.conv(F.substring("h", 9, 8), 16, 10).cast("long").alias("hi"),
    )
    aggs = []
    for j in range(32):
        for word in ("lo", "hi"):
            aggs.append(
                F.sum(
                    F.when(
                        F.col(word).bitwiseAND(F.lit(1 << j)) != 0, F.lit(1)
                    ).otherwise(F.lit(-1))
                ).alias(f"{word}{j}")
            )
    s = t.groupBy("doc_id").agg(*aggs)

    def assemble(word: str) -> F.Column:
        sig = F.lit(0).cast("long")
        for j in range(32):
            # token-less docs arrive via the left join with null sums:
            # `null > 0` is null -> otherwise(0) -> bit 0 (oracle
            # parity: coalesce(list_sum(...), 0))
            sig = sig + F.when(
                F.col(f"{word}{j}") > 0, F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return sig

    return (
        corpus.select("doc_id")
        .join(s, "doc_id", "left")
        .select(
            "doc_id",
            assemble("hi").alias("simhash_hi"),
            assemble("lo").alias("simhash_lo"),
        )
    )


def simhash_candidate_pairs(
    corpus: DataFrame, max_hamming: int = 3, text_col: str = "content"
) -> DataFrame:
    """(doc_a, doc_b, hamming) near-dup candidate pairs within
    ``max_hamming`` bits over the 64-bit simhash.

    Band-equality join: the 64 bits split into four 16-bit bands; two
    docs within hamming distance <= 3 must agree on at least one band
    (pigeonhole), so candidates come from a groupable equi-join —
    shuffle O(docs x 4), never all-pairs — then an exact popcount
    verify (the Manku/Jain/Sarma WWW'07 simhash dedup construction).

    Skew note for warehouse scale: the verify cost is quadratic
    WITHIN a band bucket, and byte-identical documents all share one
    bucket — run :func:`dedup_exact` FIRST so each distinct content
    appears once, which caps bucket sizes at the true near-dup
    cluster width (AQE skew-join splitting backstops the rest).
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            "4x16-bit banding guarantees completeness only for "
            f"max_hamming <= 3 (got {max_hamming})"
        )
    sh = simhash64(corpus, text_col)
    bands = []
    for bnd in range(4):
        word = F.col("simhash_lo") if bnd < 2 else F.col("simhash_hi")
        val = F.shiftright(word, 16 * (bnd % 2)).bitwiseAND(F.lit(0xFFFF))
        bands.append(
            F.struct(F.lit(bnd).alias("band"), val.alias("val"))
        )
    e = sh.select(
        "doc_id", "simhash_hi", "simhash_lo",
        F.explode(F.array(*bands)).alias("bv"),
    ).select(
        "doc_id", "simhash_hi", "simhash_lo",
        F.col("bv.band").alias("band"), F.col("bv.val").alias("val"),
    )
    a, b = e.alias("a"), e.alias("b")
    ham = (
        F.bit_count(
            F.col("a.simhash_hi").bitwiseXOR(F.col("b.simhash_hi"))
        )
        + F.bit_count(
            F.col("a.simhash_lo").bitwiseXOR(F.col("b.simhash_lo"))
        )
    ).cast("long")
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def containment_pairs(
    corpus: DataFrame, threshold: float = 0.8, n: int = 3,
    text_col: str = "content",
) -> DataFrame:
    """(doc_a, doc_b, containment) for pairs whose n-gram CONTAINMENT
    |A ∩ B| / min(|A|, |B|) >= threshold, doc_a < doc_b — catches a
    short doc embedded inside a long one, which resemblance (Jaccard)
    misses because the union is dominated by the long doc (Broder's
    containment measure; the shingle-join shape and scale notes match
    :func:`ngram_jaccard_pairs`)."""
    sh = _shingles(corpus, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        common.join(
            sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("n_sh", "sh_a"), "doc_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("n_sh", "sh_b"), "doc_b")
        .withColumn(
            "containment",
            F.col("n_common").cast("double")
            / F.least("sh_a", "sh_b").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )
    return out


# --------------------------------------------------- duplicated spans

def _window_spans(corpus: DataFrame, width: int,
                  text_col: str) -> DataFrame:
    """(doc_id, pos, h) — 60-bit hash of every ``width``-token rolling
    window (pos is the 0-based start token index).  Narrow: the
    window strings never leave the row — only the 8-byte hash does."""
    # tokenize ONCE into a named column: the tokenizer expression
    # inside the transform lambda would re-run per window (O(n^2)
    # per doc — measured 84 s -> ~7 s at sf0.1 after this fix)
    base = corpus.select("doc_id", tokens_array(text_col).alias("_toks"))
    toks = F.col("_toks")
    # sequence(1, 0) would generate DESCENDING [1, 0] — docs shorter
    # than the window must yield an empty span array instead.
    idx = F.when(
        F.size(toks) >= width,
        F.sequence(F.lit(1), F.size(toks) - (width - 1)),
    ).otherwise(F.array().cast("array<int>"))
    win = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(
                F.md5(F.concat_ws(" ", F.slice(toks, i, width))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
    )
    return base.select(
        "doc_id", F.posexplode(win).alias("pos", "h")
    )


def duplicate_spans(corpus: DataFrame, width: int = 8,
                    text_col: str = "content") -> DataFrame:
    """(doc_id, pos, n_occ) — every ``width``-token span whose exact
    token sequence occurs more than once in the corpus (across OR
    within documents): the detection half of exact substring dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL'22 — their suffix-array pass re-expressed as rolling
    window hashing, the shape that distributes).

    One shuffle: a count window over the span hash — no self-join,
    no second pass over the corpus.  Shuffle rows = total token
    count (each token starts at most one window), 16 bytes each.
    """
    from pyspark.sql import Window

    spans = _window_spans(corpus, width, text_col)
    n = F.count("*").over(Window.partitionBy("h"))
    return (
        spans.withColumn("n_occ", n.cast("long"))
        .filter(F.col("n_occ") > 1)
        .select("doc_id", "pos", "n_occ")
    )


def trim_duplicate_spans(corpus: DataFrame, width: int = 8,
                         text_col: str = "content") -> DataFrame:
    """(doc_id, n_tokens, n_removed, text_kept) — the REMOVAL half of
    exact substring dedup (Lee et al. ACL'22 §4: keep one occurrence
    of every duplicated substring, cut the rest): for each duplicated
    ``width``-token window the first occurrence corpus-wide (lowest
    (doc_id, pos)) survives; every other occurrence's token positions
    are cut, overlapping cuts unioned, and the document is rewritten
    from the surviving tokens (token-level rewrite — the output is the
    analyzed token stream re-joined, the unit Lee et al. operate on).

    Plan: ONE window shuffle over the span hash elects winners (same
    key as :func:`duplicate_spans`); loser windows explode to covered
    positions (bounded by dup_spans x width) and anti-join the token
    stream on (doc_id, tpos) — co-keyed, AQE-broadcastable when cuts
    are sparse; reconstruction is one groupBy(doc_id).  No self-join,
    no second corpus pass.
    """
    from pyspark.sql import Window

    spans = _window_spans(corpus, width, text_col)
    wh = Window.partitionBy("h")
    who = Window.partitionBy("h").orderBy("doc_id", "pos")
    losers = (
        spans.withColumn("_n", F.count("*").over(wh))
        .withColumn("_rn", F.row_number().over(who))
        .filter((F.col("_n") > 1) & (F.col("_rn") > 1))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (width - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    toks = corpus.select(
        "doc_id", F.posexplode(tokens_array(text_col)).alias("tpos", "tok")
    )
    kept = toks.join(losers, ["doc_id", "tpos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("_n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_kept"),
    )
    base = corpus.select(
        "doc_id", F.size(tokens_array(text_col)).cast("long").alias("n_tokens")
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce("text_kept", F.lit("")).alias("text_kept"),
    )


def dup_span_stats(corpus: DataFrame, width: int = 8,
                   text_col: str = "content") -> DataFrame:
    """(doc_id, n_tokens, dup_tokens, dup_frac) — per-document share
    of tokens covered by some duplicated ``width``-token span: the
    curation signal ("drop or trim docs that are mostly boilerplate").

    Coverage = distinct token positions under the union of duplicated
    windows (overlaps counted once).  The position explode is bounded
    by ``dup_spans x width`` rows and collapses immediately into a
    per-doc distinct count.
    """
    dup = duplicate_spans(corpus, width, text_col)
    covered = (
        dup.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (width - 1))
            ).alias("tpos"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("tpos").cast("long").alias("dup_tokens"))
    )
    toks = tokens_array(text_col)
    return (
        corpus.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.95,
    kmeans_iters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "kmeans",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embeddings with k-means, compare pairs ONLY within a cluster, and
    drop every row whose cosine to some LOWER-id row of its cluster
    reaches ``threshold`` — the deterministic keep-lowest-id variant
    of the paper's keep-one-per-duplicate-group policy.

    Returns (id, cid, keep) for every input row.

    The 100 TB shape — the paper's exact scaling trick: centroid
    assignment is a narrow JVM expression fold (no shuffle, no
    Python), ONE hash shuffle on ``cid`` co-locates each cluster, and
    the quadratic comparison is confined within clusters, so total
    pair work is O(sum |c_i|^2) with |c_i| ~ N/k — never an all-pairs
    join, nothing driver-side.  Centroid count scales with N to keep
    clusters bounded.  Coarse quantizer
    (ops.ann_index.coarse_centroids — identical machinery to the IVF
    index): ``kmeans`` (default) = k-means|| seeding + Lloyd
    refinement, which keeps cluster sizes balanced on clustered data
    (the O(sum |c_i|^2) bound degrades toward O(N^2) when a seed
    sample lumps the mass into one cell); ``seed`` = the smallest-id
    sample, bitwise-deterministic for SQL-oracle-checked runs."""
    from katta_spark.ops.ann_index import _assign_expr, coarse_centroids

    centroids = coarse_centroids(
        embeddings, int(n_centroids), quantizer=quantizer,
        kmeans_iters=kmeans_iters, vec_col=vec_col, id_col=id_col,
    )
    assigned = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        _assign_expr(F.col(vec_col), centroids).alias("cid"),
    )
    from katta_spark.ops.similarity import _dot, _norm

    a, b = assigned.alias("a"), assigned.alias("b")
    cos = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        _norm(F.col(f"a.{vec_col}")) * _norm(F.col(f"b.{vec_col}"))
    )
    drops = (
        a.join(b, "cid")
        .filter(F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
        .filter(cos >= F.lit(float(threshold)))
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        assigned.join(drops, id_col, "left")
        .select(
            id_col,
            "cid",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


def keep_best_per_cluster(docs: DataFrame, clusters: DataFrame,
                          metric_col: str = "n_chars",
                          id_col: str = "doc_id") -> DataFrame:
    """(doc_id, cluster, metric) — the survivorship rule a real dedup
    pipeline runs AFTER cluster resolution: keep exactly ONE document
    per near-dup cluster, chosen by the highest ``metric_col``
    (longest / best-quality survivor — the common alternative to
    dup_clusters' keep-min-id convention), ties by doc_id asc so the
    choice is deterministic.  Docs in no cluster are singleton
    survivors.

    Scale shape: one left join onto the (small) cluster map, one
    window argmax partitioned by cluster — clusters are tiny, so the
    window never sees skew; nothing touches text."""
    from pyspark.sql import Window

    lab = (
        docs.select(id_col, metric_col)
        .join(clusters, id_col, "left")
        .withColumn("cluster", F.coalesce("cluster", F.col(id_col)))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc(metric_col), F.asc(id_col)
    )
    return (
        lab.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "cluster", metric_col)
    )
