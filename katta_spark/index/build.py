"""Distributed index build: corpus -> docs / postings / terms / stats
+ manifest, checkpoint-resumable with per-group lineage and metrics.

Reference parity:
- the build as a whole replaces Katta's MapReduce index build
  (katta-hadoop/.../hadoop/LuceneDocumentOutputFormat.java:51-86,
  LuceneOutputWriter.java:136-305): partition -> analyze -> write
  shard -> done-marker.  Our done-marker is the per-group manifest
  JSON (atomic single-file write), the analogue of ``index.done``
  (LuceneOutputWriter.java:298-303) and of the blck commit rename
  ``data/`` -> ``commit-<id>/`` (lib/writer/DefaultDataWriter.java:314-389).
- incremental commits (``commit=...``) mirror the blck ingest ->
  comm/fsh -> merge loop (protocol/MasterStorageProtocol.java:160-214,
  operation/node/NodeIndexMergeOperation.java:92-165): each commit
  appends new doc_ids and new posting groups; the global term catalog
  is re-aggregated (cheap scan of block rows, no decode).
- doc routing by hash (build groups) mirrors Katta's
  murmur3(rowId) % numPartitions routing
  (lib/writer/DefaultDataWriter.java:171-184).

Skew handling (north_rule): postings are grouped by
(term, block_id = doc_id // BLOCK_RANGE) and the shuffle is
``repartitionByRange("term", "block_id")`` — term-range partitioning
with the doc-range block as the explicit salt, so a term occurring in
every document ("import") is split across ~N/BLOCK_RANGE groups
instead of landing on one reducer.

Scale notes: one pass over the corpus per resume-group, filter pushed
down to the docs parquet; encoding is numpy inside an Arrow-batched
pandas UDF (one call per *block*, vectorized over its postings — no
per-posting Python); the term catalog is an aggregate over block
rows only (never decodes postings).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from katta_spark.corpus import with_ingest_columns
from katta_spark.fulltext.analysis import B, K1
from katta_spark.index import codec
from katta_spark.tokenizer import tokens_array


# fused block encoders: ONE pandas UDF per block row instead of four
# (gaps + 2 varints [+ positions]) — one Arrow round trip through the
# python worker per batch rather than four, measurably faster at high
# core counts where the per-call overhead stops amortizing
@F.pandas_udf(StructType([
    StructField("doc_gaps", BinaryType()),
    StructField("tfs", BinaryType()),
    StructField("dls", BinaryType()),
    StructField("id_bits", BinaryType()),
]))
def _enc_block(doc_ids: pd.Series, block_bases: pd.Series,
               tfs: pd.Series, dls: pd.Series) -> pd.DataFrame:
    out = []
    for ids, base, tf, dl in zip(doc_ids, block_bases, tfs, dls):
        d = np.asarray(ids, dtype=np.int64)
        out.append((
            codec.encode_varint(np.diff(d, prepend=np.int64(base))),
            codec.encode_varint(np.asarray(tf, dtype=np.int64)),
            codec.encode_varint(np.asarray(dl, dtype=np.int64)),
            codec.encode_id_bits(d, int(base)),
        ))
    return pd.DataFrame(out, columns=["doc_gaps", "tfs", "dls", "id_bits"])


@F.pandas_udf(StructType([
    StructField("doc_gaps", BinaryType()),
    StructField("tfs", BinaryType()),
    StructField("dls", BinaryType()),
    StructField("pos_lens", BinaryType()),
    StructField("pos_deltas", BinaryType()),
    StructField("id_bits", BinaryType()),
]))
def _enc_block_pos(doc_ids: pd.Series, block_bases: pd.Series,
                   tfs: pd.Series, dls: pd.Series,
                   plens: pd.Series, pflat: pd.Series) -> pd.DataFrame:
    out = []
    for ids, base, tf, dl, lens, flat in zip(
        doc_ids, block_bases, tfs, dls, plens, pflat
    ):
        d = np.asarray(ids, dtype=np.int64)
        pl, pdlt = codec.encode_positions_flat(
            np.asarray(lens, dtype=np.int64),
            np.asarray(flat, dtype=np.int64),
        )
        out.append((
            codec.encode_varint(np.diff(d, prepend=np.int64(base))),
            codec.encode_varint(np.asarray(tf, dtype=np.int64)),
            codec.encode_varint(np.asarray(dl, dtype=np.int64)),
            pl,
            pdlt,
            codec.encode_id_bits(d, int(base)),
        ))
    return pd.DataFrame(
        out,
        columns=["doc_gaps", "tfs", "dls", "pos_lens", "pos_deltas",
                 "id_bits"],
    )


def _group_expr(n_groups: int, block_range: int):
    """Lineage-group of a doc: block-aligned so every posting block is
    built entirely inside one group (resume unit = whole blocks)."""
    return F.pmod(
        (F.col("doc_id") / F.lit(block_range)).cast("long"), F.lit(n_groups)
    )


def _manifest_dir(index_dir: str) -> Path:
    return Path(index_dir) / "manifest"


def load_manifest(index_dir: str) -> list[dict]:
    d = _manifest_dir(index_dir)
    if not d.exists():
        return []
    return sorted(
        (json.loads(p.read_text()) for p in d.glob("*.json")),
        key=lambda m: (m["commit"], m["group"]),
    )


def _dir_bytes(path: Path) -> int:
    return sum(p.stat().st_size for p in path.rglob("*") if p.is_file())


def build_posting_blocks(tokens_tf: DataFrame, avgdl: float,
                         block_range: int = codec.BLOCK_RANGE,
                         shuffle_partitions: int | None = None) -> DataFrame:
    """(doc_id, dl, term, tf) -> one row per (term, block):
    compressed block columns + block-max metadata.

    max_tf / min_dl (not a precomputed score) are stored so the WAND
    upper bound idf*tfnorm(max_tf, min_dl, avgdl_now) stays valid when
    later commits shift the global avgdl.
    """
    with_pos = "poss" in tokens_tf.columns
    struct_cols = ["doc_id", "tf", "dl"] + (["poss"] if with_pos else [])
    blocks = (
        tokens_tf.withColumn(
            "block_id",
            (F.col("doc_id") / F.lit(block_range)).cast("long"),
        )
        .groupBy("term", "block_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(*struct_cols))
            ).alias("ps"),
            F.count(F.lit(1)).alias("n"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
            F.min("dl").alias("min_dl"),
        )
        .select(
            "term",
            "block_id",
            "n",
            "cf",
            "max_tf",
            "min_dl",
            F.transform(F.col("ps"), lambda x: x["doc_id"]).alias("_ids"),
            F.transform(F.col("ps"), lambda x: x["tf"]).alias("_tfs"),
            F.transform(F.col("ps"), lambda x: x["dl"]).alias("_dls"),
            *(
                [
                    # flatten positions JVM-side: the encode UDF gets
                    # two flat int arrays, never a nested list (the
                    # nested Arrow->pandas conversion was the posting
                    # phase's scaling bottleneck)
                    F.transform(
                        F.col("ps"), lambda x: F.size(x["poss"])
                    ).alias("_plens"),
                    F.flatten(
                        F.transform(F.col("ps"), lambda x: x["poss"])
                    ).alias("_pflat"),
                ]
                if with_pos
                else []
            ),
        )
    )
    meta_cols = ["term", "block_id", "n", "cf", "max_tf", "min_dl"]
    base = F.col("block_id") * F.lit(block_range)
    if with_pos:
        pe = _enc_block_pos(
            "_ids", base, "_tfs", "_dls", "_plens", "_pflat"
        ).alias("_pe")
        enc = blocks.select(*meta_cols, pe).select(
            *meta_cols,
            F.col("_pe.doc_gaps").alias("doc_gaps"),
            F.col("_pe.tfs").alias("tfs"),
            F.col("_pe.dls").alias("dls"),
            F.col("_pe.pos_lens").alias("pos_lens"),
            F.col("_pe.pos_deltas").alias("pos_deltas"),
            F.col("_pe.id_bits").alias("id_bits"),
        )
    else:
        pe = _enc_block("_ids", base, "_tfs", "_dls").alias("_pe")
        enc = blocks.select(*meta_cols, pe).select(
            *meta_cols,
            F.col("_pe.doc_gaps").alias("doc_gaps"),
            F.col("_pe.tfs").alias("tfs"),
            F.col("_pe.dls").alias("dls"),
            F.col("_pe.id_bits").alias("id_bits"),
        )
    # layout shuffle: hash-partition by term (Katta's murmur3 shard
    # routing, lib/writer/DefaultDataWriter.java:171-184), then sort
    # within partitions => row-groups inside every file carry tight
    # term min/max stats, so a query term's scan skips all but its
    # own row groups.  A hash shuffle is chosen over
    # repartitionByRange deliberately: range partitioning inserts a
    # boundary-sampling job that RECOMPUTES the whole upstream
    # tokenize+aggregate pipeline (measured 1.3-2x build cost) —
    # term-skew is already neutralized structurally because the
    # shuffle key is a (term, block) row, never raw postings: a term
    # occurring in every doc contributes only n_docs/block_range
    # block rows (~bounded KBs each).
    nparts = shuffle_partitions or enc.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    return enc.repartition(int(nparts), "term").sortWithinPartitions(
        "term", "block_id"
    )


def tokens_with_tf(docs: DataFrame, text_col: str = "content",
                   positions: bool = False) -> DataFrame:
    """(doc_id, dl, term, tf [, poss]) in ONE pass: dl rides along
    with each exploded token so no separate doc-length join/shuffle
    is needed (reuses a stored ``dl`` column when present to avoid
    tokenizing twice).

    With ``positions``, ``poss`` is the sorted token-position list of
    each (doc, term) — content tokens occupy positions [0, dl);
    field/path terms land past dl, where no analyzed phrase can reach
    them (phrase terms never contain ':').
    """
    if "toks" in docs.columns:
        # stored token arrays: the (expensive) analyzer regex ran
        # exactly once, at docs-write — posting passes just explode.
        # Field-scoped terms (ptoks/ftoks, already "field:"-prefixed)
        # ride in the same term space — Katta's multi-field Lucene
        # schema (data/solr/userindex/conf/schema.xml:112-147)
        # flattened to prefixed terms; dl remains the content length
        # so content scoring is unaffected by field postings.
        arr = F.col("toks")
        for extra in ("ptoks", "ftoks"):
            if extra in docs.columns:
                arr = F.concat(arr, F.col(extra))
        dl = F.col("dl")
    else:
        arr = tokens_array(text_col)
        dl = (
            F.col("dl") if "dl" in docs.columns
            else F.size(tokens_array(text_col)).cast("long")
        )
    if positions:
        toks = docs.select(
            "doc_id", dl.alias("dl"),
            F.posexplode(arr).alias("pos", "term"),
        )
        return toks.groupBy("doc_id", "dl", "term").agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("poss"),
        )
    toks = docs.select("doc_id", dl.alias("dl"), F.explode(arr).alias("term"))
    return toks.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    *,
    text_col: str = "content",
    path_col: str | None = None,
    field_cols: list[str] | None = None,
    field_analyzers: dict[str, str] | None = None,
    stopwords: list[str] | None = None,
    synonyms: dict[str, list[str]] | None = None,
    token_filters: list[str] | None = None,
    store_positions: bool = True,
    n_groups: int = 4,
    commit: str = "c0",
    doc_id_method: str = "rank",
    block_range: int = codec.BLOCK_RANGE,
    fail_after_groups: int | None = None,
) -> dict:
    """Build (or resume, or incrementally extend) the physical index.

    Resume: groups already recorded in the manifest for ``commit`` are
    skipped; a re-run after a mid-build crash completes exactly the
    missing groups (idempotent — group output dirs are overwritten
    whole).  ``fail_after_groups`` injects a crash for the resume test.

    Returns the build report (groups built/skipped, totals).
    """
    root = Path(index_dir)
    root.mkdir(parents=True, exist_ok=True)
    stats_path = root / "stats.json"
    indexed_fields = sorted(
        c for c in (field_cols or []) if c in corpus.columns
    )
    fanalyzers = {
        c: (field_analyzers or {}).get(c, "keyword") for c in indexed_fields
    }
    # analyzer-chain config (schema.xml:306-378 StopFilter/SynonymFilter
    # parity): stopwords are an INDEX-SIDE invariant (they change dl and
    # the stored token arrays, so later commits must inherit them);
    # synonyms are QUERY-TIME config, stored here as the index default
    stopwords = sorted({s.lower() for s in (stopwords or [])})
    synonyms = {
        k.lower(): sorted({s.lower() for s in v})
        for k, v in (synonyms or {}).items()
    }
    # token filters (ASCIIFoldingFilter / EnglishMinimalStemFilter
    # parity) are index-side invariants like stopwords: they change
    # the stored token arrays and dl, so later commits inherit them.
    # Order is fixed: fold (pre-tokenize) -> stop -> stem.
    from katta_spark.tokenizer import TOKEN_FILTERS

    token_filters = list(token_filters or [])
    unknown = set(token_filters) - set(TOKEN_FILTERS)
    if unknown:
        raise ValueError(f"unknown token filters {sorted(unknown)!r}")
    if stats_path.exists():
        # block geometry is an index-wide invariant (decode + group
        # lineage depend on it) — later commits inherit the original;
        # indexed fields + analyzers accumulate across commits
        _prev_stats = json.loads(stats_path.read_text())
        block_range = _prev_stats["block_range"]
        # positions are an index-wide invariant too (mixed commits
        # would leave phrase execution half-blind)
        store_positions = bool(_prev_stats.get("positions", False))
        stopwords = _prev_stats.get("stopwords", [])
        token_filters = _prev_stats.get("token_filters", [])
        synonyms = {**synonyms, **_prev_stats.get("synonyms", {})}
        indexed_fields = sorted(
            set(indexed_fields) | set(_prev_stats.get("indexed_fields", []))
        )
        fanalyzers = {**_prev_stats.get("field_analyzers", {}), **fanalyzers}
    # id_bits: every commit of this index carries the per-block doc-id
    # bitsets (the count fast path needs ALL commits to have them — an
    # incremental commit on a pre-bitset index keeps the flag False
    # until an expunge rebuilds the whole layout)
    has_id_bits = (
        bool(_prev_stats.get("id_bits", False))
        if stats_path.exists() else True
    )
    mdir = _manifest_dir(index_dir)
    mdir.mkdir(exist_ok=True)
    manifest = load_manifest(index_dir)
    done = {(m["commit"], m["group"]) for m in manifest if m["status"] == "done"}

    docs_dir = root / "docs" / f"commit={commit}"
    t0 = time.monotonic()
    if not (docs_dir / "_SUCCESS").exists():
        prev_dirs = [
            p for p in (root / "docs").glob("commit=*")
            if p != docs_dir and (p / "_SUCCESS").exists()
        ] if (root / "docs").exists() else []
        # next-id watermark = max(doc_id)+1, NOT the row count: after
        # expunge the surviving ids are sparse (count < max+1) and a
        # count-based offset would collide new ids with live docs,
        # silently merging two documents' postings
        if prev_dirs:
            _mx = (
                spark.read.option("basePath", str(root / "docs"))
                .parquet(*[str(p) for p in prev_dirs])
                .agg(F.max("doc_id"))
                .first()[0]
            )
            prev_n = int(_mx) + 1 if _mx is not None else 0
        else:
            prev_n = 0
        had_doc_id = "doc_id" in corpus.columns
        docs = with_ingest_columns(
            corpus.withColumn("content", F.col(text_col)) if text_col != "content"
            else corpus,
            doc_id_method=doc_id_method,
        )
        # engine-assigned ids for an incremental commit continue after
        # the existing docs (caller-assigned ids are taken verbatim)
        if prev_n and not had_doc_id:
            docs = docs.withColumn("doc_id", F.col("doc_id") + F.lit(prev_n))
        # analyzer runs ONCE per document, here; every later pass
        # (posting groups, rebuilds, resume) reads the stored arrays
        if "ascii_fold" in token_filters:
            # ASCIIFoldingFilter parity — runs on the TEXT (the
            # identifier regex is ASCII-only, so folding after
            # tokenization would be too late)
            from katta_spark.tokenizer import fold_text_col

            toks_expr = tokens_array(fold_text_col(F.col("content")))
        else:
            toks_expr = tokens_array("content")
        if stopwords:
            # StopFilter: removed BEFORE positions are assigned, so
            # the surviving tokens renumber densely ("a the b" indexes
            # as consecutive [a, b] — a documented deviation from
            # Lucene's position-increment gaps; both dl and BM25 norms
            # see the post-filter length)
            toks_expr = F.filter(
                toks_expr, lambda t: ~t.isin(*stopwords)
            )
        if "stem_plural" in token_filters:
            # EnglishMinimalStemFilter parity — per token, after the
            # StopFilter (the classic Lucene chain order)
            from katta_spark.tokenizer import stem_token_col

            toks_expr = F.transform(toks_expr, stem_token_col)
        docs = docs.withColumn("toks", toks_expr).withColumn(
            "dl", F.size("toks").cast("long")
        )
        if path_col and path_col in docs.columns:
            from katta_spark.tokenizer import path_tokens_array

            docs = docs.withColumn(
                "ptoks",
                F.transform(
                    path_tokens_array(path_col),
                    lambda t: F.concat(F.lit("path:"), t),
                ),
            )
        if indexed_fields:
            # scored field postings, queryable as SCORED field:term
            # clauses — the reference's indexed Solr fields
            # (KattaSearchTest.java:47 queries USER_FOLLOWINGS:0 as a
            # scored term; schema.xml:112-147).  Per-field analyzer
            # registry (the schema.xml:306-378 plug point):
            #   keyword (default) — one "<field>:<lower(value)>" term
            #   code             — the code tokenizer, each sub-token
            #                      emitted as "<field>:<token>"
            #   path             — the path tokenizer, prefixed
            arrs = []
            for c in indexed_fields:
                kind = fanalyzers.get(c, "keyword")
                if kind == "keyword":
                    a = F.array(F.lower(F.col(c).cast("string")))
                elif kind == "code":
                    a = tokens_array(F.col(c).cast("string"))
                elif kind == "path":
                    from katta_spark.tokenizer import path_tokens_array

                    a = path_tokens_array(F.col(c).cast("string"))
                else:
                    raise ValueError(f"unknown analyzer {kind!r} for {c!r}")
                def _prefixed(arr, prefix):
                    # nested helper (not a default-arg lambda): a
                    # two-parameter lambda would be treated as the
                    # (element, index) transform variant
                    return F.transform(
                        arr, lambda t: F.concat(F.lit(prefix), t)
                    )

                arrs.append(_prefixed(a, f"{c}:"))
            docs = docs.withColumn(
                "ftoks",
                F.filter(
                    F.flatten(F.array(*arrs)), lambda x: x.isNotNull()
                ),
            )
        # docs land PARTITIONED BY the lineage group, so each of the
        # n_groups posting passes is a file-pruned read of ~1/n of the
        # commit instead of a full re-scan with a non-pushable derived
        # predicate.  The stored g is valid exactly for the n_groups
        # it was written with — recorded in _commit_meta.json and
        # restored on resume.
        docs = docs.withColumn("g", _group_expr(n_groups, block_range))
        # per-group lineage stats ride the write job (Observation):
        # no separate aggregation job over the freshly written commit
        obs_docs = Observation(f"docs_{commit}")
        gaggs = []
        for gi in range(n_groups):
            cond = F.col("g") == gi
            gaggs.append(
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"n{gi}")
            )
            gaggs.append(
                F.sum(F.when(cond, F.col("dl")).otherwise(0)).alias(f"sdl{gi}")
            )
        docs = docs.observe(obs_docs, *gaggs)
        docs.write.mode("overwrite").partitionBy("g").parquet(str(docs_dir))
        (docs_dir / "_commit_meta.json").write_text(
            json.dumps({"n_groups": n_groups})
        )
    else:
        obs_docs = None
        cm = docs_dir / "_commit_meta.json"
        if cm.exists():
            n_groups = int(json.loads(cm.read_text())["n_groups"])

    docs_commit = spark.read.parquet(str(docs_dir))
    commit_dirs = list((root / "docs").glob("commit=*"))
    if obs_docs is not None:
        m = obs_docs.get
        grp = [
            {"g": gi, "n": int(m[f"n{gi}"] or 0),
             "sdl": int(m[f"sdl{gi}"] or 0)}
            for gi in range(n_groups)
        ]
    else:
        # resume path: the commit was written by an earlier run — one
        # aggregation job recovers the per-group stats
        grp = docs_commit.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")
        ).collect()
    group_docs = {int(r["g"]): int(r["n"]) for r in grp}
    group_sdl = {int(r["g"]): int(r["sdl"] or 0) for r in grp}
    if len(commit_dirs) == 1:
        n_docs = sum(r["n"] for r in grp)
        avgdl = float(sum(r["sdl"] or 0 for r in grp)) / max(n_docs, 1)
    else:
        docs_all = spark.read.option("basePath", str(root / "docs")).parquet(
            str(root / "docs" / "commit=*")
        )
        n_docs, avgdl = docs_all.agg(
            F.count(F.lit(1)), (F.sum("dl") / F.count(F.lit(1))).cast("double")
        ).first()
        avgdl = float(avgdl or 0.0)
    # Adapt the input split size to the pruned group scans: a group's
    # files total ~docs_bytes/n_groups, and the default 128 MB
    # maxPartitionBytes (+4 MB open cost) would coalesce a small
    # group into one or two input tasks, serializing the
    # explode+aggregate stage.  Target = one split per core per
    # group; at warehouse scale per_task exceeds the default and the
    # default applies unchanged.
    nparts_in = int(spark.conf.get("spark.sql.shuffle.partitions"))
    per_task = max(
        1 << 20, _dir_bytes(docs_dir) // max(n_groups, 1) // max(nparts_in, 1)
    )
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(min(per_task, 128 << 20))
    )
    spark.conf.set(
        "spark.sql.files.openCostInBytes",
        str(max(min(per_task // 4, 4 << 20), 64 << 10)),
    )
    built, skipped = [], []
    for g in range(n_groups):
        if (commit, g) in done:
            skipped.append(g)
            continue
        if fail_after_groups is not None and len(built) >= fail_after_groups:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
            spark.conf.set("spark.sql.files.openCostInBytes", old_open)
            raise RuntimeError(f"injected failure after {fail_after_groups} groups")
        g0 = time.monotonic()
        # file-pruned: g is a partition directory of the docs commit
        part = docs_commit.filter(F.col("g") == g)
        tf = tokens_with_tf(part, "content", positions=store_positions)
        blocks = build_posting_blocks(tf, avgdl, block_range)
        gdir = root / "postings" / f"commit={commit}" / f"group={g}"
        # lineage metrics ride on the write job itself (Observation
        # listener) — no per-group read-back job
        obs = Observation(f"build_{commit}_g{g}")
        blocks = blocks.observe(
            obs,
            F.count(F.lit(1)).alias("n_blocks"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_postings"),
        )
        blocks.write.mode("overwrite").parquet(str(gdir))
        stat = obs.get
        n_docs_group = group_docs.get(g, 0)
        entry = {
            "commit": commit,
            "group": g,
            "status": "done",
            "n_blocks": int(stat["n_blocks"]),
            "n_postings": int(stat["n_postings"]),
            "bytes": _dir_bytes(gdir),
            "n_docs_group": int(n_docs_group),
            # sum of dl over the group's docs: snapshot opens
            # (PhysicalIndex(commits=...)) derive exact n_docs/avgdl
            # for any commit subset from the manifest alone, no job
            "sdl_group": int(group_sdl.get(g, 0)),
            "wall_s": round(time.monotonic() - g0, 3),
            "lineage": {
                "input": f"docs/commit={commit}",
                "group_expr": f"(doc_id div {block_range}) % {n_groups} == {g}",
                "avgdl_at_build": avgdl,
            },
        }
        # atomic done-marker: write tmp then rename (the index.done analogue)
        tmp = mdir / f".{commit}_g{g}.json.tmp"
        tmp.write_text(json.dumps(entry, indent=1))
        tmp.rename(mdir / f"{commit}_g{g}.json")
        built.append(g)

    # global term catalog — merged shard dictionaries (north_star);
    # restores the deprecated DocumentFrequencyWritable contract
    # (LuceneServer.java:76-82): exact global df/cf for uniform BM25.
    postings_all = spark.read.option("basePath", str(root / "postings")).parquet(
        str(root / "postings" / "commit=*" / "group=*")
    )
    terms = postings_all.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("cf").alias("cf")
    )
    terms.repartitionByRange(
        max(int(spark.conf.get("spark.sql.shuffle.partitions")) // 4, 1), "term"
    ).sortWithinPartitions("term").write.mode("overwrite").parquet(
        str(root / "terms")
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
    spark.conf.set("spark.sql.files.openCostInBytes", old_open)

    stats = {
        "n_docs": int(n_docs),
        "avgdl": avgdl,
        "k1": K1,
        "b": B,
        "block_range": block_range,
        "indexed_fields": indexed_fields,
        "field_analyzers": fanalyzers,
        "stopwords": stopwords,
        "token_filters": token_filters,
        "synonyms": synonyms,
        "positions": store_positions,
        "id_bits": has_id_bits,
        "commits": sorted({m["commit"] for m in load_manifest(index_dir)}),
        "built_at_commit": commit,
    }
    (root / "stats.json").write_text(json.dumps(stats, indent=1))
    report = {
        "commit": commit,
        "groups_built": built,
        "groups_skipped": skipped,
        "n_docs": int(n_docs),
        "avgdl": avgdl,
        "wall_s": round(time.monotonic() - t0, 3),
        "manifest": load_manifest(index_dir),
    }
    return report
