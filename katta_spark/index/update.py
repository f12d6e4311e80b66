"""Atomic document update: Lucene ``updateDocument`` / Solr
add-with-overwrite re-expressed over the commit + tombstone machinery.

The reference updates a document by feeding a new version through the
blck ingest path and letting Lucene's update-by-term replace the old
one (delete-by-term then add, inside IndexWriter).  Here the same two
steps compose the existing primitives:

1. tombstone every LIVE doc whose ``match_col`` value appears in the
   replacement batch (``delete.delete_docs`` — idempotent, append-only);
2. append the replacement batch as a fresh commit
   (``build.build_index(commit=...)`` — ids continue from the
   max-doc_id watermark, so they never collide with live docs).

Ordering note (same contract as Lucene's delete-then-add): the two
steps are not snapshot-atomic — a reader that opens between them sees
neither version of an updated doc.  Doing it add-first is worse: the
old-doc lookup reads the docs directory, which by then would include
the NEW rows (same ``match_col`` values), tombstoning the update
itself.  At production scale both steps are Iceberg snapshot commits
and a reader sees one snapshot or the other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from katta_spark.index.build import build_index, load_manifest
from katta_spark.index.delete import delete_docs


def update_docs(
    spark: SparkSession,
    index_dir: str,
    replacements: DataFrame,
    match_col: str = "path",
    commit: str | None = None,
    **build_kwargs,
) -> dict:
    """Replace every live document whose ``match_col`` matches a row
    of ``replacements`` with that row.  New docs (no live match) are
    plain adds.  Returns the build report + ``tombstoned`` count and
    the chosen ``commit`` name.

    Scale shape: the old-doc lookup is one semi-join of the stored
    docs against the (distinct, usually small -> AQE broadcast)
    replacement key set; the append reuses the incremental-commit
    build path.  Nothing is rewritten in place — both steps are
    append-only, so a crash between them loses no data (the doc is
    deleted; re-running the update restores it)."""
    docs = spark.read.parquet(f"{index_dir}/docs")
    keys = replacements.select(match_col).distinct()
    # no anti-join against existing tombstones: delete_docs is
    # idempotent (duplicates distinct away at read), and reading the
    # tombstone dir inside the plan that APPENDS to it is the classic
    # read-your-own-write hazard
    old = docs.join(keys, match_col, "left_semi").select("doc_id")
    n_tombstoned = delete_docs(spark, index_dir, old)

    if commit is None:
        existing = {m["commit"] for m in load_manifest(index_dir)}
        i = 0
        while f"u{i}" in existing:
            i += 1
        commit = f"u{i}"
    report = build_index(
        spark, replacements, index_dir, commit=commit, **build_kwargs
    )
    report["tombstoned"] = n_tombstoned
    return report


#: engine-derived columns the build recomputes — never copied into a
#: replacement row (doc_id in particular MUST be dropped: the old id
#: is tombstoned, so the new version needs a fresh one)
ENGINE_COLS = ("doc_id", "toks", "dl", "content_sha256", "ptoks", "ftoks")


def update_fields(
    spark: SparkSession,
    index_dir: str,
    changes: DataFrame,
    match_col: str = "path",
    **build_kwargs,
) -> dict:
    """Solr ATOMIC update (``{"id": X, "field": {"set": v}}``): merge
    the given columns over the live documents' stored values, leave
    every other field (including the indexed text) untouched, and
    replace via the delete-then-add path (:func:`update_docs`).

    ``changes`` = one row per key: ``match_col`` + the columns to
    set.  Keys with no live match are ignored (Solr errors there;
    ignoring is the idempotent batch behavior).  Scale shape: one
    broadcast semi-join to pick the live rows, one broadcast join to
    overlay the new values — the stored docs are scanned once."""
    from pyspark.sql import functions as F

    from katta_spark.index.delete import load_tombstones

    set_cols = [c for c in changes.columns if c != match_col]
    if not set_cols:
        raise ValueError("changes must carry at least one column to set")
    docs = spark.read.option(
        "basePath", f"{index_dir}/docs"
    ).parquet(f"{index_dir}/docs/commit=*")
    tomb = load_tombstones(spark, index_dir)
    if tomb is not None:
        docs = docs.join(F.broadcast(tomb), "doc_id", "left_anti")
    keep = [c for c in docs.columns if c not in ENGINE_COLS]
    ren = changes.select(
        match_col, *[F.col(c).alias(f"_set_{c}") for c in set_cols]
    )
    merged = (
        docs.select(*keep)
        .join(F.broadcast(ren), match_col, "inner")
        .select(
            *[
                F.col(f"_set_{c}").alias(c) if c in set_cols else F.col(c)
                for c in keep
            ]
        )
    )
    return update_docs(
        spark, index_dir, merged, match_col=match_col, **build_kwargs
    )
