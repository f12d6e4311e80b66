"""Document deletion: tombstones + expunge-at-compaction.

Lucene/Katta semantics reproduced exactly (reference probes:
katta-core/src/test/java/com/ivyft/katta/lucene/IndexDeleteTest.java,
TermDeleteTest.java; segment expunge via the merge manager,
node/LuceneIndexMergeManager.java:154-196):

- ``delete_docs`` writes tombstones; queries exclude tombstoned docs
  IMMEDIATELY, but global stats (N, avgdl, df) keep their pre-delete
  values — just like Lucene's deleted-docs bitset, where scores shift
  only after segments merge.
- ``expunge_deletes`` physically rewrites postings and docs without
  the tombstoned documents and recomputes stats + the term catalog —
  Lucene's forceMergeDeletes.

Tombstones are tiny (doc_id only); queries apply them with a
broadcast anti-join.  WAND is automatically bypassed while tombstones
exist (a pruned heap could retain a deleted doc and exclude a live
one); after expunge the WAND path resumes.
"""

from __future__ import annotations

import json
import shutil
import time
from collections.abc import Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from katta_spark.index import codec
from katta_spark.index.build import (
    _dir_bytes,
    _manifest_dir,
    build_posting_blocks,
    load_manifest,
)

TOMBSTONE_SCHEMA = "doc_id long"


def tombstone_dir(index_dir: str) -> Path:
    return Path(index_dir) / "tombstones"


def delete_docs(spark: SparkSession, index_dir: str,
                doc_ids: list[int] | DataFrame) -> int:
    """Mark documents deleted. Returns the number of tombstones
    written (idempotent — duplicates are fine, queries distinct them)."""
    if isinstance(doc_ids, list):
        df = spark.createDataFrame([(int(d),) for d in doc_ids],
                                   TOMBSTONE_SCHEMA)
    else:
        df = doc_ids.select(F.col("doc_id").cast("long"))
    n = df.count()
    df.write.mode("append").parquet(str(tombstone_dir(index_dir)))
    return n


def delete_by_query(spark: SparkSession, index_dir: str, q: str,
                    fq: list[str] | None = None) -> int:
    """Solr deleteByQuery through the reference's update path
    (CommonsHttpSolrServer.deleteByQuery; Katta exposes it via the
    Solr handler): evaluate the Lucene-syntax query against the
    CURRENT index state and tombstone every match.  Fully
    distributed — the match set flows straight from the query plan
    into the tombstone write, never through the driver.  Returns the
    number of tombstones written."""
    from katta_spark.index.search import PhysicalIndex

    idx = PhysicalIndex(spark, index_dir)
    hits = idx.query_scored(q, fq=fq).select("doc_id")
    return delete_docs(spark, index_dir, hits)


def load_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    d = tombstone_dir(index_dir)
    if not d.exists() or not any(d.glob("*.parquet")):
        return None
    return spark.read.parquet(str(d)).select("doc_id").distinct()


def _decode_rows_kernel(block_range: int, with_pos: bool = False):
    """Posting blocks -> raw (doc_id, dl, term, tf[, poss]) rows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "dl": [], "term": [], "tf": []}
            if with_pos:
                out["poss"] = []
            for row in b.itertuples(index=False):
                ids, tfs, dls = codec.decode_block(
                    row.doc_gaps, row.tfs, row.dls, int(row.block_id),
                    block_range,
                )
                out["doc_id"].extend(ids)
                out["dl"].extend(dls)
                out["term"].extend([row.term] * len(ids))
                out["tf"].extend(tfs)
                if with_pos:
                    import numpy as np

                    lens, flat = codec.decode_positions(
                        row.pos_lens, row.pos_deltas
                    )
                    out["poss"].extend(
                        [p.tolist() for p in
                         np.split(flat, np.cumsum(lens)[:-1])]
                    )
            yield pd.DataFrame(out)

    return kernel


def expunge_deletes(spark: SparkSession, index_dir: str) -> dict:
    """Physically remove tombstoned docs: rewrite docs + postings,
    recompute stats and the term catalog.  The forceMergeDeletes
    analogue; afterwards scores reflect the shrunken corpus."""
    root = Path(index_dir)
    stats = json.loads((root / "stats.json").read_text())
    block_range = int(stats["block_range"])
    tomb = load_tombstones(spark, index_dir)
    if tomb is None:
        return {"expunged": 0}
    n_tomb = tomb.count()
    t0 = time.monotonic()

    # docs: rewrite every commit dir minus tombstones into one commit
    docs = spark.read.option("basePath", str(root / "docs")).parquet(
        str(root / "docs" / "commit=*")
    ).drop("commit", "g")
    live_docs = docs.join(F.broadcast(tomb), "doc_id", "left_anti")
    new_commit = f"expunge{int(stats.get('expunges', 0))}"
    tmp_docs = root / "docs_new" / f"commit={new_commit}"
    # keep the g partition layout uniform across commit dirs (the
    # expunged commit is one resume group)
    live_docs.withColumn("g", F.lit(0).cast("long")).write.mode(
        "overwrite"
    ).partitionBy("g").parquet(str(tmp_docs))
    (tmp_docs / "_commit_meta.json").write_text(
        json.dumps({"n_groups": 1})
    )

    # postings: decode -> anti-join -> rebuild blocks (new avgdl for
    # block-max metadata comes from the live docs)
    n_docs, avgdl = spark.read.parquet(str(tmp_docs)).agg(
        F.count(F.lit(1)), (F.sum("dl") / F.count(F.lit(1))).cast("double")
    ).first()
    avgdl = float(avgdl or 0.0)
    postings = spark.read.option("basePath", str(root / "postings")).parquet(
        str(root / "postings" / "commit=*" / "group=*")
    )
    with_pos = bool(stats.get("positions"))
    pos_cols = ["pos_lens", "pos_deltas"] if with_pos else []
    raw_schema = "doc_id long, dl long, term string, tf long" + (
        ", poss array<long>" if with_pos else ""
    )
    raw = postings.select(
        "term", "block_id", "doc_gaps", "tfs", "dls", *pos_cols
    ).mapInPandas(_decode_rows_kernel(block_range, with_pos), raw_schema)
    live = raw.join(F.broadcast(tomb), "doc_id", "left_anti")
    blocks = build_posting_blocks(live, avgdl, block_range)
    tmp_post = root / "postings_new" / f"commit={new_commit}" / "group=0"
    blocks.write.mode("overwrite").parquet(str(tmp_post))

    # terms catalog from the new blocks
    newp = spark.read.parquet(str(tmp_post))
    terms = newp.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("cf").alias("cf")
    )
    tmp_terms = root / "terms_new"
    terms.repartition(
        max(int(spark.conf.get("spark.sql.shuffle.partitions")) // 4, 1), "term"
    ).sortWithinPartitions("term").write.mode("overwrite").parquet(str(tmp_terms))

    # swap: new dirs in, old dirs + tombstones out, manifest rewritten
    stat = newp.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_postings"),
    ).first()
    # crash-safe swap: old dirs are renamed ASIDE (cheap) before the
    # new ones take their place, and deleted only after every rename
    # landed — a crash mid-swap leaves each of docs/postings/terms
    # present as either the old or the new complete layout (the _old
    # dirs are recovery state, never a half-deleted index)
    aside = []
    for name, new_dir in (
        ("docs", root / "docs_new"),
        ("postings", root / "postings_new"),
        ("terms", tmp_terms),
    ):
        old = root / f"{name}_old"
        shutil.rmtree(old, ignore_errors=True)  # leftover from a crash
        (root / name).rename(old)
        new_dir.rename(root / name)
        aside.append(old)
    for old in aside:
        shutil.rmtree(old)
    shutil.rmtree(tombstone_dir(index_dir))
    mdir = _manifest_dir(index_dir)
    for m in load_manifest(index_dir):
        (mdir / f"{m['commit']}_g{m['group']}.json").unlink(missing_ok=True)
    entry = {
        "commit": new_commit, "group": 0, "status": "done",
        "n_blocks": int(stat["n_blocks"]),
        "n_postings": int(stat["n_postings"]),
        "bytes": _dir_bytes(root / "postings"),
        "n_docs_group": int(n_docs),
        "wall_s": round(time.monotonic() - t0, 3),
        "lineage": {"expunged_tombstones": int(n_tomb)},
    }
    (mdir / f"{new_commit}_g0.json").write_text(json.dumps(entry, indent=1))
    stats.update(
        # the rebuild re-encodes every block, so the bitset sidecar
        # now exists index-wide even if the old layout predated it
        id_bits=True,
        n_docs=int(n_docs), avgdl=avgdl, expunges=int(stats.get("expunges", 0)) + 1,
        commits=[new_commit],
    )
    (root / "stats.json").write_text(json.dumps(stats, indent=1))
    return {"expunged": int(n_tomb), "n_docs": int(n_docs),
            "wall_s": entry["wall_s"]}
