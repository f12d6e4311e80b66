"""Physical index merge: N index directories -> one new index.

The reference ships a standalone merge tool that addIndexes()-merges
Lucene shard directories (katta-core/.../tool/index/
IndexMergeTool.java:97-161, CLI ``MergeIndex``).  Here the merge is a
pure RE-LAYOUT, no posting decode/re-encode: doc ids namespace by a
block-aligned cumulative offset (exactly
:meth:`~katta_spark.index.search.PhysicalIndex.open_many`), so
``block_id`` shifts by column arithmetic while the varint gap buffers
stay byte-valid (first gap is relative to ``block_id * block_range``,
which shifts by the same offset).  Cost = one term-partitioned
shuffle of block ROWS — runs at raw shuffle speed at any index size.

The merged index is a normal single index: one commit, resumable
incremental builds on top, scores identical to an index built over
the union corpus (rank-identity tested).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from katta_spark.index.build import _dir_bytes, _manifest_dir
from katta_spark.index.search import PhysicalIndex

MERGE_COMMIT = "merged0"


def merge_indexes(
    spark: SparkSession,
    index_dirs: list[str] | str,
    out_dir: str,
) -> dict:
    """Merge ``index_dirs`` (list or glob) into a new index at
    ``out_dir``.  Returns a report."""
    t0 = time.monotonic()
    m = PhysicalIndex.open_many(spark, index_dirs)
    root = Path(out_dir)
    root.mkdir(parents=True, exist_ok=True)

    # docs: one merged commit, one resume group
    docs_dir = root / "docs" / f"commit={MERGE_COMMIT}"
    (
        m.docs.drop("commit", "g")
        .withColumn("g", F.lit(0).cast("long"))
        .write.mode("overwrite")
        .partitionBy("g")
        .parquet(str(docs_dir))
    )
    (docs_dir / "_commit_meta.json").write_text(json.dumps({"n_groups": 1}))

    # postings: block_id already namespaced by open_many — re-layout
    # only (term-partitioned, sorted for row-group pruning)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    gdir = root / "postings" / f"commit={MERGE_COMMIT}" / "group=0"
    (
        m.postings.drop("commit", "group")
        .repartition(nparts, "term")
        .sortWithinPartitions("term", "block_id")
        .write.mode("overwrite")
        .parquet(str(gdir))
    )

    # catalog + stats (already merged exactly by open_many)
    m.terms.repartitionByRange(max(nparts // 4, 1), "term") \
        .sortWithinPartitions("term").write.mode("overwrite") \
        .parquet(str(root / "terms"))
    if m.tombstones is not None:
        m.tombstones.write.mode("overwrite").parquet(
            str(root / "tombstones")
        )

    stat = spark.read.parquet(str(gdir)).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_postings"),
    ).first()
    mdir = _manifest_dir(out_dir)
    mdir.mkdir(exist_ok=True)
    entry = {
        "commit": MERGE_COMMIT,
        "group": 0,
        "status": "done",
        "n_blocks": int(stat["n_blocks"]),
        "n_postings": int(stat["n_postings"]),
        "bytes": _dir_bytes(gdir),
        "n_docs_group": int(m.stats["n_docs"]),
        "wall_s": round(time.monotonic() - t0, 3),
        "lineage": {"merged_from": m.index_dir.split(",")},
    }
    tmp = mdir / f".{MERGE_COMMIT}_g0.json.tmp"
    tmp.write_text(json.dumps(entry, indent=1))
    tmp.rename(mdir / f"{MERGE_COMMIT}_g0.json")

    stats = dict(m.stats)
    stats["commits"] = [MERGE_COMMIT]
    stats["built_at_commit"] = MERGE_COMMIT
    (root / "stats.json").write_text(json.dumps(stats, indent=1))
    return {
        "merged_from": entry["lineage"]["merged_from"],
        "n_docs": int(m.stats["n_docs"]),
        "n_blocks": entry["n_blocks"],
        "wall_s": entry["wall_s"],
    }
