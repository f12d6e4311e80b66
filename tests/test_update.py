"""Atomic document update (Lucene updateDocument / Solr
add-with-overwrite): tombstone-by-key + fresh commit, composed from
the delete + incremental-build primitives."""

import pytest
from pyspark.sql import functions as F

from katta_spark.corpus import synthetic_corpus
from katta_spark.index import PhysicalIndex, build_index, update_docs


@pytest.fixture()
def upd_dir(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, synthetic_corpus(spark, 300), d,
                n_groups=1, block_range=128)
    return d


def test_update_replaces_matched_docs(spark, upd_dir):
    base = PhysicalIndex(spark, upd_dir)
    victims = (
        base.docs.select("repo", "path", "commit", "lang")
        .orderBy("path").limit(4)
    )
    repl = victims.withColumn(
        "content", F.concat(F.lit("zzupdated marker body for "), F.col("path"))
    )
    report = update_docs(spark, upd_dir, repl, match_col="path")
    assert report["tombstoned"] == 4
    assert report["commit"] == "u0"

    idx = PhysicalIndex(spark, upd_dir)  # reopen: old handle is stale
    # the new versions are searchable, exactly one per updated path
    hits = idx.topk(["zzupdated"], k=10)
    got_paths = sorted(
        r["path"] for r in idx.fetch_details(hits, ["path"]).collect()
    )
    assert got_paths == sorted(r["path"] for r in victims.collect())
    # the old versions are gone: every path still resolves to ONE live doc
    live = idx.docs.join(idx.tombstones, "doc_id", "left_anti")
    dup = live.groupBy("path").count().filter("count > 1").count()
    assert dup == 0
    assert live.count() == 300  # 300 - 4 + 4


def test_update_is_add_for_new_keys(spark, upd_dir):
    repl = spark.createDataFrame(
        [("r9", "brand/new/file.py", "c9", "python",
          "zzbrandnew content only")],
        "repo string, path string, commit string, lang string, content string",
    )
    report = update_docs(spark, upd_dir, repl, match_col="path")
    assert report["tombstoned"] == 0
    idx = PhysicalIndex(spark, upd_dir)
    assert idx.docs.count() == 301
    assert idx.topk(["zzbrandnew"], k=5).count() == 1


def test_update_twice_uses_fresh_commit_names(spark, upd_dir):
    base = PhysicalIndex(spark, upd_dir)
    one = (
        base.docs.select("repo", "path", "commit", "lang")
        .orderBy("path").limit(1)
    )
    r1 = update_docs(spark, upd_dir, one.withColumn(
        "content", F.lit("zzversion two")), match_col="path")
    r2 = update_docs(spark, upd_dir, one.withColumn(
        "content", F.lit("zzversion three")), match_col="path")
    assert r1["commit"] == "u0" and r2["commit"] == "u1"
    idx = PhysicalIndex(spark, upd_dir)
    # only the latest version is live
    assert idx.topk(["zzversion"], k=5).count() == 1
    assert idx.topk(["three"], k=5).count() == 1


def test_update_fields_atomic_set(spark, tmp_path):
    """Solr atomic update: set ONE stored field; text/scores
    untouched, old version tombstoned, corpus size unchanged."""
    from pyspark.sql import functions as F

    from katta_spark.index import PhysicalIndex, build_index
    from katta_spark.index.update import update_fields

    rows = [
        (0, "p0", "parse request value", "python"),
        (1, "p1", "parse merge value", "java"),
        (2, "p2", "merge sorted chunk", "python"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, path string, content string, lang string"
    ).withColumn("repo", F.lit("r")).withColumn("commit", F.lit("c"))
    d = str(tmp_path / "idx_setf")
    build_index(spark, df, d, n_groups=1, block_range=64)
    before = PhysicalIndex(spark, d)
    before_hits = {r["doc_id"] for r in before.topk(["parse"], k=10).collect()}
    assert len(before_hits) == 2

    changes = spark.createDataFrame([("p1", "go")], "path string, lang string")
    rep = update_fields(spark, d, changes, match_col="path")
    assert rep["tombstoned"] == 1

    after = PhysicalIndex(spark, d)
    live = {r["path"]: r["lang"]
            for r in after.docs.join(
                F.broadcast(after.tombstones), "doc_id", "left_anti"
            ).select("path", "lang").collect()} if after.tombstones is not None else {}
    assert live["p1"] == "go" and live["p0"] == "python"
    assert len(live) == 3
    # the indexed text is untouched: 'parse' still matches two docs
    assert after.count(["parse"]).collect()[0]["n_hits"] == 2
