"""Cross-batch streaming dedup via applyInPandasWithState: state
survives between triggered runs through the checkpoint, so a
duplicate arriving in a LATER micro-batch is still dropped."""

from pyspark.sql import functions as F

from katta_spark.streaming import stream_dedup_exact

SCHEMA = "doc_id long, content string"


def _run_once(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        stream_dedup_exact(stream, "content")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_dedup_across_batches(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()

    # batch 1: A, B, and an in-batch duplicate of A
    spark.createDataFrame(
        [(0, "alpha text"), (1, "beta text"), (2, "alpha text")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    _run_once(spark, src, out, ckpt)

    r1 = spark.read.parquet(str(out))
    assert r1.count() == 2  # in-batch dup dropped
    assert sorted(
        r["content"] for r in r1.select("content").collect()
    ) == ["alpha text", "beta text"]

    # batch 2: a cross-batch duplicate of A + a new doc C
    spark.createDataFrame(
        [(3, "alpha text"), (4, "gamma text")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    _run_once(spark, src, out, ckpt)

    r2 = spark.read.parquet(str(out))
    assert r2.count() == 3  # only gamma added; alpha dropped via state
    contents = sorted(r["content"] for r in r2.select("content").collect())
    assert contents == ["alpha text", "beta text", "gamma text"]
    # survivor of alpha is its first occurrence
    alpha = r2.filter(F.col("content") == "alpha text").first()
    assert alpha["doc_id"] == 0


def test_stream_static_blocklist_join(spark, tmp_path):
    """Streaming curation shape: each micro-batch anti-joins a STATIC
    blocklist dimension (broadcast — no stream-side shuffle), and a
    blocklist update between runs applies to later batches only."""
    src = tmp_path / "src2"
    out = tmp_path / "out2"
    ckpt = tmp_path / "ckpt2"
    block = tmp_path / "block"
    src.mkdir()

    spark.createDataFrame([(0,), (99,)], "doc_id long").write.mode(
        "overwrite").parquet(str(block))

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        blk = spark.read.parquet(str(block))
        q = (
            stream.join(F.broadcast(blk), "doc_id", "left_anti")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(0, "blocked"), (1, "kept one")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(str(out)).collect()
    ) == [1]

    # blocklist grows; the already-emitted row 1 stays, new row 2 is
    # filtered by the UPDATED static side
    spark.createDataFrame([(0,), (2,), (99,)], "doc_id long").write.mode(
        "overwrite").parquet(str(block))
    spark.createDataFrame(
        [(2, "now blocked"), (3, "kept two")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(str(out)).collect()
    ) == [1, 3]


def test_stream_dedup_minhash_near_dups(spark, tmp_path):
    """Near-dup streaming dedup: LSH bucket collisions drop docs both
    in-batch and cross-batch; the bucket store survives between runs."""
    from katta_spark.streaming import stream_dedup_minhash

    src = tmp_path / "src3"
    out = tmp_path / "out3"
    store = tmp_path / "store3"
    ckpt = tmp_path / "ckpt3"
    src.mkdir()

    base = (
        "def quick_sort(arr): pivot = arr[0] "
        "left = [x for x in arr if x < pivot] "
        "right = [x for x in arr if x > pivot] "
        "return quick_sort(left) + [pivot] + quick_sort(right)"
    )
    near = base + " return None"  # near-dup: all but ~2 shingles shared
    other = (
        "class LinkedList: push pop head tail size iterate walk node "
        "next prev insert remove clear extend reverse sort merge zip"
    )

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        q = stream_dedup_minhash(
            stream, str(out), str(store), str(ckpt), num_hashes=8, bands=4
        )
        q.awaitTermination(120)

    # batch 1: base, an exact dup (collides in ALL bands), one distinct
    spark.createDataFrame(
        [(0, base), (1, base), (2, other)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    r1 = spark.read.parquet(str(out))
    assert sorted(r["doc_id"] for r in r1.collect()) == [0, 2]

    # batch 2: exact dup of base (cross-batch drop), a fresh doc (kept)
    fresh = "import os sys json re collections functools itertools math"
    spark.createDataFrame(
        [(3, base), (4, fresh)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    r2 = spark.read.parquet(str(out))
    assert sorted(r["doc_id"] for r in r2.collect()) == [0, 2, 4]

    # the near-dup variant collides with base in >=1 band -> dropped
    # cross-batch even though not byte-identical
    from katta_spark.ops.dedup import band_buckets

    bb_pair = band_buckets(
        spark.createDataFrame([(0, base), (5, near)], SCHEMA),
        num_hashes=8,
        bands=4,
    )
    shared = (
        bb_pair.groupBy("band", "bucket")
        .count()
        .filter("count > 1")
        .count()
    )
    assert shared >= 1  # precondition: they really are LSH-near

    spark.createDataFrame([(5, near)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    r3 = spark.read.parquet(str(out))
    assert sorted(r["doc_id"] for r in r3.collect()) == [0, 2, 4]


def test_trending_terms_batch_stream_parity(spark, tmp_path):
    """The identical windowed term-count expression over readStream +
    watermark equals the batch run, and the read-side top-k ranks by
    (cnt desc, term asc) per window."""
    import shutil

    from katta_spark.streaming.trending import (
        top_terms_per_window,
        windowed_term_counts,
    )

    rows = [
        ("2024-01-01 00:05:00", "alpha beta alpha"),
        ("2024-01-01 00:40:00", "alpha gamma"),
        ("2024-01-01 01:10:00", "beta beta delta"),
        ("2024-01-01 01:30:00", "beta alpha"),
    ]
    df = spark.createDataFrame(rows, ["ts", "content"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {
        (str(r["win_start"]), r["term"]): r["cnt"]
        for r in windowed_term_counts(df, duration="1 hour").collect()
    }
    # per_doc=True: doc 1's double 'alpha' counts once
    assert batch[("2024-01-01 00:00:00", "alpha")] == 2
    assert batch[("2024-01-01 01:00:00", "beta")] == 2

    src = tmp_path / "trend_src"
    src.mkdir()
    df.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        windowed_term_counts(stream, duration="1 hour")
        .writeStream.format("memory")
        .queryName("trend_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "trend_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["win_start"]), r["term"]): r["cnt"]
        for r in spark.sql("SELECT * FROM trend_parity").collect()
    }
    assert got == batch

    top = top_terms_per_window(
        windowed_term_counts(df, duration="1 hour"), n=2
    ).collect()
    assert [(str(r["win_start"]), r["term"], r["rank"]) for r in top] == [
        ("2024-01-01 00:00:00", "alpha", 1),
        ("2024-01-01 00:00:00", "beta", 2),
        ("2024-01-01 01:00:00", "beta", 1),
        ("2024-01-01 01:00:00", "alpha", 2),
    ]
