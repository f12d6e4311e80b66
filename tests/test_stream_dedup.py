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
