"""Time-series op tests incl. batch/stream parity of the tumbling
window (same expression, Structured Streaming + watermark)."""

from pyspark.sql import functions as F

from katta_spark.ops import timeseries as TS

SF = "/root/testdata/sf0.001"


def test_date_facet_counts(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    out = TS.date_range_facet(e, "ts", "DAY").collect()
    assert sum(r["cnt"] for r in out) == e.count()
    starts = [r["bucket_start"] for r in out]
    assert starts == sorted(starts)


def test_session_gap_property(spark):
    """Within any session, consecutive gaps < 30 min; across adjacent
    sessions of the same user, gap >= 30 min."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    sessions = TS.session_agg(e, "ts", "user_id").collect()
    assert sum(r["n"] for r in sessions) == e.count()
    rows = (
        e.select("user_id", "ts").orderBy("user_id", "ts").collect()
    )
    # recompute sessions naively and compare counts
    naive = 0
    prev = {}
    for r in rows:
        p = prev.get(r["user_id"])
        if p is None or (r["ts"] - p).total_seconds() >= 1800:
            naive += 1
        prev[r["user_id"]] = r["ts"]
    assert naive == len(sessions)


def test_stream_batch_window_parity(spark, tmp_path):
    """The identical window_agg expression over readStream + watermark
    produces the same windows as the batch run (late-data handling is
    a no-op here since the file source replays in order)."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in TS.window_agg(e, "ts", "1 hour", key_col="event_type").collect()
    }

    import shutil

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    stream = spark.readStream.schema(e.schema).parquet(str(src))
    # watermarks require TIMESTAMP (tz-aware); parquet stores NTZ here
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window(F.col("ts"), "1 hour")["start"].alias("win_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_parity").collect()
    }
    assert got == batch
