"""Time-series op tests incl. batch/stream parity of the tumbling
window (same expression, Structured Streaming + watermark)."""

import pytest
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


def test_date_math_parse_and_python_parity(spark):
    """Solr date-math grammar: floors + signed calendar arithmetic,
    python-datetime mirror for day/hour/minute units."""
    from datetime import datetime, timedelta

    from katta_spark.ops.timeseries import date_math_col, parse_date_math

    now = datetime(2024, 1, 25, 13, 47, 33)
    day0 = now.replace(hour=0, minute=0, second=0, microsecond=0)
    cases = {
        "NOW": now,
        "NOW/DAY": day0,
        "NOW-7DAYS": now - timedelta(days=7),
        "NOW/DAY-7DAYS": day0 - timedelta(days=7),
        "NOW/HOUR+90MINUTES": now.replace(minute=0, second=0)
        + timedelta(minutes=90),
        "NOW/MINUTE-30SECONDS": now.replace(second=0)
        - timedelta(seconds=30),
        "NOW+1DAYS/DAY": day0 + timedelta(days=1),
    }
    from pyspark.sql import functions as F

    cols = [
        date_math_col(
            F.to_timestamp(F.lit("2024-01-25 13:47:33")), e
        ).alias(f"c{i}")
        for i, e in enumerate(cases)
    ]
    row = spark.range(1).select(*cols).first()
    for i, (expr, want) in enumerate(cases.items()):
        assert row[f"c{i}"] == want, expr
    # month arithmetic clamps like SQL engines
    assert parse_date_math("NOW-1MONTH") == [("add", -1, "month")]
    import pytest as _pytest

    for bad in ("TODAY", "NOW//DAY", "NOW-DAYS", "NOW-3FORTNIGHTS"):
        with _pytest.raises(ValueError):
            parse_date_math(bad)


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data eviction: an event arriving after its window's
    watermark has passed is DROPPED (never re-emitted, never merged)
    — the Structured Streaming contract a 100 TB ingest relies on to
    bound window state.  Two micro-batch phases over one checkpoint:
    the watermark survives the restart and evicts the straggler."""
    from datetime import datetime

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "ts timestamp, v double"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    def run_phase():
        stream = (
            spark.readStream.schema(schema)
            .option("latestFirst", "false")
            .parquet(str(src) + "/*")
        )
        # append mode needs the event-time window STRUCT in the
        # grouping (extracting ["start"] pre-agg hides the event-time
        # column from the watermark checker)
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window")["start"].alias("win_start"), "n")
        )
        # parquet sink: the memory sink cannot recover from a
        # checkpoint, and checkpoint recovery IS what carries the
        # watermark across the restart
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", ckpt).start()
        )
        q.awaitTermination(120)
        return {
            r["win_start"]: r["n"]
            for r in spark.read.parquet(out).collect()
        }

    t = lambda h, m: datetime(2024, 3, 1, h, m)
    # phase 1: two events in the 10:00 window, one at 12:30 that
    # advances the watermark to 12:30 -> the 10:00 window closes
    write_file("a", [(t(10, 5), 1.0), (t(10, 10), 1.0), (t(12, 30), 1.0)])
    p1 = run_phase()
    assert p1 == {t(10, 0): 2}

    # phase 2 (same checkpoint): a straggler for the CLOSED 10:00
    # window plus a fresh 13:40 event that closes the 12:00 window.
    # The sink is cumulative across phases; the straggler is evicted:
    # 12:00 lands with n=1 (straggler not merged there either) and
    # 10:00 never re-emits or updates past n=2.
    write_file("b", [(t(10, 20), 1.0), (t(13, 40), 1.0)])
    p2 = run_phase()
    assert p2 == {t(10, 0): 2, t(12, 0): 1}


def test_sliding_window_covers_each_event_twice(spark):
    """width=2h, hop=1h: every event falls in exactly 2 windows, and
    each sliding window's count equals the sum of its two tumbling
    1-hour sub-buckets."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    slid = TS.sliding_window_agg(e, "ts", "2 hours", "1 hour").collect()
    assert sum(r["n"] for r in slid) == 2 * e.count()
    tumb = {
        r["win_start"]: r["n"]
        for r in TS.window_agg(e, "ts", "1 hour").collect()
    }
    from datetime import timedelta

    for r in slid:
        want = tumb.get(r["win_start"], 0) + tumb.get(
            r["win_start"] + timedelta(hours=1), 0
        )
        assert r["n"] == want


def test_gap_fill_locf_matches_naive(spark):
    """Every grid value equals the average observation at the latest
    event time at-or-before the grid point; grid is a regular
    12-hour lattice from each key's first to last event."""
    from collections import defaultdict
    from datetime import timedelta

    e = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("user_id") < 3
    )
    got = TS.gap_fill(e, "ts", "user_id", "value", step="12 hours").collect()
    obs = defaultdict(list)
    for r in e.select("user_id", "ts", "value").collect():
        obs[r["user_id"]].append((r["ts"], r["value"]))
    per_key = defaultdict(list)
    for r in got:
        per_key[r["user_id"]].append(r)
    for uid, rows in per_key.items():
        evs = sorted(obs[uid])
        lo, hi = evs[0][0], evs[-1][0]
        # regular lattice anchored at the first event
        assert rows[0]["grid_ts"] == lo
        assert all(
            b["grid_ts"] - a["grid_ts"] == timedelta(hours=12)
            for a, b in zip(rows, rows[1:])
        )
        assert rows[-1]["grid_ts"] <= hi
        assert hi - rows[-1]["grid_ts"] < timedelta(hours=12)
        for r in rows:
            past = [t for t, _ in evs if t <= r["grid_ts"]]
            t_last = max(past)
            vals = [v for t, v in evs if t == t_last]
            assert r["value"] == round(sum(vals) / len(vals), 6)


def test_window_top_keys_matches_naive(spark):
    from collections import Counter, defaultdict

    e = spark.read.parquet(f"{SF}/events.parquet")
    got = TS.window_top_keys(e, "ts", "1 day", "event_type", k=2).collect()
    per = defaultdict(Counter)
    for r in e.select("ts", "event_type").collect():
        per[r["ts"].strftime("%Y-%m-%d")][r["event_type"]] += 1
    want = []
    for day in sorted(per):
        top = sorted(per[day].items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for rank, (k_, n) in enumerate(top, 1):
            want.append((day, k_, n, rank))
    assert [
        (r["win_start"].strftime("%Y-%m-%d"), r["event_type"], r["n"],
         r["rank"])
        for r in got
    ] == want


def test_asof_join_matches_naive(spark):
    """Every click carries the latest purchase value at-or-before it
    per user (inclusive at equal timestamps); clicks before any
    purchase stay NULL."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    out = {
        r["event_id"]: r["asof_value"]
        for r in TS.asof_join(
            e.filter(F.col("event_type") == "click"),
            e.filter(F.col("event_type") == "purchase"),
            "ts", "user_id", "value",
        ).collect()
    }
    clicks = e.filter(F.col("event_type") == "click").collect()
    purch = {}
    for r in e.filter(F.col("event_type") == "purchase").collect():
        purch.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
    assert len(out) == len(clicks)
    for c in clicks:
        cands = [
            (t, v) for (t, v) in purch.get(c["user_id"], [])
            if t <= c["ts"]
        ]
        if not cands:
            assert out[c["event_id"]] is None
        else:
            best_t = max(t for t, _ in cands)
            vals = [v for t, v in cands if t == best_t]
            assert abs(out[c["event_id"]] - sum(vals) / len(vals)) < 1e-9


def test_asof_join_preserves_left_columns_and_count(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    left = e.filter(F.col("event_type") == "view")
    out = TS.asof_join(
        left, e.filter(F.col("event_type") == "signup"),
        "ts", "user_id", "value", out_col="last_signup_value",
    )
    assert set(left.columns) | {"last_signup_value"} == set(out.columns)
    assert out.count() == left.count()


def test_zscore_matches_python(spark):
    import statistics

    e = spark.read.parquet(f"{SF}/events.parquet")
    got = {r["event_id"]: r["z"]
           for r in TS.zscore(e, "event_type", "value").collect()}
    rows = e.select("event_id", "event_type", "value").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for r in rows:
        vs = by_type[r["event_type"]]
        mu = round(sum(vs) / len(vs), 6)
        sd = round(statistics.stdev(vs), 6)
        want = round((r["value"] - mu) / sd, 6) if sd > 0 else None
        assert got[r["event_id"]] == pytest.approx(want, abs=2e-6)


def test_running_agg_is_cumulative(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    out = TS.running_agg(e, "ts", "user_id", "value",
                         order_cols=["event_id"]).collect()
    per_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        acc, n = per_user.get(r["user_id"], (0.0, 0))
        acc, n = acc + r["value"], n + 1
        per_user[r["user_id"]] = (acc, n)
        assert r["run_n"] == n
        assert r["run_sum"] == pytest.approx(round(acc, 6), abs=2e-6)


def test_percentiles_match_python(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    got = {r["event_type"]: (r["n"], r["p5"], r["p95"])
           for r in TS.percentiles(e, "event_type", "value",
                                   probs=(0.5, 0.95)).collect()}
    rows = e.select("event_type", "value").collect()
    by = {}
    for r in rows:
        by.setdefault(r["event_type"], []).append(r["value"])

    def q(vs, p):
        vs = sorted(vs)
        pos = p * (len(vs) - 1)
        lo, f = int(pos), pos - int(pos)
        hi = min(lo + 1, len(vs) - 1)
        return round(vs[lo] + f * (vs[hi] - vs[lo]), 6)

    for k, vs in by.items():
        n, p50, p95 = got[k]
        assert n == len(vs)
        assert p50 == pytest.approx(q(vs, 0.5), abs=2e-6)
        assert p95 == pytest.approx(q(vs, 0.95), abs=2e-6)


def test_asof_join_plan_single_shuffle_no_range_join(spark):
    """The AS-OF plan is union + per-key window: exactly one exchange
    on the key for the window (plus the right side's pre-aggregation
    exchange on the same key), and NEVER a cartesian/broadcast range
    join that would blow up at scale."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    out = TS.asof_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
        "ts", "user_id", "value",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("hashpartitioning(user_id") >= 1
    assert "Window" in plan


def test_zscore_plan_broadcasts_moments(spark):
    """Group moments come back as a BROADCAST hash join — the event
    stream is never shuffled for the z computation."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    plan = (
        TS.zscore(e, "event_type", "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stream_batch_session_parity(spark, tmp_path):
    """The identical session_window expression over readStream +
    watermark produces the same sessions as the batch run — Spark's
    native stateful sessionization, exercised in BOTH modes."""
    import shutil

    e = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r["user_id"], r["session_start"]): r["n"]
        for r in TS.session_agg(e, "ts", "user_id",
                                gap="30 minutes").collect()
    }
    src = tmp_path / "ev_sess"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    stream = spark.readStream.schema(e.schema).parquet(str(src))
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), "30 minutes"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("session_window")["start"].alias("session_start"),
            "n",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): r["n"]
        for r in spark.sql("SELECT * FROM sess_parity").collect()
    }
    assert got == batch and batch


def test_asof_join_tie_and_dup_semantics(spark):
    """Crafted edges: (a) right row at EXACTLY the left ts is taken
    (at-or-before is inclusive); (b) multiple right rows at one
    (key, ts) are averaged before the carry; (c) a later right row is
    invisible."""
    import datetime as dt

    t = lambda m: dt.datetime(2026, 1, 1, 12, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 10, t(5)), (2, 10, t(2)), (3, 20, t(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, t(5), 4.0), (10, t(5), 6.0), (10, t(3), 1.0),
         (20, t(10), 99.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {r["event_id"]: r["asof_value"]
           for r in TS.asof_join(left, right, "ts", "user_id",
                                 "value").collect()}
    assert got[1] == pytest.approx(5.0)   # tie at t5: avg(4,6), not t3
    assert got[2] is None                 # t2 precedes every right row
    assert got[3] is None                 # t10 is in the future


def test_distinct_cardinality_and_top_hits_match_python(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    rows = e.select("event_id", "event_type", "user_id", "value").collect()
    by = {}
    for r in rows:
        by.setdefault(r["event_type"], []).append(r)
    card = {r["event_type"]: (r["n_events"], r["n_distinct"])
            for r in TS.distinct_cardinality(e, "event_type",
                                             "user_id").collect()}
    for t, rs in by.items():
        assert card[t] == (len(rs), len({x["user_id"] for x in rs}))
    hits = {}
    for r in TS.top_hits(e, "event_type", 2, "value", "event_id").collect():
        hits.setdefault(r["event_type"], []).append(
            (r["rank"], r["event_id"])
        )
    for t, rs in by.items():
        want = sorted(rs, key=lambda x: (-x["value"], x["event_id"]))[:2]
        assert hits[t] == [(i + 1, w["event_id"]) for i, w in enumerate(want)]


def test_asof_join_property_fuzz(spark):
    """Property fuzz (deterministic cases): random-ish event streams
    derived from index arithmetic — AS-OF output always equals the
    python mirror (inclusive ties, averaged duplicates, null before
    first right row)."""
    import datetime as dt

    rows_l, rows_r = [], []
    for i in range(300):
        u = i % 7
        tl = dt.datetime(2026, 2, 1) + dt.timedelta(minutes=(i * 37) % 997)
        rows_l.append((i, u, tl))
        if i % 3 == 0:
            tr = dt.datetime(2026, 2, 1) + dt.timedelta(
                minutes=(i * 53) % 997
            )
            rows_r.append((u, tr, float((i * 11) % 29)))
            if i % 9 == 0:  # duplicate (key, ts) on the right
                rows_r.append((u, tr, float((i * 13) % 31)))
    left = spark.createDataFrame(
        rows_l, "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        rows_r, "user_id long, ts timestamp, value double"
    )
    got = {r["event_id"]: r["asof_value"]
           for r in TS.asof_join(left, right, "ts", "user_id",
                                 "value").collect()}
    per = {}
    for u, t, v in rows_r:
        per.setdefault(u, {}).setdefault(t, []).append(v)
    for i, u, tl in rows_l:
        cands = [t for t in per.get(u, {}) if t <= tl]
        if not cands:
            assert got[i] is None, i
        else:
            vs = per[u][max(cands)]
            assert got[i] == pytest.approx(sum(vs) / len(vs), abs=1e-9), i


def test_rate_matches_python(spark):
    """Per-key delta/rate vs a python mirror; first event per key has
    NULL delta and rate; zero-elapsed pairs yield NULL rate."""
    from katta_spark.ops.timeseries import rate

    events_df = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        r["event_id"]: (r["delta"], r["rate_per_s"])
        for r in rate(events_df, "ts", "user_id", "value",
                      order_cols=["event_id"]).collect()
    }
    rows = sorted(
        events_df.collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    prev = {}
    n_null = n_val = 0
    for r in rows:
        k = r["user_id"]
        if k not in prev:
            want = (None, None)
            n_null += 1
        else:
            pv, pt = prev[k]
            d = round(r["value"] - pv, 6)
            el = (r["ts"] - pt).total_seconds()
            want = (d, round((r["value"] - pv) / el, 6) if el > 0 else None)
            n_val += 1
        g = got[r["event_id"]]
        assert g[0] == (want[0] if want[0] is not None else None)
        if want[1] is None:
            assert g[1] is None
        else:
            assert g[1] == pytest.approx(want[1], abs=1e-6)
        prev[k] = (r["value"], r["ts"])
    assert n_null > 0 and n_val > 0


def test_ohlc_bars_match_python(spark):
    """OHLC bars vs a naive python mirror: open/close picked by
    (ts, event_id) order, high/low are extrema, per (hour, type)."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        (r["win_start"], r["event_type"]):
            (r["n"], r["open"], r["high"], r["low"], r["close"])
        for r in TS.ohlc_bars(e, "ts", "1 hour", key_col="event_type",
                              id_col="event_id").collect()
    }
    rows = e.select("ts", "event_type", "value", "event_id").collect()
    buckets: dict = {}
    for r in rows:
        win = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets.setdefault((win, r["event_type"]), []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    assert len(got) == len(buckets)
    for key, evs in buckets.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        want = (len(evs), round(evs[0][2], 6), round(max(vals), 6),
                round(min(vals), 6), round(evs[-1][2], 6))
        assert got[key] == want
    # duplicate-timestamp determinism: id breaks the tie
    dup = spark.createDataFrame(
        [(0, "2024-01-01 00:00:01", 5.0), (1, "2024-01-01 00:00:01", 9.0),
         (2, "2024-01-01 00:30:00", 7.0)],
        "event_id long, ts_s string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_id", "value")
    row = TS.ohlc_bars(dup, "ts", "1 hour", id_col="event_id").collect()[0]
    assert (row["open"], row["close"]) == (5.0, 7.0)


def test_group_corr_matches_python(spark):
    """Six-moment Pearson corr vs python's statistics.correlation,
    plus NULL on zero variance."""
    import statistics

    e = TS.json_props(spark.read.parquet(f"{SF}/events.parquet"),
                      "props", "k")
    got = {r["event_type"]: (r["n"], r["corr"])
           for r in TS.group_corr(e, "event_type", "value",
                                  "prop_k").collect()}
    rows = e.select("event_type", "value", "prop_k").collect()
    groups: dict = {}
    for r in rows:
        if r["value"] is not None and r["prop_k"] is not None:
            groups.setdefault(r["event_type"], []).append(
                (r["value"], float(r["prop_k"]))
            )
    assert set(got) == set(groups)
    for g, pairs in groups.items():
        xs, ys = [p[0] for p in pairs], [p[1] for p in pairs]
        want = statistics.correlation(xs, ys)
        n, c = got[g]
        assert n == len(pairs)
        assert c == pytest.approx(want, abs=1e-4)
    # zero-variance group -> NULL
    flat = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 1.0, 3.0), ("b", 1.0, 2.0), ("b", 2.0, 4.0)],
        "g string, x double, y double",
    )
    out = {r["g"]: r["corr"]
           for r in TS.group_corr(flat, "g", "x", "y").collect()}
    assert out["a"] is None and out["b"] == pytest.approx(1.0)


def test_ewma_matches_naive_recurrence(spark):
    """pandas ewm(adjust=False) must equal the double recurrence
    y = (1-a)y + ax exactly — the property the recursive-CTE oracle
    relies on."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}",
             int(i % 3), float(v))
            for i, v in enumerate(rng.normal(50, 20, 120))]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "value")
    got = {r["event_id"]: r["ewma"]
           for r in TS.ewma(df, "ts", "user_id", "value", alpha=0.3,
                            order_cols=["event_id"]).collect()}
    a = 0.3
    state: dict[int, float] = {}
    for i, _, u, v in rows:
        y = v if u not in state else (1 - a) * state[u] + a * v
        state[u] = y
        assert got[i] == round(y, 6) + 0.0, i


def test_counter_rate_reset_semantics(spark):
    """PromQL reset rule: decreases restart the counter (increase =
    new value); monotone segments behave like plain rate."""
    rows = [
        (0, "2024-01-01 00:00:00", 1, 10.0),
        (1, "2024-01-01 00:00:10", 1, 25.0),   # +15 over 10s
        (2, "2024-01-01 00:00:20", 1, 3.0),    # reset -> increase 3
        (3, "2024-01-01 00:00:30", 1, 3.0),    # +0
        (4, "2024-01-01 00:00:05", 2, 7.0),    # other key, first
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "value")
    got = {r["event_id"]: (r["increase"], r["rate_per_s"])
           for r in TS.counter_rate(df, "ts", "user_id", "value",
                                    order_cols=["event_id"]).collect()}
    assert got[0] == (None, None)
    assert got[1] == (15.0, 1.5)
    assert got[2] == (3.0, 0.3)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (None, None)


def test_mad_matches_python(spark):
    """Median/MAD agree with a numpy mirror (linear interpolation)."""
    import numpy as np

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 100]] + \
           [("b", float(v)) for v in [10, 10, 10]]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r["event_type"]: (r["n"], r["med"], r["mad"])
           for r in TS.mad(df, "event_type", "value").collect()}
    for k, vals in [("a", [1, 2, 3, 4, 100]), ("b", [10, 10, 10])]:
        m = float(np.percentile(vals, 50))
        d = float(np.percentile(np.abs(np.array(vals) - m), 50))
        assert got[k] == (len(vals), round(m, 6), round(d, 6))


def test_funnel_requires_step_order(spark):
    """A user who clicks BEFORE ever viewing does not reach the click
    step; equality timestamps count (at-or-after)."""
    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),     # reaches both
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 09:30:00", "view"),      # click before view
        (3, "2024-01-01 08:00:00", "view"),
        (3, "2024-01-01 08:00:00", "click"),     # same instant: counts
        (4, "2024-01-01 07:00:00", "click"),     # never viewed
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_type")
    got = [(r["step"], r["n_keys"])
           for r in TS.funnel(df, "ts", "user_id", "event_type",
                              ["view", "click"]).collect()]
    assert got == [("view", 3), ("click", 2)]


def test_retention_cohorts_by_first_week(spark):
    """Users cohort at their first event's week; activity in later
    weeks increments that cohort's row for the week offset."""
    rows = [
        (1, "2024-01-01 10:00:00"),   # Mon wk0
        (1, "2024-01-10 10:00:00"),   # wk1
        (1, "2024-01-16 10:00:00"),   # wk2
        (2, "2024-01-03 10:00:00"),   # wk0 cohort, active wk0 only
        (3, "2024-01-08 10:00:00"),   # cohort wk of Jan 8
        (3, "2024-01-09 10:00:00"),   # same week — distinct'd
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = {(str(r["cohort"])[:10], r["period_n"]): r["n_active"]
           for r in TS.retention(df, "ts", "user_id").collect()}
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_auto_histogram_picks_smallest_fitting_interval(spark):
    """Span of ~100 minutes with target 20 -> 10-minute buckets
    (600 s); every event lands in an aligned bucket; total preserved."""
    rows = [(i, f"2024-01-01 10:{i:02d}:00") for i in range(0, 50)] + \
           [(99, "2024-01-01 11:40:00")]
    df = spark.createDataFrame(rows, "event_id long, ts_s string").select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = TS.auto_date_histogram(df, "ts", target_buckets=20).collect()
    assert all(r["interval_s"] == 600 for r in out)
    assert sum(r["n"] for r in out) == 51
    assert len(out) <= 20
    assert all(r["bucket_start"].minute % 10 == 0 for r in out)


def test_bucket_pipeline_hand_computed(spark):
    """ES pipeline aggs over a 3-bucket histogram: cumulative_sum,
    derivative (NULL on the first bucket), bucket_script ratio —
    hand-computed expectations."""
    rows = [
        ("2024-01-01 00:10:00", 1.0),
        ("2024-01-01 05:00:00", 2.0),
        ("2024-01-02 01:00:00", 10.0),
        ("2024-01-04 12:00:00", 3.0),
        ("2024-01-04 13:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = TS.bucket_pipeline(df, "ts", "1 day", "value").collect()
    assert [r["bucket_sum"] for r in out] == [3.0, 10.0, 8.0]
    assert [r["n"] for r in out] == [2, 1, 2]
    assert [r["cum_sum"] for r in out] == [3.0, 13.0, 21.0]
    assert [r["deriv"] for r in out] == [None, 7.0, -2.0]
    assert [r["avg_per_doc"] for r in out] == [1.5, 10.0, 4.0]


def test_bucket_pipeline_keyed_partitions_independent(spark):
    """With key_col the pipeline restarts per key — derivative and
    cum_sum never leak across keys."""
    rows = [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2024-01-02 00:00:00", 4.0),
        ("b", "2024-01-02 00:00:00", 9.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = TS.bucket_pipeline(df, "ts", "1 day", "value",
                             key_col="k").collect()
    by = {(r["k"], str(r["bucket_start"])): r for r in out}
    assert by[("b", "2024-01-02 00:00:00")]["deriv"] is None
    assert by[("b", "2024-01-02 00:00:00")]["cum_sum"] == 9.0
    assert by[("a", "2024-01-02 00:00:00")]["deriv"] == 3.0


def test_boxplot_matches_numpy_quantiles(spark):
    import numpy as np

    e = spark.read.parquet(f"{SF}/events.parquet")
    out = {r["event_type"]: r
           for r in TS.boxplot(e, "event_type", "value").collect()}
    vals = {}
    for r in e.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for et, v in vals.items():
        a = np.array(v)
        assert out[et]["n"] == len(v)
        assert out[et]["vmin"] == a.min()
        assert out[et]["vmax"] == a.max()
        for col, p in (("q1", 25), ("q2", 50), ("q3", 75)):
            assert abs(out[et][col]
                       - round(float(np.percentile(a, p)), 6)) < 1e-9


def test_t_test_matches_welch_mirror(spark):
    import math

    e = spark.read.parquet(f"{SF}/events.parquet")
    row = TS.t_test(e, "event_type", "click", "view",
                    "value").collect()[0]
    va = [r["value"] for r in
          e.filter(F.col("event_type") == "click").collect()]
    vb = [r["value"] for r in
          e.filter(F.col("event_type") == "view").collect()]

    def moments(v):
        sa, saa = round(sum(v), 6), round(sum(x * x for x in v), 6)
        n = len(v)
        m = sa / n
        return n, m, (saa - n * m * m) / (n - 1)

    na, ma, s2a = moments(va)
    nb, mb, s2b = moments(vb)
    t = (ma - mb) / math.sqrt(s2a / na + s2b / nb)
    assert row["n_a"] == na and row["n_b"] == nb
    assert abs(row["mean_a"] - round(ma, 6)) < 1e-9
    assert abs(row["t_stat"] - round(t, 6)) < 1e-9


def test_extended_stats_matches_python(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    out = {r["event_type"]: r
           for r in TS.extended_stats(e, "event_type", "value",
                                      sigma=2.0).collect()}
    vals = {}
    for r in e.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    import math
    for et, v in vals.items():
        n = len(v)
        s, ss = round(sum(v), 6), round(sum(x * x for x in v), 6)
        mean = s / n
        var = ss / n - mean * mean
        r = out[et]
        assert r["n"] == n and r["vmin"] == min(v) and r["vmax"] == max(v)
        assert abs(r["avg"] - round(mean, 6)) < 1e-9
        assert abs(r["variance"] - round(var, 6)) < 1e-9
        assert abs(r["std_upper"]
                   - round(mean + 2.0 * math.sqrt(var), 6)) < 1e-9


def test_value_histogram_emits_empty_buckets(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (55.0,)], ["value"])
    out = [(r["bucket"], r["n"])
           for r in TS.value_histogram(df, "value", 10.0).collect()]
    assert out == [(0.0, 2), (10.0, 0), (20.0, 0), (30.0, 0),
                   (40.0, 0), (50.0, 1)]


def test_normalize_buckets_hand_computed(spark):
    rows = [("2024-01-01 01:00:00", 1.0),
            ("2024-01-02 01:00:00", 3.0),
            ("2024-01-03 01:00:00", 4.0)]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = TS.normalize_buckets(df, "ts", "1 day", "value").collect()
    assert [r["pct_of_sum"] for r in out] == [12.5, 37.5, 50.0]
    assert [r["rescaled"] for r in out] == [0.0, 0.666667, 1.0]


def test_change_point_finds_the_level_shift(spark):
    """Flat at 10 for 4 days, then flat at 50: the split lands on the
    first high bucket with exact means."""
    rows = []
    for d in range(1, 5):
        rows.append((f"2024-01-0{d} 06:00:00", 10.0))
    for d in range(5, 9):
        rows.append((f"2024-01-0{d} 06:00:00", 50.0))
    df = spark.createDataFrame(rows, ["ts", "value"])
    r = TS.change_point(df, "ts", "1 day", "value").collect()[0]
    assert str(r["bucket_start"]).startswith("2024-01-05")
    assert r["before_mean"] == 10.0 and r["after_mean"] == 50.0
    assert r["delta"] == 40.0


def test_weighted_avg_hand_computed(spark):
    rows = [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0),
            ("b", None, 9.0), ("b", 7.0, None)]
    df = spark.createDataFrame(rows, ["k", "value", "w"])
    out = {r["k"]: r for r in
           TS.weighted_avg(df, "k", "value", "w").collect()}
    # a: (10*1 + 20*3) / 4 = 17.5 ; b: only the complete row counts
    assert out["a"]["n"] == 2 and out["a"]["wavg"] == 17.5
    assert out["b"]["n"] == 1 and out["b"]["wavg"] == 5.0


def test_serial_diff_lags_by_n_buckets(spark):
    rows = [(f"2024-01-0{d} 01:00:00", float(d)) for d in range(1, 8)]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = TS.serial_diff(df, "ts", "1 day", "value", lag=3).collect()
    assert [r["sdiff"] for r in out] == [None, None, None,
                                         3.0, 3.0, 3.0, 3.0]


def test_cumulative_cardinality_counts_first_seen(spark):
    rows = [("2024-01-01 01:00:00", 1), ("2024-01-01 02:00:00", 2),
            ("2024-01-02 01:00:00", 1),   # repeat: not new
            ("2024-01-03 01:00:00", 3), ("2024-01-03 02:00:00", 1)]
    df = spark.createDataFrame(rows, ["ts", "user_id"])
    out = TS.cumulative_cardinality(df, "ts", "1 day",
                                    "user_id").collect()
    assert [(r["new_keys"], r["cum_distinct"]) for r in out] == [
        (2, 2), (0, 2), (1, 3)
    ]


def test_bucket_pipeline_plan_window_over_agg_only(spark):
    """The pipeline window consumes the AGGREGATED bucket table, not
    raw events: HashAggregate appears below Window in the plan, and
    there is no sort or window keyed on raw event rows."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    out = TS.bucket_pipeline(e, "ts", "1 day", "value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "Window" in plan
    # the window's input is the agg output: the bucket_sum alias is
    # produced by an aggregate, never a per-event projection
    assert plan.index("Window") < plan.index("HashAggregate")
    assert "CartesianProduct" not in plan


def test_cumulative_cardinality_plan_no_distinct_per_prefix(spark):
    """Exactly the two hash aggs of the first-seen identity — never
    a per-prefix distinct explosion or a join back to raw events."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    out = TS.cumulative_cardinality(e, "ts", "1 day", "user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # first-seen min-agg keyed on the user
    assert "hashpartitioning(user_id" in plan


def test_activity_heatmap_dow_convention(spark):
    """2024-01-07 is a Sunday -> dow 0; counts and avg per cell."""
    rows = [("2024-01-07 09:10:00", 2.0), ("2024-01-07 09:50:00", 4.0),
            ("2024-01-08 23:00:00", 1.0)]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = [(r["dow"], r["hour"], r["n"], r["avg_value"])
           for r in TS.activity_heatmap(df, "ts", "value").collect()]
    assert out == [(0, 9, 2, 3.0), (1, 23, 1, 1.0)]


def test_rollup_reaggregation_is_lossless(spark, tmp_path):
    """Daily re-aggregation from the hourly store equals direct
    daily aggregation on raw events (count/sum/min/max associative;
    avg derived)."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    d = str(tmp_path / "roll")
    TS.downsample_store(e, d, "ts", "1 hour", "value")
    got = {str(r["bucket_start"]): (r["n"], r["vmin"], r["vmax"])
           for r in TS.rollup_query(spark, d, "1 day").collect()}
    direct = {
        str(r["win_start"]): (r["n"],)
        for r in TS.window_agg(e, "ts", "1 day").collect()
    }
    assert set(got) == set(direct)
    for k, (n, vmin, vmax) in got.items():
        assert n == direct[k][0]
    # min/max sanity on the whole span
    allv = [r["value"] for r in e.select("value").collect()]
    assert min(v[1] for v in got.values()) == min(allv)
    assert max(v[2] for v in got.values()) == max(allv)


def test_stats_bucket_keyed_extremes_tiebreak_earliest(spark):
    """Equal bucket sums: both min and max keys break ties to the
    EARLIEST bucket; stats over the bucket metric are exact."""
    rows = [("2024-01-01 01:00:00", 5.0), ("2024-01-02 01:00:00", 5.0),
            ("2024-01-03 01:00:00", 9.0), ("2024-01-04 01:00:00", 9.0)]
    df = spark.createDataFrame(rows, ["ts", "value"])
    r = TS.stats_bucket(df, "ts", "1 day", "value").collect()[0]
    assert r["n_buckets"] == 4
    assert r["bucket_avg"] == 7.0 and r["bucket_sum_total"] == 28.0
    assert str(r["min_bucket_key"]).startswith("2024-01-01")
    assert str(r["max_bucket_key"]).startswith("2024-01-03")
    assert r["min_bucket_sum"] == 5.0 and r["max_bucket_sum"] == 9.0


def test_transition_matrix_hand_computed(spark):
    """Sequences u1: a->b->a, u2: a->b — transitions a->b x2,
    b->a x1; probabilities normalize per source type."""
    rows = [(1, "2024-01-01 00:00:00", 1, "a"),
            (2, "2024-01-01 00:01:00", 1, "b"),
            (3, "2024-01-01 00:02:00", 1, "a"),
            (4, "2024-01-01 00:00:00", 2, "a"),
            (5, "2024-01-01 00:01:00", 2, "b")]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"])
    got = [(r["from_type"], r["to_type"], r["n"], r["prob"])
           for r in TS.transition_matrix(
               df, "ts", "user_id", "event_type",
               order_cols=["event_id"]).collect()]
    assert got == [("a", "b", 2, 1.0), ("b", "a", 1, 1.0)]


def test_eql_sequence_maxspan_gates_the_match(spark):
    """u1 completes a->b within span; u2's earliest-anchored chain
    exceeds maxspan (even though a later anchor would fit —
    documented earliest-anchor semantics); u3 lacks step b."""
    rows = [
        (1, "2024-01-01 00:00:00", "a"), (1, "2024-01-01 00:05:00", "b"),
        (2, "2024-01-01 00:00:00", "a"), (2, "2024-01-01 02:00:00", "a"),
        (2, "2024-01-01 02:05:00", "b"),
        (3, "2024-01-01 00:00:00", "a"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = TS.eql_sequence(df, "ts", "user_id", "event_type",
                          ["a", "b"], maxspan_minutes=10).collect()
    assert [(r["user_id"], r["span_s"]) for r in got] == [(1, 300.0)]


def test_bucket_pipeline_telescoping_properties(spark):
    """Structural identities over the real event stream: cum_sum's
    last value equals the total; the derivative telescopes to
    last_bucket - first_bucket; avg_per_doc * n recovers bucket_sum
    to rounding."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    rows = TS.bucket_pipeline(e, "ts", "1 day", "value").collect()
    total = round(sum(r["bucket_sum"] for r in rows), 5)
    assert round(rows[-1]["cum_sum"], 5) == total
    telescoped = sum(r["deriv"] for r in rows if r["deriv"] is not None)
    assert abs(telescoped - (rows[-1]["bucket_sum"]
                             - rows[0]["bucket_sum"])) < 1e-5
    for r in rows:
        assert abs(r["avg_per_doc"] * r["n"] - r["bucket_sum"]) < 1e-3


def test_bucket_sort_slices_ordered_buckets(spark):
    """ES bucket_sort: 4-bucket histogram ordered by bucket_sum desc,
    from=1 size=2 keeps exactly the 2nd and 3rd busiest days."""
    rows = [
        ("2024-01-01 00:10:00", 1.0), ("2024-01-01 05:00:00", 2.0),
        ("2024-01-02 01:00:00", 10.0),
        ("2024-01-04 12:00:00", 3.0), ("2024-01-04 13:00:00", 5.0),
        ("2024-01-05 02:00:00", 6.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    # sums: d1=3, d2=10, d4=8, d5=6 -> desc order d2, d4, d5, d1
    out = TS.bucket_sort(df, "ts", "1 day", "value",
                         sort_on="bucket_sum", size=2, frm=1).collect()
    assert [r["bucket_sum"] for r in out] == [8.0, 6.0]
    # frm=0 path (TakeOrderedAndProject) agrees with the window path
    top = TS.bucket_sort(df, "ts", "1 day", "value",
                         sort_on="bucket_sum", size=2, frm=0).collect()
    assert [r["bucket_sum"] for r in top] == [10.0, 8.0]
    # ascending by n with ties -> bucket_start asc breaks them
    byn = TS.bucket_sort(df, "ts", "1 day", "value", sort_on="n",
                         ascending=True, size=2, frm=0).collect()
    assert [r["n"] for r in byn] == [1, 1]
    assert byn[0]["bucket_start"] < byn[1]["bucket_start"]


def test_bucket_selector_filters_on_own_aggregates(spark):
    """ES bucket_selector: predicate over the bucket's own metrics
    keeps exactly the matching buckets, in time order."""
    rows = [
        ("2024-01-01 00:10:00", 1.0), ("2024-01-01 05:00:00", 2.0),
        ("2024-01-02 01:00:00", 10.0),
        ("2024-01-04 12:00:00", 3.0), ("2024-01-04 13:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = TS.bucket_selector(df, "ts", "1 day",
                             "bucket_sum >= 8 AND n >= 1",
                             "value").collect()
    assert [(r["bucket_sum"], r["n"]) for r in out] == [(10.0, 1), (8.0, 2)]
    starts = [r["bucket_start"] for r in out]
    assert starts == sorted(starts)
    assert TS.bucket_selector(df, "ts", "1 day", "n > 99",
                              "value").count() == 0
