"""Deterministic sketches: KMV cardinality + bit-bucket quantiles."""

import duckdb
import pytest
from pyspark.sql import functions as F

from katta_spark.ops import sketch


def test_h60_matches_duckdb(spark):
    vals = ["abc", "hello world", "", "Zürich"]
    got = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "v string")
        .select("v", sketch.h60("v").alias("h"))
        .collect()
    }
    for v in vals:
        (exp,) = duckdb.sql(
            "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT)",
            params=[v],
        ).fetchone()
        assert got[v] == exp, v


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(F.concat(F.lit("v"), "id").alias("x"))
    row = sketch.kmv_distinct(df, "x", k=256).first()
    assert row["k_used"] == 100
    assert row["est_distinct"] == 100


def test_kmv_estimate_accuracy(spark):
    n = 20000
    # 20k distinct values, each duplicated (dups must not matter)
    df = (
        spark.range(2 * n)
        .select(F.concat(F.lit("doc"), F.col("id") % n).alias("x"))
        .repartition(8)
    )
    row = sketch.kmv_distinct(df, "x", k=256).first()
    assert row["k_used"] == 256
    # std err ~ 1/sqrt(256) ≈ 6.25%; allow 4 sigma
    assert abs(row["est_distinct"] - n) / n < 0.25


def test_bit_quantiles_known_distribution(spark):
    # 70 values of 3 (bits=2), 25 of 10 (bits=4), 5 of 1000 (bits=10)
    vals = [3] * 70 + [10] * 25 + [1000] * 5
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = {
        r["q"]: r for r in sketch.bit_quantiles(df, "v", (0.5, 0.9, 0.99)).collect()
    }
    assert rows[0.5]["bits"] == 2 and rows[0.5]["ub"] == 3
    assert rows[0.9]["bits"] == 4 and rows[0.9]["ub"] == 15
    assert rows[0.99]["bits"] == 10 and rows[0.99]["ub"] == 1023
    assert rows[0.5]["cum_n"] == 70


def test_bit_histogram_zero_value(spark):
    # bin(0) = '0' -> bits=1, identical convention in DuckDB
    df = spark.createDataFrame([(0,), (1,), (2,)], "v long")
    got = {r["bits"]: r["n"] for r in sketch.bit_histogram(df, "v").collect()}
    assert got == {1: 2, 2: 1}  # 0 and 1 share bits=1; 2 has bits=2


def test_new_ops_plan_shapes(spark):
    """Scale-shape pins: duplicate_spans shuffles ONCE (16-byte hash
    rows, window strings never materialize before the exchange); the
    KMV kernel runs narrow over the scan (no exchange below
    MapInPandas) with its one exchange over <= k x partitions rows."""
    from katta_spark.ops.dedup import duplicate_spans
    from katta_spark.tokenizer import explode_tokens

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).withColumnRenamed("text", "content")

    p1 = (
        duplicate_spans(docs, width=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p1.count("Exchange") == 1
    assert "CartesianProduct" not in p1 and "NestedLoop" not in p1

    p2 = (
        sketch.kmv_distinct(explode_tokens(docs, "content", []), "term", 256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p2.count("Exchange") == 1
    assert "MapInPandas" in p2
    # parents print first: the one exchange sits ABOVE the kernel,
    # i.e. nothing shuffles the corpus before the per-partition top-k
    assert p2.index("Exchange") > p2.index("TakeOrderedAndProject")
    assert p2.index("Exchange") < p2.index("MapInPandas")


def test_bloom_no_false_negatives_and_detects_absent(spark):
    """Every inserted value probes True (no false negatives — the
    bloom invariant); with a roomy m, absent probes come back False;
    and the set-bit table stays bounded by k * distinct values."""
    vals = spark.createDataFrame(
        [(f"v{i}",) for i in range(200)], "v string"
    )
    bloom = sketch.bloom_build(vals, "v", m_bits=1 << 14, k_hashes=3)
    nbits = bloom.count()
    assert 0 < nbits <= 3 * 200

    present = sketch.bloom_contains(
        bloom, vals.withColumnRenamed("v", "probe"), "probe",
        m_bits=1 << 14, k_hashes=3,
    ).collect()
    assert all(r["maybe"] for r in present) and len(present) == 200

    absent = spark.createDataFrame(
        [(f"absent{i}",) for i in range(50)], "probe string"
    )
    verdicts = [
        r["maybe"]
        for r in sketch.bloom_contains(bloom, absent, "probe",
                                       m_bits=1 << 14, k_hashes=3).collect()
    ]
    # fp rate at n=200, m=16384, k=3 is ~1e-5 — expect all False
    assert verdicts.count(False) >= 49


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    """CMS estimates are >= true counts always; with width >> distinct
    values collisions are rare, so most estimates are exact."""
    rows = [(f"v{i % 40}",) for i in range(400)]   # v0..v39, 10 each
    df = spark.createDataFrame(rows, "v string")
    cms = sketch.cms_build(df, "v", width=1 << 12, depth=3)
    probes = spark.createDataFrame(
        [(f"v{i}",) for i in range(40)] + [("missing",)], "probe string"
    )
    est = {r["probe"]: r["est"]
           for r in sketch.cms_query(cms, probes, "probe",
                                     width=1 << 12, depth=3).collect()}
    assert all(est[f"v{i}"] >= 10 for i in range(40))
    assert sum(est[f"v{i}"] == 10 for i in range(40)) >= 38
    assert est["missing"] == 0


def test_cms_is_linear_under_union(spark):
    """Merging two sketches (union + re-agg) equals the sketch of the
    union — the property incremental 100 TB builds rely on."""
    from pyspark.sql import functions as F

    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "v string")
    b = spark.createDataFrame([("x",)] * 4 + [("z",)] * 5, "v string")
    merged = (
        sketch.cms_build(a, "v", width=64, depth=2)
        .unionByName(sketch.cms_build(b, "v", width=64, depth=2))
        .groupBy("row", "cell").agg(F.sum("cnt").alias("cnt"))
    )
    direct = sketch.cms_build(a.unionByName(b), "v", width=64, depth=2)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))
