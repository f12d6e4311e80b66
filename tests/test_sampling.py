"""Deterministic sampling / split operators (ops/sampling.py).

Python-mirror oracles: the bucket function is md5-based, so hashlib
reproduces it exactly; top-n-per-group is mirrored with pandas."""

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from katta_spark.ops import sampling  # noqa: E402


def _py_bucket(key, salt: str = "") -> int:
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()
    return int(h[:8], 16) % sampling.N_BUCKETS


def _py_split(key, bounds) -> str:
    b = _py_bucket(key)
    for name, hi in bounds:
        if b < hi:
            return name
    return bounds[-1][0]


def test_hash_split_matches_python_md5(docs):
    bounds = sampling.split_boundaries(sampling.DEFAULT_WEIGHTS)
    got = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(docs, key_col="doc_id").select("doc_id", "split").collect()
    }
    assert len(got) == docs.count()
    for doc_id, split in got.items():
        assert split == _py_split(doc_id, bounds)


def test_hash_split_partition_invariant(docs):
    base = sampling.hash_split(docs, key_col="doc_id")
    repart = sampling.hash_split(docs.repartition(13), key_col="doc_id")
    a = {r["doc_id"]: r["split"] for r in base.select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in repart.select("doc_id", "split").collect()}
    assert a == b


def test_hash_split_proportions(docs):
    n = docs.count()
    counts = dict(
        sampling.hash_split(docs, key_col="doc_id")
        .groupBy("split").count().collect()
    )
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.9) < 0.03
    assert abs(counts["val"] / n - 0.05) < 0.02
    assert abs(counts["test"] / n - 0.05) < 0.02


def test_stratified_sample_rate_subset_and_salt(docs):
    n = docs.count()
    s = sampling.stratified_sample(docs, rate=0.2, key_col="doc_id")
    ids = {r["doc_id"] for r in s.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids <= all_ids
    assert abs(len(ids) / n - 0.2) < 0.04
    # exact membership matches the python mirror
    expect = {i for i in all_ids if _py_bucket(i) < 2000}
    assert ids == expect
    # a different salt draws an (almost surely) different sample
    ids2 = {
        r["doc_id"]
        for r in sampling.stratified_sample(
            docs, rate=0.2, key_col="doc_id", salt="epoch1"
        ).select("doc_id").collect()
    }
    assert ids2 != ids


def test_top_n_per_group_matches_python(docs):
    df = docs.select(
        "doc_id", "lang", F.length("content").cast("long").alias("len")
    )
    got = sampling.top_n_per_group(
        df, "lang", 4, [F.desc("len"), F.asc("doc_id")]
    )
    rows = sorted(
        (r["lang"], r["rank"], r["doc_id"], r["len"]) for r in got.collect()
    )
    pdf = df.toPandas()
    expect = []
    for lang, grp in pdf.groupby("lang"):
        top = grp.sort_values(["len", "doc_id"], ascending=[False, True]).head(4)
        for rank, (_, r) in enumerate(top.iterrows(), start=1):
            expect.append((lang, rank, int(r["doc_id"]), int(r["len"])))
    assert rows == sorted(expect)
    # the salted two-phase prefilter is exact (same result set)
    salted = sampling.top_n_per_group(
        df, "lang", 4, [F.desc("len"), F.asc("doc_id")], prefilter_salt=8
    )
    rows_s = sorted(
        (r["lang"], r["rank"], r["doc_id"], r["len"]) for r in salted.collect()
    )
    assert rows_s == rows


def test_source_report_matches_naive(spark):
    from collections import Counter, defaultdict

    from katta_spark.ops.sampling import source_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r["source"]: r for r in source_report(docs).collect()}
    rows = docs.select("source", "lang", "n_chars").collect()
    chars = Counter()
    ndocs = Counter()
    langs = defaultdict(Counter)
    for r in rows:
        ndocs[r["source"]] += 1
        chars[r["source"]] += r["n_chars"]
        langs[r["source"]][r["lang"]] += 1
    assert set(got) == set(ndocs)
    for s, r in got.items():
        assert r["n_docs"] == ndocs[s]
        assert r["total_chars"] == chars[s]
        assert r["n_langs"] == len(langs[s])
        want_top = min(langs[s].items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert r["top_lang"] == want_top


def test_write_training_shards_deterministic_and_complete(spark, tmp_path):
    import json

    from katta_spark.ops.packing import write_training_shards

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_training_shards(docs, d1, n_shards=7)
    # different input layout -> identical shard membership
    m2 = write_training_shards(docs.repartition(13).sortWithinPartitions(
        "source"), d2, n_shards=7)
    assert m1 == m2
    back = spark.read.parquet(d1)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # manifest matches the files on disk, shard by shard
    disk = {
        int(r["shard"]): r["n"]
        for r in back.groupBy("shard").count().withColumnRenamed(
            "count", "n").collect()
    }
    man = json.loads(open(f"{d1}/_manifest.json").read())
    assert {int(k): v["rows"] for k, v in man["shards"].items()} == disk
    # one file per shard directory
    import glob
    for sd in glob.glob(f"{d1}/shard=*"):
        assert len(glob.glob(f"{sd}/*.parquet")) == 1


def test_write_training_shards_shuffle_order_deterministic(spark, tmp_path):
    import hashlib

    from katta_spark.ops.packing import write_training_shards

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source")
    d = str(tmp_path / "s")
    write_training_shards(docs, d, n_shards=4, shuffle=True)
    back = spark.read.parquet(f"{d}/shard=0")
    ids = [r["doc_id"] for r in back.collect()]
    want = sorted(
        ids,
        key=lambda i: hashlib.md5(f"shuf:{i}".encode()).hexdigest(),
    )
    assert ids == want and len(ids) > 1


def test_random_project_matches_python_and_preserves_geometry(spark):
    import math

    from katta_spark.ops.similarity import random_project

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(50)
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    out = {
        r["vec_id"]: list(r["projected"])
        for r in random_project(emb, dims=64, out_dims=8).collect()
    }
    fac = math.sqrt(64 / 8)

    def proj(v, j):
        acc = 0.0
        for d in range(64):
            acc = acc + v[d] * math.cos(1.0 + j * 64 + d)
        return round(acc * fac, 6)

    for vid, v in rows.items():
        assert out[vid] == [proj(v, j) for j in range(8)]
    # JL sanity: self-cosine is 1, and projected norms are finite
    for vid, p in out.items():
        assert all(math.isfinite(x) for x in p)


def test_rollup_report_levels_consistent(spark):
    """Leaf counts sum to each lang subtotal, subtotals to the grand
    total, and subtotal rows are labelled '(all)'."""
    from katta_spark.ops.sampling import rollup_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = rollup_report(docs, ["lang", "source"], size_col="n_chars").collect()
    leaves = [r for r in rows if r["lang"] != "(all)" and r["source"] != "(all)"]
    langs = [r for r in rows if r["lang"] != "(all)" and r["source"] == "(all)"]
    grand = [r for r in rows if r["lang"] == "(all)"]
    assert len(grand) == 1 and grand[0]["source"] == "(all)"
    assert grand[0]["n_docs"] == sum(r["n_docs"] for r in leaves)
    assert grand[0]["total_chars"] == sum(r["total_chars"] for r in leaves)
    for lr in langs:
        got_n = sum(r["n_docs"] for r in leaves if r["lang"] == lr["lang"])
        assert lr["n_docs"] == got_n


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """Same (salt, keys) -> same sample regardless of partitioning;
    heavier rows are overrepresented vs a uniform draw."""
    import hashlib
    import math

    from katta_spark.ops.sampling import weighted_sample

    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "n_chars")
    a = [r["doc_id"] for r in weighted_sample(d, 50, "n_chars").collect()]
    b = [r["doc_id"]
         for r in weighted_sample(d.repartition(13), 50, "n_chars").collect()]
    assert a == b and len(a) == 50

    # python mirror of the A-ES priority
    rows = {r["doc_id"]: r["n_chars"] for r in d.collect()}

    def pri(did, w):
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16)
        u = (h + 1.0) / 2**32
        return (round(-math.log(u) / w, 6), did)

    want = sorted((pri(k, w) for k, w in rows.items() if w > 0))[:50]
    assert a == [did for _, did in want]
    # weight bias: mean weight of the sample exceeds the corpus mean
    mean_all = sum(rows.values()) / len(rows)
    mean_s = sum(rows[i] for i in a) / len(a)
    assert mean_s > mean_all


def test_weighted_sample_excludes_nonpositive(spark):
    from katta_spark.ops.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], ["doc_id", "w"]
    )
    got = [r["doc_id"] for r in weighted_sample(df, 10, "w").collect()]
    assert got == [3]


def test_weighted_sample_plan_is_topk_not_global_sort(spark):
    """A-ES selection compiles to TakeOrderedAndProject (per-partition
    heap + tiny merge), never a full Exchange+Sort of the corpus."""
    from katta_spark.ops.sampling import weighted_sample

    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "n_chars")
    plan = (
        weighted_sample(d, 50, "n_chars")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_composite_page_chain_covers_all_groups(spark):
    """Chaining pages by after_key enumerates every group exactly
    once, in key order, with correct counts."""
    from katta_spark.ops.sampling import composite_page

    rows = [(f"t{i % 4}", i % 7, float(i)) for i in range(84)]
    df = spark.createDataFrame(rows, "k string, u long, value double")
    seen = []
    after = None
    while True:
        page = composite_page(df, ["k", "u"], 5, after=after,
                              value_col="value").collect()
        if not page:
            break
        seen.extend((r["k"], r["u"], r["n_rows"]) for r in page)
        after = (page[-1]["k"], page[-1]["u"])
    assert len(seen) == 28                       # 4 x 7 groups
    assert seen == sorted(seen)
    assert all(n == 3 for _, _, n in seen)       # 84 / 28


def test_composite_page_keyset_pushes_to_scan(spark, tmp_path):
    """The after-tuple predicate decomposes into simple comparisons
    that reach the parquet scan as PushedFilters (deep pages skip
    already-paged groups at the file-read level)."""
    from katta_spark.ops.sampling import composite_page

    p = str(tmp_path / "ev")
    spark.createDataFrame(
        [(f"t{i % 3}", i % 5, float(i)) for i in range(50)],
        "k string, u long, value double",
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = composite_page(df, ["k", "u"], 5, after=("t1", 2),
                         value_col="value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(k,t1)" in plan
    rows = [(r["k"], r["u"]) for r in out.collect()]
    assert rows == sorted(x for x in {(f"t{i % 3}", i % 5)
                                      for i in range(50)}
                          if x > ("t1", 2))[:5]


def test_length_bucket_batches_hand_computed(spark):
    """Buckets by size range, fills 2-doc batches in (size, doc_id)
    order, padding = batch_max - size."""
    from katta_spark.ops.packing import length_bucket_batches

    rows = [(1, 70), (2, 65), (3, 100), (4, 90), (5, 10), (6, 300)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    out = {r["doc_id"]: (r["bucket"], r["batch_id"], r["batch_max"],
                         r["padding"])
           for r in length_bucket_batches(df, "n_chars",
                                          batch_size=2).collect()}
    # bucket 1 = [64,128): sizes 65,70,90,100 -> batches (65,70),(90,100)
    assert out[2] == (1, 0, 70, 5)
    assert out[1] == (1, 0, 70, 0)
    assert out[4] == (1, 1, 100, 10)
    assert out[3] == (1, 1, 100, 0)
    assert out[5][0] == 0 and out[6][0] == 3  # [<64] and [256,512)
    assert out[5][3] == 0 and out[6][3] == 0  # singleton batches


def test_mixture_order_weight_proportions(spark):
    """Weight-2 source appears ~2x as often as weight-1 in any prefix
    of the interleaved order, and the order is deterministic."""
    from katta_spark.ops.sampling import mixture_order

    rows = [(i, "a" if i < 200 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = mixture_order(df, {"a": 2.0, "b": 1.0}).collect()
    assert len(out) == 400
    order = sorted(out, key=lambda r: r["pos"])
    prefix = [r["grp"] for r in order[:150]]
    na, nb = prefix.count("a"), prefix.count("b")
    assert na == 100 and nb == 50  # exact 2:1 interleave by key = i/w
    again = mixture_order(df, {"a": 2.0, "b": 1.0}).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    # weight-0 / missing source drops
    out_b = mixture_order(df, {"b": 1.0}).collect()
    assert {r["grp"] for r in out_b} == {"b"} and len(out_b) == 200


def test_mixture_order_no_single_partition_window(spark):
    """Round-4 scale fix: mixture_order must contain NO WindowExec at
    all — the old plan put the whole corpus through one
    Window.partitionBy() (single-partition global sort) and one
    partition per source.  Both ranks now go through _dist_rank
    (range-partitioned sort + broadcast offsets)."""
    from katta_spark.ops.sampling import mixture_order

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(100)],
        ["doc_id", "source"],
    )
    out = mixture_order(df, {"a": 1.0, "b": 2.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "RangePartitioning" in plan or "rangepartitioning" in plan.lower()


def test_mixture_order_cache_release_handle(spark):
    """The returned frame exposes its ONE session cache as a public
    release handle (``katta_cache``): long-lived drivers unpersist it
    after materializing the order, and re-reading the frame still
    returns the identical order (fixed range partitioner)."""
    from katta_spark.ops.sampling import mixture_order

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)],
        ["doc_id", "source"],
    )
    out = mixture_order(df, {"a": 1.0, "b": 1.0})
    before = sorted(map(tuple, out.collect()))
    assert out.katta_cache.storageLevel.useMemory
    out.katta_cache.unpersist()
    assert not out.katta_cache.storageLevel.useMemory
    assert sorted(map(tuple, out.collect())) == before


def test_mixture_order_parallelism_invariant(spark):
    """The determinism contract the op exists for: identical output
    at any partition count (2 vs 17 shuffle partitions — different
    range boundaries, same ranks)."""
    from katta_spark.ops.sampling import mixture_order

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(300)],
        ["doc_id", "source"],
    )
    w = {"a": 2.0, "b": 1.0, "c": 0.5}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        o17 = sorted(map(tuple, mixture_order(df, w).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        o2 = sorted(map(tuple, mixture_order(df, w).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert o17 == o2 and len(o17) == 300
