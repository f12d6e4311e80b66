"""Similarity-search quality: exact top-k sanity + ANN lift over a
random scan of the same fraction (absolute recall is floor-limited on
uniform random vectors — see ops/similarity docstring)."""

import pytest
from pyspark.sql import functions as F

from katta_spark.ops import similarity as sim

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    e.cache().count()
    return e


def test_exact_topk_is_exact(emb):
    q = emb.filter(F.col("vec_id") == 3).first()
    qv = [float(x) for x in q["embedding"]]
    corpus = emb.filter(F.col("vec_id") != 3)
    got = sim.cosine_topk(corpus, qv, k=5).collect()
    # brute-force in python
    import math

    rows = corpus.collect()
    qn = math.sqrt(sum(x * x for x in qv))

    def cos(v):
        d = sum(float(a) * b for a, b in zip(v, qv))
        n = math.sqrt(sum(float(a) * a for a in v))
        return d / (n * qn)

    want = sorted(
        ((r["vec_id"], cos(r["embedding"])) for r in rows),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert [r["vec_id"] for r in got] == [i for i, _ in want]
    for r, (_, c) in zip(got, want):
        assert r["cos"] == pytest.approx(c, abs=1e-9)


def test_ann_lift_over_random(emb):
    """Multi-table ANN must recall clearly more of the true top-10
    than a random scan of the same corpus fraction would."""
    n = emb.count() - 1
    hits = scanned = 0
    for qid in range(6):
        q = emb.filter(F.col("vec_id") == qid).first()
        qv = [float(x) for x in q["embedding"]]
        corpus = emb.filter(F.col("vec_id") != qid)
        exact = {r["vec_id"] for r in sim.cosine_topk(corpus, qv, k=10).collect()}
        cond = None
        for t in range(8):
            off = t * 6
            s = sim.hyperplane_bits(F.col("embedding"), 64, 6, off)
            c = s == sim._query_sig(qv, 64, 6, off)
            cond = c if cond is None else (cond | c)
        cand = corpus.filter(cond)
        scanned += cand.count()
        ann = {
            r["vec_id"]
            for r in sim.lsh_tables_ann(corpus, qv, 10, 64, 6, 8).collect()
        }
        hits += len(exact & ann)
    recall = hits / 60
    rand_recall = scanned / (6 * n)  # expected recall of a random scan
    # uniform i.i.d. vectors are the worst case for LSH (cosines all
    # ~0): measured lift here is ~1.2x — the point of the assertion is
    # that the bucketing is not WORSE than random and the plumbing
    # returns real neighbors; clustered real-world embeddings give
    # much larger lift at the same scan fraction.
    assert recall > rand_recall, (recall, rand_recall)
    assert recall > 0.15


# ------------------------------------------------- persisted ANN index


@pytest.fixture(scope="module")
def ann_dir(spark, emb, tmp_path_factory):
    from katta_spark.ops import ann_index as AI

    d = str(tmp_path_factory.mktemp("ann") / "idx")
    AI.build_ann_index(
        emb.filter(F.col("vec_id") != 0), d, dims=64,
        planes_per_table=8, n_tables=4,
    )
    return d


def test_ann_index_matches_scan_variant(spark, emb, ann_dir):
    """The partition-pruned index probe returns EXACTLY the scan
    variant's results (same hash family, same buckets)."""
    from katta_spark.ops import ann_index as AI

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    corpus = emb.filter(F.col("vec_id") != 0)
    want = sim.lsh_tables_ann(
        corpus, qv, k=10, dims=64, planes_per_table=8, n_tables=4
    ).collect()
    got = AI.ann_query(spark, ann_dir, qv, k=10).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (r["vec_id"], r["cos"]) for r in want
    ]


def test_ann_index_probe_is_partition_pruned(spark, emb, ann_dir):
    """The probe plan must prune partitions: sig/tbl appear as
    PartitionFilters on the parquet scan, and the files actually read
    are a strict subset of the index's files."""
    from katta_spark.ops import ann_index as AI

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cand = AI.ann_candidates(spark, ann_dir, qv, probes=0)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "sig" in plan
    # inputFiles() lists the unpruned relation; count the files the
    # executed (pruned) scan actually touches instead
    n_probed = cand.select(F.input_file_name()).distinct().count()
    n_total = len(spark.read.parquet(ann_dir).inputFiles())
    assert 0 < n_probed < n_total / 2


@pytest.fixture(scope="module")
def ivf_dir(spark, emb, tmp_path_factory):
    from katta_spark.ops import ann_index as AI

    d = str(tmp_path_factory.mktemp("ivf") / "idx")
    AI.build_ivf_index(emb.filter(F.col("vec_id") != 0), d, n_centroids=8,
                       quantizer="seed")  # mirrors assume seed centroids
    return d


def test_ivf_query_matches_python_bruteforce(spark, emb, ivf_dir):
    """Assignment (argmax cosine, tie cid asc), probe ranking, and
    rerank all match an independent python mirror."""
    import math

    from katta_spark.ops import ann_index as AI

    rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") != 0).collect()
    ]
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    cents = [v for _, v in sorted(rows)[:8]]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    probe = [
        cid
        for _, cid in sorted(
            ((-cos(qv, c), cid) for cid, c in enumerate(cents))
        )[:2]
    ]
    cand = [
        (vid, v)
        for vid, v in rows
        if min(
            ((-cos(v, c), cid) for cid, c in enumerate(cents))
        )[1] in probe
    ]
    want = sorted(
        ((round(cos(v, qv), 6), vid) for vid, v in cand),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = AI.ivf_query(spark, ivf_dir, qv, k=10, nprobe=2).collect()
    assert [(r["vec_id"], round(r["cos"], 6)) for r in got] == [
        (vid, c) for c, vid in want
    ]


def test_ivf_full_probe_equals_exact(spark, emb, ivf_dir):
    """nprobe = n_centroids probes every partition, so IVF reduces to
    the exact brute-force top-k."""
    from katta_spark.ops import ann_index as AI

    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    exact = sim.cosine_topk(
        emb.filter(F.col("vec_id") != 0), qv, k=10
    ).collect()
    ivf = AI.ivf_query(spark, ivf_dir, qv, k=10, nprobe=8).collect()
    assert [(r["vec_id"], round(r["cos"], 9)) for r in ivf] == [
        (r["vec_id"], round(r["cos"], 9)) for r in exact
    ]


def test_ivf_probe_is_partition_pruned(spark, emb, ivf_dir):
    from katta_spark.ops import ann_index as AI

    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    out = AI.ivf_query(spark, ivf_dir, qv, k=10, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan
    n_probed = (
        spark.read.parquet(ivf_dir)
        .filter(F.col("cid").isin([0]))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    n_total = len(spark.read.parquet(ivf_dir).inputFiles())
    assert 0 < n_probed < n_total


def test_ann_multiprobe_widens_buckets(spark, emb, ann_dir):
    from katta_spark.ops import ann_index as AI

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    n0 = AI.ann_candidates(spark, ann_dir, qv, probes=0).count()
    n1 = AI.ann_candidates(spark, ann_dir, qv, probes=1).count()
    assert n1 >= n0


def test_ivf_query_batch_matches_per_query(spark, emb, ivf_dir):
    """The batched probe returns, per qid, exactly the per-query
    ivf_query ranking — and reads one pruned scan, not N."""
    from katta_spark.ops import ann_index as AI

    qs = {
        str(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin([0, 5])).collect()
    }
    batch = AI.ivf_query_batch(spark, ivf_dir, qs, k=8, nprobe=2)
    got = {
        qid: [(r["id"], round(r["cos"], 9)) for r in rows]
        for qid, rows in __import__("itertools").groupby(
            batch.orderBy("qid", F.desc("cos"), F.asc("id")).collect(),
            key=lambda r: r["qid"],
        )
    }
    for qid, qv in qs.items():
        want = [
            (r["vec_id"], round(r["cos"], 9))
            for r in AI.ivf_query(spark, ivf_dir, qv, k=8, nprobe=2).collect()
        ]
        assert got[qid] == want, qid
    # single pruned relation in the plan: the scan appears once
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_kmeans_refine_converges_to_cluster_means(spark):
    """Three well-separated 4-d clusters: Lloyd refinement from a
    poor deterministic seed recovers the true cluster means and the
    refined IVF assignment groups each cluster into one partition."""
    import math

    from katta_spark.ops import ann_index as AI

    def pts(center, n, spread):
        return [
            [c + spread * ((i * 7 + j * 3) % 5 - 2) / 10.0
             for j, c in enumerate(center)]
            for i in range(n)
        ]

    c0, c1, c2 = [10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]
    rows = []
    for base, center in enumerate((c0, c1, c2)):
        for i, v in enumerate(pts(center, 20, 1.0)):
            rows.append((base * 100 + i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # bad seed: three vectors from the SAME cluster
    seed = [r[1] for r in rows[:3]]
    refined = AI.kmeans_refine(df, seed, iters=8, vec_col="embedding")

    # each true center must be (cosine-)closest to a distinct refined
    # centroid, i.e. the refinement escaped the single-cluster seed
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    owners = {
        ci: max(range(3), key=lambda k: cos(center, refined[k]))
        for ci, center in enumerate((c0, c1, c2))
    }
    assert sorted(owners.values()) == [0, 1, 2], (owners, refined)


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """A corpus adversarial to smallest-id seeding: 6 well-separated
    16-d clusters of 100 points each, with ALL of cluster 0's points
    holding the smallest ids — so a k=6 id-ordered seed sample lands
    every centroid inside one dense region (the failure mode VERDICT
    r2 'What's wrong' #3 calls out for clustered 100 TB embeddings)."""
    import random

    rng = random.Random(20260820)
    rows = []
    for c in range(6):
        for i in range(100):
            v = [rng.gauss(0.0, 0.35) for _ in range(16)]
            v[c] += 10.0
            v[(c + 7) % 16] += 4.0
            rows.append((c * 100 + i, v))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ), rows


def test_assign_kernel_matches_jvm_fold_past_threshold(spark,
                                                       clustered_emb):
    """_assign_expr switches to the Arrow matmul kernel past 32
    centroids; both paths must produce the identical argmax-cosine
    assignment (lowest-index tie-break) on the same data."""
    from katta_spark.ops import ann_index as AI

    df, rows = clustered_emb
    cents = [v for _, v in rows[::16]][:40]  # 40 > threshold
    got_kernel = {
        r["vec_id"]: r["cid"]
        for r in df.select(
            "vec_id", AI._assign_expr(F.col("embedding"), cents).alias("cid")
        ).collect()
    }
    got_fold = {
        r["vec_id"]: r["cid"]
        for r in df.select(
            "vec_id", AI._assign_cid(F.col("embedding"), cents).alias("cid")
        ).collect()
    }
    assert got_kernel == got_fold


def test_kmeans_parallel_seed_is_deterministic(spark, clustered_emb):
    """No RNG state anywhere: two runs over the same input return the
    bitwise-identical centroid list (hash-uniform coins, greedy
    argmax reduction)."""
    from katta_spark.ops import ann_index as AI

    df, _ = clustered_emb
    a = AI.kmeans_parallel_seed(df, 6)
    b = AI.kmeans_parallel_seed(df, 6)
    assert a == b
    assert len(a) == 6


def test_kmeans_quantizer_balances_clusters_and_lifts_recall(
    spark, clustered_emb, tmp_path
):
    """VERDICT r2 item 6 'done' criteria: on a clustered corpus where
    the id-ordered seed sample puts all k centroids in one dense
    region, the k-means|| + Lloyd quantizer (a) bounds cluster-size
    skew (max cell <= 2x the mean — the O(sum |c_i|^2) SemDeDup bound
    and the nprobe-pruned probe cost both ride on this) and (b) beats
    the seed quantizer's recall@10 at nprobe=1."""
    import numpy as np

    from katta_spark.ops import ann_index as AI

    df, rows = clustered_emb
    d_km = str(tmp_path / "ivf_km")
    d_seed = str(tmp_path / "ivf_seed")
    meta_km = AI.build_ivf_index(df, d_km, n_centroids=6)
    AI.build_ivf_index(df, d_seed, n_centroids=6, quantizer="seed")
    assert meta_km["n_centroids"] == 6

    # (a) balance bound on the k-means cells
    sizes = [
        r["count"]
        for r in spark.read.parquet(d_km).groupBy("cid").count().collect()
    ]
    assert len(sizes) == 6
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes)), sizes

    # (b) recall@10 at nprobe=1, 12 probe queries (2 per true cluster),
    # ground truth = exact brute-force cosine over the corpus
    ids = np.array([i for i, _ in rows])
    V = np.stack([np.asarray(v) for _, v in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    def recall(index_dir):
        hit = tot = 0
        for qi in range(0, 600, 50):
            q = V[qi]
            exact = ids[
                np.lexsort((ids, -(Vn @ (q / np.linalg.norm(q)))))
            ][:10]
            got = {
                r["vec_id"]
                for r in AI.ivf_query(
                    spark, index_dir, [float(x) for x in q], k=10, nprobe=1
                ).collect()
            }
            hit += len(got & set(exact.tolist()))
            tot += 10
        return hit / tot

    r_km, r_seed = recall(d_km), recall(d_seed)
    assert r_km >= 0.9, (r_km, r_seed)
    assert r_km > r_seed, (r_km, r_seed)


def test_ivf_build_with_kmeans_partitions_clusters(spark, tmp_path):
    from katta_spark.ops import ann_index as AI

    # interleaved ids: the deterministic smallest-id seed picks one
    # (noisy) vector from EACH cluster; Lloyd then pulls centroids to
    # the cluster means
    rows = []
    for i in range(30):
        for axis in range(3):
            v = [0.0] * 8
            v[axis] = 10.0
            v[(axis + 3) % 8] = (i % 7) / 10.0
            rows.append((i * 3 + axis, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    d = str(tmp_path / "ivf_km")
    meta = AI.build_ivf_index(df, d, n_centroids=3, kmeans_iters=5,
                              quantizer="seed")

    got = spark.read.parquet(d)
    # partition purity: each cluster (vec_id % 3) maps to exactly one cid
    purity = (
        got.selectExpr("CAST(vec_id % 3 AS INT) AS grp", "cid")
        .distinct()
        .groupBy("grp")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in purity)

    # refinement moved centroids onto the true means: secondary
    # component = mean of (i % 7)/10 over i in 0..29 = 0.3, not the
    # seed vector's own (i=0 -> 0.0)
    true_secondary = sum((i % 7) / 10.0 for i in range(30)) / 30
    for cv in meta["centroids"]:
        sec = sorted((abs(x) for x in cv), reverse=True)[1]
        assert abs(sec - true_secondary) < 1e-6, meta["centroids"]


def test_ivf_append_matches_full_build(spark, emb, tmp_path):
    """build(first half) + append(second half) answers queries
    identically to build(full) — centroids are the smallest-id seed
    in both, so layout and results must match exactly."""
    from katta_spark.ops import ann_index as AI

    d_inc = str(tmp_path / "ivf_inc")
    d_full = str(tmp_path / "ivf_full")
    first = emb.filter(F.col("vec_id") < 500)
    rest = emb.filter(F.col("vec_id") >= 500)
    AI.build_ivf_index(first, d_inc, n_centroids=8, quantizer="seed")
    AI.append_to_ivf_index(rest, d_inc)
    AI.build_ivf_index(emb, d_full, n_centroids=8, quantizer="seed")

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    got = AI.ivf_query(spark, d_inc, qv, k=10, nprobe=3).collect()
    want = AI.ivf_query(spark, d_full, qv, k=10, nprobe=3).collect()
    assert [(r[0], r[1]) for r in got] == [(r[0], r[1]) for r in want]
    assert len(got) == 10


@pytest.fixture(scope="module")
def ivfpq_dir(spark, emb, tmp_path_factory):
    from katta_spark.ops import ann_index as AI

    d = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    AI.build_ivfpq_index(
        emb.filter(F.col("vec_id") != 0), d, n_centroids=8, m=8,
        n_codes=16, quantizer="seed",  # numpy mirror assumes seed cents
    )
    return d


def test_ivfpq_matches_numpy_mirror(spark, emb, ivfpq_dir):
    """Full-probe ADC ranking == an independent numpy/python mirror of
    the entire pipeline (deterministic codebooks, encoding, LUT
    scoring) — scores compared to 1e-9."""
    import json
    import math

    import numpy as np

    from katta_spark.ops import ann_index as AI

    meta = json.loads(open(f"{ivfpq_dir}/_meta.json").read())
    corpus = emb.filter(F.col("vec_id") != 0)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    got = AI.ivfpq_query(
        spark, ivfpq_dir, q, k=10, nprobe=meta["n_centroids"]
    ).collect()

    C = np.array(meta["centroids"])
    CB = np.array(meta["codebooks"])
    m, subdim = meta["m"], C.shape[1] // meta["m"]
    rows = corpus.collect()
    ids = [int(r["vec_id"]) for r in rows]
    V = np.array([[float(x) for x in r["embedding"]] for r in rows])
    Vn = np.linalg.norm(V, axis=1)
    Vn[Vn == 0] = 1.0
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0] = 1.0
    cid = np.argmax((V @ C.T) / (Vn[:, None] * Cn[None, :]), axis=1)
    R = V - C[cid]
    codes = np.stack(
        [
            np.argmin(
                (
                    (R[:, s * subdim:(s + 1) * subdim][:, None, :]
                     - CB[s][None, :, :]) ** 2
                ).sum(-1),
                axis=1,
            )
            for s in range(m)
        ],
        axis=1,
    )
    qn = math.sqrt(sum(x * x for x in q))
    scores = {}
    for i, vid in enumerate(ids):
        cv = C[cid[i]]
        dot = 0.0
        n2 = 0.0
        for s in range(m):
            rec = cv[s * subdim:(s + 1) * subdim] + CB[s][codes[i, s]]
            qs = q[s * subdim:(s + 1) * subdim]
            dot += sum(float(a) * float(b) for a, b in zip(qs, rec))
            n2 += sum(float(b) * float(b) for b in rec)
        scores[vid] = dot / (max(math.sqrt(n2), 1e-300) * qn)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["id"], round(r["cos"], 9)) for r in got] == [
        (i, round(s, 9)) for i, s in want
    ]


def test_ivfpq_rerank_full_shortlist_equals_exact(spark, emb, ivfpq_dir):
    """ADC shortlist = whole corpus + exact rerank reproduces the
    exact cosine top-k (plumbing check: the compressed index loses
    nothing when the shortlist doesn't cut)."""
    from katta_spark.ops import ann_index as AI

    corpus = emb.filter(F.col("vec_id") != 0)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    exact = sim.cosine_topk(corpus, q, k=10).collect()
    got = AI.ivfpq_query(
        spark, ivfpq_dir, q, k=10, nprobe=8,
        shortlist=corpus.count(), rerank_embeddings=corpus,
    ).collect()
    assert [(r["vec_id"], round(r["cos"], 9)) for r in got] == [
        (r["vec_id"], round(r["cos"], 9)) for r in exact
    ]


def test_ivfpq_index_is_compact_and_pruned(spark, emb, ivfpq_dir):
    """The PQ index stores codes, never vectors, and a 1-probe query
    plan is partition-pruned on cid."""
    from katta_spark.ops import ann_index as AI

    cols = spark.read.parquet(ivfpq_dir).columns
    assert "embedding" not in cols and "codes" in cols
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]
    ]
    out = AI.ivfpq_query(spark, ivfpq_dir, q, k=5, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan


def test_knn_topk_metrics_match_numpy(spark):
    """dot / euclidean / cosine exact top-k vs a numpy mirror (order
    and 6dp scores)."""
    import math

    import numpy as np

    from katta_spark.ops.similarity import knn_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(200)
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    q = np.array([math.cos(1 + i) for i in range(64)])
    for metric, score_fn, asc in (
        ("dot", lambda v: float(v @ q), False),
        ("euclidean", lambda v: float(np.sqrt(((v - q) ** 2).sum())), True),
        ("cosine",
         lambda v: float((v @ q) / (np.linalg.norm(v) * np.linalg.norm(q))),
         False),
    ):
        got = [(r["vec_id"], r["score"])
               for r in knn_topk(emb, list(q), k=8, metric=metric).collect()]
        want = sorted(
            ((i, round(score_fn(v), 6)) for i, v in rows.items()),
            key=lambda x: (x[1] if asc else -x[1], x[0]),
        )[:8]
        assert [i for i, _ in got] == [i for i, _ in want], metric
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, abs=2e-6)


def test_ivf_filtered_query_pushes_predicate_and_is_exact(spark, tmp_path):
    """Filtered vector search: (a) results equal brute-force cosine
    over the label-filtered corpus restricted to the probed
    centroids; (b) the label predicate appears in the parquet scan's
    PushedFilters — filtering happens in the scan, not post-top-k."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from katta_spark.ops import ann_index as AI

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") != 0)
    d = str(tmp_path / "ivf_filt")
    AI.build_ivf_index(corpus, d, n_centroids=8, meta_cols=["label"])
    qv = [float(x)
          for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = AI.ivf_query(spark, d, qv, k=5, nprobe=8,
                       where=F.col("label") == 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "label" in plan and "PushedFilters" in plan
    got = [(r["vec_id"], round(r["cos"], 6)) for r in out.collect()]
    # nprobe=8 == n_centroids -> probe set is the whole corpus, so the
    # expected set is exact brute force over label==1
    rows = {r["vec_id"]: (np.array(r["embedding"], dtype=np.float64),
                          r["label"])
            for r in corpus.collect()}
    q = np.array(qv)
    want = sorted(
        ((i, round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6))
         for i, (v, lb) in rows.items() if lb == 1),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert [i for i, _ in got] == [i for i, _ in want]


def test_ivf_query_batch_where_filters(spark, tmp_path):
    """Batched probes honor the same metadata pre-filter."""
    from pyspark.sql import functions as F

    from katta_spark.ops import ann_index as AI

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") != 0)
    d = str(tmp_path / "ivf_fb")
    AI.build_ivf_index(corpus, d, n_centroids=8, meta_cols=["label"])
    qs = {str(r["vec_id"]): [float(x) for x in r["embedding"]]
          for r in emb.filter(F.col("vec_id").isin([0, 1])).collect()}
    out = AI.ivf_query_batch(spark, d, qs, k=5, nprobe=8,
                             where=F.col("label") == 1)
    ids = [r["id"] for r in out.collect()]
    labels = {r["vec_id"]: r["label"] for r in corpus.collect()}
    assert ids and all(labels[i] == 1 for i in ids)


# ------------------------------------------------------------ semdedup

def test_semantic_dedup_matches_numpy(spark):
    """SemDeDup parity vs a numpy mirror at sf0.001: identical
    centroid assignment (argmax cosine, tie cid asc) and identical
    keep/drop verdicts; non-vacuity: both classes present."""
    import numpy as np

    from katta_spark.ops.dedup import semantic_dedup

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        r["vec_id"]: (r["cid"], r["keep"])
        for r in semantic_dedup(e, n_centroids=8, threshold=0.3,
                                quantizer="seed").collect()
    }
    rows = sorted(
        ((r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
         for r in e.collect()),
        key=lambda x: x[0],
    )
    cents = np.stack([v for _, v in rows[:8]])
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    ids = np.array([i for i, _ in rows])
    vecs = np.stack([v for _, v in rows])
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cid = np.argmax(vn @ cn.T, axis=1)  # ties -> lowest index, same rule
    keep = np.ones(len(ids), dtype=bool)
    for c in range(8):
        members = np.where(cid == c)[0]
        sub = vn[members] @ vn[members].T
        for a in range(1, len(members)):
            if (sub[a, :a] >= 0.3).any():
                keep[members[a]] = False
    for j, i in enumerate(ids):
        assert got[int(i)] == (int(cid[j]), bool(keep[j])), i
    assert keep.all() is not True and keep.any()


def test_semantic_dedup_kmeans_refine_still_partitions(spark):
    """kmeans_iters>0 path: verdicts stay a full partition of the
    input (every row classified exactly once, keep column boolean)."""
    from katta_spark.ops.dedup import semantic_dedup

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(e, n_centroids=4, threshold=0.3,
                         kmeans_iters=2).collect()
    assert len(out) == e.count()
    assert len({r["vec_id"] for r in out}) == len(out)
    assert {r["keep"] for r in out} == {True, False}


def test_mmr_matches_python_mirror_and_diversifies(spark):
    """MMR greedy selection equals a pure-python mirror; with an
    exact duplicate of the best vector in the shortlist, plain
    relevance ranks it second but MMR (lam=0.5) pushes it last."""
    import numpy as np
    from pyspark.sql import functions as F

    from katta_spark.ops import similarity as S

    rng = np.random.default_rng(3)
    base = rng.normal(size=(8, 6))
    base[1] = base[0]                      # duplicate of the best
    q = base[0] + rng.normal(scale=0.01, size=6)
    rows = [(i, [float(x) for x in base[i]]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [(r["rank"], r["vec_id"])
           for r in S.mmr_rerank(df, [float(x) for x in q], k=8,
                                 lam=0.5).orderBy("rank").collect()]

    # python mirror (float32-cast embeddings, like the parquet column)
    V = np.stack([np.asarray(v, dtype=np.float32).astype(np.float64)
                  for _, v in rows])
    Vn = V / np.linalg.norm(V, axis=1)[:, None]
    qv = np.asarray(q, dtype=np.float64)
    rel = Vn @ (qv / np.linalg.norm(qv))
    sims = Vn @ Vn.T
    avail = set(range(8))
    maxsim = np.zeros(8)
    want = []
    for r in range(8):
        best, bi = -np.inf, None
        for i in sorted(avail):
            s = 0.5 * rel[i] - (0.0 if r == 0 else 0.5 * maxsim[i])
            if s > best + 1e-15:
                best, bi = s, i
        want.append((r, bi))
        avail.discard(bi)
        maxsim = np.maximum(maxsim, sims[:, bi])
    assert got == want
    # plain relevance would rank the duplicate (id 1) second; MMR
    # demotes it (its max-sim to the already-picked id 0 is 1.0)
    pos = [v for _, v in got].index(1)
    assert pos >= 2


def test_sq_index_quantization_and_recall(spark, tmp_path):
    """int8 SQ: codes match the numpy mirror (half-up floor), the
    approximate ranking is close to exact (rescored top-k EQUALS the
    exact top-k on this corpus), and approx-only mode returns the
    quantized cosine."""
    import math

    import numpy as np

    from katta_spark.ops.ann_index import build_sq_index, sq_query
    from katta_spark.ops.similarity import cosine_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    d = str(tmp_path / "sq")
    build_sq_index(emb.filter("vec_id != 0"), d)

    enc = {r["vec_id"]: r for r in
           spark.read.parquet(d).limit(50).collect()}
    for vid, r in list(enc.items())[:10]:
        v = np.array(r["embedding"], dtype=np.float64)
        scale = max(np.abs(v).max(), 1e-30) / 127.0
        want = np.floor(v / scale + 0.5).astype(int)
        assert list(want) == list(r["codes"])
        assert abs(r["code_norm"]
                   - math.sqrt(float((want * want).sum()))) < 1e-9
        assert max(abs(c) for c in r["codes"]) <= 127

    qv = [float(x) for x in
          emb.filter("vec_id = 0").first()["embedding"]]
    got = [(r["vec_id"], r["cos"]) for r in
           sq_query(spark, d, qv, k=10, rerank=30).collect()]
    exact = [
        (r["vec_id"], round(r["cos"], 6))
        for r in cosine_topk(
            emb.filter("vec_id != 0").select("vec_id", "embedding"),
            qv, 10).collect()
    ]
    assert [(v, round(c, 6)) for v, c in got] == exact
