"""Training-pipeline ops: benchmark decontamination + sequence
packing (driver-contract oracles check exact values; these tests pin
the structural invariants)."""

import pytest
from pyspark.sql import functions as F

from katta_spark.corpus import synthetic_corpus
from katta_spark.ops import decontam, packing


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_corpus(spark, 300).withColumn(
        "n_chars", F.length("content")
    ).withColumn("doc_id", F.monotonically_increasing_id()).cache()


def test_decontam_bench_docs_fully_contaminated(spark, corpus):
    """Docs that ARE the benchmark overlap 100%; the report covers
    every corpus doc exactly once; overlap is within [0, 1]."""
    bench = corpus.filter(F.col("doc_id") % 7 == 0)
    rep = decontam.ngram_overlap(
        corpus, bench, n=5, threshold=0.5, text_col="content"
    ).cache()
    assert rep.count() == corpus.count()
    assert rep.select("doc_id").distinct().count() == corpus.count()
    bad = rep.filter((F.col("overlap") < 0) | (F.col("overlap") > 1)).count()
    assert bad == 0
    bench_rows = rep.join(bench.select("doc_id"), "doc_id").filter(
        F.col("n_ngrams") > 0
    )
    assert bench_rows.filter(F.col("overlap") < 1.0).count() == 0
    assert bench_rows.filter(~F.col("contaminated")).count() == 0


def test_decontam_disjoint_bench_is_clean(spark, corpus):
    """A benchmark with no shared vocabulary marks nothing."""
    bench = spark.createDataFrame(
        [(0, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg")],
        "doc_id long, content string",
    )
    rep = decontam.ngram_overlap(
        corpus, bench, n=5, threshold=0.1, text_col="content"
    )
    assert rep.filter(F.col("n_matched") > 0).count() == 0
    assert rep.filter(F.col("contaminated")).count() == 0


def test_pack_greedy_invariants(spark, corpus):
    """Every doc packed exactly once; no pack exceeds the budget
    unless it holds a single oversized doc; offsets are the exact
    running sums; pack ids are dense per group; packing is
    partition-layout invariant."""
    budget = 1500
    packed = packing.pack_greedy(
        corpus, budget, size_col="n_chars", group_col="lang"
    ).cache()
    assert packed.count() == corpus.count()

    stats = packing.pack_stats(packed, budget).cache()
    over = stats.filter((F.col("total") > budget) & (F.col("n_docs") > 1))
    assert over.count() == 0

    # offset of each doc == sum of sizes of earlier docs in its pack
    from pyspark.sql import Window
    w = (
        Window.partitionBy("grp", "pack_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chk = packed.withColumn(
        "want_off", F.coalesce(F.sum("size").over(w), F.lit(0))
    )
    assert chk.filter(F.col("pack_offset") != F.col("want_off")).count() == 0

    # dense pack ids: max(pack_id)+1 == n_packs per group
    dense = stats.groupBy("grp").agg(
        (F.max("pack_id") + 1).alias("want"), F.count(F.lit(1)).alias("got")
    )
    assert dense.filter(F.col("want") != F.col("got")).count() == 0

    # layout invariance: repartitioned input packs identically
    re = packing.pack_greedy(
        corpus.repartition(13), budget, size_col="n_chars", group_col="lang"
    )
    assert packed.exceptAll(re).count() == 0 and re.exceptAll(packed).count() == 0


def test_pack_oversized_doc_gets_own_pack(spark):
    rows = [(1, "g", 10), (2, "g", 5000), (3, "g", 20)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, sz long")
    packed = packing.pack_greedy(
        df, budget=100, size_col="sz", group_col="grp"
    ).orderBy("doc_id").collect()
    assert [r["pack_id"] for r in packed] == [0, 1, 2]
    assert [r["pack_offset"] for r in packed] == [0, 0, 0]


def test_unigram_logprob_orders_by_typicality(spark):
    """A doc repeating the corpus-dominant token scores higher
    (closer to 0) than a doc of one-off tokens; weights: avg equals
    the hand-computed MLE value."""
    import math

    from katta_spark.ops import text as T

    rows = [
        (1, "alpha alpha alpha alpha"),
        (2, "alpha alpha beta beta"),
        (3, "gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    out = {r["doc_id"]: r for r in T.unigram_logprob(df).collect()}
    # corpus counts: alpha 6, beta 2, gamma 1, delta 1; total 10
    want1 = math.log(6 / 10)
    want3 = (math.log(1 / 10) + math.log(1 / 10)) / 2
    assert out[1]["avg_logprob"] == round(want1, 6)
    assert out[3]["avg_logprob"] == round(want3, 6)
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"] > out[3]["avg_logprob"]
    assert out[1]["n_tokens"] == 4


def test_code_quality_flags(spark):
    from katta_spark.ops import text as T

    rows = [
        (1, "# comment\ndef foo():\n    return 1\n"),
        (2, "x" * 5000),                        # one pathological line
        (3, "(((((((((((())))))))))))" * 40),   # low alnum fraction
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    out = {r["doc_id"]: r for r in T.code_quality(df).collect()}
    assert out[1]["keep"] is True
    assert out[1]["comment_ratio"] == round(1 / 3, 6)
    assert out[2]["keep"] is False and out[2]["max_line_len"] == 5000
    assert out[3]["keep"] is False and out[3]["alnum_frac"] == 0.0


def test_containment_catches_embedded_doc(spark):
    """A short doc fully embedded in a long doc has containment 1.0
    even though its Jaccard vs the long doc is far below threshold."""
    from katta_spark.ops import dedup as D

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"tok{i} filler{i} word{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, long), (2, short), (3, "completely different text here")],
        "doc_id long, content string",
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in D.containment_pairs(df, threshold=0.9, n=3).collect()
    }
    assert cont == {(1, 2): 1.0}
    jac = D.ngram_jaccard_pairs(df, threshold=0.5, n=3).collect()
    assert jac == []  # resemblance misses the embedding


def test_nfc_composes_combining_sequences(spark):
    from katta_spark.ops import text as T

    decomposed = "caf" + "é"           # e + COMBINING ACUTE
    composed = "café"
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, "ascii only")],
        "doc_id long, content string",
    )
    out = {r["doc_id"]: r for r in T.nfc_normalize(df).collect()}
    assert out[1]["text_nfc"] == composed and out[1]["changed"] is True
    assert out[2]["text_nfc"] == composed and out[2]["changed"] is False
    assert out[3]["changed"] is False


def test_temperature_sample_flattens_head_group(spark):
    """The dominant group is downsampled hardest; tiny groups keep
    ~everything; membership is partition invariant."""
    from katta_spark.ops import sampling as S

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    rates = {r["grp"]: r for r in S.temperature_rates(df, "grp", alpha=0.5).collect()}
    assert rates["small"]["rate"] == 1.0          # upweight capped at 1
    assert rates["big"]["rate"] < 0.85            # head downsampled
    samp = S.temperature_sample(df, "grp", alpha=0.5).cache()
    again = S.temperature_sample(df.repartition(17), "grp", alpha=0.5)
    assert samp.exceptAll(again).count() == 0
    assert again.exceptAll(samp).count() == 0
    kept = {r["grp"]: r["n"] for r in samp.groupBy("grp").agg(
        F.count("*").alias("n")).collect()}
    assert kept["small"] == 100
    assert kept["big"] < 900 * 0.85


# ------------------------------------------------------------- DSIR

def test_dsir_weights_match_python_mirror(spark, corpus):
    """Per-doc log importance weights == an independent pure-Python
    mirror (hashlib md5 buckets, Counter distributions, float sums);
    and docs FROM the target slice score higher on average than the
    rest (the op steers toward the target)."""
    import hashlib
    import math
    from collections import Counter

    from katta_spark.ops import dsir
    from katta_spark.tokenizer import py_tokenize

    nf, alpha = 512, 1.0
    rows = corpus.select("doc_id", "content", "lang").collect()
    tgt_langs = {"python"} if any(
        r["lang"] == "python" for r in rows) else {rows[0]["lang"]}

    def buckets(text):
        toks = py_tokenize(text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return Counter(
            int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % nf
            for f in feats
        )

    per_doc = {int(r["doc_id"]): buckets(r["content"]) for r in rows}
    tgt_ids = {int(r["doc_id"]) for r in rows if r["lang"] in tgt_langs}
    q = Counter()
    p = Counter()
    for d, c in per_doc.items():
        q.update(c)
        if d in tgt_ids:
            p.update(c)
    tq, tp = sum(q.values()), sum(p.values())
    lr = {
        b: math.log((p.get(b, 0) + alpha) / (tp + alpha * nf))
        - math.log((cq + alpha) / (tq + alpha * nf))
        for b, cq in q.items()
    }
    want = {
        d: round(sum(cnt * lr[b] for b, cnt in c.items()), 6)
        for d, c in per_doc.items()
    }

    tgt = corpus.filter(F.col("lang").isin(*tgt_langs))
    got = {
        int(r["doc_id"]): r["logw"]
        for r in dsir.dsir_weights(
            corpus, tgt, text_col="content", n_features=nf, alpha=alpha
        ).collect()
    }
    assert got == want
    in_t = [got[d] for d in got if d in tgt_ids]
    out_t = [got[d] for d in got if d not in tgt_ids]
    assert sum(in_t) / len(in_t) > sum(out_t) / len(out_t)


def test_dsir_select_deterministic_and_weighted(spark, corpus):
    """Gumbel top-k is identical across reruns/partitionings (pure
    function of the rows) and enriches the target slice vs a uniform
    draw of the same size."""
    from katta_spark.ops import dsir

    lang = corpus.select("lang").first()["lang"]
    tgt = corpus.filter(F.col("lang") == lang)
    k = 40
    a = dsir.dsir_select(corpus, tgt, k=k, text_col="content",
                         n_features=512)
    b = dsir.dsir_select(corpus.repartition(13), tgt, k=k,
                         text_col="content", n_features=512)
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in b.collect())
    assert rows_a == rows_b
    sel = {r[0] for r in rows_a}
    tgt_ids = {r["doc_id"] for r in tgt.select("doc_id").collect()}
    base_rate = len(tgt_ids) / corpus.count()
    sel_rate = len(sel & tgt_ids) / k
    assert sel_rate > base_rate


def test_duplicate_spans_exact_positions(spark):
    """Hand-crafted corpus: an 8-token boilerplate shared by two docs
    is flagged at the right start positions; unique text is not."""
    from katta_spark.ops.dedup import dup_span_stats, duplicate_spans

    boiler = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (0, boiler + " unique tail zero here"),
        (1, "lead in words " + boiler),
        (2, "completely different content nothing shared at all ok"),
        (3, "short doc"),  # shorter than the window -> no spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {
        (r["doc_id"], r["pos"]): r["n_occ"]
        for r in duplicate_spans(df, width=8).collect()
    }
    # doc 0: boilerplate starts at token 0; doc 1: after 3 lead tokens
    assert got[(0, 0)] == 2
    assert got[(1, 3)] == 2
    assert all(d != 2 and d != 3 for d, _ in got)

    stats = {r["doc_id"]: r for r in dup_span_stats(df, width=8).collect()}
    assert stats[0]["dup_tokens"] == 8
    assert stats[2]["dup_tokens"] == 0 and stats[2]["dup_frac"] == 0.0
    assert stats[3]["n_tokens"] < 8 and stats[3]["dup_tokens"] == 0
    assert abs(stats[0]["dup_frac"] - 8 / stats[0]["n_tokens"]) < 1e-6


def test_duplicate_spans_fuzz_parity_python_mirror(spark):
    """Seeded random corpora over a tiny alphabet (forces real window
    collisions): Spark output == a pure-python rolling-window mirror
    built on the same tokenizer."""
    import random

    from katta_spark.ops.dedup import duplicate_spans
    from katta_spark.tokenizer import py_tokenize

    rng = random.Random(42)
    alphabet = ["alpha", "beta", "gamma", "delta"]
    w = 3
    rows = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {
        (r["doc_id"], r["pos"]): r["n_occ"]
        for r in duplicate_spans(df, width=w).collect()
    }

    from collections import Counter

    spans = []
    for doc_id, text in rows:
        toks = py_tokenize(text)
        for pos in range(len(toks) - w + 1):
            spans.append((doc_id, pos, " ".join(toks[pos:pos + w])))
    counts = Counter(s for _, _, s in spans)
    want = {
        (d, p): counts[s] for d, p, s in spans if counts[s] > 1
    }
    assert got == want


def test_trim_duplicate_spans_first_wins(spark):
    """Removal half of substring dedup: the first occurrence of the
    boilerplate (doc 0, pos 0) survives; the copy in doc 1 is cut;
    untouched docs rebuild to their exact token stream."""
    from katta_spark.ops.dedup import trim_duplicate_spans
    from katta_spark.tokenizer import py_tokenize

    boiler = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (0, boiler + " unique tail zero here"),
        (1, "lead in words " + boiler),
        (2, "completely different content nothing shared at all ok"),
        (3, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {r["doc_id"]: r for r in trim_duplicate_spans(df, width=8).collect()}
    # doc 0 keeps everything (it is the winner)
    assert got[0]["n_removed"] == 0
    assert got[0]["text_kept"] == " ".join(py_tokenize(rows[0][1]))
    # doc 1 loses exactly the 8 boilerplate tokens, keeps its lead
    assert got[1]["n_removed"] == 8
    assert got[1]["text_kept"] == "lead in words"
    # unique and short docs untouched
    for d in (2, 3):
        assert got[d]["n_removed"] == 0
        assert got[d]["text_kept"] == " ".join(py_tokenize(rows[d][1]))


def test_trim_duplicate_spans_fuzz_no_dup_windows_remain(spark):
    """Property: after one trim pass with first-wins, every window
    that was duplicated has lost all non-winning occurrences — and
    total kept tokens = original - removed."""
    import random

    from katta_spark.ops.dedup import trim_duplicate_spans

    rng = random.Random(7)
    alphabet = ["alpha", "beta", "gamma"]
    rows = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(2, 18))))
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    w = 3
    got = {r["doc_id"]: r for r in trim_duplicate_spans(df, width=w).collect()}
    # python mirror
    toks = {d: t.split() for d, t in rows}
    from collections import defaultdict

    occ = defaultdict(list)
    for d in sorted(toks):
        t = toks[d]
        for p in range(len(t) - w + 1):
            occ[tuple(t[p:p + w])].append((d, p))
    cut = defaultdict(set)
    for k, lst in occ.items():
        if len(lst) > 1:
            for d, p in sorted(lst)[1:]:
                cut[d].update(range(p, p + w))
    for d, t in toks.items():
        want = [tok for i, tok in enumerate(t) if i not in cut[d]]
        assert got[d]["n_tokens"] == len(t)
        assert got[d]["n_removed"] == len(cut[d])
        assert got[d]["text_kept"] == " ".join(want)


def test_write_training_shards_jsonl(spark, tmp_path):
    """JSONL shards: same deterministic membership as parquet, one
    object per line, manifest digest format-independent."""
    import json
    from pathlib import Path

    from katta_spark.ops.packing import write_training_shards

    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    dp = str(tmp_path / "shards_pq")
    dj = str(tmp_path / "shards_js")
    mp = write_training_shards(df, dp, 4)
    mj = write_training_shards(df, dj, 4, data_format="json")
    assert mj["format"] == "json"
    assert {k: v for k, v in mp["shards"].items()} == mj["shards"]
    # readable JSONL, rows match per shard
    for s, info in mj["shards"].items():
        files = list(Path(dj).glob(f"shard={s}/*.json"))
        assert files
        lines = [json.loads(x) for f in files
                 for x in f.read_text().splitlines()]
        assert len(lines) == info["rows"]
        assert all("doc_id" in r and "lang" in r for r in lines)


def test_verify_shards_detects_tamper(spark, tmp_path):
    """The manifest verifier passes a fresh write and fails after a
    shard file is tampered with."""
    import shutil
    from pathlib import Path

    from katta_spark.ops.packing import write_training_shards
    from tools.verify_shards import verify

    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    d = str(tmp_path / "shards_v")
    write_training_shards(df, d, 3)
    assert verify(d, spark)["ok"]
    # tamper: replace shard 1's file with a copy of shard 0's (new
    # file name so sizes stay self-consistent for the reader)
    victim = next(Path(d).glob("shard=1/*.parquet"))
    donor = next(Path(d).glob("shard=0/*.parquet"))
    shutil.copy(donor, victim.parent / ("x" + donor.name))
    victim.unlink()
    res = verify(d, spark)
    assert not res["ok"] and 0 not in res["mismatched"]


def test_graph_expand_bfs_with_cycle(spark):
    """Cycle a->b->c->a: min hop distances are exact, the cycle never
    re-expands, and max_hops bounds the walk."""
    from katta_spark.ops.graph import graph_expand

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d")],
        ["src", "dst"])
    got = {r["node"]: r["hops"]
           for r in graph_expand(edges, "src", "dst", ["a"],
                                 max_hops=5).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 2}
    # hop bound honored
    got1 = {r["node"]: r["hops"]
            for r in graph_expand(edges, "src", "dst", ["a"],
                                  max_hops=1).collect()}
    assert got1 == {"a": 0, "b": 1}


def test_frequent_item_sets_hand_computed(spark):
    """Baskets {a,b,c}, {a,b}, {a}: pair (a,b) support 2, singles
    a=3 b=2, c filtered by min_support; duplicate rows in one basket
    never inflate support."""
    from katta_spark.ops.sampling import frequent_item_sets

    rows = [(1, "a"), (1, "b"), (1, "c"), (1, "a"),
            (2, "a"), (2, "b"), (3, "a")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = [(tuple(r["items"]), r["support"])
           for r in frequent_item_sets(df, "basket", "item",
                                       min_support=2, n=10).collect()]
    assert got == [(("a",), 3), (("a", "b"), 2), (("b",), 2)]


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every member of a duplicate cluster lands in the SAME split;
    singletons split independently; the doc-level split would have
    straddled at least one cluster on this fixture (the leakage the
    op exists to prevent is actually exercised)."""
    from katta_spark.ops.sampling import hash_bucket, leakage_safe_split

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    # clusters: {0,1,2}, {10,11}, rest singleton
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        ["doc_id", "cluster"])
    out = leakage_safe_split(docs, clusters, test_pct=30).collect()
    by = {r["doc_id"]: (r["cluster_rep"], r["split"]) for r in out}
    assert len(by) == 200
    assert by[0] == by[1] == by[2]
    assert by[10] == by[11]
    # both splits exist at 30%
    splits = {s for _, s in by.values()}
    assert splits == {"train", "test"}
    # doc-level buckets WOULD have disagreed within some cluster
    from pyspark.sql import functions as F
    b = {r["doc_id"]: r["b"] for r in docs.filter(F.col("doc_id") < 3)
         .select("doc_id", hash_bucket(F.col("doc_id"),
                                       "split").alias("b")).collect()}
    assert len({v < 3000 for v in b.values()}) >= 1


def test_minhash_decontam_flags_near_duplicate_of_bench(spark):
    """A corpus doc that is a light edit of a benchmark doc must band-
    collide and score a high signature-agreement Jaccard; an unrelated
    doc must not appear at all.  Exact duplicates estimate 1.0."""
    base = ("the quick brown fox jumps over the lazy dog while the "
            "band plays on and the crowd cheers loudly tonight")
    near = base.replace("cheers loudly", "cheers very loudly")
    corpus = spark.createDataFrame(
        [(1, base),            # exact copy of bench doc 100
         (2, near),            # near-duplicate (one inserted word)
         (3, "completely unrelated text about spark shuffles and "
             "parquet row groups going wide")],
        "doc_id long, content string",
    )
    bench = spark.createDataFrame([(100, base)],
                                  "doc_id long, content string")
    rep = decontam.minhash_decontaminate(
        corpus, bench, text_col="content", threshold=0.5
    ).toPandas().set_index("doc_id")
    assert 1 in rep.index and rep.loc[1, "jaccard_est"] == 1.0
    assert bool(rep.loc[1, "contaminated"])
    assert 2 in rep.index and rep.loc[2, "jaccard_est"] >= 0.5
    assert 3 not in rep.index


def test_minhash_decontam_excludes_self_pairs(spark, corpus):
    """When the benchmark is carved from the corpus, a doc never
    reports a collision with ITSELF (doc_id == bench_id)."""
    bench = corpus.filter(F.col("doc_id") % 37 == 0)
    rep = decontam.minhash_decontaminate(corpus, bench,
                                         text_col="content")
    assert rep.filter(F.col("doc_id") == F.col("bench_id")).count() == 0


def test_minhash_decontam_independent_bench_keeps_id_collisions(spark):
    """With an INDEPENDENT benchmark (exclude_self=False), a corpus
    doc that happens to share its id with the benchmark doc it leaks
    still reports the pair — dropping it would hide a verbatim
    leak."""
    text = ("the quick brown fox jumps over the lazy dog while the "
            "band plays on and the crowd cheers loudly tonight")
    corpus = spark.createDataFrame([(5, text)],
                                   "doc_id long, content string")
    bench = spark.createDataFrame([(5, text)],
                                  "doc_id long, content string")
    rep = decontam.minhash_decontaminate(
        corpus, bench, text_col="content", exclude_self=False
    ).collect()
    assert len(rep) == 1 and rep[0]["jaccard_est"] == 1.0
