from pyspark.sql import functions as F

from katta_spark.tokenizer import (
    path_tokens_array,
    py_path_tokenize,
    py_tokenize,
    tokens_array,
)

CASES = [
    "getUserName",
    "HTTPRequest handler",
    "read_file_chunk(arg)",
    "x = 1",  # 1-char tokens dropped
    "parseHTTPResponse2 urlEncode_mixedCase",
    "",
    "import os\nimport sys\ndef f(): return A_B",
    "snake_case camelCase UPPER lower 42 a1b2C3",
]


def test_py_tokenizer_cases():
    assert py_tokenize("getUserName") == ["get", "user", "name", "getusername"]
    assert py_tokenize("HTTPRequest") == ["http", "request", "httprequest"]
    assert py_tokenize("read_file_chunk") == [
        "read", "file", "chunk", "read_file_chunk"
    ]
    assert py_tokenize("x = 1") == []  # all sub-tokens shorter than 2
    assert py_tokenize("os") == ["os"]


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "id int, t string")
    got = {
        r["id"]: list(r["toks"])
        for r in df.select("id", tokens_array("t").alias("toks")).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == py_tokenize(t), f"case {i!r}: {t!r}"


def test_spark_matches_python_on_corpus(docs):
    sample = docs.limit(200).select(
        "doc_id", "content", tokens_array("content").alias("toks")
    ).collect()
    for r in sample:
        assert list(r["toks"]) == py_tokenize(r["content"])


def test_path_tokenizer(spark):
    df = spark.createDataFrame(
        [(0, "src/pkg_a/HTTP-Module.v2.py")], "id int, p string"
    )
    got = df.select(path_tokens_array("p").alias("t")).first()["t"]
    assert list(got) == py_path_tokenize("src/pkg_a/HTTP-Module.v2.py")
    assert list(got) == ["src", "pkg", "http", "module", "v2", "py"]


def test_tokenizer_stays_jvm_side(spark):
    """The analyzer must be a pure Column expression — no BatchEvalPython /
    ArrowEvalPython node may appear in the plan (UDFs are the slow path)."""
    df = spark.range(10).select(
        tokens_array(F.col("id").cast("string")).alias("t")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
