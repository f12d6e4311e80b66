import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from katta_spark.corpus import synthetic_corpus, with_ingest_columns  # noqa: E402
from katta_spark.index import build_index, PhysicalIndex  # noqa: E402
from katta_spark.session import get_spark  # noqa: E402

N_DOCS = 2000
BLOCK_RANGE = 256
N_GROUPS = 3


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="katta_tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    return synthetic_corpus(spark, N_DOCS)


@pytest.fixture(scope="session")
def docs(spark, corpus):
    """Corpus + engine-derived doc_id / content_sha256, materialized."""
    d = with_ingest_columns(corpus)
    d.cache().count()
    return d


@pytest.fixture(scope="session")
def pandas_docs(docs):
    return docs.select("doc_id", "repo", "path", "commit", "lang",
                       "content", "content_sha256").toPandas()


@pytest.fixture(scope="session")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("katta") / "idx")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, corpus, d, n_groups=N_GROUPS, block_range=BLOCK_RANGE)
    return d


@pytest.fixture(scope="session")
def pindex(spark, index_dir):
    return PhysicalIndex(spark, index_dir)
