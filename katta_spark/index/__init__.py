"""Physical inverted index: compressed posting blocks on parquet.

Layout (the Spark-native analogue of a Katta index directory of
Lucene shards — reference: one shard = one Lucene index dir,
katta-core/.../lib/lucene/LuceneServer.java:70-73):

    <index_dir>/docs/       doc_id, repo, path, commit, lang,
                            content_sha256, dl (+ stored content)
    <index_dir>/postings/   group=<g>/ ... one row per (term, block)
    <index_dir>/terms/      global term catalog (term, df, cf)
    <index_dir>/stats.json  N, avgdl, build config
    <index_dir>/manifest/   per-group lineage + metrics (JSON rows)

In production these are Iceberg tables (snapshot commit = Katta's
``index.done`` marker + commit-id rename,
katta-core/.../lib/writer/DefaultDataWriter.java:314-389); in this
sandbox the manifest JSON provides the same commit/resume semantics
over plain parquet.
"""

from katta_spark.index.build import build_index, load_manifest
from katta_spark.index.compact import compact_postings
from katta_spark.index.delete import (
    delete_by_query,
    delete_docs,
    expunge_deletes,
)
from katta_spark.index.merge import merge_indexes
from katta_spark.index.search import PhysicalIndex
from katta_spark.index.update import update_docs

__all__ = [
    "build_index",
    "compact_postings",
    "delete_by_query",
    "delete_docs",
    "expunge_deletes",
    "load_manifest",
    "merge_indexes",
    "update_docs",
    "PhysicalIndex",
]
