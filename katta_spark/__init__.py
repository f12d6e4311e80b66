"""katta_spark — a PySpark-native inverted-index + BM25 analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of zhenqin/katta (a distributed Lucene-shard search
system) as idiomatic Spark DataFrame programs:

- distributed inverted-index build (tokenize -> postings -> global
  term catalog), the Spark analogue of Katta's MapReduce index build
  (reference: katta-hadoop/.../LuceneDocumentOutputFormat.java) and
  murmur3 shard routing (lib/writer/DefaultDataWriter.java:171-184);
- BM25 top-k search with a broadcast global term catalog, restoring
  the deprecated global-IDF contract documented at
  katta-core/.../lib/lucene/LuceneServer.java:76-82;
- count / group / facet / range-facet / sorted-pagination query
  surface (LuceneServer.java:768-773, 1726-1764, 1904-1971,
  1197-1304, 931-961);
- large-scale training-data pipeline operators (dedup, similarity
  search, text analysis) over the same corpus substrate.

Everything is DataFrame-first: Catalyst plans the physical execution;
custom kernels (posting codec, block-max WAND) live in vectorized
numpy inside mapInPandas/applyInPandas.
"""

__version__ = "0.1.0"
