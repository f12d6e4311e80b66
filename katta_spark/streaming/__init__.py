from katta_spark.streaming.dedup import stream_dedup_exact, stream_dedup_minhash
from katta_spark.streaming.ingest import stream_build
from katta_spark.streaming.percolate import percolate

__all__ = [
    "percolate",
    "stream_build",
    "stream_dedup_exact",
    "stream_dedup_minhash",
]
