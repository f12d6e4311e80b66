from katta_spark.streaming.dedup import stream_dedup_exact
from katta_spark.streaming.ingest import stream_build

__all__ = ["stream_build", "stream_dedup_exact"]
