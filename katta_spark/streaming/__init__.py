from katta_spark.streaming.ingest import stream_build

__all__ = ["stream_build"]
