"""Source-format readers beyond Spark's built-ins (parquet/json/csv
come free via ``spark.read``)."""

from katta_spark.sources.warc import (  # noqa: F401
    attach_warc_payload,
    parse_warc_records,
    read_warc,
    warc_record_bytes,
)
