"""WARC (Web ARChive, ISO 28500) source — the Common Crawl ingest
format every web-scale training pipeline starts from.

A REAL parser over real bytes, no external libs: a WARC file is a
sequence of records, each ``WARC/1.0\\r\\n`` + header lines +
``\\r\\n\\r\\n`` + exactly ``Content-Length`` payload octets +
``\\r\\n\\r\\n``.  :func:`read_warc` turns a directory of ``.warc``
files into a DataFrame via Spark's ``binaryFile`` source + an
Arrow-batched record splitter (one input FILE per row in, one record
per row out — the explode-shaped kernel; at 100 TB the parallelism
unit is the WARC file, exactly how Common Crawl shards are
processed, and payload bytes never touch the driver).

For the oracle-checked driver path, :func:`attach_warc_payload`
builds one real record per document and :func:`parse_warc_records`
parses the bytes back — the generator's field formulas state what
the parser must recover (the PGM/WAV device).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA = ("doc_id long, warc_type string, target_uri string, "
                 "content_length long, payload_text string")
FILE_RECORD_SCHEMA = ("path string, record_idx int, warc_type string, "
                      "target_uri string, content_length long, "
                      "payload binary")


def warc_record_bytes(payload: bytes, target_uri: str,
                      warc_type: str = "response",
                      record_id: str | None = None) -> bytes:
    """One well-formed WARC/1.0 record."""
    headers = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Target-URI: {target_uri}",
    ]
    if record_id:
        headers.append(f"WARC-Record-ID: <urn:uuid:{record_id}>")
    headers.append(f"Content-Length: {len(payload)}")
    head = "\r\n".join(headers).encode() + b"\r\n\r\n"
    return head + payload + b"\r\n\r\n"


def _iter_warc_records(buf: bytes):
    """Yield (warc_type, target_uri, payload bytes) by really walking
    the records: header block to the blank line, then exactly
    Content-Length octets (binary payloads with embedded \\r\\n\\r\\n
    are safe — the walk never scans the payload)."""
    pos = 0
    while pos < len(buf):
        if buf[pos:pos + 5] != b"WARC/":
            raise ValueError(f"bad record boundary at byte {pos}")
        hdr_end = buf.index(b"\r\n\r\n", pos)
        headers: dict[str, str] = {}
        for line in buf[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers["content-length"])
        body = buf[hdr_end + 4:hdr_end + 4 + n]
        yield (headers.get("warc-type", ""),
               headers.get("warc-target-uri", ""), body)
        pos = hdr_end + 4 + n + 4  # skip the record-final \r\n\r\n


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Directory/glob of ``.warc`` files -> one row per record:
    (path, record_idx, warc_type, target_uri, content_length,
    payload)."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"path": [], "record_idx": [], "warc_type": [],
                   "target_uri": [], "content_length": [], "payload": []}
            for path, content in zip(b["path"], b["content"]):
                for i, (t, uri, body) in enumerate(
                        _iter_warc_records(bytes(content))):
                    out["path"].append(path)
                    out["record_idx"].append(i)
                    out["warc_type"].append(t)
                    out["target_uri"].append(uri)
                    out["content_length"].append(len(body))
                    out["payload"].append(body)
            yield pd.DataFrame(out)

    return files.mapInPandas(kernel, FILE_RECORD_SCHEMA)


def attach_warc_payload(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) — one REAL WARC record per row: the doc's
    text (utf-8) as a response record for
    ``https://example.org/doc/{id}``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                warc_record_bytes(
                    str(t).encode("utf-8"),
                    f"https://example.org/doc/{int(i)}",
                )
                for i, t in zip(b[id_col], b[text_col])
            ]
            yield pd.DataFrame({"doc_id": b[id_col].astype("int64"),
                                "payload": rows})

    return df.select(id_col, text_col).mapInPandas(
        kernel, "doc_id long, payload binary")


def parse_warc_records(df: DataFrame) -> DataFrame:
    """payload -> (doc_id, warc_type, target_uri, content_length,
    payload_text) via the REAL record walk."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "warc_type": [], "target_uri": [],
                   "content_length": [], "payload_text": []}
            for doc_id, p in zip(b["doc_id"], b["payload"]):
                for t, uri, body in _iter_warc_records(bytes(p)):
                    out["doc_id"].append(int(doc_id))
                    out["warc_type"].append(t)
                    out["target_uri"].append(uri)
                    out["content_length"].append(len(body))
                    out["payload_text"].append(
                        body.decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        kernel, RECORD_SCHEMA)
