"""WARC source: real record walk over real files (binaryFile +
Arrow splitter) and the attach->parse roundtrip."""

import pytest

from katta_spark.sources import (
    attach_warc_payload,
    parse_warc_records,
    read_warc,
    warc_record_bytes,
)
from katta_spark.sources.warc import _iter_warc_records


def test_warc_file_read_and_tricky_payload(spark, tmp_path):
    """A payload CONTAINING the record separator bytes must not split
    the record (Content-Length delimits, never scanning)."""
    tricky = b"inner\r\n\r\nWARC/1.0 fake header\r\n\r\nrest"
    buf = (
        warc_record_bytes(b"hello world", "https://a/1")
        + warc_record_bytes(tricky, "https://a/2", warc_type="resource")
        + warc_record_bytes("unicodé".encode(), "https://a/3")
    )
    recs = list(_iter_warc_records(buf))
    assert [(t, u) for t, u, _ in recs] == [
        ("response", "https://a/1"), ("resource", "https://a/2"),
        ("response", "https://a/3")]
    assert recs[1][2] == tricky

    d = tmp_path / "warcs"
    d.mkdir()
    (d / "part0.warc").write_bytes(buf)
    (d / "part1.warc").write_bytes(
        warc_record_bytes(b"second file", "https://b/1"))
    out = read_warc(spark, str(d)).collect()
    assert len(out) == 4
    by_uri = {r["target_uri"]: r for r in out}
    assert bytes(by_uri["https://a/2"]["payload"]) == tricky
    assert by_uri["https://a/1"]["content_length"] == 11
    assert by_uri["https://b/1"]["record_idx"] == 0


def test_warc_attach_parse_roundtrip(spark):
    df = spark.createDataFrame(
        [(7, "some text"), (9, "café über")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in parse_warc_records(
        attach_warc_payload(df)).collect()}
    assert out[7]["target_uri"] == "https://example.org/doc/7"
    assert out[9]["payload_text"] == "café über"
    assert out[9]["content_length"] == len("café über".encode())
