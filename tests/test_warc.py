"""WARC container source (sources/warc.py): byte-exact framing,
binary-safe payloads, gzip path, HTTP envelope split, malformed input."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from dogsheep_beta_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    warc_bytes,
    write_warc_fixture,
)


def _recs():
    return [
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:1>",
            "target_uri": "http://example.com/a",
            "warc_date": "2020-01-01T00:00:00Z",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello world",
        },
        {
            "warc_type": "metadata",
            "record_id": "<urn:uuid:2>",
            "target_uri": "http://example.com/a",
            "warc_date": "2020-01-01T00:00:00Z",
            # binary-safe: payload contains CRLFCRLF and a fake header
            "payload": b"\r\n\r\nWARC/1.0\r\nnot a real record\x00\xff",
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:3>",
            "target_uri": "http://example.com/b",
            "warc_date": "2020-01-02T00:00:00Z",
            "payload": b"HTTP/1.1 404 Not Found\r\n\r\ngone",
        },
    ]


def test_roundtrip_parse_is_byte_exact():
    recs = _recs()
    parsed = list(parse_warc_records(warc_bytes(recs)))
    assert len(parsed) == 3
    for r, (off, wtype, rid, uri, date, clen, payload) in zip(recs, parsed):
        assert wtype == r["warc_type"]
        assert rid == r["record_id"]
        assert uri == r["target_uri"]
        assert clen == len(r["payload"])
        assert payload == r["payload"]  # byte-exact, incl. fake header


def test_read_warc_spark_plain_and_gzip(spark, tmpdir):
    recs = _recs()
    p1 = write_warc_fixture(recs, os.path.join(tmpdir, "seg1.warc"))
    p2 = write_warc_fixture(
        recs, os.path.join(tmpdir, "seg2.warc.gz"), compress=True
    )
    df = read_warc(spark, os.path.join(tmpdir, "*.warc*"))
    rows = df.orderBy("warc_file", "record_offset").collect()
    assert len(rows) == 6  # 3 per file
    assert {r.warc_type for r in rows} == {"response", "metadata"}
    by_id = {(r.warc_file.endswith("gz"), r.record_id): bytes(r.payload) for r in rows}
    for gz in (False, True):
        assert by_id[(gz, "<urn:uuid:2>")] == recs[1]["payload"]


def test_read_warc_http_split(spark, tmpdir):
    write_warc_fixture(_recs(), os.path.join(tmpdir, "seg.warc"))
    df = read_warc(spark, os.path.join(tmpdir, "seg.warc"), http_split=True)
    rows = {r.record_id: r for r in df.collect()}
    assert rows["<urn:uuid:1>"].http_status == 200
    assert bytes(rows["<urn:uuid:1>"].http_body) == b"hello world"
    assert rows["<urn:uuid:3>"].http_status == 404
    assert bytes(rows["<urn:uuid:3>"].http_body) == b"gone"
    assert rows["<urn:uuid:2>"].http_status is None
    assert rows["<urn:uuid:2>"].http_body is None


def test_malformed_warc_raises():
    with pytest.raises(ValueError, match="expected record header"):
        list(parse_warc_records(b"GARBAGE\r\n\r\n"))
    # truncated payload
    good = warc_bytes([_recs()[0]])
    with pytest.raises(ValueError, match="truncated payload"):
        list(parse_warc_records(good[:-20]))


def test_multimember_gzip_like_common_crawl(spark, tmpdir):
    """Common Crawl gzips each record as its own member; gzip reads
    member-concatenated streams transparently."""
    recs = _recs()
    buf = b"".join(gzip.compress(warc_bytes([r])) for r in recs)
    p = os.path.join(tmpdir, "cc.warc.gz")
    with open(p, "wb") as f:
        f.write(buf)
    df = read_warc(spark, p)
    assert df.count() == 3
    assert (
        df.agg(F.sum("content_length")).collect()[0][0]
        == sum(len(r["payload"]) for r in recs)
    )


def test_quarantine_mode_survives_corruption(spark, tmpdir):
    """One corrupt segment must not kill the job: good records before
    the corruption survive, the corruption surfaces as a
    __malformed__ marker row, and other files are unaffected."""
    recs = _recs()
    good = warc_bytes(recs)
    p_bad = os.path.join(tmpdir, "bad.warc")
    with open(p_bad, "wb") as f:
        f.write(good[:-20])  # truncate the last record's payload
    write_warc_fixture(recs, os.path.join(tmpdir, "good.warc"))
    # also a file that is not gzip despite the extension
    with open(os.path.join(tmpdir, "notgz.warc.gz"), "wb") as f:
        f.write(b"this is not gzip data")

    df = read_warc(spark, os.path.join(tmpdir, "*.warc*"), on_error="quarantine")
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(os.path.basename(r.warc_file), []).append(r)
    assert len(by_file["good.warc"]) == 3
    bad = by_file["bad.warc"]
    assert [r.warc_type for r in bad] == ["response", "metadata", "__malformed__"]
    assert b"truncated payload" in bytes(bad[-1].payload)
    notgz = by_file["notgz.warc.gz"]
    assert [r.warc_type for r in notgz] == ["__malformed__"]
    # default raise posture still aborts
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_warc(spark, p_bad).collect()
