"""WARC source ingestion (ISO 28500 — the web-crawl container format).

A 100 TB text corpus usually STARTS as WARC: Common Crawl publishes
~1 GB ``.warc.gz`` segments, each a concatenation of length-prefixed
records (request / response / metadata).  The Spark-native ingestion
shape is file-level parallelism: ``spark.read.format("binaryFile")``
gives one row per segment file (path, bytes), and a ``mapInPandas``
pass splits each file into records by honoring the ``Content-Length``
header — the only correct way to frame WARC (payloads are binary and
may contain anything, including things that look like record
headers).  One task per segment ≈ the unit Common Crawl is published
in, so a thousand-executor cluster reads a thousand segments at once;
no record ever passes through the driver.

Supported at full fidelity: plain ``.warc`` and whole-file /
multi-member gzip ``.warc.gz`` (Python's gzip reads member-concatenated
streams, which is exactly the per-record-gzipped layout Common Crawl
uses).  Response records optionally split the HTTP envelope from the
body (``http_split=True``).

The reference has no crawl-container story (its sources are SQLite
dbs, reference/dogsheep_beta/cli.py:27-32); this module extends the
engine's source surface the same way sources/sqlite.py:read_sqlite_table
extends it for dogsheep dbs, and the AVI/RIFF demuxer
(functions/codecs.py) does for media containers.

``warc_bytes``/``write_warc_fixture`` build byte-exact WARC files from
rows — the deterministic fixture path the round-trip oracle pins
(payload bytes → Content-Length framing → parse → identical payload).
"""

from __future__ import annotations

import gzip
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

#: output schema of read_warc (payload kept as binary — decode is the
#: caller's decision, same discipline as operators/multimodal.py)
WARC_SCHEMA = (
    "warc_file string, record_offset long, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_length long, payload binary"
)


def parse_warc_records(buf: bytes, on_error: str = "raise") -> Iterator[tuple]:
    """Split one WARC file's bytes into records.

    Framing per ISO 28500: a header block terminated by CRLFCRLF whose
    ``Content-Length`` gives the EXACT payload byte count, then the
    payload, then two CRLFs.  Seeking by Content-Length (never by
    scanning for the next magic) is what makes binary payloads safe.
    Yields (offset, warc_type, record_id, target_uri, warc_date,
    content_length, payload).

    ``on_error``: ``"raise"`` aborts on the first malformed byte (the
    fixture/round-trip posture); ``"quarantine"`` — the crawl posture,
    where one corrupt record in one segment must NOT kill a
    terabyte-scale job — stops parsing THAT FILE at the bad offset
    (Content-Length framing cannot be resynced safely) and yields one
    final marker record with ``warc_type='__malformed__'`` whose
    payload is the error message, so corruption is visible downstream
    instead of silently swallowed."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, got {on_error!r}")
    pos, n = 0, len(buf)
    while pos < n:
        while pos < n and buf[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        try:
            if not buf.startswith(b"WARC/", pos):
                raise ValueError(
                    f"malformed WARC: expected record header at byte {pos}"
                )
            hdr_end = buf.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                raise ValueError("malformed WARC: unterminated header block")
            head = buf[pos:hdr_end].decode("latin-1")
            headers: dict[str, str] = {}
            for line in head.split("\r\n")[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            clen = int(headers.get("content-length", "0"))
            payload = buf[hdr_end + 4 : hdr_end + 4 + clen]
            if len(payload) != clen:
                raise ValueError(
                    f"malformed WARC: truncated payload at byte {pos} "
                    f"(want {clen}, have {len(payload)})"
                )
        except ValueError as e:
            if on_error == "raise":
                raise
            yield (pos, "__malformed__", "", "", "", 0, str(e).encode())
            return
        yield (
            pos,
            headers.get("warc-type", ""),
            headers.get("warc-record-id", ""),
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            clen,
            payload,
        )
        pos = hdr_end + 4 + clen


def read_warc(
    spark: SparkSession,
    path: str,
    http_split: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """WARC segment files → one row per record (WARC_SCHEMA).

    ``binaryFile`` lists the glob and hands each task whole files —
    the Common Crawl unit of parallelism.  ``.gz`` files are
    decompressed in-task (multi-member gzip == per-record-gzipped
    WARC).  With ``http_split=True``, response records additionally
    carry ``http_status int`` and ``http_body binary`` (the payload
    minus its HTTP header envelope); non-response records get NULLs.

    ``on_error="quarantine"`` is the crawl posture: a corrupt record
    stops parsing of that one file and surfaces as a
    ``warc_type='__malformed__'`` marker row instead of failing the
    job (see parse_warc_records); gzip decode errors quarantine the
    whole file the same way."""
    import pandas as pd

    schema = WARC_SCHEMA + (
        ", http_status int, http_body binary" if http_split else ""
    )

    def split_files(batches):
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in [
                    "warc_file", "record_offset", "warc_type", "record_id",
                    "target_uri", "warc_date", "content_length", "payload",
                ]
                + (["http_status", "http_body"] if http_split else [])
            }
            for path_, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                try:
                    if path_.endswith(".gz"):
                        buf = gzip.decompress(buf)
                    records = list(parse_warc_records(buf, on_error))
                except (OSError, EOFError, ValueError) as e:
                    if on_error == "raise":
                        raise
                    records = [(0, "__malformed__", "", "", "", 0,
                                str(e).encode())]
                for (
                    off, wtype, rid, uri, date, clen, payload
                ) in records:
                    out["warc_file"].append(path_)
                    out["record_offset"].append(off)
                    out["warc_type"].append(wtype)
                    out["record_id"].append(rid)
                    out["target_uri"].append(uri)
                    out["warc_date"].append(date)
                    out["content_length"].append(clen)
                    out["payload"].append(payload)
                    if http_split:
                        status, body = _split_http(wtype, payload)
                        out["http_status"].append(status)
                        out["http_body"].append(body)
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(split_files, schema=schema)
    )


def _split_http(warc_type: str, payload: bytes):
    """(status, body) for response records; (None, None) otherwise."""
    if warc_type != "response" or not payload.startswith(b"HTTP/"):
        return None, None
    split = payload.find(b"\r\n\r\n")
    if split < 0:
        return None, None
    status_line = payload[: payload.find(b"\r\n")].decode("latin-1")
    parts = status_line.split(" ")
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    return status, payload[split + 4 :]


def warc_bytes(records: list[dict]) -> bytes:
    """Byte-exact WARC file from record dicts
    (keys: warc_type, record_id, target_uri, warc_date, payload) —
    the deterministic fixture/writer path.  Content-Length frames the
    payload exactly, so parse(warc_bytes(r)) round-trips."""
    chunks: list[bytes] = []
    for r in records:
        payload = r["payload"]
        head_lines = [
            "WARC/1.0",
            f"WARC-Type: {r.get('warc_type', 'response')}",
            f"WARC-Record-ID: {r.get('record_id', '')}",
            f"WARC-Target-URI: {r.get('target_uri', '')}",
            f"WARC-Date: {r.get('warc_date', '1970-01-01T00:00:00Z')}",
            f"Content-Length: {len(payload)}",
        ]
        chunks.append(
            "\r\n".join(head_lines).encode("latin-1")
            + b"\r\n\r\n"
            + payload
            + b"\r\n\r\n"
        )
    return b"".join(chunks)


def write_warc_fixture(
    records: list[dict], path: str, compress: bool = False
) -> str:
    """Write records as a ``.warc`` (or gzipped ``.warc.gz``) file."""
    buf = warc_bytes(records)
    if compress:
        buf = gzip.compress(buf)
    with open(path, "wb") as f:
        f.write(buf)
    return path
