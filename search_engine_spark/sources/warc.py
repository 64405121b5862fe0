"""WARC source (ISO 28500 / WARC 1.0 — Common Crawl's native format).

The reference ingests a TSV corpus (index_build.py); a Common-Crawl-
style pipeline starts one step earlier, at the crawler's WARC output.
This module reads WARC (plain or the Common-Crawl ``.warc.gz``
member-per-record framing) into the input_hint document shape
(url, warc_ts, html, …) so the existing ingest chain
(corpus.ingest_filters → analyzer extract_text → index build) runs
unchanged from raw crawl archives.

Spark-first shape: files arrive via the built-in ``binaryFile`` source
(one row per file, the split-unfriendly format's natural granularity —
CC WARC files are ~1 GiB, a bounded task each); record parsing is a
``mapInPandas`` pass, one Python iteration per RECORD (not per byte —
boundaries come from Content-Length, never from scanning payloads).
Parallelism = number of WARC files, exactly how Hadoop/Spark CC
pipelines shard this format (gzip members make records independently
decompressable but files remain the split unit).

Writer included (``write_warc``): tests and fixtures synthesize valid
archives rather than shipping binary blobs; the round-trip identity is
the gate (tests/test_warc.py).
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = ("path string, record_id string, warc_type string, "
               "url string, warc_ts timestamp, http_status int, "
               "content_type string, payload binary")

_CRLF = b"\r\n"


def _http_response(body: bytes, status: int = 200,
                   content_type: str = "text/html") -> bytes:
    head = (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    return head + body


def write_warc(path: str, records: list[dict], compress: bool = False,
               ) -> None:
    """Write a valid WARC 1.0 file (``compress=True`` → the Common
    Crawl member-per-record gzip framing, still one file).

    Each record dict: ``url``, ``ts`` (datetime), ``body`` (bytes),
    optional ``warc_type`` ('response' default; 'request'/'metadata'
    records are written verbatim for filter-path tests), optional
    ``status``/``content_type``. Response bodies are wrapped in a
    minimal HTTP/1.1 envelope, as in real crawls."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        wtype = r.get("warc_type", "response")
        body = r["body"]
        if wtype == "response":
            block = _http_response(body, r.get("status", 200),
                                   r.get("content_type", "text/html"))
        else:
            block = body
        ts = r["ts"].astimezone(timezone.utc) if r["ts"].tzinfo \
            else r["ts"].replace(tzinfo=timezone.utc)
        hdr = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {wtype}\r\n".encode()
            + f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n".encode()
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + (b"Content-Type: application/http; msgtype=response\r\n"
               if wtype == "response" else b"Content-Type: text/plain\r\n")
            + f"Content-Length: {len(block)}\r\n".encode()
            + _CRLF
        )
        rec = hdr + block + _CRLF + _CRLF
        if compress:
            out.write(gzip.compress(rec))  # one gzip MEMBER per record
        else:
            out.write(rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def _iter_gzip_members(data: bytes):
    """Yield decompressed gzip members of a multi-member stream (the
    CC warc.gz framing) — one zlib decompressobj per member, resuming
    at unused_data."""
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        yield d.decompress(rest)
        rest = d.unused_data


def _parse_warc_bytes(data: bytes, path: str):
    """Yield record tuples from one (already decompressed) WARC byte
    stream. Content-Length-driven: header block up to CRLFCRLF, then
    exactly Content-Length payload bytes, then the record separator."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        head = data[pos:hdr_end].decode("latin-1")
        if not head.startswith("WARC/"):
            break
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", 0))
        block = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        wtype = fields.get("warc-type", "")
        url = fields.get("warc-target-uri")
        ts = fields.get("warc-date")
        when = None
        if ts:
            try:
                when = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ")
            except ValueError:
                when = None
        status = None
        ctype = fields.get("content-type")
        payload = block
        if wtype == "response" and block.startswith(b"HTTP/"):
            he = block.find(b"\r\n\r\n")
            if he >= 0:
                hlines = block[:he].decode("latin-1").split("\r\n")
                try:
                    status = int(hlines[0].split(" ")[1])
                except (IndexError, ValueError):
                    status = None
                for hl in hlines[1:]:
                    hk, _, hv = hl.partition(":")
                    if hk.strip().lower() == "content-type":
                        ctype = hv.strip()
                payload = block[he + 4:]
        yield (path, fields.get("warc-record-id", ""), wtype, url, when,
               status, ctype, payload)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → (path, record_id, warc_type, url, warc_ts,
    http_status, content_type, payload). Every record type is emitted
    (filtering is the caller's policy); response records have the HTTP
    envelope stripped into http_status/content_type with ``payload`` =
    the body bytes."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = b"".join(_iter_gzip_members(data))
                rows.extend(_parse_warc_bytes(data, p))
            yield pd.DataFrame(rows, columns=[
                "path", "record_id", "warc_type", "url", "warc_ts",
                "http_status", "content_type", "payload"])

    return files.mapInPandas(parse, WARC_SCHEMA)


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Response records → the input_hint document shape
    (url, warc_ts, html: binary, text: NULL placeholder, lang: NULL) —
    ready for corpus.ingest_filters + the analyzer's extract_text.
    Only 2xx text/html responses qualify (the CC pipeline rule);
    request/metadata records and non-HTML payloads drop here."""
    return (records
            .filter(F.col("warc_type") == "response")
            .filter((F.col("http_status") >= 200)
                    & (F.col("http_status") < 300))
            .filter(F.lower(F.coalesce(F.col("content_type"), F.lit("")))
                    .startswith("text/html"))
            .select(F.col("url"), F.col("warc_ts"),
                    F.col("payload").alias("html"),
                    F.lit(None).cast("string").alias("text"),
                    F.lit(None).cast("string").alias("lang")))
