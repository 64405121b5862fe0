"""WARC source: write→read round-trip identity (plain + CC gzip
framing), record-type/status/content-type filtering, and the
end-to-end path from raw WARC to a queryable index."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from search_engine_spark.sources import warc as W


def _mk_records():
    return [
        {"url": "https://a.com/page1", "ts": datetime(2022, 1, 5, 10, 0),
         "body": b"<html><head><title>alpha</title></head>"
                 b"<body>market price growth</body></html>"},
        {"url": "https://a.com/req", "ts": datetime(2022, 1, 5, 10, 0),
         "warc_type": "request", "body": b"GET /page1 HTTP/1.1\r\n"},
        {"url": "https://b.com/x", "ts": datetime(2022, 1, 6, 11, 30),
         "body": b"<html><head><title>beta</title></head>"
                 b"<body>germany economy bank</body></html>"},
        {"url": "https://b.com/miss", "ts": datetime(2022, 1, 6, 11, 31),
         "status": 404, "body": b"<html>gone</html>"},
        {"url": "https://b.com/img", "ts": datetime(2022, 1, 6, 11, 32),
         "content_type": "image/png", "body": b"\x89PNGfake"},
        {"url": "https://c.com/y", "ts": datetime(2022, 1, 7, 9, 0),
         "body": "<html><head><title>gamma</title></head>"
                 "<body>café growth</body></html>".encode()},
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_identity(spark, tmp_path, compress):
    p = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    W.write_warc(p, _mk_records(), compress=compress)
    got = W.read_warc(spark, p).orderBy("url").collect()
    assert len(got) == 6
    by_url = {r.url: r for r in got}
    r1 = by_url["https://a.com/page1"]
    assert r1.warc_type == "response" and r1.http_status == 200
    assert r1.content_type == "text/html"
    assert bytes(r1.payload) == _mk_records()[0]["body"]
    assert r1.warc_ts == datetime(2022, 1, 5, 10, 0)
    req = by_url["https://a.com/req"]
    assert req.warc_type == "request" and req.http_status is None
    assert by_url["https://b.com/miss"].http_status == 404
    assert by_url["https://b.com/img"].content_type == "image/png"
    # unicode body survives byte-exactly
    assert "café".encode() in bytes(by_url["https://c.com/y"].payload)
    # 404 body is still carried (policy filtering is warc_to_documents')
    assert bytes(by_url["https://b.com/miss"].payload) == b"<html>gone</html>"


def test_warc_to_documents_filters(spark, tmp_path):
    p = str(tmp_path / "b.warc")
    W.write_warc(p, _mk_records())
    docs = W.warc_to_documents(W.read_warc(spark, p))
    urls = {r.url for r in docs.collect()}
    # request, 404, and image records all drop
    assert urls == {"https://a.com/page1", "https://b.com/x",
                    "https://c.com/y"}
    assert docs.columns == ["url", "warc_ts", "html", "text", "lang"]


def test_multiple_files_parallel(spark, tmp_path):
    recs = _mk_records()
    W.write_warc(str(tmp_path / "p1.warc"), recs[:3])
    W.write_warc(str(tmp_path / "p2.warc.gz"), recs[3:], compress=True)
    got = W.read_warc(spark, str(tmp_path) + "/p*.warc*")
    assert got.count() == 6
    assert got.select("path").distinct().count() == 2


def test_warc_to_index_end_to_end(spark, tmp_path):
    """Raw WARC → documents → ingest filters → text extraction →
    index → query: the full Common-Crawl-shaped pipeline."""
    from search_engine_spark import engine
    from search_engine_spark.functions.analyzer import (
        AnalyzerConfig, make_extract_text_udf)
    from search_engine_spark.operators import search as S
    from search_engine_spark.sources import corpus

    p = str(tmp_path / "cc.warc.gz")
    W.write_warc(p, _mk_records(), compress=True)
    docs = W.warc_to_documents(W.read_warc(spark, p))
    prepared = corpus.ingest_filters(
        docs.withColumn("text", make_extract_text_udf()(F.col("html"))))
    prepared = corpus.with_dense_doc_ids(prepared)
    idx = engine.build_index(prepared.select("doc_id", "text"),
                             AnalyzerConfig.full(), cache=False)
    hits = S.search_freetext(idx, "market price", k=10).collect()
    assert len(hits) == 1  # only page1 mentions market price
