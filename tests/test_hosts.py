"""Tests for operators.hosts (host extraction, registered domains,
per-host crawl stats, blocklist filtering) and their DuckDB oracle
generators."""

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import hosts

HOST_CASES = [
    ("HTTPS://WWW.Example.COM:443/a/b?x=1#f", "example.com"),
    ("http://Sub.Shop.example.CO.UK:8080/p", "sub.shop.example.co.uk"),
    ("ftp://files.example.com/data", "files.example.com"),
    ("no-scheme.example.com/path", ""),          # no authority
    ("http://localhost/x", "localhost"),
]

DOMAIN_CASES = [
    ("example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("sub.shop.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("news.com.au", "news.com.au"),
    ("a.news.com.au", "news.com.au"),
    ("localhost", "localhost"),
    ("", ""),
]


def test_host_of(spark):
    df = spark.createDataFrame([(u,) for u, _ in HOST_CASES], "url string")
    got = [r[0] for r in df.select(hosts.host_of(F.col("url"))).collect()]
    assert got == [want for _, want in HOST_CASES]


def test_registered_domain(spark):
    df = spark.createDataFrame([(h,) for h, _ in DOMAIN_CASES], "host string")
    got = [r[0] for r in
           df.select(hosts.registered_domain(F.col("host"))).collect()]
    assert got == [want for _, want in DOMAIN_CASES]


def test_host_and_domain_oracle_parity(spark):
    """The generated DuckDB expressions agree byte-for-byte with the
    Spark columns on every case — the contract's foundation."""
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    for raw, _ in HOST_CASES:
        con.execute("INSERT INTO u VALUES (?)", [raw])
    duck_hosts = [r[0] for r in con.execute(
        f"SELECT {hosts.oracle_host_sql('url')} FROM u").fetchall()]
    assert duck_hosts == [want for _, want in HOST_CASES]

    con.execute("CREATE TABLE h(host VARCHAR)")
    for h, _ in DOMAIN_CASES:
        con.execute("INSERT INTO h VALUES (?)", [h])
    duck_doms = [r[0] for r in con.execute(
        f"SELECT {hosts.oracle_registered_domain_sql('host')} FROM h"
    ).fetchall()]
    assert duck_doms == [want for _, want in DOMAIN_CASES]


def test_host_stats(spark):
    rows = [
        (1, "http://a.com/x?utm_source=f"),   # canonical http://a.com/x
        (2, "HTTP://A.com/x"),                # dup of 1
        (3, "http://a.com/y"),
        (4, "https://b.com/only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["host"]: (r["n_docs"], r["n_urls"], r["dup_ratio"])
           for r in hosts.host_stats(df).collect()}
    assert got == {
        "a.com": (3, 2, pytest.approx(1 - 2 / 3, abs=1e-6)),
        "b.com": (1, 1, 0.0),
    }


def test_domain_filter_blocks_subdomains(spark):
    rows = [
        (1, "http://spam.example.com/x"),
        (2, "http://deep.sub.spam-farm.co.uk/y"),
        (3, "http://fine.org/z"),
        (4, "http://notspam-farm.co.uk.fine.org/w"),  # suffix of host, not domain
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = hosts.domain_filter(df, ["example.com", "SPAM-FARM.co.uk"])
    assert {r["doc_id"] for r in out.collect()} == {3, 4}
    assert out.columns == ["doc_id", "url"]  # helper column dropped


def test_domain_filter_rejects_unregistrable_entries(spark):
    """An entry deeper than its registrable domain would silently never
    match — it must raise instead."""
    df = spark.createDataFrame([(1, "http://a.com/x")],
                               "doc_id long, url string")
    with pytest.raises(ValueError, match="spam.example.com"):
        hosts.domain_filter(df, ["spam.example.com"])


def test_domain_filter_accepts_dataframe_blocklist(spark):
    df = spark.createDataFrame(
        [(1, "http://bad.com/x"), (2, "http://good.com/y")],
        "doc_id long, url string")
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    assert [r["doc_id"] for r in
            hosts.domain_filter(df, bl).collect()] == [2]


def test_curate_domain_block_stage(spark):
    from search_engine_spark.operators import curation

    text = "the quick brown fox jumps over the lazy dog "
    rows = [
        (1, "http://a.keep.com/x", text + "one"),
        (2, "http://sub.spam-site.com/y", text + "two"),
        (3, "http://fine.org/z", text + "three"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out, funnel = curation.curate(
        df, languages=None, blocked_domains=["spam-site.com"])
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {1, 3}
    stages = [f["stage"] for f in funnel]
    assert stages[:2] == ["input", "domain_block"]
    by = {f["stage"]: f["rows"] for f in funnel}
    assert by["input"] == 3 and by["domain_block"] == 2
    curation.release_caches()


def test_curate_domain_block_requires_url_column(spark):
    from search_engine_spark.operators import curation

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curation.curate(df, blocked_domains=["x.com"])


# --------------------------------------- corpus-level line dedup (CCNet)

def test_dedup_lines_hand_computed(spark):
    from search_engine_spark.operators.textquality import dedup_lines

    nav = "home | products | contact"
    rows = [
        (1, f"{nav}\nunique one\n\n{nav}"),     # nav twice + empty line
        (2, f"{nav}\nunique two"),
        (3, "unique three\nunique three"),       # within-doc repeat stays
        (4, nav),                                # all boilerplate -> ""
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_lines_dropped"])
           for r in dedup_lines(df, min_docs=2).collect()}
    assert got[1] == ("unique one\n", 2)   # empty line preserved
    assert got[2] == ("unique two", 1)
    assert got[3] == ("unique three\nunique three", 0)
    assert got[4] == ("", 1)


def test_dedup_lines_threshold_and_columns(spark):
    from search_engine_spark.operators.textquality import dedup_lines

    rows = [(1, "x\ny", "s0"), (2, "x\nz", "s1"), (3, "x", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dedup_lines(df, min_docs=3)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # "x" is in 3 docs -> dropped at min_docs=3; y/z stay
    assert got == {1: "y", 2: "z", 3: ""}
    assert set(out.columns) == {"doc_id", "source", "text",
                                "n_lines_dropped"}


def test_curate_dedup_lines_stage(spark):
    from search_engine_spark.operators import curation

    filler = "the quick brown fox jumps over the lazy dog again"
    nav = "home products contact about team careers press legal"
    rows = [
        (1, f"{nav}\n{filler} one"),
        (2, f"{nav}\n{filler} two"),
        (3, f"{nav}"),   # becomes empty -> dropped by min_tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, funnel = curation.curate(
        df, languages=None, min_tokens=5, dedup_line_min_docs=2)
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {1, 2}
    stages = [f["stage"] for f in funnel]
    assert "dedup_lines" in stages
    by = {f["stage"]: f["rows"] for f in funnel}
    assert by["dedup_lines"] == 3 and by["quality"] == 2
    # the surviving texts are boilerplate-free
    texts = {r["text"] for r in out.select("text").collect()}
    assert all(nav not in t for t in texts)
    curation.release_caches()
