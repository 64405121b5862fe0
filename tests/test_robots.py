"""robots.txt parsing + crawl-politeness filtering (RFC 9309)."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import robots as R


@pytest.fixture(scope="module")
def rules(spark):
    content1 = ("# comment\n"
                "User-agent: GoodBot\n"
                "User-agent: *\n"
                "Disallow: /private\n"
                "Allow: /private/ok\n"
                "\n"
                "User-agent: evilbot\n"
                "Disallow: /\n")
    content2 = "User-agent: *\nDisallow: /\n"
    rb = spark.createDataFrame([("a.com", content1), ("b.com", content2)],
                               "host string, content string")
    return R.parse_robots(rb)


def test_parse_groups_and_fanout(rules):
    got = {(r.host, r.agent, r.rule, r.prefix) for r in rules.collect()}
    assert got == {
        ("a.com", "goodbot", "disallow", "/private"),
        ("a.com", "goodbot", "allow", "/private/ok"),
        ("a.com", "*", "disallow", "/private"),
        ("a.com", "*", "allow", "/private/ok"),
        ("a.com", "evilbot", "disallow", "/"),
        ("b.com", "*", "disallow", "/"),
    }


def test_parse_edge_shapes(spark):
    # rules BEFORE any User-agent line attach to no agent -> dropped;
    # empty Disallow dropped; non-rule directives ignored; directive
    # case-insensitive; value may contain ':'
    rb = spark.createDataFrame([
        ("x.com", "Disallow: /orphan\n"
                  "User-agent: bot\n"
                  "DISALLOW:\n"
                  "Crawl-delay: 10\n"
                  "allow: /a:b\n"),
        ("y.com", None),
    ], "host string, content string")
    got = [(r.host, r.agent, r.rule, r.prefix)
           for r in R.parse_robots(rb).collect()]
    assert got == [("x.com", "bot", "allow", "/a:b")]


def test_parse_refuses_wildcard_rules(spark):
    rb = spark.createDataFrame(
        [("x.com", "User-agent: *\nDisallow: /*.pdf$\n")],
        "host string, content string")
    with pytest.raises(ValueError, match="wildcard"):
        R.parse_robots(rb)


def test_filter_precedence_and_hosts(spark, rules):
    urls = spark.createDataFrame([
        (1, "https://a.com/public/x"),
        (2, "https://a.com/private/secret"),
        (3, "https://a.com/private/ok/page"),   # longest-match allow
        (4, "https://b.com/anything"),
        (5, "https://c.com/no/robots"),          # no rules -> allowed
        (6, "HTTPS://A.com:443/private/z#frag"),  # canonical host + frag
        (7, "https://a.com"),                    # empty path -> '/'
    ], "doc_id long, url string")
    got = {r.doc_id: r.allowed
           for r in R.robots_filter(urls, rules,
                                    keep_allowed=False).collect()}
    assert got == {1: True, 2: False, 3: True, 4: False, 5: True,
                   6: False, 7: True}
    kept = {r.doc_id for r in R.robots_filter(urls, rules).collect()}
    assert kept == {1, 3, 5, 7}
    # exact-agent group supersedes * entirely (a.com blocks evilbot
    # from everything, including paths * allows)
    evil = {r.doc_id: r.allowed
            for r in R.robots_filter(urls, rules, agent="EvilBot",
                                     keep_allowed=False).collect()}
    assert evil[1] is False and evil[3] is False and evil[5] is True


def test_filter_plan_broadcasts_rules(spark, rules):
    urls = spark.createDataFrame([(1, "https://a.com/x")],
                                 "doc_id long, url string")
    plan = R.robots_filter(urls, rules, keep_allowed=False) \
        ._jdf.queryExecution().executedPlan().toString()
    # the CORPUS-side join (on the canonical host) must be broadcast —
    # rule-table construction inside the build side is |hosts|-scale
    # and may shuffle freely
    assert "BroadcastHashJoin [_host" in plan


def test_curate_robots_stage(spark, rules):
    from search_engine_spark.operators import curation

    docs = spark.createDataFrame([
        (1, "the cat and dog have fun with all of that", "https://a.com/x"),
        (2, "the cat and dog have fun with all of it",
         "https://a.com/private/p"),
    ], "doc_id long, text string, url string")
    out, funnel = curation.curate(docs, languages=None, min_tokens=1,
                                  robots_rules=rules)
    assert [f["stage"] for f in funnel][:2] == ["input", "robots"]
    assert {r.doc_id for r in out.collect()} == {1}
    with pytest.raises(ValueError, match="url"):
        curation.curate(docs.drop("url"), languages=None,
                        robots_rules=rules)


def test_sitemap_parse_shapes(spark):
    xml = ("<urlset>"
           "<url><loc>https://a.com/p1</loc>"
           "<lastmod>2022-02-01</lastmod></url>"
           "<url><loc> https://a.com/p2 </loc>"
           "<priority>0.5</priority></url>"
           "<url><lastmod>2022-01-01</lastmod></url>"  # no loc -> dropped
           "</urlset>")
    idx = ("<sitemapindex><sitemap><loc>https://a.com/more.xml</loc>"
           "<lastmod>2023-05-06T01:02:03Z</lastmod></sitemap>"
           "</sitemapindex>")
    sm = spark.createDataFrame([("a.com", xml), ("a.com", idx),
                                ("b.com", None)],
                               "host string, content string")
    from datetime import date

    got = {(r.kind, r.loc): r.lastmod
           for r in R.parse_sitemaps(sm).collect()}
    assert got == {
        ("url", "https://a.com/p1"): date(2022, 2, 1),
        ("url", "https://a.com/p2"): None,
        ("sitemap", "https://a.com/more.xml"): date(2023, 5, 6),
    }


def test_sitemap_refresh_candidates(spark):
    from datetime import date

    parsed = spark.createDataFrame([
        ("a.com", "url", "https://a.com/old", date(2022, 1, 1)),
        ("a.com", "url", "https://a.com/fresh", date(2022, 3, 1)),
        ("a.com", "url", "https://a.com/nolm", None),
        ("a.com", "url", "https://a.com/never", date(2022, 1, 1)),
        ("a.com", "sitemap", "https://a.com/s.xml", date(2022, 3, 1)),
    ], "host string, kind string, loc string, lastmod date")
    crawled = spark.createDataFrame([
        ("https://a.com/old", "2022-02-01 00:00:00"),
        ("https://a.com/fresh", "2022-02-01 00:00:00"),
        ("https://a.com/nolm", "2022-02-01 00:00:00"),
    ], "url string, warc_ts string").selectExpr(
        "url", "cast(warc_ts as timestamp) as warc_ts")
    got = {r.url: r.reason
           for r in R.sitemap_refresh_candidates(parsed, crawled).collect()}
    # old: lastmod before crawl -> skip; fresh: modified; nolm: lastmod
    # absent -> only when new; never: uncrawled -> new; sitemap rows
    # are not fetch candidates
    assert got == {"https://a.com/fresh": "modified",
                   "https://a.com/never": "new"}
