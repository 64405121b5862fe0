"""robots.txt parsing + crawl-politeness URL filtering (REP — the
Robots Exclusion Protocol, RFC 9309) — the gate every crawl pipeline
runs before a page may enter the corpus at all.

Spark-first shapes:

* ``parse_robots`` turns a (host, robots.txt content) table into a
  flat (host, agent, rule, prefix) rules table with PURE JVM
  expressions: lines explode with positions, comment/blank stripping
  and directive splitting are string functions, and the RFC's
  group structure ("rules attach to the nearest preceding run of
  User-agent lines") is a lag + running-sum window per host —
  the same cumulative-break identity sessionize uses on events.
  Robots files are spec-capped (500 KiB) and the frame is |hosts|
  rows, so the per-host window is bounded by construction.
* ``robots_filter`` applies the rules at corpus scale: one
  host-keyed join from the URL frame to the (small, broadcast)
  rules table with a prefix predicate, then a per-URL argmax over
  (prefix length, allow-beats-disallow) — RFC 9309 longest-match
  precedence — and unmatched URLs pass. The corpus never shuffles
  by path; the only wide exchange keys on the URL rows themselves.

Scope pins (documented, not silent): prefixes are matched literally —
the ``*``/``$`` wildcard extensions are refused at parse so a rule
can never silently mean something different here than in an engine
that implements them; group selection takes the exact-agent group
when the host has one, else the ``*`` group (RFC 9309 §2.2.1's
most-specific-match, restricted to exact token match); hosts are the
repo-wide canonical form (operators.hosts.host_of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import hosts as H

#: RFC 9309 directives the parser understands; anything else
#: (crawl-delay, sitemap, ...) is dropped as non-rule metadata.
_RULE_KEYS = ("allow", "disallow")


def parse_robots(robots: DataFrame, host_col: str = "host",
                 content_col: str = "content") -> DataFrame:
    """(host, content) → (host, agent, rule, prefix).

    ``rule`` ∈ {'allow', 'disallow'}; ``agent`` is the lowercased
    User-agent token; one output row per (group agent × group rule)
    pair, so a group listing three agents fans its rules out to all
    three. Comments (#…) and blank lines are stripped; directive
    names are case-insensitive; a bare ``Disallow:`` (empty value —
    the RFC's allow-everything idiom) produces no row; ``*``/``$``
    inside a path prefix raise (wildcard matching is out of scope —
    better to refuse than to match a different language silently).
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.coalesce(F.col(content_col), F.lit("")),
                             "\n")).alias("pos", "_raw"),
    )
    line = F.trim(F.regexp_replace(F.col("_raw"), "#.*$", ""))
    key = F.lower(F.trim(F.substring_index(line, ":", 1)))
    # value = everything after the FIRST colon (paths may contain ':')
    value = F.trim(F.expr(
        "substring(trim(regexp_replace(_raw, '#.*$', '')), "
        "instr(trim(regexp_replace(_raw, '#.*$', '')), ':') + 1)"))
    d = (lines.withColumn("_line", line)
         .filter(F.col("_line") != "")
         .filter(F.col("_line").contains(":"))
         .select("host", "pos", key.alias("key"), value.alias("value"))
         .filter(F.col("key").isin("user-agent", *_RULE_KEYS)))
    # RFC grouping: a User-agent line opens a NEW group iff the
    # previous directive was not also a User-agent line (consecutive
    # UA lines share one group). lag + running sum per host.
    w = Window.partitionBy("host").orderBy("pos")
    prev = F.lag("key").over(w)
    d = d.withColumn(
        "_new", F.when((F.col("key") == "user-agent")
                       & (prev.isNull() | (prev != "user-agent")), 1)
        .otherwise(0)
    ).withColumn("group", F.sum("_new").over(w))
    agents = (d.filter(F.col("key") == "user-agent")
              .select("host", "group",
                      F.lower(F.col("value")).alias("agent")))
    rules = (d.filter(F.col("key").isin(*_RULE_KEYS))
             .filter(F.col("value") != "")
             .select("host", "group", F.col("key").alias("rule"),
                     F.col("value").alias("prefix")))
    bad = rules.filter(F.col("prefix").rlike(r"[*$]")).limit(1).collect()
    if bad:
        raise ValueError(
            f"robots rule for host {bad[0]['host']!r} uses */$ wildcard "
            f"matching ({bad[0]['prefix']!r}) — out of scope here; "
            "matching it as a literal prefix would silently change its "
            "meaning")
    return (agents.join(rules, ["host", "group"])
            .select("host", "agent", "rule", "prefix"))


def url_path(url_col) -> F.Column:
    """Path + query of a URL (the REP match target), fragment
    stripped, '' → '/'. Case preserved (paths are case-sensitive)."""
    p = F.regexp_extract(url_col, r"^(?i)[a-z][a-z0-9+.-]*://[^/]*(/.*)?$",
                         1)
    p = F.substring_index(p, "#", 1)
    return F.when(p == "", "/").otherwise(p)


def robots_filter(urls: DataFrame, rules: DataFrame, agent: str = "*",
                  url_col: str = "url",
                  keep_allowed: bool = True) -> DataFrame:
    """Filter a (…, url) frame by the parsed rules for ``agent`` →
    the input columns plus ``allowed`` (keep_allowed=False) or just
    the allowed rows (default).

    Group selection per host: the exact lowercased ``agent`` group
    when that host defines one, else the ``*`` group; a host with no
    robots rows allows everything. Precedence per URL: the matching
    rule with the LONGEST prefix wins; equal lengths → allow wins
    (RFC 9309 §2.2.2). The rules frame is broadcast — corpus rows
    never shuffle by host or path."""
    a = str(agent).lower()
    per_host = rules.groupBy("host").agg(
        F.max(F.when(F.col("agent") == a, 1).otherwise(0)).alias("_has"))
    eff = (rules.join(per_host, "host")
           .filter(((F.col("_has") == 1) & (F.col("agent") == a))
                   | ((F.col("_has") == 0) & (F.col("agent") == "*")))
           .select("host", "rule", "prefix"))
    u = urls.withColumn("_host", H.host_of(F.col(url_col))) \
            .withColumn("_path", url_path(F.col(url_col)))
    m = (u.join(F.broadcast(eff),
                (F.col("_host") == F.col("host"))
                & F.col("_path").startswith(F.col("prefix")), "left")
         .withColumn("_pri", F.struct(
             F.length(F.coalesce(F.col("prefix"), F.lit(""))).alias("l"),
             (F.col("rule") == "allow").cast("int").alias("a"))))
    best = (m.groupBy(*urls.columns)
            .agg(F.max_by(F.col("rule"), F.col("_pri")).alias("_best")))
    out = best.withColumn(
        "allowed", F.col("_best").isNull() | (F.col("_best") == "allow")
    ).drop("_best")
    if keep_allowed:
        return out.filter(F.col("allowed")).drop("allowed")
    return out


# ---------------------------------------------------------------------------
# Sitemaps (sitemaps.org XML protocol) — robots.txt's companion crawl
# metadata: what a host WANTS crawled and when it last changed. Parsed
# with the same pure-JVM philosophy: the canonical element shapes are
# regular, so regexp_extract_all + explode covers the protocol without
# an XML library (entity-encoded / exotic documents are out of scope,
# pinned below).
# ---------------------------------------------------------------------------

def parse_sitemaps(sitemaps: DataFrame, host_col: str = "host",
                   content_col: str = "content") -> DataFrame:
    """(host, sitemap XML) → (host, kind, loc, lastmod).

    ``kind`` = 'url' for ``<urlset>`` entries, 'sitemap' for
    ``<sitemapindex>`` children (the caller fetches those and parses
    again — recursion is I/O, not parsing). ``lastmod`` is the
    element's date (the protocol's W3C date form, date-precision
    subset) or NULL. Scope pin: canonical uncommented element syntax
    only — CDATA / entity-encoded URLs are refused by the sitemap
    protocol itself for <loc> (it requires entity-escaping only of
    &<>'\" which never appear in the URLs this engine canonicalizes)."""
    def entries(tag: str, kind: str) -> DataFrame:
        blk = F.explode(F.regexp_extract_all(
            F.coalesce(F.col(content_col), F.lit("")),
            F.lit(rf"(?s)<{tag}>(.*?)</{tag}>"), F.lit(1))).alias("_blk")
        loc = F.trim(F.regexp_extract(
            F.col("_blk"), r"(?s)<loc>\s*(.*?)\s*</loc>", 1))
        lastmod = F.regexp_extract(
            F.col("_blk"), r"(?s)<lastmod>\s*(\d{4}-\d{2}-\d{2})", 1)
        return (sitemaps.select(F.col(host_col).alias("host"), blk)
                .select("host", F.lit(kind).alias("kind"),
                        loc.alias("loc"),
                        F.when(lastmod != "", lastmod).cast("date")
                        .alias("lastmod"))
                .filter(F.col("loc") != ""))

    return entries("url", "url").unionByName(entries("sitemap", "sitemap"))


def sitemap_refresh_candidates(sitemap_urls: DataFrame,
                               crawled: DataFrame,
                               url_col: str = "url",
                               crawl_ts_col: str = "warc_ts") -> DataFrame:
    """→ (url, reason): sitemap URLs the crawler should (re)fetch —
    'new' (never crawled) or 'modified' (lastmod strictly after the
    stored crawl timestamp's date). URLs with no lastmod are fetched
    only when new (the protocol's hint semantics: absent lastmod says
    nothing). One left join keyed on the URL — both sides are
    URL-cardinality frames."""
    sm = sitemap_urls.filter(F.col("kind") == "url") \
        .select(F.col("loc").alias("url"), "lastmod")
    cr = crawled.select(F.col(url_col).alias("url"),
                        F.to_date(F.col(crawl_ts_col)).alias("_cd"))
    j = sm.join(cr, "url", "left")
    return (j.withColumn(
        "reason",
        F.when(F.col("_cd").isNull(), "new")
        .when(F.col("lastmod").isNotNull()
              & (F.col("lastmod") > F.col("_cd")), "modified"))
        .filter(F.col("reason").isNotNull())
        .select("url", "reason"))
