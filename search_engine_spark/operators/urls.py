"""URL canonicalization and URL-level dedup for web crawls.

The first dedup stage of every Common-Crawl-style pipeline runs BEFORE
content hashing: the same page is fetched under thousands of URL
spellings (scheme/host case, `www.`, default ports, fragments, tracking
parameters, query-parameter order, trailing slashes), and collapsing
them by canonical URL is orders of magnitude cheaper than text dedup —
a string projection plus one group-agg instead of tokenize+hash.

Not in the reference engine (it ingests a pre-assembled TSV corpus,
/root/reference/search/index_building/index_builder.py — URL identity
is assumed solved upstream); at 10^12 crawl records it has to be an
operator. Everything here is JVM-side `regexp_*`/array expressions —
no UDF, no shuffle for canonicalization itself, one group-agg keyed on
the canonical string for dedup — and every rule is mirrored exactly by
the DuckDB oracle (`url_dedup` driver entry in __spark_entry__.py).

Canonicalization rules (the conservative, precision-first subset —
each collapses spellings that cannot denote different resources under
RFC 3986 + universal tracking-param conventions):

1. strip the fragment (`#...` — client-side only, never sent to the
   server);
2. lowercase scheme and authority (case-insensitive per RFC 3986 §3.1,
   §3.2.2); the path/query keep their case (significant);
3. drop a leading `www.` on the host (content-identical by near-universal
   convention; the standard crawl-dedup choice);
4. strip default ports (`:80` for http, `:443` for https);
5. drop tracking query parameters (utm_*, gclid, fbclid, mc_cid,
   mc_eid, ref) — analytics-only by definition;
6. sort the surviving query parameters bytewise (`a=1&b=2` ==
   `b=2&a=1` for every mainstream server framework);
7. trim trailing slashes from a non-root path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one anchored alternation, shared verbatim with the oracle generator
TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid|mc_cid|mc_eid|ref)="


def canonical_url(url_col: Column) -> Column:
    """Canonical form of a URL column (rules in the module docstring).
    Pure JVM column expression — narrow, shuffle-free, usable inside any
    projection. Inputs without a `scheme://` prefix pass through rules
    1/5/6/7 only (no authority to normalize)."""
    u = F.regexp_replace(url_col, "#.*", "")  # 1: fragment
    # authority = scheme://host[:port] (up to the first / or ?)
    auth_re = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)"
    auth = F.lower(F.regexp_extract(u, auth_re, 1))  # 2: lowercase
    rest = F.regexp_replace(u, auth_re, "")
    auth = F.regexp_replace(auth, "://www\\.", "://")  # 3: www.
    auth = F.regexp_replace(auth, "^(http://.*):80$", "$1")  # 4: ports
    auth = F.regexp_replace(auth, "^(https://.*):443$", "$1")
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    path = F.regexp_replace(path, "(.)/+$", "$1")  # 7: keep a lone "/"
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    params = F.array_sort(  # 5 + 6
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        auth, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_dedup(docs: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """→ (id_col, url_canon): one surviving row per canonical URL — the
    member with the smallest id (deterministic representative, same
    convention as dedup.exact_dedup). One group-agg on the canonical
    string; at crawl scale that key is high-cardinality and near-uniform
    (hot hosts differ in path), so the shuffle partitions evenly without
    salting."""
    return (
        docs.select(F.col(id_col), canonical_url(F.col(url_col)).alias("url_canon"))
        .groupBy("url_canon")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "url_canon")
    )


def oracle_canonical_sql(expr: str) -> str:
    """DuckDB expression mirroring canonical_url() over SQL expression
    ``expr`` — generated here so the rule set has ONE source of truth
    for the driver contract and tests."""
    auth_re = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)"
    u = f"regexp_replace({expr}, '#.*', '')"
    auth = f"lower(regexp_extract({u}, '{auth_re}', 1))"
    auth = f"regexp_replace({auth}, '://www\\.', '://')"
    auth = f"regexp_replace({auth}, '^(http://.*):80$', '\\1')"
    auth = f"regexp_replace({auth}, '^(https://.*):443$', '\\1')"
    rest = f"regexp_replace({u}, '{auth_re}', '')"
    path = f"regexp_replace(regexp_extract({rest}, '^([^?]*)', 1), '(.)/+$', '\\1')"
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p != '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    qs = f"array_to_string({params}, '&')"
    return (
        f"({auth} || {path} || "
        f"CASE WHEN {qs} != '' THEN '?' || {qs} ELSE '' END)"
    )
