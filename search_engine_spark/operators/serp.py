"""SERP-composition operators: host diversification, facet counts, and
prefix autocomplete.

These are the result-page operators every production web engine layers on
top of raw ranked retrieval. The reference engine returns the raw ranked
list (search/retrieval/retrieval_algorithm.py hands views.py the top-k
as-is) — it has no URL column, so host-level collapsing is impossible
there; this module exists because a web-scale corpus makes it mandatory
(one host can dominate a SERP with near-identical pages) rather than as
a port.

Plan shapes (all JVM, no UDFs):
- diversify_by_host: one shuffle keyed on host (window rank, partial
  top-per-host) → global TakeOrderedAndProject. Host cardinality is
  ~n_docs/pages-per-host (high), so the window partitions are small and
  skew is bounded by the hottest host's candidate count — and the input
  is a scored CANDIDATE set (already df-bounded by retrieval), never the
  raw corpus.
- facet_counts: one join (facet side pruned to (doc_id, facet)) + one
  group-agg on the facet value; both sides partial-agg before the
  exchange. AQE broadcasts the hit set when it is small (the common
  case: a query's match set ≪ corpus).
- autocomplete: a prefix filter on the term-stats table + one global
  top-k (TakeOrderedAndProject). ``term LIKE 'prefix%'`` compiles to
  StringStartsWith, which parquet pushes to row-group min/max stats —
  against the term-sorted segment-store stats files the scan prunes to
  the row groups that can contain the prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def diversify_by_host(scored: DataFrame, doc_hosts: DataFrame,
                      per_host: int = 2, k: int | None = None,
                      id_col: str = "doc_id", score_col: str = "score",
                      host_col: str = "host") -> DataFrame:
    """Collapse a scored candidate set to at most ``per_host`` results
    per host, then take the global top ``k``.

    → (doc_id, score, host), ordered by (score desc, doc_id asc).
    Ties inside a host break by doc_id ascending (deterministic), so the
    kept representatives are stable across runs. Docs missing from
    ``doc_hosts`` are dropped — an unknown-host doc cannot be collapsed
    against anything, and in a web corpus every doc has a URL.
    """
    if per_host < 1:
        raise ValueError(f"per_host must be >= 1: {per_host}")
    if k is not None and k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    joined = scored.select(id_col, score_col).join(
        doc_hosts.select(id_col, host_col), id_col
    )
    w = Window.partitionBy(host_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    kept = (
        joined.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= per_host)
        .drop("_r")
    )
    out = kept.orderBy(F.desc(score_col), F.asc(id_col))
    return out.limit(k) if k is not None else out


def facet_counts(hits: DataFrame, facets: DataFrame, facet_col: str,
                 id_col: str = "doc_id") -> DataFrame:
    """Facet histogram over a query's match set: → (facet value, cnt),
    ordered by (cnt desc, value asc).

    ``hits`` is a (doc_id) match set (duplicates collapsed — a doc
    counts once per facet no matter how many query terms hit it);
    ``facets`` maps doc_id → the facet column (lang, host, source, a
    date bucket, ...). NULL facet values count under NULL's own bucket
    is NOT emitted — a doc without the attribute is outside the
    histogram's domain, matching SQL GROUP BY over an inner join.
    """
    dedup = hits.select(id_col).dropDuplicates([id_col])
    joined = dedup.join(
        facets.select(id_col, facet_col).filter(F.col(facet_col).isNotNull()),
        id_col,
    )
    return (
        joined.groupBy(facet_col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(facet_col))
    )


def date_histogram(hits: DataFrame, doc_dates: DataFrame,
                   granularity: str = "month",
                   date_col: str = "warc_date",
                   id_col: str = "doc_id") -> DataFrame:
    """Date-histogram facet over a query's match set (the ES
    ``date_histogram`` aggregation / every SERP's "results over time"
    sidebar): → (bucket, cnt) ordered by bucket ASC — calendar order,
    not count order, is this aggregation's contract.

    Same plan shape as facet_counts (hit dedup → one join + one
    group-agg; AQE broadcasts the small hit set); the facet value is
    date_trunc(granularity) computed as a JVM column. NULL dates are
    outside the histogram's domain, matching SQL GROUP BY over an
    inner join."""
    if granularity not in ("day", "week", "month", "quarter", "year"):
        raise ValueError(f"unsupported granularity: {granularity!r}")
    dedup = hits.select(id_col).dropDuplicates([id_col])
    dated = doc_dates.select(
        id_col,
        F.date_trunc(granularity, F.col(date_col)).cast("date")
        .alias("bucket")).filter(F.col("bucket").isNotNull())
    return (dedup.join(dated, id_col)
            .groupBy("bucket").agg(F.count("*").alias("cnt"))
            .orderBy(F.asc("bucket")))


def significant_terms(postings: DataFrame, term_stats: DataFrame,
                      n_docs: int, hits: DataFrame, k: int = 10,
                      min_fg_df: int = 1,
                      id_col: str = "doc_id") -> DataFrame:
    """Elasticsearch-style ``significant_terms`` aggregation: the terms
    that are unusually frequent in a query's match set relative to the
    whole corpus — "what is this result set ABOUT" (SERP topic sidebar,
    query-expansion candidates, cluster labeling).

    Scoring is the JLH heuristic (the ES default):

        fg% = fg_df / |hits|     bg% = df / n_docs
        jlh = (fg% − bg%) · (fg% / bg%)

    — the absolute lift times the relative lift; only terms with
    fg% > bg% (actually over-represented) are emitted. → (term, fg_df,
    df, jlh) ordered by (jlh desc, term asc).

    Plan shape: hits dedup → semi-join restricts postings to the match
    set (AQE broadcasts the hit set when small — the common case) → one
    countDistinct agg per term (fg_df) → equi-join with term_stats for
    the background df. |hits| is a broadcast 1-row aggregate crossJoin,
    not a driver collect — the whole thing is one job. The corpus-side
    df is pre-aggregated (term_stats), so corpus size enters only
    through the already-built statistics table.
    """
    if min_fg_df < 1:
        raise ValueError(f"min_fg_df must be >= 1: {min_fg_df}")
    dedup = hits.select(id_col).dropDuplicates([id_col])
    fg = (postings.join(dedup, postings["doc_id"] == dedup[id_col],
                        "left_semi")
          .groupBy("term")
          .agg(F.countDistinct("doc_id").alias("fg_df"))
          .filter(F.col("fg_df") >= min_fg_df))
    fg_size = dedup.agg(F.count("*").alias("m"))
    joined = (fg.join(term_stats.select("term", "df"), "term")
              .crossJoin(F.broadcast(fg_size)))
    fg_pct = F.col("fg_df").cast("double") / F.col("m").cast("double")
    bg_pct = F.col("df").cast("double") / F.lit(float(n_docs))
    jlh = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    return (joined
            .select("term", F.col("fg_df").cast("long").alias("fg_df"),
                    F.col("df").cast("long").alias("df"),
                    jlh.alias("jlh"))
            .filter(F.col("jlh") > 0)
            .orderBy(F.desc("jlh"), F.asc("term"))
            .limit(k))


def autocomplete(term_stats: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Prefix completion from the index vocabulary: the ``k`` terms
    starting with ``prefix`` with the highest collection frequency
    (cf desc, term asc — deterministic). → (term, cf).

    The reference has no completion endpoint; its spellchecker's
    vocabulary (helpers.py builds it from the index) is the same data
    this reads, so completion is the natural companion surface. The
    prefix must be non-empty lowercase (the analyzer lowercases every
    indexed term, so a mixed-case prefix could never match).
    """
    if not prefix:
        raise ValueError("prefix must be non-empty")
    if prefix != prefix.lower():
        raise ValueError(f"prefix must be lowercase (terms are): {prefix!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    return (
        term_stats.filter(F.col("term").startswith(prefix))
        .select("term", "cf")
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(k)
    )


def stats_facet(hits: DataFrame, values: DataFrame, value_col: str,
                id_col: str = "doc_id") -> DataFrame:
    """Numeric stats over a query's match set (the ES
    ``extended_stats`` aggregation): → one row (n, min_v, max_v,
    sum_v, avg_v, var_pop).

    Same dedup-then-join shape as facet_counts; NULL values are
    outside the aggregation's domain (inner-join semantics). Variance
    is the POPULATION form computed from the sum-of-squares identity
    Σx²/n − (Σx/n)² — the same arithmetic DuckDB's var_pop uses, so the
    oracle can compare at 6dp without estimator drift; avg/var round
    to 6 for the cross-engine gate, sums stay exact when the input is
    integral. An empty match set returns n=0 with NULL stats (SQL
    aggregate semantics), not zero rows — the SERP always renders the
    widget."""
    dedup = hits.select(id_col).dropDuplicates([id_col])
    joined = dedup.join(
        values.select(id_col, value_col)
        .filter(F.col(value_col).isNotNull()), id_col)
    v = F.col(value_col).cast("double")
    return joined.agg(
        F.count("*").cast("long").alias("n"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v).alias("sum_v"),
        F.round(F.avg(v), 6).alias("avg_v"),
        F.round(F.avg(v * v) - F.avg(v) * F.avg(v), 6).alias("var_pop"),
    )


def term_vectors(index, doc_ids: list[int]) -> DataFrame:
    """Per-doc term statistics (the ES ``_termvectors`` endpoint /
    Lucene TermVectors): → (doc_id, term, tf, df) for the requested
    docs, ordered (doc_id ASC, term ASC).

    The doc-id list is a pushable IN filter on the doc-keyed postings
    (an O(|ids|) point lookup, the article-hydration shape), joined to
    the broadcast term_stats for df. Positions intentionally excluded:
    the postings table's position payloads are an index-internal
    encoding; per-term positions are the phrase machinery's domain."""
    if not doc_ids:
        raise ValueError("doc_ids must be non-empty")
    ids = [int(d) for d in doc_ids]
    return (index.postings
            .filter(F.col("doc_id").isin(ids))
            .select("doc_id", "term", "tf")
            .join(F.broadcast(index.term_stats.select("term", "df")),
                  "term")
            .select("doc_id", "term",
                    F.col("tf").cast("long").alias("tf"),
                    F.col("df").cast("long").alias("df"))
            .orderBy("doc_id", "term"))
