"""Corpus-wide n-gram heavy hitters — exact top-k for boilerplate
discovery.

Every web-curation pipeline mines its corpus's most frequent word
n-grams: the head of that list IS the boilerplate (cookie banners,
nav bars, SEO footers), and the repetition filters' thresholds
(textquality.repetition_stats) are tuned against it. The reference
engine computes corpus term stats but nothing at the n-gram level
(index_builder.py aggregates unigram df/cf only), so this is a
pipeline-completing operator, not a port.

Plan shape: tokenize + gram-enumerate narrowly (no UDF — slice/
transform/explode are JVM HOFs), one count agg, one global top-k.
The agg shuffles the full gram stream, which is unavoidable for EXACT
counts — but map-side partial aggregation collapses it to one row per
(gram, map-partition) before the exchange, and the n-gram distribution
is Zipf: the head grams are exactly the ones partial agg compresses
best. The final top-k is a TakeOrderedAndProject (O(k) per partition),
never a global sort. For 100 TB with a tight latency budget the
published alternative is a count-min sketch + heap per partition
(approximate); the exact form ships because its answer is
oracle-checkable and its shuffle is already minimal for what it
promises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20,
               text_col: str = "text") -> DataFrame:
    """→ (gram, cnt): the ``k`` most frequent word ``n``-grams over the
    lowercased, whitespace-split corpus, ties broken by gram text
    ascending (fully deterministic — the driver hashes the result).
    Docs shorter than ``n`` tokens contribute nothing."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    # sequence(1, x) is DESCENDING for x < 1 — guard short docs to an
    # empty gram array instead
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )


def top_ngrams_oracle_sql(n: int = 2, k: int = 20,
                          table: str = "documents") -> str:
    """DuckDB oracle for top_ngrams() — generated so engine and oracle
    share n, k, and the tokenize/tie-break rules (one source of
    truth)."""
    return rf"""
        WITH w AS (SELECT list_filter(regexp_split_to_array(
                       lower(COALESCE(text, '')), '\s+'),
                       x -> x != '') AS toks
                   FROM {table}),
        g AS (SELECT unnest(list_transform(
                  generate_series(1, greatest(len(toks) - {n - 1}, 0)),
                  i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS gram
              FROM w)
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM g GROUP BY gram
        ORDER BY cnt DESC, gram LIMIT {k}
    """
