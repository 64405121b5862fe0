"""Inverted-index construction as DataFrame aggregations.

Reference semantics: ``index_extender`` builds ``{term: [df, {docID: [pos…]}]}``
one doc at a time in a driver dict (/root/reference/indexing/index_builder/
index_build.py:26-38); partial flush every 60k docs (index_build.py:188-197)
and a 2-way external merge (indexing/index_merging/index_merging.py:4-64).

Spark-native replacement (SURVEY §2.3 A1-A5): the per-document
(term, tf, positions) groups are computed INSIDE the analyzer pandas UDF
(they are per-document local data — no cross-row aggregation exists) and
exploded, so the postings build is shuffle-free map work; the ONE shuffle
in the index build is the range-repartition that lays segments out by
(bucket, term) — that shuffle IS the reference's external merge, and its
spill replaces the 60k-doc partial flush. Positions are 1-based
(index_build.py:30). Term-frequency skew (stopword-heavy terms) is
handled where cross-row aggregation does exist: ``term_stats`` uses an
explicit salted two-phase aggregation per the north rule, keyed on
(term, pmod(xxhash64(doc_id), S)) so no single reducer sees a whole
stopword posting list.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from ..functions.analyzer import AnalyzerConfig, analyze, tokens_column


def explode_terms(docs: DataFrame, conf: AnalyzerConfig = AnalyzerConfig.full(),
                  text_col: str = "text") -> DataFrame:
    """documents → (doc_id, term, pos) with 1-based positions.

    posexplode is the Spark-native T6 (enumerate → pos+1); the analyzer
    pUDF is the only Python in the pipeline and is Arrow-batched.
    """
    toks = tokens_column(docs, text_col=text_col, conf=conf)
    # posexplode_OUTER on purpose: plain posexplode makes Catalyst infer a
    # `size(tokens)>0` pre-Generate filter whose pushdown DUPLICATES the
    # ArrowEvalPython node — the analyzer UDF (the most expensive stage of
    # the build) would run twice per row. The outer variant emits one
    # null row for empty docs instead, dropped by the term filter below.
    return (
        toks.select(
            "doc_id",
            F.size("tokens").cast(IntegerType()).alias("dl"),
            F.posexplode_outer("tokens").alias("pos0", "term"),
        )
        .filter(F.col("term").isNotNull())
        .select("doc_id", "dl", "term",
                (F.col("pos0") + 1).cast(IntegerType()).alias("pos"))
    )


def _make_doc_postings_udf(conf: AnalyzerConfig, positional: bool):
    """pandas UDF: text → struct<dl:int, posts:array<struct<term, tf
    [, positions]>>> — the whole per-document posting computation in ONE
    Arrow pass. Grouping token positions by term is an O(dl) dict fold
    over data that is already per-document local, so doing it inside the
    analyzer's Python stage costs nothing extra — while doing it as a
    DataFrame groupBy costs a full shuffle of every exploded token plus
    a collect_list ObjectHashAggregate (whose sort-based fallback
    TimSorts millions of rows per task). Measured at 150k docs local[8]:
    the groupBy formulation spent ~9× the whole rest of the build inside
    that aggregate."""
    post_fields = [StructField("term", StringType()),
                   StructField("tf", IntegerType())]
    if positional:
        post_fields.append(
            StructField("positions", ArrayType(IntegerType())))
    ret = StructType([
        StructField("dl", IntegerType()),
        StructField("posts", ArrayType(StructType(post_fields))),
    ])

    def one(text):
        toks = analyze(text, conf) if text is not None else []
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            by_term.setdefault(t, []).append(i + 1)  # 1-based (T6)
        if positional:
            posts = [{"term": t, "tf": len(ps), "positions": ps}
                     for t, ps in by_term.items()]
        else:
            posts = [{"term": t, "tf": len(ps)}
                     for t, ps in by_term.items()]
        return {"dl": len(toks), "posts": posts}

    @F.pandas_udf(ret)
    def doc_postings_udf(text: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(list(text.map(one)))

    return doc_postings_udf


def build_postings(docs: DataFrame, conf: AnalyzerConfig = AnalyzerConfig.full(),
                   positional: bool = True, text_col: str = "text") -> DataFrame:
    """→ postings (term, doc_id, tf, dl, positions?).

    Computed entirely MAP-SIDE: each document's (term, tf, positions)
    groups are built inside the analyzer pandas UDF (positions are
    per-document local, so no cross-row aggregation exists to distribute)
    and exploded. Zero shuffles — at 10^12 docs the postings build is
    embarrassingly parallel, and the only shuffle in the whole index
    build is the ONE range-repartition that lays segments out by
    (bucket, term). The previous groupBy(term, doc_id) +
    sort_array(collect_list(pos)) formulation shuffled every exploded
    token and paid a sort-based ObjectHashAggregate fallback; outputs
    are row-identical (positions ascending = first-occurrence order).

    explode_outer + term-not-null (not plain explode) for the same
    reason as explode_terms: the inferred size()>0 pre-Generate filter
    would duplicate the ArrowEvalPython node and run the analyzer twice.
    """
    udf = _make_doc_postings_udf(conf, positional)
    cols = [F.col("_p.term").alias("term"), F.col("doc_id"),
            F.col("_p.tf").alias("tf"), F.col("_r.dl").alias("dl")]
    if positional:
        cols.append(F.col("_p.positions").alias("positions"))
    return (
        docs.select("doc_id", udf(F.col(text_col)).alias("_r"))
        .select("doc_id", "_r", F.explode_outer("_r.posts").alias("_p"))
        .filter(F.col("_p.term").isNotNull())
        .select(*cols)
    )


def term_stats(postings: DataFrame, salt_buckets: int = 64) -> DataFrame:
    """→ (term, df, cf) via salted two-phase aggregation (north rule).

    Phase 1 keys on (term, salt) so a stopword-scale term is reduced by
    ``salt_buckets`` tasks in parallel; phase 2 sums the tiny partials.
    Rows are already unique per (term, doc_id), so df = count, cf = sum(tf).
    """
    salted = postings.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("term", "_salt").agg(
        F.count("*").alias("_pdf"), F.sum("tf").alias("_pcf")
    )
    return partial.groupBy("term").agg(
        F.sum("_pdf").alias("df"), F.sum("_pcf").alias("cf")
    )


def doc_stats(docs: DataFrame, conf: AnalyzerConfig = AnalyzerConfig.full(),
              text_col: str = "text") -> DataFrame:
    """→ (doc_id, dl): tokens per doc after preprocessing (A2;
    reference doc_sizes at index_build.py:181-183)."""
    return tokens_column(docs, text_col=text_col, conf=conf).select(
        "doc_id", F.size("tokens").alias("dl")
    )


def corpus_stats(doc_stats_df: DataFrame) -> dict:
    """→ {'n_docs', 'total_len', 'avgdl'} — computed as one DataFrame agg
    and returned as plain scalars for broadcast (A3; reference
    helpers.py:229-230)."""
    row = doc_stats_df.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    ).collect()[0]
    n = row["n_docs"] or 0
    tot = row["total_len"] or 0
    return {"n_docs": n, "total_len": int(tot), "avgdl": (tot / n) if n else 0.0}
