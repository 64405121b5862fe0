"""Inverted-index construction as DataFrame aggregations.

Reference semantics: ``index_extender`` builds ``{term: [df, {docID: [pos…]}]}``
one doc at a time in a driver dict (/root/reference/indexing/index_builder/
index_build.py:26-38); partial flush every 60k docs (index_build.py:188-197)
and a 2-way external merge (indexing/index_merging/index_merging.py:4-64).

Spark-native replacement (SURVEY §2.3 A1-A5): one explode + two hash
aggregations. Shuffle spill replaces the partial flush; the shuffle itself
IS the merge. Positions are 1-based (index_build.py:30). Term-frequency
skew (stopword-heavy terms) is handled with an explicit salted two-phase
aggregation per the north rule — the partial agg keys on
(term, pmod(xxhash64(doc_id), S)) so no single reducer sees a whole
stopword posting list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from ..functions.analyzer import AnalyzerConfig, tokens_column


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


def build_postings(docs: DataFrame, conf: AnalyzerConfig = AnalyzerConfig.full(),
                   positional: bool = True, text_col: str = "text") -> DataFrame:
    """→ postings (term, doc_id, tf, positions?).

    groupBy(term, doc_id) is naturally fine-grained (the doc_id component
    spreads even stopword terms across reducers), so no salt is needed
    HERE; Spark's partial (map-side) aggregation already bounds shuffle
    volume to one row per (term, doc_id) per map task.
    """
    terms = explode_terms(docs, conf, text_col=text_col)
    # dl rides along (constant per doc_id group — F.first is exact here);
    # carrying it makes postings/segments self-contained for scoring, so
    # the query path needs no doc_stats join (one shuffle saved per query)
    aggs = [F.count("*").cast(IntegerType()).alias("tf"),
            F.first("dl").alias("dl")]
    if positional:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return terms.groupBy("term", "doc_id").agg(*aggs)


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
