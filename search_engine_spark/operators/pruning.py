"""Static index pruning (Carmel et al. 2001, "Static index pruning for
information retrieval systems") — the serve-tier trade every web engine
makes: a small pruned index answers most queries fast; the full index
is the fallback tier.

Per-term pruning: keep each term's top ``per_term_keep`` postings by
within-term impact (tf DESC — for a fixed term BM25 is monotone in tf
given dl, and tf-ordering is the classical Carmel uniform-k variant —
tie doc_id ASC). GLOBAL statistics (df, n_docs, avgdl) are kept from
the FULL index, so every posting that survives scores EXACTLY what it
scores in the full index — pruned results are a subset of the full
ranking with identical scores (the federation restrict_index invariant,
applied to the impact axis instead of the document axis). What pruning
loses is RECALL on low-impact postings: a doc that matches only via
pruned tail postings drops out; it can never appear with a wrong score.

Scale shape: one window per term — bounded fan-in per term, no global
sort; the pruned frame is a FILTER-shaped subset materializable as its
own (smaller) durable index. ``per_term_keep`` ≥ max df degenerates to
the identity (the driver gate's pin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .search import InvertedIndex


def prune_postings(postings: DataFrame, per_term_keep: int) -> DataFrame:
    """Top-``per_term_keep`` postings per term by (tf DESC, doc_id ASC)."""
    if per_term_keep < 1:
        raise ValueError(f"per_term_keep must be >= 1: {per_term_keep}")
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (postings.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= per_term_keep)
            .drop("_r"))


def pruned_index(index: InvertedIndex,
                 per_term_keep: int) -> InvertedIndex:
    """Index handle over the pruned postings with the FULL index's
    term_stats/stats/doc_stats — kept docs score identically; the
    pruned tier's answers are always a subset of the full ranking
    (never differently-scored), so a serving stack can escalate to the
    full tier only when the pruned one under-fills k."""
    return InvertedIndex(
        postings=prune_postings(index.postings, per_term_keep),
        doc_stats=index.doc_stats,
        term_stats=index.term_stats,
        stats=index.stats,
        documents=index.documents,
        analyzer=index.analyzer,
    )
