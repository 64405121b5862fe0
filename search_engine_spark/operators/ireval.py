"""IR evaluation metrics over a run × qrels — trec_eval as DataFrame ops.

The reference's only evaluation tooling is an ad-hoc run comparator
(compare_results.py:16-33 — positional agreement + set overlap, ported
as search.compare_runs). A ranking engine is TUNED against judged
relevance, so the standard metrics belong in the engine: per query,

* precision@k   — |relevant ∩ top-k| / k;
* recall@k      — |relevant ∩ top-k| / |relevant|;
* reciprocal rank — 1/rank of the first relevant hit (0 if none);
* average precision (AP@k) — mean over relevant HIT ranks r of
  precision@r, normalized by |relevant| (trec_eval's MAP numerator:
  unretrieved relevant docs count against you);
* nDCG@k — DCG/IDCG with the exponential gain (2^rel − 1)/log2(r+1);
  the ideal ranking orders the query's judged docs by
  (rel DESC, doc_id ASC) and takes the top k.

"Relevant" = rel > 0 (graded judgments feed nDCG; the binary metrics
binarize, trec_eval semantics). Unjudged retrieved docs are rel 0.

Scale shape: the run is |Q|·k rows and qrels |Q|·judged — both tiny per
query and huge only in the query dimension, so every window partitions
by query_id (millions of small independent partitions, no global sort)
and the one join is an equi-join on (query_id, doc_id). Macro averages
are ONE final map-side-combined aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def evaluate_run(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """→ one row per query in ``run``:
    (query_id, p_at_k, recall_at_k, rr, ap, ndcg) — all doubles.

    ``run``: (query_id, doc_id, rank) — rank 1-based, dense and unique
    within each query (batch_topk's output shape).
    ``qrels``: (query_id, doc_id, rel) — graded judgments, rel ≥ 0;
    (query_id, doc_id) unique. Queries present in the run but with NO
    judged-relevant doc score 0 on every metric (trec_eval convention);
    queries present only in qrels are not evaluated (no run rows).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    hits = (run.filter(F.col("rank") <= k)
            .join(qrels.select("query_id", "doc_id",
                               F.col("rel").cast("double").alias("rel")),
                  ["query_id", "doc_id"], "left")
            .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0.0))))

    w = (Window.partitionBy("query_id").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rel_bin = F.when(F.col("rel") > 0, 1.0).otherwise(0.0)
    hits = (hits
            .withColumn("_relb", rel_bin)
            .withColumn("_cum_rel", F.sum("_relb").over(w))
            # precision@r at each relevant hit's own rank r
            .withColumn("_p_at_r",
                        F.when(F.col("_relb") > 0,
                               F.col("_cum_rel") / F.col("rank"))
                        .otherwise(F.lit(0.0)))
            .withColumn("_gain",
                        (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
                        / F.log2(F.col("rank") + F.lit(1.0))))

    per_q = hits.groupBy("query_id").agg(
        F.sum("_relb").alias("_nrel_hit"),
        F.sum("_p_at_r").alias("_sum_p"),
        F.min(F.when(F.col("_relb") > 0, F.col("rank"))).alias("_first"),
        F.sum("_gain").alias("_dcg"),
    )

    # per-query judged-relevant totals + ideal DCG@k from qrels alone
    iw = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id"))
    ideal = (qrels.withColumn("_irank", F.row_number().over(iw))
             .withColumn("_igain",
                         F.when(F.col("_irank") <= k,
                                (F.pow(F.lit(2.0),
                                       F.col("rel").cast("double"))
                                 - F.lit(1.0))
                                / F.log2(F.col("_irank") + F.lit(1.0)))
                         .otherwise(F.lit(0.0)))
             .groupBy("query_id").agg(
                 F.sum(F.when(F.col("rel") > 0, 1.0)
                       .otherwise(0.0)).alias("_nrel"),
                 F.sum("_igain").alias("_idcg")))

    joined = per_q.join(ideal, "query_id", "left")
    zero = F.lit(0.0)
    return joined.select(
        "query_id",
        (F.col("_nrel_hit") / F.lit(float(k))).alias("p_at_k"),
        F.when(F.coalesce(F.col("_nrel"), zero) > 0,
               F.col("_nrel_hit") / F.col("_nrel"))
        .otherwise(zero).alias("recall_at_k"),
        F.when(F.col("_first").isNotNull(),
               F.lit(1.0) / F.col("_first")).otherwise(zero).alias("rr"),
        F.when(F.coalesce(F.col("_nrel"), zero) > 0,
               F.col("_sum_p") / F.col("_nrel")).otherwise(zero).alias("ap"),
        F.when(F.coalesce(F.col("_idcg"), zero) > 0,
               F.col("_dcg") / F.col("_idcg")).otherwise(zero).alias("ndcg"),
    )


def macro_metrics(per_query: DataFrame) -> DataFrame:
    """Mean of each metric over the evaluated queries (MAP, MRR, mean
    nDCG, …) — ONE map-side-combined aggregate row."""
    return per_query.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.avg("p_at_k").alias("mean_p_at_k"),
        F.avg("recall_at_k").alias("mean_recall_at_k"),
        F.avg("rr").alias("mrr"),
        F.avg("ap").alias("map"),
        F.avg("ndcg").alias("mean_ndcg"),
    )
