"""Batch multi-query retrieval: score N queries in ONE Spark job.

The reference serves one query per HTTP request (views.py:27-97) and its
driver loop re-reads the mini index per query — fine interactively, but
relevance-tuning sweeps, IR-eval runs, more-like-this backfills, and
query-log replays score thousands of queries against the same index. At
100 TB the per-query cost is dominated by job scheduling + one postings
scan each; batching amortizes BOTH across the whole query set:

* the query set arrives as a DataFrame (query_id, term) — one row per
  analyzed token occurrence, so duplicates carry query tf exactly like
  ``search_freetext_tokens``'s bag semantics;
* ONE join against postings scores every (query, doc) pair. When the
  batch's distinct-term set is small (the common eval-run case) it is
  collected (bounded by ``pushdown_max_terms``) and pushed into the
  postings scan as a ``term IN (...)`` predicate — the single-query
  mini-index pruning, amortized. Past the cap, the join runs unpruned
  as a plain shuffle hash join on term: one full postings pass for the
  ENTIRE batch, which is the point — per-query scans would be N passes;
* per-query top-k is a window over ``partitionBy(query_id)`` —
  millions of small independent partitions, never a global sort.

Scale shape: the only corpus-scale shuffle is the
``groupBy(query_id, doc_id)`` score sum (and the window repartition by
query_id); both key on the query axis, so adding queries adds parallel
partitions instead of skewing existing ones. Head terms skew the
per-term join fan-out exactly as they do the single-query path — AQE
skew-join splitting applies because everything here is a plain join.

VSM is refused (per-query qnorm needs the per-query weight vector —
``search.search_vsm_tokens`` serves that path one query at a time);
bm25 / bm25-reference / lm-dirichlet / lm-pyp all work, mirroring
``search._scored_frame`` weight-for-weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import scoring
from .search import InvertedIndex

#: Collect-and-push the batch's distinct terms into the postings scan
#: below this many; above it, stream the join (one full postings pass).
DEFAULT_PUSHDOWN_MAX_TERMS = 10_000


def batch_scores(index: InvertedIndex, query_terms: DataFrame,
                 model: str = "bm25",
                 pushdown_max_terms: int | None = DEFAULT_PUSHDOWN_MAX_TERMS,
                 ) -> DataFrame:
    """Unranked per-(query, doc) scores for a batch of analyzed queries.

    ``query_terms``: (query_id: long, term: string), one row per token
    occurrence (duplicates = query tf, the ``search_freetext_tokens``
    bag). → (query_id, doc_id, score) — every (query, matched doc) pair,
    exactly ``search_freetext_tokens(toks, k=None, model=...)`` row- and
    value-identical per query (pytest-gated).
    """
    if model == "vsm":
        raise ValueError(
            "batch_scores covers the term-weight models (bm25/lm); vsm "
            "needs a per-query norm — use search.search_vsm_tokens per query")
    n = index.stats["n_docs"]
    avgdl = index.stats["avgdl"]
    total = index.stats["total_len"]

    qtf = (query_terms.groupBy("query_id", "term")
           .agg(F.count("*").alias("_qtf")))

    post_cols = ["term", "doc_id", "tf"] + (
        ["dl"] if "dl" in index.postings.columns else [])
    post = index.postings.select(*post_cols)
    if pushdown_max_terms is not None:
        # bounded probe: ≤ cap+1 distinct terms collected; when the batch
        # vocabulary fits, the IN-list reaches the parquet scan (pruned
        # buckets / bloom-skipped row groups, the mini-index pruning)
        sample = [r[0] for r in
                  qtf.select("term").distinct()
                  .limit(pushdown_max_terms + 1).collect()]
        if len(sample) <= pushdown_max_terms:
            post = post.filter(F.col("term").isin(sample))

    joined = post.join(qtf, "term").join(index.term_stats, "term")
    if "dl" not in joined.columns:
        joined = joined.join(index.doc_stats, "doc_id")

    if model == "bm25":
        w = scoring.bm25_weight(n, avgdl)
    elif model == "bm25-reference":
        w = scoring.bm25_reference_weight(n, avgdl)
    elif model in ("lm-dirichlet", "lm-pyp"):
        joined = joined.withColumn("cf", F.col("df"))  # quirk 5: cf is df
        pyp = model == "lm-pyp"
        mu = scoring.LM_MU_PYP if pyp else scoring.LM_MU_DIRICHLET
        w = scoring.lm_weight(total, mu=mu, pitman_yor=pyp)
    else:
        raise ValueError(f"unknown model {model!r}")

    scored = joined.withColumn("weight", w * F.col("_qtf"))
    agg = (scored.groupBy("query_id", "doc_id")
           .agg(F.sum("weight").alias("score")))

    if model in ("lm-dirichlet", "lm-pyp"):
        # the additive doc prior scales with |q| PER QUERY — the batch
        # form of search_freetext_tokens' lm branch with query_len as a
        # column (qlen counts token OCCURRENCES, reference len(toks))
        pyp = model == "lm-pyp"
        mu = scoring.LM_MU_PYP if pyp else scoring.LM_MU_DIRICHLET
        qlen = (query_terms.groupBy("query_id")
                .agg(F.count("*").alias("_qlen")))
        dl = F.col("dl").cast("double")
        if pyp:
            disc = F.greatest(dl - F.lit(0.2) * F.pow(dl, F.lit(0.2)),
                              F.lit(0.0))
            p = F.log(F.lit(1.0) - disc / (dl + F.lit(mu)))
        else:
            p = F.log(F.lit(mu) / (dl + F.lit(mu)))
        agg = (agg.join(index.doc_stats, "doc_id").join(qlen, "query_id")
               .select("query_id", "doc_id",
                       (F.col("score")
                        + F.col("_qlen").cast("double") * p).alias("score")))
    return agg


def batch_topk(index: InvertedIndex, query_terms: DataFrame, k: int = 10,
               model: str = "bm25",
               pushdown_max_terms: int | None = DEFAULT_PUSHDOWN_MAX_TERMS,
               score_round: int | None = None) -> DataFrame:
    """Per-query top-k over ``batch_scores`` →
    (query_id, doc_id, score, rank), rank 1-based by
    (score DESC, doc_id ASC) within each query — the engine-wide
    tie-break (SURVEY §2.8 decision 3) applied per query partition.

    The rank window partitions by query_id: every query ranks inside its
    own small partition (candidate sets are df-bounded), so the batch
    never global-sorts — the distributed analog of N independent
    TakeOrderedAndProject heaps running as one stage.

    ``score_round`` ranks on scores rounded to that many decimals (and
    returns the rounded score) — the serving layer's display-rounding
    contract, which cross-engine gates use so a sub-1e-9 float wobble
    cannot flip adjacent ranks (the argmax-gate rule).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    agg = batch_scores(index, query_terms, model=model,
                       pushdown_max_terms=pushdown_max_terms)
    if score_round is not None:
        agg = agg.withColumn("score", F.round("score", score_round))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))


def queries_frame(index: InvertedIndex, queries: list[tuple[int, str]],
                  ) -> DataFrame:
    """Analyze raw query strings driver-side with the INDEX's analyzer
    (byte-identical to the document path, the engine invariant) and
    return the (query_id, term) frame ``batch_scores`` consumes. For
    query sets too large to analyze driver-side, build the frame with
    the same analyzer as a pandas UDF over a queries table instead."""
    from ..functions.analyzer import analyze_query

    spark = index.postings.sparkSession
    rows = [(qid, t) for qid, q in queries
            for t in analyze_query(q, index.analyzer)]
    return spark.createDataFrame(rows, "query_id long, term string")
