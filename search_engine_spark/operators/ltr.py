"""Learning-to-rank feature extraction: one Spark pass emits the
classic LTR feature block for every (query, candidate doc) pair.

The reference ranks with a single hand-tuned scorer per request
(query_processing.py); production web ranking instead trains a model
(LambdaMART/GBDT/neural) over per-pair FEATURES — and the feature
backfill over a query log is a batch job with exactly the
batch-retrieval shape (operators/batchsearch.py). This module is that
job: the batch join computes EVERY feature column in the same scan —
BM25, LM-Dirichlet, match counts, raw tf mass, doc length — so the
whole feature block costs one postings pass + one aggregate, not one
retrieval run per feature. Optional static-prior (PageRank) and
recency-age columns join on the bounded candidate set afterwards, never
on the corpus.

Scale shape mirrors batch_scores: the only corpus-scale shuffle keys on
(query_id, doc_id); candidates are cut to top-k per query by BM25 via a
per-query window (no global sort); prior/date joins run AFTER the cut,
on ≤ |queries|·k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import scoring
from .batchsearch import DEFAULT_PUSHDOWN_MAX_TERMS
from .search import InvertedIndex


def extract_features(index: InvertedIndex, query_terms: DataFrame,
                     k: int = 100,
                     prior: DataFrame | None = None,
                     prior_id_col: str = "node", prior_col: str = "rank",
                     doc_dates: DataFrame | None = None,
                     as_of=None,
                     pushdown_max_terms: int | None =
                     DEFAULT_PUSHDOWN_MAX_TERMS,
                     score_round: int | None = None) -> DataFrame:
    """→ (query_id, doc_id, rank, bm25, lm_dirichlet, n_matched,
    sum_tf, dl[, log_prior][, age_days]).

    ``query_terms``: (query_id, term), one row per analyzed token
    occurrence (duplicates = query tf — the bag semantics every scorer
    here shares). Candidates are the per-query BM25 top-``k`` (rank is
    the engine tie-break: score DESC, doc_id ASC); every feature is
    computed for exactly those pairs:

    * ``bm25`` — the standard k1=1.2/b=0.75 sum (scoring.bm25_weight);
      value-identical to batchsearch.batch_scores(model='bm25').
    * ``lm_dirichlet`` — the full LM score incl. the per-doc additive
      prior qlen·ln(µ/(dl+µ)) (µ = scoring.LM_MU_DIRICHLET, cf==df
      quirk pinned there); value-identical to batch_scores(model=
      'lm-dirichlet').
    * ``n_matched`` — distinct query terms present in the doc;
      ``sum_tf`` — their raw tf mass; ``dl`` — doc length.
    * ``log_prior`` (with ``prior``) — ln(prior) with absent docs at
      the search.blend_doc_prior 1e-12 floor, the ranking mixture's
      exact input.
    * ``age_days`` (with ``doc_dates`` (doc_id, warc_date) and
      ``as_of``) — datediff(as_of, warc_date), the freshness-decay
      input; docs missing a date get NULL (a trainable signal, not a
      silent 0).

    ``score_round`` ranks candidates on (and emits) bm25/lm scores
    rounded to that many decimals — batch_topk's display-rounding
    contract, which cross-engine gates use so a sub-1e-9 float wobble
    cannot flip adjacent ranks.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if (doc_dates is None) != (as_of is None):
        raise ValueError("doc_dates and as_of must be provided together")
    n = index.stats["n_docs"]
    avgdl = index.stats["avgdl"]
    total = index.stats["total_len"]
    mu = scoring.LM_MU_DIRICHLET

    qtf = (query_terms.groupBy("query_id", "term")
           .agg(F.count("*").alias("_qtf")))
    qlen = (query_terms.groupBy("query_id")
            .agg(F.count("*").alias("_qlen")))

    post_cols = ["term", "doc_id", "tf"] + (
        ["dl"] if "dl" in index.postings.columns else [])
    post = index.postings.select(*post_cols)
    if pushdown_max_terms is not None:
        sample = [r[0] for r in
                  qtf.select("term").distinct()
                  .limit(pushdown_max_terms + 1).collect()]
        if len(sample) <= pushdown_max_terms:
            post = post.filter(F.col("term").isin(sample))

    joined = post.join(qtf, "term").join(index.term_stats, "term")
    if "dl" not in joined.columns:
        joined = joined.join(index.doc_stats, "doc_id")
    # both term weights in the SAME row before the single aggregate
    joined = joined.withColumn("cf", F.col("df"))  # LM cf==df quirk
    bm25_w = scoring.bm25_weight(n, avgdl) * F.col("_qtf")
    lm_w = scoring.lm_weight(total, mu=mu) * F.col("_qtf")

    feats = (joined.groupBy("query_id", "doc_id")
             .agg(F.sum(bm25_w).alias("bm25"),
                  F.sum(lm_w).alias("_lm_match"),
                  F.countDistinct("term").cast("long").alias("n_matched"),
                  F.sum("tf").cast("long").alias("sum_tf"),
                  F.first("dl").cast("long").alias("dl")))
    dl = F.col("dl").cast("double")
    feats = (feats.join(qlen, "query_id")
             .withColumn(
                 "lm_dirichlet",
                 F.col("_lm_match") + F.col("_qlen").cast("double")
                 * F.log(F.lit(mu) / (dl + F.lit(mu))))
             .drop("_lm_match", "_qlen"))
    if score_round is not None:
        feats = (feats.withColumn("bm25", F.round("bm25", score_round))
                 .withColumn("lm_dirichlet",
                             F.round("lm_dirichlet", score_round)))

    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc("doc_id"))
    out = (feats.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "doc_id", "rank", "bm25", "lm_dirichlet",
                   "n_matched", "sum_tf", "dl"))

    if prior is not None:
        p = prior.select(F.col(prior_id_col).alias("doc_id"),
                         F.col(prior_col).alias("_p"))
        out = (out.join(p, "doc_id", "left")
               .withColumn("log_prior",
                           F.log(F.coalesce(F.col("_p"), F.lit(1e-12))))
               .drop("_p"))
    if doc_dates is not None:
        d = doc_dates.select("doc_id", "warc_date")
        out = (out.join(d, "doc_id", "left")
               .withColumn("age_days",
                           F.datediff(F.lit(as_of), F.col("warc_date"))
                           .cast("long"))
               .drop("warc_date"))
    return out


# ---------------------------------------------------------------------------
# Pointwise logistic ranker over the feature block (round-5): the model
# that CONSUMES extract_features — trained with the classifier module's
# distributed full-batch GD (one map-side-combined aggregate per
# iteration, only the d-vector on the driver) and served as a pure-JVM
# rerank stage over the candidate cut.
# ---------------------------------------------------------------------------

#: model feature layout (index → meaning); intercept rides as x[0].
#: Count/length features enter as ln(1+·) so one feature's magnitude
#: cannot drown the gradient (the standard LTR normalization).
LTR_FEATURE_NAMES = [
    "intercept",       # 1.0
    "bm25",            # the base relevance score
    "lm_dirichlet",    # the second scorer's opinion
    "n_matched",       # distinct query terms present
    "log_sum_tf",      # ln(1 + raw tf mass)
    "log_dl",          # ln(1 + doc length)
]


def feature_vectors(feats: DataFrame) -> DataFrame:
    """extract_features output → (query_id, doc_id, bm25, x
    array<double>): the fixed LTR_FEATURE_NAMES vector, pure column
    expressions (a projection over the feature block, no second pass).
    bm25 rides alongside x because the rerank blend anchors on it."""
    x = F.array(
        F.lit(1.0),
        F.col("bm25").cast("double"),
        F.col("lm_dirichlet").cast("double"),
        F.col("n_matched").cast("double"),
        F.log(F.lit(1.0) + F.col("sum_tf").cast("double")),
        F.log(F.lit(1.0) + F.col("dl").cast("double")),
    )
    return feats.select("query_id", "doc_id", "bm25", x.alias("x"))


def train_pointwise_ranker(feats: DataFrame, labels: DataFrame,
                           iters: int = 20, lr: float = 0.1,
                           l2: float = 0.0,
                           init: list[float] | None = None) -> list[float]:
    """Pointwise LTR: logistic regression over (query, doc) feature
    vectors against relevance labels (query_id, doc_id, label ∈ {0,1})
    — the classifier module's train_logistic core (ONE aggregate per
    iteration), keyed on the (query_id, doc_id) pair instead of the
    doc. Returns the LTR_FEATURE_NAMES weight vector; determinism up to
    float-sum combine order, so the driver gate scores with PINNED
    weights and training is pytest-gated (the classifier's protocol)."""
    from .classifier import train_logistic

    fx = feature_vectors(feats)
    joined = fx.join(labels, ["query_id", "doc_id"])
    return train_logistic(joined, len(LTR_FEATURE_NAMES), iters=iters,
                          lr=lr, l2=l2, init=init)


def rerank(feats: DataFrame, weights: list[float], k: int = 100,
           score_round: int | None = None) -> DataFrame:
    """The rerank stage: → (query_id, doc_id, rank, score) with
    score = bm25 + w·x over the candidate feature block — the learned
    model adjusts the base ranking rather than replacing it, so
    ALL-ZERO weights reproduce the plain BM25 ranking exactly (the
    identity the driver gate pins) and a candidate the model has no
    opinion on keeps its relevance order. Ranking is per query (window
    over query_id; candidates are already the bounded top-k cut — the
    window never sees the corpus), ties break (score DESC, doc_id ASC).
    The ranker is monotone in w·x, so ranking by the linear score
    equals ranking by σ(w·x) — the sigmoid is dropped for the oracle's
    sake (DuckDB replays the linear model exactly).

    ``score_round`` applies display rounding BEFORE the rank cut
    (extract_features' argmax-gate rule) so cross-engine gates cannot
    wobble on sub-1e-9 float noise."""
    if len(weights) != len(LTR_FEATURE_NAMES):
        raise ValueError(
            f"weights must have {len(LTR_FEATURE_NAMES)} components, "
            f"got {len(weights)}")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    fx = feature_vectors(feats)
    dot = F.lit(0.0)
    for j, wj in enumerate(weights):
        dot = dot + F.lit(float(wj)) * F.col("x").getItem(j)
    score = F.col("bm25") + dot
    if score_round is not None:
        score = F.round(score, score_round)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (fx.withColumn("score", score)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "score"))
