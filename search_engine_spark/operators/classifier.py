"""Trainable document-quality classifier — the FineWeb/CCNet-style
learned quality filter, the step after the rule-based signals
(textquality.quality_score / unigram_logprob) in a web-corpus curation
funnel: score every document with σ(w·x) over cheap lexical features
and keep the high-probability slice.

The reference has no learned filter (its quality gates are the
analyzer's stopword/length rules); this is a first-class LLM-pipeline
operator per the task brief. No ML library is used: full-batch logistic
regression by gradient descent IS a pair of DataFrame aggregates — the
distributed formulation a 100 TB corpus needs anyway (sklearn would
collect the features to one node).

Scale shape:
* ``doc_features`` — one pass over quality_score's output (its single
  Arrow UDF is the only Python in the path), pure JVM column math into
  a fixed-width array<double>. Cache it once per training session.
* ``train_quality_classifier`` — per iteration ONE map-side-combined
  aggregate: grad = Σ xᵀ·(σ(w·x) − y) / n with w shipped as literals
  (never a Python UDF, never a collect of the corpus); the driver
  holds only the d-vector. 20 iterations = 20 linear jobs over the
  cached features — the classic distributed full-batch GD.
* ``classifier_scores`` — pure JVM dot-product + sigmoid, no shuffle;
  the serving/filter pass.

Determinism: features are exact integer counts scaled by constants;
the gradient is a floating-point SUM whose combine order Spark does not
pin, so retrained weights agree across runs only to ~1e-12 — the tests
therefore gate on tolerances and on parity with a numpy replica of the
same updates, and the DRIVER oracle entry scores with PINNED weights
(exactly reproducible cross-engine), keeping training out of the
hash-compare path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: feature layout produced by doc_features (index → meaning); the
#: intercept rides as x[0] so w is a single flat vector
FEATURE_NAMES = [
    "intercept",          # 1.0
    "log_n_tokens",       # ln(1 + n_tokens)
    "distinct_ratio",     # unique/total tokens
    "stopword_ratio",     # stopword share of the unique tokens
    "mean_token_len_dm",  # mean token length / 10 (decimeter-ish scale)
]


def doc_features(quality: DataFrame) -> DataFrame:
    """quality_score() output → (doc_id, x array<double>): the fixed
    FEATURE_NAMES vector. Kept as pure column expressions over the
    already-computed counts; at 100 TB this is a projection, not a
    second text pass."""
    x = F.array(
        F.lit(1.0),
        # plain ln(1+n), NOT log1p: the oracle's LN(1 + n_tokens) must be
        # the bit-identical computation (log1p is a different algorithm)
        F.log(F.lit(1.0) + F.col("n_tokens").cast("double")),
        F.col("distinct_ratio").cast("double"),
        F.col("stopword_ratio").cast("double"),
        (F.col("mean_token_len") / F.lit(10.0)).cast("double"),
    )
    return quality.select("doc_id", x.alias("x"))


def _dot_sigmoid(weights: list[float]):
    """(σ(w·x), column) for a literal weight vector — JVM-only."""
    dot = F.lit(0.0)
    for j, wj in enumerate(weights):
        dot = dot + F.lit(float(wj)) * F.col("x").getItem(j)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))


def train_logistic(joined: DataFrame, d: int, iters: int = 20,
                   lr: float = 1.0, l2: float = 0.0,
                   init: list[float] | None = None) -> list[float]:
    """The shared distributed full-batch GD core: ``joined`` is a
    pre-joined (x array<double>[d], label ∈ {0,1}) frame; returns the
    weight vector after ``iters`` steps w ← w − lr·(∇ + l2·w),
    ∇ = Σ x·(σ(w·x)−y)/n. ONE map-side-combined aggregate (d avg()
    columns) per iteration; only the d-vector ever reaches the driver.
    Used by the quality classifier (doc-keyed) and the LTR pointwise
    ranker (query-doc-keyed) — one GD, two operators."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0: {iters}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0: {lr}")
    w = list(init) if init is not None else [0.0] * d
    if len(w) != d:
        raise ValueError(f"init must have {d} components, got {len(w)}")
    joined = joined.select("x", "label")
    # one narrow cache: every iteration re-reads (x, label) only
    joined = joined.persist()
    try:
        if joined.limit(1).count() == 0:
            raise ValueError("no labeled rows: features ⋈ labels is empty")
        for _ in range(iters):
            err = _dot_sigmoid(w) - F.col("label").cast("double")
            grads = joined.agg(*[
                F.avg(err * F.col("x").getItem(j)).alias(f"g{j}")
                for j in range(d)
            ]).collect()[0]
            w = [wj - lr * (grads[f"g{j}"] + l2 * wj)
                 for j, wj in enumerate(w)]
    finally:
        joined.unpersist()
    return w


def train_quality_classifier(features: DataFrame, labels: DataFrame,
                             iters: int = 20, lr: float = 1.0,
                             l2: float = 0.0,
                             init: list[float] | None = None) -> list[float]:
    """Full-batch logistic regression: features (doc_id, x) ⋈ labels
    (doc_id, label ∈ {0,1}) → weight vector minimizing log-loss by
    ``iters`` gradient steps (train_logistic — the shared GD core).
    Deterministic up to float-sum order (~1e-12 run-to-run); see the
    module docstring for why that is fine.
    """
    return train_logistic(features.join(labels, "doc_id"),
                          len(FEATURE_NAMES), iters=iters, lr=lr, l2=l2,
                          init=init)


def classifier_scores(features: DataFrame,
                      weights: list[float]) -> DataFrame:
    """(doc_id, prob): σ(w·x) for every doc — the serving/filter pass.
    Pure JVM expressions, no shuffle, no UDF; prob rounded to 6 dp so
    engine and SQL oracle hash-match."""
    if len(weights) != len(FEATURE_NAMES):
        raise ValueError(
            f"weights must have {len(FEATURE_NAMES)} components, "
            f"got {len(weights)}")
    return features.select(
        "doc_id", F.round(_dot_sigmoid(weights), 6).alias("prob"))


def sigmoid(z: float) -> float:
    """Driver-side σ for tests/oracles (overflow-safe)."""
    if z >= 0:
        return 1.0 / (1.0 + math.exp(-z))
    e = math.exp(z)
    return e / (1.0 + e)
