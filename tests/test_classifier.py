"""Learned quality classifier (operators/classifier.py): feature
layout, scoring parity with a driver-side replica, full-batch GD
training (convergence on separable data + parity with a numpy replica
of the same updates), and the validation surface.

The driver entry ``quality_classifier`` pins SCORING cross-engine with
fixed weights; these tests own TRAINING (a distributed float sum whose
combine order Spark does not pin — tolerance-gated here, kept out of
the hash-compare path by design)."""

import math

import numpy as np
import pytest

from search_engine_spark.operators import classifier as C
from search_engine_spark.operators import textquality


@pytest.fixture(scope="module")
def feats(spark, corpus_sdf):
    f = C.doc_features(textquality.quality_score(corpus_sdf))
    f.persist()
    yield f
    f.unpersist()


def test_feature_layout_hand_computed(spark):
    """One crafted doc: x = [1, ln(1+n), distinct, stopword, mtl/10]
    exactly as FEATURE_NAMES declares."""
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id long, text string")
    row = C.doc_features(textquality.quality_score(docs)).collect()[0]
    x = row.x
    assert len(x) == len(C.FEATURE_NAMES) == 5
    # 6 tokens; 5 distinct (the ×2); stopwords among DISTINCT: the, on
    # (Glasgow list); char_sum = 3+3+3+2+3+3 = 17
    assert x[0] == 1.0
    assert x[1] == pytest.approx(math.log(7.0))
    assert x[2] == pytest.approx(round(5 / 6, 6))
    assert x[3] == pytest.approx(round(2 / 5, 6))
    assert x[4] == pytest.approx(round(17 / 6, 6) / 10.0)


def test_scores_match_driver_replica(feats):
    """classifier_scores == σ(w·x) recomputed row-by-row on the driver
    (same left-fold order), to the declared 6 dp."""
    w = [-6.0, 0.8, 2.0, 1.5, 0.5]
    got = {r.doc_id: r.prob for r in C.classifier_scores(feats, w).collect()}
    for r in feats.collect():
        dot = 0.0
        for wj, xj in zip(w, r.x):
            dot = dot + wj * xj
        assert got[r.doc_id] == pytest.approx(
            round(C.sigmoid(dot), 6), abs=1e-9)
    assert 0 < min(got.values()) and max(got.values()) < 1


def test_training_separates_planted_labels(spark):
    """Labels planted on a clean margin (distinct_ratio high vs low via
    repeated-token docs) are fit to >=95% training accuracy; the
    learned weights separate at the 0.5 threshold."""
    rows = []
    for i in range(40):
        uniq = " ".join(f"w{i}a{j}" for j in range(30))  # distinct = 1.0
        rows.append((i, uniq, 1))
    for i in range(40, 80):
        spam = " ".join(["buy", "now"] * 15)             # distinct ~0.07
        rows.append((i, spam, 0))
    docs = spark.createDataFrame([(d, t) for d, t, _ in rows],
                                 "doc_id long, text string")
    labels = spark.createDataFrame([(d, y) for d, _, y in rows],
                                   "doc_id long, label int")
    f = C.doc_features(textquality.quality_score(docs))
    w = C.train_quality_classifier(f, labels, iters=60, lr=2.0)
    probs = {r.doc_id: r.prob for r in C.classifier_scores(f, w).collect()}
    acc = sum((probs[d] >= 0.5) == (y == 1) for d, _, y in rows) / len(rows)
    assert acc >= 0.95
    # the discriminating feature (distinct_ratio) must carry + weight
    assert w[2] > 0


def test_training_matches_numpy_replica(spark, feats):
    """Same updates, two engines: full-batch GD on the collected feature
    matrix in numpy must agree with the distributed trainer to float-sum
    tolerance (the documented determinism bound)."""
    rows = feats.collect()
    labels = [(r.doc_id, 1 if r.x[2] > 0.8 else 0) for r in rows]
    ldf = spark.createDataFrame(labels, "doc_id long, label int")
    iters, lr, l2 = 7, 0.7, 0.01
    got = C.train_quality_classifier(feats, ldf, iters=iters, lr=lr, l2=l2)

    by_id = dict(labels)
    X = np.array([r.x for r in rows])
    y = np.array([by_id[r.doc_id] for r in rows], dtype=float)
    w = np.zeros(X.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        grad = X.T @ (p - y) / len(y)
        w = w - lr * (grad + l2 * w)
    assert got == pytest.approx(list(w), rel=1e-7, abs=1e-9)


def test_validation_surface(spark, feats):
    empty = spark.createDataFrame([], "doc_id long, label int")
    with pytest.raises(ValueError, match="no labeled rows"):
        C.train_quality_classifier(feats, empty, iters=1)
    some = spark.createDataFrame([(1, 1)], "doc_id long, label int")
    with pytest.raises(ValueError):
        C.train_quality_classifier(feats, some, iters=-1)
    with pytest.raises(ValueError):
        C.train_quality_classifier(feats, some, lr=0.0)
    with pytest.raises(ValueError):
        C.train_quality_classifier(feats, some, init=[1.0, 2.0])
    with pytest.raises(ValueError):
        C.classifier_scores(feats, [0.0, 1.0])
    # iters=0 returns the init unchanged (identity contract)
    assert C.train_quality_classifier(
        feats, some, iters=0, init=[1, 2, 3, 4, 5]) == [1, 2, 3, 4, 5]
