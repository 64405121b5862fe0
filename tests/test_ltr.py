"""LTR feature extraction: every scorer column value-identical to its
standalone operator, candidate cut + optional joins correct."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import batchsearch as BS
from search_engine_spark.operators import ltr


@pytest.fixture(scope="module")
def qf(spark):
    rows = [(1, "market"), (1, "price"), (2, "germany"), (2, "economy"),
            (3, "market"), (3, "market")]
    return spark.createDataFrame(rows, "query_id long, term string")


def test_scorer_columns_match_batch_scores(built_index, qf):
    feats = {(r.query_id, r.doc_id): r
             for r in ltr.extract_features(built_index, qf,
                                           k=1 << 30).collect()}
    bm = {(r.query_id, r.doc_id): r.score
          for r in BS.batch_scores(built_index, qf, model="bm25").collect()}
    lm = {(r.query_id, r.doc_id): r.score
          for r in BS.batch_scores(built_index, qf,
                                   model="lm-dirichlet").collect()}
    assert set(feats) == set(bm) == set(lm) and feats
    for key, row in feats.items():
        assert row.bm25 == pytest.approx(bm[key], abs=1e-9), key
        assert row.lm_dirichlet == pytest.approx(lm[key], abs=1e-9), key


def test_aux_features_and_cut(built_index, qf, spark):
    out = ltr.extract_features(built_index, qf, k=3).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    for rows in per_q.values():
        assert len(rows) <= 3
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        # rank order follows (bm25 DESC, doc_id ASC)
        ordered = sorted(rows, key=lambda r: (-r.bm25, r.doc_id))
        assert [r.rank for r in ordered] == list(range(1, len(rows) + 1))
    # n_matched/sum_tf/dl consistency for one hand-checked pair
    r = next(iter(out))
    post = built_index.postings.filter(
        (F.col("doc_id") == r.doc_id)
        & F.col("term").isin(["market", "price", "germany", "economy"]))
    rows = post.select("term", "tf").collect()
    q_terms = {1: {"market", "price"}, 2: {"germany", "economy"},
               3: {"market"}}[r.query_id]
    mine = [x for x in rows if x.term in q_terms]
    assert r.n_matched == len(mine)
    assert r.sum_tf == sum(x.tf for x in mine)


def test_prior_and_age_columns(built_index, qf, spark):
    prior = spark.createDataFrame(
        [(d, 1.0 / (d + 2)) for d in range(1, 151, 2)],
        "node long, rank double")
    from datetime import date

    dates = spark.createDataFrame(
        [(d, date(2022, 1, 1 + d % 20)) for d in range(1, 100)],
        "doc_id long, warc_date date")
    out = ltr.extract_features(built_index, qf, k=5, prior=prior,
                               doc_dates=dates,
                               as_of=date(2022, 3, 1)).collect()
    import math

    for r in out:
        if r.doc_id % 2 == 1 and r.doc_id <= 149:
            assert r.log_prior == pytest.approx(
                math.log(1.0 / (r.doc_id + 2)), abs=1e-9)
        else:
            assert r.log_prior == pytest.approx(math.log(1e-12), abs=1e-9)
        if r.doc_id < 100:
            want = (date(2022, 3, 1)
                    - date(2022, 1, 1 + r.doc_id % 20)).days
            assert r.age_days == want
        else:
            assert r.age_days is None  # trainable missing-date signal


def test_validation(built_index, qf):
    with pytest.raises(ValueError, match="k must be"):
        ltr.extract_features(built_index, qf, k=0)
    with pytest.raises(ValueError, match="together"):
        ltr.extract_features(built_index, qf, as_of="2022-01-01")


# ---------------------------------------------------------------------------
# round-5: the pointwise ranker + rerank stage
# ---------------------------------------------------------------------------

def test_rerank_zero_weights_is_plain_bm25(built_index, qf):
    """ALL-ZERO weights reproduce the BM25 ranking exactly — the
    identity behind the ltr_rerank_topk driver gate."""
    feats = ltr.extract_features(built_index, qf, k=10, score_round=4)
    base = {(r.query_id, r.doc_id): (r.rank, r.bm25)
            for r in feats.collect()}
    out = ltr.rerank(feats, [0.0] * len(ltr.LTR_FEATURE_NAMES), k=10,
                     score_round=4).collect()
    assert {(r.query_id, r.doc_id) for r in out} == set(base)
    for r in out:
        rank, bm25 = base[(r.query_id, r.doc_id)]
        assert r.rank == rank
        assert r.score == pytest.approx(bm25, abs=1e-9)


def test_rerank_weights_change_order_deterministically(built_index, qf):
    feats = ltr.extract_features(built_index, qf, k=10, score_round=4)
    w = [0.0] * len(ltr.LTR_FEATURE_NAMES)
    w[ltr.LTR_FEATURE_NAMES.index("log_dl")] = -100.0  # crush long docs
    out = ltr.rerank(feats, w, k=10).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    dl = {(r.query_id, r.doc_id): r.dl for r in feats.collect()}
    import math

    for qid, rows in per_q.items():
        rows.sort(key=lambda r: r.rank)
        # score really is bm25 + w·x for the hand-built weight vector
        base = {(r.query_id, r.doc_id): r.bm25 for r in feats.collect()}
        for r in rows:
            want = base[(qid, r.doc_id)] - 100.0 * math.log(
                1.0 + dl[(qid, r.doc_id)])
            assert r.score == pytest.approx(want, abs=1e-6)
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_train_pointwise_ranker_learns_the_label_rule(built_index, qf,
                                                      spark):
    """GD on a separable rule (label = bm25 rank <= 3) must push the
    learned model toward ranking labeled-relevant docs first: the
    learned weights are finite and training strictly reduces
    log-loss vs the zero model (convex objective; lr sized for the
    unscaled bm25/lm feature magnitudes)."""
    import math

    feats = ltr.extract_features(built_index, qf, k=10)
    labels = feats.select(
        "query_id", "doc_id",
        (F.col("rank") <= 3).cast("int").alias("label"))
    w = ltr.train_pointwise_ranker(feats, labels, iters=50, lr=0.01)
    assert len(w) == len(ltr.LTR_FEATURE_NAMES)
    assert all(math.isfinite(x) for x in w)

    # log-loss under the trained model < log-loss under w=0 (ln 2)
    fx = ltr.feature_vectors(feats).join(labels, ["query_id", "doc_id"])
    rows = fx.select("x", "label").collect()
    from search_engine_spark.operators.classifier import sigmoid

    def loss(wv):
        tot = 0.0
        for r in rows:
            p = sigmoid(sum(a * b for a, b in zip(wv, r.x)))
            p = min(max(p, 1e-12), 1 - 1e-12)
            tot += -(r.label * math.log(p)
                     + (1 - r.label) * math.log(1 - p))
        return tot / len(rows)

    assert loss(w) < loss([0.0] * len(w))


def test_rerank_validation(built_index, qf):
    feats = ltr.extract_features(built_index, qf, k=5)
    with pytest.raises(ValueError, match="components"):
        ltr.rerank(feats, [0.0, 1.0])
    with pytest.raises(ValueError, match="k must be"):
        ltr.rerank(feats, [0.0] * len(ltr.LTR_FEATURE_NAMES), k=0)
