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
