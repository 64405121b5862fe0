"""CORI shard resource selection + routed search (operators/federation.py).

Gates: the CORI belief formula against a hand-computed toy example, the
all-shards routing identity vs the unrouted search, topical routing
recall, hash/assigned restriction equivalence, and input validation.
"""

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark import engine
from search_engine_spark.functions.analyzer import AnalyzerConfig
from search_engine_spark.operators import federation as fed
from search_engine_spark.operators import search as S

SIMPLE = AnalyzerConfig.simple()


@pytest.fixture(scope="module")
def fed_setup(spark, corpus_sdf):
    idx = engine.build_index(corpus_sdf, SIMPLE, positional=False)
    assignment = fed.assign_shards(corpus_sdf, n_shards=4).cache()
    ts, sizes = fed.shard_stats(idx.postings, idx.doc_stats, assignment)
    return idx, assignment, ts.cache(), sizes.cache()


def test_assign_shards_deterministic_and_total(fed_setup, corpus_sdf):
    _, assignment, _, _ = fed_setup
    n = corpus_sdf.count()
    assert assignment.count() == n
    shards = [r["shard"] for r in
              assignment.select("shard").distinct().collect()]
    assert set(shards) <= {0, 1, 2, 3}
    # re-derivation is identical (pure expression, order-independent)
    again = fed.assign_shards(corpus_sdf.orderBy(F.desc("doc_id")), 4)
    diff = assignment.join(again.withColumnRenamed("shard", "s2"), "doc_id") \
        .filter(F.col("shard") != F.col("s2")).count()
    assert diff == 0


def test_cori_formula_hand_computed(spark):
    """2 shards, hand-computable stats: shard 0 = {a a b}, {a c};
    shard 1 = {b b}, {c}. Query 'a b' — belief per published formula."""
    rows = [(0, "a", 2, 3), (0, "b", 1, 1), (0, "c", 1, 1),
            (1, "b", 1, 2), (1, "c", 1, 1)]
    ts = spark.createDataFrame(rows, "shard int, term string, df_s long, cf_s long")
    sizes = spark.createDataFrame([(0, 2, 5), (1, 2, 3)],
                                  "shard int, n_docs_s long, cw_s long")
    got = {r["shard"]: r["score"]
           for r in fed.cori_scores(ts, sizes, ["a", "b"]).collect()}

    avg_cw = 4.0
    s, b = 2, 0.4

    def belief(df_s, cw_s, cf_t):
        t = df_s / (df_s + 50 + 150 * cw_s / avg_cw)
        i = math.log((s + 0.5) / cf_t) / math.log(s + 1.0)
        return t * i

    # shard 0: a present (df=2, cf_t=1), b present (df=1, cf_t=2)
    exp0 = 2 * b + (1 - b) * (belief(2, 5, 1) + belief(1, 5, 2))
    # shard 1: a absent (floor only), b present (df=1, cf_t=2)
    exp1 = 2 * b + (1 - b) * belief(1, 3, 2)
    assert got[0] == pytest.approx(round(exp0, 6), abs=1e-6)
    assert got[1] == pytest.approx(round(exp1, 6), abs=1e-6)
    assert got[0] > got[1]  # 'a' lives only in shard 0


def test_all_shards_routing_identity(fed_setup):
    """m = n_shards routed search == unrouted search, row-for-row."""
    idx, _, ts, sizes = fed_setup
    toks = ["market", "bank", "energy"]
    full = S.search_freetext_tokens(idx, toks, k=50).collect()
    routed = fed.search_routed(idx, toks, ts, sizes, n_shards=4, m=4,
                               k=50).collect()
    assert full  # vocabulary check: the query terms exist in the corpus
    assert [(r["doc_id"], round(r["score"], 6)) for r in full] == \
           [(r["doc_id"], round(r["score"], 6)) for r in routed]


def test_partial_routing_is_subset_with_identical_scores(fed_setup):
    """m=2 of 4: every routed hit appears in the full ranking with the
    SAME score (global stats ⇒ routing is recall-only), and every hit's
    doc really lives in a selected shard."""
    idx, assignment, ts, sizes = fed_setup
    toks = ["market", "bank", "energy"]
    full = {r["doc_id"]: round(r["score"], 6)
            for r in S.search_freetext_tokens(idx, toks, k=None).collect()}
    chosen = fed.select_shards(fed.cori_scores(ts, sizes, toks), 2)
    routed = fed.search_routed(idx, toks, ts, sizes, n_shards=4, m=2,
                               k=None).collect()
    assert routed  # 2 of 4 hash shards hold ~half the corpus
    members = {r["doc_id"] for r in
               assignment.filter(F.col("shard").isin(chosen)).collect()}
    for r in routed:
        assert round(r["score"], 6) == full[r["doc_id"]]
        assert r["doc_id"] in members


def test_hash_and_assigned_restriction_agree(fed_setup):
    """restrict_index_hash (pure filter) and restrict_index_assigned
    (semi join on the materialized table) select the same docs."""
    idx, assignment, _, _ = fed_setup
    a = fed.restrict_index_hash(idx, 4, [1, 3]).doc_stats
    b = fed.restrict_index_assigned(idx, assignment, [1, 3]).doc_stats
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == \
           sorted(r["doc_id"] for r in b.select("doc_id").collect())


def test_topical_routing_prefers_topic_shard(spark):
    """Two disjoint-vocabulary topics in different shards: CORI routes a
    topic query to the right shard at m=1 with full recall."""
    docs = [(i, " ".join(["solar", "panel", "energy"] * 5)) for i in range(1, 11)] + \
           [(i, " ".join(["protein", "enzyme", "cell"] * 5)) for i in range(11, 21)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    idx = engine.build_index(sdf, SIMPLE, positional=False)
    assignment = spark.createDataFrame(
        [(i, 0 if i <= 10 else 1) for i in range(1, 21)],
        "doc_id long, shard int")
    ts, sizes = fed.shard_stats(idx.postings, idx.doc_stats, assignment)
    toks = ["protein", "cell"]
    chosen = fed.select_shards(fed.cori_scores(ts, sizes, toks), 1)
    assert chosen == [1]
    routed = fed.search_routed(idx, toks, ts, sizes, n_shards=2, m=1,
                               k=None, assignment=assignment)
    full = S.search_freetext_tokens(idx, toks, k=None)
    assert routed.count() == full.count() == 10  # m=1 lost nothing


def test_min_df_prunes_routing_table(fed_setup):
    idx, assignment, _, _ = fed_setup
    ts, _ = fed.shard_stats(idx.postings, idx.doc_stats, assignment,
                            min_df=3)
    assert ts.filter(F.col("df_s") < 3).count() == 0


def test_validation():
    with pytest.raises(ValueError):
        fed.shard_expr(F.col("doc_id"), 0)
    with pytest.raises(ValueError):
        fed.select_shards(None, 0)


def test_cori_empty_terms_refused(fed_setup):
    _, _, ts, sizes = fed_setup
    with pytest.raises(ValueError):
        fed.cori_scores(ts, sizes, [])
