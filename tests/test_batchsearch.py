"""Batch multi-query retrieval (operators/batchsearch.py).

The gated contract: every query in the batch scores value-identical to
its own single-query search_freetext_tokens run — the batch is a
throughput transform, never a semantics change.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import batchsearch as BS
from search_engine_spark.operators import search as S

QUERIES = [
    (1, "search index connect"),
    (2, "relational relation rationally"),
    (3, "search search index"),        # duplicate tokens → query tf 2
    (4, "zzz-out-of-vocabulary"),      # no hits
]


def _frame(index, queries=QUERIES):
    return BS.queries_frame(index, queries)


@pytest.mark.parametrize("model", ["bm25", "bm25-reference",
                                   "lm-dirichlet", "lm-pyp"])
def test_batch_equals_per_query(built_index, model):
    from search_engine_spark.functions.analyzer import analyze_query

    qf = _frame(built_index)
    batch = {
        (r.query_id, r.doc_id): r.score
        for r in BS.batch_scores(built_index, qf, model=model).collect()
    }
    seen = 0
    for qid, q in QUERIES:
        toks = analyze_query(q, built_index.analyzer)
        built_index.release_caches()
        single = S.search_freetext_tokens(built_index, toks, k=None,
                                          model=model).collect()
        for r in single:
            assert (qid, r.doc_id) in batch
            assert batch[(qid, r.doc_id)] == pytest.approx(r.score,
                                                           abs=1e-9)
            seen += 1
    assert seen == len(batch)  # no extra (query, doc) pairs either


def test_batch_topk_ranks(built_index):
    qf = _frame(built_index)
    rows = BS.batch_topk(built_index, qf, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {1, 2, 3}  # OOV query 4 contributes no rows
    assert all(len(rs) == 5 for rs in by_q.values())
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # rank order == (score DESC, doc_id ASC)
        key = [(-r.score, r.doc_id) for r in rs]
        assert key == sorted(key)
        assert len(rs) <= 5


def test_pushdown_cap_equivalence(built_index):
    """Above the term cap the join runs unpruned — same rows/values."""
    qf = _frame(built_index)
    a = sorted(map(tuple, BS.batch_scores(
        built_index, qf, pushdown_max_terms=2).collect()))
    b = sorted(map(tuple, BS.batch_scores(
        built_index, qf, pushdown_max_terms=None).collect()))
    c = sorted(map(tuple, BS.batch_scores(built_index, qf).collect()))
    assert a == b == c


def test_score_round_ranking(built_index):
    qf = _frame(built_index)
    rows = BS.batch_topk(built_index, qf, k=3, score_round=4).collect()
    for r in rows:
        assert r.score == round(r.score, 4)


def test_validation(built_index, spark):
    qf = _frame(built_index)
    with pytest.raises(ValueError, match="vsm"):
        BS.batch_scores(built_index, qf, model="vsm")
    with pytest.raises(ValueError, match="unknown model"):
        BS.batch_scores(built_index, qf, model="nope")
    with pytest.raises(ValueError, match="k must be"):
        BS.batch_topk(built_index, qf, k=0)
    empty = spark.createDataFrame([], "query_id long, term string")
    assert BS.batch_topk(built_index, empty, k=3).count() == 0


def test_plan_no_global_sort(built_index):
    """The per-query rank window never global-sorts: no Sort without a
    partitionBy-derived Exchange boundary ordering the WHOLE frame —
    i.e. the physical plan has no TakeOrderedAndProject and its Sort
    nodes are all preceded by hashpartitioning on query_id."""
    qf = _frame(built_index)
    plan = (BS.batch_topk(built_index, qf, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" not in plan
    assert "hashpartitioning(query_id" in plan
    assert "rangepartitioning" not in plan  # the global-sort signature
