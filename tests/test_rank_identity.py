"""Rank-identity gate: Spark engine top-k == pinned oracle top-k.

This is the BASELINE.json correctness criterion ("matching the reference's
top-k docIDs and BM25 scores rank-identically on the reference query set").
Scores asserted to 1e-9; tie-break (score desc, doc_id asc) pinned on both
sides (SURVEY §2.8 pins 2-3).
"""

import pytest

from search_engine_spark.operators import search as S
from tests import oracle

QUERIES = [
    "world",                       # single term
    "hello world germany",         # multi-term
    "connect",                     # stem family collapses to one term
    "market price growth",
    "zzzqq",                       # OOV → empty
    "the of and",                  # stopword-only → empty
    "€100 £50",                    # currency tokens
    "hello hello world",           # repeated query term (query tf = 2)
]

MODELS = ["bm25", "bm25-reference", "vsm", "lm-dirichlet", "lm-pyp"]


def _spark_topk(idx, query, model, k=100, adaptive=False):
    rows = S.search_freetext(idx, query, k=k, model=model, adaptive=adaptive).collect()
    return [(r.doc_id, r.score) for r in rows]


def _assert_rank_identical(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


@pytest.mark.parametrize("query", QUERIES)
def test_bm25_rank_identity(built_index, oracle_index, corpus_docs, query):
    index, _ = oracle_index, None
    o_index, doc_sizes = oracle_index
    want = oracle.search_freetext(o_index, doc_sizes, query, k=100, model="bm25")
    got = _spark_topk(built_index, query, "bm25")
    _assert_rank_identical(got, want)


@pytest.mark.parametrize("model", MODELS)
def test_all_models_rank_identity(built_index, oracle_index, model):
    o_index, doc_sizes = oracle_index
    q = "hello world market"
    want = oracle.search_freetext(o_index, doc_sizes, q, k=100, model=model)
    got = _spark_topk(built_index, q, model)
    _assert_rank_identical(got, want)


def test_adaptive_candidates_identity(built_index, oracle_index):
    o_index, doc_sizes = oracle_index
    q = "hello world germany"
    want = oracle.search_freetext(o_index, doc_sizes, q, k=100, model="bm25",
                                  adaptive=True)
    got = _spark_topk(built_index, q, "bm25", adaptive=True)
    _assert_rank_identical(got, want)


def test_k_cut(built_index, oracle_index):
    o_index, doc_sizes = oracle_index
    want = oracle.search_freetext(o_index, doc_sizes, "market", k=10)
    got = _spark_topk(built_index, "market", "bm25", k=10)
    assert len(got) == len(want) <= 10
    _assert_rank_identical(got, want)
