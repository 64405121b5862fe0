"""Minimum-should-match (Lucene BooleanQuery mm) over free-text scoring."""

import pytest

from search_engine_spark.functions.analyzer import analyze_query
from search_engine_spark.operators import executor
from search_engine_spark.operators.search import search_freetext_tokens

QUERY = "search index connect"


def _toks(index):
    return analyze_query(QUERY, index.analyzer)


def test_mm1_is_plain_identity(built_index):
    """mm=1 keeps every matching doc with the same score. Scores agree
    to float-sum reassociation (the countDistinct column changes the
    physical aggregate's partial-sum order), not bit-identity."""
    toks = _toks(built_index)
    plain = dict(map(tuple, search_freetext_tokens(
        built_index, toks, k=None).collect()))
    mm1 = dict(map(tuple, search_freetext_tokens(
        built_index, toks, k=None, min_should_match=1).collect()))
    assert set(plain) == set(mm1)
    for d, s in mm1.items():
        assert s == pytest.approx(plain[d], rel=1e-12)


def test_mm_full_is_and_semantics(built_index):
    """mm=|terms| keeps exactly the docs matching EVERY distinct term,
    with scores unchanged (mm filters, never rescales)."""
    toks = _toks(built_index)
    plain = {r.doc_id: r.score for r in search_freetext_tokens(
        built_index, toks, k=None).collect()}
    # ground truth: docs present in every term's postings
    post = built_index.postings
    sets = []
    for t in set(toks):
        sets.append({r.doc_id for r in
                     post.filter(post.term == t).select("doc_id").collect()})
    expect = set.intersection(*sets)
    got = {r.doc_id: r.score for r in search_freetext_tokens(
        built_index, toks, k=None,
        min_should_match=len(set(toks))).collect()}
    assert set(got) == expect
    for d, s in got.items():
        assert s == pytest.approx(plain[d])


def test_mm_monotone_and_over_cap(built_index):
    toks = _toks(built_index)
    counts = [search_freetext_tokens(built_index, toks, k=None,
                                     min_should_match=m).count()
              for m in (1, 2, 3)]
    assert counts[0] >= counts[1] >= counts[2] > 0
    # more required clauses than the query has distinct terms: no match
    assert search_freetext_tokens(built_index, toks, k=None,
                                  min_should_match=4).count() == 0


def test_executor_mm_routing(built_index):
    plain = executor.execute(built_index, QUERY, k=10).collect()
    mm1 = executor.execute(built_index, QUERY, k=10,
                           min_should_match=1).collect()
    assert [r.doc_id for r in plain] == [r.doc_id for r in mm1]
    for a, b in zip(plain, mm1):
        assert b.score == pytest.approx(a.score, rel=1e-12)
    mm3 = executor.execute(built_index, QUERY, k=None, min_should_match=3)
    assert 0 < mm3.count() <= executor.execute(
        built_index, QUERY, k=None).count()


def test_refusals(built_index):
    with pytest.raises(ValueError, match="min_should_match must be"):
        search_freetext_tokens(built_index, ["search"], min_should_match=0)
    with pytest.raises(ValueError, match="adaptive"):
        search_freetext_tokens(built_index, ["search", "index"],
                               min_should_match=2, adaptive=True)
    with pytest.raises(ValueError, match="not vsm"):
        search_freetext_tokens(built_index, ["search"], model="vsm",
                               min_should_match=1)
    for q in ('search "index build"', "search AND index",
              "#5(search, index)"):
        with pytest.raises(ValueError, match="plain free-text"):
            executor.execute(built_index, q, min_should_match=2)
    with pytest.raises(ValueError, match="expansions"):
        executor.execute(built_index, QUERY, min_should_match=2,
                         rm3_alpha=0.6)
    with pytest.raises(ValueError, match="expansions"):
        executor.execute(built_index, QUERY, min_should_match=2,
                         fuzzy_max_dist=1)
    with pytest.raises(ValueError, match="expansions"):
        executor.execute(built_index, "sear* index", min_should_match=2)
