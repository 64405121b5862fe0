"""Rerank (Q7: title boost + recency with pinned as_of) and hydration
(S10) against a hand-computed expectation."""

from datetime import date

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import search as S


def test_rerank_title_boost_and_recency(spark, built_index, corpus_sdf, oracle_index):
    from tests import oracle

    o_index, doc_sizes = oracle_index
    base = S.search_freetext(built_index, "market price", k=20)
    as_of = date(2022, 4, 1)
    got = {
        r.doc_id: r.score
        for r in S.rerank(base, corpus_sdf, ["market", "price"], as_of, k=20,
                          ts_col="warc_ts").collect()
    }
    base_scores = dict(oracle.search_freetext(o_index, doc_sizes, "market price", k=20))
    texts = {r.doc_id: (r.text, r.warc_ts) for r in corpus_sdf.collect()}
    for d, s in got.items():
        want = base_scores[d]
        text, ts = texts[d]
        low = text[:100].lower()  # title surrogate = text head
        for t in ("market", "price"):
            if t in low:
                want *= 1.10
        days = (as_of - ts.date()).days
        if 0 <= days < 100:
            want *= 1.40 - days * (0.6 / 99.0)
        assert s == pytest.approx(want, abs=1e-9), d


def test_rerank_without_recency(spark, built_index, corpus_sdf):
    base = S.search_freetext(built_index, "germany", k=5)
    out = S.rerank(base, corpus_sdf, ["germany"], date(2022, 4, 1), k=5)
    rows = out.collect()
    assert len(rows) == min(5, base.count())
    # head-surrogate title boost: ×1.10 only when the term appears in the
    # first 100 chars — verify per doc against the base scores
    base_scores = {r.doc_id: r.score for r in base.collect()}
    heads = {r.doc_id: r.text[:100].lower() for r in corpus_sdf.collect()}
    for r in rows:
        want = base_scores[r.doc_id]
        if "germany" in heads[r.doc_id]:
            want *= 1.10
        assert r.score == pytest.approx(want, abs=1e-9)


def test_hydrate_returns_documents(spark, built_index, corpus_sdf):
    base = S.search_freetext(built_index, "market", k=5)
    got = S.hydrate(base, corpus_sdf).collect()
    assert len(got) == 5
    assert all(r.text is not None and r.url is not None for r in got)
    # order preserved: score desc, doc_id asc
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_compare_runs(built_index):
    """S11 parity: BM25-vs-LM run comparison (positional + overlap),
    checked against a hand-computed Python-set model."""
    a = S.search_freetext(built_index, "market price", k=20, model="bm25")
    b = S.search_freetext(built_index, "market price", k=20, model="lm-dirichlet")
    got = S.compare_runs(a, b)
    ids_a = [r.doc_id for r in a.collect()]
    ids_b = [r.doc_id for r in b.collect()]
    assert got["overlap"] == len(set(ids_a) & set(ids_b))
    assert got["positional"] == sum(x == y for x, y in zip(ids_a, ids_b))
    assert got["n_a"] == len(ids_a) and got["n_b"] == len(ids_b)
    # a run compared with itself: full positional agreement
    self_cmp = S.compare_runs(a, a)
    assert self_cmp["positional"] == self_cmp["overlap"] == len(ids_a)
