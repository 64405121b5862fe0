"""Static index pruning: kept postings score identically to the full
index (subset-with-identical-scores), recall degrades monotonically,
keep >= max df is the identity."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import pruning
from search_engine_spark.operators import search as S


def test_pruned_scores_are_a_subset_with_identical_scores(built_index):
    full = {r.doc_id: r.score for r in S.search_freetext_tokens(
        built_index, ["market", "price"], k=None).collect()}
    pr = pruning.pruned_index(built_index, per_term_keep=10)
    got = {r.doc_id: r.score for r in S.search_freetext_tokens(
        pr, ["market", "price"], k=None).collect()}
    assert got and set(got) <= set(full)
    for d, s in got.items():
        # a doc surviving with ALL its query-term postings scores
        # exactly the full value; one surviving PARTIALLY scores the
        # kept subset — still never MORE than the full score
        assert s <= full[d] + 1e-9


def test_fully_kept_docs_score_exactly(built_index):
    """Docs whose every query-term posting survives the cut score
    bit-identically (global stats are untouched)."""
    pr = pruning.pruned_index(built_index, per_term_keep=10)
    kept_pairs = {(r.term, r.doc_id) for r in pr.postings
                  .filter(F.col("term").isin(["market", "price"]))
                  .collect()}
    full_rows = built_index.postings \
        .filter(F.col("term").isin(["market", "price"])).collect()
    by_doc = {}
    for r in full_rows:
        by_doc.setdefault(r.doc_id, set()).add(r.term)
    fully_kept = {d for d, terms in by_doc.items()
                  if all((t, d) in kept_pairs for t in terms)}
    full = {r.doc_id: r.score for r in S.search_freetext_tokens(
        built_index, ["market", "price"], k=None).collect()}
    got = {r.doc_id: r.score for r in S.search_freetext_tokens(
        pr, ["market", "price"], k=None).collect()}
    assert fully_kept
    for d in fully_kept:
        assert got[d] == full[d], d


def test_keep_window_shape_and_monotone_recall(built_index):
    p2 = pruning.prune_postings(built_index.postings, 2)
    counts = p2.groupBy("term").count().agg(F.max("count")).collect()[0][0]
    assert counts <= 2
    # kept set grows monotonically with keep
    n2 = pruning.pruned_index(built_index, 2).postings.count()
    n8 = pruning.pruned_index(built_index, 8).postings.count()
    nfull = built_index.postings.count()
    assert n2 <= n8 <= nfull
    # identity at huge keep
    assert pruning.pruned_index(built_index, 1 << 30).postings.count() \
        == nfull
    with pytest.raises(ValueError, match="per_term_keep"):
        pruning.prune_postings(built_index.postings, 0)
