"""RM3 pseudo-relevance feedback (search.search_rm3)."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark import engine
from search_engine_spark.functions.analyzer import AnalyzerConfig
from search_engine_spark.operators import search as S


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return engine.build_index(docs, AnalyzerConfig.full())


@pytest.fixture(scope="module")
def toy_idx(spark):
    """Corpus where expansion matters: docs about 'orchard' co-mention
    'cider'; one doc mentions ONLY cider and never orchard."""
    rows = [
        (1, "orchard harvest cider press autumn"),
        (2, "orchard trees cider barrels stored"),
        (3, "orchard visit cider tasting event"),
        (4, "cider bottles shipped nationwide today"),   # no 'orchard'
        (5, "granite quarry blasting schedule notice"),
        (6, "quarterly ledger totals reviewed carefully"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return engine.build_index(docs, AnalyzerConfig.full())


def test_rm3_alpha1_is_plain_bm25(spark, idx):
    toks = ["spark", "queri", "join"]
    plain = [(r.doc_id, r.score)
             for r in S.search_freetext_tokens(idx, toks, k=50).collect()]
    rm3 = [(r.doc_id, r.score)
           for r in S.search_rm3(idx, toks, k=50, alpha=1.0).collect()]
    assert rm3 == plain  # exact score identity, not just rank


def test_rm3_expansion_recalls_cooccurring_doc(spark, toy_idx):
    toks = ["orchard"]
    plain = {r.doc_id for r in
             S.search_freetext_tokens(toy_idx, toks, k=6).collect()}
    assert plain == {1, 2, 3}          # doc 4 unreachable without feedback
    rm3 = {r.doc_id for r in
           S.search_rm3(toy_idx, toks, k=6, fb_docs=3, fb_terms=5,
                        alpha=0.5).collect()}
    assert {1, 2, 3}.issubset(rm3)
    assert 4 in rm3                    # pulled in via the 'cider' expansion
    assert 5 not in rm3 and 6 not in rm3


def test_rm3_originals_still_dominate(spark, toy_idx):
    out = S.search_rm3(toy_idx, ["orchard"], k=6, fb_docs=3, fb_terms=5,
                       alpha=0.5).collect()
    scores = {r.doc_id: r.score for r in out}
    # every orchard doc outranks the cider-only doc at alpha=0.5
    assert all(scores[d] > scores[4] for d in (1, 2, 3))


def test_rm3_oov_query_empty(spark, toy_idx):
    assert S.search_rm3(toy_idx, ["zzzqq"], k=6, alpha=0.5).count() == 0


def test_rm3_requires_documents(spark, toy_idx):
    import dataclasses

    bare = dataclasses.replace(toy_idx, documents=None)
    with pytest.raises(ValueError, match="documents"):
        S.search_rm3(bare, ["orchard"], alpha=0.5)


def test_executor_rm3_end_to_end(spark, toy_idx):
    from search_engine_spark.operators import executor

    out = {r.doc_id for r in
           executor.execute(toy_idx, "orchard", k=6,
                            rm3_alpha=0.5, rm3_fb_docs=3,
                            rm3_fb_terms=5).collect()}
    assert 4 in out and {1, 2, 3}.issubset(out)


def test_executor_rm3_refusals(spark, toy_idx):
    from datetime import date

    from search_engine_spark.operators import executor

    with pytest.raises(ValueError, match="free-text"):
        executor.execute(toy_idx, '"orchard harvest"', rm3_alpha=0.5)
    with pytest.raises(ValueError, match="free-text"):
        executor.execute(toy_idx, "orchard AND cider", rm3_alpha=0.5)
    with pytest.raises(ValueError, match="bm25"):
        executor.execute(toy_idx, "orchard", rm3_alpha=0.5, model="vsm")
