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


def test_rm3_lowest_feedback_doc_contributes(spark):
    """The score→mass shift floors at span/|fb| (round-4): the LOWEST
    scoring feedback doc gets mass sd=floor/total, so its unique terms
    carry real expansion weight. Under the old −min+1e-9 shift doc 3
    (reachable only via doc 2's unique term 'quince') scored ~1e-9."""
    rows = [
        (1, "apple apple apple apple zest"),   # strong feedback doc
        (2, "apple quince mill stone wheel"),  # weakest feedback doc
        (3, "quince jelly jars sealed tight"), # only reachable via quince
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = engine.build_index(docs, AnalyzerConfig.full())
    out = {r.doc_id: r.score for r in
           S.search_rm3(idx, ["appl"], k=3, fb_docs=2, fb_terms=10,
                        alpha=0.5).collect()}
    assert 3 in out
    # with 2 feedback docs the floor gives the low doc sd = 0.25, so the
    # quince weight is ~(1-α)·S·0.25·tf/dl — orders of magnitude above
    # the old 1e-9-proportional residue
    assert abs(out[3]) > 1e-4


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
    from search_engine_spark.operators import executor

    with pytest.raises(ValueError, match="free-text"):
        executor.execute(toy_idx, '"orchard harvest"', rm3_alpha=0.5)
    with pytest.raises(ValueError, match="free-text"):
        executor.execute(toy_idx, "orchard AND cider", rm3_alpha=0.5)
    with pytest.raises(ValueError, match="bm25"):
        executor.execute(toy_idx, "orchard", rm3_alpha=0.5, model="vsm")
    with pytest.raises(ValueError, match="adaptive"):
        executor.execute(toy_idx, "orchard", rm3_alpha=0.5, adaptive=True)


def test_executor_rm3_refusals_precede_empty_terms(spark, toy_idx):
    """Model/adaptive refusals fire even when every token is a stopword
    (round-4: the empty-frame early return used to shadow them)."""
    from search_engine_spark.operators import executor

    with pytest.raises(ValueError, match="bm25"):
        executor.execute(toy_idx, "the of and", rm3_alpha=0.5, model="vsm")
    with pytest.raises(ValueError, match="adaptive"):
        executor.execute(toy_idx, "the of and", rm3_alpha=0.5, adaptive=True)
    # the plain rm3 stopword-only query still returns empty, not raises
    assert executor.execute(toy_idx, "the of and", rm3_alpha=0.5).count() == 0


def test_executor_rm3_with_dates(spark, corpus_sdf, built_index):
    """rm3(alpha=1)+dates == plain BM25+dates exactly (score identity),
    and alpha<1 draws feedback docs from the date candidates only."""
    from search_engine_spark.operators import executor

    lo, hi = corpus_sdf.agg(F.min(F.to_date("warc_ts")),
                            F.max(F.to_date("warc_ts"))).first()
    ds, de = lo, lo + (hi - lo) / 2  # a genuinely restrictive range
    idx = built_index
    q = "germany market"  # the date-filter test's known-hit query
    plain = [(r.doc_id, r.score) for r in executor.execute(
        idx, q, k=50, date_start=ds, date_end=de).collect()]
    rm3 = [(r.doc_id, r.score) for r in executor.execute(
        idx, q, k=50, rm3_alpha=1.0, date_start=ds, date_end=de).collect()]
    assert rm3 == plain
    assert plain  # the range actually matched something
    # alpha<1: every result stays inside the date candidates
    in_range = {r.doc_id for r in executor.date_candidates(
        corpus_sdf, ds, de).collect()}
    exp = executor.execute(idx, q, k=50, rm3_alpha=0.5,
                           date_start=ds, date_end=de).collect()
    assert exp and all(r.doc_id in in_range for r in exp)
