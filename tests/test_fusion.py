"""Gates for the round-4 retrieval additions: RRF hybrid fusion
(operators/fusion.py), true BM25F (search.search_bm25f), Lucene-style
score explain (search.explain_scores), and the significant-terms
aggregation (serp.significant_terms).

Strategy mirrors the repo's convention: hand-computed micro-cases pin the
formulas; identity cases pin degenerate parameters to already-gated
operators; the driver entries (rrf_hybrid_topk / bm25f_topk /
score_explain / sig_terms) hash the full-corpus values against DuckDB.
"""

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import fusion
from search_engine_spark.operators import search as S
from search_engine_spark.operators import serp


# ---------------------------------------------------------------------------
# RRF
# ---------------------------------------------------------------------------

def _run(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_rrf_hand_computed(spark):
    # run A ranks: d1=1, d2=2, d3=3 ; run B ranks: d2=1, d4=2
    a = _run(spark, [(1, 9.0), (2, 5.0), (3, 1.0)])
    b = _run(spark, [(2, 0.9), (4, 0.5)])
    out = {r.doc_id: r.rrf_score
           for r in fusion.rrf_fuse([a, b], k=10, rrf_k=60).collect()}
    assert out[1] == pytest.approx(1 / 61)
    assert out[2] == pytest.approx(1 / 62 + 1 / 61)
    assert out[3] == pytest.approx(1 / 63)
    assert out[4] == pytest.approx(1 / 62)
    # d2 appears in both runs and must rank first
    top = fusion.rrf_fuse([a, b], k=1, rrf_k=60).collect()[0]
    assert top.doc_id == 2


def test_rrf_rank_ties_break_by_id(spark):
    # equal scores: rank order must be doc_id asc, so d1 gets rank 1
    a = _run(spark, [(2, 5.0), (1, 5.0)])
    out = {r.doc_id: r.rrf_score
           for r in fusion.rrf_fuse([a], k=10, rrf_k=60).collect()}
    assert out[1] == pytest.approx(1 / 61)
    assert out[2] == pytest.approx(1 / 62)


def test_rrf_single_run_preserves_order(spark):
    a = _run(spark, [(7, 3.0), (5, 2.0), (9, 1.0)])
    got = [r.doc_id for r in fusion.rrf_fuse([a], k=3).collect()]
    assert got == [7, 5, 9]


def test_rrf_validation(spark):
    a = _run(spark, [(1, 1.0)])
    with pytest.raises(ValueError):
        fusion.rrf_fuse([], k=5)
    with pytest.raises(ValueError):
        fusion.rrf_fuse([a], k=0)
    with pytest.raises(ValueError):
        fusion.rrf_fuse([a], k=5, rrf_k=0)
    with pytest.raises(ValueError):
        fusion.search_hybrid(None, a, ["x"], [1.0], depth=0)


def test_search_hybrid_end_to_end(spark, built_index, corpus_sdf):
    # embeddings derived from doc ids: deterministic 4-dim vectors;
    # query = doc 1's vector, so doc 1 must lead the dense run
    emb = corpus_sdf.select(
        F.col("doc_id").alias("vec_id"),
        F.array(*[(F.col("doc_id") * (i + 1) % 17).cast("float") + 1.0
                  for i in range(4)]).alias("embedding"))
    qvec = [float((1 * (i + 1)) % 17 + 1.0) for i in range(4)]
    out = fusion.search_hybrid(built_index, emb, ["search"], qvec,
                               k=10, depth=50)
    rows = out.collect()
    assert 0 < len(rows) <= 10
    # fused scores bounded by n_runs / (rrf_k + 1)
    assert all(0 < r.rrf_score <= 2 / 61 + 1e-12 for r in rows)


# ---------------------------------------------------------------------------
# BM25F
# ---------------------------------------------------------------------------

def _mini_index(spark, docs: dict[int, str]):
    """Tiny index via engine.build_index over a simple-analyzer corpus."""
    from search_engine_spark import engine
    from search_engine_spark.functions.analyzer import AnalyzerConfig

    sdf = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string")
    return engine.build_index(sdf, AnalyzerConfig.simple(),
                              positional=False, cache=False)


def test_bm25f_hand_computed(spark):
    # body: d1 'a a b', d2 'b c' ; title field: d1 'c', d2 'a'
    body = _mini_index(spark, {1: "a a b", 2: "b c"})
    title = _mini_index(spark, {1: "c", 2: "a"})
    k1, wb, bb, wt, bt = 1.2, 1.0, 0.75, 2.0, 0.5
    out = {r.doc_id: r.score
           for r in S.search_bm25f([(body, wb, bb), (title, wt, bt)],
                                   ["a"], k=10, k1=k1).collect()}
    # body avgdl = 2.5 ; title avgdl = 1
    tfn1 = wb * 2 / ((1 - bb) + bb * 3 / 2.5)          # body tf=2, dl=3
    tfn2 = wt * 1 / ((1 - bt) + bt * 1 / 1.0)          # title tf=1, dl=1
    # document-level df('a') = |{d1, d2}| = 2 ; n = body n_docs = 2
    idf = math.log(1 + (2 - 2 + 0.5) / (2 + 0.5))
    assert out[1] == pytest.approx(idf * tfn1 / (k1 + tfn1), rel=1e-9)
    assert out[2] == pytest.approx(idf * tfn2 / (k1 + tfn2), rel=1e-9)


def test_bm25f_single_saturation_beats_double(spark):
    # the defining BM25F property: a term in BOTH fields saturates ONCE.
    # d1 has 'a' in both fields, d2 has 'a' twice in the body only, with
    # identical dl everywhere — under search_fielded (per-field
    # saturation) d1 would outscore d2; under BM25F both yield the same
    # pseudo-frequency and hence the same score.
    body = _mini_index(spark, {1: "a x", 2: "a a"})
    other = _mini_index(spark, {1: "a y", 2: "y y"})
    out = {r.doc_id: r.score
           for r in S.search_bm25f([(body, 1.0, 0.0), (other, 1.0, 0.0)],
                                   ["a"], k=10).collect()}
    # b=0: tfn(d1) = 1 + 1 = 2 ; tfn(d2) = 2 + 0 = 2
    assert out[1] == pytest.approx(out[2], rel=1e-12)


def test_bm25f_reduces_to_bm25_on_one_field(spark, built_index):
    """One field at w=1 must equal plain BM25 / (k1+1): the BM25F paper
    drops the rank-preserving (k1+1) numerator constant that standard
    BM25 keeps — idf·(tf/B)/(k1 + tf/B) == idf·tf·(k1+1)/(tf + k1·B)
    ÷ (k1+1) — so the reduction is an exact scale factor, doc for doc."""
    toks = ["search", "index"]
    f1 = {r.doc_id: r.score
          for r in S.search_bm25f([(built_index, 1.0, 0.75)], toks,
                                  k=None).collect()}
    plain = {r.doc_id: r.score
             for r in S.search_freetext_tokens(built_index, toks,
                                               k=None).collect()}
    assert set(f1) == set(plain)
    for d in f1:
        assert f1[d] == pytest.approx(plain[d] / 2.2, rel=1e-9)


def test_bm25f_validation(spark):
    with pytest.raises(ValueError):
        S.search_bm25f([], ["a"])


# ---------------------------------------------------------------------------
# explain
# ---------------------------------------------------------------------------

def test_explain_sums_to_retrieval_score(spark, built_index):
    toks = ["search", "index", "market"]
    top = S.search_freetext_tokens(built_index, toks, k=1).collect()[0]
    rows = S.explain_scores(built_index, toks, top.doc_id).collect()
    assert abs(sum(r.weight for r in rows) - top.score) < 1e-9
    assert all(r.tf >= 1 and r.df >= 1 for r in rows)
    terms = [r.term for r in rows]
    assert terms == sorted(terms)


def test_explain_folds_query_tf(spark, built_index):
    """a repeated query token doubles that term's explained weight."""
    top = S.search_freetext_tokens(built_index, ["search"], k=1).collect()[0]
    w1 = S.explain_scores(built_index, ["search"], top.doc_id).collect()
    w2 = S.explain_scores(built_index, ["search", "search"],
                          top.doc_id).collect()
    assert w2[0].weight == pytest.approx(2 * w1[0].weight, rel=1e-12)


def test_explain_empty_and_miss(spark, built_index):
    assert S.explain_scores(built_index, [], 1).count() == 0
    # doc without the term → no rows (not zero-weight rows)
    assert S.explain_scores(built_index, ["zzzznotaterm"], 1).count() == 0


# ---------------------------------------------------------------------------
# significant terms
# ---------------------------------------------------------------------------

def test_significant_terms_hand_computed(spark):
    idx = _mini_index(spark, {1: "a b", 2: "a b", 3: "a c", 4: "d e"})
    hits = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = {r.term: r for r in serp.significant_terms(
        idx.postings, idx.term_stats, idx.stats["n_docs"], hits,
        k=10, min_fg_df=1).collect()}
    # fg set = {1,2}: a fg%=1 bg%=3/4 ; b fg%=1 bg%=2/4
    assert out["b"].jlh == pytest.approx((1 - 0.5) * (1 / 0.5), rel=1e-12)
    assert out["a"].jlh == pytest.approx((1 - 0.75) * (1 / 0.75), rel=1e-12)
    # 'c','d','e' are not over-represented (fg% <= bg% or fg_df=0)
    assert "c" not in out and "d" not in out and "e" not in out
    # b (jlh 1.0) ranks above a (jlh 1/3)
    assert list(out)[0] == "b"


def test_significant_terms_dedups_hits(spark):
    idx = _mini_index(spark, {1: "a", 2: "b"})
    dup_hits = spark.createDataFrame([(1,), (1,)], "doc_id long")
    out = serp.significant_terms(idx.postings, idx.term_stats,
                                 idx.stats["n_docs"], dup_hits, k=10)
    row = {r.term: r for r in out.collect()}["a"]
    assert row.fg_df == 1 and row.jlh == pytest.approx(0.5 * 2.0)


def test_significant_terms_validation(spark):
    idx = _mini_index(spark, {1: "a"})
    hits = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        serp.significant_terms(idx.postings, idx.term_stats, 1, hits,
                               min_fg_df=0)


# ---------------------------------------------------------------------------
# recency decay + date histogram
# ---------------------------------------------------------------------------

def test_blend_recency_hand_computed(spark):
    from datetime import date

    scores = _run(spark, [(1, 10.0), (2, 10.0), (3, 10.0)])
    dates = spark.createDataFrame(
        [(1, date(2022, 4, 1)),    # age 0  → factor 1.0
         (2, date(2022, 3, 2)),    # age 30 → factor 0.1 + 0.9/2
         (3, date(2022, 5, 1))],   # future → clamped to age 0
        "doc_id long, warc_date date")
    out = {r.doc_id: r.score
           for r in S.blend_recency(scores, dates, date(2022, 4, 1),
                                    half_life_days=30.0,
                                    floor=0.1).collect()}
    assert out[1] == pytest.approx(10.0)
    assert out[2] == pytest.approx(10.0 * (0.1 + 0.9 * 0.5))
    assert out[3] == pytest.approx(10.0)  # no future boost


def test_blend_recency_floor_one_is_identity(spark):
    from datetime import date

    scores = _run(spark, [(1, 7.0)])
    dates = spark.createDataFrame([(1, date(2000, 1, 1))],
                                  "doc_id long, warc_date date")
    out = S.blend_recency(scores, dates, date(2022, 4, 1),
                          floor=1.0).collect()
    assert out[0].score == pytest.approx(7.0)


def test_blend_recency_validation(spark):
    from datetime import date

    scores = _run(spark, [(1, 1.0)])
    with pytest.raises(ValueError):
        S.blend_recency(scores, scores, date(2022, 1, 1), floor=1.5)
    with pytest.raises(ValueError):
        S.blend_recency(scores, scores, date(2022, 1, 1),
                        half_life_days=0)


def test_date_histogram_hand_computed(spark):
    from datetime import date

    hits = spark.createDataFrame([(1,), (1,), (2,), (3,), (9,)],
                                 "doc_id long")  # dup + unknown id
    dates = spark.createDataFrame(
        [(1, date(2022, 1, 5)), (2, date(2022, 1, 20)),
         (3, date(2022, 3, 2)), (4, date(2022, 2, 1)),  # 4 not a hit
         (5, None)],
        "doc_id long, warc_date date")
    out = serp.date_histogram(hits, dates, granularity="month").collect()
    assert [(r.bucket, r.cnt) for r in out] == [
        (date(2022, 1, 1), 2), (date(2022, 3, 1), 1)]


def test_date_histogram_day_granularity_and_validation(spark):
    from datetime import date

    hits = spark.createDataFrame([(1,), (2,)], "doc_id long")
    dates = spark.createDataFrame(
        [(1, date(2022, 1, 5)), (2, date(2022, 1, 5))],
        "doc_id long, warc_date date")
    out = serp.date_histogram(hits, dates, granularity="day").collect()
    assert [(r.bucket, r.cnt) for r in out] == [(date(2022, 1, 5), 2)]
    with pytest.raises(ValueError):
        serp.date_histogram(hits, dates, granularity="fortnight")


def test_executor_recency_parity_and_refusal(spark, built_index, corpus_sdf):
    from datetime import date

    from search_engine_spark.operators import executor as EX

    dates = corpus_sdf.select(
        "doc_id", F.to_date("warc_ts").alias("warc_date"))
    as_of = date(2022, 6, 1)
    got = {(r.doc_id, round(r.score, 9)) for r in EX.execute(
        built_index, "market price", k=20, recency=dates,
        recency_as_of=as_of).collect()}
    manual = S.topk(S.blend_recency(
        S.search_freetext_tokens(built_index, ["market", "price"], k=None),
        dates, as_of), 20)
    want = {(r.doc_id, round(r.score, 9)) for r in manual.collect()}
    assert got == want
    with pytest.raises(ValueError, match="recency_as_of"):
        EX.execute(built_index, "market", recency=dates)
