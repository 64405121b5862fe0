"""Tests for operators.corpusstats: exact + approximate n-gram heavy
hitters, per-doc tf-idf keywords, and their oracles."""

import duckdb
import pytest

from search_engine_spark.operators import corpusstats


def test_top_ngrams_hand_computed(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a"),        # shorter than n -> contributes nothing
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["gram"], r["cnt"]) for r in
           corpusstats.top_ngrams(df, n=2, k=3).collect()]
    # "the cat" x2; every other bigram x1 -> ties broken by gram asc
    assert got == [("the cat", 2), ("cat ran", 1), ("cat sat", 1)]


def test_top_ngrams_unigrams_and_case_fold(spark):
    df = spark.createDataFrame(
        [(1, "The the THE tie tie zz")], "doc_id long, text string")
    got = [(r["gram"], r["cnt"]) for r in
           corpusstats.top_ngrams(df, n=1, k=2).collect()]
    assert got == [("the", 3), ("tie", 2)]


def test_top_ngrams_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        corpusstats.top_ngrams(df, n=0)
    with pytest.raises(ValueError):
        corpusstats.top_ngrams(df, k=0)


def test_top_ngrams_oracle_parity(spark):
    rows = [
        (1, "alpha beta gamma alpha beta"),
        (2, "beta gamma\tdelta  alpha beta"),
        (3, "Gamma DELTA gamma delta gamma"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["gram"], r["cnt"]) for r in
           corpusstats.top_ngrams(df, n=3, k=5).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO documents VALUES (?, ?)", list(r))
    want = con.execute(
        corpusstats.top_ngrams_oracle_sql(n=3, k=5)).fetchall()
    assert got == want


def test_top_ngrams_approx_exact_regime(spark, corpus_sdf):
    """With capacity >> distinct grams per partition: err == 0 and the
    result equals the exact operator gram-for-gram."""
    exact = [(r["gram"], r["cnt"]) for r in
             corpusstats.top_ngrams(corpus_sdf, n=2, k=25).collect()]
    rows = corpusstats.top_ngrams_approx(
        corpus_sdf, n=2, k=25, capacity=200_000).collect()
    corpusstats.release_caches()
    assert all(r["err"] == 0 for r in rows)
    assert [(r["gram"], r["cnt"]) for r in rows] == exact


def test_top_ngrams_approx_heavy_hitters_survive_eviction(spark):
    """Planted Zipf head under a tight capacity: the heavy grams
    surface with cnt >= true - err (lossy-counting guarantee), and the
    emitted bound is honest (cnt <= true <= cnt + err)."""
    # 40 docs of pure noise-grams (all unique) + 30 docs repeating the
    # same two heavy bigrams
    noise = [(i, f"n{i}a n{i}b n{i}c n{i}d n{i}e n{i}f") for i in range(40)]
    heavy = [(100 + i, "hot pair hot pair hot pair") for i in range(30)]
    df = spark.createDataFrame(noise + heavy, "doc_id long, text string") \
        .repartition(4)
    true = {r["gram"]: r["cnt"] for r in
            corpusstats.top_ngrams(df, n=2, k=3).collect()}
    rows = corpusstats.top_ngrams_approx(df, n=2, k=3, capacity=8).collect()
    corpusstats.release_caches()
    got = {r["gram"]: (r["cnt"], r["err"]) for r in rows}
    for gram in ("hot pair", "pair hot"):
        assert gram in got, f"heavy hitter {gram} evicted"
        cnt, err = got[gram]
        assert cnt <= true[gram] <= cnt + err


def test_top_ngrams_approx_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        corpusstats.top_ngrams_approx(df, n=0)
    with pytest.raises(ValueError):
        corpusstats.top_ngrams_approx(df, k=0)
    with pytest.raises(ValueError):
        corpusstats.top_ngrams_approx(df, k=10, capacity=5)


def test_doc_keywords_hand_computed(spark):
    import math

    from search_engine_spark.functions.analyzer import AnalyzerConfig
    from search_engine_spark.operators import postings as P

    rows = [
        (1, "apple apple banana cherry"),
        (2, "banana cherry cherry"),
        (3, "cherry date"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    conf = AnalyzerConfig.simple()
    post = P.build_postings(df, conf, positional=False)
    stats = P.term_stats(post)
    out = corpusstats.doc_keywords(post, stats, n_docs=3, m=2).collect()
    got = {(r["doc_id"], r["term"]): r["tfidf"] for r in out}
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert got[(1, "apple")] == round(2 * math.log(3.0), 6)
    assert got[(1, "banana")] == round(math.log(1.5), 6)
    # doc 3: date tf=1 df=1 -> ln(3); cherry tf=1 df=3 -> ln(1)=0 kept
    assert got[(3, "date")] == round(math.log(3.0), 6)
    assert got[(3, "cherry")] == 0.0
    # m=2 cap per doc
    from collections import Counter

    per_doc = Counter(d for d, _ in got)
    assert set(per_doc.values()) == {2}


def test_doc_keywords_validation(spark):
    with pytest.raises(ValueError):
        corpusstats.doc_keywords(None, None, n_docs=0)
    with pytest.raises(ValueError):
        corpusstats.doc_keywords(None, None, n_docs=1, m=0)


def test_collocations_hand_computed(spark):
    """Crafted corpus: 'new york' appears 4x, tokens counted by hand —
    engine PMI equals math.log of the hand-derived ratio; below-
    min_count pairs are cut; rank is (pmi DESC, w1, w2)."""
    import math

    from search_engine_spark.operators.corpusstats import collocations

    #               tokens                 bigrams
    rows = [
        (1, "new york new york"),        # 4 toks, 3 bigrams
        (2, "new york is big"),          # 4 toks, 3 bigrams
        (3, "new york wins big"),        # 4 toks, 3 bigrams
        (4, "big big big"),              # 3 toks, 2 bigrams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(docs, k=10, min_count=2)
    rowsd = {(r.w1, r.w2): (r.n_ab, r.pmi) for r in out.collect()}
    # N = 15 tokens, B = 11 bigrams; new:4 york:4 big:5
    n_ab, n = rowsd[("new", "york")]
    assert n_ab == 4
    want = math.log((4 / 11) / ((4 / 15) * (4 / 15)))
    assert n == pytest.approx(round(want, 6), abs=1e-6)
    # 'york new' appears 1x (doc 1) — below min_count=2 → absent
    assert ("york", "new") not in rowsd
    # 'big big' appears 2x (doc 4) → present, weaker than new-york
    assert rowsd[("big", "big")][0] == 2
    assert rowsd[("big", "big")][1] < rowsd[("new", "york")][1]
    # validation + empty corpus
    with pytest.raises(ValueError, match="min_count"):
        collocations(docs, min_count=0)
    with pytest.raises(ValueError, match="k"):
        collocations(docs, k=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert collocations(empty).count() == 0
