"""Tests for operators.corpusstats.top_ngrams and its oracle."""

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
