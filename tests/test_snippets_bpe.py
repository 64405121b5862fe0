"""Tests for search.snippets (SERP windows) and
textquality.bpe_pretoken_count (regex pre-tokenizer)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import search as S
from search_engine_spark.operators.textquality import (
    bpe_pretoken_count, bpe_pretoken_oracle_sql)


def test_bpe_pretokens_hand_computed(spark):
    rows = [
        # " ?word" | " ?digits" | " ?punct-run" split:
        # "Hello" ",", " world" "!" " it" "'" "s" " 42" "." "5" "x" = 11
        (1, "Hello, world! it's 42.5x"),
        (2, ""),
        (3, None),
        (4, "   \t\n "),          # whitespace only -> 0
        (5, "a b"),               # "a", " b" -> 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_pretokens"]
           for r in bpe_pretoken_count(df).collect()}
    assert got == {1: 11, 2: 0, 3: 0, 4: 0, 5: 2}


def test_bpe_pretokens_oracle_parity(spark):
    rows = [(1, "Hello, world! it's 42.5x"), (2, "multi\nline\ttext 7"),
            (3, None), (4, "...!!!  mixed42text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["doc_id"], r["n_pretokens"])
                 for r in bpe_pretoken_count(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO documents VALUES (?, ?)", list(r))
    want = sorted(con.execute(bpe_pretoken_oracle_sql()).fetchall())
    assert got == want


def test_snippets_window_and_ellipses(spark):
    long_pre = "x" * 100
    long_post = "y" * 100
    rows = [
        (1, f"{long_pre} Market rally {long_post}"),   # middle hit
        (2, "market opens the day"),                    # start hit
        (3, "no term here at all"),                     # fallback: head
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hits = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, score double")
    got = {r["doc_id"]: r["snippet"]
           for r in S.snippets(hits, docs, ["market"], width=20).collect()}
    # doc 1: hit at position 102 (1-based), window start 82 -> leading
    # and trailing ellipses, 40 chars of core containing the term
    assert got[1].startswith("…") and got[1].endswith("…")
    assert "Market" in got[1] and len(got[1]) == 42
    # doc 2: hit at position 1 -> no leading ellipsis, short text -> no
    # trailing either
    assert got[2] == "market opens the day"
    # doc 3: no hit -> leading 40 chars (text is shorter -> whole text)
    assert got[3] == "no term here at all"


def test_snippets_earliest_term_wins(spark):
    docs = spark.createDataFrame(
        [(1, "alpha " + "z" * 50 + " beta")], "doc_id long, text string")
    hits = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    snip = S.snippets(hits, docs, ["beta", "alpha"], width=5).collect()[0]
    # alpha occurs first even though beta is listed first
    assert snip["snippet"].startswith("alpha")
    assert snip["snippet"].endswith("…")
