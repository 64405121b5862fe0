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


# ---------------------------------------------------------------------------
# BPE merge training (operators/bpe.py)
# ---------------------------------------------------------------------------

def _ref_bpe(word_freqs, n_merges):
    """Independent tiny reference trainer (Sennrich-style, dict-of-lists)
    — deliberately different data layout from operators.bpe so the two
    can only agree by computing the same math."""
    vocab = {tuple(w): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = pairs.get(
                    (sym[i], sym[i + 1]), 0) + c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        if pairs[best] < 2:
            break
        merges.append(best)
        nv = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1]); i += 2
                else:
                    out.append(sym[i]); i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def test_learn_merges_matches_reference_trainer():
    from types import SimpleNamespace

    from search_engine_spark.operators import bpe

    freqs = {" low": 5, " lower": 2, " newest": 6, " widest": 3,
             " new": 4, "Hi": 1}
    rows = [SimpleNamespace(word=w, cnt=c) for w, c in sorted(freqs.items())]
    got = bpe.learn_merges(rows, n_merges=12)
    want = _ref_bpe(freqs, 12)
    assert got == want
    assert len(got) >= 8


def test_learn_bpe_end_to_end_deterministic(spark):
    from search_engine_spark.operators import bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1, drop1 = bpe.learn_bpe(docs, n_merges=40, max_words=5000)
    m2, drop2 = bpe.learn_bpe(docs, n_merges=40, max_words=5000)
    assert m1 == m2 and len(m1) == 40
    assert drop1 == drop2 == 0.0  # tiny corpus: nothing capped
    # every learned merge pair is non-trivial text
    assert all(a and b for a, b in m1)


def test_top_words_cap_reports_dropped_mass(spark):
    from search_engine_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc")], "doc_id long, text string")
    rows, dropped = bpe.top_words(bpe.word_counts(docs), max_words=2)
    # " aa"x2," bb"x2 kept ("aa" no-space variant is a 3rd word),
    # exact fractions depend on leading-space splitting — just pin bounds
    assert len(rows) == 2
    assert 0.0 < dropped < 1.0


def test_bpe_token_count_properties(spark):
    from search_engine_spark.operators import bpe
    from search_engine_spark.operators.textquality import bpe_pretoken_count

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(100).cache()
    merges, _ = bpe.learn_bpe(docs, n_merges=60, max_words=5000)
    n0 = {r.doc_id: r.n_bpe_tokens
          for r in bpe.bpe_token_count(docs, []).collect()}
    n60 = {r.doc_id: r.n_bpe_tokens
           for r in bpe.bpe_token_count(docs, merges).collect()}
    pre = {r.doc_id: r.n_pretokens for r in bpe_pretoken_count(docs).collect()}
    for d in n0:
        # zero merges = character count (per non-ws pretoken chars)
        assert n60[d] <= n0[d]          # merges only shrink the bill
        assert n60[d] >= pre[d]         # pretokens are the floor
    # the corpus the merges were learned on must compress substantially
    assert sum(n60.values()) < 0.6 * sum(n0.values())


def test_encode_word_greedy_rank_order():
    from search_engine_spark.operators import bpe

    # rank 0 merge ("a","b") beats the later ("b","c") wherever both apply
    ranks = {("a", "b"): 0, ("b", "c"): 1, ("ab", "c"): 2}
    assert bpe.encode_word("abc", ranks) == ["abc"]
    assert bpe.encode_word("bc", ranks) == ["bc"]
    assert bpe.encode_word("xyz", ranks) == ["x", "y", "z"]
