"""Hostile/degenerate query inputs must not crash the executor surface —
empty strings, quote junk, malformed operators, huge k, unicode."""

import pytest

from search_engine_spark import engine
from search_engine_spark.operators import executor


EDGE_QUERIES = [
    "",
    "   ",
    '"',
    '""',
    '" "',
    "AND",
    "AND AND OR",
    "NOT",
    "(",
    "()",
    "market AND",
    "#5(market)",          # malformed proximity: one term
    "#x(market, price)",   # malformed proximity: bad k
    "#5(market, price",    # unclosed
    "🙂 emoji query",
    "ümläut wörds",
    "a" * 5000,            # absurd single token
    '"unterminated phrase',
    "market  ​  price",     # zero-width space
]


@pytest.mark.parametrize("q", EDGE_QUERIES)
def test_executor_never_crashes(built_index, q):
    out = executor.execute(built_index, q, k=10)
    rows = out.collect()  # must evaluate without raising
    assert len(rows) <= 10


def test_huge_k(built_index):
    rows = engine.search(built_index, "market", k=10**9).collect()
    assert 0 < len(rows) <= built_index.stats["n_docs"]


def test_zero_k(built_index):
    assert engine.search(built_index, "market", k=0).collect() == []
