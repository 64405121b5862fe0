"""Randomized engine-vs-oracle parity: a seeded generator draws queries
of every kind (free text, phrase, mixed, boolean with parens/NOT,
proximity) from the corpus vocabulary plus OOV/stopword junk, and every
one must match the pinned oracle exactly — the property-based
complement to the fixed query-set tests."""

import numpy as np
import pytest

from search_engine_spark.operators import executor
from search_engine_spark.sources.corpus import _VOCAB
from tests import oracle

_WORDS = [w for w in _VOCAB if w.isalpha()][:60]
_JUNK = ["zzzqq", "the", "of", "xqjv"]


def _gen_queries(seed: int = 424, n: int = 36) -> list[str]:
    rng = np.random.default_rng(seed)
    pool = _WORDS + _JUNK

    def pick(k):
        return [pool[int(i)] for i in rng.integers(0, len(pool), k)]

    out = []
    for i in range(n):
        kind = i % 8
        if kind == 0:
            out.append(" ".join(pick(int(rng.integers(1, 5)))))
        elif kind == 1:
            out.append('"' + " ".join(pick(2)) + '"')
        elif kind == 2:
            out.append(pick(1)[0] + ' "' + " ".join(pick(2)) + '"')
        elif kind == 3:
            a, b = pick(2)
            op = ["AND", "OR", "AND NOT"][int(rng.integers(0, 3))]
            out.append(f"{a} {op} {b}")
        elif kind == 4:
            a, b, c = pick(3)
            out.append(f"{a} AND ({b} OR {c})")
        elif kind == 5:
            # multiple paren groups (the reference's own example shape)
            a, b, c, d, e = pick(5)
            op = ["AND", "OR"][int(rng.integers(0, 2))]
            out.append(f"{a} {op} ({b} OR {c}) AND ({d} OR {e})")
        elif kind == 6:
            # boolean with a phrase clause (+ sometimes an operator word
            # inside the quotes — must stay a literal phrase word)
            a, b, c = pick(3)
            inner = f"{b} AND {c}" if rng.integers(0, 2) else f"{b} {c}"
            out.append(f'{a} OR "{inner}"')
        else:
            a, b = pick(2)
            out.append(f"#{int(rng.integers(1, 21))}({a},{b})")
    return out


@pytest.mark.parametrize("q", _gen_queries())
def test_fuzz_query_parity(built_index, oracle_index, q):
    o_index, doc_sizes = oracle_index
    got = [(r.doc_id, r.score)
           for r in executor.execute(built_index, q, k=50).collect()]
    want = oracle.execute(o_index, doc_sizes, q, k=50)
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), q


_MODELS = ["bm25", "bm25-reference", "vsm", "lm-dirichlet", "lm-pyp"]


def _gen_model_cases(seed: int = 515, n: int = 15):
    """Random (query, model) pairs biased toward mixed free-text+phrase
    shapes — the fuzz gate for per-model phrase weighting (the LM phrase
    formula path most of all)."""
    rng = np.random.default_rng(seed)
    pool = _WORDS + _JUNK

    def pick(k):
        return [pool[int(i)] for i in rng.integers(0, len(pool), k)]

    cases = []
    for i in range(n):
        model = _MODELS[int(rng.integers(0, len(_MODELS)))]
        kind = i % 3
        if kind == 0:  # mixed free-text + phrase
            q = pick(1)[0] + ' "' + " ".join(pick(2)) + '"'
        elif kind == 1:  # pure phrase
            q = '"' + " ".join(pick(2)) + '"'
        else:  # multi-term free text
            q = " ".join(pick(int(rng.integers(2, 4))))
        cases.append((q, model))
    return cases


@pytest.mark.parametrize("q,model", _gen_model_cases())
def test_fuzz_model_phrase_parity(built_index, oracle_index, q, model):
    o_index, doc_sizes = oracle_index
    got = [(r.doc_id, r.score)
           for r in executor.execute(built_index, q, k=50,
                                     model=model).collect()]
    want = oracle.execute(o_index, doc_sizes, q, k=50, model=model)
    assert [d for d, _ in got] == [d for d, _ in want], (q, model)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), (q, model)


def _gen_freetext(seed: int = 626, n: int = 12) -> list[str]:
    rng = np.random.default_rng(seed)
    pool = _WORDS + _JUNK
    return [" ".join(pool[int(i)] for i in
                     rng.integers(0, len(pool), int(rng.integers(1, 5))))
            for _ in range(n)]


@pytest.mark.parametrize("q", _gen_freetext())
def test_fuzz_rm3_alpha1_identity(built_index, q):
    """Property form of the RM3 driver gate: for ANY free-text query
    (incl. OOV/stopword junk), alpha=1 must reproduce the plain BM25
    result EXACTLY — scores included, empty results included."""
    plain = [(r.doc_id, r.score)
             for r in executor.execute(built_index, q, k=50).collect()]
    rm3 = [(r.doc_id, r.score)
           for r in executor.execute(built_index, q, k=50,
                                     rm3_alpha=1.0).collect()]
    assert rm3 == plain, q


@pytest.mark.parametrize("q", _gen_freetext(seed=727, n=6))
def test_fuzz_rm3_expanded_is_wellformed(built_index, q):
    """alpha<1 on arbitrary queries: never crashes, returns a ranked
    frame with finite scores, and never returns FEWER hits than the
    plain query (expansion only widens the candidate set)."""
    import math as _m

    plain_n = executor.execute(built_index, q, k=50).count()
    rows = executor.execute(built_index, q, k=50, rm3_alpha=0.5).collect()
    assert len(rows) >= min(plain_n, 50), q
    assert all(_m.isfinite(r.score) for r in rows), q
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True), q
