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
