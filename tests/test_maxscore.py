"""MaxScore kernel: rank-identical to WAND / the relational BM25 path /
the oracle (scores equal to float-accumulation tolerance), with real
term-level decode savings — exactness despite pruning, the same
contract test_wand.py pins for the range-level kernel."""

import pytest

from search_engine_spark.operators import maxscore as MS
from search_engine_spark.operators import search as S
from search_engine_spark.operators import wand
from search_engine_spark.sources import catalog
from tests import oracle
from tests.test_wand import _fuzz_freetext


def _same_ranking(a, b, abs_tol=1e-9):
    """Same doc order, scores equal to float-accumulation tolerance —
    the two kernels add the SAME term contributions in different order
    (essential-first vs block order), so exact float equality is one
    ulp too strict."""
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert x == pytest.approx(y, abs=abs_tol)


@pytest.fixture(scope="module")
def seg_index(tmp_path_factory, spark, corpus_sdf):
    d = str(tmp_path_factory.mktemp("msidx") / "index")
    # small block span so queries cross many blocks and pruning kicks in
    catalog.build_durable_index(spark, corpus_sdf, d, shards=4, buckets=16,
                                block_span=16)
    return catalog.load_index(spark, d)


QUERIES = ["market", "market price growth", "germany economy china",
           "zzzqq", "connect bank report", "market market price"]


@pytest.mark.parametrize("q", QUERIES)
def test_maxscore_vs_oracle(seg_index, oracle_index, q):
    o_index, doc_sizes = oracle_index
    want = oracle.search_freetext(o_index, doc_sizes, q, k=20, model="bm25")
    got = MS.search_maxscore(seg_index, q, k=20)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


@pytest.mark.parametrize("q", _fuzz_freetext())
def test_maxscore_fuzz_three_way(seg_index, oracle_index, q):
    """MaxScore == WAND == oracle on fuzzed queries (incl. stopword-only
    and OOV shapes) at a k small enough that both kernels prune."""
    o_index, doc_sizes = oracle_index
    want = oracle.search_freetext(o_index, doc_sizes, q, k=15, model="bm25")
    wd = wand.search_wand(seg_index, q, k=15)
    ms = MS.search_maxscore(seg_index, q, k=15)
    assert [d for d, _ in ms] == [d for d, _ in want], q
    _same_ranking(ms, wd)
    for (_, gs), (_, ws) in zip(ms, want):
        assert gs == pytest.approx(ws, abs=1e-9), q


def test_maxscore_vs_relational(seg_index):
    q = "market price"
    rel = [(r.doc_id, r.score)
           for r in S.search_freetext(seg_index, q, k=50).collect()]
    ms = MS.search_maxscore(seg_index, q, k=50)
    assert [d for d, _ in ms] == [d for d, _ in rel]
    for (_, a), (_, b) in zip(ms, rel):
        assert a == pytest.approx(b, abs=1e-9)


def test_maxscore_actually_prunes(seg_index):
    """Small k on a multi-term query must decode strictly fewer blocks
    than it fetched — the whole point of the kernel — while remaining
    exact (the identity tests above). Exhaustive k decodes everything."""
    stats = {}
    MS.search_maxscore(seg_index, "market price growth", k=3, stats=stats)
    assert stats["n_blocks_total"] > 0
    assert stats["n_blocks_decoded"] < stats["n_blocks_total"]
    full = {}
    MS.search_maxscore(seg_index, "market price growth", k=1 << 30,
                       stats=full)
    assert full["n_blocks_decoded"] == full["n_blocks_total"]
    assert full["n_ranges_skipped"] == 0


def test_maxscore_shares_mini_index_cache_with_wand(seg_index):
    import time

    q = "market price growth"
    seg_index._mini.clear()
    wd = wand.search_wand(seg_index, q, k=20)
    t0 = time.perf_counter()
    ms = MS.search_maxscore(seg_index, q, k=20)
    warm_sec = time.perf_counter() - t0
    _same_ranking(ms, wd)
    # warm path = driver numpy only; a Spark job would be >100ms
    assert warm_sec < 0.1


def test_maxscore_masks_deletes_like_wand(seg_index, monkeypatch):
    top = MS.search_maxscore(seg_index, "market price", k=5)
    dead = {top[0][0]}
    monkeypatch.setattr(type(seg_index), "deleted_ids",
                        lambda self: frozenset(dead), raising=False)
    ms = MS.search_maxscore(seg_index, "market price", k=5)
    wd = wand.search_wand(seg_index, "market price", k=5)
    _same_ranking(ms, wd)
    assert top[0][0] not in {d for d, _ in ms}


def test_maxscore_refusals(seg_index, spark, corpus_sdf):
    with pytest.raises(ValueError, match="bag-of-words"):
        MS.search_maxscore(seg_index, '"market price"')
    with pytest.raises(ValueError, match="bag-of-words"):
        MS.search_maxscore(seg_index, "market AND price")
    assert MS.search_maxscore(seg_index, "market", k=0) == []
    assert MS.search_maxscore(seg_index, "the and of") == []
    from search_engine_spark import engine
    from search_engine_spark.functions.analyzer import AnalyzerConfig

    mem = engine.build_index(corpus_sdf, AnalyzerConfig.full())
    with pytest.raises(TypeError, match="SegmentIndex"):
        MS.search_maxscore(mem, "market")


def test_maxscore_capped_fetch_safe_approximation(seg_index):
    """A tight impact-ordered cap keeps MaxScore a safe approximation
    exactly like WAND: same results as WAND at the same cap (both read
    the same capped mini-index)."""
    ms = MS.search_maxscore(seg_index, "market price", k=10,
                            max_blocks_per_term=2)
    wd = wand.search_wand(seg_index, "market price", k=10,
                          max_blocks_per_term=2)
    _same_ranking(ms, wd)


@pytest.mark.parametrize("q", ["market price", "germany economy china"])
def test_maxscore_prior_matches_wand(spark, seg_index, q):
    from tests.test_wand import _toy_prior

    prior = _toy_prior(spark, 150)
    ms = MS.search_maxscore(seg_index, q, k=10, prior=prior, prior_lam=0.4)
    wd = wand.search_wand(seg_index, q, k=10, prior=prior, prior_lam=0.4)
    _same_ranking(ms, wd)
