"""Block-Max WAND kernel: bit-identical to the relational BM25 path and
the oracle (exactness despite pruning)."""

import pytest

from search_engine_spark.operators import search as S
from search_engine_spark.operators import wand
from search_engine_spark.sources import catalog
from tests import oracle


@pytest.fixture(scope="module")
def seg_index(tmp_path_factory, spark, corpus_sdf):
    d = str(tmp_path_factory.mktemp("wandidx") / "index")
    # small block span so queries cross many blocks and pruning kicks in
    catalog.build_durable_index(spark, corpus_sdf, d, shards=4, buckets=16,
                                block_span=16)
    return catalog.load_index(spark, d)


QUERIES = ["market", "market price growth", "germany economy china",
           "zzzqq", "connect bank report", "market market price"]


@pytest.mark.parametrize("q", QUERIES)
def test_wand_vs_oracle(seg_index, oracle_index, q):
    o_index, doc_sizes = oracle_index
    want = oracle.search_freetext(o_index, doc_sizes, q, k=20, model="bm25")
    got = wand.search_wand(seg_index, q, k=20)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_wand_vs_relational(seg_index):
    q = "market price"
    rel = [(r.doc_id, r.score)
           for r in S.search_freetext(seg_index, q, k=50).collect()]
    wd = wand.search_wand(seg_index, q, k=50)
    assert [d for d, _ in wd] == [d for d, _ in rel]
    for (_, a), (_, b) in zip(wd, rel):
        assert a == pytest.approx(b, abs=1e-9)


def test_wand_k_larger_than_hits(seg_index, oracle_index):
    o_index, doc_sizes = oracle_index
    got = wand.search_wand(seg_index, "germani", k=10_000)
    want = oracle.search_freetext(o_index, doc_sizes, "germani", k=10_000)
    assert [d for d, _ in got] == [d for d, _ in want]
