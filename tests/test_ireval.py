"""IR evaluation metrics (operators/ireval.py) — hand-computed cases +
a pure-Python trec_eval replica over a real batch run."""

import math

import pytest

from search_engine_spark.operators import batchsearch as BS
from search_engine_spark.operators import ireval as IR


def _run(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rel int")


def test_hand_computed(spark):
    run = _run(spark, [(1, 10, 1), (1, 20, 2), (1, 30, 3), (1, 40, 4),
                       (1, 50, 5),
                       (2, 10, 1), (2, 20, 2),
                       (3, 10, 1)])
    qrels = _qrels(spark, [(1, 10, 2), (1, 30, 1), (1, 99, 1),
                           (2, 55, 0)])  # q2 judged but nothing relevant
    out = {r.query_id: r for r in IR.evaluate_run(run, qrels, k=5).collect()}
    q1 = out[1]
    assert q1.p_at_k == pytest.approx(2 / 5)
    assert q1.recall_at_k == pytest.approx(2 / 3)
    assert q1.rr == pytest.approx(1.0)
    assert q1.ap == pytest.approx((1.0 + 2 / 3) / 3)
    dcg = 3.0 / math.log2(2) + 1.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3) + 1.0 / math.log2(4)
    assert q1.ndcg == pytest.approx(dcg / idcg)
    # judged-but-nothing-relevant and fully-unjudged queries: all zeros
    for qid in (2, 3):
        r = out[qid]
        assert (r.p_at_k, r.recall_at_k, r.rr, r.ap, r.ndcg) == (
            0.0, 0.0, 0.0, 0.0, 0.0)
    assert set(out) == {1, 2, 3}  # qrels-only queries are not evaluated


def test_rank_cut(spark):
    """Only ranks ≤ k count; a relevant doc at rank k+1 is invisible to
    the top-k metrics but still counts in the recall/AP denominator."""
    run = _run(spark, [(1, 10, 1), (1, 20, 2), (1, 30, 3)])
    qrels = _qrels(spark, [(1, 30, 1), (1, 10, 1)])
    r = IR.evaluate_run(run, qrels, k=2).collect()[0]
    assert r.p_at_k == pytest.approx(1 / 2)
    assert r.recall_at_k == pytest.approx(1 / 2)
    assert r.ap == pytest.approx(1.0 / 2)  # hit at rank 1 only, /nrel=2
    # IDCG@2 uses the two judged docs, DCG@2 sees only the rank-1 hit
    idcg = 1.0 / math.log2(2) + 1.0 / math.log2(3)
    assert r.ndcg == pytest.approx((1.0 / math.log2(2)) / idcg)


def test_replica_on_real_run(spark, built_index):
    """Metrics over a real batch_topk run match a from-scratch replica."""
    qf = BS.queries_frame(built_index, [(1, "search index connect"),
                                        (2, "relational relation rationally")])
    run = BS.batch_topk(built_index, qf, k=10)
    # deterministic graded judgments: judge even docs, rel = doc_id % 3
    qrel_rows = []
    for qid in (1, 2):
        for r in run.filter(f"query_id = {qid}").collect():
            if r.doc_id % 2 == 0:
                qrel_rows.append((qid, r.doc_id, int(r.doc_id % 3)))
    qrels = _qrels(spark, qrel_rows)
    got = {r.query_id: r for r in
           IR.evaluate_run(run, qrels, k=10).collect()}

    run_rows = sorted(map(tuple, run.select(
        "query_id", "doc_id", "rank").collect()))
    jmap = {(q, d): rel for q, d, rel in qrel_rows}
    for qid in (1, 2):
        ranked = sorted([t for t in run_rows if t[0] == qid],
                        key=lambda t: t[2])[:10]
        rel = [jmap.get((qid, d), 0) for _, d, _ in ranked]
        nrel = sum(1 for (q, d), v in jmap.items() if q == qid and v > 0)
        hit = [1 if v > 0 else 0 for v in rel]
        p_at_k = sum(hit) / 10
        recall = (sum(hit) / nrel) if nrel else 0.0
        rr = next((1 / (i + 1) for i, h in enumerate(hit) if h), 0.0)
        ap = (sum(sum(hit[:i + 1]) / (i + 1)
                  for i, h in enumerate(hit) if h) / nrel) if nrel else 0.0
        dcg = sum((2 ** v - 1) / math.log2(i + 2) for i, v in enumerate(rel))
        ideal = sorted(((v, d) for (q, d), v in jmap.items() if q == qid),
                       key=lambda t: (-t[0], t[1]))[:10]
        idcg = sum((2 ** v - 1) / math.log2(i + 2)
                   for i, (v, _) in enumerate(ideal))
        ndcg = dcg / idcg if idcg else 0.0
        g = got[qid]
        assert g.p_at_k == pytest.approx(p_at_k)
        assert g.recall_at_k == pytest.approx(recall)
        assert g.rr == pytest.approx(rr)
        assert g.ap == pytest.approx(ap)
        assert g.ndcg == pytest.approx(ndcg)


def test_macro(spark):
    run = _run(spark, [(1, 10, 1), (2, 10, 1)])
    qrels = _qrels(spark, [(1, 10, 1)])
    m = IR.macro_metrics(IR.evaluate_run(run, qrels, k=1)).collect()[0]
    assert m.n_queries == 2
    assert m.mrr == pytest.approx(0.5)
    assert m.map == pytest.approx(0.5)
    assert m.mean_p_at_k == pytest.approx(0.5)


def test_validation(spark):
    run = _run(spark, [(1, 10, 1)])
    qrels = _qrels(spark, [(1, 10, 1)])
    with pytest.raises(ValueError, match="k must be"):
        IR.evaluate_run(run, qrels, k=0)
