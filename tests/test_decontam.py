"""Benchmark decontamination (operators/decontam.py) and the
deterministic training-order shuffle (sampling.shuffle_shards)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from search_engine_spark.operators import curation, decontam, sampling


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(1, len(texts) + 1,
                                          dtype="int64"),
                      "text": texts}))


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]


def test_planted_leak_is_dropped(spark):
    """A training doc embedding a full eval n-gram is removed; docs
    sharing only shorter overlaps survive."""
    bench = " ".join(WORDS[:13])  # the eval 13-gram
    train = [
        "intro words then " + bench + " trailing text here",  # leak
        " ".join(WORDS[:12]) + " different",                  # 12-token overlap only
        "totally unrelated content about spark engines",
        bench,                                                # verbatim eval doc
    ]
    docs = _mk_docs(spark, train)
    evals = _mk_docs(spark, [bench])
    out = decontam.decontaminate(docs, evals, n=13)
    assert {r.doc_id for r in out.collect()} == {2, 3}

    marked = decontam.decontaminate(docs, evals, n=13, mark=True)
    rows = {r.doc_id: r.contaminated for r in marked.collect()}
    assert rows == {1: True, 2: False, 3: False, 4: True}


def test_short_docs_never_flagged(spark):
    """Docs (and eval entries) shorter than n tokens yield no n-grams,
    so even a verbatim copy of a short eval text survives — the
    documented standard semantics."""
    docs = _mk_docs(spark, ["tiny eval text", "something else whole"])
    evals = _mk_docs(spark, ["tiny eval text"])
    out = decontam.decontaminate(docs, evals, n=13)
    assert out.count() == 2
    # at n=3 the verbatim copy IS flagged
    out3 = decontam.decontaminate(docs, evals, n=3)
    assert {r.doc_id for r in out3.collect()} == {2}


def test_tokenization_is_whitespace_and_case_robust(spark):
    """Mixed case / runs of whitespace normalize identically on both
    sides of the match (same contract as textquality tokens)."""
    bench = " ".join(WORDS[:5])
    docs = _mk_docs(spark, ["X  " + " \t ".join(w.upper() for w in WORDS[:5])])
    evals = _mk_docs(spark, [bench])
    assert decontam.decontaminate(docs, evals, n=5).count() == 0


def test_gram_hash_matches_md5_prefix(spark):
    """The join key is the first 16 md5 hex chars of the space-joined
    gram — pinned so the DuckDB oracle stays bit-compatible."""
    docs = _mk_docs(spark, ["a b c d"])
    got = {r.gram_hash for r in
           decontam.ngram_hashes(docs, 3).collect()}
    want = {hashlib.md5(g.encode()).hexdigest()[:16]
            for g in ("a b c", "b c d")}
    assert got == want


def test_curate_decontam_stage(spark):
    """curate(eval_docs=...) appends decontamination as the last funnel
    stage and drops the leaked doc."""
    bench = " ".join(WORDS[:6])
    docs = _mk_docs(spark, [
        "clean document with plenty of ordinary words inside",
        "prefix " + bench + " suffix",
        "another clean doc of simple words",
    ])
    evals = _mk_docs(spark, [bench])
    out, funnel = curation.curate(docs, languages=None, eval_docs=evals,
                                  decontam_n=6)
    assert {r.doc_id for r in out.collect()} == {1, 3}
    assert funnel[-1] == {"stage": "decontaminate", "rows": 2}
    curation.release_caches()


# ---------------------------------------------------------------------------
# shuffle_shards
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ids_sdf(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(1, 2001, dtype="int64")}))


def test_shuffle_shards_is_a_permutation(spark, ids_sdf):
    out = sampling.shuffle_shards(ids_sdf, 8).toPandas()
    assert len(out) == 2000
    assert set(out["shard"].unique()) == set(range(8))
    # pos is 1..count within every shard (dense, no gaps)
    for _, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))


def test_shuffle_shards_global_order_is_hash_order(spark, ids_sdf):
    """Reading shard 0 by pos, then shard 1, … must reproduce the one
    global md5-key order — the property that makes per-shard files a
    distributed global shuffle."""
    out = sampling.shuffle_shards(ids_sdf, 8).toPandas()
    by_shard = out.sort_values(["shard", "pos"])["doc_id"].tolist()
    glob = sorted(out["doc_id"],
                  key=lambda d: hashlib.md5(f"{d}order:".encode())
                  .hexdigest())
    assert by_shard == glob


def test_shuffle_shards_salt_reshuffles_deterministically(spark, ids_sdf):
    a1 = sampling.shuffle_shards(ids_sdf, 4, salt="epoch1").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    a2 = sampling.shuffle_shards(ids_sdf, 4, salt="epoch1").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = sampling.shuffle_shards(ids_sdf, 4, salt="epoch2").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a1.equals(a2)  # same epoch replays bit-identically
    assert not a1[["shard", "pos"]].equals(b[["shard", "pos"]])


def test_shuffle_shards_no_global_window(spark, ids_sdf):
    """The plan must window per shard, never via a single-partition
    global sort (the thing that dies at 100 TB)."""
    out = sampling.shuffle_shards(ids_sdf, 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert sampling.shuffle_shards(ids_sdf, 1, salt="x").count() == 2000


def test_shuffle_shards_rejects_bad_width(spark, ids_sdf):
    with pytest.raises(ValueError):
        sampling.shuffle_shards(ids_sdf, 0)
