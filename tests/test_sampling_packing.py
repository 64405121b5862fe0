"""Deterministic split/sample assignment and sequence packing."""

import numpy as np
import pandas as pd
import pytest

from search_engine_spark.operators import packing, sampling


@pytest.fixture(scope="module")
def ids_sdf(spark):
    pdf = pd.DataFrame({
        "doc_id": np.arange(2000, dtype="int64"),
        "lang": np.where(np.arange(2000) % 10 < 8, "en", "de"),
    })
    return spark.createDataFrame(pdf)


def test_assign_splits_partition_and_proportions(ids_sdf):
    out = sampling.assign_splits(ids_sdf).toPandas()
    # exactly one split per row, all rows covered
    assert len(out) == 2000 and out["split"].notna().all()
    counts = out["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    # md5 buckets are uniform: 2000 draws, expect within ~4 sigma
    assert abs(counts["train"] - 1600) < 80
    assert abs(counts["val"] - 200) < 60
    assert abs(counts["test"] - 200) < 60


def test_assign_splits_deterministic_and_shard_stable(ids_sdf):
    a = sampling.assign_splits(ids_sdf).select("doc_id", "split").toPandas()
    b = (sampling.assign_splits(ids_sdf.repartition(13))
         .select("doc_id", "split").toPandas())
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()
    # growth stability: the same doc keeps its split in a larger corpus
    half = sampling.assign_splits(ids_sdf.filter("doc_id < 1000")) \
        .select("doc_id", "split").toPandas()
    m2 = half.merge(a, on="doc_id", suffixes=("_half", "_full"))
    assert (m2["split_half"] == m2["split_full"]).all()


def test_assign_splits_salt_and_validation(ids_sdf):
    a = sampling.assign_splits(ids_sdf).select("doc_id", "split").toPandas()
    c = sampling.assign_splits(ids_sdf, salt="v2") \
        .select("doc_id", "split").toPandas()
    moved = (a.sort_values("doc_id")["split"].values
             != c.sort_values("doc_id")["split"].values).mean()
    assert moved > 0.1  # salt rotates a meaningful share of assignments
    with pytest.raises(ValueError):
        sampling.assign_splits(ids_sdf, weights={"a": -1.0, "b": 2.0})
    with pytest.raises(ValueError):
        sampling.assign_splits(ids_sdf, weights={})


def test_stratified_sample_nested_and_per_stratum(ids_sdf):
    s10 = sampling.stratified_sample(ids_sdf, 0.10).toPandas()
    s01 = sampling.stratified_sample(ids_sdf, 0.01).toPandas()
    assert set(s01["doc_id"]) <= set(s10["doc_id"])  # nested fractions
    assert abs(len(s10) - 200) < 60 and 0 < len(s01) < 60
    # per-stratum override: drop 'de' entirely, keep half of 'en'
    s = sampling.stratified_sample(ids_sdf, 0.5, by="lang",
                                   fractions={"de": 0.0}).toPandas()
    assert (s["lang"] == "en").all()
    assert abs(len(s) - 800) < 120
    with pytest.raises(ValueError):
        sampling.stratified_sample(ids_sdf, 1.5)


def _pack_oracle(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Single-threaded reference: global cumsum in doc_id order."""
    o = pdf.sort_values("doc_id").reset_index(drop=True)
    end = o["n_tokens"].cumsum()
    begin = end - o["n_tokens"]
    seq_first = begin // budget
    seq_last = np.where(o["n_tokens"] > 0, (end - 1) // budget, seq_first)
    return pd.DataFrame({
        "doc_id": o["doc_id"], "n_tokens": o["n_tokens"],
        "begin_tok": begin, "seq_first": seq_first, "seq_last": seq_last,
    }).astype("int64")


@pytest.fixture(scope="module")
def tok_pdf():
    rng = np.random.default_rng(42)
    n = 3000
    toks = rng.integers(0, 900, size=n)
    toks[rng.choice(n, 20, replace=False)] = 0          # empty docs
    toks[rng.choice(n, 10, replace=False)] = 5000        # > budget docs
    return pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                         "n_tokens": toks.astype("int64")})


def test_pack_sequences_matches_global_cumsum(spark, tok_pdf):
    sdf = spark.createDataFrame(tok_pdf).repartition(11)
    got = packing.pack_sequences(sdf, budget=2048).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _pack_oracle(tok_pdf, 2048)
    pd.testing.assert_frame_equal(got.astype("int64"), want)
    # layout invariants: contiguous non-overlapping spans, full coverage
    assert (got["begin_tok"].values[1:]
            == (got["begin_tok"] + got["n_tokens"]).values[:-1]).all()
    total = int(tok_pdf["n_tokens"].sum())
    assert int(got["seq_last"].max()) == (total - 1) // 2048


def test_pack_sequences_partitioning_invariance(spark, tok_pdf):
    a = packing.pack_sequences(spark.createDataFrame(tok_pdf), 512,
                               n_chunks=1).toPandas()
    b = packing.pack_sequences(
        spark.createDataFrame(tok_pdf).repartition(17), 512,
        n_chunks=32).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))


def test_pack_sequences_edges(spark, tok_pdf):
    out = packing.pack_sequences(spark.createDataFrame(tok_pdf), 2048) \
        .toPandas().set_index("doc_id")
    long_docs = tok_pdf[tok_pdf["n_tokens"] == 5000]["doc_id"]
    assert (out.loc[long_docs, "seq_last"]
            > out.loc[long_docs, "seq_first"]).all()  # straddles budget
    empty_docs = tok_pdf[tok_pdf["n_tokens"] == 0]["doc_id"]
    assert (out.loc[empty_docs, "seq_last"]
            == out.loc[empty_docs, "seq_first"]).all()
    with pytest.raises(ValueError):
        packing.pack_sequences(spark.createDataFrame(tok_pdf), 0)


def test_pack_sequences_no_global_window(spark, tok_pdf):
    """The scale property: with n_chunks > 1 the plan's window runs
    partitioned by chunk, never as one global ordered window."""
    sdf = spark.createDataFrame(tok_pdf)
    bounds = packing.chunk_bounds(sdf, "doc_id", 16)
    assert len(bounds) >= 8  # uniform ids -> most boundaries distinct
    plan = packing.pack_sequences(sdf, 2048, n_chunks=16) \
        ._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_chunk" in line  # partition spec present
