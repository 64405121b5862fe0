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


# ---------------------------------------------------------------------------
# PII scrubbing / repetition stats — behavior + DuckDB parity on planted
# text (the driver corpus carries no PII and no newlines, so the strong
# check lives here; the contract entries gate regex parity on real text)
# ---------------------------------------------------------------------------

def test_pii_scrub_and_duckdb_parity(spark):
    import duckdb

    from search_engine_spark.operators import textquality

    rows = [
        (1, "mail me at jane.doe+x@corp.example.com or bob@x.io today"),
        (2, "server 10.0.0.255 talks to 192.168.1.1 on port 80"),
        (3, "call 555-123-4567 or +14155552671 now"),
        (4, "mixed a@b.co near 1.2.3.4 and 555-000-1111"),
        (5, ""),
        (6, None),
        (7, "no pii here at all"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in textquality.pii_scrub(sdf).collect()}
    assert got[1]["text"] == "mail me at <EMAIL> or <EMAIL> today"
    assert got[1]["n_email"] == 2 and got[1]["n_ip"] == 0
    assert got[2]["text"] == "server <IP> talks to <IP> on port 80"
    assert got[3]["text"] == "call <PHONE> or <PHONE> now"
    assert got[4]["n_email"] == got[4]["n_ip"] == got[4]["n_phone"] == 1
    assert got[6]["text"] == "" and got[7]["text"] == "no pii here at all"

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join("(%d, %s)" % (i, "NULL" if s is None
                                          else "'" + s.replace("'", "''") + "'")
                            for i, s in rows)
                + ") v(doc_id, text)")
    cur, counts = "COALESCE(text, '')", []
    for name, pat, repl in textquality.PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all({cur}, '{pat}')) AS n_{name}")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    want = {r[0]: r for r in con.execute(
        f"SELECT doc_id, {cur} AS text, {', '.join(counts)} FROM t"
    ).fetchall()}
    for i in got:
        g = got[i]
        assert (g["text"], g["n_email"], g["n_ip"], g["n_phone"]) == \
            want[i][1:], f"doc {i}: engine/oracle diverge"


def test_repetition_stats(spark):
    from search_engine_spark.operators import textquality

    rows = [
        (1, "same line\nsame line\nsame line\nother"),   # 2/4 lines dup
        (2, "buy now buy now buy now buy now"),           # hot bigram
        (3, "all words here are fully distinct tokens"),
        (4, "one"),                                        # no bigrams
        (5, ""),
        (6, None),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in textquality.repetition_stats(sdf).collect()}
    assert got[1]["n_lines"] == 4
    assert got[1]["dup_line_ratio"] == pytest.approx(0.5)
    # "buy now" appears 4x of 7 bigrams
    assert got[2]["top_bigram_frac"] == pytest.approx(round(4 / 7, 6))
    assert got[3]["top_bigram_frac"] == pytest.approx(round(1 / 6, 6))
    for i in (4, 5, 6):
        assert got[i]["top_bigram_frac"] == 0.0
        assert got[i]["dup_line_ratio"] == 0.0


# ---------------------------------------------------------------------------
# Domain-mixture rebalancing
# ---------------------------------------------------------------------------

def test_rebalance_mixture(spark):
    import pandas as pd

    from search_engine_spark.operators import sampling as SA

    pdf = pd.DataFrame({
        "doc_id": np.arange(3000, dtype="int64"),
        "source": (["web"] * 2000 + ["code"] * 800 + ["books"] * 200),
    })
    sdf = spark.createDataFrame(pdf)
    # books is the binding domain: N = 200/0.1 = 2000
    out = SA.rebalance_mixture(sdf, {"web": 0.5, "code": 0.4, "books": 0.1},
                               by="source").toPandas()
    counts = out["source"].value_counts()
    # expected keeps: web 1000, code 800, books 200 (within hash jitter)
    assert abs(counts["web"] - 1000) < 80
    assert counts["code"] > 700 and counts["books"] > 180
    # binding domain keeps ~everything (cut = 10000 exactly -> all)
    assert counts["books"] == 200 and counts["code"] == 800
    # deterministic
    again = SA.rebalance_mixture(
        sdf.repartition(7), {"web": 0.5, "code": 0.4, "books": 0.1},
        by="source").toPandas()
    assert set(out["doc_id"]) == set(again["doc_id"])
    # non-target domains dropped
    out2 = SA.rebalance_mixture(sdf, {"web": 1.0}, by="source").toPandas()
    assert (out2["source"] == "web").all() and len(out2) == 2000
    with pytest.raises(ValueError, match="infeasible"):
        SA.rebalance_mixture(sdf, {"web": 0.5, "missing": 0.5}, by="source")
    with pytest.raises(ValueError):
        SA.rebalance_mixture(sdf, {})


def test_curate_repetition_stage_drops_boilerplate(spark):
    """curate() with repetition thresholds prunes a planted boilerplate
    doc while clean docs survive, and the funnel records the stage."""
    from search_engine_spark.operators import curation

    rows = [(1, "buy now " * 50), (2, "genuinely varied prose with many "
                                      "distinct interesting words here"),
            (3, "another reasonable document full of different tokens")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    cur, funnel = curation.curate(
        sdf, languages=None, max_top_bigram_frac=0.2)
    ids = {r["doc_id"] for r in cur.collect()}
    assert ids == {2, 3}
    assert "repetition" in [s["stage"] for s in funnel]
    curation.release_caches()


def test_sampling_operators_use_independent_buckets(spark):
    """Chaining rebalance_mixture → assign_splits must keep every split
    populated: the operators' purpose-prefixed salts decorrelate their
    bucket streams (a shared hash would leave val/test empty, since
    mixture survivors all sit in low buckets)."""
    import pandas as pd

    from search_engine_spark.operators import sampling as SA

    pdf = pd.DataFrame({
        "doc_id": np.arange(6000, dtype="int64"),
        "source": ["web"] * 4000 + ["code"] * 2000,
    })
    sdf = spark.createDataFrame(pdf)
    mixed = SA.rebalance_mixture(sdf, {"web": 0.5, "code": 0.5},
                                 by="source")
    out = SA.assign_splits(mixed).toPandas()
    per = out.groupby(["source", "split"]).size()
    for src in ("web", "code"):
        for sp in ("train", "val", "test"):
            assert per.get((src, sp), 0) > 0, f"{src}/{sp} empty"


def test_rebalance_binding_domain_keeps_everything(spark):
    """The domain that sets the budget (min count/weight) must keep ALL
    its rows even when floats put its cut at 9999.999…: weight 0.1 is
    inexact in binary, so an unclamped floor drops bucket-9999 docs."""
    import pandas as pd

    from search_engine_spark.operators import sampling as SA

    # weights 0.9/0.1: books binds (1000/0.1 = 10000 < 20000/0.9)
    pdf = pd.DataFrame({
        "doc_id": np.arange(21000, dtype="int64"),
        "source": ["web"] * 20000 + ["books"] * 1000,
    })
    out = SA.rebalance_mixture(spark.createDataFrame(pdf),
                               {"web": 0.9, "books": 0.1},
                               by="source").toPandas()
    assert (out["source"] == "books").sum() == 1000  # nothing dropped


def test_repetition_stats_lines_only_is_shuffle_free(spark, tok_pdf):
    from search_engine_spark.operators import textquality

    sdf = spark.createDataFrame([(1, "a\na\nb")], "doc_id long, text string")
    out = textquality.repetition_stats(sdf, include_bigrams=False)
    assert "top_bigram_frac" not in out.columns
    assert out.collect()[0]["dup_line_ratio"] == pytest.approx(
        round(1 - 2 / 3, 6))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure narrow projection


def test_pack_sequences_bounds_persisted_frames(spark, tok_pdf):
    """Repeated packing calls hold at most one persisted slim frame
    (registry drained on entry), and the input is persisted so upstream
    lineage executes once across the three internal consumers."""
    from search_engine_spark.operators import packing as PK

    sdf = spark.createDataFrame(tok_pdf)
    for _ in range(3):
        PK.pack_sequences(sdf, 1024).count()
    assert len(PK._PERSISTED) == 1
    PK.release_caches()
    assert len(PK._PERSISTED) == 0
