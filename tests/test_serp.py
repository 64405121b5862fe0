"""Tests for operators.serp (host diversification, facet counts, prefix
autocomplete) against hand-built fixtures and a DuckDB mirror."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import serp


@pytest.fixture(scope="module")
def scored(spark):
    # 9 docs, 3 hosts; scores descending with deliberate cross-host
    # interleaving and one same-score tie (docs 4/5)
    rows = [
        (1, 9.0), (2, 8.0), (3, 7.5), (4, 7.0), (5, 7.0),
        (6, 6.0), (7, 5.0), (8, 4.0), (9, 3.0),
    ]
    return spark.createDataFrame(rows, "doc_id long, score double")


@pytest.fixture(scope="module")
def doc_hosts(spark):
    rows = [
        (1, "a.com"), (2, "a.com"), (3, "a.com"),
        (4, "b.com"), (5, "b.com"), (6, "b.com"),
        (7, "c.com"), (8, "c.com"),
        # doc 9 has no host row → dropped by the inner join
    ]
    return spark.createDataFrame(rows, "doc_id long, host string")


def test_diversify_caps_per_host(scored, doc_hosts):
    out = serp.diversify_by_host(scored, doc_hosts, per_host=2, k=10)
    rows = [(r.doc_id, r.host) for r in out.collect()]
    # a.com keeps 1,2 (drops 3); b.com keeps 4,5 (tie → lower id first,
    # drops 6); c.com keeps 7,8; doc 9 dropped (no host)
    assert rows == [(1, "a.com"), (2, "a.com"), (4, "b.com"),
                    (5, "b.com"), (7, "c.com"), (8, "c.com")]
    # global order is score desc, doc_id asc
    scores = [r.score for r in out.collect()]
    assert scores == sorted(scores, reverse=True)


def test_diversify_k_truncates(scored, doc_hosts):
    out = serp.diversify_by_host(scored, doc_hosts, per_host=1, k=2)
    assert [r.doc_id for r in out.collect()] == [1, 4]


def test_diversify_validates():
    with pytest.raises(ValueError):
        serp.diversify_by_host(None, None, per_host=0)
    with pytest.raises(ValueError):
        serp.diversify_by_host(None, None, per_host=1, k=0)


def test_diversify_matches_duckdb(scored, doc_hosts):
    s = scored.toPandas()
    h = doc_hosts.toPandas()
    con = duckdb.connect()
    con.register("s", s)
    con.register("h", h)
    want = con.execute("""
        WITH j AS (SELECT s.doc_id, s.score, h.host
                   FROM s JOIN h USING (doc_id)),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY host
                  ORDER BY score DESC, doc_id ASC) AS rn FROM j)
        SELECT doc_id, score, host FROM r WHERE rn <= 2
        ORDER BY score DESC, doc_id ASC LIMIT 5
    """).fetchall()
    got = [(r.doc_id, r.score, r.host) for r in
           serp.diversify_by_host(scored, doc_hosts, per_host=2, k=5).collect()]
    assert got == want


def test_facet_counts(spark):
    hits = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (4,), (5,)], "doc_id long"
    )  # doc 1 duplicated → must count once
    facets = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, None), (6, "fr")],
        "doc_id long, lang string",
    )  # doc 4 NULL lang → excluded; doc 5 unmapped → excluded;
    #    doc 6 not a hit → excluded
    out = serp.facet_counts(hits, facets, "lang").collect()
    assert [(r.lang, r.cnt) for r in out] == [("en", 2), ("de", 1)]


def test_autocomplete(spark, built_index):
    out = serp.autocomplete(built_index.term_stats, "s", k=5).collect()
    stats = {r.term: r.cf for r in built_index.term_stats.collect()}
    want = sorted(
        [(t, c) for t, c in stats.items() if t.startswith("s")],
        key=lambda tc: (-tc[1], tc[0]),
    )[:5]
    assert [(r.term, r.cf) for r in out] == want


def test_autocomplete_validates(built_index):
    with pytest.raises(ValueError):
        serp.autocomplete(built_index.term_stats, "")
    with pytest.raises(ValueError):
        serp.autocomplete(built_index.term_stats, "Spark")
    with pytest.raises(ValueError):
        serp.autocomplete(built_index.term_stats, "s", k=0)


def test_autocomplete_prefix_pushes_down(built_index):
    plan = serp.autocomplete(
        built_index.term_stats, "sp", k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_stats_facet_hand_computed(spark):
    from search_engine_spark.operators import serp

    hits = spark.createDataFrame([(1,), (2,), (2,), (3,), (9,)],
                                 "doc_id long")
    vals = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 99), (9, None)],
        "doc_id long, n long")
    r = serp.stats_facet(hits, vals, "n").collect()[0]
    # doc 2 dedupes, doc 9's NULL drops, doc 4 not in the match set
    assert (r.n, r.min_v, r.max_v, r.sum_v) == (3, 10.0, 30.0, 60.0)
    assert r.avg_v == 20.0
    assert r.var_pop == pytest.approx((100 + 400 + 900) / 3 - 400, abs=1e-6)
    # empty match set -> one row, n=0, NULL stats (the widget renders)
    empty = serp.stats_facet(
        spark.createDataFrame([], "doc_id long"), vals, "n").collect()
    assert len(empty) == 1 and empty[0].n == 0 and empty[0].avg_v is None


def test_term_vectors_point_lookup(built_index):
    from pyspark.sql import functions as F

    from search_engine_spark.operators import serp

    tv = serp.term_vectors(built_index, [5, 7]).collect()
    assert {r.doc_id for r in tv} == {5, 7}
    # rows agree with the postings/term_stats tables
    post = {(r.doc_id, r.term): r.tf for r in built_index.postings
            .filter(F.col("doc_id").isin([5, 7])).collect()}
    dfs = {r.term: r.df for r in built_index.term_stats.collect()}
    assert len(tv) == len(post)
    for r in tv:
        assert post[(r.doc_id, r.term)] == r.tf
        assert dfs[r.term] == r.df
    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        serp.term_vectors(built_index, [])
