"""Tests for operators.graph (PageRank) and operators.urls
(canonicalization + URL dedup) and textquality.unigram_logprob."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import graph, urls
from search_engine_spark.operators.textquality import unigram_logprob

# ---------------------------------------------------------------- urls

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM:443/Path/To//page///?utm_source=x&b=2&a=1#f",
     "https://example.com/Path/To//page?a=1&b=2"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    ("https://sub.www.example.com/a?ref=tw&z=9&a=1",
     "https://sub.www.example.com/a?a=1&z=9"),   # only LEADING www.
    ("ftp://Files.Example.com:21/data/", "ftp://files.example.com:21/data"),
    ("example.com/no-scheme?utm_campaign=z&x=1", "example.com/no-scheme?x=1"),
    ("https://example.com", "https://example.com"),
    ("https://example.com/?", "https://example.com/"),
    ("http://EXAMPLE.com:8080/Keep/Case?B=2&a=1&fbclid=abc",
     "http://example.com:8080/Keep/Case?B=2&a=1"),  # non-default port kept
    ("https://www.example.com:443///", "https://example.com/"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], "url string")
    got = [r[0] for r in df.select(urls.canonical_url(F.col("url"))).collect()]
    assert got == [want for _, want in CASES]


def test_canonical_url_oracle_parity(spark):
    """The DuckDB expression from oracle_canonical_sql and the Spark
    column agree byte-for-byte on every rule case (the contract's
    foundation)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    for raw, _ in CASES:
        con.execute("INSERT INTO u VALUES (?)", [raw])
    expr = urls.oracle_canonical_sql("url")
    duck = [r[0] for r in con.execute(f"SELECT {expr} FROM u").fetchall()]
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], "url string")
    got = [r[0] for r in df.select(urls.canonical_url(F.col("url"))).collect()]
    assert got == duck


def test_url_dedup_min_id_representative(spark):
    rows = [
        (1, "http://a.com/x?utm_source=f"),
        (2, "HTTP://A.com/x"),          # same canonical as 1
        (3, "http://a.com/y"),
        (7, "http://www.a.com/x#frag"),  # same canonical as 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["url_canon"]: r["doc_id"]
           for r in urls.url_dedup(df).collect()}
    assert out == {"http://a.com/x": 1, "http://a.com/y": 3}


# --------------------------------------------------------------- graph

def _np_pagerank(edges, n_iter=5, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, t in set(edges):
        out.setdefault(s, []).append(t)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[idx[v]] for v in nodes if v not in out)
        nxt += d * dangling / n
        for s, ts in out.items():
            for t in ts:
                nxt[idx[t]] += d * r[idx[s]] / len(ts)
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_with_dangling(spark):
    # node 5 is dangling (no out-edges); (2,4) appears twice
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, n_iter=6).collect()}
    want = _np_pagerank(edges, n_iter=6)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    graph.release_caches()


def test_pagerank_duplicate_edges_count_once(spark):
    base = [(1, 2), (2, 1)]
    dup = base + [(1, 2)] * 5
    a = {r["node"]: r["rank"] for r in
         graph.pagerank(spark.createDataFrame(base, "src long, dst long"),
                        n_iter=3).collect()}
    b = {r["node"]: r["rank"] for r in
         graph.pagerank(spark.createDataFrame(dup, "src long, dst long"),
                        n_iter=3).collect()}
    assert a == b
    graph.release_caches()


def test_pagerank_empty_and_validation(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank(empty).count() == 0
    with pytest.raises(ValueError):
        graph.pagerank(empty, n_iter=-1)
    with pytest.raises(ValueError):
        graph.pagerank(empty, damping=1.5)
    graph.release_caches()


def test_pagerank_synth_oracle_parity(spark):
    """Engine pagerank over the synthetic contract graph == the unrolled
    DuckDB CTE oracle, rank-for-rank at 6 decimals (what the driver
    hashes)."""
    docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    e = graph.synth_edges(docs, 120)
    got = {r["node"]: round(r["rank"], 6)
           for r in graph.pagerank(e, n_iter=5).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT range AS doc_id FROM range(120)")
    want = dict(con.execute(graph.pagerank_oracle_sql(n_iter=5)).fetchall())
    assert got == want
    graph.release_caches()


# ------------------------------------------------- unigram log-prob LM

def test_unigram_logprob_hand_computed(spark):
    rows = [(1, "a a b"), (2, "b c"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
           for r in unigram_logprob(df).collect()}
    # corpus: a×2 b×2 c×1, total 5
    pa = pb = 2 / 5
    pc = 1 / 5
    import math

    d1 = -(2 * math.log2(pa) + math.log2(pb)) / 3
    d2 = -(math.log2(pb) + math.log2(pc)) / 2
    assert got[1] == (3, pytest.approx(round(d1, 6), abs=2e-6))
    assert got[2] == (2, pytest.approx(round(d2, 6), abs=2e-6))
    assert got[3] == (0, 0.0)
    assert got[4] == (0, 0.0)


def test_unigram_logprob_case_fold_and_whitespace(spark):
    # "The" and "the" are the same token; tabs/newlines split
    df = spark.createDataFrame([(1, "The\tthe\nTHE")], "doc_id long, text string")
    row = unigram_logprob(df).collect()[0]
    assert row["n_tokens"] == 3
    assert row["bits_per_token"] == 0.0  # p=1 -> 0 bits


# --------------------------------------------- curation stage wiring

def test_curate_url_dedup_and_lm_stages(spark):
    from search_engine_spark.operators import curation

    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        # 1 and 2 are URL-spellings of the same page -> 2 dropped first
        (1, "http://a.com/x", common + " one"),
        (2, "HTTP://A.com/x?utm_source=f", common + " two"),
        (3, "http://a.com/y", common + " three"),
        # rare-token soup: every token unique in the corpus -> high bits
        (4, "http://a.com/z", "qzx wvu tsr qpo nml kji hgf edc ba9 876"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out, funnel = curation.curate(
        df, languages=None, url_dedup=True, max_bits_per_token=4.5)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert ids == {1, 3}
    stages = [f["stage"] for f in funnel]
    assert stages == ["input", "url_dedup", "quality", "lm_quality",
                      "exact_dedup"]
    by = {f["stage"]: f["rows"] for f in funnel}
    assert by["input"] == 4 and by["url_dedup"] == 3
    assert by["lm_quality"] == 2 and by["exact_dedup"] == 2
    curation.release_caches()


def test_curate_url_dedup_requires_column(spark):
    from search_engine_spark.operators import curation

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(ValueError):
        curation.curate(df, url_dedup=True)


# ----------------------------------------------- static prior blending

def test_blend_doc_prior_formula(spark):
    import math

    from search_engine_spark.operators.search import blend_doc_prior

    scores = spark.createDataFrame(
        [(1, 2.0), (2, 2.0), (3, 1.0)], "doc_id long, score double")
    prior = spark.createDataFrame(
        [(1, 0.5), (2, 0.125)], "node long, rank double")
    got = {r["doc_id"]: r["score"]
           for r in blend_doc_prior(scores, prior, lam=0.3,
                                    default_prior=1e-12).collect()}
    assert got[1] == pytest.approx(2.0 + 0.3 * math.log(0.5))
    assert got[2] == pytest.approx(2.0 + 0.3 * math.log(0.125))
    # doc 3 absent from the graph -> floor prior (a penalty, not an error)
    assert got[3] == pytest.approx(1.0 + 0.3 * math.log(1e-12))
    # equal lexical scores are now ordered by link evidence
    assert got[1] > got[2]


def test_executor_prior_reorders_topk(spark):
    """execute(prior=...) must apply the mixture BEFORE the final top-k:
    with a huge lam, the prior ordering dominates within the matched set."""
    from search_engine_spark import engine
    from search_engine_spark.functions.analyzer import AnalyzerConfig
    from search_engine_spark.operators import executor as EX
    from search_engine_spark.operators import search as S

    docs = spark.createDataFrame(
        [(1, "common alpha"), (2, "common beta"), (3, "common gamma"),
         (4, "unrelated text")],
        "doc_id long, text string")
    idx = engine.build_index(docs, AnalyzerConfig.full(), cache=False)
    base = [r["doc_id"] for r in
            EX.execute(idx, "common", k=3).collect()]
    prior = spark.createDataFrame(
        [(1, 0.01), (2, 0.9), (3, 0.05)], "node long, rank double")
    boosted = [r["doc_id"] for r in
               EX.execute(idx, "common", k=3, prior=prior,
                          prior_lam=1000.0).collect()]
    assert set(base) == set(boosted) == {1, 2, 3}
    assert boosted == [2, 3, 1]  # prior order, lexical ties broken by it


# ---------------------------------------------- anchor field + fielded

def test_anchor_index_counts(spark):
    edges = [
        (1, 10, "Click Here"),
        (2, 10, "click  here"),   # double space -> still 2 tokens
        (2, 10, "click here"),    # duplicate edge text counts again
        (3, 11, "other page"),
        (4, 11, None),            # NULL anchor contributes nothing
    ]
    df = spark.createDataFrame(edges, "src long, dst long, anchor string")
    from search_engine_spark.operators import graph

    aidx = graph.anchor_index(df, cache=False)
    post = {(r["term"], r["doc_id"]): r["tf"]
            for r in aidx.postings.collect()}
    assert post[("click", 10)] == 3 and post[("here", 10)] == 3
    assert post[("other", 11)] == 1 and post[("page", 11)] == 1
    dl = {r["doc_id"]: r["dl"] for r in aidx.doc_stats.collect()}
    assert dl == {10: 6, 11: 2}
    ts = {r["term"]: (r["df"], r["cf"]) for r in aidx.term_stats.collect()}
    assert ts["click"] == (1, 3) and ts["other"] == (1, 1)
    assert aidx.stats["n_docs"] == 2 and aidx.stats["total_len"] == 8
    assert aidx.stats["avgdl"] == pytest.approx(4.0)


def test_search_fielded_is_weighted_sum(spark):
    from search_engine_spark import engine
    from search_engine_spark.functions.analyzer import AnalyzerConfig
    from search_engine_spark.operators import graph
    from search_engine_spark.operators import search as S

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha"), (3, "gamma delta")],
        "doc_id long, text string")
    idx = engine.build_index(docs, AnalyzerConfig.simple(), cache=False)
    edges = spark.createDataFrame(
        [(1, 3, "alpha anchor"), (2, 3, "alpha"), (3, 1, "anchor")],
        "src long, dst long, anchor string")
    aidx = graph.anchor_index(edges, cache=False)
    toks = ["alpha", "anchor"]
    body = {r["doc_id"]: r["score"] for r in
            S.search_freetext_tokens(idx, toks, k=None).collect()}
    anch = {r["doc_id"]: r["score"] for r in
            S.search_freetext_tokens(aidx, toks, k=None).collect()}
    got = {r["doc_id"]: r["score"] for r in
           S.search_fielded(idx, aidx, toks, k=100, w_anchor=0.5).collect()}
    want = {d: body.get(d, 0.0) + 0.5 * anch.get(d, 0.0)
            for d in set(body) | set(anch)}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    # doc 3 has no body match for 'anchor' but inbound anchors score it
    assert 3 in got and anch[3] > 0


# ------------------------------------------- connected components / CC

def test_connected_components_basic(spark):
    # two components {1,2,3,4} (path+extra edge) and {10,11}; self-loop
    # and duplicate edges are ignored/deduped
    edges = [(1, 2), (2, 3), (3, 4), (4, 2), (10, 11), (11, 10), (5, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"]
           for r in graph.connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    graph.release_caches()


def test_connected_components_transitive_chain(spark):
    # a chain needs diameter rounds — exactly the shape the max_iter
    # guard protects; 12 hops converges well within 50
    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"]
           for r in graph.connected_components(df).collect()}
    assert set(got.values()) == {0}
    graph.release_caches()


def test_connected_components_max_iter_guard(spark):
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        graph.connected_components(df, max_iter=2)
    graph.release_caches()


def test_dup_clusters_transitive_rep(spark):
    # A~B and B~C but never A~C: all three must collapse to min-id A
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["rep"] for r in graph.dup_clusters(pairs).collect()}
    assert got == {3: 3, 7: 3, 9: 3}
    graph.release_caches()


def test_connected_components_matches_recursive_oracle(spark):
    import duckdb as _dd

    docs = spark.range(0, 90).select(F.col("id").alias("doc_id"))
    a = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") % 40).alias("dst"))
    b = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * F.col("doc_id")) % 35).alias("dst"))
    got = {(r["node"], r["component"]) for r in
           graph.connected_components(a.unionByName(b)).collect()}
    con = _dd.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT range AS doc_id FROM range(90)")
    want = set(con.execute("""
        WITH RECURSIVE p AS (
            SELECT doc_id AS doc_a, doc_id % 40 AS doc_b
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id, (doc_id * doc_id) % 35
            FROM documents WHERE doc_id % 3 = 1
        ),
        e AS (
            SELECT doc_a AS a, doc_b AS b FROM p WHERE doc_a <> doc_b
            UNION SELECT doc_b, doc_a FROM p WHERE doc_a <> doc_b
        ),
        reach(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM e)
            UNION
            SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.node
        )
        SELECT node, MIN(lab) FROM reach GROUP BY node
    """).fetchall())
    assert got == want
    graph.release_caches()


def test_hits_matches_numpy(spark):
    """5-iteration HITS == the same mutual reinforcement run in numpy
    (L2 half-step normalization), on a small asymmetric graph with a
    pure hub (no in-links) and a pure authority (no out-links)."""
    import numpy as np

    edges = [(0, 2), (0, 3), (1, 2), (2, 3), (3, 2), (4, 2)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.authority)
           for r in graph.hits(edf, n_iter=5).collect()}

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(5):
        a = A.T @ h
        a = a / np.linalg.norm(a)
        h = A @ a
        h = h / np.linalg.norm(h)
    for n in nodes:
        assert got[n][0] == pytest.approx(h[idx[n]], abs=1e-9), n
        assert got[n][1] == pytest.approx(a[idx[n]], abs=1e-9), n
    # structural sanity: node 0 (two out-links) is the top hub; node 2
    # (four in-links) is the top authority; pure-hub node 0 has
    # authority 0; node 4 has hub > 0 but authority 0
    assert max(got, key=lambda n: got[n][0]) == 0
    assert max(got, key=lambda n: got[n][1]) == 2
    assert got[0][1] == 0.0 and got[4][1] == 0.0


def test_hits_guards_and_duplicate_edges(spark):
    import pytest as _pytest

    edf = spark.createDataFrame([(0, 1), (0, 1), (1, 0)],
                                "src long, dst long")
    out = {r.node: (r.hub, r.authority)
           for r in graph.hits(edf, n_iter=3).collect()}
    # duplicate edge counts once: perfectly symmetric 2-cycle
    assert out[0][0] == _pytest.approx(out[1][1], abs=1e-12)
    with _pytest.raises(ValueError):
        graph.hits(edf, n_iter=-1)
