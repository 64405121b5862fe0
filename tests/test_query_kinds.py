"""End-to-end parity for every query kind (FIXTURES.md §3 query set):
phrase, mixed, boolean (incl. parens / NOT), proximity — engine vs oracle."""

import pytest

from search_engine_spark.operators import executor
from search_engine_spark.operators import phrase as PH
from search_engine_spark.plans import planner
from tests import oracle


def _run(idx, q, **kw):
    return [(r.doc_id, r.score) for r in executor.execute(idx, q, **kw).collect()]


def _want(o, q, **kw):
    o_index, doc_sizes = o
    return oracle.execute(o_index, doc_sizes, q, **kw)


def _assert_same(got, want, ranked=True):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


PHRASE_QUERIES = ['"germany economy"', '"market price"', '"zzz qqq"',
                  '"hello world"']  # last: stopword in phrase → degenerates to single term


@pytest.mark.parametrize("q", PHRASE_QUERIES)
def test_phrase(built_index, oracle_index, q):
    _assert_same(_run(built_index, q), _want(oracle_index, q))


def test_phrase_occurrence_counts(built_index, oracle_index):
    o_index, _ = oracle_index
    terms = ["germani", "economi"]  # analyzed (stemmed) forms
    got = {r.doc_id: r.phrase_tf
           for r in PH.phrase_occurrences(built_index, terms).collect()}
    assert got == oracle.phrase_docs(o_index, terms)
    assert len(got) > 0  # planted phrase must exist


ALL_MODELS = ["bm25", "bm25-reference", "vsm", "lm-dirichlet", "lm-pyp"]


@pytest.mark.parametrize("model", ALL_MODELS)
def test_mixed_freetext_phrase(built_index, oracle_index, model):
    """Mixed free-text + phrase under EVERY model: the phrase frame must
    carry the model's own phrase weight (the reference web app hardcodes
    model=lm, so LM-weighted phrases are its default path)."""
    q = 'market "germany economy"'
    _assert_same(_run(built_index, q, model=model),
                 _want(oracle_index, q, model=model))


@pytest.mark.parametrize("model", ["lm-dirichlet", "lm-pyp"])
def test_phrase_only_lm_weight(built_index, oracle_index, model):
    """Pure-phrase query under the LM models: weight is
    ln((phrase_tf/µ)·(L_c/df)+1) with NO doc-length prior
    (language_model.py:53-63,259-270)."""
    q = '"germany economy"'
    got = _run(built_index, q, model=model)
    want = _want(oracle_index, q, model=model)
    assert got  # planted phrase must exist
    _assert_same(got, want)
    # LM phrase weight is doc-length-free: same phrase_tf ⇒ same score
    bm25 = dict(_run(built_index, q, model="bm25"))
    assert dict(got) != bm25  # and it differs from the BM25 weighting


BOOLEAN_QUERIES = [
    "hello AND germany",
    "hello OR germany",
    "hello AND NOT germany",
    "NOT hello",
    "world AND (germany OR china)",
    'market AND "hello world"',
    "market AND (price OR growth) AND (germany OR china)",  # two groups
]


@pytest.mark.parametrize("q", BOOLEAN_QUERIES)
def test_boolean(built_index, oracle_index, q):
    _assert_same(_run(built_index, q), _want(oracle_index, q))


def test_boolean_multiple_paren_groups_ground_truth(built_index, oracle_index):
    """The reference's own multi-group example shape
    (boolean_retrieval.py:63): verified against set algebra computed
    DIRECTLY from posting sets, independent of the shared planner."""
    o_index, _ = oracle_index

    def docs_of(term):
        return set(o_index[term][1]) if term in o_index else set()

    want = (docs_of("market")
            & (docs_of("price") | docs_of("growth"))
            & (docs_of("germani") | docs_of("china")))
    got = {d for d, _ in _run(
        built_index, "market AND (price OR growth) AND (germany OR china)",
        k=100_000)}
    assert want and got == want


def test_boolean_operator_word_inside_phrase_stays_literal(built_index):
    """Documented deviation: AND inside quotes is a phrase word, not an
    operator. The phrase [germani, and, economi] contains the OOV
    stopword 'and' (boolean phrase operands KEEP stopwords, and the
    index strips them), so the phrase matches nothing and the result is
    exactly the other clause's docs."""
    p = planner.classify('"germany AND economy" OR market')
    assert [c.is_phrase for c in p.clauses] == [True, False]
    assert p.clauses[0].terms == ["germani", "and", "economi"]
    got = {d for d, _ in _run(built_index, '"germany AND economy" OR market',
                              k=100_000)}
    want = {d for d, _ in _run(built_index, "market", k=100_000)}
    assert got == want


def test_boolean_phrase_keeps_stopwords(built_index, oracle_index):
    """Quirk 10: boolean phrase operands go through the per-word boolean
    cleaner — stopwords survive into the phrase term list ('hello' is a
    Glasgow stopword), go OOV against the stopword-stripped index, and
    the phrase matches nothing (the reference's mini-index miss)."""
    p = planner.classify('market AND "hello world"')
    assert p.clauses[1].terms == ["hello", "world"]
    _assert_same(_run(built_index, 'market AND "hello world"'),
                 _want(oracle_index, 'market AND "hello world"'))
    assert _run(built_index, 'market AND "hello world"',
                ) == []  # ranked rescue finds no docs in the empty set


PROX_QUERIES = ["#3(germany, economy)", "#1(germany, economy)",
                "#20(market, price)", "#5(hello, world)"]  # last: stopword → empty


@pytest.mark.parametrize("q", PROX_QUERIES)
def test_proximity(built_index, oracle_index, q):
    got = [d for d, _ in _run(built_index, q)]
    want = [d for d, _ in _want(oracle_index, q)]
    assert got == want


def test_proximity_classification():
    p = planner.classify("#3(germany, economy)")
    assert isinstance(p, planner.ProximityPlan)
    assert (p.k, p.t1, p.t2) == (3, "germani", "economi")  # analyzed forms


def test_boolean_classification():
    p = planner.classify("world AND (germany OR china)")
    assert isinstance(p, planner.BooleanPlan)
    assert p.operators == ["AND", "OR"]
    assert p.paren_groups == [(1, 2)]


def test_date_filter(built_index, oracle_index, corpus_pdf):
    from datetime import date
    start, end = date(2022, 1, 1), date(2022, 1, 31)
    got = _run(built_index, "germany market", date_start=start, date_end=end)
    allowed = set(
        corpus_pdf.loc[
            (corpus_pdf.warc_ts.dt.date >= start) & (corpus_pdf.warc_ts.dt.date <= end),
            "doc_id",
        ]
    )
    assert got and all(d in allowed for d, _ in got)
    # scores of surviving docs are unchanged by the filter
    full = dict(_want(oracle_index, "germany market", k=10**9))
    for d, s in got:
        assert s == pytest.approx(full[d], abs=1e-9)


def test_date_filter_partitioned_table_same_docs(spark, corpus_sdf, tmp_path):
    """write_documents_partitioned (days layout) + date_candidates returns
    the same docs as the unpartitioned to_date path; the plan-audit test
    asserts the partitioned variant actually prunes partitions."""
    from datetime import date

    from search_engine_spark.operators import executor as EX
    from search_engine_spark.sources import corpus as C

    part_dir = str(tmp_path / "by_date")
    C.write_documents_partitioned(corpus_sdf, part_dir)
    part = C.read_documents_partitioned(spark, part_dir)
    start, end = date(2022, 1, 5), date(2022, 2, 10)
    got = {r.doc_id for r in EX.date_candidates(part, start, end).collect()}
    want = {r.doc_id
            for r in EX.date_candidates(corpus_sdf, start, end).collect()}
    assert got == want and got


def test_no_double_stemming_through_executor(spark):
    """Porter is not idempotent ('provision'→'provis'→'provi'): the
    executor must analyze the raw query exactly once, or stemmed plan
    terms go out of vocabulary when re-analyzed. Regression for the
    token-level search path (none of the fixture-corpus words have
    non-idempotent stems, so the fuzz suite is blind to this)."""
    from search_engine_spark import engine
    from search_engine_spark.functions.analyzer import AnalyzerConfig
    from search_engine_spark.functions.porter import stem

    assert stem(stem("provision")) != stem("provision")  # premise
    docs = spark.createDataFrame(
        [(1, "provision of data provision"), (2, "unrelated words here"),
         (3, "data provision matters")],
        "doc_id long, text string")
    idx = engine.build_index(docs, AnalyzerConfig.full())
    hits = executor.execute(idx, "provision", k=10).collect()
    assert {r.doc_id for r in hits} == {1, 3}
    # boolean rescoring path re-uses analyzed clause terms too
    bhits = executor.execute(idx, "provision AND data", k=10).collect()
    assert {r.doc_id for r in bhits} == {1, 3}


def test_executor_all_models_including_vsm(built_index):
    """Regression: the unified free-text path uses unranked (k=None)
    inner frames; every model — vsm dispatches to a separate code path —
    must survive that and return ranked results."""
    for model in ("bm25", "bm25-reference", "vsm", "lm-dirichlet", "lm-pyp"):
        hits = executor.execute(built_index, "market price", k=5,
                                model=model).collect()
        assert hits, model
        assert len(hits) <= 5


@pytest.mark.parametrize("model", ["bm25", "vsm"])
def test_adaptive_combines_with_date_filter(spark, corpus_sdf, model):
    """adaptive=True with a date range applies BOTH restrictions in every
    model path (it was silently dropped when explicit candidates were
    present, and the vsm dispatch dropped it separately)."""
    from datetime import date

    from search_engine_spark import engine

    idx = engine.build_index(corpus_sdf, documents=corpus_sdf)
    kw = dict(model=model, k=10_000)
    both = {d for d, _ in _run(
        idx, "market price", adaptive=True,
        date_start=date(2022, 1, 1), date_end=date(2022, 1, 10), **kw)}
    date_only = {d for d, _ in _run(
        idx, "market price",
        date_start=date(2022, 1, 1), date_end=date(2022, 1, 10), **kw)}
    adaptive_only = {d for d, _ in _run(
        idx, "market price", adaptive=True, **kw)}
    assert both == (date_only & adaptive_only)


def test_public_api_loop_bounds_persisted_frames(spark, built_index):
    """Hammering search_phrase directly (no executor, no release_caches)
    must keep the persisted-DataFrame count bounded: register_query_cache
    evicts FIFO past MAX_QUERY_CACHES. Eviction is cache-only — results
    stay correct (recompute from lineage)."""
    from search_engine_spark.operators import phrase as PH

    built_index.release_caches()
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    first = None
    for i in range(40):
        got = sorted(
            (r.doc_id, r.phrase_tf)
            for r in PH.phrase_occurrences(built_index,
                                           ["germani", "economi"]).collect())
        if first is None:
            first = got
        assert got == first  # eviction never changes results
        # separate cache registrations (phrase_occurrences itself doesn't
        # register; search_phrase does)
        PH.search_phrase(built_index, ["germani", "economi"], k=5).collect()
    n = jsc.getPersistentRDDs().size()
    assert len(built_index._query_caches) <= built_index.MAX_QUERY_CACHES
    assert n - base <= built_index.MAX_QUERY_CACHES + 2
    built_index.release_caches()


# ---------------------------------------------------------------------------
# sloppy phrases ('"..."~N' — ordered-window semantics, phrase.py)
# ---------------------------------------------------------------------------

def test_sloppy_slop0_is_exact_phrase(built_index):
    """sloppy_occurrences(slop=0) == phrase_occurrences on the full
    corpus (strictly increasing positions with span <= m-1 force
    consecutiveness) — the identity that pins the chain matcher."""
    terms = ["market", "price"]
    exact = {(r.doc_id, r.phrase_tf) for r in
             PH.phrase_occurrences(built_index, terms).collect()}
    slop0 = {(r.doc_id, r.phrase_tf) for r in
             PH.sloppy_occurrences(built_index, terms, 0).collect()}
    assert exact == slop0 and exact


def test_sloppy_semantics_hand_crafted(spark):
    from search_engine_spark import engine
    from search_engine_spark.functions.analyzer import AnalyzerConfig

    rows = [
        (1, "big data rocks"),        # exact
        (2, "big old data"),          # 1 extra gap
        (3, "big a b c data"),        # 3 extra gaps > slop 2
        (4, "data big"),              # reversed: ordered never matches
        (5, "big big data"),          # two valid starts
        (6, "big fresh new data"),    # exactly slop 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = engine.build_index(docs, AnalyzerConfig.simple(),
                             positional=True, cache=False)
    got = {r.doc_id: r.phrase_tf for r in
           PH.sloppy_occurrences(idx, ["big", "data"], 2).collect()}
    assert got == {1: 1, 2: 1, 5: 2, 6: 1}
    # 3-term greedy chain: each next term takes its smallest later pos
    rows3 = [(1, "a x b y c"), (2, "c b a"), (3, "a b c")]
    i3 = engine.build_index(
        spark.createDataFrame(rows3, "doc_id long, text string"),
        AnalyzerConfig.simple(), positional=True, cache=False)
    got3 = {r.doc_id: r.phrase_tf for r in
            PH.sloppy_occurrences(i3, ["a", "b", "c"], 2).collect()}
    assert got3 == {1: 1, 3: 1}
    with pytest.raises(ValueError, match="slop"):
        PH.sloppy_occurrences(i3, ["a", "b"], -1)
    with pytest.raises(ValueError, match="empty"):
        PH.sloppy_occurrences(i3, [], 1)


def test_executor_sloppy_phrase_routing(built_index):
    """'"market price"~3' scores through search_phrase(slop=3) — more
    (or equal) matching docs than the exact phrase, the exact docs stay
    matched, and the unsloped syntax is byte-identical to before."""
    from search_engine_spark.operators import executor

    exact = {r.doc_id: round(r.score, 9) for r in
             executor.execute(built_index, '"market price"', k=None).collect()}
    sloppy = {r.doc_id: round(r.score, 9) for r in
              executor.execute(built_index, '"market price"~3',
                               k=None).collect()}
    assert set(exact) <= set(sloppy) and len(sloppy) > len(exact)
    manual = {r.doc_id: round(r.score, 9) for r in
              PH.search_phrase(built_index, ["market", "price"], k=None,
                               slop=3).collect()}
    assert sloppy == manual
    # slop syntax on a mixed query still unions with the term frame
    mixed = executor.execute(built_index, 'growth "market price"~3', k=20)
    assert mixed.count() > 0
