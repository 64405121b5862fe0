"""Query-time synonym expansion (plans/synonyms.py loader +
search.search_synonyms weighted-OR scoring + executor/serve wiring)."""

import pytest

from search_engine_spark import engine
from search_engine_spark.functions.analyzer import AnalyzerConfig
from search_engine_spark.operators import executor
from search_engine_spark.operators import search as S
from search_engine_spark.plans.synonyms import parse_synonyms

SIMPLE = AnalyzerConfig.simple()
FULL = AnalyzerConfig.full()


def test_parse_groups_and_rules():
    table = parse_synonyms([
        "# comment line",
        "cat, feline",
        "dog => canine, hound",
        "",
    ], SIMPLE)
    assert table["cat"] == ["feline"]
    assert table["feline"] == ["cat"]
    assert table["dog"] == ["canine", "hound"]
    assert "canine" not in table  # directed: RHS does not map back


def test_parse_analyzes_into_vocab_space():
    """The full analyzer stems both sides, so surface forms map
    stem-to-stem; stopword sides drop out of their rule."""
    table = parse_synonyms(["running => sprinting", "the, cat"], FULL)
    from search_engine_spark.functions.porter import stem

    assert table[stem("running")] == [stem("sprinting")]
    # 'the' is a stopword: analyzed away, so the group degenerates to
    # just 'cat' with no partners → no entry at all
    assert stem("cat") not in table


def test_parse_multiword_refused_and_self_dropped():
    with pytest.raises(ValueError, match="multi-word"):
        parse_synonyms(["big cat => lion"], SIMPLE)
    assert parse_synonyms(["cat, cat"], SIMPLE) == {}


@pytest.fixture(scope="module")
def syn_index(spark):
    rows = [
        (1, "cat cat dog"),
        (2, "feline dog"),
        (3, "hound bird"),
        (4, "cat hound"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    yield engine.build_index(docs, SIMPLE, positional=False, cache=False)


def test_weighted_or_semantics(syn_index):
    """'cat' expands to feline at weight 0.5: doc 2 (feline only) scores
    0.5× its feline-as-literal weight; literal matches keep weight 1."""
    plain_feline = {r.doc_id: r.score for r in S.search_freetext_tokens(
        syn_index, ["feline"], k=None).collect()}
    got = {r.doc_id: r.score for r in S.search_synonyms(
        syn_index, ["cat"], {"cat": ["feline"]}, k=None,
        weight=0.5).collect()}
    assert got[2] == pytest.approx(0.5 * plain_feline[2])
    plain_cat = {r.doc_id: r.score for r in S.search_freetext_tokens(
        syn_index, ["cat"], k=None).collect()}
    assert got[1] == pytest.approx(plain_cat[1])  # no feline in doc 1
    assert set(got) == set(plain_cat) | set(plain_feline)


def test_synonym_also_literal_sums(syn_index):
    """A synonym that is also a query term sums both contributions:
    query [cat, dog] with dog => cat at weight 0.5 gives cat boost 1.5."""
    got = {r.doc_id: r.score for r in S.search_synonyms(
        syn_index, ["cat", "dog"], {"dog": ["cat"]}, k=None,
        weight=0.5).collect()}
    base_cat = {r.doc_id: r.score for r in S.search_freetext_tokens(
        syn_index, ["cat"], k=None).collect()}
    base_dog = {r.doc_id: r.score for r in S.search_freetext_tokens(
        syn_index, ["dog"], k=None).collect()}
    for d in got:
        want = 1.5 * base_cat.get(d, 0.0) + base_dog.get(d, 0.0)
        assert got[d] == pytest.approx(want)


def test_no_table_entry_is_plain_identity(syn_index):
    plain = sorted(map(tuple, S.search_freetext_tokens(
        syn_index, ["cat", "dog"], k=None).collect()))
    syn = sorted(map(tuple, S.search_synonyms(
        syn_index, ["cat", "dog"], {"bird": ["hound"]}, k=None).collect()))
    assert plain == syn
    # OOV synonym matches nothing and changes nothing
    syn2 = sorted(map(tuple, S.search_synonyms(
        syn_index, ["cat", "dog"], {"cat": ["zzzz"]}, k=None).collect()))
    assert plain == syn2


def test_validation_and_executor(syn_index):
    with pytest.raises(ValueError, match="weight"):
        S.search_synonyms(syn_index, ["cat"], {}, weight=0.0)
    table = {"cat": ["feline"]}
    got = [(r.doc_id, round(r.score, 9)) for r in executor.execute(
        syn_index, "cat", k=10, synonyms=table,
        synonym_weight=0.5).collect()]
    want = [(r.doc_id, round(r.score, 9)) for r in S.search_synonyms(
        syn_index, ["cat"], table, k=10, weight=0.5).collect()]
    assert got == want and got
    for q, kwargs, msg in [
        ('"cat dog"', {}, "plain free-text"),
        ("cat AND dog", {}, "plain free-text"),
        ("cat*", {}, "plain free-text"),
        ("c?t", {}, "plain free-text"),
        ("cat", dict(rm3_alpha=0.5), "two query expansions"),
        ("cat", dict(fuzzy_max_dist=1), "two query expansions"),
        ("cat", dict(adaptive=True), "literal clause set"),
        ("cat", dict(min_should_match=1), "literal clause set"),
        ("cat", dict(model="vsm"), "not vsm"),
    ]:
        with pytest.raises(ValueError, match=msg):
            executor.execute(syn_index, q, k=10, synonyms=table, **kwargs)
