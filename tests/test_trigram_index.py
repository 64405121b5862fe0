"""Character-trigram vocabulary index (catalog.build_term_ngram_index +
SegmentIndex.trigram_candidates + the wildcard_candidates integration)
— the pg_trgm / Lucene-ngram technique that bounds leading-wildcard and
infix pattern expansion instead of scanning the whole vocabulary.

Gates: trigram extraction ground truth; candidate-superset property;
expansion identity with-vs-without the artifact (it only changes the
plan); executor integration on a leading-wildcard query; fallback when
a pattern yields no usable trigram.
"""

from __future__ import annotations

import pytest

from search_engine_spark.operators import executor as X
from search_engine_spark.operators import search as S
from search_engine_spark.sources import catalog
from search_engine_spark.sources.catalog import _pattern_trigrams


def test_pattern_trigram_extraction():
    assert _pattern_trigrams("*ing") == ["ing", "ng$"]
    assert _pattern_trigrams("*data") == ["ata", "dat", "ta$"]
    assert _pattern_trigrams("te?t*") == ["^te"]
    assert _pattern_trigrams("*arke*") == ["ark", "rke"]
    assert _pattern_trigrams("market") == sorted(
        {"^ma", "mar", "ark", "rke", "ket", "et$"})
    # literal runs too short for any trigram -> no index help
    assert _pattern_trigrams("a*") == []
    assert _pattern_trigrams("*a?b*") == []


@pytest.fixture(scope="module")
def trigram_indexes(tmp_path_factory, spark, corpus_sdf):
    d = str(tmp_path_factory.mktemp("trgmidx") / "idx")
    catalog.build_durable_index(spark, corpus_sdf, d, buckets=16,
                                block_span=64)
    before = catalog.load_index(spark, d)  # no artifact yet
    assert before.trigram_candidates("*ing") is None
    catalog.build_term_ngram_index(spark, d)
    after = catalog.load_index(spark, d)
    return before, after


def test_candidates_are_a_superset_of_matches(trigram_indexes):
    _, after = trigram_indexes
    exact = {r.term for r in
             after.term_stats.filter("term LIKE '%et'").collect()}
    assert exact, "fixture vocabulary should contain *et terms"
    cand = {r.term for r in after.trigram_candidates("*et").collect()}
    assert cand >= exact


def test_candidate_df_matches_term_stats(trigram_indexes):
    _, after = trigram_indexes
    want = {r.term: r.df for r in after.term_stats.collect()}
    for r in after.trigram_candidates("*et").collect():
        assert want[r.term] == r.df


def test_wildcard_expansion_identity(trigram_indexes):
    before, after = trigram_indexes
    for pattern in ["*et", "*arke*", "*th"]:
        want = sorted((r.qt, r.term) for r in
                      S.wildcard_candidates(before, [pattern]).collect())
        got = sorted((r.qt, r.term) for r in
                     S.wildcard_candidates(after, [pattern]).collect())
        assert got == want, pattern


def test_anchored_patterns_keep_the_pruned_scan(trigram_indexes):
    # anchored patterns already prune via StringStartsWith — the
    # trigram path must not engage (identity holds trivially)
    before, after = trigram_indexes
    want = sorted((r.qt, r.term) for r in
                  S.wildcard_candidates(before, ["mark*"]).collect())
    got = sorted((r.qt, r.term) for r in
                 S.wildcard_candidates(after, ["mark*"]).collect())
    assert got == want


def test_executor_leading_wildcard_identity(trigram_indexes):
    before, after = trigram_indexes
    want = [(r.doc_id, round(r.score, 9)) for r in
            X.execute(before, "*ket", k=20).collect()]
    got = [(r.doc_id, round(r.score, 9)) for r in
           X.execute(after, "*ket", k=20).collect()]
    assert got == want


def test_short_run_pattern_falls_back(trigram_indexes):
    _, after = trigram_indexes
    assert after.trigram_candidates("a*") is None
    # and the full path still answers through the vocabulary scan
    S.wildcard_candidates(after, ["*a?b*"]).collect()


def test_build_refuses_impact_store(tmp_path, spark, trigram_indexes):
    before, _ = trigram_indexes
    qdir = catalog.quantize_index(spark, before.index_dir,
                                  str(tmp_path / "imp"))
    with pytest.raises(ValueError, match="SOURCE"):
        catalog.build_term_ngram_index(spark, qdir)


# ---------------------------------------------------------------------------
# fuzzy count filter (Gravano et al. 2001): the trigram index bounds
# the vocabulary side of the fuzzy join; results must be identical
# ---------------------------------------------------------------------------

def test_count_filter_bound_holds_randomized():
    """Numerical validation of the pruning theory: any string within
    levenshtein d of q shares >= n_distinct_trigrams(q) − 3d of q's
    padded trigrams (edits are sub/ins/del — Spark's levenshtein)."""
    import random

    rng = random.Random(42)
    alpha = "abcdefgh"

    def grams(s):
        p = "^" + s + "$"
        return {p[i:i + 3] for i in range(len(s))}

    for _ in range(300):
        q = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 10)))
        t = list(q)
        d = rng.randint(1, 2)
        for _ in range(d):
            op = rng.choice(["sub", "ins", "del"])
            pos = rng.randrange(max(len(t), 1))
            if op == "sub" and t:
                t[pos] = rng.choice(alpha)
            elif op == "ins":
                t.insert(pos, rng.choice(alpha))
            elif t:
                del t[pos]
        t = "".join(t)
        shared = len(grams(q) & grams(t))
        assert shared >= len(grams(q)) - 3 * d, (q, t, d, shared)


def test_fuzzy_expansion_identity_with_trigram_filter(trigram_indexes):
    before, after = trigram_indexes
    toks = ["markwt", "prict", "growtj"]
    want = sorted((r.qt, r.term, round(r.boost, 9)) for r in
                  S.fuzzy_candidates(before, toks, max_dist=1).collect())
    got = sorted((r.qt, r.term, round(r.boost, 9)) for r in
                 S.fuzzy_candidates(after, toks, max_dist=1).collect())
    assert got == want
    assert want, "misspellings should find vocabulary neighbors"


def test_fuzzy_short_token_falls_back(trigram_indexes):
    # 2-char token: bound = 2 − 3d < 1 → exact-scan fallback, identical
    before, after = trigram_indexes
    want = sorted((r.qt, r.term) for r in
                  S.fuzzy_candidates(before, ["ab"], max_dist=1).collect())
    got = sorted((r.qt, r.term) for r in
                 S.fuzzy_candidates(after, ["ab"], max_dist=1).collect())
    assert got == want


def test_fuzzy_search_identity_end_to_end(trigram_indexes):
    before, after = trigram_indexes
    want = [(r.doc_id, round(r.score, 9)) for r in
            S.search_fuzzy(before, ["markwt", "prict"], k=20).collect()]
    got = [(r.doc_id, round(r.score, 9)) for r in
           S.search_fuzzy(after, ["markwt", "prict"], k=20).collect()]
    assert got == want
