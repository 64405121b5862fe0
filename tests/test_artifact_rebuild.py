"""catalog.rebuild_artifacts: after a merge/vacuum produces a NEW
index directory, the source's optional serving artifacts (next-word
phrase index, trigram vocabulary index) are re-derived over the fresh
stats — derived data is recomputed, never carried over.
"""

from __future__ import annotations

import pytest

from search_engine_spark.sources import catalog


def test_rebuild_after_vacuum(tmp_path, spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta"),
            (2, "alpha gamma beta"),
            (3, "beta beta beta"),
            (4, "gamma gamma alpha"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "idx")
    catalog.build_durable_index(spark, docs, src, buckets=8, block_span=16)
    catalog.build_phrase_index(spark, src, min_df=1)
    catalog.build_term_ngram_index(spark, src)

    # tombstone doc 1 (the only "alpha beta" holder), then vacuum
    catalog.delete_docs(spark, src, [1])
    out = str(tmp_path / "idx_v2")
    catalog.vacuum_index(spark, src, out)
    rebuilt = catalog.rebuild_artifacts(spark, src, out)
    assert rebuilt == ["phrase_index", "term_ngram_index"]

    idx = catalog.load_index(spark, out)
    # the vacuumed phrase index describes only live docs: doc 1's
    # "alpha beta" occurrences are gone, doc 3's "beta beta" remain
    assert idx.bigram_lookup("alpha", "beta").count() == 0
    assert [(r.doc_id, r.tf) for r in
            idx.bigram_lookup("beta", "beta").collect()] == [(3, 2)]
    # trigram index rebuilt over the new vocabulary
    cand = idx.trigram_candidates("*pha")
    assert cand is not None
    assert {r.term for r in cand.collect()} == {"alpha"}


def test_rebuild_is_a_noop_without_source_artifacts(tmp_path, spark):
    docs = spark.createDataFrame([(1, "alpha beta")],
                                 "doc_id long, text string")
    src = str(tmp_path / "plain")
    catalog.build_durable_index(spark, docs, src, buckets=8, block_span=16)
    out = str(tmp_path / "plain_v2")
    catalog.vacuum_index(spark, src, out)
    assert catalog.rebuild_artifacts(spark, src, out) == []
