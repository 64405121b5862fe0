"""jobs/index_stats.py: the store-inspection report — numbers must
agree with the build's own lineage, the codec mix must read the
self-describing payload tags correctly, and impact artifacts must
report their store kind + sidecar."""

from __future__ import annotations

import pytest

from search_engine_spark.sources import catalog


@pytest.fixture(scope="module")
def stats_index(tmp_path_factory, spark, corpus_sdf):
    d = str(tmp_path_factory.mktemp("statsidx") / "idx")
    catalog.build_durable_index(spark, corpus_sdf, d, buckets=8,
                                block_span=64)
    return d


def test_report_matches_lineage(spark, stats_index, corpus_sdf):
    from jobs.index_stats import collect_stats

    rep = collect_stats(spark, stats_index)
    assert rep["n_docs"] == corpus_sdf.count()
    seg_rows = [r for r in catalog.lineage_rows(stats_index)
                if r["step"] == "segments"]
    assert seg_rows and rep["blocks"] == seg_rows[0]["blocks"]
    assert rep["postings"] == seg_rows[0]["postings"]
    assert rep["payload_bytes"] == seg_rows[0]["payload_bytes"]
    assert rep["store"] == "tf"
    assert rep["codec_mix"] == {"vb": rep["blocks"]}
    assert rep["bucket_skew_max_over_mean"] >= 1.0
    assert rep["deleted_fraction"] == 0.0
    assert rep["df_head"][0][1] >= rep["df_head"][-1][1]


def test_report_on_impact_store(tmp_path, spark, stats_index):
    from jobs.index_stats import collect_stats

    qdir = catalog.quantize_index(spark, stats_index,
                                  str(tmp_path / "imp"), bits=8)
    rep = collect_stats(spark, qdir)
    assert rep["store"] == "impact"
    assert rep["impact_bits"] == 8
    assert rep["sidecar_dir"] == stats_index
    assert set(rep["codec_mix"]) == {"impact"}


def test_impact_report_lists_sidecar_artifacts(tmp_path, spark,
                                               stats_index):
    # artifacts resolve through the sidecar at serving time (the impact
    # store shares the source's phrase/trigram/VSM artifacts), so the
    # report must list them for the impact dir too — consistent with its
    # own term_stats fallback
    from jobs.index_stats import collect_stats

    catalog.build_phrase_index(spark, stats_index, min_df=5)
    qdir = catalog.quantize_index(spark, stats_index,
                                  str(tmp_path / "imp2"), bits=8)
    assert "phrase_index" in collect_stats(spark, stats_index)["artifacts"]
    assert "phrase_index" in collect_stats(spark, qdir)["artifacts"]
