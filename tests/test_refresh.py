"""Crawl-refresh upsert (catalog.refresh_index): re-crawled urls replace
their old versions, new urls join the corpus, and the refreshed index is
query-identical — by (url, score) — to a from-scratch build over the
expected live corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import search as S
from search_engine_spark.sources import catalog
from search_engine_spark.sources.corpus import _gen_rows


def _batch(spark, corpus_pdf, n_recrawl=10, n_new=15):
    """Re-crawl the first n_recrawl urls with CHANGED text + n_new fresh
    urls (generated from an id range disjoint with the main corpus)."""
    recrawl = corpus_pdf.head(n_recrawl)[["url", "warc_ts", "html",
                                          "text", "lang"]].copy()
    recrawl["text"] = ("revised edition " + recrawl["text"]).str.slice(0, 400)
    fresh = _gen_rows(np.arange(900_000, 900_000 + n_new))[
        ["url", "warc_ts", "html", "text", "lang"]]
    import pandas as pd

    return spark.createDataFrame(pd.concat([recrawl, fresh],
                                           ignore_index=True))


def _scores_by_url(spark, idx_dir, docs, q="market price growth", k=30):
    idx = catalog.load_index(spark, idx_dir)
    hits = S.search_freetext(idx, q, k=k)
    with_url = hits.join(docs.select("doc_id", "url"), "doc_id")
    return sorted((r["url"], round(r["score"], 9))
                  for r in with_url.collect())


def test_refresh_matches_fresh_build(spark, corpus_pdf, tmp_path):
    main_docs = spark.createDataFrame(
        corpus_pdf[["doc_id", "url", "warc_ts", "text", "lang"]])
    main_dir = str(tmp_path / "main")
    catalog.build_durable_index(spark, main_docs, main_dir, buckets=16)

    batch = _batch(spark, corpus_pdf)
    out_dir = str(tmp_path / "refreshed")
    res = catalog.refresh_index(spark, main_dir, main_docs, batch, out_dir)
    assert res["n_stale"] == 10 and res["n_new"] == 25

    # expected live corpus: main minus re-crawled urls, plus the batch
    batch_urls = {r["url"] for r in batch.select("url").collect()}
    kept = corpus_pdf[~corpus_pdf["url"].isin(batch_urls)]
    expect_docs = spark.createDataFrame(
        kept[["url", "warc_ts", "text", "lang"]]).unionByName(
        batch.drop("html"))
    from search_engine_spark.sources.corpus import with_dense_doc_ids

    expect_docs = with_dense_doc_ids(expect_docs)
    fresh_dir = str(tmp_path / "fresh")
    catalog.build_durable_index(spark, expect_docs, fresh_dir, buckets=16)

    docs_out = res["docs_out"]
    for q in ("market price growth", "revised edition"):
        assert _scores_by_url(spark, out_dir, docs_out, q) == \
            _scores_by_url(spark, fresh_dir, expect_docs, q)

    # refreshed stats == fresh stats (vacuum recomputed them)
    a = catalog.load_index(spark, out_dir).stats
    b = catalog.load_index(spark, fresh_dir).stats
    assert (a["n_docs"], a["avgdl"], a["total_len"]) == \
        (b["n_docs"], b["avgdl"], b["total_len"])

    # the refreshed index carries no tombstones, and docs_out row count
    # matches the live corpus
    assert catalog.load_tombstones(spark, out_dir) is None
    assert docs_out.count() == expect_docs.count()


def test_refresh_rejects_multi_row_urls(spark, corpus_pdf, tmp_path):
    main_docs = spark.createDataFrame(
        corpus_pdf[["doc_id", "url", "warc_ts", "text", "lang"]])
    main_dir = str(tmp_path / "main")
    catalog.build_durable_index(spark, main_docs, main_dir, buckets=16)
    import pandas as pd

    dup = corpus_pdf.head(1)[["url", "warc_ts", "text", "lang"]]
    batch = spark.createDataFrame(pd.concat([dup, dup], ignore_index=True))
    with pytest.raises(ValueError, match="one row per url"):
        catalog.refresh_index(spark, main_dir, main_docs, batch,
                              str(tmp_path / "out"))
