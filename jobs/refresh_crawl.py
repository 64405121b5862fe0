"""Crawl-refresh job: upsert a re-crawl batch into a completed durable
index. Re-crawled urls are tombstoned immediately, the batch is indexed
as a delta with the main index's own build config, and a merge-vacuum
produces a fresh index that is query-identical to a from-scratch build
over the live corpus (tests/test_refresh.py).

spark-submit --py-files dist/engine.zip jobs/refresh_crawl.py \
    --index /data/index --docs /data/documents \
    --batch /data/crawl_2026_08 --output /data/index_v2 \
    --docs-out /data/documents_v2

``--docs`` is the documents table the index was built from (doc_id, url,
text, ...); ``--batch`` is parquet with one row per url (apply a
latest-wins cut upstream). The refreshed documents table lands at
``--docs-out`` for serving/hydration against the new index.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--docs", required=True)
    ap.add_argument("--batch", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--docs-out", required=True)
    ap.add_argument("--rebuild-artifacts", action="store_true",
                    help="re-derive the source's optional serving "
                         "artifacts (phrase index, trigram vocabulary "
                         "index) on the refreshed output; quantized "
                         "stores need an explicit quantize_index run")
    args = ap.parse_args()

    from search_engine_spark.session import get_spark
    from search_engine_spark.sources import catalog

    spark = get_spark("refresh_crawl")
    res = catalog.refresh_index(
        spark, args.index,
        main_docs=spark.read.parquet(args.docs),
        new_docs=spark.read.parquet(args.batch),
        out_dir=args.output)
    res.pop("docs_out").write.mode("error").parquet(args.docs_out)
    if args.rebuild_artifacts:
        res["artifacts"] = catalog.rebuild_artifacts(
            spark, args.index, args.output)
    print(res)


if __name__ == "__main__":
    main()
