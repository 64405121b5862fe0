"""Tombstone-delete job: logically delete documents from a completed
durable index. Queries exclude the docs immediately (lookup anti-join +
WAND live-docs mask); run jobs/merge_index.py with a single input to
vacuum the postings physically and refresh corpus stats.

spark-submit --py-files dist/engine.zip jobs/delete_docs.py \
    --index /data/index --ids 17,42,99
spark-submit ... jobs/delete_docs.py --index /data/index \
    --ids-parquet /data/deleted_ids.parquet   # needs a doc_id column
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--ids", help="comma-separated doc_ids")
    g.add_argument("--ids-parquet", help="parquet with a doc_id column")
    args = ap.parse_args()

    from search_engine_spark.session import get_spark
    from search_engine_spark.sources import catalog

    spark = get_spark("delete_docs")
    ids = (spark.read.parquet(args.ids_parquet) if args.ids_parquet
           else [int(x) for x in args.ids.split(",") if x.strip()])
    print(catalog.delete_docs(spark, args.index, ids))


if __name__ == "__main__":
    main()
