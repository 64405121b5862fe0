"""Corpus statistics job (SURVEY §2.3 A2-A3): N, total tokens, avgdl,
vocabulary size, df distribution head — one JSON line.

spark-submit --py-files dist/engine.zip jobs/corpus_stats.py \
    --input /data/documents_parquet [--analyzer full|simple]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--analyzer", choices=["full", "simple"], default="full")
    ap.add_argument("--top-terms", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.functions.analyzer import AnalyzerConfig
    from search_engine_spark.operators import postings as P
    from search_engine_spark.session import get_spark

    spark = get_spark("corpus_stats")
    spark.sparkContext.setLogLevel("ERROR")
    conf = AnalyzerConfig.full() if args.analyzer == "full" else AnalyzerConfig.simple()
    docs = spark.read.parquet(args.input)

    ds = P.doc_stats(docs, conf)
    stats = P.corpus_stats(ds)
    post = P.build_postings(docs, conf, positional=False)
    ts = P.term_stats(post)
    vocab = ts.count()
    top = [
        {"term": r.term, "df": r.df, "cf": int(r.cf)}
        for r in ts.orderBy(F.desc("df"), "term").limit(args.top_terms).collect()
    ]
    print(json.dumps({**stats, "vocab_size": vocab, "top_terms": top}))


if __name__ == "__main__":
    main()
