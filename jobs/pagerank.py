"""Link-analysis job: edges parquet → (node, rank) PageRank artifact.

spark-submit --py-files dist/engine.zip jobs/pagerank.py \
    --edges /data/edges_parquet --output /data/ranks \
    [--iters 10] [--damping 0.85] \
    [--src-col src] [--dst-col dst]

The output parquet is the static-prior artifact the serving surface
consumes (jobs/serve.py --prior-parquet / jobs/query_topk.py --prior):
ranks are computed OFFLINE at build cadence, never per query — at
10^12 edges a power iteration is a batch job, and the serving side
only ever joins the finished (node, rank) table.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True,
                    help="parquet of (src, dst) link rows")
    ap.add_argument("--output", required=True)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--src-col", default="src")
    ap.add_argument("--dst-col", default="dst")
    args = ap.parse_args()

    from search_engine_spark.operators import graph
    from search_engine_spark.session import get_spark

    spark = get_spark("pagerank")
    edges = spark.read.parquet(args.edges)
    ranks = graph.pagerank(edges, n_iter=args.iters, damping=args.damping,
                           src_col=args.src_col, dst_col=args.dst_col)
    ranks.write.mode("overwrite").parquet(args.output)
    graph.release_caches()
    n = spark.read.parquet(args.output).count()
    print(f"wrote {n} ranks to {args.output}")


if __name__ == "__main__":
    main()
