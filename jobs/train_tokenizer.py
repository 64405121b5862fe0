"""BPE tokenizer training job (operators/bpe.py as a spark-submit CLI).

spark-submit --py-files dist/engine.zip jobs/train_tokenizer.py \
    --documents /data/documents_parquet --out /data/tokenizer \
    [--n-merges 32000] [--max-words 1000000] \
    [--apply /data/token_counts_parquet]

Writes ``<out>/merges.json``: {"merges": [[a, b], ...], "n_merges",
"max_words", "dropped_mass", "n_docs"} — the learned merge list in rank
order plus the capped-mass disclosure. With ``--apply``, also writes a
(doc_id, n_bpe_tokens) parquet scored under the learned merges.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-merges", type=int, default=32_000)
    ap.add_argument("--max-words", type=int, default=1_000_000)
    ap.add_argument("--apply", default=None,
                    help="also write (doc_id, n_bpe_tokens) parquet here")
    args = ap.parse_args()
    if args.n_merges < 1:
        ap.error("--n-merges must be >= 1")

    from search_engine_spark.operators import bpe
    from search_engine_spark.session import get_spark

    spark = get_spark("train_tokenizer")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.documents)

    merges, dropped = bpe.learn_bpe(docs, n_merges=args.n_merges,
                                    max_words=args.max_words)
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "merges.json")
    with open(out_path, "w") as f:
        json.dump({
            "merges": [list(m) for m in merges],
            "n_merges": len(merges),
            "max_words": args.max_words,
            "dropped_mass": dropped,
            "n_docs": docs.count(),
        }, f)
    print(json.dumps({"merges_path": out_path, "n_merges": len(merges),
                      "dropped_mass": round(dropped, 6)}))

    if args.apply:
        bpe.bpe_token_count(docs, merges).write.mode("overwrite") \
            .parquet(args.apply)
        print(json.dumps({"applied_to": args.apply}))


def load_merges(path: str) -> list[tuple[str, str]]:
    """Read a merges.json back into the list bpe.bpe_token_count takes."""
    with open(path) as f:
        data = json.load(f)
    return [tuple(m) for m in data["merges"]]


if __name__ == "__main__":
    main()
