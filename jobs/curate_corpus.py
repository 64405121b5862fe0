"""Training-data curation job: raw documents → filtered, deduplicated
training corpus with a per-stage lineage funnel.

spark-submit --py-files dist/engine.zip jobs/curate_corpus.py \
    --input /data/documents_parquet --output /data/curated \
    [--languages en,fr] [--min-quality 0.5] \
    [--min-tokens 20] [--max-tokens 100000] \
    [--minhash-threshold 0.8] [--html] [--pii-scrub] \
    [--max-dup-line-ratio 0.3] [--max-top-bigram-frac 0.2] \
    [--max-bits-per-token 14] [--url-dedup] \
    [--blocked-domains spam.com,seo-farm.co.uk | @/data/blocklist.txt] \
    [--mixture src0:0.5,src1:0.5] [--splits train:0.9,val:0.1] \
    [--decontam-eval /data/benchmarks_parquet [--decontam-n 13]] \
    [--dsir-target /data/target_parquet --dsir-keep 100000]

Pipeline (operators/curation.py): optional PII scrub → optional
domain blocklist → optional URL dedup → language filter →
quality/length filter → optional repetition
filter → optional corpus-LM (bits/token) filter → exact dedup →
MinHash near-dedup (opt-in) → optional benchmark decontamination →
optional mixture rebalance → optional deterministic split assignment. Writes the curated
parquet plus ``_funnel.json`` recording rows surviving each stage (the
underscore prefix makes Spark's file listing skip it, so the output dir
stays directly readable as parquet; written through the Hadoop
FileSystem API so hdfs://, s3a:// etc. outputs work the same as local
paths).
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
    ap.add_argument("--output", required=True)
    ap.add_argument("--languages", default="en",
                    help="comma list of language codes to keep; empty "
                         "string disables the language filter")
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--min-tokens", type=int, default=1)
    ap.add_argument("--max-tokens", type=int, default=1 << 31)
    ap.add_argument("--minhash-threshold", type=float, default=None,
                    help="enable MinHash near-dedup at this Jaccard "
                         "threshold (omit to skip)")
    ap.add_argument("--html", action="store_true",
                    help="input is the web shape (url, warc_ts, html): "
                         "derive doc_id/text first")
    ap.add_argument("--pii-scrub", action="store_true",
                    help="redact emails/IPv4/phones in text before "
                         "filtering (textquality.pii_scrub)")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the published Gopher rule battery "
                         "(textquality.gopher_quality) after the "
                         "rule-based quality filter")
    ap.add_argument("--c4-min-kept-lines", type=int, default=None,
                    help="enable C4 page cleanup: line rules rewrite "
                         "the text, pages with fewer surviving lines "
                         "are dropped")
    ap.add_argument("--c4-no-terminal-punct", action="store_true",
                    help="drop C4's terminal-punctuation line rule "
                         "(for corpora without sentence punctuation)")
    ap.add_argument("--robots", default=None, metavar="PARQUET",
                    help="(host, content) robots.txt table; parsed "
                         "with operators.robots and applied as the "
                         "politeness-first stage (needs a url column)")
    ap.add_argument("--robots-agent", default="*",
                    help="user-agent token for --robots (default *)")
    ap.add_argument("--max-dup-line-ratio", type=float, default=None,
                    help="drop docs whose duplicate-line ratio exceeds "
                         "this (Gopher-style repetition filter)")
    ap.add_argument("--max-top-bigram-frac", type=float, default=None,
                    help="drop docs whose most frequent bigram exceeds "
                         "this fraction of all bigrams")
    ap.add_argument("--max-bigram-bits", type=float, default=None,
                    help="drop docs above this mean bigram-LM bits/token "
                         "(catches rare continuations of common "
                         "histories; pair with --max-bits-per-token)")
    ap.add_argument("--winnow-min-shared", type=int, default=None,
                    help="passage-reuse dedup: drop docs sharing >= N "
                         "winnowing fingerprints with a lower-id doc")
    ap.add_argument("--max-bits-per-token", type=float, default=None,
                    help="CCNet-style corpus-LM filter: drop docs whose "
                         "mean -log2 p(token) under the corpus unigram "
                         "model exceeds this bound")
    ap.add_argument("--url-dedup", action="store_true",
                    help="collapse URL spellings to one row per "
                         "canonical URL before any text stage (input "
                         "must carry a url column)")
    ap.add_argument("--blocked-domains", default=None,
                    help="comma-separated registered domains to drop "
                         "(subdomains included) as the first stage; or "
                         "@/path/to/file with one domain per line")
    ap.add_argument("--dedup-lines-min-docs", type=int, default=None,
                    help="CCNet-style boilerplate removal: delete every "
                         "non-empty line occurring in >= this many "
                         "distinct docs, before the text filters")
    ap.add_argument("--decontam-eval", default=None,
                    help="parquet path of benchmark/eval docs (text "
                         "column): drop training docs sharing a word "
                         "n-gram with them")
    ap.add_argument("--decontam-n", type=int, default=13,
                    help="n-gram size for decontamination (default 13, "
                         "the GPT-3/Pile standard)")
    ap.add_argument("--dsir-target", default=None, metavar="PARQUET",
                    help="parquet path of a TARGET corpus (text "
                         "column): DSIR-resample the survivors toward "
                         "its hashed-n-gram distribution as the final "
                         "cut (operators.dsir; needs --dsir-keep)")
    ap.add_argument("--dsir-keep", type=int, default=None,
                    help="number of docs the DSIR stage keeps")
    ap.add_argument("--dsir-dim", type=int, default=10_000,
                    help="DSIR feature-hash width (default 10000)")
    ap.add_argument("--splits", default=None,
                    help="add a deterministic split column, e.g. "
                         "'train:0.9,val:0.05,test:0.05'")
    ap.add_argument("--mixture", default=None,
                    help="rebalance the curated output to a target "
                         "domain mixture, e.g. 'src0:0.5,src1:0.5'")
    ap.add_argument("--mixture-by", default="source",
                    help="column holding the mixture domain (default "
                         "'source')")
    ap.add_argument("--lineage-out", default=None,
                    help="also write a (doc_id, killed_by) audit table "
                         "to this path: the FIRST stage that dropped "
                         "each doc, or 'survived' (roughly doubles "
                         "per-stage predicate work — audit runs only)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.functions.analyzer import make_extract_text_udf
    from search_engine_spark.operators import curation
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources import corpus

    spark = get_spark("curate_corpus")
    docs = spark.read.parquet(args.input)
    if args.html:
        docs = corpus.ingest_filters(corpus.with_dense_doc_ids(docs))
        docs = docs.withColumn(
            "text", make_extract_text_udf()(F.col("html"))).drop("html")

    # strip + lowercase so "en, FR" keeps French instead of silently
    # filtering everything to a code language_id never emits
    langs = tuple(
        s.strip().lower() for s in args.languages.split(",") if s.strip()
    ) or None
    if args.pii_scrub:
        from search_engine_spark.operators import textquality

        docs = textquality.pii_scrub(docs) \
            .drop("n_email", "n_ip", "n_phone")
    robots_rules = None
    if args.robots:
        from search_engine_spark.operators import robots as RB

        robots_rules = RB.parse_robots(spark.read.parquet(args.robots))
    kills_acc = [] if args.lineage_out else None
    curated, funnel = curation.curate(
        docs, _kills_acc=kills_acc,
        languages=langs, min_quality=args.min_quality,
        min_tokens=args.min_tokens, max_tokens=args.max_tokens,
        minhash_threshold=args.minhash_threshold,
        gopher=args.gopher,
        c4_min_kept_lines=args.c4_min_kept_lines,
        c4_require_terminal_punct=not args.c4_no_terminal_punct,
        robots_rules=robots_rules,
        robots_agent=args.robots_agent,
        max_dup_line_ratio=args.max_dup_line_ratio,
        max_top_bigram_frac=args.max_top_bigram_frac,
        max_bits_per_token=args.max_bits_per_token,
        max_bigram_bits=args.max_bigram_bits,
        winnow_min_shared=args.winnow_min_shared,
        url_dedup=args.url_dedup,
        blocked_domains=_parse_blocked(args.blocked_domains),
        dedup_line_min_docs=args.dedup_lines_min_docs,
        eval_docs=(spark.read.parquet(args.decontam_eval)
                   if args.decontam_eval else None),
        decontam_n=args.decontam_n,
        dsir_target=(spark.read.parquet(args.dsir_target)
                     if args.dsir_target else None),
        dsir_keep=args.dsir_keep,
        dsir_dim=args.dsir_dim,
    )
    if args.mixture:
        from search_engine_spark.operators import sampling

        target = _parse_weights(args.mixture)
        pre_mixture = curated
        curated = sampling.rebalance_mixture(curated, target,
                                             by=args.mixture_by)
        funnel.append({"stage": "mixture", "rows": curated.count()})
        if kills_acc is not None:
            # the audit covers the CLI's post-curate stage too
            kills_acc.append(
                pre_mixture.select("doc_id")
                .join(curated.select("doc_id"), "doc_id", "left_anti")
                .withColumn("killed_by", F.lit("mixture")))
    if args.splits:
        from search_engine_spark.operators import sampling

        curated = sampling.assign_splits(curated,
                                         weights=_parse_weights(args.splits))
    curated.write.mode("overwrite").parquet(args.output)
    if kills_acc is not None:
        lineage = curated.select("doc_id").withColumn(
            "killed_by", F.lit("survived"))
        for frame in kills_acc:
            lineage = lineage.unionByName(frame)
        lineage.write.mode("overwrite").parquet(args.lineage_out)
    write_funnel(spark, args.output, funnel)
    for row in funnel:
        print(json.dumps(row))


def _parse_blocked(spec: str | None) -> list[str] | None:
    """``a.com,b.org`` or ``@file`` (one domain per line, # comments)."""
    if not spec:
        return None
    if spec.startswith("@"):
        with open(spec[1:]) as f:
            return [ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")]
    return [s.strip() for s in spec.split(",") if s.strip()]


def _parse_weights(spec: str) -> dict[str, float]:
    """'train:0.9,val:0.1' → {'train': 0.9, 'val': 0.1} (strict: a
    malformed pair raises instead of silently skewing the weights)."""
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, val = part.strip().partition(":")
        if not name or not val:
            raise SystemExit(f"malformed weight spec {part!r} in {spec!r}")
        out[name] = float(val)
    return out


def write_funnel(spark, output: str, funnel: list) -> None:
    """Write ``_funnel.json`` next to the parquet files via the Hadoop
    FileSystem API: works for any output URI the writer accepted, and
    the '_' prefix keeps the sidecar out of parquet file listings."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(output, "_funnel.json")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(json.dumps(funnel, indent=2).encode())
    finally:
        out.close()


if __name__ == "__main__":
    main()
