"""End-to-end training-data curation — the composition a 100 TB crawl
runs to produce an LLM training corpus (task brief's pipeline family),
built from this package's oracle-gated operators:

    language filter → quality/length filter → exact dedup → MinHash
    near-dedup → benchmark decontamination

with a per-stage row funnel for lineage. Stage order pins the cheap
row-local filters BEFORE the shuffle-heavy dedup stages so dedup runs on
the smallest surviving set; every stage is the bounded/banded form (no
all-pairs joins, no unbounded driver transfer), so the composition
inherits each operator's scale properties.

``jobs/curate_corpus.py`` is the spark-submit CLI; the deterministic
subset (filters + exact dedup) is driver-contract-gated end-to-end
against a composed DuckDB oracle (``curated_corpus``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import decontam, dedup, textquality
from ._cache import PersistRegistry

# Final persisted frames from prior curate() calls (intermediate stage
# frames are released as the pipeline advances, but the LAST one backs
# the returned DataFrame and must outlive the call). Released on the
# next curate() entry or explicitly via release_caches(), so a
# long-lived session sweeping parameters holds at most one corpus-sized
# persisted frame, mirroring the per-query cache bound in
# operators.search.
_PERSISTED = PersistRegistry()


def release_caches() -> None:
    """Unpersist frames retained by earlier curate() calls (including
    the candidate-pair cache inside the MinHash stage and the DSIR
    stage's raw-feature cache)."""
    _PERSISTED.drain()
    dedup.release_caches()
    from . import dsir

    dsir.release_caches()


def curate(
    docs: DataFrame,
    languages: tuple[str, ...] | None = ("en",),
    min_quality: float = 0.0,
    min_tokens: int = 1,
    max_tokens: int = 1 << 31,
    classifier_weights: list[float] | None = None,
    min_clf_prob: float = 0.5,
    minhash_threshold: float | None = None,
    robots_rules: DataFrame | None = None,
    robots_agent: str = "*",
    gopher: bool = False,
    c4_min_kept_lines: int | None = None,
    c4_require_terminal_punct: bool = True,
    max_dup_line_ratio: float | None = None,
    max_top_bigram_frac: float | None = None,
    max_bits_per_token: float | None = None,
    max_bigram_bits: float | None = None,
    winnow_min_shared: int | None = None,
    url_dedup: bool = False,
    blocked_domains: list[str] | None = None,
    dedup_line_min_docs: int | None = None,
    url_col: str = "url",
    eval_docs: DataFrame | None = None,
    decontam_n: int = 13,
    dsir_target: DataFrame | None = None,
    dsir_keep: int | None = None,
    dsir_dim: int = 10_000,
    text_col: str = "text",
    collect_funnel: bool = True,
    _kills_acc: list | None = None,
) -> tuple[DataFrame, list[dict]]:
    """→ (curated docs frame, per-stage funnel rows).

    ``languages=None`` skips language filtering; ``minhash_threshold=None``
    skips the near-dedup stage (the remaining pipeline is fully
    SQL-expressible — the contract oracle's variant).
    ``classifier_weights`` enables the LEARNED quality filter
    (operators.classifier, FineWeb-style) right after the rule-based
    one: docs with σ(w·x) < ``min_clf_prob`` are dropped. Weights come
    from a prior ``train_quality_classifier`` run.
    ``gopher=True`` runs the published Gopher rule battery
    (textquality.gopher_quality, Rae et al. §A1.1) right after the
    rule-based quality filter — row-local, so it stays pre-shuffle.
    ``c4_min_kept_lines`` enables C4 page cleanup
    (textquality.c4_line_filter): line-level pruning rewrites the text
    and page-level kills drop rows, BEFORE language/quality so every
    later signal sees the cleaned text; pass
    ``c4_require_terminal_punct=False`` for corpora without sentence
    punctuation.
    ``max_dup_line_ratio``/``max_top_bigram_frac`` enable the Gopher-style
    repetition filter (textquality.repetition_stats) between the quality
    filter and dedup — boilerplate pruning belongs before the
    shuffle-heavy stages too.
    ``max_bits_per_token`` enables the CCNet-style corpus-LM filter
    (textquality.unigram_logprob): docs whose mean −log₂ p(token) under
    the corpus unigram model exceeds the bound are dropped (rare-token
    soup). The model is fit on the rows ALIVE at this stage, so earlier
    filters don't pollute it.
    ``robots_rules`` (a parsed operators.robots rules frame) drops
    robots.txt-disallowed URLs as the VERY FIRST stage — crawl
    politeness precedes every content signal; requires ``url_col``.
    ``blocked_domains`` drops rows whose registered domain is
    blocklisted (operators.hosts.domain_filter) as the VERY FIRST stage:
    it is a narrow broadcast anti-join (shuffle-free) and everything a
    blocklist removes is work every later stage skips; requires
    ``url_col``.
    ``url_dedup=True`` collapses spellings of the same URL to one
    min-doc_id row next (operators.urls) — the cheapest dedup signal a
    crawl has, run before any text is touched; requires ``url_col``.
    ``dedup_line_min_docs`` enables CCNet-style corpus-level duplicate-
    line removal (textquality.dedup_lines) BEFORE the text-derived
    filters, so language/quality/LM signals see boilerplate-free text —
    the row count is unchanged (it rewrites text, never drops docs).
    ``max_bigram_bits`` adds the self-trained bigram-LM filter
    (textquality.bigram_logprob) next to the unigram one: it catches
    rare CONTINUATIONS of common histories (prose wandering into
    nonsense), which the unigram model underweights — run both bounds
    for the full CCNet-style split (the bigram op's docstring pins what
    self-scoring can and cannot separate).
    ``winnow_min_shared`` enables passage-reuse dedup after MinHash:
    docs sharing >= that many winnowing fingerprints with a LOWER-id
    doc are dropped (dedup.winnow_overlap_pairs) — catches long quoted
    passages that whole-document Jaccard misses.
    ``eval_docs`` enables benchmark decontamination near the end
    (it runs on few surviving docs there, and dedup cannot
    resurrect a contaminated text): any doc sharing a word
    ``decontam_n``-gram with ``eval_docs`` is dropped
    (operators.decontam).
    ``dsir_target`` (+ ``dsir_keep``) enables DSIR target-distribution
    resampling (operators.dsir, Xie et al. 2023) as the FINAL cut:
    from the cleaned/deduped/decontaminated survivors, keep the
    ``dsir_keep`` docs Gumbel-resampled toward the target corpus's
    hashed-n-gram distribution (deterministic draws, ``dsir_dim``
    feature buckets).
    ``collect_funnel=False`` keeps the whole pipeline lazy (one action at
    the caller's sink) instead of persisting + counting per stage —
    EXCEPT the DSIR stage, whose distribution fits are inherently eager
    (two driver-sized collects); with it enabled the pre-DSIR survivors
    are persisted for the stage's duration so those fits don't replay
    the upstream funnel per action.

    With ``collect_funnel=True`` the returned frame is persisted; it is
    released automatically when curate() is next called (or via
    ``release_caches()``), so repeated calls don't accumulate
    corpus-sized cached frames.
    """
    if dsir_target is not None and dsir_keep is None:
        # trivially pre-checkable — refuse BEFORE hours of funnel work,
        # not at the final stage
        raise ValueError("dsir_target needs dsir_keep (the number of "
                         "docs to resample)")
    release_caches()
    funnel: list[dict] = []
    cur = docs
    prev_persisted = None

    prev_for_kills = docs

    def checkpoint(name: str) -> None:
        nonlocal cur, prev_persisted, prev_for_kills
        if _kills_acc is not None and name != "input":
            # per-doc lineage (curate_with_lineage): whatever this stage
            # dropped is the anti-join of the frame it received against
            # the frame it produced — generic over every stage, including
            # operators that drop internally (decontaminate). Text-
            # rewriting stages (dedup_lines) drop nothing → empty frame.
            _kills_acc.append(
                prev_for_kills.select("doc_id")
                .join(cur.select("doc_id"), "doc_id", "left_anti")
                .withColumn("killed_by", F.lit(name)))
        prev_for_kills = cur
        if not collect_funnel:
            return
        if cur is docs:
            # never persist (and later unpersist) the CALLER's frame:
            # unpersisting it would silently destroy a cache the caller
            # manages on that object. Costs one extra source scan at
            # the next stage — the source read, not the pipeline.
            funnel.append({"stage": name, "rows": cur.count()})
            return
        cur = cur.persist()
        funnel.append({"stage": name, "rows": cur.count()})
        if prev_persisted is not None:
            prev_persisted.unpersist()
        prev_persisted = cur

    checkpoint("input")
    if robots_rules is not None:
        # crawl politeness FIRST (operators.robots): a page robots.txt
        # forbids must never enter the pipeline at all — and the filter
        # is a broadcast prefix join, cheaper than anything downstream
        if url_col not in cur.columns:
            raise ValueError(
                f"robots_rules set but column {url_col!r} is absent")
        from . import robots as RB

        cur = RB.robots_filter(cur, robots_rules, agent=robots_agent,
                               url_col=url_col)
        checkpoint("robots")
    if blocked_domains:
        if url_col not in cur.columns:
            raise ValueError(
                f"blocked_domains set but column {url_col!r} is absent")
        from . import hosts as H

        cur = H.domain_filter(cur, blocked_domains, url_col)
        checkpoint("domain_block")
    if url_dedup:
        if url_col not in cur.columns:
            raise ValueError(
                f"url_dedup=True but column {url_col!r} is absent")
        from . import urls as U

        keep = U.url_dedup(cur, url_col).select("doc_id")
        cur = cur.join(keep, "doc_id", "left_semi")
        checkpoint("url_dedup")
    if dedup_line_min_docs is not None:
        cur = textquality.dedup_lines(
            cur, min_docs=dedup_line_min_docs, text_col=text_col
        ).drop("n_lines_dropped")
        checkpoint("dedup_lines")
    if c4_min_kept_lines is not None:
        # C4 page cleanup (textquality.c4_line_filter): row-local text
        # rewrite + page kills, so it belongs with the other pre-shuffle
        # text hygiene — every later signal sees the cleaned text
        c4f = textquality.c4_line_filter(
            cur, min_kept_lines=c4_min_kept_lines,
            require_terminal_punct=c4_require_terminal_punct,
            text_col=text_col)
        cur = (c4f.filter(F.col("killed_by").isNull())
               .drop("n_lines", "n_lines_kept", "killed_by"))
        checkpoint("c4_cleanup")
    if languages:
        keep = (
            textquality.language_id(cur, text_col)
            .filter(F.col("pred_lang").isin(list(languages)))
            .select("doc_id")
        )
        cur = cur.join(keep, "doc_id", "left_semi")
        checkpoint("language")
    keep = (
        textquality.quality_score(cur, text_col)
        .filter(
            (F.col("quality") >= F.lit(float(min_quality)))
            & F.col("n_tokens").between(min_tokens, max_tokens)
        )
        .select("doc_id")
    )
    cur = cur.join(keep, "doc_id", "left_semi")
    checkpoint("quality")
    if gopher:
        # Gopher rule set (textquality.gopher_quality): the published
        # web-corpus filter battery; row-local like the quality stage
        keep = (
            textquality.gopher_quality(cur, text_col=text_col)
            .filter(F.col("gopher_pass"))
            .select("doc_id")
        )
        cur = cur.join(keep, "doc_id", "left_semi")
        checkpoint("gopher")
    if classifier_weights is not None:
        # learned quality filter (operators.classifier) right after the
        # rule-based one: σ(w·x) over the same quality_score features —
        # weights come from a prior train_quality_classifier run (they
        # are corpus-independent serving state, like the spellchecker's
        # vocabulary). Still a row-local filter → stays before dedup.
        from . import classifier as CLF

        feats = CLF.doc_features(textquality.quality_score(cur, text_col))
        keep = (
            CLF.classifier_scores(feats, classifier_weights)
            .filter(F.col("prob") >= F.lit(float(min_clf_prob)))
            .select("doc_id")
        )
        cur = cur.join(keep, "doc_id", "left_semi")
        checkpoint("quality_clf")
    if max_dup_line_ratio is not None or max_top_bigram_frac is not None:
        # bigram shuffle aggs only when the bigram threshold is in play —
        # a lines-only repetition filter stays shuffle-free
        rep = textquality.repetition_stats(
            cur, text_col,
            include_bigrams=max_top_bigram_frac is not None)
        cond = F.lit(True)
        if max_dup_line_ratio is not None:
            cond = cond & (F.col("dup_line_ratio")
                           <= F.lit(float(max_dup_line_ratio)))
        if max_top_bigram_frac is not None:
            cond = cond & (F.col("top_bigram_frac")
                           <= F.lit(float(max_top_bigram_frac)))
        cur = cur.join(rep.filter(cond).select("doc_id"),
                       "doc_id", "left_semi")
        checkpoint("repetition")
    if max_bits_per_token is not None:
        keep = (
            textquality.unigram_logprob(cur, text_col)
            .filter(F.col("bits_per_token")
                    <= F.lit(float(max_bits_per_token)))
            .select("doc_id")
        )
        cur = cur.join(keep, "doc_id", "left_semi")
        checkpoint("lm_quality")
    if max_bigram_bits is not None:
        keep = (
            textquality.bigram_logprob(cur, text_col=text_col)
            .filter(F.col("bits_per_token")
                    <= F.lit(float(max_bigram_bits)))
            .select("doc_id")
        )
        cur = cur.join(keep, "doc_id", "left_semi")
        checkpoint("bigram_lm_quality")
    survivors = dedup.exact_dedup(cur, text_col).select("doc_id")
    cur = cur.join(survivors, "doc_id", "left_semi")
    checkpoint("exact_dedup")
    if minhash_threshold is not None:
        surv = dedup.minhash_dedup(cur, text_col,
                                   threshold=minhash_threshold)
        cur = cur.join(surv, "doc_id", "left_semi")
        checkpoint("near_dedup")
    if winnow_min_shared is not None:
        pairs = dedup.winnow_overlap_pairs(cur, min_shared=winnow_min_shared,
                                           text_col=text_col)
        # keep-lowest-id: a doc dies iff a lower-id doc shares enough
        # fingerprints (doc_b of a pair is always the higher id)
        dead = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        cur = cur.join(dead, "doc_id", "left_anti")
        checkpoint("winnow_dedup")
    if eval_docs is not None:
        cur = decontam.decontaminate(cur, eval_docs, n=decontam_n,
                                     text_col=text_col)
        checkpoint("decontaminate")
    if dsir_target is not None:
        # DSIR target-distribution resampling (operators.dsir) as the
        # FINAL cut: selection runs on the cleaned, deduped,
        # decontaminated survivors (selecting first would waste weight
        # mass on docs later stages kill anyway), exactly where the
        # pretraining pipelines place it — after hygiene, before
        # tokenization
        from . import dsir as DS

        if not collect_funnel:
            # the DSIR fits are EAGER (two driver-sized collects), so a
            # lazy pipeline would otherwise replay every upstream stage
            # for the raw fit, again for the weight aggregate, and once
            # more at the caller's sink — persist the survivors for the
            # stage's duration (released with the other funnel caches)
            cur = cur.persist()
        sel = DS.dsir_select(cur, dsir_target, k=dsir_keep,
                             dim=dsir_dim, text_col=text_col
                             ).select("doc_id")
        out_sel = cur.join(sel, "doc_id", "left_semi")
        if not collect_funnel:
            _PERSISTED.add(cur)
        cur = out_sel
        checkpoint("dsir_select")
    if prev_persisted is not None:
        _PERSISTED.add(prev_persisted)
    return cur, funnel


def curate_with_lineage(docs: DataFrame, **kwargs,
                        ) -> tuple[DataFrame, list[dict], DataFrame]:
    """curate() plus PER-DOC lineage: → (curated frame, funnel rows,
    (doc_id, killed_by) frame) where killed_by is the FIRST stage that
    dropped the doc, or 'survived'. The auditability layer a 100 TB
    curation run needs — "why is this document not in the training
    set?" answered without re-running the pipeline.

    Each stage's kills are its input-vs-output doc_id anti-join, so
    lineage mode re-evaluates each stage's predicate roughly twice
    (once for the pipeline, once for the audit) — run it on samples or
    when writing the audit table, not in the hot path. Every doc
    appears exactly ONCE (stages are sequential; later stages never see
    earlier kills)."""
    acc: list[DataFrame] = []
    cur, funnel = curate(docs, _kills_acc=acc, **kwargs)
    lineage = cur.select("doc_id").withColumn(
        "killed_by", F.lit("survived"))
    for f in acc:
        lineage = lineage.unionByName(f)
    return cur, funnel, lineage
