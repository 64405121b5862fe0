"""Ranking models as pure column expressions (whole-stage-codegen friendly).

All four reference scorers (SURVEY §2.5 Q6, Q12, Q13):

* BM25 standard (k1=1.2, b=0.75) — the north-star default;
* BM25 "reference" variant — the reference's non-standard formula
  ``idf·tf/(k·(dl/avgdl)+tf+0.5)``, k=1.5, no b
  (/root/reference/search/retrieval/retrieval_models/bm25_model/bm25_model.py:24,36-37),
  with per-term idf (the reference's single-idf bug is NOT reproduced —
  SURVEY §2.8 decision 2);
* VSM cosine — vsm_model.py:18-103;
* language model (Dirichlet + Pitman-Yor) — language_model.py:18-51,231-257
  (incl. quirk 5: "cf" is actually df).

Each scorer takes a postings-join frame with columns
(term, doc_id, tf, dl, df[, cf]) plus broadcast corpus scalars, and returns
a per-(term,doc) weight column; callers sum per doc (Q14 model merge =
groupBy(doc_id).sum).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def idf_bm25(n_docs: int) -> Column:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — reference bm25_model.py:207."""
    return F.log(1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))


def bm25_weight(n_docs: int, avgdl: float, k1: float = 1.2, b: float = 0.75) -> Column:
    """Standard Robertson/Sparck-Jones BM25 (north-star pin)."""
    tf = F.col("tf").cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
    return (idf_bm25(n_docs) * tf * (k1 + 1.0) / (tf + norm)).alias("weight")


def bm25_reference_weight(n_docs: int, avgdl: float, k: float = 1.5) -> Column:
    """The reference's exact formula (bm25_model.py:36-37), per-term idf."""
    tf = F.col("tf").cast("double")
    return (
        idf_bm25(n_docs) * tf
        / (F.lit(k) * (F.col("dl") / F.lit(float(avgdl))) + tf + 0.5)
    ).alias("weight")


def vsm_doc_weight(n_docs: int) -> Column:
    """(1 + log10 tf) · log10((N-df)/df), clamped at 0 (vsm_model.py:18-42)."""
    w = (1.0 + F.log10(F.col("tf").cast("double"))) * F.log10(
        (F.lit(float(n_docs)) - F.col("df")) / F.col("df")
    )
    return F.greatest(w, F.lit(0.0)).alias("weight")


# the reference's smoothing constants (language_model.py): keep the term
# weight and the additive doc prior on the SAME value — they are applied
# at two different plan sites
LM_MU_DIRICHLET = 1089.0
LM_MU_PYP = 1303.0


def lm_weight(total_cf: int, mu: float = LM_MU_DIRICHLET, tf_q: int = 1,
              pitman_yor: bool = False, g: float = 0.2) -> Column:
    """Language-model term weight (language_model.py:18-51).

    Dirichlet: tf_q · ln((tf/µ)·(L_c/cf) + 1), µ=1089.
    Pitman-Yor: tf_q · ln(disc_tf·L_c/(µ·cf) + 1), disc_tf = max(tf − g·tf^g, 0),
    µ=1303, g=0.2. Quirk 5 preserved: cf here is the df the reference stores
    in slot 0 — callers pass the df column aliased as ``cf``.
    """
    tf = F.col("tf").cast("double")
    lc = F.lit(float(total_cf))
    cf = F.col("cf").cast("double")
    if pitman_yor:
        disc = F.greatest(tf - F.lit(g) * F.pow(tf, F.lit(g)), F.lit(0.0))
        w = F.log(disc * lc / (F.lit(mu) * cf) + 1.0)
    else:
        w = F.log((tf / F.lit(mu)) * (lc / cf) + 1.0)
    return (F.lit(float(tf_q)) * w).alias("weight")


def lm_phrase_weight(total_cf: int, mu: float) -> Column:
    """LM phrase weight (language_model.py:53-63
    compute_weight_phrase_document): ln((phrase_tf/µ)·(L_c/df) + 1), where
    df is the phrase's document frequency (the reference passes its phrase
    df as the "total collection frequency" — same cf==df quirk as terms)
    and phrase_tf is the consecutive-occurrence count. Applied to a frame
    with columns (tf, df). NO doc-length prior — the reference's
    compute_document_scores_phrase (language_model.py:259-270) never adds
    one — and no tf_q factor.

    µ pin (SURVEY §2.8): the reference's phrase µ is whatever ``self.miu``
    holds when phrase_rank runs — 1303 as constructed
    (retrieval_execution.py:168) unless a Dirichlet single-term pass in the
    SAME query already mutated it to 1089 (language_model.py:244), making
    the value depend on mutation order and on whether the free-text part
    matched any document. We pin µ to the model's own constant
    (dirichlet→1089, pyp→1303) instead of reproducing that statefulness.
    """
    tf = F.col("tf").cast("double")
    w = F.log((tf / F.lit(mu)) * (F.lit(float(total_cf)) / F.col("df")) + 1.0)
    return w.alias("weight")


# ---------------------------------------------------------------------------
# Quantized impacts (Anh & Moffat 2005; Lucene's quantized-norm line —
# public). The BM25 tf/dl part w(tf,dl) = tf·(k1+1)/(tf+k1·(1−b+b·dl/avgdl))
# lies in (0, k1+1); q = round(w/(k1+1)·maxq) with maxq = 2^bits−1 is the
# stored per-posting impact, and serving scores idf·(k1+1)·q/maxq.
#
# The quantization is DEFINED in exact int64 arithmetic so the engine,
# the numpy converter, and an ANSI-SQL oracle all produce bit-identical
# impacts (a float formulation would hash-diverge at rounding
# boundaries). With avgdl pinned to integer milli-tokens
# am = round(1000·total_len/n_docs):
#
#     N = 10·tf·am            (≡ tf, scaled)
#     D = N + 3·am + 9000·dl  (≡ tf + k1(1−b) + k1·b·dl/avgdl, scaled —
#                              the 3/9000 constants are 10·k1(1−b) and
#                              10000·k1·b for the baked k1=1.2, b=0.75)
#     q = (2·maxq·N + D) // (2·D)   (= floor(maxq·N/D + ½))
#
# Int64 headroom: 2·maxq·N = 20·maxq·tf·am; at 16-bit impacts, tf ≤ 10⁵
# and avgdl ≤ 10⁴ that is ~1.3·10¹⁶ < 2⁶³. The am pinning shifts w by
# <0.1% vs exact avgdl — irrelevant, since the quantizer itself defines
# the stored value; the error bound |w̃−w| ≤ (k1+1)/(2·maxq) is against
# w computed AT am/1000 (exact by construction).
# ---------------------------------------------------------------------------

#: the scoring model baked into impact stores (quantized impacts bind the
#: index to its scoring function — the standard deployment tradeoff)
IMPACT_K1 = 1.2
IMPACT_B = 0.75


def avgdl_milli(n_docs: int, total_len: int) -> int:
    """avgdl in integer milli-tokens: floor(1000·total/n + ½), exact."""
    if n_docs <= 0:
        raise ValueError("avgdl_milli needs n_docs > 0")
    return (2000 * total_len + n_docs) // (2 * n_docs)


def quantize_impacts(tfs, dls, n_docs: int, total_len: int,
                     bits: int = 8):
    """numpy int64 quantized impacts for posting arrays (the converter's
    kernel). Exact integer arithmetic — see the module comment."""
    import numpy as np

    if not 2 <= bits <= 16:
        raise ValueError(f"impact bits must be in [2, 16]: {bits}")
    am = avgdl_milli(n_docs, total_len)
    maxq = (1 << bits) - 1
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    num = 10 * tfs * am
    den = num + 3 * am + 9000 * dls
    return (2 * maxq * num + den) // (2 * den)


def quantized_impact_col(n_docs: int, total_len: int,
                         bits: int = 8) -> Column:
    """The same quantizer as a pure-JVM integer column expression over
    (tf, dl) — the relational scoring path and the driver oracle gate
    both use it, so engine == converter == SQL bit-for-bit."""
    if not 2 <= bits <= 16:
        raise ValueError(f"impact bits must be in [2, 16]: {bits}")
    am = avgdl_milli(n_docs, total_len)
    maxq = (1 << bits) - 1
    # SQL ``div`` (true integral division) — a double ``/`` + floor
    # would lose exactness past 2^53 and flip boundary impacts
    num = f"(10L * CAST(tf AS BIGINT) * {am}L)"
    den = f"({num} + {3 * am}L + 9000L * CAST(dl AS BIGINT))"
    return F.expr(f"({2 * maxq}L * {num} + {den}) div (2L * {den})") \
        .alias("impact")


def impact_weight(n_docs: int, bits: int = 8) -> Column:
    """Per-(term,doc) serving weight of an impact store:
    idf·(k1+1)·impact/maxq over a frame with (impact, df) columns."""
    maxq = (1 << bits) - 1
    return (idf_bm25(n_docs) * (IMPACT_K1 + 1.0)
            * F.col("impact").cast("double") / F.lit(float(maxq))
            ).alias("weight")


def lm_doc_prior(mu: float, query_len: int, pitman_yor: bool = False,
                 g: float = 0.2) -> Column:
    """Doc-level additive prior (language_model.py:249-256).

    Dirichlet: len(q)·ln(µ/(dl+µ)).
    Pitman-Yor: len(q)·ln(1 − disc_dl/(dl+µ)), disc_dl = max(dl − g·dl^g, 0)
    — the discounted-length prior the reference applies for PYP; using
    the Dirichlet prior there is rank-changing (the delta grows with dl)."""
    dl = F.col("dl").cast("double")
    if pitman_yor:
        disc = F.greatest(dl - F.lit(g) * F.pow(dl, F.lit(g)), F.lit(0.0))
        p = F.log(F.lit(1.0) - disc / (dl + F.lit(mu)))
    else:
        p = F.log(F.lit(mu) / (dl + F.lit(mu)))
    return (F.lit(float(query_len)) * p).alias("prior")
