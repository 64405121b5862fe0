"""Driver-orchestrated MaxScore top-k kernel (Turtle & Flood 1995) —
the other classical dynamic-pruning family, next to Block-Max WAND
(operators.wand).

Where WAND's unit of work is the block RANGE (skip a doc range iff the
sum of every term's block upper bound is below the heap threshold θ),
MaxScore's is the TERM: sort the query terms by score upper bound and
call a term "non-essential" when the upper bounds of it and every
smaller term sum to < θ — a document containing ONLY non-essential
terms can never enter the top-k, so non-essential posting blocks are
never decoded wholesale. They are probed only for candidates that
already scored on an essential term, and each candidate is abandoned
the moment its partial score plus the remaining non-essential bound
falls below θ.

This kernel layers MaxScore ON TOP of the block-range structure the
segment store provides (segments.py: doc-partitioned blocks with
per-block max-tf metadata), so it keeps WAND's range skip as the
degenerate case (every term non-essential ⇒ total bound < θ ⇒ skip the
range without decoding) and adds the per-term decode savings inside
surviving ranges. For head-term-heavy queries ("the data") WAND decodes
every term's block in a surviving range; MaxScore decodes the selective
terms' blocks and touches the head term's bytes only for live
candidates — at web scale, where the head term's blocks dominate the
range's byte volume, that is the difference that matters.

Exactness: every skip is against the CURRENT θ, which only grows, and
every bound argument is a strict ``< θ`` — ties at the threshold are
still decoded, so results are bit-identical to the relational BM25 path
and to search_wand (pinned by the ``maxscore_bm25_identity`` driver
gate and the fuzzed three-way identity in tests/test_maxscore.py).

Reference parity: the reference engine has a single query loop
(query_processing.py); WAND and MaxScore are this repo's two serving
kernels over the same durable segments, selectable per query.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import numpy as np

from .. import codec
from ..functions.analyzer import analyze_query
from . import segments as SEG
from .wand import WAND_AUTO_CAP, wand_eligible


def search_maxscore(index, query: str, k: int = 100,
                    k1: float = 1.2, b: float = 0.75,
                    max_blocks_per_term: int | None | str = "auto",
                    prior=None, prior_lam: float = 0.3,
                    prior_id_col: str = "node", prior_col: str = "rank",
                    stats: dict | None = None) -> list[tuple[int, float]]:
    """BM25 top-k over a SegmentIndex via block-max MaxScore.

    Same contract as wand.search_wand: [(doc_id, score)] driver-side,
    free-text only (phrase/boolean/proximity refused — the analyzer
    would silently degrade them), tombstoned deletes masked, the
    impact-ordered ``max_blocks_per_term`` cap bounds driver transfer
    ("auto" = wand.WAND_AUTO_CAP; capped terms make results a documented
    safe approximation exactly as in WAND — dropped blocks only LOWER
    scores). Shares the mini-index LRU with WAND, so alternating kernels
    on one query launches no extra Spark jobs.

    ``stats`` (optional dict) receives ``n_blocks_total``,
    ``n_blocks_decoded`` and ``n_ranges_skipped`` — the pruning
    telemetry the kernel-comparison bench and tests read (counters are
    for the LAST heap pass when prior blending deepens iteratively).

    ``prior`` blends a static document prior exactly as in search_wand
    (same iterative-deepening wrapper, wand._blend_prior_topk, so the
    two kernels cannot drift).
    """
    if not hasattr(index, "mini_index"):
        raise TypeError(
            "search_maxscore needs a SegmentIndex (durable block-encoded "
            "index); use operators.search.search_freetext for in-memory "
            "indexes")
    from ..plans import planner

    plan = planner.classify(query, index.analyzer)
    if not wand_eligible(plan):
        raise ValueError(
            "search_maxscore is a bag-of-words BM25 kernel: phrase, "
            "boolean and proximity queries have no MaxScore semantics "
            "here — use operators.executor.execute (the relational path)")
    toks = analyze_query(query, index.analyzer)
    if not toks or k <= 0:
        return []
    q_tf: dict[str, int] = {}
    for t in toks:
        q_tf[t] = q_tf.get(t, 0) + 1
    terms = list(q_tf)

    n = index.stats["n_docs"]
    avgdl = index.stats["avgdl"]
    # quantized-impact stores: same branch as search_wand — score from
    # the stored impact, bound from the block's max impact (exact for
    # the quantized scores), scoring model baked at quantize time
    impact_store = getattr(index, "store", "tf") == "impact"
    impact_scale = 0.0
    if impact_store:
        baked = (index.meta["impact_k1"], index.meta["impact_b"])
        if (k1, b) != baked:
            raise ValueError(
                f"impact store bakes its scoring model at quantize time "
                f"(k1={baked[0]}, b={baked[1]}) — requested ({k1}, {b}); "
                "re-quantize from the source index to change the model")
        impact_scale = (k1 + 1.0) / ((1 << index.meta["impact_bits"]) - 1)
    deleted = (index.deleted_ids() if hasattr(index, "deleted_ids")
               else frozenset())
    del_arr = (np.fromiter(deleted, dtype=np.int64, count=len(deleted))
               if deleted else None)
    cap = (WAND_AUTO_CAP if max_blocks_per_term == "auto"
           else max_blocks_per_term)
    mini = index.mini_index(terms, cap=cap)
    dfs = {t: df for t, (df, _) in mini.items()}
    if not dfs:
        return []
    idf = {
        t: float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        for t, df in dfs.items()
    }

    by_range: dict[int, list] = defaultdict(list)
    n_blocks = 0
    for _, (_, blks) in mini.items():
        for blk in blks:
            by_range[blk.block_id].append(blk)
            n_blocks += 1

    def bm25_topk(capacity: int) -> list[tuple[int, float]]:
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
        if stats is not None:
            stats["n_blocks_total"] = n_blocks
            stats["n_blocks_decoded"] = 0
            stats["n_ranges_skipped"] = 0

        def threshold() -> float:
            return heap[0][0] if len(heap) >= capacity else float("-inf")

        def decode(blk):
            """Decoded (docs, tfs, per-term bm25 weights) with deletes
            masked; None when every posting in the block is tombstoned."""
            if impact_store:
                docs, q = codec.decode_block_impact(bytes(blk.payload))
                if del_arr is not None:
                    live = ~np.isin(docs, del_arr)
                    if not live.all():
                        docs, q = docs[live], q[live]
                        if not len(docs):
                            return None
                if stats is not None:
                    stats["n_blocks_decoded"] += 1
                w = (q_tf[blk.term] * idf[blk.term] * impact_scale
                     * q.astype(np.float64))
                return docs, w
            docs, tfs, dls = codec.decode_block_full(bytes(blk.payload))
            if dls is None:
                raise ValueError(
                    "segment payloads carry no per-doc lengths (dl): MaxScore "
                    "needs self-contained blocks — build the index from "
                    "postings that include dl (the durable build does)")
            if del_arr is not None:
                live = ~np.isin(docs, del_arr)
                if not live.all():
                    docs, tfs, dls = docs[live], tfs[live], dls[live]
                    if not len(docs):
                        return None
            if stats is not None:
                stats["n_blocks_decoded"] += 1
            tfs_f = tfs.astype(np.float64)
            norm = k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl)
            w = (q_tf[blk.term] * idf[blk.term] * tfs_f * (k1 + 1.0)
                 / (tfs_f + norm))
            return docs, w

        for block_id in sorted(by_range):
            grp = by_range[block_id]
            theta = threshold()
            # Range-local upper bounds (tighter than global term bounds:
            # they use THIS range's block_max_tf), ascending — the MaxScore
            # ordering. ubs[i] = (ub, blk).
            if impact_store:
                ubs = sorted(
                    ((q_tf[blk.term] * idf[blk.term] * impact_scale
                      * blk.block_max_tf, blk) for blk in grp),
                    key=lambda x: x[0])
            else:
                ubs = sorted(
                    ((q_tf[blk.term]
                      * SEG.bm25_upper_bound(dfs[blk.term], n,
                                             blk.block_max_tf, k1, b), blk)
                     for blk in grp),
                    key=lambda x: x[0])
            total_ub = sum(u for u, _ in ubs)
            if len(heap) >= capacity and total_ub < theta:
                # WAND's range skip, recovered as the all-non-essential case
                if stats is not None:
                    stats["n_ranges_skipped"] += 1
                continue
            # Largest prefix (ascending ub) with cumulative bound < θ is
            # non-essential: a doc scoring ONLY there stays strictly under
            # θ and can never displace the heap minimum.
            cum = 0.0
            split = 0
            if len(heap) >= capacity:
                for u, _ in ubs:
                    if cum + u < theta:
                        cum += u
                        split += 1
                    else:
                        break
            non_essential = ubs[:split]
            essential = ubs[split:]

            acc: dict[int, float] = defaultdict(float)
            for _, blk in essential:
                dec = decode(blk)
                if dec is None:
                    continue
                docs, w = dec
                for d, s in zip(docs.tolist(), w.tolist()):
                    acc[d] += s
            # Probe non-essential blocks in DESCENDING bound order, dropping
            # candidates as the remaining bound shrinks. remaining[i] =
            # cumulative ub of the still-unprobed non-essential blocks.
            if acc and non_essential:
                rem = cum  # Σ non-essential bounds, shrinks as we probe
                for u, blk in reversed(non_essential):
                    theta = threshold()
                    alive = {d: s for d, s in acc.items()
                             if not (len(heap) >= capacity and s + rem < theta)}
                    if not alive:
                        acc = alive
                        break
                    acc = alive
                    dec = decode(blk)
                    if dec is not None:
                        docs, w = dec
                        for d, s in zip(docs.tolist(), w.tolist()):
                            if d in acc:
                                acc[d] += s
                    rem -= u
            # Final candidate filter: partial scores whose term set was
            # fully probed are exact; anything still below θ simply fails
            # the heap test naturally.
            for d, s in acc.items():
                item = (s, -d)
                if len(heap) < capacity:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)

        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        return [(-nd, s) for s, nd in out]

    if prior is None:
        return bm25_topk(k)
    from .wand import _blend_prior_topk

    return _blend_prior_topk(index, bm25_topk, k, prior, prior_lam,
                             prior_id_col, prior_col)
