"""Pinned single-node oracle: faithful transcription of the reference
engine's *semantics* (not its code) with the determinism pins of
SURVEY.md §2.8.

The reference (timhuijsmans1/search_engine) computes everything in
driver-side dict loops; this oracle does the same, independently written,
so the Spark engine can be asserted rank-identical against it:

* index shape {term: [df, {doc: [pos…]}]} — index_build.py:26-38
* BM25 reference formula idf·tf/(k·(dl/avgdl)+tf+0.5), k=1.5
  (bm25_model.py:24,36-37) with PER-TERM idf (pin 2: the reference's
  last-term-idf bug is not reproduced)
* standard BM25(k1=1.2, b=0.75) — the north-star default
* VSM cosine (vsm_model.py:18-103), LM Dirichlet/Pitman-Yor
  (language_model.py:18-51,231-257; quirk 5: cf==df)
* adaptive AND→half-AND→OR candidates (bm25_model.py:241-253)
* phrase consecutive-occurrence counting (helpers.py:96-115)
* proximity #k(t1,t2) (proximity_retrieval.py:12-35)
* boolean set algebra with one paren level (boolean_retrieval.py:6-114)
* tie-break (score desc, doc_id asc) — pin 3

Analysis is imported from the engine package (same code object ⇒ the
byte-identity invariant holds by construction).
"""

from __future__ import annotations

import math

from search_engine_spark.functions.analyzer import AnalyzerConfig, analyze

ADAPTIVE_MIN = 100


def build_index(docs: dict[int, str], conf: AnalyzerConfig = AnalyzerConfig.full()):
    """docs {doc_id: text} → (index, doc_sizes).

    index: {term: [df, {doc_id: [1-based positions]}]}
    """
    index: dict[str, list] = {}
    doc_sizes: dict[int, int] = {}
    for doc_id in sorted(docs):
        tokens = analyze(docs[doc_id], conf)
        doc_sizes[doc_id] = len(tokens)
        seen: dict[str, list[int]] = {}
        for pos, term in enumerate(tokens):
            seen.setdefault(term, []).append(pos + 1)
        for term, positions in seen.items():
            entry = index.setdefault(term, [0, {}])
            entry[0] += 1
            entry[1][doc_id] = positions
    return index, doc_sizes


def _stats(doc_sizes):
    n = len(doc_sizes)
    total = sum(doc_sizes.values())
    return n, total, (total / n if n else 0.0)


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_weight_std(tf, dl, df, n, avgdl, k1=1.2, b=0.75):
    return idf(n, df) * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_weight_ref(tf, dl, df, n, avgdl, k=1.5):
    return idf(n, df) * tf / (k * (dl / avgdl) + tf + 0.5)


def adaptive_candidates(index, terms: list[str]) -> set[int] | None:
    """Reference Q5 escalation; None = no restriction (union tier)."""
    if len(terms) <= 1:
        return None
    postings = {t: set(index[t][1]) if t in index else set() for t in terms}
    inter = set.intersection(*postings.values()) if postings else set()
    if len(inter) >= ADAPTIVE_MIN:
        return inter
    half = len(terms) // 2
    h1, h2 = terms[:half], terms[half:]
    s1 = set.intersection(*(postings[t] for t in h1)) if h1 else set()
    s2 = set.intersection(*(postings[t] for t in h2)) if h2 else set()
    both = s1 | s2
    if len(both) >= ADAPTIVE_MIN:
        return both
    return None


def search_freetext(index, doc_sizes, query: str, k: int = 100, model: str = "bm25",
                    conf: AnalyzerConfig = AnalyzerConfig.full(),
                    adaptive: bool = False):
    """→ [(doc_id, score)] top-k, tie-break (score desc, doc_id asc)."""
    return search_freetext_tokens(index, doc_sizes, analyze(query, conf),
                                  k=k, model=model, adaptive=adaptive)


def search_freetext_tokens(index, doc_sizes, toks: list[str], k: int = 100,
                           model: str = "bm25", adaptive: bool = False):
    """Token-level path for callers holding ANALYZED tokens (execute's
    plan) — the reference preprocesses once (retrieval_execution.py:81-83)
    and its models consume tokens directly; re-analysis would double-stem
    (Porter is not idempotent: 'provision'→'provis'→'provi')."""
    if not toks:
        return []
    q_tf: dict[str, int] = {}
    for t in toks:
        q_tf[t] = q_tf.get(t, 0) + 1
    n, total, avgdl = _stats(doc_sizes)
    if model == "vsm":
        return search_vsm(index, doc_sizes, q_tf, k)
    cand = adaptive_candidates(index, list(q_tf)) if adaptive else None
    scores: dict[int, float] = {}
    for term, qtf in q_tf.items():
        if term not in index:
            continue
        df, postings = index[term]
        for doc_id, positions in postings.items():
            if cand is not None and doc_id not in cand:
                continue
            tf = len(positions)
            dl = doc_sizes[doc_id]
            if model == "bm25":
                w = bm25_weight_std(tf, dl, df, n, avgdl)
            elif model == "bm25-reference":
                w = bm25_weight_ref(tf, dl, df, n, avgdl)
            elif model == "lm-dirichlet":
                w = math.log((tf / 1089.0) * (total / df) + 1.0)
            elif model == "lm-pyp":
                disc = max(tf - 0.2 * tf ** 0.2, 0.0)
                w = math.log(disc * total / (1303.0 * df) + 1.0)
            else:
                raise ValueError(model)
            scores[doc_id] = scores.get(doc_id, 0.0) + qtf * w
    if model in ("lm-dirichlet", "lm-pyp"):
        mu = 1303.0 if model == "lm-pyp" else 1089.0
        qlen = len(toks)
        for doc_id in list(scores):
            dl = doc_sizes[doc_id]
            if model == "lm-pyp":
                # PYP discounted-length prior (language_model.py:249-251)
                disc_dl = max(dl - 0.2 * dl ** 0.2, 0.0)
                scores[doc_id] += qlen * math.log(1.0 - disc_dl / (dl + mu))
            else:
                scores[doc_id] += qlen * math.log(mu / (dl + mu))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def _vsm_w(tf: int, df: int, n: int) -> float:
    if df >= n:
        return 0.0
    return max((1.0 + math.log10(tf)) * math.log10((n - df) / df), 0.0)


def search_vsm(index, doc_sizes, q_tf: dict[str, int], k: int = 20):
    """Full VSM cosine (reference vsm_model.py:18-103): clamped doc
    weights, query weights (1+log10 tf_q)*log10(N/df), cosine over doc and
    query norms, top-20 cut, pinned tie-break."""
    n = len(doc_sizes)
    w_q = {}
    for t, tfq in q_tf.items():
        if t in index:
            df = index[t][0]
            w_q[t] = (1.0 + math.log10(tfq)) * math.log10(n / df)
    if not w_q:
        return []
    qnorm = math.sqrt(sum(v * v for v in w_q.values()))
    norms: dict[int, float] = {d: 0.0 for d in doc_sizes}
    for term, (df, postings) in index.items():
        for d, positions in postings.items():
            w = _vsm_w(len(positions), df, n)
            norms[d] += w * w
    dots: dict[int, float] = {}
    for t, wq in w_q.items():
        df, postings = index[t]
        for d, positions in postings.items():
            dots[d] = dots.get(d, 0.0) + _vsm_w(len(positions), df, n) * wq
    if qnorm == 0.0:
        return [(d, 0.0) for d in sorted(dots)][:k]
    scores = {
        d: (v / (math.sqrt(norms[d]) * qnorm) if norms[d] > 0 else 0.0)
        for d, v in dots.items()
    }
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def consecutive_occurrences(position_lists: list[list[int]]) -> int:
    """Count runs where phrase term i+1 appears at position p+1 after term i
    at p, across ALL phrase terms (reference helpers.py:96-115 semantics)."""
    if not position_lists or any(not pl for pl in position_lists):
        return 0
    count = 0
    for p0 in position_lists[0]:
        if all((p0 + i) in position_lists[i] for i in range(1, len(position_lists))):
            count += 1
    return count


def phrase_docs(index, phrase_terms: list[str]) -> dict[int, int]:
    """→ {doc_id: phrase_tf} for docs where the phrase occurs consecutively."""
    if any(t not in index for t in phrase_terms):
        return {}
    doc_sets = [set(index[t][1]) for t in phrase_terms]
    common = set.intersection(*doc_sets)
    out = {}
    for doc_id in common:
        plists = [index[t][1][doc_id] for t in phrase_terms]
        c = consecutive_occurrences(plists)
        if c > 0:
            out[doc_id] = c
    return out


def search_phrase(index, doc_sizes, phrase_terms: list[str], k: int = 100,
                  model: str = "bm25"):
    """Phrase-only ranking over phrase tf/df: the LM models use the
    language-model phrase weight ln((tf/µ)·(L_c/df)+1), no doc prior
    (language_model.py:53-63,259-270; µ pinned to the model constant —
    see operators/scoring.lm_phrase_weight); all other models use the
    BM25-like phrase weight (bm25_model.py:44-55,316-324)."""
    occ = phrase_docs(index, phrase_terms)
    if not occ:
        return []
    n, total, avgdl = _stats(doc_sizes)
    df = len(occ)
    if model in ("lm-dirichlet", "lm-pyp"):
        mu = 1303.0 if model == "lm-pyp" else 1089.0
        scores = {
            d: math.log((tf / mu) * (total / df) + 1.0) for d, tf in occ.items()
        }
    else:
        scores = {
            d: bm25_weight_std(tf, doc_sizes[d], df, n, avgdl)
            for d, tf in occ.items()
        }
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def proximity_docs(index, t1: str, t2: str, k: int) -> list[int]:
    """#k(t1,t2): docs where any |p1-p2| <= k; doc-id order, unranked
    (proximity_retrieval.py:12-35)."""
    if t1 not in index or t2 not in index:
        return []
    p1s, p2s = index[t1][1], index[t2][1]
    out = []
    for doc_id in sorted(set(p1s) & set(p2s)):
        if any(abs(a - b) <= k for a in p1s[doc_id] for b in p2s[doc_id]):
            out.append(doc_id)
    return out


def boolean_eval(index, n_docs: int, clauses: list, operators: list[str]) -> set[int]:
    """Left-fold boolean evaluation. clauses: list of term-or-set;
    operators between them from {AND, OR, AND NOT, NOT}."""

    def docset(c):
        if isinstance(c, set):
            return c
        return set(index[c][1]) if c in index else set()

    universe = set(range(1, n_docs + 1))
    acc = docset(clauses[0])
    if operators and operators[0] == "NOT" and len(clauses) == 1:
        return universe - acc
    for op, clause in zip(operators, clauses[1:]):
        s = docset(clause)
        if op == "AND":
            acc &= s
        elif op == "OR":
            acc |= s
        elif op in ("AND NOT", "NOT"):
            acc -= s
        else:
            raise ValueError(op)
    return acc


def execute(index, doc_sizes, query: str, k: int = 100, model: str = "bm25",
            conf: AnalyzerConfig = AnalyzerConfig.full()):
    """Mirror of operators.executor.execute: classify & dispatch.

    Returns [(doc_id, score)] — score 0.0 for unranked kinds, ordered by
    doc_id for proximity/boolean-unranked, (score desc, doc_id asc)
    otherwise."""
    from search_engine_spark.plans import planner

    plan = planner.classify(query, conf)
    n, total, avgdl = _stats(doc_sizes)

    if isinstance(plan, planner.ProximityPlan):
        return [(d, 0.0) for d in proximity_docs(index, plan.t1, plan.t2, plan.k)]

    if isinstance(plan, planner.BooleanPlan):
        clause_sets = []
        for c in plan.clauses:
            if c.is_phrase and len(c.terms) > 1:
                clause_sets.append(set(phrase_docs(index, c.terms)))
            elif c.terms:
                s = set()
                for t in c.terms:
                    if t in index:
                        s |= set(index[t][1])
                clause_sets.append(s)
            else:
                clause_sets.append(set())
        operators = list(plan.operators)
        offset = 0
        for lo, hi in plan.paren_groups:
            lo -= offset
            hi -= offset
            acc = clause_sets[lo]
            for i in range(lo, hi):
                nxt = clause_sets[i + 1]
                op = operators[i]
                acc = acc & nxt if op == "AND" else acc | nxt if op == "OR" else acc - nxt
            clause_sets[lo: hi + 1] = [acc]
            del operators[lo:hi]
            offset += hi - lo
        acc = clause_sets[0]
        if plan.leading_not:
            acc = set(doc_sizes) - acc
        for op, nxt in zip(operators, clause_sets[1:]):
            acc = acc & nxt if op == "AND" else acc | nxt if op == "OR" else acc - nxt
        terms = [t for c in plan.clauses for t in c.terms]
        if terms:
            ranked = search_freetext_tokens(index, doc_sizes, terms,
                                            k=len(doc_sizes), model=model)
            ranked = [(d, s) for d, s in ranked if d in acc]
            if ranked:
                return ranked[:k]
        return [(d, 0.0) for d in sorted(acc)[:500]]

    # free text + phrases
    scores: dict[int, float] = {}
    if plan.terms:
        for d, s in search_freetext_tokens(index, doc_sizes, plan.terms,
                                           k=len(doc_sizes), model=model):
            scores[d] = scores.get(d, 0.0) + s
    for ph in plan.phrases:
        for d, s in search_phrase(index, doc_sizes, ph, k=len(doc_sizes),
                                  model=model):
            scores[d] = scores.get(d, 0.0) + s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
