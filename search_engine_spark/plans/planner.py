"""Query classification + logical plan (the reference's driver-side planner).

Reference order (retrieval_execution.py:63-94, SURVEY §2.5 Q1): proximity
``#k(t1,t2)`` first, then boolean (AND/OR/NOT present), then phrase
(quotes present), else free text. Boolean queries support one paren
LEVEL but MULTIPLE groups (boolean_retrieval.py:63-90 iterates a list of
parenthesised positions — "greggs AND (starbucks OR nandos) AND
(fifa OR pes)" is its own example); clauses may be terms or quoted
phrases.

Documented deviation: operator words INSIDE quoted phrases stay literal
phrase words here. The reference's token scan treats them as operators
(preprocessing.py:93-94 checks each whitespace token against the found
operator list even mid-phrase), which leaves a spurious operator that
misaligns every later clause/paren position — replicating that would
make multi-clause queries wrong whenever any phrase contains AND/OR/NOT.

This module is pure driver-side planning — the "logical plan" the engine
executes as DataFrame compositions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions.analyzer import AnalyzerConfig, analyze, clean_boolean_term
from ..functions.porter import stem

_PROX_RE = re.compile(r"^#(\d+)\s*\(\s*([^,]+?)\s*,\s*([^)]+?)\s*\)\s*$")
_BOOL_OP_RE = re.compile(r"\b(AND NOT|AND|OR|NOT)\b")
_PHRASE_RE = re.compile(r'"([^"]+)"')


@dataclass
class ProximityPlan:
    k: int
    t1: str
    t2: str


@dataclass
class BooleanClause:
    """Either a single term or a phrase (list of analyzed terms)."""
    terms: list[str]
    is_phrase: bool = False


@dataclass
class BooleanPlan:
    clauses: list[BooleanClause]
    operators: list[str]          # between clauses; may start with unary NOT
    leading_not: bool = False
    # clause-index ranges evaluated first, left to right (the reference's
    # positions_with_parentheses list — multiple groups, one level)
    paren_groups: list[tuple[int, int]] = field(default_factory=list)


@dataclass
class FreeTextPlan:
    terms: list[str] = field(default_factory=list)       # analyzed single terms
    phrases: list[list[str]] = field(default_factory=list)  # analyzed phrase term lists
    #: per-phrase slop parsed from '"..."~N' (Lucene sloppy-phrase
    #: syntax; ordered-window semantics — operators.phrase); aligned
    #: with ``phrases``, 0 = exact
    phrase_slops: list[int] = field(default_factory=list)
    # trailing-* tokens ('mark*'), star stripped: matched as vocabulary
    # PREFIXES (Lucene PrefixQuery). Lowercased per the analyzer config
    # but NEVER stemmed/stopworded — a prefix is a raw surface pattern
    # against the (stemmed) vocabulary, exactly Lucene's
    # no-analysis-of-wildcard-terms rule
    prefixes: list[str] = field(default_factory=list)
    #: general wildcard tokens ('te*t', 't?st', '*ing' — any '*'/'?'
    #: placement EXCEPT the pure trailing-star form, which routes to
    #: ``prefixes`` above for its cheaper pushdown). Same
    #: no-analysis-of-wildcards rule: lowercased, never stemmed
    #: (Lucene WildcardQuery; operators.search.search_patterns)
    wildcards: list[str] = field(default_factory=list)
    #: slash-delimited regexp tokens ('/gro.p/', Lucene RegexpQuery
    #: syntax), slashes stripped. Lowercased, never analyzed; pattern
    #: DIALECT validity (cross-engine subset, ≥1 literal) is the
    #: operator's contract (search.regexp_validate) — the planner only
    #: routes
    regexps: list[str] = field(default_factory=list)


def classify(query: str, conf: AnalyzerConfig = AnalyzerConfig.full()):
    """→ ProximityPlan | BooleanPlan | FreeTextPlan."""
    m = _PROX_RE.match(query.strip())
    if m:
        k = int(m.group(1))
        t1 = analyze(m.group(2), conf)
        t2 = analyze(m.group(3), conf)
        return ProximityPlan(k, t1[0] if t1 else "", t2[0] if t2 else "")
    if _BOOL_OP_RE.search(query):
        return _parse_boolean(query, conf)
    return _parse_freetext(query, conf)


_PREFIX_TOK_RE = re.compile(r"^([^\s*?]+)\*$")

#: any other token carrying a '*' or '?' (Lucene WildcardQuery syntax);
#: pattern validity (≥1 literal char) is the OPERATOR's contract —
#: the planner only routes
_WILDCARD_TOK_RE = re.compile(r"^(?=.*[*?])\S+$")


_SLOPPY_PHRASE_RE = re.compile(r'"([^"]+)"(?:~(\d+))?')

#: Lucene RegexpQuery token: /pattern/ (non-empty body, no spaces)
_REGEXP_TOK_RE = re.compile(r"^/([^/\s]+)/$")


def _parse_freetext(query: str, conf: AnalyzerConfig) -> FreeTextPlan:
    plan = FreeTextPlan()
    rest = query
    for m in _SLOPPY_PHRASE_RE.finditer(query):
        toks = analyze(m.group(1), conf)
        if toks:
            plan.phrases.append(toks)
            plan.phrase_slops.append(int(m.group(2) or 0))
        rest = rest.replace(m.group(0), " ")
    # wildcard tokens come out BEFORE analysis (the analyzer would
    # strip the metachars and stem the pattern): the pure trailing-star
    # form routes to the prefix path (pushdown-cheaper), every other
    # '*'/'?' placement to the general wildcard path
    kept = []
    for tok in rest.split():
        rm = _REGEXP_TOK_RE.match(tok)
        if rm:
            # regexp tokens FIRST: a pattern may contain '*'/'?', which
            # would otherwise mis-route it to the wildcard path
            p = rm.group(1)
            plan.regexps.append(p.lower() if conf.lowercase else p)
            continue
        m = _PREFIX_TOK_RE.match(tok)
        if m:
            p = m.group(1).lower() if conf.lowercase else m.group(1)
            plan.prefixes.append(p)
        elif _WILDCARD_TOK_RE.match(tok):
            plan.wildcards.append(tok.lower() if conf.lowercase else tok)
        else:
            kept.append(tok)
    plan.terms = analyze(" ".join(kept), conf)
    return plan


def _analyze_bool_term(raw: str, conf: AnalyzerConfig) -> list[str]:
    """Boolean clause analysis — quirk 10: BOTH clause forms use the
    boolean cleaner, never the free-text analyzer. Bare term → strip
    [^a-zA-Z]+, lower, stem. Quoted phrase → the SAME per-word cleaning
    (reference preprocessing.py:97-106 routes phrase words through
    clean_term), so stopwords are NOT removed from boolean phrase
    operands: '"state of the art"' keeps [state, of, the, art] — 'of'
    is absent from the stopword-stripped index, so the phrase matches
    nothing, exactly like the reference's mini-index miss."""
    raw = raw.strip()
    pm = _PHRASE_RE.match(raw)
    if pm:
        words = [clean_boolean_term(w).lower() for w in pm.group(1).split()]
        if conf.stem:
            words = [stem(w) for w in words if w]
        else:
            words = [w for w in words if w]
        return words
    t = clean_boolean_term(raw).lower()
    return [stem(t) if conf.stem else t] if t else []


def _parse_boolean(query: str, conf: AnalyzerConfig) -> BooleanPlan:
    leading_not = False
    q = query.strip()
    # mask quoted phrases so operator words and parens INSIDE quotes stay
    # literal (see module docstring: documented deviation from the
    # reference's mid-phrase operator scan)
    masked: list[str] = []

    def _mask(m):
        masked.append(m.group(1))
        return f'"\x00{len(masked) - 1}"'

    q = _PHRASE_RE.sub(_mask, q)

    def _unmask(s: str) -> str:
        return re.sub(r'"\x00(\d+)"',
                      lambda m: '"' + masked[int(m.group(1))] + '"', s)

    if q.startswith("NOT "):
        leading_not = True
        q = q[4:]
    # one paren LEVEL, multiple groups: record each group's operator-index
    # range (== clause-index range after splitting), then strip parens
    paren_groups: list[tuple[int, int]] = []
    for pm in re.finditer(r"\(([^()]*)\)", q):
        n_ops_before = len(_BOOL_OP_RE.findall(q[: pm.start()]))
        inner_ops = len(_BOOL_OP_RE.findall(pm.group(1)))
        if inner_ops:
            paren_groups.append((n_ops_before, n_ops_before + inner_ops))
    q = q.replace("(", " ").replace(")", " ")
    parts = _BOOL_OP_RE.split(q)
    clauses, operators = [], []
    for i, part in enumerate(parts):
        if i % 2 == 0:
            raw = _unmask(part).strip()
            terms = _analyze_bool_term(raw, conf)
            clauses.append(
                BooleanClause(terms, is_phrase=bool(_PHRASE_RE.match(raw)))
            )
        else:
            operators.append(part)
    return BooleanPlan(clauses, operators, leading_not, paren_groups)
