"""Query classification + logical plan (the reference's driver-side planner).

Reference order (retrieval_execution.py:63-94, SURVEY §2.5 Q1): proximity
``#k(t1,t2)`` first, then boolean (AND/OR/NOT present), then phrase
(quotes present), else free text. Boolean queries support one level of
parentheses (boolean_retrieval.py:39-114); clauses may be terms or quoted
phrases.

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
    paren_group: tuple[int, int] | None = None  # clause-index range evaluated first


@dataclass
class FreeTextPlan:
    terms: list[str] = field(default_factory=list)       # analyzed single terms
    phrases: list[list[str]] = field(default_factory=list)  # analyzed phrase term lists


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


def _parse_freetext(query: str, conf: AnalyzerConfig) -> FreeTextPlan:
    plan = FreeTextPlan()
    rest = query
    for phrase in _PHRASE_RE.findall(query):
        toks = analyze(phrase, conf)
        if toks:
            plan.phrases.append(toks)
        rest = rest.replace(f'"{phrase}"', " ")
    plan.terms = analyze(rest, conf)
    return plan


def _analyze_bool_term(raw: str, conf: AnalyzerConfig) -> list[str]:
    """Boolean clause analysis: quoted → phrase analyzer; bare term → the
    boolean cleaner ([^a-zA-Z]+ strip, quirk 10) then lower+stem (stopwords
    are NOT removed from boolean operands in the reference flow)."""
    raw = raw.strip()
    pm = _PHRASE_RE.match(raw)
    if pm:
        return analyze(pm.group(1), conf)
    t = clean_boolean_term(raw).lower()
    return [stem(t) if conf.stem else t] if t else []


def _parse_boolean(query: str, conf: AnalyzerConfig) -> BooleanPlan:
    leading_not = False
    q = query.strip()
    if q.startswith("NOT "):
        leading_not = True
        q = q[4:]
    # one paren level: note which clause span was grouped, then strip parens
    paren = None
    pm = re.search(r"\(([^()]*)\)", q)
    if pm:
        before = q[: pm.start()]
        n_ops_before = len(_BOOL_OP_RE.findall(before))
        inner_ops = len(_BOOL_OP_RE.findall(pm.group(1)))
        paren = (n_ops_before, n_ops_before + inner_ops)
        q = q.replace("(", " ").replace(")", " ")
    parts = _BOOL_OP_RE.split(q)
    clauses, operators = [], []
    for i, part in enumerate(parts):
        if i % 2 == 0:
            raw = part.strip()
            terms = _analyze_bool_term(raw, conf)
            clauses.append(
                BooleanClause(terms, is_phrase=bool(_PHRASE_RE.match(raw)))
            )
        else:
            operators.append(part)
    return BooleanPlan(clauses, operators, leading_not, paren)
