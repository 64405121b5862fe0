"""Query-time synonym expansion (Lucene/Solr SynonymGraphFilter, the
query-side half).

The reference's only term rewriting is spellcheck + the financial
abbreviation table (helpers.py:235-270, 297-303); synonyms are the
third standard rewrite a search engine's users expect ("laptop" should
match "notebook"). Index-time synonym injection changes df statistics
and makes the table un-updatable without a rebuild, so this engine
expands at QUERY time only — each synonym scores as an extra weighted
OR clause over the unchanged index, the Lucene SynonymQuery shape.

``load_synonyms`` reads the public Solr ``synonyms.txt`` format:

    # comment
    laptop, notebook, portable     ← equivalence group (bidirectional)
    car => automobile, vehicle     ← directed rule (LHS rewrites to RHS)

Terms are analyzed with the INDEX's analyzer at load time (a synonym
must land in index vocabulary space — Lucene applies the same analyzer
to the synonym stream), so 'running => sprint' maps stem-to-stem.
"""

from __future__ import annotations

from ..functions.analyzer import AnalyzerConfig, analyze


def _norm(term: str, conf: AnalyzerConfig) -> str | None:
    toks = analyze(term.strip(), conf)
    return toks[0] if toks else None


def parse_synonyms(lines, conf: AnalyzerConfig = AnalyzerConfig.full()
                   ) -> dict[str, list[str]]:
    """→ {analyzed term: [analyzed synonyms]} from Solr-format lines.
    Multi-word sides are refused (phrase synonyms need positional
    rewriting this engine reserves for the phrase operators); a term
    that analyzes to nothing (stopword/punctuation) is dropped from its
    rule. Self-mappings are dropped; duplicates dedupe keeping first."""
    table: dict[str, list[str]] = {}

    def add(src: str, dst: str) -> None:
        if src == dst:
            return
        lst = table.setdefault(src, [])
        if dst not in lst:
            lst.append(dst)

    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        for side in line.split("=>", 1) if "=>" in line else [line]:
            for t in side.split(","):
                if len(t.split()) > 1:
                    raise ValueError(
                        f"multi-word synonyms are not supported: {t.strip()!r}")
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            srcs = [_norm(t, conf) for t in lhs.split(",")]
            dsts = [_norm(t, conf) for t in rhs.split(",")]
            for s in srcs:
                for d in dsts:
                    if s and d:
                        add(s, d)
        else:
            group = [t for t in (_norm(t, conf) for t in line.split(","))
                     if t]
            for s in group:
                for d in group:
                    add(s, d)
    return table


def load_synonyms(path: str, conf: AnalyzerConfig = AnalyzerConfig.full()
                  ) -> dict[str, list[str]]:
    with open(path, encoding="utf-8") as f:
        return parse_synonyms(f, conf)
