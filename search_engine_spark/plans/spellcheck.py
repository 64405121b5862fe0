"""Query spellcheck + finance-term guards (SURVEY §2.5 Q2-Q3; OFF by
default for rank-identity, exactly like the reference's rerun path skips
it — views.py:99-138 / helpers.py:237,269-270).

The reference uses pyspellchecker plus an NYSE symbol table
(helpers.py:235-270, :319-330) and a fin-abbreviation JSON
(helpers.py:297-303). Neither data file nor library is shipped here, so:

* correction candidates come from the INDEX VOCABULARY itself (edit
  distance ≤ 1-2 against term_stats, preferring higher df) — a pure
  driver-side pass over a broadcast dictionary, no external data;
* the ticker guard takes an explicit ``symbols`` set (never "correct" a
  known ticker) — callers supply their own table;
* abbreviation expansion takes an explicit ``abbreviations`` mapping and
  appends the expansion as a phrase, mirroring the reference's (dead-code)
  ``abv_bool`` branch.
"""

from __future__ import annotations


def _edits1(word: str, alphabet: str = "abcdefghijklmnopqrstuvwxyz") -> set[str]:
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = {L + R[1:] for L, R in splits if R}
    transposes = {L + R[1] + R[0] + R[2:] for L, R in splits if len(R) > 1}
    replaces = {L + c + R[1:] for L, R in splits if R for c in alphabet}
    inserts = {L + c + R for L, R in splits for c in alphabet}
    return deletes | transposes | replaces | inserts


class VocabularySpellchecker:
    """Edit-distance corrector over the index vocabulary.

    ``vocab`` maps term → df; the most-frequent candidate wins
    (ties: lexicographic — deterministic)."""

    def __init__(self, vocab: dict[str, int], max_distance: int = 2):
        self.vocab = vocab
        self.max_distance = max_distance

    @classmethod
    def from_index(cls, index, max_terms: int = 500_000) -> "VocabularySpellchecker":
        """Build from an InvertedIndex's term_stats (driver-side broadcast
        dictionary — the reference loads its whole spell dictionary at
        startup the same way)."""
        rows = index.term_stats.limit(max_terms).collect()
        return cls({r.term: r.df for r in rows})

    def correct(self, word: str) -> str:
        if word in self.vocab:
            return word
        # the index vocabulary holds STEMS: any surface form the analyzer
        # maps into vocabulary is already "correct" — rewriting 'germany'
        # to its stem 'germani' would be noise, not a correction
        from ..functions.porter import stem

        if stem(word) in self.vocab:
            return word
        best, best_df = None, -1
        cand1 = _edits1(word)
        for c in cand1:
            df = self.vocab.get(c, -1)
            if df > best_df or (df == best_df and best and c < best):
                if df >= 0:
                    best, best_df = c, df
        if best is None and self.max_distance >= 2:
            for c1 in cand1:
                for c in _edits1(c1):
                    df = self.vocab.get(c, -1)
                    if df > best_df or (df == best_df and best and c < best):
                        if df >= 0:
                            best, best_df = c, df
        return best if best is not None else word


def correct_query(query: str, checker: VocabularySpellchecker,
                  symbols: frozenset[str] = frozenset()) -> str:
    """Token-wise correction with the ticker guard: a term that is (or is
    contained in) a known symbol is never altered (reference
    helpers.py:243-252 semantics)."""
    import re as _re

    out = []
    for tok in query.split(" "):
        low = tok.lower()
        if not tok or low in symbols or any(low in s for s in symbols):
            out.append(tok)
            continue
        # correct only the alpha CORE and reattach surrounding
        # punctuation: '"germani' → '"germany' keeps the quote (phrase
        # structure survives re-classification) while 'merket,' still
        # gets corrected; tokens with interior non-alpha pass through
        m = _re.match(r'^(\W*)([A-Za-z]+)(\W*)$', tok)
        if m:
            pre, core, post = m.groups()
            out.append(pre + checker.correct(core.lower()) + post)
        else:
            out.append(tok)
    return " ".join(out)


def expand_abbreviations(query: str, abbreviations: dict[str, str]) -> str:
    """Append '"{expansion}"' for each known abbreviation in the query
    (reference helpers.py:297-303; dead code there, live feature here)."""
    extra = []
    for tok in query.split(" "):
        exp = abbreviations.get(tok.lower())
        if exp:
            extra.append(f'"{exp}"')
    return query if not extra else query + " " + " ".join(extra)
