"""Vendored pure-Python Porter stemmer (Porter, 1980 — public algorithm).

The reference engine stems with ``nltk.PorterStemmer`` at
/root/reference/indexing/index_builder/helpers.py:6,45-47 and
/root/reference/search/retrieval/retrieval_helpers/preprocessing.py:12,84-86.
nltk is not available in this environment, so this module implements the
original published algorithm (M.F. Porter, "An algorithm for suffix
stripping", Program 14(3), 1980) from its public specification, plus the
two behaviours the reference relies on implicitly:

* input is lowercased before stemming (NLTK lowercases inside ``stem``);
* words of length <= 2 are returned unchanged (standard revision).

Deviation note (documented per SURVEY.md §2.8): NLTK ships extra
"NLTK_EXTENSIONS" irregular-form tweaks; we pin the 1980 specification
instead. Engine and test oracle both import THIS module, so doc-side and
query-side analysis are byte-identical, which is the invariant that
rank-identity actually requires. Golden vectors in
tests/fixtures/porter_golden.json pin the behaviour.

Pure stdlib, no numpy — shipped to executors via --py-files and called
from vectorized pandas UDFs with an LRU memo (Zipf token distribution
makes the memo hit-rate very high).
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    """Consonant test per Porter: y is a consonant iff preceded by a vowel
    position (i.e. y after consonant acts as a vowel)."""
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V] — the number of vowel→consonant transitions."""
    m = 0
    prev_cons = True
    started = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if not cons:
            started = True
        elif started and not prev_cons:
            m += 1
        prev_cons = cons
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _apply_rule_list(word: str, rules) -> str:
    """Porter semantics: only the LONGEST matching suffix in a step is
    considered; if its condition fails the step is a no-op."""
    for suffix, replacement, condition in rules:
        if suffix == "*d":
            if _ends_double_cons(word):
                stem = word[:-2]
                if condition is None or condition(stem):
                    return stem + replacement
                return word
            continue
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def _step1a(word: str) -> str:
    return _apply_rule_list(
        word,
        [
            ("sses", "ss", None),
            ("ies", "i", None),
            ("ss", "ss", None),
            ("s", "", None),
        ],
    )


def _step1b(word: str) -> str:
    if word.endswith("eed"):
        stem = word[:-3]
        if _measure(stem) > 0:
            return stem + "ee"
        return word
    rule2or3 = False
    if word.endswith("ed"):
        stem = word[:-2]
        if _contains_vowel(stem):
            word, rule2or3 = stem, True
    elif word.endswith("ing"):
        stem = word[:-3]
        if _contains_vowel(stem):
            word, rule2or3 = stem, True
    if not rule2or3:
        return word
    if word.endswith(("at", "bl", "iz")):
        return word + "e"
    if _ends_double_cons(word) and word[-1] not in "lsz":
        return word[:-1]
    if _measure(word) == 1 and _ends_cvc(word):
        return word + "e"
    return word


def _step1c(word: str) -> str:
    if word.endswith("y") and _contains_vowel(word[:-1]):
        return word[:-1] + "i"
    return word


_M_GT0 = lambda stem: _measure(stem) > 0  # noqa: E731
_M_GT1 = lambda stem: _measure(stem) > 1  # noqa: E731

_STEP2_RULES = [
    ("ational", "ate", _M_GT0),
    ("tional", "tion", _M_GT0),
    ("enci", "ence", _M_GT0),
    ("anci", "ance", _M_GT0),
    ("izer", "ize", _M_GT0),
    ("abli", "able", _M_GT0),
    ("alli", "al", _M_GT0),
    ("entli", "ent", _M_GT0),
    ("eli", "e", _M_GT0),
    ("ousli", "ous", _M_GT0),
    ("ization", "ize", _M_GT0),
    ("ation", "ate", _M_GT0),
    ("ator", "ate", _M_GT0),
    ("alism", "al", _M_GT0),
    ("iveness", "ive", _M_GT0),
    ("fulness", "ful", _M_GT0),
    ("ousness", "ous", _M_GT0),
    ("aliti", "al", _M_GT0),
    ("iviti", "ive", _M_GT0),
    ("biliti", "ble", _M_GT0),
]

_STEP3_RULES = [
    ("icate", "ic", _M_GT0),
    ("ative", "", _M_GT0),
    ("alize", "al", _M_GT0),
    ("iciti", "ic", _M_GT0),
    ("ical", "ic", _M_GT0),
    ("ful", "", _M_GT0),
    ("ness", "", _M_GT0),
]

_STEP4_RULES = [
    ("al", "", _M_GT1),
    ("ance", "", _M_GT1),
    ("ence", "", _M_GT1),
    ("er", "", _M_GT1),
    ("ic", "", _M_GT1),
    ("able", "", _M_GT1),
    ("ible", "", _M_GT1),
    ("ant", "", _M_GT1),
    ("ement", "", _M_GT1),
    ("ment", "", _M_GT1),
    ("ent", "", _M_GT1),
    ("ion", "", lambda stem: _M_GT1(stem) and stem.endswith(("s", "t"))),
    ("ou", "", _M_GT1),
    ("ism", "", _M_GT1),
    ("ate", "", _M_GT1),
    ("iti", "", _M_GT1),
    ("ous", "", _M_GT1),
    ("ive", "", _M_GT1),
    ("ize", "", _M_GT1),
]


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return word


def _step5b(word: str) -> str:
    if _measure(word) > 1 and _ends_double_cons(word) and word.endswith("l"):
        return word[:-1]
    return word


@lru_cache(maxsize=1 << 18)
def stem(word: str) -> str:
    """Stem one token. Lowercases first (matching the reference, whose
    NLTK stemmer lowercases internally — SURVEY.md §2.2 T5)."""
    word = word.lower()
    if len(word) <= 2:
        return word
    word = _step1a(word)
    word = _step1b(word)
    word = _step1c(word)
    word = _apply_rule_list(word, _STEP2_RULES)
    word = _apply_rule_list(word, _STEP3_RULES)
    word = _apply_rule_list(word, _STEP4_RULES)
    word = _step5a(word)
    word = _step5b(word)
    return word
