"""Text analysis chain (tokenize → fold → stopwords → stem) as vectorized UDFs.

Reference semantics (SURVEY.md §2.2, T1-T7):

* free-text tokenizer regex ``[¢£€\\w]+`` —
  /root/reference/indexing/index_builder/helpers.py:29 and
  /root/reference/search/retrieval/retrieval_helpers/preprocessing.py:65-74;
* boolean-term cleaner ``re.sub('[^a-zA-Z]+','')`` — preprocessing.py:127-130
  (a distinct analyzer: strips digits/non-ASCII; quirk 10 in SURVEY §2.8);
* case folding — helpers.py:37-43; stopword removal against the public
  Glasgow list (vendored from the semantics of englishST.txt) — helpers.py:10-13;
* Porter stemming — helpers.py:45-47 (vendored: functions/porter.py);
* HTML-entity unescape at extraction — index_build.py:154.

Everything runs inside pandas UDFs, NOT Spark SQL regex functions: Java
``\\w`` and Python ``\\w`` disagree on Unicode classes, and the input_hint
mandates byte-identical extracted text per url. Query-side analysis calls
the same plain-Python functions on the driver, so doc and query tokens are
produced by literally the same code object.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass
from importlib import resources

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from . import porter

# Python-`re` semantics on purpose (byte-identity with the reference).
_TOKEN_RE = re.compile(r"[¢£€\w]+")
_BOOL_CLEAN_RE = re.compile(r"[^a-zA-Z]+")


def load_stopwords() -> frozenset[str]:
    """The 571-word Glasgow stopword list (public; same semantics as the
    reference's englishST.txt)."""
    txt = (
        resources.files("search_engine_spark.functions")
        .joinpath("stopwords_glasgow.txt")
        .read_text(encoding="utf-8")
    )
    return frozenset(w.strip() for w in txt.splitlines() if w.strip())


_STOPWORDS = load_stopwords()


@dataclass(frozen=True)
class AnalyzerConfig:
    """Pipeline switches. ``simple()`` keeps only tokenize+lower so the
    chain stays expressible in ANSI SQL for the DuckDB oracle; ``full()``
    is the reference chain (stopwords + Porter)."""

    lowercase: bool = True
    remove_stopwords: bool = True
    stem: bool = True

    @staticmethod
    def full() -> "AnalyzerConfig":
        return AnalyzerConfig()

    @staticmethod
    def simple() -> "AnalyzerConfig":
        return AnalyzerConfig(remove_stopwords=False, stem=False)


def tokenize(text: str) -> list[str]:
    """Free-text tokenizer (reference helpers.py:29)."""
    return _TOKEN_RE.findall(text)


def clean_boolean_term(term: str) -> str:
    """Boolean-term cleaner (reference preprocessing.py:127-130)."""
    return _BOOL_CLEAN_RE.sub("", term)


def analyze(text: str, conf: AnalyzerConfig = AnalyzerConfig.full()) -> list[str]:
    """tokenize → fold → stopwords → stem; the order matches the reference
    pipeline at indexing/index_builder/helpers.py:49-58."""
    toks = _TOKEN_RE.findall(text)
    if conf.lowercase:
        toks = [t.lower() for t in toks]
    if conf.remove_stopwords:
        toks = [t for t in toks if t not in _STOPWORDS]
    if conf.stem:
        toks = [porter.stem(t) for t in toks]
    return toks


def analyze_query(query: str, conf: AnalyzerConfig = AnalyzerConfig.full()) -> list[str]:
    """Driver-side query analysis — same code path as documents."""
    return analyze(query, conf)


def extract_text(html_bytes: bytes) -> str:
    """html binary → text string, byte-identical per url (input_hint
    invariant). Mirrors the reference's title+' '+body + html.unescape at
    index_build.py:144,154 for the synthetic corpus layout produced by
    sources/corpus.py: <html><head><title>T</title></head><body>B</body></html>.
    """
    s = html_bytes.decode("utf-8")
    tstart = s.index("<title>") + 7
    tend = s.index("</title>", tstart)
    bstart = s.index("<body>", tend) + 6
    bend = s.rindex("</body>")
    return _html.unescape(s[tstart:tend] + " " + s[bstart:bend])


# --------------------------------------------------------------------------
# pandas UDF factories (built lazily so importing this module never needs an
# active SparkSession; configs are captured in the closure — cheap, immutable)
# --------------------------------------------------------------------------

def make_analyze_udf(conf: AnalyzerConfig = AnalyzerConfig.full()):
    """pandas UDF: text:string -> tokens:array<string> (Arrow-batched)."""

    @F.pandas_udf(ArrayType(StringType()))
    def analyze_udf(text: pd.Series) -> pd.Series:
        return text.map(lambda t: analyze(t, conf) if t is not None else [])

    return analyze_udf


def make_extract_text_udf():
    """pandas UDF: html:binary -> text:string (byte-identical extraction)."""

    @F.pandas_udf(StringType())
    def extract_udf(html_col: pd.Series) -> pd.Series:
        return html_col.map(lambda b: extract_text(b) if b is not None else None)

    return extract_udf


def tokens_column(df, text_col: str = "text", conf: AnalyzerConfig = AnalyzerConfig.full(),
                  out_col: str = "tokens"):
    """Attach an analyzed-tokens column; the single projection shared by
    index build (A1), doc-length stats (A2) and text-analysis ops."""
    return df.withColumn(out_col, make_analyze_udf(conf)(F.col(text_col)))
