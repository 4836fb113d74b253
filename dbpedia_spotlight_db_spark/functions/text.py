"""Text extraction, tokenization, and text-analytics functions.

Reference parity (SURVEY.md §2.1-S6, §2.2-T2; canonical upstream loci
db/tokenize/LanguageIndependentTokenizer.scala and the preprocessing
spotters — UNVERIFIED-LOCALLY, see SURVEY.md §0):

- ``extract_text``: html -> plain text. The per-row invariant from
  BASELINE.json input_hint is *byte-identical extracted text per url*;
  the extractor takes the <body> payload, strips tags, and unescapes
  exactly ``&amp; &lt; &gt;`` with NO whitespace normalization
  (FIXTURES.md §1.1 closed loop).
- ``tokenize``: text -> array<struct<text,start>> with exact char
  offsets (the FSA spotter matches on token sequences, so offsets must
  round-trip to the original text).

All are Arrow-batched pandas UDFs: the regex work runs in C inside
pandas/`re`; there is no row-at-a-time Python UDF anywhere.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

_TAG_RE = re.compile(r"<[^>]*>")
_BODY_RE = re.compile(rb"<body[^>]*>(.*)</body>", re.DOTALL)
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

TOKEN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType(), False),
            T.StructField("start", T.IntegerType(), False),
        ]
    )
)


def _extract_one(html: bytes | None) -> str | None:
    if html is None:
        return None
    m = _BODY_RE.search(html)
    payload = m.group(1) if m else html
    s = _TAG_RE.sub("", payload.decode("utf-8", errors="replace"))
    # unescape exactly the three entities, innermost-last so '&amp;lt;'
    # decodes to '&lt;' not '<' (inverse of FIXTURES.md escape order)
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    return s


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """html:binary -> text:string, byte-identical per FIXTURES.md §1.1."""
    return html.map(_extract_one)


@pandas_udf(TOKEN_SCHEMA)
def tokenize(text: pd.Series) -> pd.Series:
    """text -> [(token, start_char)] via a language-independent word
    regex (reference: LanguageIndependentTokenizer). Offsets are exact
    char positions into the original text."""

    def _tok(s: str | None):
        if s is None:
            return []
        return [
            {"text": m.group(0), "start": m.start()} for m in _TOKEN_RE.finditer(s)
        ]

    return text.map(_tok)


# ---------------------------------------------------------------------------
# Text analytics for training-data pipelines (pure column expressions —
# JVM-side, whole-stage-codegen friendly; SQL-oracle checkable)
# ---------------------------------------------------------------------------

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def token_count_col(text_col):
    """Whitespace token count, fully JVM-side."""
    return F.size(F.split(F.trim(text_col), r"\s+"))


def quality_score_col(text_col):
    """Heuristic document quality in [0,1]: length signal, alpha ratio,
    stopword-presence signal. Pure column math (no UDF)."""
    n_chars = F.length(text_col)
    n_tokens = token_count_col(text_col)
    alpha_ratio = (
        F.length(F.regexp_replace(text_col, r"[^A-Za-z ]", "")) / F.greatest(n_chars, F.lit(1))
    )
    words = F.split(F.lower(text_col), r"\s+")
    stop_hits = F.size(
        F.array_intersect(words, F.array(*[F.lit(w) for w in STOPWORDS]))
    )
    stop_signal = F.least(stop_hits / F.lit(3.0), F.lit(1.0))
    len_signal = F.least(n_tokens / F.lit(50.0), F.lit(1.0))
    return (0.4 * len_signal + 0.4 * alpha_ratio + 0.2 * stop_signal).alias(
        "quality"
    )


def langid_ngram_col(text_col):
    """Cheap n-gram language-ID heuristic (marker-token voting), pure
    column expressions. Returns best-guess lang code string."""
    markers = {
        "en": ["the", "and", "of"],
        "fr": ["le", "la", "et"],
        "es": ["el", "los", "que"],
        "de": ["der", "und", "das"],
    }
    words = F.split(F.lower(text_col), r"\s+")
    scores = [
        (
            lang,
            F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in ws]))),
        )
        for lang, ws in markers.items()
    ]
    expr = F.lit("und")
    best = F.lit(-1)
    # deterministic argmax: iterate in fixed order, strict > keeps first
    for lang, sc in scores:
        expr = F.when(sc > best, F.lit(lang)).otherwise(expr)
        best = F.greatest(sc, best)
    # zero marker hits anywhere -> genuinely unknown, not 'en'
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def fingerprint_col(text_col):
    """Document fingerprint: md5 of the sorted distinct lowercase token
    set (a canonical 'bag fingerprint' — identical across engines)."""
    toks = F.array_sort(F.array_distinct(F.split(F.lower(text_col), r"\s+")))
    return F.md5(F.concat_ws(" ", toks))
