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
            T.StructField("stem", T.StringType(), False),
            T.StructField("is_stop", T.BooleanType(), False),
        ]
    )
)


# ---------------------------------------------------------------------------
# T2 analysis chain: Porter stemmer + stopword flag (SURVEY.md §2.2 T2;
# reference lineage LanguageIndependentTokenizer + SnowballStemmer +
# stopword file from model.properties). From-scratch implementation of
# the classic Porter (1980) algorithm — public knowledge; no Snowball
# library exists in this container.
# ---------------------------------------------------------------------------

# Standard English stopword list (the linking analyzer's list — distinct
# from the 6-word STOPWORDS below, which is frozen into the text_quality
# oracle SQL twins).
LINKING_STOPWORDS = frozenset(
    """a an and are as at be but by for from has have he her his if in into
    is it its no not of on or she so that the their them then there these
    they this to was we were what when which who will with you your""".split()
)

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """Porter's m: number of VC sequences in the (prefix) word."""
    m = 0
    prev_vowel = False
    for i in range(len(w)):
        cons = _is_cons(w, i)
        if prev_vowel and cons:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_cvc(w: str) -> bool:
    """*o condition: ends cons-vowel-cons, final cons not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Classic Porter (1980) stemming algorithm, implemented from the
    published rule tables. Operates on lowercase words; words of
    length <= 2 are returned unchanged (per the original)."""
    w = word
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif (
                len(w) >= 2
                and w[-1] == w[-2]
                and _is_cons(w, len(w) - 1)
                and w[-1] not in "lsz"
            ):
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    continue
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if (
        len(w) >= 2
        and w[-1] == "l"
        and w[-2] == "l"
        and _measure(w) > 1
    ):
        w = w[:-1]

    return w


_STEM_CACHE: dict[str, str] = {}
# Zipfian vocabularies mean the head dominates lookups, so a bounded
# cache keeps a ~1.0 hit rate; the bound matters on long-lived workers
# streaming web text, where distinct tokens (ids, hashes, typos) grow
# without limit and an unbounded memo dict would leak.
_STEM_CACHE_MAX = 1 << 18


def _stem_cached(word: str) -> str:
    """Per-worker memoized stem — vocabulary tokens repeat heavily, so
    the amortized cost per token is a dict hit. Once the cache is full
    new tail tokens are stemmed without being inserted."""
    s = _STEM_CACHE.get(word)
    if s is None:
        s = porter_stem(word)
        if len(_STEM_CACHE) < _STEM_CACHE_MAX:
            _STEM_CACHE[word] = s
    return s


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
    """text -> [(token, start_char, stem, is_stop)] via a
    language-independent word regex (reference:
    LanguageIndependentTokenizer + SnowballStemmer + stopword list).
    Offsets are exact char positions into the original text; ``stem``
    and ``is_stop`` are computed on the lowercased token (the context/
    vocabulary analysis chain — surface matching for spotting keeps
    using ``text``)."""

    def _tok(s: str | None):
        if s is None:
            return []
        out = []
        for m in _TOKEN_RE.finditer(s):
            tok = m.group(0)
            low = tok.lower()
            out.append(
                {
                    "text": tok,
                    "start": m.start(),
                    "stem": _stem_cached(low),
                    "is_stop": low in LINKING_STOPWORDS,
                }
            )
        return out

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
