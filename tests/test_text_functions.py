"""S6 byte-identical extraction + T2 tokenization offsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.functions.text import (
    _extract_one,
    extract_text,
    tokenize,
)
from dbpedia_spotlight_db_spark.fixtures import wrap_html


def test_extract_inverts_wrapper_unit():
    for text in [
        "hello world",
        "a < b & c > d",
        "tricky &amp; already-escaped",
        "",
        "unicode: héllo wörld 中文",
    ]:
        assert _extract_one(wrap_html(text)) == text


def test_extract_byte_identical_spark(spark, pages_df):
    """The per-row invariant from BASELINE.json input_hint."""
    bad = (
        pages_df.withColumn("etext", extract_text(F.col("html")))
        .filter(F.col("etext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_tokenize_offsets(spark, pages_df):
    rows = (
        pages_df.limit(20)
        .select("text", tokenize(F.col("text")).alias("toks"))
        .collect()
    )
    assert rows
    for r in rows:
        assert len(r.toks) > 0
        for t in r.toks:
            assert r.text[t.start : t.start + len(t.text)] == t.text


def test_porter_stemmer_canonical_pairs():
    """Full-algorithm outputs for the classic Porter (1980) examples
    (per-step illustrations from the paper continue through later
    steps: e.g. electrical -> electric (step 3) -> electr (step 4))."""
    from dbpedia_spotlight_db_spark.functions.text import porter_stem

    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "formative": "form", "formalize": "formal",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "adjustable": "adjust",
        "defensible": "defens", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun",
        "activate": "activ", "effective": "effect", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control",
        "roll": "roll", "the": "the", "is": "is",
    }
    bad = {
        w: (porter_stem(w), want)
        for w, want in cases.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_tokenize_stem_and_stopword_fields(spark):
    df = spark.createDataFrame(
        [("The engines are running quickly",)], ["text"]
    )
    toks = df.select(tokenize(F.col("text")).alias("t")).collect()[0].t
    got = [(t.text, t.stem, t.is_stop) for t in toks]
    assert got == [
        ("The", "the", True),
        ("engines", "engin", False),
        ("are", "ar", True),
        ("running", "run", False),
        ("quickly", "quickli", False),
    ]
