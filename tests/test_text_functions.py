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
