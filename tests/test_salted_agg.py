"""Property: salted two-phase agg ≡ plain agg (SURVEY.md §5.2.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.operators.salted_agg import (
    salted_count,
    salted_sum,
)


def test_salted_count_equals_plain(spark, wiki_df):
    occ = wiki_df.select(F.explode("links").alias("l")).select(
        "l.surface_form", "l.uri"
    )
    plain = {
        (r.surface_form, r.uri): r.n
        for r in occ.groupBy("surface_form", "uri")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r.surface_form, r.uri): r.n
        for r in salted_count(
            occ, ["surface_form", "uri"], out="n", salt_n=16
        ).collect()
    }
    assert plain == salted


def test_salted_sum_equals_plain(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("v")
    )
    plain = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {
        r.k: r.s
        for r in salted_sum(df, ["k"], "v", out="s", salt_n=8).collect()
    }
    assert plain == salted


def test_skewed_key_still_correct(spark):
    """One key holds 50% of rows (FIXTURES.md §6 pages_skew analogue)."""
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k")
    )
    plain = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r.k: r.n for r in salted_count(df, ["k"], out="n").collect()}
    assert plain == salted
    assert salted["HOT"] == 5000
