"""Salted, skew-aware aggregation (SURVEY.md §4.2.1; north_rule:
"partitioning / shuffle / skew handled explicitly").

Surface-form and entity counts over web text are Zipfian — at 10^12
documents the head keys ("the", celebrity entities) would hot-spot a
single reducer. The classic fix is a two-phase aggregation:

    phase 1: groupBy(keys + salt)  — spreads each hot key over
             ``salt_n`` reducers (plus Spark's own map-side partial
             aggregation on top)
    phase 2: groupBy(keys)         — combines the per-salt partials;
             input is at most |keys| * salt_n rows, trivially balanced

The salt is derived from row identity (partition id + ordinal), so it
is uniform regardless of key distribution. Result is provably equal to
the plain aggregation — the property test in tests/test_salted.py and
the ``agg_salted`` oracle entry assert it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT = "_salt"


def _with_salt(df: DataFrame, salt_n: int) -> DataFrame:
    return df.withColumn(
        SALT,
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salt_n),
        ),
    )


def salted_count(
    df: DataFrame,
    keys: list[str],
    out: str = "count",
    salt_n: int = 32,
    repartition_on_keys: bool = True,
) -> DataFrame:
    """Skew-proof ``df.groupBy(keys).count()``.

    ``repartition_on_keys`` inserts an explicit hash repartitioning on
    the key columns before the final combine (north_star: "explicit
    repartitioning on surface-form hash") so the final stage's
    partitioning is reusable by downstream key-joins without another
    exchange.
    """
    partial = (
        _with_salt(df, salt_n)
        .groupBy(*keys, SALT)
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    if repartition_on_keys:
        partial = partial.repartition(*[F.col(k) for k in keys])
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(out))


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    out: str = "sum",
    salt_n: int = 32,
) -> DataFrame:
    """Skew-proof ``groupBy(keys).sum(value_col)``."""
    partial = (
        _with_salt(df, salt_n)
        .groupBy(*keys, SALT)
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out))
