from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cents(col_expr):
    """Exact integer cents from a monetary double — identical in both
    engines (single-value round has no accumulation error)."""
    from pyspark.sql import functions as F

    return F.round(col_expr * 100).cast("long")


SQL_CENTS = "CAST(round({x} * 100) AS BIGINT)"
