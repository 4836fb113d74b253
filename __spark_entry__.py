"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship KG-construction run (P0 store build ->
                     annotate -> canonicalize -> triples) over
                     /root/testdata/sf0.001.
``queries()``      — one callable per implemented operator
                     (SURVEY.md §2.6 + training-data ops).
``oracle_sql()``   — DuckDB twins with identical column names/values;
                     omitted only for genuinely non-SQL ops
                     (approx sketches, NumPy LSH, fake media decode).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from dbpedia_spotlight_db_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dbpedia_spotlight_db_spark.entrypoint import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
