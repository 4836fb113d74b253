"""As-of join — a custom temporal operator Spark lacks natively.

For every left row, attach one value from the latest right row of the
same key with ``right.ts <= left.ts`` (NULL when no such row).

Spark-first shape: the SCALABLE union-scan form — tag both sides,
union them (right side carries only key/ts/value), ONE shuffle+sort
per key on (ts, side, value), and carry the last non-null right value
forward with ``last(ignorenulls)`` over an unbounded-preceding row
frame. This is O(sort) with zero join fan-out; the naive equi-join +
filter + row_number form materializes |left_per_key| x
|right_per_key| candidates per key and collapses at web scale. Ties
at equal ts resolve to the right side (<= semantics) and, among
equal-ts right rows, to the largest value (deterministic, matching
the unrolled-SQL oracle twin in queries/qrel.join_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    val: str,
    out: str,
) -> DataFrame:
    """left + one column ``out`` = latest right ``val`` per ``key``
    with right ``ts`` <= left ``ts`` (NULL when none)."""
    l_tag = left.withColumn("_is_r", F.lit(0))
    r_tag = right.select(
        F.col(key), F.col(ts), F.col(val).alias("_asof_src")
    ).withColumn("_is_r", F.lit(1))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(ts),
            F.desc("_is_r"),
            # deterministic among equal-ts right rows: largest value
            # is sorted last and wins the carry-forward; left rows
            # (null) only tie among themselves, where order is moot
            F.coalesce(F.col("_asof_src"), F.lit(-1)),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(out, F.last("_asof_src", ignorenulls=True).over(w))
        .filter(F.col("_is_r") == 0)
        .drop("_is_r", "_asof_src")
    )
