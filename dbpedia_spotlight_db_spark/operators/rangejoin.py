"""Time-range (interval) join — a custom operator Spark lacks as a
first-class join type.

Problem shape: pair every left row with the right rows whose timestamp
falls in a sliding window ``[l_ts - window, l_ts)`` — with NO equi key
at all (the hard case: a raw theta-join is |L| x |R| and Spark plans it
as BroadcastNestedLoopJoin/Cartesian, which collapses at corpus scale).

Spark-first shape — BUCKETED candidate generation: quantize the time
axis into epochs of exactly ``window`` seconds. A right row lands in
one bucket; a left row's window spans AT MOST two consecutive buckets
(window == bucket width), so the left side explodes to exactly 2
candidate buckets and the join becomes a plain shuffle EQUI-join on
the bucket id + a residual range filter. Cost: 2|L| + |R| shuffled
rows and only per-bucket fan-out — the same partition-friendly shape
at 10^12 events, with time itself as the (uniformly distributed)
join key. Each right row occupies exactly one bucket, so no pair is
produced twice and no distinct is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_sec: int,
) -> DataFrame:
    """Inner-join pairs (left row, right row) with
    ``right_ts in [left_ts - window_sec, left_ts)``.

    Both inputs keep all their columns (names must not collide except
    the ts columns, which stay distinct by name). The bucket column is
    internal and dropped.
    """
    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))
    # left window spans buckets floor((l-W)/W) .. floor(l/W) — at most
    # 2 distinct values; sequence() handles the boundary case where
    # they coincide (l exactly on a bucket edge) without a distinct
    l2 = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor((l_epoch - F.lit(window_sec)) / F.lit(window_sec)),
                F.floor(l_epoch / F.lit(window_sec)),
            )
        ),
    )
    r2 = right.withColumn("_bucket", F.floor(r_epoch / F.lit(window_sec)))
    # bucket ids come from second-truncated epochs; the residual
    # filter compares the FULL-precision timestamps, and with integer
    # W the truncated bucket range still covers every true match
    # (floor(L - W) == floor(L) - W), so truncation cannot drop pairs
    cond = (
        (l2["_bucket"] == r2["_bucket"])
        & (
            r2[right_ts]
            >= l2[left_ts] - F.expr(f"INTERVAL {window_sec} SECOND")
        )
        & (r2[right_ts] < l2[left_ts])
    )
    return l2.join(r2, cond, "inner").drop("_bucket")
