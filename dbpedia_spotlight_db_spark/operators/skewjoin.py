"""Salted (skew-replicated) equi-join.

The skew problem: a shuffle equi-join hash-partitions BOTH sides on
the key, so a hot key (the boilerplate entity, the null-ish default,
the one viral page) lands its entire row population in ONE reduce
task — the classic last-task-runs-for-hours shape at corpus scale.
AQE's skew-join split handles the *sort-merge post-shuffle* case
adaptively; this operator is the EXPLICIT form (north_rule: "skew
handled explicitly") that also works where AQE cannot see the skew
(e.g. under a required distribution, or when the planner's stats
predate the hot key).

Shape: the BIG side gets a deterministic salt in [0, salt_n) derived
by hashing its non-key columns (xxhash64 — content-derived, so the
result is reproducible run-to-run, unlike rand()); the SMALL side is
replicated salt_n times with every salt value. The join key becomes
(key, salt): each hot key now spreads over salt_n reduce tasks, at
the cost of salt_n x |small| shuffled rows — the standard trade.
Result set is EXACTLY the plain join's (each big row matches the one
small replica carrying its salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_n: int = 8,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big.big_key == small.small_key`` with the big side
    salted over ``salt_n`` buckets. ``salt_cols`` picks the big-side
    columns hashed into the salt (default: every non-key column —
    pass an explicit subset when some columns are wide blobs).

    Supported ``how``: inner / left_outer semantics match the plain
    join (a left row's single salted replica either matches or
    null-extends exactly as the unsalted row would). Anything
    right/full-flavored is REJECTED: the small side is replicated
    salt_n times, so its unmatched rows would null-extend once per
    replica — silent row inflation, not an outer join.
    """
    assert how in ("inner", "left", "leftouter", "left_outer"), (
        f"salted_join supports inner/left_outer only, got {how!r}"
    )
    cols = salt_cols or [c for c in big.columns if c != big_key]
    if not cols:
        # degenerate single-column relation: salt by the key itself
        # (no skew relief, but still correct)
        cols = [big_key]
    salt: Column = F.pmod(
        F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_n)
    ).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(salt_n)]))
    )
    cond = (big_s[big_key] == small_s[small_key]) & (
        big_s["_salt"] == small_s["_salt"]
    )
    return big_s.join(small_s, cond, how).drop("_salt")
