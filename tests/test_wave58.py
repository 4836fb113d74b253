"""Wave-58 invariants: nearest-asof against a brute per-user
bidirectional argmin (including tolerance and the backward tie rule),
weighted median against an expanded-weights replay, dispersion index
against exact moments, and * EXCEPT column semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qml, qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"
DAY_US = 86400000000


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_asof_nearest_matches_brute_argmin(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND user_id IS NOT NULL")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .collect()
    )
    purchases: dict[int, list[int]] = {}
    clicks = []
    for r in rows:
        if r["event_type"] == "purchase":
            purchases.setdefault(r["user_id"], []).append(r["us"])
        elif r["event_type"] == "click":
            clicks.append(r)
    want = {}
    for r in clicks:
        cand = purchases.get(r["user_id"], [])
        best = None
        for p in cand:
            d = abs(r["us"] - p)
            # backward wins exact ties
            key = (d, 0 if p <= r["us"] else 1)
            if best is None or key < best[0]:
                best = (key, p)
        if best is None or best[0][0] > DAY_US:
            want[r["event_id"]] = (r["us"], None, None, None)
        else:
            p = best[1]
            want[r["event_id"]] = (
                r["us"],
                p,
                abs(r["us"] - p),
                "b" if p <= r["us"] else "f",
            )
    got = {
        r["event_id"]: (
            r["click_us"],
            r["purchase_us"],
            r["diff_us"],
            r["direction"],
        )
        for r in qrel.Q["join_asof_nearest"](spark, SF).collect()
    }
    assert got == want
    dirs = {v[3] for v in got.values()}
    assert "b" in dirs and "f" in dirs  # both directions exercised


def test_weighted_median_matches_expanded_replay(spark):
    rows = (
        t(spark, SF, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    per_flag: dict[str, list] = {}
    for r in rows:
        per_flag.setdefault(r["l_returnflag"], []).append(
            (_rnd_away(r["l_extendedprice"] * 100), _rnd_away(r["l_quantity"]))
        )
    want = {}
    for flag, pts in per_flag.items():
        pts.sort()
        tw = sum(w for _, w in pts)
        cw = 0
        med = None
        for c, w in pts:
            cw += w
            if 2 * cw >= tw:
                med = c
                break
        want[flag] = (med, tw)
    got = {
        r["flag"]: (r["wmedian_cents"], r["total_weight"])
        for r in qml.Q["stat_weighted_median"](spark, SF).collect()
    }
    assert got == want


def test_dispersion_matches_moment_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL")
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
        )
        .collect()
    )
    daily: dict[tuple, int] = {}
    for r in rows:
        daily[(r["event_type"], r["day"])] = (
            daily.get((r["event_type"], r["day"]), 0) + 1
        )
    per_type: dict[str, list[int]] = {}
    for (et, _), c in daily.items():
        per_type.setdefault(et, []).append(c)
    got = {
        r["event_type"]: r
        for r in qadv.Q["events_dispersion"](spark, SF).collect()
    }
    assert set(got) == set(per_type)
    for et, cs in per_type.items():
        n, s1, s2 = len(cs), sum(cs), sum(c * c for c in cs)
        g = got[et]
        assert g["n_days"] == n
        if n < 2:
            assert g["mean_c"] is None
            continue
        var = (n * s2 - s1 * s1) / (n * (n - 1.0))
        assert abs(g["mean_c"] - round(s1 / n, 6)) < 1e-9
        assert abs(g["var_c"] - round(var, 6)) < 1e-9
        assert abs(
            g["dispersion"] - round(var / (s1 / n), 6)
        ) < 1e-5
        assert g["overdispersed"] == (n * s2 - s1 * s1 > s1 * (n - 1))


def test_select_except_drops_exactly_the_named_columns(spark):
    df = qsql.Q["sql_select_except"](spark, SF)
    assert df.columns == [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "cents",
    ]
    rows = df.collect()
    assert len(rows) == 25
    keys = [r["o_orderkey"] for r in rows]
    want_keys = sorted(
        r["o_orderkey"] for r in t(spark, SF, "orders").collect()
    )[:25]
    assert keys == want_keys
