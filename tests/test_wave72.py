"""Wave-72 invariants: stickiness against a set replay (DAU <= MAU
by containment), percentile_disc vs cont (disc is a member of the
data, the two differ somewhere), seasonal strength against a full
detrend/deseasonalize replay, and the FILTER clause against CASE-fold
replays (including NULL-on-empty)."""

from __future__ import annotations

import math
from datetime import timedelta

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qml, qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_stickiness_matches_set_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND user_id IS NOT NULL")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    days: dict = {}
    for r in rows:
        days.setdefault(r["day"], set()).add(r["user_id"])
    got = {
        r["day"]: (r["dau"], r["mau28"], r["stickiness"])
        for r in qadv.Q["events_stickiness"](spark, SF).collect()
    }
    assert set(got) == {d.strftime("%Y-%m-%d") for d in days}
    for d, users in days.items():
        mau = set()
        for back in range(28):
            mau |= days.get(d - timedelta(days=back), set())
        g = got[d.strftime("%Y-%m-%d")]
        assert g[0] == len(users)
        assert g[1] == len(mau)
        assert abs(g[2] - round(len(users) / len(mau), 6)) < 1e-9
        assert g[0] <= g[1]  # DAU is contained in MAU


def test_percentile_disc_is_data_member_and_differs(spark):
    per_flag: dict[str, list] = {}
    for r in (
        t(spark, SF, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        per_flag.setdefault(r["l_returnflag"], []).append(
            _rnd_away(r["l_extendedprice"] * 100)
        )
    got = {
        r["l_returnflag"]: (
            r["n"],
            r["p50_disc_cents"],
            r["p50_cont_cents"],
            r["p90_disc_cents"],
        )
        for r in qrel.Q["agg_percentile_disc"](spark, SF).collect()
    }
    differs = False
    for flag, cents in per_flag.items():
        cents.sort()
        n = len(cents)
        g = got[flag]
        assert g[0] == n
        # disc(p): smallest value with cum fraction >= p
        disc50 = cents[math.ceil(0.5 * n) - 1]
        disc90 = cents[math.ceil(0.9 * n) - 1]
        assert g[1] == disc50 and g[1] in cents
        assert g[3] == disc90 and g[3] in cents
        h = (n - 1) * 0.5
        lo = math.floor(h)
        cont50 = cents[lo] + (h - lo) * (
            cents[min(lo + 1, n - 1)] - cents[lo]
        )
        assert abs(g[2] - round(cont50, 6)) < 1e-6
        differs |= abs(g[1] - g[2]) > 1e-9
    assert differs  # somewhere disc != cont, or the face proves nothing


def test_seasonal_strength_matches_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
            "value",
        )
        .collect()
    )
    daily: dict[int, int] = {}
    for r in rows:
        daily[r["day"]] = daily.get(r["day"], 0) + _rnd_away(
            r["value"] * 100
        )
    pts = sorted((d, c // 100) for d, c in daily.items())
    d7 = []
    for i in range(6, len(pts)):
        s7 = sum(v for _, v in pts[i - 6 : i + 1])
        d, v = pts[i]
        d7.append(((d + 3) % 7, 7 * v - s7))
    dm: dict[int, list] = {}
    for dow, d in d7:
        m = dm.setdefault(dow, [0, 0])
        m[0] += 1
        m[1] += d
    r_millis = [
        _rnd_away(1000.0 * (d - dm[dow][1] / dm[dow][0])) for dow, d in d7
    ]
    n = len(d7)
    s1 = sum(d for _, d in d7)
    s2 = sum(d * d for _, d in d7)
    rs1 = sum(r_millis)
    rs2 = sum(x * x for x in r_millis)
    want = max(
        0.0, 1 - (n * rs2 - rs1 * 1.0 * rs1) / 1e6 / (n * s2 - s1 * 1.0 * s1)
    )
    got = qml.Q["stat_seasonal_strength"](spark, SF).collect()[0]
    assert got["n"] == n
    assert abs(got["seasonal_strength"] - round(want, 6)) < 1e-9
    assert 0.0 <= got["seasonal_strength"] <= 1.0


def test_filter_clause_matches_case_folds(spark):
    rows = (
        t(spark, SF, "events")
        .select("event_type", "value", "user_id")
        .collect()
    )
    want: dict[str, list] = {}
    even_users: dict[str, set] = {}
    for r in rows:
        v = want.setdefault(r["event_type"], [0, 0, None])
        v[0] += 1
        if r["value"] is not None:
            v[1] += 1
            if r["value"] > 100:
                v[2] = (v[2] or 0) + _rnd_away(r["value"] * 100)
        if r["user_id"] is not None and r["user_id"] % 2 == 0:
            even_users.setdefault(r["event_type"], set()).add(r["user_id"])
    got = {
        r["event_type"]: (r["n"], r["n_valued"], r["big_cents"], r["n_even_users"])
        for r in qsql.Q["sql_filter_clause"](spark, SF).collect()
    }
    assert got == {
        et: (v[0], v[1], v[2], len(even_users.get(et, set())))
        for et, v in want.items()
    }
