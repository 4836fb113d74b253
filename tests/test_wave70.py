"""Wave-70 invariants: nth_value against a sorted-timeline replay
(including the <3-events NULL), the one-pass corr matrix against a
moments replay, circular statistics against a quantized unit-vector
replay (plus the midnight-wraparound property), and the NOT IN trap
certificate (vacuous zero vs the real complement)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qml, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_nth_value_matches_timeline_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("user_id IS NOT NULL AND ts IS NOT NULL")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    want = {}
    for u, evs in per_user.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        third = evs[2][2] if len(evs) >= 3 else None
        want[(u, third)] = len(evs)
    got = {
        (r["user_id"], r["third_type"]): r["n_events"]
        for r in qstats.Q["win_nth_value"](spark, SF).collect()
    }
    assert got == want


def test_corr_matrix_matches_moments(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL AND ts IS NOT NULL")
        .select(
            F.round(F.col("value") * 100).cast("long").alias("a"),
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000 % 24"
            ).alias("b"),
            (F.col("event_id") % 97).alias("c"),
        )
        .collect()
    )

    def corr(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    a = [r["a"] for r in rows]
    b = [r["b"] for r in rows]
    c = [r["c"] for r in rows]
    got = qml.Q["stat_corr_matrix"](spark, SF).collect()[0]
    assert got["n"] == len(rows)
    assert abs(got["corr_ab"] - round(corr(a, b), 6)) < 1e-5
    assert abs(got["corr_ac"] - round(corr(a, c), 6)) < 1e-5
    assert abs(got["corr_bc"] - round(corr(b, c), 6)) < 1e-5
    # id residue is independent by construction
    assert abs(got["corr_ac"]) < 0.1 and abs(got["corr_bc"]) < 0.1


def test_circular_matches_unit_vector_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL")
        .select(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) % 86400000000"
            ).alias("day_us"),
        )
        .collect()
    )
    per_type: dict[str, list] = {}
    factor = 2 * math.pi / 86400000000.0
    for r in rows:
        th = r["day_us"] * factor
        per_type.setdefault(r["event_type"], []).append(
            (_rnd_away(1e6 * math.cos(th)), _rnd_away(1e6 * math.sin(th)))
        )
    got = {
        r["event_type"]: (r["n"], r["resultant"], r["mean_hour"])
        for r in qml.Q["stat_circular"](spark, SF).collect()
    }
    assert set(got) == set(per_type)
    for et, vs in per_type.items():
        sc = sum(v[0] for v in vs)
        ss = sum(v[1] for v in vs)
        n = len(vs)
        r_want = round(math.sqrt(sc * sc * 1.0 + ss * ss * 1.0) / 1e6 / n, 6)
        h_want = round(
            (math.atan2(ss * 1.0, sc * 1.0) / (2 * math.pi) * 24 + 24)
            % 24,
            6,
        )
        g = got[et]
        assert g[0] == n
        assert abs(g[1] - r_want) < 1e-9
        assert abs(g[2] - h_want) < 1e-6
        assert 0.0 <= g[1] <= 1.0 and 0.0 <= g[2] < 24.0


def test_not_in_trap_certificate(spark):
    got = qadv.Q["sql_not_in_nulls"](spark, SF).collect()[0]
    # the trap: NOT IN over a list containing NULL is vacuously empty
    assert got["n_not_in"] == 0
    # the real complement agrees between NOT EXISTS and filtered NOT IN
    assert got["n_not_exists"] == got["n_not_in_filtered"]
    assert 0 < got["n_not_exists"] < got["n_users"]
    # brute replay
    rows = t(spark, SF, "events").select(
        "event_id", "user_id", "event_type"
    ).collect()
    buyers = {
        r["user_id"]
        for r in rows
        if r["event_type"] == "purchase"
        and r["user_id"] is not None
        and r["user_id"] % 7 == 0
        and r["event_id"] % 50 != 0
    }
    users = {r["user_id"] for r in rows if r["user_id"] is not None}
    assert got["n_users"] == len(users)
    assert got["n_not_exists"] == len(users - buyers)
