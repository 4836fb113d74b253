"""Wave-91 invariants: the session-variable cutoff splits the data
both ways; the native moment certificates are earned (native values
really sit within 1e-6 of exact); the tolerance as-of join both keeps
and drops matches, equal to a brute-force replay."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qml, qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_sql_variables_cutoff_splits(spark):
    row = qsql.Q["sql_variables"](spark, SF).collect()[0]
    cents = [
        _rnd_away(r["o_totalprice"] * 100)
        for r in t(spark, SF, "orders").select("o_totalprice").collect()
    ]
    tot, cnt = sum(cents), len(cents)
    cut = (3 * (tot // cnt)) // 2
    above = [c for c in cents if c > cut]
    assert row["tot_cents"] == tot
    assert row["cutoff_cents"] == cut
    assert row["n_above"] == len(above)
    assert row["above_cents"] == sum(above)
    assert 0 < len(above) < cnt  # the degenerate-cutoff lesson


def test_native_moments_certified_and_exact(spark):
    xs = [
        _rnd_away(r["value"] * 100) // 100
        for r in t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("value")
        .collect()
    ]
    n = len(xs)
    s1 = sum(xs)
    s2 = sum(x * x for x in xs)
    s3 = sum(x**3 for x in xs)
    s4 = sum(x**4 for x in xs)
    m2 = (float(n) * s2 - float(s1) * s1) / (float(n) * n)
    m3 = (
        float(n) * n * s3 - 3.0 * n * float(s1) * s2
        + 2.0 * float(s1) * s1 * s1
    ) / (float(n) * n * n)
    m4 = (
        float(n) * n * n * s4
        - 4.0 * float(n) * n * s1 * s3
        + 6.0 * float(n) * s1 * s1 * s2
        - 3.0 * float(s1) * s1 * s1 * s1
    ) / (float(n) * n * n * n)
    got = qml.Q["agg_native_moments"](spark, SF).collect()[0]
    assert (got["n"], got["s1"]) == (n, s1)
    assert abs(got["mean"] - round(s1 / n, 6)) < 1e-9
    assert abs(got["var_samp"] - round(m2 * n / (n - 1.0), 6)) < 1e-9
    assert abs(got["skew"] - round(m3 / m2**1.5, 6)) < 1e-9
    assert abs(got["kurt"] - round(m4 / (m2 * m2) - 3.0, 6)) < 1e-9
    assert got["ok_var"] and got["ok_skew"] and got["ok_kurt"]


def test_asof_tolerance_matches_bruteforce(spark):
    ev = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL")
        .select("event_id", "user_id", "event_type",
                F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"))
        .collect()
    )
    clicks: dict[int, list[tuple[int, int]]] = {}
    for r in ev:
        if r["event_type"] == "click":
            clicks.setdefault(r["user_id"], []).append(
                (r["us"], r["event_id"])
            )
    exp = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        cand = [
            (us, eid)
            for us, eid in clicks.get(r["user_id"], [])
            if us <= r["us"]
        ]
        if cand:
            us, eid = max(cand)  # latest ts, then largest id
            gap = r["us"] - us
            if gap <= qrel._ASOF_TOL_US:
                exp[r["event_id"]] = (eid, gap)
            else:
                exp[r["event_id"]] = (None, None)
        else:
            exp[r["event_id"]] = (None, None)
    got = {
        r["event_id"]: (r["asof_click_id"], r["gap_us"])
        for r in qrel.Q["join_asof_tolerance"](spark, SF).collect()
    }
    assert got == exp
    matched = sum(1 for v in got.values() if v[0] is not None)
    dropped = sum(1 for v in got.values() if v[0] is None)
    assert matched > 0 and dropped > 0  # the tolerance actually bites
