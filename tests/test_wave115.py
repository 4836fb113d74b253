"""Wave-115 invariants: two-sample AD equals the shared-grid integer
replay and lands near its null expectation E[A2] = 1 on the parity
split; ps resample('D') equals the per-day replay and the density
assumption the twin rides on actually holds; the MLlib scaler's
micros-certified group sums match a replay and center to ~0."""

from __future__ import annotations

import math
import statistics
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qml, qsql, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_anderson_darling_matches_grid_replay(spark):
    groups = defaultdict(Counter)
    for r in t(spark, SF, "lineitem").collect():
        groups[r["l_linenumber"] % 2][
            round(r["l_extendedprice"] * 100)
        ] += 1
    vals = sorted(set(groups[0]) | set(groups[1]))
    n0, n1 = sum(groups[0].values()), sum(groups[1].values())
    N = n0 + n1
    m0 = m1 = 0
    s0 = s1 = 0
    for v in vals:
        c0, c1 = groups[0].get(v, 0), groups[1].get(v, 0)
        m0 += c0
        m1 += c1
        bj, l = m0 + m1, c0 + c1
        if 0 < bj < N:
            d0 = n0 * bj - N * m0
            d1 = n1 * bj - N * m1
            s0 += _rnd(1e6 * l * float(d0) * d0 / (bj * 1.0 * (N - bj) * n0 * N))
            s1 += _rnd(1e6 * l * float(d1) * d1 / (bj * 1.0 * (N - bj) * n1 * N))
    got = qstats.Q["stat_anderson_darling"](spark, SF).collect()[0]
    assert (got["n0"], got["n1"], got["s0_mic"], got["s1_mic"]) == (
        n0, n1, s0, s1,
    )
    assert abs(got["a2"] - round((s0 + s1) / 1e6, 6)) <= 1e-9
    # H0 split: A2 should sit near its expectation k-1 = 1
    assert 0.0 < got["a2"] < 5.0


def test_ps_resample_daily_and_dense(spark):
    daily = defaultdict(int)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is not None and r["value"] is not None:
            daily[r["ts"].date().isoformat()] += round(r["value"] * 100)
    days = sorted(daily)
    import datetime

    d0 = datetime.date.fromisoformat(days[0])
    d1 = datetime.date.fromisoformat(days[-1])
    assert len(days) == (d1 - d0).days + 1, (
        "twin assumes a DENSE calendar — fixture violated it"
    )
    got = {
        r["day"]: r["cents"]
        for r in qsql.Q["ps_api_resample"](spark, SF).collect()
    }
    assert got == dict(daily)


def test_mllib_scaler_matches_replay_and_centers(spark):
    rows = [
        (r["event_type"], r["value"])
        for r in t(spark, SF, "events").collect()
        if r["value"] is not None
    ]
    xs = [v for _, v in rows]
    mu = statistics.fmean(xs)
    sd = statistics.stdev(xs)
    exp = defaultdict(lambda: [0, 0])
    for et, v in rows:
        exp[et][0] += 1
        exp[et][1] += _rnd(1e6 * (v - mu) / sd)
    got = {
        r["event_type"]: (r["n"], r["sum_zmic"])
        for r in qml.Q["mllib_scaler"](spark, SF).collect()
    }
    assert set(got) == set(exp)
    total = 0
    for et, (n, s) in got.items():
        assert n == exp[et][0]
        # MLlib treeAggregate vs fsum can differ by an ulp per row;
        # each row's micros value moves by at most 1 at a boundary
        assert abs(s - exp[et][1]) <= n
        total += s
    # mean-centering: the global micros sum is bounded by N/2 rounding
    assert abs(total) <= len(rows)
