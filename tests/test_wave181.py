"""Wave-181 invariants: the I-MR chart replays through the E2/D4
limits and fires on a fabricated level shift; weekday eta^2 replays
through the ANOVA decomposition with the no-cycle pin."""

from __future__ import annotations

from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _imr(vals):
    n = len(vals)
    mrs = [abs(vals[i] - vals[i - 1]) for i in range(1, n)]
    xbar = sum(vals) / n
    mrbar = sum(mrs) / len(mrs)
    ucl_x = round(xbar + 2.66 * mrbar, 6)
    lcl_x = round(xbar - 2.66 * mrbar, 6)
    ucl_mr = round(3.267 * mrbar, 6)
    xv = sum(1 for v in vals if v > ucl_x or v < lcl_x)
    mv = sum(1 for m in mrs if m > ucl_mr)
    return xv, mv


def test_imr_matches_replay(spark):
    cents = defaultdict(int)
    for r in t(spark, SF, "orders").collect():
        d = (
            int(r["o_orderdate"].timestamp() * 1_000_000)
            // 86_400_000_000
        )
        cents[d] += round(r["o_totalprice"] * 100)
    vals = [cents[d] for d in sorted(cents)]
    xv, mv = _imr(vals)
    got = qstats.Q["stat_imr_chart"](spark, SF).collect()[0]
    assert got["n_days"] == len(vals)
    assert (got["x_violations"], got["mr_violations"]) == (xv, mv)
    rate = round((xv + mv) / len(vals), 6)
    assert abs(got["violation_rate"] - rate) <= 1e-9
    # a 3-sigma chart expects nonzero alarms on a long heavy-tailed
    # series (see stat_dagostino); the health gate is the 5% band
    assert got["rate_ok"] is True
    # fabricated level shift fires the chart
    shifted = vals[:-1] + [vals[-1] * 5]
    sxv, smv = _imr(shifted)
    assert sxv + smv > 0


def test_weekday_eta_matches_replay(spark):
    daily = defaultdict(int)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        daily[us // 86_400_000_000] += round(r["value"] * 100)
    groups = defaultdict(list)
    for d, c in daily.items():
        groups[(d + 4) % 7].append(c)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    q = sum(float(c) * c for v in groups.values() for c in v)
    sb = sum(float(sum(v)) * sum(v) / len(v) for v in groups.values())
    sst = q - float(s) * s / n
    ssb = sb - float(s) * s / n
    eta = ssb / sst
    got = qstats.Q["events_weekday_eta"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert abs(got["eta_sq"] - round(eta, 6)) <= 1e-9
    assert 0.0 <= got["eta_sq"] < 0.3  # no weekly cycle
    assert got["weekday_weak"] is True
