"""Wave-143 invariants: the unit-root pair brackets the iid daily
fixture from both nulls (DF rejects a unit root, KPSS accepts level
stationarity), the DF closed form matches a NumPy OLS replay, and
the KPSS partial-sum machinery matches a pure-Python replay through
the exact quantization grids."""

from __future__ import annotations

import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _daily_kd(spark):
    cents = defaultdict(int)
    for r in t(spark, SF, "orders").collect():
        us = int(r["o_orderdate"].timestamp() * 1_000_000)
        cents[us // 86_400_000_000] += round(r["o_totalprice"] * 100)
    return {d: c // 100000 for d, c in cents.items()}


def test_df_matches_ols_replay(spark):
    kd = _daily_kd(spark)
    days = sorted(kd)
    pairs = [
        (kd[d - 1], kd[d] - kd[d - 1]) for d in days if d - 1 in kd
    ]
    n2 = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    syy = sum(y * y for _, y in pairs)
    a = n2 * sxy - sx * sy
    b = n2 * sxx - sx * sx
    c = n2 * syy - sy * sy
    got = qstats.Q["stat_df_unit_root"](spark, SF).collect()[0]
    assert (got["n_pairs"], got["a"], got["b"]) == (n2, a, b)
    assert abs(got["rho"] - round(a / b, 6)) <= 1e-9
    t_df = float(a) * math.sqrt(n2 - 2.0) / math.sqrt(float(c) * b - float(a) * a)
    assert abs(got["t_df"] - round(t_df, 6)) <= 1e-9
    # iid-by-day revenue mean-reverts hard: rho ~ -1, deep rejection
    assert got["rho"] < -0.8
    assert got["t_df"] < -10
    assert got["unit_root_rejected"] is True


def test_kpss_matches_replay(spark):
    kd = _daily_kd(spark)
    days = sorted(kd)
    n = len(days)
    tot = sum(kd.values())
    sp = 0
    q_num = q_den = 0
    for d in days:
        ep = n * kd[d] - tot
        sp += ep
        q_den += round((ep / 1000.0) * (ep / 1000.0))
        q_num += round((sp / 1000000.0) * (sp / 1000000.0))
    assert sp == 0  # partial sums of exact demeaned values telescope
    got = qstats.Q["stat_kpss"](spark, SF).collect()[0]
    assert (got["n_days"], got["q_num"], got["q_den"]) == (
        n, q_num, q_den,
    )
    eta = q_num * 1e6 / (n * q_den)
    assert abs(got["eta"] - round(eta, 6)) <= 1e-9
    # stationary fixture: eta far below the 1% critical value
    assert got["eta"] < 0.739
    assert got["level_stationary"] is True
