"""Wave-162 invariants: multiclass F1 replays from a dict grid with
the micro == accuracy identity; Cochrane-Orcutt replays all three
steps (rounded-OLS residuals, quantized rho, quasi-differenced
slope) with null-bulk pins on the trendless fixture."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qml, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _band(p: float) -> int:
    if p < 50000:
        return 1
    if p < 100000:
        return 2
    if p < 200000:
        return 3
    if p < 300000:
        return 4
    return 5


def test_multiclass_f1_matches_replay(spark):
    cells = Counter()
    for r in t(spark, SF, "orders").collect():
        cells[
            (int(r["o_orderpriority"][0]), _band(r["o_totalprice"]))
        ] += 1
    n = sum(cells.values())
    per = {}
    for k in range(1, 6):
        tp = cells.get((k, k), 0)
        pred = sum(c for (y, p), c in cells.items() if p == k)
        act = sum(c for (y, p), c in cells.items() if y == k)
        f1 = (
            round(2.0 * tp / (pred + act), 6)
            if pred + act > 0
            else None
        )
        per[k] = (tp, pred, act, f1)
    macro = round(
        sum((f or 0.0) for _, _, _, f in per.values()) / 5, 6
    )
    stp = sum(tp for tp, _, _, _ in per.values())
    micro = round(stp / n, 6)
    got = {
        r["cls"]: r
        for r in qml.Q["ml_multiclass_f1"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for k, (tp, pred, act, f1) in per.items():
        assert (got[k]["tp"], got[k]["pred"], got[k]["act"]) == (
            tp, pred, act,
        )
        if f1 is None:
            assert got[k]["f1"] is None
        else:
            assert abs(got[k]["f1"] - f1) <= 1e-9
        assert abs(got[k]["macro_f1"] - macro) <= 1e-9
        assert abs(got[k]["micro_f1"] - micro) <= 1e-9
    # single-label identity: micro F1 == accuracy
    assert micro == round(stp / n, 6)
    # independent raters: both averages near 1/k
    assert 0.05 < macro < 0.4 and 0.05 < micro < 0.4


def test_cochrane_orcutt_matches_replay(spark):
    cents = defaultdict(int)
    for r in t(spark, SF, "orders").collect():
        d = (
            int(r["o_orderdate"].timestamp() * 1_000_000)
            // 86_400_000_000
        )
        cents[d] += round(r["o_totalprice"] * 100)
    kd = [cents[d] // 100000 for d in sorted(cents)]
    n = len(kd)
    xs = list(range(n))
    sx, sy = sum(xs), sum(kd)
    sxy = sum(x * y for x, y in zip(xs, kd))
    sxx = sum(x * x for x in xs)
    b1 = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    a1 = round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
    e = [round(1e6 * (y - a1 - b1 * x)) for x, y in zip(xs, kd)]
    s01 = sum(round(e[i] * e[i - 1] / 1e12) for i in range(1, n))
    s00 = sum(round(e[i - 1] * e[i - 1] / 1e12) for i in range(1, n))
    rho = round(s01 / s00, 6) if s00 else 0.0
    ys = [round(1e6 * (kd[i] - rho * kd[i - 1])) for i in range(1, n)]
    xq = [round(1e6 * (xs[i] - rho * xs[i - 1])) for i in range(1, n)]
    n2 = len(ys)
    sxy_m = sum(round(a * b / 1e12 * 1e3) for a, b in zip(xq, ys))
    sxx_m = sum(round(a * a / 1e12 * 1e3) for a in xq)
    sxs, sys_ = sum(xq), sum(ys)
    b_co = round(
        (n2 * sxy_m * 1e9 - sxs * sys_) / (n2 * sxx_m * 1e9 - sxs * sxs),
        6,
    )
    got = qstats.Q["stat_cochrane_orcutt"](spark, SF).collect()[0]
    assert got["n"] == n
    assert abs(got["rho"] - rho) <= 1e-9
    assert abs(got["b_ols"] - b1) <= 1e-9
    assert abs(got["b_co"] - b_co) <= 1e-9
    # trendless fixture: slopes tiny, residual autocorr in null bulk
    assert abs(got["b_ols"]) < 1.0 and abs(got["b_co"]) < 1.0
    assert abs(got["rho"]) < 0.2
