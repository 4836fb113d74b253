"""Wave-130 invariants: the VdW statistic matches a pure-Python
replay of the doubled-rank + Acklam + micros machinery; the Acklam
approximation agrees with Python's exact inverse normal to < 1e-8
across the p-range the face evaluates; the null-true fixture keeps
T in the chi2_{k-1} bulk."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from statistics import NormalDist

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _acklam(p: float) -> float:
    a = (-39.69683028665376, 220.9460984245205, -275.9285104469687,
         138.357751867269, -30.66479806614716, 2.506628277459239)
    b = (-54.47609879822406, 161.5858368580409, -155.6989798598866,
         66.80131188771972, -13.28068155288572)
    c = (-0.007784894002430293, -0.3223964580411365,
         -2.400758277161838, -2.549732539343734, 4.374664141464968,
         2.938163982698783)
    d = (0.007784695709041462, 0.3224671290700398, 2.445134137142996,
         3.754408661907416)

    def tail(q):
        num = ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
        den = (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        return num / den

    if p < 0.02425:
        return tail(math.sqrt(-2.0 * math.log(p)))
    if p > 0.97575:
        return -tail(math.sqrt(-2.0 * math.log(1.0 - p)))
    q = p - 0.5
    r = q * q
    num = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q
    den = ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    return num / den


def test_acklam_accuracy():
    nd = NormalDist()
    for p in (0.001, 0.01, 0.02425, 0.1, 0.3, 0.5, 0.7, 0.9,
              0.97575, 0.99, 0.999):
        assert abs(_acklam(p) - nd.inv_cdf(p)) < 1e-8


def test_vdw_matches_replay(spark):
    vals = []
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None:
            vals.append((r["event_type"], round(r["value"] * 100)))
    n = len(vals)
    cnt = Counter(c for _, c in vals)
    start, first = {}, 1
    for u in sorted(cnt):
        start[u] = first
        first += cnt[u]
    dr = {u: 2 * start[u] + cnt[u] - 1 for u in cnt}
    sa = defaultdict(int)
    nj = defaultdict(int)
    ssq = 0
    for et, c in vals:
        am = _rnd(1e6 * _acklam(dr[c] / (2.0 * (n + 1))))
        sa[et] += am
        nj[et] += 1
        ssq += am * am
    got = qstats.Q["stat_van_der_waerden"](spark, SF).collect()[0]
    assert (got["n"], got["k"], got["ssq_mic2"]) == (n, len(nj), ssq)
    wsum = sum(s * s / nj[et] for et, s in sa.items())
    tstat = (n - 1.0) * wsum / ssq
    assert abs(got["t_stat"] - round(tstat, 6)) <= 1e-9
    # null-true fixture: T ~ chi2_{k-1}; P(chi2_4 > 30) ~ 5e-6
    assert 0 < got["t_stat"] < 30
