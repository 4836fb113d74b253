"""Wave-131 invariants: Fligner-Killeen matches the half-normal-
score replay (group medians by the discrete rule, shared Acklam);
Shapiro-Francia matches the order-statistic replay, is invariant to
intra-tie position assignment (proven by construction in the
replay), and is decisively below 1 on the skewed synthetic values — the
discriminative evidence."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tests.test_wave130 import _acklam

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_fligner_killeen_matches_replay(spark):
    vals = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None:
            vals[r["event_type"]].append(round(r["value"] * 100))
    zs = []
    for et, vs in vals.items():
        vs.sort()
        ng = len(vs)
        med = next(c for i, c in enumerate(vs, 1) if 2 * i >= ng)
        zs.extend((et, abs(c - med)) for c in vs)
    n = len(zs)
    cnt = Counter(z for _, z in zs)
    start, first = {}, 1
    for u in sorted(cnt):
        start[u] = first
        first += cnt[u]
    dr = {u: 2 * start[u] + cnt[u] - 1 for u in cnt}
    sa = defaultdict(int)
    nj = defaultdict(int)
    s = ssq = 0
    for et, z in zs:
        am = _rnd(1e6 * _acklam(0.5 + dr[z] / (4.0 * (n + 1))))
        sa[et] += am
        nj[et] += 1
        s += am
        ssq += am * am
    wsum = sum(v * v / nj[et] for et, v in sa.items())
    cb = ssq - s * s / n
    x2 = (n - 1.0) * (wsum - s * s / n) / cb
    got = qstats.Q["stat_fligner_killeen"](spark, SF).collect()[0]
    assert (got["n"], got["k"]) == (n, len(nj))
    assert abs(got["x2"] - round(x2, 6)) <= 1e-9
    assert 0 < got["x2"] < 30  # null-true fixture


def test_shapiro_francia_replay_and_uniform_plateau(spark):
    cs = sorted(
        round(r["value"] * 100)
        for r in t(spark, SF, "events").collect()
        if r["value"] is not None
    )
    n = len(cs)
    sx = sum(cs)
    sxx = sum(c * c for c in cs)
    sm = smm = sxm = 0
    for i, c in enumerate(cs, 1):
        m = _rnd(1e6 * _acklam(i / (n + 1.0)))
        sm += m
        smm += m * m
        sxm += c * m
    cov = n * sxm - sx * sm
    w = cov * cov / ((n * sxx - sx * sx) * (n * smm - sm * sm))
    got = qstats.Q["stat_shapiro_francia"](spark, SF).collect()[0]
    assert (got["n"], got["sxm"]) == (n, sxm)
    assert abs(got["w_prime"] - round(w, 6)) <= 1e-9
    # the skewed synthetic values are decisively non-normal
    assert 0.5 < got["w_prime"] < 0.95
