"""Wave-163 invariants: aligned-ranks Friedman replays through the
exact alignment + global doubled ranking (sum identity included),
the statistic sits in the chi2(k-1) null bulk; Neyman quotas sum to
the budget exactly and diverge from Hamilton on a heteroskedastic
battery."""

from __future__ import annotations

import datetime
import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qfeat, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_friedman_aligned_matches_replay(spark):
    daily = defaultdict(dict)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        dn = (r["ts"].date() - datetime.date(2024, 1, 1)).days
        daily[dn][r["event_type"]] = daily[dn].get(
            r["event_type"], 0
        ) + round(r["value"] * 100)
    types = sorted({ty for d in daily.values() for ty in d})
    k = len(types)
    panel = {
        dn: {ty: c // 100 for ty, c in d.items()}
        for dn, d in daily.items()
        if len(d) == k
    }
    n = len(panel)
    obs = []  # (aligned, day, type)
    for dn, d in panel.items():
        s = sum(d.values())
        for ty, v in d.items():
            obs.append((k * v - s, dn, ty))
    vals = sorted(a for a, _, _ in obs)
    first = {}
    cnt = Counter(vals)
    for i, v in enumerate(vals):
        if v not in first:
            first[v] = i + 1
    dr = {}
    rj = Counter()
    ri = Counter()
    tot = 0
    for a, dn, ty in obs:
        d = 2 * first[a] + cnt[a] - 1
        rj[ty] += d
        ri[dn] += d
        tot += d
    kn = k * n
    assert tot == kn * (kn + 1)  # doubled ranks sum identity
    srj2 = sum(v * v for v in rj.values())
    sri2 = sum(v * v for v in ri.values())
    num = 3 * k * (k - 1) * (srj2 - k * n * n * (kn + 1) ** 2)
    den = 2 * k * kn * (kn + 1) * (2 * kn + 1) - 3 * sri2
    got = qml.Q["stat_friedman_aligned"](spark, SF).collect()[0]
    assert (got["n_blocks"], got["k"], got["srj2"], got["sri2"]) == (
        n, k, srj2, sri2,
    )
    assert abs(got["t_aligned"] - round(num / den, 6)) <= 1e-9
    # no treatment effect in the fixture: chi2(k-1) null bulk
    assert 0 <= got["t_aligned"] < 30


def test_neyman_matches_replay_and_beats_hamilton(spark):
    strata = defaultdict(list)
    for r in t(spark, SF, "documents").collect():
        strata[r["lang"]].append(r["n_chars"])
    wm = {}
    for lang, xs in strata.items():
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        vn = n * s2 - s1 * s1
        if n < 2 or vn <= 0:
            wm[lang] = 0
        else:
            wm[lang] = round(1e6 * n * math.sqrt(vn / (n * (n - 1))))
    tot = sum(wm.values())
    base = {la: (200 * w) // tot for la, w in wm.items()}
    rem = {la: (200 * w) % tot for la, w in wm.items()}
    leftover = 200 - sum(base.values())
    order = sorted(wm, key=lambda la: (-rem[la], la))
    quota = dict(base)
    for la in order[:leftover]:
        quota[la] += 1
    got = {
        r["lang"]: r
        for r in qfeat.Q["sample_neyman"](spark, SF).collect()
    }
    assert {la: g["quota"] for la, g in got.items()} == quota
    assert sum(g["quota"] for g in got.values()) == 200
    for la, g in got.items():
        assert g["w_mic"] == wm[la]

    # fabricated battery: equal sizes, very different spreads ->
    # Neyman oversamples the heterogeneous stratum where Hamilton
    # would split 50/50
    fab = {"a": [100] * 50, "b": list(range(0, 5000, 100))}
    w_f = {}
    for la, xs in fab.items():
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        vn = n * s2 - s1 * s1
        w_f[la] = round(1e6 * n * math.sqrt(vn / (n * (n - 1))))
    assert w_f["a"] == 0 and w_f["b"] > 0  # all of the budget to b
