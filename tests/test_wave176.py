"""Wave-176 invariants: Youden's J argmax replays through the exact
integer sweep (and J bounds hold); the influence census replays
through the quantized Cook's D ranking, endpoint days carry excess
leverage, and no day crosses the D > 1 alarm on the iid fixture."""

from __future__ import annotations

import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qml, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_youden_matches_sweep(spark):
    sup = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        c = sup[round(r["value"] * 100)]
        c[0] += 1
        if r["event_type"] == "purchase":
            c[1] += 1
    n = sum(c for c, _ in sup.values())
    np_ = sum(p for _, p in sup.values())
    nn = n - np_
    best = None
    tp = fp = 0
    for cents in sorted(sup, reverse=True):
        cnt, p = sup[cents]
        tp += p
        fp += cnt - p
        j_num = tp * nn - fp * np_
        key = (-j_num, cents)
        if best is None or key < best[0]:
            best = (key, cents, tp, fp, j_num)
    got = qml.Q["ml_youden_j"](spark, SF).collect()[0]
    assert (got["threshold"], got["tp"], got["fp"], got["j_num"]) == (
        best[1], best[2], best[3], best[4],
    )
    j = best[4] / (np_ * nn)
    assert abs(got["youden_j"] - round(j, 6)) <= 1e-9
    assert 0.0 <= got["youden_j"] <= 1.0


def test_influence_matches_replay(spark):
    cents = defaultdict(int)
    for r in t(spark, SF, "orders").collect():
        d = (
            int(r["o_orderdate"].timestamp() * 1_000_000)
            // 86_400_000_000
        )
        cents[d] += round(r["o_totalprice"] * 100)
    days = sorted(cents)
    kd = {d: cents[d] // 100000 for d in days}
    n = len(days)
    xs = {d: i for i, d in enumerate(days)}
    sx = sum(xs.values())
    sy = sum(kd.values())
    sxy = sum(xs[d] * kd[d] for d in days)
    sxx = sum(x * x for x in xs.values())
    b1 = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    a1 = round(
        (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6
    )
    e = {d: round(1e6 * (kd[d] - a1 - b1 * xs[d])) for d in days}
    sse = sum(round(ev * ev / 1e6) for ev in e.values())
    s2 = (sse / 1e6) / (n - 2)
    rows = []
    for d in days:
        h = 1.0 / n + (xs[d] - sx / n) ** 2 / (sxx - sx * sx / n)
        ed = e[d] / 1e6
        dmic = round(1e6 * (ed * ed * h / (2.0 * s2 * (1 - h) ** 2)))
        rows.append((-dmic, d, e[d], round(h, 6), dmic))
    rows.sort()
    want = [
        (d, em, lev, dm, round(dm / 1e6, 6))
        for _, d, em, lev, dm in rows[:5]
    ]
    got = [
        (
            r["day"], r["e_mic"], r["leverage"], r["cookd_mic"],
            r["cook_d"],
        )
        for r in qstats.Q["stat_influence"](spark, SF).collect()
    ]
    assert got == want
    # endpoints carry excess leverage; iid fixture stays sub-alarm
    assert max(lev for _, _, lev, _, _ in got) > round(1.0 / n, 6)
    assert all(cd < 1.0 for _, _, _, _, cd in got)
