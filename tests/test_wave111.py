"""Wave-111 invariants: the log-rank statistic equals an exact
Python replay of the hypergeometric accumulation (and the fixture is
non-degenerate — both groups present, events observed), and RMST
equals the step-function KM integral replay, bounded by the horizon."""

from __future__ import annotations

import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"

HOUR_US = 3_600_000_000
CENSOR_US = 43_200_000_000


def _rnd(x: float) -> int:
    # Spark F.round / DuckDB round are half-up; replicate for the
    # nonnegative quantized terms (Python round() is half-to-even).
    return math.floor(x + 0.5)


def _spans(spark, with_grp: bool):
    spans = {}
    for r in t(spark, SF, "events").collect():
        uid = r["user_id"]
        if with_grp and uid is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        lo, hi = spans.get(uid, (us, us))
        spans[uid] = (min(lo, us), max(hi, us))
    mx = max(hi for _, hi in spans.values())
    out = []
    for uid, (lo, hi) in spans.items():
        dur = (hi - lo) // HOUR_US
        cen = 1 if mx - hi < CENSOR_US else 0
        if with_grp:
            out.append((uid % 2, dur, cen))
        else:
            out.append((dur, cen))
    return out


def test_log_rank_matches_replay(spark):
    rows = _spans(spark, with_grp=True)
    sup = defaultdict(lambda: [0, 0])  # (grp,dur) -> [d, tot]
    for grp, dur, cen in rows:
        sup[(grp, dur)][0] += 1 - cen
        sup[(grp, dur)][1] += 1
    grps = sorted({g for g, _ in sup})
    durs = sorted({d for _, d in sup})
    assert len(grps) == 2, "fixture must produce both parity cohorts"
    # per-group suffix cumulative at-risk over the SHARED grid
    n_risk = {}
    for g in grps:
        run = 0
        for d in reversed(durs):
            run += sup.get((g, d), [0, 0])[1]
            n_risk[(g, d)] = run
    o1 = e1 = v = 0
    for d in durs:
        dt = sum(sup.get((g, d), [0, 0])[0] for g in grps)
        nt = sum(n_risk[(g, d)] for g in grps)
        if dt == 0 or nt == 0:
            continue
        d1 = sup.get((0, d), [0, 0])[0]
        n1 = n_risk[(0, d)]
        o1 += d1
        e1 += _rnd(1e6 * dt * n1 / nt)
        if nt > 1:
            v += _rnd(
                1e6 * dt * (nt - dt) * n1 * (nt - n1) / (nt * nt * (nt - 1))
            )
    got = qstats.Q["stat_log_rank"](spark, SF).collect()[0]
    assert (got["o1"], got["e1_mic"], got["v_mic"]) == (o1, e1, v)
    assert o1 > 0 and v > 0, "degenerate fixture (granger lesson)"
    chi2 = round((o1 - e1 / 1e6) ** 2 / (v / 1e6), 6)
    assert abs(got["chi2"] - chi2) <= 1e-9


def test_rmst_matches_km_integral(spark):
    rows = _spans(spark, with_grp=False)
    sup = defaultdict(lambda: [0, 0])  # dur -> [d, c]
    for dur, cen in rows:
        sup[dur][0] += 1 - cen
        sup[dur][1] += cen
    durs = sorted(sup)
    run = 0
    n_risk = {}
    for d in reversed(durs):
        run += sum(sup[d])
        n_risk[d] = run
    ev = [d for d in durs if sup[d][0] > 0]
    assert ev, "fixture must observe at least one event"
    msum = 0
    dead = False
    rmst = 1_000_000 * min(ev[0], 720)
    for i, d in enumerate(ev):
        dd, nr = sup[d][0], n_risk[d]
        if dd < nr:
            msum += _rnd(1e6 * math.log((nr - dd) / nr))
        else:
            dead = True
        nxt = ev[i + 1] if i + 1 < len(ev) else 1_000_000
        s = 0.0 if dead else 1e6 * math.exp(msum / 1e6)
        rmst += _rnd(s * max(0, min(nxt, 720) - min(d, 720)))
    got = qstats.Q["events_rmst"](spark, SF).collect()[0]
    assert got["tau_hr"] == 720
    assert got["rmst_micros"] == rmst
    assert 0 <= got["rmst_micros"] <= 720 * 1_000_000
