"""Wave-148 invariants: the sweep-line integral equals sum(durations)
as BIGINT equality (Little's law certificate), the queueing numbers
replay; Nelson-Aalen steps replay exactly, H is non-decreasing,
n_risk non-increasing, and H tracks -ln(KM survival)."""

from __future__ import annotations

import math

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _panel(spark):
    users = {}
    for r in t(spark, SF, "events").collect():
        if r["user_id"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        lo, hi = users.get(r["user_id"], (us, us))
        users[r["user_id"]] = (min(lo, us), max(hi, us))
    return users


def test_queueing_littles_law(spark):
    users = _panel(spark)
    n = len(users)
    t0 = min(lo for lo, _ in users.values())
    t1 = max(hi for _, hi in users.values())
    sum_dur = sum(hi - lo for lo, hi in users.values())
    got = qstats.Q["events_queueing"](spark, SF).collect()[0]
    assert (got["n_users"], got["span_us"], got["sum_dur_us"]) == (
        n, t1 - t0, sum_dur,
    )
    # the certificate: sweep integral == closed form, exactly
    assert got["integral_us"] == sum_dur
    assert got["littles_exact"] is True
    lam = n * 3.6e9 / (t1 - t0)
    w = sum_dur / n / 3.6e9
    assert abs(got["lambda_per_hour"] - round(lam, 6)) <= 1e-9
    assert abs(got["w_hours"] - round(w, 6)) <= 1e-9
    # L = lambda * W through the rounded outputs
    assert abs(got["l_avg"] - lam * w) < 1e-3


def test_hazard_matches_replay(spark):
    users = _panel(spark)
    gmax = max(hi for _, hi in users.values())
    panel = []
    for lo, hi in users.values():
        dur = (hi - lo) // 3_600_000_000
        ev = 0 if gmax - hi < 43_200_000_000 else 1
        panel.append((dur, ev))
    sup = {}
    for dur, ev in panel:
        d, tot = sup.get(dur, (0, 0))
        sup[dur] = (d + ev, tot + 1)
    rows = []
    ch = 0
    at_risk = len(panel)
    km = 1.0
    prev_tot = 0
    for dur in sorted(sup):
        d, tot = sup[dur]
        at_risk -= prev_tot
        prev_tot = tot
        if d > 0:
            h = round(1e6 * d / at_risk)
            ch += h
            km *= 1 - d / at_risk
            rows.append((dur, d, at_risk, h, ch, km))
    got = qstats.Q["events_hazard"](spark, SF).collect()
    assert [
        (r["dur"], r["d"], r["n_risk"], r["h_mic"], r["ch_mic"])
        for r in got
    ] == [r[:5] for r in rows]
    # monotonicity
    risks = [r["n_risk"] for r in got]
    assert risks == sorted(risks, reverse=True)
    chs = [r["ch_mic"] for r in got]
    assert chs == sorted(chs)
    # -ln(1-x) >= x termwise, so H <= -ln(S_KM) pointwise (up to
    # per-term quantization slack); equal to first order
    for (_, _, _, _, ch_mic, km) in rows:
        if km > 0:
            assert ch_mic <= round(1e6 * -math.log(km)) + len(rows) + 1
