"""Wave-39 invariants, each face recounted independently driver-side:
ml_auc against a direct tie-averaged-rank AUC, stat_kendall against
the O(n^2) sign-outer-product brute force, agg_kmv against a hashlib
bottom-k recount, and events_survival against a pure-Python
Kaplan-Meier replay (including the censoring rule and the micros
quantization)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from datetime import datetime

import numpy as np

from dbpedia_spotlight_db_spark.queries import qml, qsketch, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    """round-half-away-from-zero — Spark/DuckDB round(), NOT Python's
    banker's round."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_auc_matches_rank_recount(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("value", "event_type")
        .collect()
    )
    scores = np.array([_rnd_away(r["value"] * 100) for r in rows])
    pos = np.array(
        [1 if r["event_type"] == "purchase" else 0 for r in rows]
    )
    order = np.argsort(scores, kind="stable")
    s, p = scores[order], pos[order]
    # tie-averaged ranks
    ranks = np.empty(len(s), dtype=np.float64)
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0
        i = j
    n_pos, n_neg = int(p.sum()), int((1 - p).sum())
    r_pos = float(ranks[p == 1].sum())
    want = (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    got = qml.Q["ml_auc"](spark, SF).collect()[0]
    assert got["n"] == len(s)
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert got["u2"] == int(2 * r_pos) - n_pos * (n_pos + 1)
    assert abs(got["auc"] - want) < 1e-6


def test_kendall_matches_bruteforce(spark):
    rows = (
        t(spark, SF, "lineitem")
        .select("l_quantity", "l_discount")
        .collect()
    )
    qx = np.array([_rnd_away(r["l_quantity"] * 100) for r in rows],
                  dtype=np.int64)
    qy = np.array([_rnd_away(r["l_discount"] * 100) for r in rows],
                  dtype=np.int64)
    sx = np.sign(qx[:, None] - qx[None, :]).astype(np.int8)
    sy = np.sign(qy[:, None] - qy[None, :]).astype(np.int8)
    prod = sx.astype(np.int32) * sy
    conc = int((prod == 1).sum()) // 2
    disc = int((prod == -1).sum()) // 2
    n = len(qx)
    n0 = n * (n - 1) // 2
    n1 = sum(v * (v - 1) // 2 for v in Counter(qx.tolist()).values())
    n2 = sum(v * (v - 1) // 2 for v in Counter(qy.tolist()).values())
    want = (conc - disc) / math.sqrt(float(n0 - n1) * float(n0 - n2))
    got = qml.Q["stat_kendall"](spark, SF).collect()[0]
    assert got["n"] == n
    assert got["conc"] == conc and got["disc"] == disc
    assert abs(got["tau_b"] - want) < 1e-6


def test_kmv_matches_hashlib_recount(spark):
    docs = t(spark, SF, "documents").select("text").collect()
    hs = set()
    for r in docs:
        for tk in (r["text"] or "").split(" "):
            if tk:
                hs.add(
                    int(hashlib.md5(tk.encode()).hexdigest()[:10], 16)
                )
    n = len(hs)
    got = qsketch.Q["agg_kmv"](spark, SF).collect()[0]
    assert got["k"] == 256
    assert got["n_distinct"] == n
    if n >= 256:
        hk = sorted(hs)[255]
        assert got["h_k"] == hk
        assert got["kmv_est"] == _rnd_away(255.0 * float(1 << 40) / hk)
    else:
        assert got["h_k"] is None and got["kmv_est"] == n


def test_survival_matches_km_replay(spark):
    rows = t(spark, SF, "events").select("user_id", "ts").collect()
    epoch0 = datetime(1970, 1, 1)
    per_user: dict[int, list[int]] = {}
    for r in rows:
        us = int((r["ts"] - epoch0).total_seconds() * 1e6)
        per_user.setdefault(r["user_id"], []).append(us)
    firsts = {u: min(v) for u, v in per_user.items()}
    lasts = {u: max(v) for u, v in per_user.items()}
    gmax = max(lasts.values())
    sup: dict[int, list[int]] = {}
    for u in per_user:
        dur = (lasts[u] - firsts[u]) // 86400000000
        cen = 1 if gmax - lasts[u] < 604800000000 else 0
        d, c = sup.setdefault(dur, [0, 0])
        sup[dur][0] += 1 - cen
        sup[dur][1] += cen
    durs = sorted(sup)
    # suffix risk sets
    n_risk, acc = {}, 0
    for dur in reversed(durs):
        acc += sup[dur][0] + sup[dur][1]
        n_risk[dur] = acc
    want = {}
    msum, dead = 0, False
    for dur in durs:
        d, c = sup[dur]
        if d == 0:
            continue
        if d >= n_risk[dur]:
            dead = True
        else:
            msum += _rnd_away(
                1e6 * math.log((n_risk[dur] - d) / n_risk[dur])
            )
        surv = 0.0 if dead else math.exp(msum / 1e6)
        want[dur] = (n_risk[dur], d, c, surv)
    got = {
        r["dur_day"]: r
        for r in qstats.Q["events_survival"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for dur, (nr, d, c, surv) in want.items():
        g = got[dur]
        assert (g["n_risk"], g["n_events"], g["n_censored"]) == (nr, d, c)
        assert abs(g["surv"] - surv) < 1e-6
    # KM is a non-increasing step function
    seq = [got[d]["surv"] for d in sorted(got)]
    assert all(a >= b - 1e-9 for a, b in zip(seq, seq[1:]))
