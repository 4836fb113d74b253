"""Wave-40 invariants, each face recounted independently driver-side:
ml_confusion against a direct numpy count, stat_kruskal against the
textbook tie-corrected H on tie-averaged ranks, ml_calibration
against a pure-Python binning + Brier replay, and ml_ndcg against a
per-user NDCG replay (including the micros-quantized discounts and
the zero-relevant exclusion rule)."""

from __future__ import annotations

import math

import numpy as np

from dbpedia_spotlight_db_spark.queries import qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _score_rows(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("value", "event_type")
        .collect()
    )
    cents = np.array([_rnd_away(r["value"] * 100) for r in rows])
    pos = np.array(
        [1 if r["event_type"] == "purchase" else 0 for r in rows]
    )
    return cents, pos


def test_confusion_matches_recount(spark):
    cents, pos = _score_rows(spark)
    hit = cents >= qml._CONF_T
    tp = int((hit & (pos == 1)).sum())
    fp = int((hit & (pos == 0)).sum())
    fn = int((~hit & (pos == 1)).sum())
    tn = int((~hit & (pos == 0)).sum())
    got = qml.Q["ml_confusion"](spark, SF).collect()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    assert abs(got["accuracy"] - (tp + tn) / (tp + fp + fn + tn)) < 1e-6
    assert abs(got["precision_"] - tp / (tp + fp)) < 1e-6
    assert abs(got["recall_"] - tp / (tp + fn)) < 1e-6
    assert abs(got["f1"] - 2 * tp / (2 * tp + fp + fn)) < 1e-6


def test_kruskal_matches_rank_recount(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("value", "event_type")
        .collect()
    )
    cents = np.array([_rnd_away(r["value"] * 100) for r in rows])
    grp = np.array([r["event_type"] for r in rows])
    order = np.argsort(cents, kind="stable")
    s = cents[order]
    ranks = np.empty(len(s), dtype=np.float64)
    i = 0
    tie_sum = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0
        tcnt = j - i
        tie_sum += tcnt**3 - tcnt
        i = j
    rr = np.empty(len(s))
    rr[order] = ranks
    n = len(s)
    h = 0.0
    for g in np.unique(grp):
        m = grp == g
        h += rr[m].sum() ** 2 / int(m.sum())
    h = 12.0 * h / (n * (n + 1)) - 3 * (n + 1)
    want = h / (1.0 - tie_sum / (n**3 - n))
    got = qml.Q["stat_kruskal"](spark, SF).collect()[0]
    assert got["k"] == len(np.unique(grp)) and got["n"] == n
    # the engine quantizes each group's 3*R2g^2/n_g to an integer —
    # sub-unit noise against hsum ~ 3*(2n*n_g)^2/n_g, far below 1e-6
    assert abs(got["h_adj"] - want) < 1e-5


def test_calibration_matches_replay(spark):
    cents, pos = _score_rows(spark)
    mn, mx = int(cents.min()), int(cents.max())
    bins: dict[int, list[int]] = {}
    bsum = 0
    for c, y in zip(cents.tolist(), pos.tolist()):
        ph = 500 if mx == mn else _rnd_away(1000.0 * (c - mn) / (mx - mn))
        b = min(ph // 100, 9)
        n_b, p_b, sph = bins.setdefault(b, [0, 0, 0])
        bins[b][0] += 1
        bins[b][1] += y
        bins[b][2] += ph
        bsum += (ph - 1000 * y) ** 2
    got = {r["bin"]: r for r in qml.Q["ml_calibration"](spark, SF).collect()}
    assert set(got) == set(bins)
    n = len(cents)
    for b, (n_b, p_b, sph) in bins.items():
        g = got[b]
        assert g["n_b"] == n_b and g["pos_b"] == p_b
        assert abs(g["mean_pred"] - sph / (1000.0 * n_b)) < 1e-6
        assert abs(g["frac_pos"] - p_b / n_b) < 1e-6
        assert abs(g["brier"] - bsum / (1e6 * n)) < 1e-6


def test_ndcg_matches_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("user_id", "event_id", "value", "event_type")
        .collect()
    )
    users: dict[int, list[tuple[int, int, int]]] = {}
    for r in rows:
        users.setdefault(r["user_id"], []).append(
            (
                -_rnd_away(r["value"] * 100),
                r["event_id"],
                1 if r["event_type"] == "purchase" else 0,
            )
        )
    nds = []
    n_users = 0
    for evs in users.values():
        n_users += 1
        evs.sort()
        rtot = sum(rel for _, _, rel in evs)
        if rtot == 0:
            continue
        dcg = sum(
            rel * qml._NDCG_D[i]
            for i, (_, _, rel) in enumerate(evs[: qml._NDCG_K])
        )
        idcg = qml._NDCG_C[min(rtot, qml._NDCG_K)]
        nds.append(_rnd_away(1e6 * dcg / idcg))
    got = qml.Q["ml_ndcg"](spark, SF).collect()[0]
    assert got["n_users"] == n_users
    assert got["n_eval"] == len(nds)
    assert abs(got["mean_ndcg"] - sum(nds) / (1e6 * len(nds))) < 1e-6
