"""Wave-122 invariants: Quade matches the doubled-rank replay
(weights from range ranks, the x16 scale cancelling in F) and the
identity F > 0 holds on the non-degenerate fixture; the geometric
mean matches an exact micros replay and sits at or below the
arithmetic mean (AM-GM)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _doubled_ranks(vals):
    cnt = Counter(vals)
    start, first = {}, 1
    for u in sorted(cnt):
        start[u] = first
        first += cnt[u]
    return {u: 2 * start[u] + cnt[u] - 1 for u in cnt}


def test_quade_matches_replay(spark):
    daily = defaultdict(dict)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        d = us // 86_400_000_000
        daily[d][r["event_type"]] = daily[d].get(r["event_type"], 0) + round(
            r["value"] * 100
        )
    types = sorted({et for v in daily.values() for et in v})
    k = len(types)
    blocks = {
        d: {et: c // 100 for et, c in v.items()}
        for d, v in daily.items()
        if len(v) == k
    }
    n = len(blocks)
    ranges = {d: max(v.values()) - min(v.values()) for d, v in blocks.items()}
    dw_map = _doubled_ranks(list(ranges.values()))
    a_q = 0
    sj = defaultdict(int)
    for d, v in blocks.items():
        dr_map = _doubled_ranks(list(v.values()))
        dw = dw_map[ranges[d]]
        for et, val in v.items():
            ds = dw * (dr_map[val] - (k + 1))
            a_q += ds * ds
            sj[et] += ds
    sb_q = sum(s * s for s in sj.values())
    got = qstats.Q["stat_quade"](spark, SF).collect()[0]
    assert (got["n"], got["k"], got["a_q"], got["sb_q"]) == (n, k, a_q, sb_q)
    assert n > 10 and n * a_q - sb_q > 0
    f = (n - 1.0) * sb_q / (n * a_q - sb_q)
    assert abs(got["f_stat"] - round(f, 6)) <= 1e-9
    assert got["f_stat"] > 0


def test_geomean_matches_replay_and_amgm(spark):
    sums = defaultdict(lambda: [0, 0, 0.0])
    for r in t(spark, SF, "orders").collect():
        x = r["o_totalprice"]
        if x > 0:
            g = r["o_orderpriority"]
            sums[g][0] += 1
            sums[g][1] += _rnd(math.log(x) * 1e6)
            sums[g][2] += x
    got = {
        r["g"]: (r["n"], r["sum_ln_mic"], r["geomean"])
        for r in qstats.Q["agg_geomean"](spark, SF).collect()
    }
    assert set(got) == set(sums)
    for g, (n, slm, sx) in sums.items():
        gn, gs, gm = got[g]
        assert (gn, gs) == (n, slm)
        assert abs(gm - round(math.exp(slm / 1e6 / n), 6)) <= 1e-9
        assert gm <= sx / n + 1e-6, "AM-GM violated"
