"""Wave-119 invariants: truncation energies equal the per-component
micros replay, are monotone in k, and end at retained = 1.0 for the
full dimension; Mann-Kendall matches the brute-force pairwise-sign
replay with the tie-exact variance."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qembed, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_truncation_energy_matches_replay(spark):
    dims = defaultdict(int)
    for r in t(spark, SF, "embeddings").collect():
        for j, x in enumerate(r["embedding"]):
            dims[j] += _rnd(1e6 * float(x) * float(x))
    total = sum(dims.values())
    cum, expect = 0, {}
    for j in range(64):
        cum += dims[j]
        if j + 1 in (8, 16, 32, 64):
            expect[j + 1] = (cum, round(cum / total, 6))
    got = {
        r["k"]: (r["energy_mic"], r["retained"])
        for r in qembed.Q["embed_truncation"](spark, SF).collect()
    }
    assert got == expect
    ks = sorted(got)
    assert [got[k][1] for k in ks] == sorted(got[k][1] for k in ks)
    assert got[64][1] == 1.0


def test_mann_kendall_matches_pairwise_replay(spark):
    daily = defaultdict(int)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is not None and r["value"] is not None:
            us = int(r["ts"].timestamp() * 1_000_000)
            daily[us // 86_400_000_000] += round(r["value"] * 100)
    days = sorted(daily)
    n = len(days)
    s = sum(
        (daily[dj] > daily[di]) - (daily[dj] < daily[di])
        for i, di in enumerate(days)
        for dj in days[i + 1 :]
    )
    tcor = sum(
        tc * (tc - 1) * (2 * tc + 5)
        for tc in Counter(daily.values()).values()
    )
    var18 = n * (n - 1) * (2 * n + 5) - tcor
    got = qstats.Q["stat_mann_kendall"](spark, SF).collect()[0]
    assert (got["n"], got["s"], got["var18"]) == (n, s, var18)
    assert n > 10 and var18 > 0
    z = (s - (s > 0) + (s < 0)) / math.sqrt(var18 / 18.0)
    assert abs(got["z"] - round(z, 6)) <= 1e-9
