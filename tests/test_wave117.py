"""Wave-117 invariants: the exact binomial test matches a pure
Python replay of the micros-logfact machinery (and the fixture is
informative: 0 < k_included <= n+1, p in (0, 1]); Hodges-Lehmann
equals the brute-force median-of-pairwise-differences replay and is
positive (purchases out-earn clicks on the synthetic feed)."""

from __future__ import annotations

import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qadv
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_binom_test_matches_logfact_replay(spark):
    rows = t(spark, SF, "events").collect()
    n = len(rows)
    obs = sum(1 for r in rows if r["event_type"] == "purchase")
    li = [0] * (n + 1)
    for i in range(2, n + 1):
        li[i] = _rnd(math.log(i) * 1e6)
    lf = [0] * (n + 1)
    for i in range(1, n + 1):
        lf[i] = lf[i - 1] + li[i]
    lnp = _rnd(math.log(0.2) * 1e6)
    lnq = _rnd(math.log(0.8) * 1e6)
    lpm = [
        lf[n] - lf[k] - lf[n - k] + k * lnp + (n - k) * lnq
        for k in range(n + 1)
    ]
    lp_obs = lpm[obs]
    k_inc = sum(1 for v in lpm if v <= lp_obs)
    p_mic = sum(
        _rnd(math.exp(v / 1e6) * 1e6) for v in lpm if v <= lp_obs
    )
    got = qadv.Q["stat_binom_test"](spark, SF).collect()[0]
    assert (got["n"], got["obs"], got["k_included"], got["p_micros"]) == (
        n, obs, k_inc, p_mic,
    )
    assert 0 < k_inc <= n + 1
    assert 0 < p_mic <= 1_000_000


def test_hodges_lehmann_matches_brute_force(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in t(spark, SF, "events").collect():
        if (
            r["ts"] is not None
            and r["value"] is not None
            and r["event_type"] in ("purchase", "click")
        ):
            us = int(r["ts"].timestamp() * 1_000_000)
            daily[r["event_type"]][us // 86_400_000_000] += round(
                r["value"] * 100
            )
    ps = list(daily["purchase"].values())
    cs = list(daily["click"].values())
    diffs = sorted(p - c for p in ps for c in cs)
    m = len(diffs)
    # lower median by the 2*cum >= tot rule
    hl = diffs[(m - 1) // 2] if m % 2 else diffs[m // 2 - 1]
    got = qadv.Q["stat_hodges_lehmann"](spark, SF).collect()[0]
    assert got["n_pairs"] == m and m > 100
    assert got["hl_cents"] == hl
    assert got["hl_cents"] > 0, "purchases should out-earn clicks"
