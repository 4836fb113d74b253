"""Wave-140 invariants: seasonal MK equals the per-weekday replay
(S and 18*Var sum across the 7 strata exactly), weekday derivation
is pure epoch arithmetic, and the statistic stays in the null bulk
on the trendless fixture."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_seasonal_mk_matches_replay(spark):
    daily = defaultdict(int)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        daily[us // 86_400_000_000] += round(r["value"] * 100)
    seasons = defaultdict(list)
    for d in sorted(daily):
        seasons[(d + 4) % 7].append(daily[d])
    s_tot = 0
    var18 = 0
    for vs in seasons.values():
        n = len(vs)
        s_tot += sum(
            (b > a) - (b < a)
            for i, a in enumerate(vs)
            for b in vs[i + 1 :]
        )
        tcor = sum(
            tc * (tc - 1) * (2 * tc + 5)
            for tc in Counter(vs).values()
        )
        var18 += n * (n - 1) * (2 * n + 5) - tcor
    got = qstats.Q["stat_seasonal_mk"](spark, SF).collect()[0]
    assert (got["n_seasons"], got["s_tot"], got["var18"]) == (
        len(seasons), s_tot, var18,
    )
    assert var18 > 0
    z = (s_tot - (s_tot > 0) + (s_tot < 0)) / math.sqrt(var18 / 18.0)
    assert abs(got["z"] - round(z, 6)) <= 1e-9
    assert abs(got["z"]) < 4  # trendless fixture
    # the deseasonalized statistic differs from the plain MK z
    plain = qstats.Q["stat_mann_kendall"](spark, SF).collect()[0]
    assert got["z"] != plain["z"]
