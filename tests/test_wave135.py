"""Wave-135 invariants: Lepage's component integers agree with the
stat_ansari_bradley face exactly (shared machinery, same split),
the statistic matches the replay, and the null-true parity split
keeps L in the chi2_2 bulk."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_lepage_matches_replay_and_components(spark):
    groups = defaultdict(list)
    allv = []
    for r in t(spark, SF, "orders").collect():
        c = round(r["o_totalprice"] * 100)
        groups[r["o_orderkey"] % 2].append(c)
        allv.append(c)
    cnt = Counter(allv)
    start, first = {}, 1
    for u in sorted(cnt):
        start[u] = first
        first += cnt[u]
    drc = {u: 2 * start[u] + cnt[u] - 1 for u in cnt}
    N = len(allv)
    da = lambda v: min(drc[v], 2 * (N + 1) - drc[v])
    n0, n1 = len(groups[0]), len(groups[1])
    w_d = sum(drc[v] for v in groups[1])
    ab_d = sum(da(v) for v in groups[1])
    sda = sum(da(v) for v in allv)
    sdaq = sum(da(v) ** 2 for v in allv)
    tsum = sum(tc**3 - tc for tc in cnt.values())
    got = qstats.Q["stat_lepage"](spark, SF).collect()[0]
    assert (got["n0"], got["n1"], got["w_d"], got["ab_d"]) == (
        n0, n1, w_d, ab_d,
    )
    # component agreement with the standalone AB face
    ab = qstats.Q["stat_ansari_bradley"](spark, SF).collect()[0]
    assert (ab["ab1_d"], ab["sda"], ab["sdaq"]) == (ab_d, sda, sdaq)
    var_w = n1 * n0 * (N + 1) / 3.0 - n1 * n0 * tsum / (3.0 * N * (N - 1))
    var_ab = n1 * n0 * (N * sdaq - sda * sda) / (N * N * (N - 1))
    L = (w_d - n1 * (N + 1)) ** 2 / var_w + (
        ab_d - n1 * sda / N
    ) ** 2 / var_ab
    assert abs(got["l_stat"] - round(L, 6)) <= 1e-9
    # null-true split: P(chi2_2 > 20) ~ 4.5e-5
    assert 0 < got["l_stat"] < 20
