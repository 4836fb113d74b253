"""Wave-178 invariants: the paired sign test replays through the
lag-7 pairing and the exact binomial machinery (null pinned on the
trendless fixture), and the global-temp-view scope facts hold
directly against a sibling session."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qadv, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_sign_test_matches_replay(spark):
    cents = defaultdict(int)
    for r in t(spark, SF, "orders").collect():
        d = (
            int(r["o_orderdate"].timestamp() * 1_000_000)
            // 86_400_000_000
        )
        cents[d] += round(r["o_totalprice"] * 100)
    k1 = n = 0
    for d, cur in cents.items():
        prv = cents.get(d - 7)
        if prv is None or cur == prv:
            continue
        n += 1
        if cur > prv:
            k1 += 1
    li = [0, 0] + [round(math.log(i) * 1e6) for i in range(2, n + 1)]
    lf = [0] * (n + 1)
    for i in range(1, n + 1):
        lf[i] = lf[i - 1] + li[i]
    lbc = [lf[n] - lf[k] - lf[n - k] for k in range(n + 1)]
    obs = lbc[k1]
    k_inc = sum(1 for v in lbc if v <= obs)
    p_mic = sum(
        round(math.exp(v / 1e6 + n * math.log(0.5)) * 1e6)
        for v in lbc
        if v <= obs
    )
    got = qadv.Q["stat_sign_test"](spark, SF).collect()[0]
    assert (got["n_pairs"], got["n_up"]) == (n, k1)
    assert (got["k_included"], got["p_micros"]) == (k_inc, p_mic)
    # trendless: up-share near 1/2, not significant at 5%
    assert 0.3 < k1 / n < 0.7
    assert got["p_micros"] > 50_000


def test_global_temp_view_scopes(spark):
    got = qsql.Q["sql_global_temp_view"](spark, SF).collect()[0]
    rows = [
        r
        for r in t(spark, SF, "orders").collect()
        if r["o_orderstatus"] == "F"
    ]
    assert got["n_rows"] == len(rows)
    assert got["total_cents"] == sum(
        round(r["o_totalprice"] * 100) for r in rows
    )
    assert got["sibling_sees_global"] is True
    assert got["sibling_blind_to_local"] is True
    # the face cleaned up after itself
    assert not any(
        v.name == "gtv_probe"
        for v in spark.catalog.listTables("global_temp")
    )
