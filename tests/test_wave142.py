"""Wave-142 invariants: the grid-pass Kendall S and all three
ordinal coefficients equal a brute-force quadratic pair census, the
tie-mass identity C+D+TX+TY-TXY = P holds exactly, and Kuiper's V
dominates each one-sided KS component while certifying the md5 ring
uniform."""

from __future__ import annotations

import hashlib
import math
from itertools import combinations

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_somers_matches_brute_force(spark):
    rows = [
        (int(r["o_orderpriority"][0]), round(r["o_totalprice"] * 100))
        for r in t(spark, SF, "orders").collect()
    ]
    s = c = d = tx = ty = txy = 0
    for (x1, y1), (x2, y2) in combinations(rows, 2):
        if x1 == x2 and y1 == y2:
            txy += 1
        if x1 == x2:
            tx += 1
        if y1 == y2:
            ty += 1
        if x1 != x2 and y1 != y2:
            if (x1 < x2) == (y1 < y2):
                c += 1
            else:
                d += 1
    s = c - d
    n = len(rows)
    p = n * (n - 1) // 2
    assert c + d + tx + ty - txy == p  # tie-mass identity
    got = qstats.Q["stat_somers_d"](spark, SF).collect()[0]
    assert (got["n"], got["s"], got["tx"], got["ty"], got["txy"]) == (
        n, s, tx, ty, txy,
    )
    assert abs(got["gamma"] - round(s / (c + d), 6)) <= 1e-9
    assert abs(got["d_yx"] - round(s / (p - tx), 6)) <= 1e-9
    tau = s / (math.sqrt(p - tx) * math.sqrt(p - ty))
    assert abs(got["tau_b"] - round(tau, 6)) <= 1e-9
    # priority and price are independent in the fixture: null bulk
    assert abs(got["tau_b"]) < 0.05


def test_kuiper_matches_replay_and_dominates_ks(spark):
    buckets = [
        int(
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16
        )
        for r in t(spark, SF, "documents").collect()
    ]
    n = len(buckets)
    from collections import Counter

    cnt = Counter(buckets)
    k = 0
    up = dn = 0
    for bk in sorted(cnt):
        k += cnt[bk]
        up = max(up, 256 * k - n * (bk + 1))
        dn = max(dn, n * bk - 256 * (k - cnt[bk]))
    got = qstats.Q["stat_kuiper"](spark, SF).collect()[0]
    assert (got["n"], got["d_plus_num"], got["d_minus_num"]) == (
        n, up, dn,
    )
    assert abs(got["v_stat"] - round((up + dn) / (256 * n), 6)) <= 1e-9
    assert got["uniform_ok"] is True
    # V >= each one-sided component; and V >= the two-sided KS sup
    ks = qstats.Q["stat_ks_uniform"](spark, SF).collect()[0]
    assert got["v_stat"] >= ks["ks_stat"] - 1e-9
