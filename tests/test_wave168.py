"""Wave-168 invariants: Q10's top-20 replays against a dict join
with exact e4 money, Q14's promo share replays with the
promo <= total integer invariant and near-uniform categorical pin,
and both queries are non-degenerate."""

from __future__ import annotations

import datetime
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_q10_matches_replay(spark):
    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1996, 1, 1)
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in t(spark, SF, "nation").collect()
    }
    cust = {
        r["c_custkey"]: (
            r["c_name"],
            nations[r["c_nationkey"]],
            round(r["c_acctbal"] * 100),
        )
        for r in t(spark, SF, "customer").collect()
    }
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in t(spark, SF, "orders").collect()
        if lo <= r["o_orderdate"] < hi
    }
    rev = defaultdict(int)
    for r in t(spark, SF, "lineitem").collect():
        if r["l_returnflag"] != "R" or r["l_orderkey"] not in orders:
            continue
        ck = orders[r["l_orderkey"]]
        rev[ck] += round(r["l_extendedprice"] * 100) * (
            100 - round(r["l_discount"] * 100)
        )
    rows = sorted(((-v, ck) for ck, v in rev.items()))[:20]
    want = [
        (ck, cust[ck][0], cust[ck][1], -nv, cust[ck][2])
        for nv, ck in rows
    ]
    got = [
        (
            r["c_custkey"],
            r["c_name"],
            r["nation"],
            r["revenue_e4"],
            r["acctbal_cents"],
        )
        for r in qrel.Q["orders_returned_item"](spark, SF).collect()
    ]
    assert got == want
    assert len(got) == 20  # non-degenerate


def test_q14_matches_replay(spark):
    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1996, 1, 1)
    ptype = {
        r["p_partkey"]: r["p_type"]
        for r in t(spark, SF, "part").collect()
    }
    promo = tot = 0
    for r in t(spark, SF, "lineitem").collect():
        if not (lo <= r["l_shipdate"] < hi):
            continue
        if r["l_partkey"] not in ptype:
            continue
        v = round(r["l_extendedprice"] * 100) * (
            100 - round(r["l_discount"] * 100)
        )
        tot += v
        if ptype[r["l_partkey"]] == "PROMO":
            promo += v
    got = qrel.Q["part_promo_revenue"](spark, SF).collect()[0]
    assert (got["promo_e4"], got["total_e4"]) == (promo, tot)
    assert abs(got["promo_pct"] - round(100.0 * promo / tot, 6)) <= 1e-9
    assert 0 < promo <= tot  # hard integer invariant, non-degenerate
    # flat 6-value categorical: share in a loose band around 1/6
    assert 5.0 < got["promo_pct"] < 35.0
