"""Wave-167 invariants: Q3 and Q5 replay against pure-Python
multi-way dict joins with exact e4 money, Q5 is non-degenerate
(rows exist — the granger lesson), and the local-supplier
correlation predicate actually binds."""

from __future__ import annotations

import datetime
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_q3_matches_replay(spark):
    cut = datetime.datetime(1995, 3, 15)
    bld = {
        r["c_custkey"]
        for r in t(spark, SF, "customer").collect()
        if r["c_mktsegment"] == "BUILDING"
    }
    orders = {
        r["o_orderkey"]: (
            int(r["o_orderdate"].timestamp() * 1_000_000),
            r["o_orderpriority"],
        )
        for r in t(spark, SF, "orders").collect()
        if r["o_custkey"] in bld and r["o_orderdate"] < cut
    }
    rev = defaultdict(int)
    for r in t(spark, SF, "lineitem").collect():
        if r["l_orderkey"] in orders and r["l_shipdate"] > cut:
            rev[r["l_orderkey"]] += round(
                r["l_extendedprice"] * 100
            ) * (100 - round(r["l_discount"] * 100))
    rows = sorted(
        (
            (-v, orders[k][0], k, orders[k][1])
            for k, v in rev.items()
        )
    )[:10]
    want = [(k, -nv, d, p) for nv, d, k, p in rows]
    got = [
        (
            r["l_orderkey"],
            r["revenue_e4"],
            r["orderdate_us"],
            r["o_orderpriority"],
        )
        for r in qrel.Q["orders_shipping_priority"](spark, SF).collect()
    ]
    assert got == want
    assert len(got) == 10


def test_q5_matches_replay_nondegenerate(spark):
    nations = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in t(spark, SF, "nation").collect()
    }
    europe = {
        r["r_regionkey"]
        for r in t(spark, SF, "region").collect()
        if r["r_name"] == "EUROPE"
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in t(spark, SF, "customer").collect()
        if nations[r["c_nationkey"]][1] in europe
    }
    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1999, 1, 1)
    orders = {
        r["o_orderkey"]: cust[r["o_custkey"]]
        for r in t(spark, SF, "orders").collect()
        if r["o_custkey"] in cust and lo <= r["o_orderdate"] < hi
    }
    supp = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in t(spark, SF, "supplier").collect()
    }
    rev = defaultdict(int)
    for r in t(spark, SF, "lineitem").collect():
        ok = r["l_orderkey"]
        if ok not in orders:
            continue
        cn = orders[ok]
        if supp.get(r["l_suppkey"]) != cn:
            continue
        rev[nations[cn][0]] += round(r["l_extendedprice"] * 100) * (
            100 - round(r["l_discount"] * 100)
        )
    want = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [
        (r["nation"], r["revenue_e4"])
        for r in qrel.Q["orders_local_volume"](spark, SF).collect()
    ]
    assert got == [(n, v) for n, v in want]
    # non-degenerate: the correlated predicate admits rows AND
    # excludes rows (it binds)
    assert len(got) > 0 and sum(v for _, v in got) > 0
    any_supplier = sum(
        1
        for r in t(spark, SF, "lineitem").collect()
        if r["l_orderkey"] in orders
    )
    matched = sum(
        1
        for r in t(spark, SF, "lineitem").collect()
        if r["l_orderkey"] in orders
        and supp.get(r["l_suppkey"]) == orders[r["l_orderkey"]]
    )
    assert 0 < matched < any_supplier
