"""Wave-170 invariants: the Q22 analog replays (threshold, recency
anti-join, nation rollup) and is non-degenerate; the Q4 analog
counts each late order ONCE regardless of how many lines are late
(the semi-vs-inner double-count distinction, pinned)."""

from __future__ import annotations

import datetime
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_dormant_value_matches_replay(spark):
    custs = t(spark, SF, "customer").collect()
    bals = [
        round(r["c_acctbal"] * 100)
        for r in custs
        if r["c_acctbal"] > 0.0
    ]
    cut = sum(bals) / len(bals)
    recent = {
        r["o_custkey"]
        for r in t(spark, SF, "orders").collect()
        if r["o_orderdate"] >= datetime.datetime(2000, 1, 1)
    }
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in t(spark, SF, "nation").collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for r in custs:
        bal = round(r["c_acctbal"] * 100)
        if bal > cut and r["c_custkey"] not in recent:
            a = agg[nations[r["c_nationkey"]]]
            a[0] += 1
            a[1] += bal
    got = {
        r["nation"]: (r["n_custs"], r["total_bal_cents"])
        for r in qrel.Q["customer_dormant_value"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    assert len(got) > 0  # non-degenerate


def test_priority_wait_matches_replay(spark):
    orders = {
        r["o_orderkey"]: (
            r["o_orderpriority"],
            int(r["o_orderdate"].timestamp() * 1_000_000),
        )
        for r in t(spark, SF, "orders").collect()
    }
    late_orders = set()
    late_lines = 0
    for r in t(spark, SF, "lineitem").collect():
        ok = r["l_orderkey"]
        if ok not in orders:
            continue
        ship_us = int(r["l_shipdate"].timestamp() * 1_000_000)
        if ship_us - orders[ok][1] > 90 * 86_400_000_000:
            late_orders.add(ok)
            late_lines += 1
    want = defaultdict(int)
    for ok in late_orders:
        want[orders[ok][0]] += 1
    got = {
        r["o_orderpriority"]: r["n_late_orders"]
        for r in qrel.Q["orders_priority_wait"](spark, SF).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == len(late_orders) > 0
    # the semi-join guarantee: lines > orders means an inner join
    # WOULD have double-counted
    assert late_lines > len(late_orders)
