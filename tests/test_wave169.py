"""Wave-169 invariants: Q18/Q19/Q6 replay against pure-Python
evaluation; every Q19 disjunction arm is individually non-empty; Q6
uses the integer-hundredths discount band."""

from __future__ import annotations

import datetime
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_q18_matches_replay(spark):
    qty = defaultdict(int)
    for r in t(spark, SF, "lineitem").collect():
        qty[r["l_orderkey"]] += round(r["l_quantity"])
    big = {k for k, q in qty.items() if q > 250}
    assert big  # threshold admits a working set
    cust = {
        r["c_custkey"]: r["c_name"]
        for r in t(spark, SF, "customer").collect()
    }
    rows = []
    for r in t(spark, SF, "orders").collect():
        if r["o_orderkey"] not in big:
            continue
        rows.append(
            (
                -round(r["o_totalprice"] * 100),
                int(r["o_orderdate"].timestamp() * 1_000_000),
                r["o_orderkey"],
                r["o_custkey"],
            )
        )
    rows.sort()
    want = [
        (
            ck,
            cust[ck],
            ok,
            dus,
            -ntp,
            qty[ok],
        )
        for ntp, dus, ok, ck in rows[:20]
    ]
    got = [
        (
            r["c_custkey"],
            r["c_name"],
            r["o_orderkey"],
            r["orderdate_us"],
            r["totalprice_cents"],
            r["sum_qty"],
        )
        for r in qrel.Q["orders_large_volume"](spark, SF).collect()
    ]
    assert got == want


def _band(brand, size, qv):
    return (
        (brand == "Brand#11" and 1 <= size <= 50 and 1 <= qv <= 21)
        or (brand == "Brand#12" and 1 <= size <= 50 and 10 <= qv <= 30)
        or (brand == "Brand#23" and 1 <= size <= 50 and 20 <= qv <= 40)
    )


def test_q19_matches_replay(spark):
    part = {
        r["p_partkey"]: (r["p_brand"], r["p_size"])
        for r in t(spark, SF, "part").collect()
    }
    total = n = 0
    arms = [0, 0, 0]
    for r in t(spark, SF, "lineitem").collect():
        if r["l_partkey"] not in part:
            continue
        brand, size = part[r["l_partkey"]]
        qv = r["l_quantity"]
        if _band(brand, size, qv):
            total += round(r["l_extendedprice"] * 100) * (
                100 - round(r["l_discount"] * 100)
            )
            n += 1
            for i, b in enumerate(
                ("Brand#11", "Brand#12", "Brand#23")
            ):
                if brand == b:
                    arms[i] += 1
    got = qrel.Q["part_disjunctive_revenue"](spark, SF).collect()[0]
    assert (got["revenue_e4"], got["n_items"]) == (total, n)
    assert all(a > 0 for a in arms)  # every arm non-empty


def test_q6_matches_replay(spark):
    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1996, 1, 1)
    total = n = 0
    for r in t(spark, SF, "lineitem").collect():
        dh = round(r["l_discount"] * 100)
        if (
            lo <= r["l_shipdate"] < hi
            and 5 <= dh <= 7
            and r["l_quantity"] < 24
        ):
            total += round(r["l_extendedprice"] * 100) * dh
            n += 1
    got = qrel.Q["lineitem_forecast_revenue"](spark, SF).collect()[0]
    assert (got["revenue_e4"], got["n_items"]) == (total, n)
    assert n > 0
