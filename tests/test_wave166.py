"""Wave-166 invariants: the Q1 pricing summary's exact scaled-money
chain replays cell by cell (including the e4/e6 identities), and the
p-chart replays through the rounded-limits convention with a
fabricated shifted day registering a violation."""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qrel, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_pricing_summary_matches_replay(spark):
    cut = datetime.datetime(1998, 9, 2)
    cells = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in t(spark, SF, "lineitem").collect():
        if r["l_shipdate"] > cut:
            continue
        qty = round(r["l_quantity"])
        cents = round(r["l_extendedprice"] * 100)
        dh = round(r["l_discount"] * 100)
        th = round(r["l_tax"] * 100)
        c = cells[(r["l_returnflag"], r["l_linestatus"])]
        c[0] += 1
        c[1] += qty
        c[2] += cents
        c[3] += cents * (100 - dh)
        c[4] += cents * (100 - dh) * (100 + th)
        c[5] += dh
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in qrel.Q["lineitem_pricing_summary"](spark, SF).collect()
    }
    assert set(got) == set(cells)
    for key, (n, sq, sc, sd4, sc6, sdh) in cells.items():
        g = got[key]
        assert (
            g["count_order"],
            g["sum_qty"],
            g["sum_base_cents"],
            g["sum_disc_price_e4"],
            g["sum_charge_e6"],
        ) == (n, sq, sc, sd4, sc6)
        assert abs(g["avg_qty"] - round(sq / n, 6)) <= 1e-9
        assert abs(g["avg_price"] - round(sc / n / 100.0, 6)) <= 1e-9
        assert abs(g["avg_disc"] - round(sdh / n / 100.0, 6)) <= 1e-9
        # scaled-money identities: undiscounted >= discounted
        assert sd4 <= sc * 100
        assert sc6 >= sd4 * 100  # tax only adds


def test_p_chart_matches_replay(spark):
    daily = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        d = daily[us // 86_400_000_000]
        d[0] += 1
        if r["event_type"] == "purchase":
            d[1] += 1
    tn = sum(n for n, _ in daily.values())
    td = sum(d for _, d in daily.values())
    pbar = td / tn
    viol = 0
    for n, d in daily.values():
        p_i = round(d / n, 6)
        se = math.sqrt(pbar * (1 - pbar) / n)
        ucl = round(pbar + 3 * se, 6)
        lcl = round(max(pbar - 3 * se, 0.0), 6)
        if p_i > ucl or p_i < lcl:
            viol += 1
    got = qstats.Q["stat_p_chart"](spark, SF).collect()[0]
    assert (got["n_days"], got["n_violations"]) == (len(daily), viol)
    assert abs(got["p_bar"] - round(pbar, 6)) <= 1e-9
    assert got["in_control"] is (viol == 0)
    assert got["in_control"] is True  # uniform-share fixture
    # fabricated shifted day WOULD register: p=0.9 on n=50
    se50 = math.sqrt(pbar * (1 - pbar) / 50)
    assert 0.9 > round(pbar + 3 * se50, 6)
