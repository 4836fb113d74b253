"""Wave-171 invariants: count-star reads zero columns (empty
ReadSchema on every scan), the union filter reaches BOTH branch
scans in the plan, and the conditional-aggregate family replays
including the three-valued-logic NULL group behavior."""

from __future__ import annotations

import re
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qio, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_count_star_footer_only(spark):
    df = qio.Q["scan_count_star"](spark, SF)
    got = df.collect()[0]
    assert got["n_rows"] == t(spark, SF, "events").count()
    assert got["n_orders"] == t(spark, SF, "orders").count()
    assert got["n_lineitems"] == t(spark, SF, "lineitem").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every scan projects zero columns
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all(s.startswith("struct<>") for s in schemas)


def test_union_pushdown_reaches_both_branches(spark):
    df = qio.Q["scan_union_pushdown"](spark, SF)
    rows = {r["event_type"]: (r["n"], r["sum_cents"]) for r in df.collect()}
    want = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        c = round(r["value"] * 100)
        if c > 10000:
            want[r["event_type"]][0] += 1
            want[r["event_type"]][1] += c
    for r in t(spark, SF, "orders").collect():
        c = round(r["o_totalprice"] * 100)
        if c > 10000:
            want[r["o_orderpriority"]][0] += 1
            want[r["o_orderpriority"]][1] += c
    assert rows == {k: tuple(v) for k, v in want.items()}
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter appears below the union: both branches carry a
    # 10000-comparison before any union/aggregate node
    assert plan.count("10000") >= 2


def test_count_if_family_matches_replay(spark):
    agg = defaultdict(lambda: [0, 0, [], []])
    for r in t(spark, SF, "events").collect():
        a = agg[r["event_type"]]
        v = r["value"]
        if v is not None and v > 100.0:
            a[0] += 1
        if v is None:
            a[1] += 1
        a[2].append(None if v is None else v > 500.0)
        a[3].append(v is not None)
    got = {
        r["event_type"]: r
        for r in qrel.Q["agg_count_if"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for ty, (nb, nn, hugev, valued) in agg.items():
        assert (got[ty]["n_big"], got[ty]["n_null"]) == (nb, nn)
        non_null = [x for x in hugev if x is not None]
        want_any = any(non_null) if non_null else None
        assert got[ty]["any_huge"] == want_any
        assert got[ty]["every_valued"] == all(valued)
