"""Wave-106 invariants: the progress-metrics face earns both
booleans (probes really dropped — by metric AND by absence), and the
scalar subquery decorrelates to one join with the no-orders customer
kept as NULL."""

from __future__ import annotations

import re

from dbpedia_spotlight_db_spark.queries import qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_progress_metrics_booleans_and_no_leak(spark):
    rows = qrel.Q["stream_progress_metrics"](spark, SF).collect()
    assert rows
    assert all(r["late_dropped"] for r in rows)
    assert all(r["state_bounded"] for r in rows)
    types = {r["event_type"] for r in rows}
    assert "late_probe" not in types and "wm_push" not in types
    # values equal the stream_window face (same topology + twin)
    sw = {
        (r["win_start_us"], r["event_type"]): (r["n"], r["cents"])
        for r in qrel.Q["stream_window"](spark, SF).collect()
    }
    got = {
        (r["win_start_us"], r["event_type"]): (r["n"], r["cents"])
        for r in rows
    }
    assert got == sw


def test_scalar_subquery_decorrelated_and_null_kept(spark):
    df = qsql.Q["sql_scalar_subquery"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = len(re.findall(r"HashJoin|SortMergeJoin|NestedLoop", plan))
    assert joins == 1
    rows = {r["c_custkey"]: r["max_order_cents"] for r in df.collect()}
    custs = {r["c_custkey"] for r in t(spark, SF, "customer").collect()}
    assert set(rows) == custs
    best = {}
    for r in t(spark, SF, "orders").collect():
        c = round(r["o_totalprice"] * 100)
        k = r["o_custkey"]
        if k in custs:
            best[k] = max(best.get(k, c), c)
    for k in custs:
        assert rows[k] == best.get(k)
    assert any(v is None for v in rows.values()) or set(best) == custs
