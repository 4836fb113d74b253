"""Wave-105 invariants: the full-outer stream join equals the batch
full join on all three row classes (matched / click-only /
purchase-only, each proven non-empty); the BNLJ band join really
plans a BroadcastNestedLoopJoin and conserves row count."""

from __future__ import annotations

from dbpedia_spotlight_db_spark.queries import qlake, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_full_outer_stream_equals_batch_full_join(spark):
    rows = qrel.Q["stream_full_outer_join"](spark, SF).collect()
    got = {(r["click_id"], r["purchase_id"]) for r in rows}
    ev = [
        r
        for r in t(spark, SF, "events").collect()
        if r["ts"] is not None
    ]
    clicks = [r for r in ev if r["event_type"] == "click"]
    purch = [r for r in ev if r["event_type"] == "purchase"]
    horizon = 3 * 86400
    expect = set()
    matched_p = set()
    for c in clicks:
        hit = False
        for p in purch:
            if (
                p["user_id"] == c["user_id"]
                and 0
                <= (p["ts"] - c["ts"]).total_seconds()
                <= horizon
            ):
                expect.add((c["event_id"], p["event_id"]))
                matched_p.add(p["event_id"])
                hit = True
        if not hit:
            expect.add((c["event_id"], None))
    for p in purch:
        if p["event_id"] not in matched_p:
            expect.add((None, p["event_id"]))
    assert got == expect
    assert any(c is not None and p is not None for c, p in got)
    assert any(p is None for _, p in got)  # unmatched clicks flushed
    assert any(c is None for c, _ in got)  # unmatched purchases flushed


def test_bnlj_plans_nested_loop_and_conserves(spark):
    df = qlake.Q["join_bnlj_bands"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert sum(r["n"] for r in rows) == t(spark, SF, "lineitem").count()
    qty = [
        int(r["l_quantity"]) for r in t(spark, SF, "lineitem").collect()
    ]
    edges = {"tiny": (0, 10), "small": (10, 20), "mid": (20, 35),
             "large": (35, 45), "huge": (45, 1000000)}
    got = {r["band"]: (r["n"], r["qty_sum"]) for r in rows}
    for band, (lo, hi) in edges.items():
        sel = [v for v in qty if lo <= v < hi]
        if sel:
            assert got[band] == (len(sel), sum(sel))
        else:
            assert band not in got
