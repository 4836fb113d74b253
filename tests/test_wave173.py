"""Wave-173 invariants: the GROUPS-frame emulation equals a literal
per-group Python walk, BOTH engines reject the literal GROUPS
syntax (the double dialect gap, measured), and the replicate-NL
hint yields a CartesianProduct plan with the exact pair grid."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

from dbpedia_spotlight_db_spark.queries import qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_groups_frame_matches_walk(spark):
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        d = per[r["event_type"]][us // 86_400_000_000]
        d[0] += round(r["value"] * 100)
        d[1] += 1
    want = {}
    for ty, days in per.items():
        ds = sorted(days)
        for i, d in enumerate(ds):
            lo, hi = max(0, i - 1), min(len(ds) - 1, i + 1)
            cents = sum(days[ds[j]][0] for j in range(lo, hi + 1))
            n = sum(days[ds[j]][1] for j in range(lo, hi + 1))
            want[(ty, d)] = (cents, n)
    got = {
        (r["event_type"], r["day"]): (r["win_cents"], r["win_n"])
        for r in qrel.Q["win_groups_frame"](spark, SF).collect()
    }
    assert got == want
    # a GROUPS frame differs from ROWS: some day carries >1 row
    assert any(n > 3 for _, n in got.values())


def test_both_engines_reject_literal_groups(spark):
    from pyspark.errors import ParseException

    t(spark, SF, "events").createOrReplaceTempView("ev_groups_probe")
    with pytest.raises(ParseException):
        spark.sql(
            "SELECT sum(event_id) OVER (ORDER BY event_id GROUPS"
            " BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM"
            " ev_groups_probe"
        ).collect()
    con = duckdb.connect()
    with pytest.raises(Exception, match="GROUPS"):
        con.execute(
            "SELECT sum(x) OVER (ORDER BY x GROUPS BETWEEN 1"
            " PRECEDING AND 1 FOLLOWING) FROM (VALUES (1), (2))"
            " v(x)"
        )


def test_replicate_nl_plan_and_grid(spark):
    df = qrel.Q["join_replicate_nl"](spark, SF)
    rows = df.collect()
    names = sorted(
        r["r_name"] for r in t(spark, SF, "region").collect()
    )
    want = sorted(
        (a, b, len(a) + len(b))
        for a in names
        for b in names
        if a != b
    )
    assert [
        (r["region_a"], r["region_b"], r["name_len"]) for r in rows
    ] == want
    assert len(rows) == 20
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" in plan
