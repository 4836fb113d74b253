"""Wave-98 invariants: CBO really changes the scan order and restores
its confs and catalog; the crosstab unpivot equals a Counter replay
and the freqItems superset certificate is earned."""

from __future__ import annotations

from collections import Counter

from dbpedia_spotlight_db_spark.queries import qlake, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_cbo_reorder_earned_and_cleaned(spark):
    before = spark.conf.get("spark.sql.cbo.enabled", None)
    row = qlake.Q["join_cbo_reorder"](spark, SF).collect()[0]
    assert row["reordered"] is True
    li = t(spark, SF, "orders")
    cu = t(spark, SF, "customer")
    na = t(spark, SF, "nation").filter("n_name = 'FRANCE'")
    exp = (
        li.join(cu, li.o_custkey == cu.c_custkey)
        .join(na, cu.c_nationkey == na.n_nationkey)
        .count()
    )
    assert row["n"] == exp
    assert spark.conf.get("spark.sql.cbo.enabled", None) == before
    leftover = [
        tb.name
        for tb in spark.catalog.listTables()
        if tb.name.startswith("cbo_")
    ]
    assert leftover == []


def test_crosstab_matches_counter_replay(spark):
    cnt: Counter = Counter()
    for r in (
        t(spark, SF, "events")
        .filter("user_id IS NOT NULL")
        .select("event_type", "user_id")
        .collect()
    ):
        cnt[(r["event_type"], str(r["user_id"] % 3))] += 1
    got = {
        (r["event_type"], r["seg"]): r["n"]
        for r in qml.Q["stat_api_crosstab"](spark, SF).collect()
    }
    assert got == dict(cnt)
    rows = qml.Q["stat_api_crosstab"](spark, SF).collect()
    assert all(r["freq_superset_ok"] for r in rows)
