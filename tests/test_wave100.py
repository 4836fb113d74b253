"""Wave-100 invariants: AQE coalescing earned its booleans and
restored the conf; the histogram sketch in its exact regime equals
the plain GROUP BY; catalog column stats equal the data they
summarize and the table is dropped; the MLlib pipeline equals the
rank/CASE replay."""

from __future__ import annotations

from collections import Counter

from dbpedia_spotlight_db_spark.queries import qlake, qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_aqe_coalesce_earned_and_restored(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    rows = qlake.Q["agg_aqe_coalesce"](spark, SF).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert rows and all(r["coalesced"] for r in rows)
    assert all(r["parts_bounded"] for r in rows)
    exp = {
        (r["o_orderpriority"], r["count"])
        for r in t(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    assert {(r["o_orderpriority"], r["n"]) for r in rows} == exp


def test_hist_numeric_exact_regime(spark):
    cnt = Counter(
        int(r["l_quantity"]) for r in t(spark, SF, "lineitem").collect()
    )
    got = {
        r["qty"]: r["n"]
        for r in qlake.Q["agg_hist_numeric"](spark, SF).collect()
    }
    assert got == dict(cnt)


def test_column_stats_truthful_and_dropped(spark):
    rows = {
        (r["col_name"], r["stat"]): r["value"]
        for r in qsql.Q["sql_column_stats"](spark, SF).collect()
    }
    orders = t(spark, SF, "orders").collect()
    keys = [r["o_custkey"] for r in orders]
    prios = [r["o_orderpriority"] for r in orders]
    assert rows[("o_custkey", "min")] == min(keys)
    assert rows[("o_custkey", "max")] == max(keys)
    assert rows[("o_custkey", "num_nulls")] == sum(
        1 for k in keys if k is None
    )
    assert rows[("o_orderpriority", "max_col_len")] == max(
        len(p.encode()) for p in prios
    )
    leftover = [
        tb.name
        for tb in spark.catalog.listTables()
        if tb.name.startswith("spark_graft_colstats_")
    ]
    assert leftover == []


def test_mllib_pipeline_matches_replay(spark):
    orders = t(spark, SF, "orders").collect()
    freq = Counter(r["o_orderpriority"] for r in orders)
    order = sorted(freq, key=lambda lab: (-freq[lab], lab))
    idx = {lab: i for i, lab in enumerate(order)}

    def bucket(p):
        return 0 if p < 50000.0 else (1 if p < 150000.0 else 2)

    expect = {
        r["o_orderkey"]: (idx[r["o_orderpriority"]], bucket(r["o_totalprice"]))
        for r in orders
    }
    got = {
        r["o_orderkey"]: (r["prio_idx"], r["bucket"])
        for r in qml.Q["mllib_feature_pipeline"](spark, SF).collect()
    }
    assert got == expect
