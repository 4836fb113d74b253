"""Wave-108 invariants: localCheckpoint really truncates lineage
(no source scan survives in the plan) while values equal the direct
aggregate; .to(schema) reorders, upcasts, and pins the exact target
schema."""

from __future__ import annotations

from pyspark.sql.types import LongType

from dbpedia_spotlight_db_spark.queries import qio
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_local_checkpoint_truncates_and_matches(spark):
    df = qio.Q["scan_local_checkpoint"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "orders.parquet" not in plan
    rows = df.collect()
    assert rows and all(r["lineage_truncated"] for r in rows)
    exp = {}
    for r in t(spark, SF, "orders").collect():
        n, c = exp.get(r["o_orderpriority"], (0, 0))
        exp[r["o_orderpriority"]] = (
            n + 1,
            c + round(r["o_totalprice"] * 100),
        )
    got = {r["o_orderpriority"]: (r["n"], r["cents"]) for r in rows}
    assert got == exp


def test_schema_enforce_reorders_and_upcasts(spark):
    df = qio.Q["sql_schema_enforce"](spark, SF)
    assert df.columns == ["p_size", "p_partkey", "brand", "schema_ok"]
    assert isinstance(df.schema["p_size"].dataType, LongType)
    rows = df.collect()
    assert rows and all(r["schema_ok"] for r in rows)
    exp = {
        r["p_partkey"]: (int(r["p_size"]), r["p_brand"].upper())
        for r in t(spark, SF, "part").collect()
    }
    got = {r["p_partkey"]: (r["p_size"], r["brand"]) for r in rows}
    assert got == exp
