"""Wave-87 invariants: the PyDS reader's pushFilters actually prunes
partitions driver-side AND the residual plan keeps only the
unsupported predicate; the topk sketch-state chain equals exact
counts; the variant census matches a json replay."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
)

from dbpedia_spotlight_db_spark.queries import qio, qlake, qsketch
from dbpedia_spotlight_db_spark.queries.common import t
from dbpedia_spotlight_db_spark.sources.pushdown_ints import (
    PushdownIntsReader,
)

SF = "/root/testdata/sf0.001"


def test_pushdown_reader_prunes_partitions_unit():
    r = PushdownIntsReader({"n": "1000", "parts": "4"})
    assert len(r.partitions()) == 4
    residual = list(
        r.pushFilters(
            [GreaterThanOrEqual(("id",), 750), IsNotNull(("id",))]
        )
    )
    # the bound is consumed; IsNotNull is handed back to Spark
    assert residual == [IsNotNull(("id",))]
    parts = r.partitions()
    assert len(parts) == 1  # 3 of 4 ranges pruned at planning
    assert parts[0].value == (3, 750, 1000)
    rows = list(r.read(parts[0]))
    assert rows[0] == (750, 5250, 3) and len(rows) == 250
    # two-sided bound collapses to one partition slice
    r2 = PushdownIntsReader({"n": "1000", "parts": "4"})
    list(r2.pushFilters([EqualTo(("id",), 10), LessThan(("id",), 999)]))
    p2 = r2.partitions()
    assert len(p2) == 1
    assert list(r2.read(p2[0])) == [(10, 70, 0)]


def test_pushdown_face_plan_keeps_only_residual(spark):
    row = qlake.Q["pyds_filter_pushdown"](spark, SF).collect()[0]
    exp = [i for i in range(750, 1000) if i % 2 == 0]
    assert row["n"] == len(exp)
    assert row["cents_sum"] == sum(i * 7 for i in exp)
    assert row["n_parts"] == 1
    # rebuild the scan under the flag to inspect the residual Filter
    key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        from dbpedia_spotlight_db_spark.sources import pushdown_ints

        pushdown_ints.register(spark)
        df = (
            spark.read.format("pushdown_ints")
            .option("n", 1000)
            .option("parts", 4)
            .load()
            .filter((F.col("id") >= 750) & (F.col("id") % 2 == 0))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    fl = [ln for ln in plan.splitlines() if "Filter" in ln]
    assert fl, "expected a residual Filter node"
    assert "pmod" in fl[0] or "% 2" in fl[0]  # residual modulo kept
    assert ">= 750" not in fl[0]  # accepted bound NOT re-checked


def test_topk_state_chain_is_exact(spark):
    exact = {
        r["event_type"]: r["n"]
        for r in t(spark, SF, "events")
        .filter("event_type IS NOT NULL")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    got = {
        r["item"]: r["est"]
        for r in qsketch.Q["agg_topk_state"](spark, SF).collect()
    }
    assert got == exact


def test_variant_census_matches_json_replay(spark):
    agg: dict[str, list[int]] = {}
    for r in (
        t(spark, SF, "events")
        .filter("props IS NOT NULL")
        .select("props")
        .collect()
    ):
        for k, v in json.loads(r["props"]).items():
            a = agg.setdefault(k, [0, 0, 0])
            a[0] += 1
            if isinstance(v, int) and not isinstance(v, bool):
                a[1] += 1
                a[2] += v
    got = {
        r["key"]: (r["n"], r["n_int"], r["int_sum"])
        for r in qio.Q["json_variant_census"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
