"""Wave-80 invariants: the Spark-4 surfaces VERDICT r4 #7 named —
DataFrame.transpose, the statestore / state-metadata checkpoint
readers, posexplode_outer row preservation, barrier-mode
mapInPandas, and the native Datasketches HLL family."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qdata, qrel, qsketch, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_transpose_is_the_flipped_aggregate(spark):
    rows = {r["key"]: r for r in qsql.Q["sql_transpose"](spark, SF).collect()}
    base = {
        r["o_orderstatus"]: r
        for r in t(spark, SF, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .collect()
    }
    assert set(rows) == {"n", "cents"}
    for st in ("F", "O"):
        assert rows["n"][st] == base[st]["n"]
        assert rows["cents"][st] == base[st]["cents"]


def test_statestore_matches_batch_truth(spark):
    got = {
        r["event_type"]: (r["n"], r["cents"])
        for r in qrel.Q["scan_statestore"](spark, SF).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["cents"])
        for r in t(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_posexplode_outer_loses_no_documents(spark):
    r = qdata.Q["udtf_posexplode_outer"](spark, SF).collect()[0]
    n_docs_total = t(spark, SF, "documents").count()
    assert r["n_docs"] == n_docs_total          # every doc preserved
    assert r["n_rows"] == r["n_tokens"] + r["n_empty_docs"]
    assert r["n_empty_docs"] > 0                # the outer case bites


def test_barrier_equals_unbarriered_plan(spark):
    # barrier changes scheduling, never data: same aggregate both ways
    got = {
        (r["event_type"]): (r["n"], r["cents"])
        for r in qdata.Q["udf_map_barrier"](spark, SF).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["cents"])
        for r in t(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_hll_native_certificates_hold(spark):
    r = qsketch.Q["agg_hll_native"](spark, SF).collect()[0]
    assert r["true_distinct"] > 0
    assert r["within_5pct"] is True
    assert r["merge_consistent"] is True
