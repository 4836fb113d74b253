"""Wave-82 invariants: AQE skew-join split actually FIRES on the
deliberately skewed join (the join_dpp discipline: a scale-mechanism
face must prove its mechanism, not just its values), and the
approx_percentile certificate face reads its checkpoint and keeps
the GK rank bound."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qio, qsketch
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"

_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_skew_join_split_fires(spark):
    # replicate the face's internal join under the same confs and pin
    # the mechanism markers in the final adaptive plan
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    try:
        for k, v in _SKEW_CONFS.items():
            spark.conf.set(k, v)
        e = t(spark, SF, "events").select(
            F.when(F.col("event_id") % 10 < 8, F.lit("hot"))
            .otherwise(F.col("event_type"))
            .alias("k"),
            "event_id",
        )
        amp = e.select(
            "k",
            "event_id",
            F.explode(F.sequence(F.lit(1), F.lit(64))).alias("rep"),
        ).repartition(8)
        with tempfile.TemporaryDirectory(prefix="skewtest_") as tmp:
            dimp = os.path.join(tmp, "dim")
            e.select("k").distinct().withColumn(
                "tag", F.length("k")
            ).write.parquet(dimp)
            dim = spark.read.parquet(dimp)
            out = amp.join(dim, "k").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("event_id") + F.col("tag"))
                .cast("long")
                .alias("s"),
            )
            rows = out.collect()
            plan = (
                out._jdf.queryExecution().executedPlan().toString()
            )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "skew=true" in plan, "OptimizeSkewedJoin did not fire"
    assert "AQEShuffleRead skewed" in plan
    # and splitting never changes values: closed form of the join
    base = t(spark, SF, "events").select(
        (
            F.col("event_id")
            + F.length(
                F.when(F.col("event_id") % 10 < 8, F.lit("hot")).otherwise(
                    F.col("event_type")
                )
            )
        ).alias("v")
    )
    want = base.agg(
        (64 * F.count(F.lit(1))).cast("long").alias("n"),
        (64 * F.sum("v")).cast("long").alias("s"),
    ).collect()[0]
    assert (rows[0]["n"], rows[0]["s"]) == (want["n"], want["s"])


def test_skew_face_values_match_closed_form(spark):
    got = qio.Q["join_skew_aqe"](spark, SF).collect()[0]
    base = t(spark, SF, "events").select(
        (
            F.col("event_id")
            + F.length(
                F.when(F.col("event_id") % 10 < 8, F.lit("hot")).otherwise(
                    F.col("event_type")
                )
            )
        ).alias("v")
    )
    want = base.agg(
        (64 * F.count(F.lit(1))).cast("long").alias("n"),
        (64 * F.sum("v")).cast("long").alias("s"),
    ).collect()[0]
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_approx_pctl_cert_bound_and_checkpoint(spark):
    df = qsketch.Q["agg_approx_pctl_cert"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("events.parquet") == 0, (
        "cents relation must be checkpointed — raw events scanned"
    )
    r = df.collect()[0]
    assert r["rank_ok"] is True
    cents = sorted(
        x.cents
        for x in t(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select(F.round(F.col("value") * 100).cast("long").alias("cents"))
        .collect()
    )
    assert r["n"] == len(cents)
    assert r["exact_median"] == cents[(len(cents) + 1) // 2 - 1]
