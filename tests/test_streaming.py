"""Structured Streaming faces == their batch equivalents on the same
input (trigger availableNow, memory sink). The streaming annotate pass
is the identical fused plan, so set-equality with batch is the oracle."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.streaming import (
    annotate_stream,
    windowed_event_counts,
)


def test_windowed_event_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    shutil.copytree(
        "/root/testdata/sf0.001", src,
        ignore=lambda d, names: [n for n in names if n != "events.parquet"],
    )
    batch = spark.read.parquet(f"{src}/events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(src)

    agg = windowed_event_counts(stream, "1 hour", "2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("evt_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win_start, r.event_type): r.n
        for r in spark.table("evt_counts").collect()
    }
    want = {
        (r.win_start, r.event_type): r.n
        for r in batch.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
        .collect()
    }
    assert got == want and got


def test_annotate_stream_equals_batch(spark, tmp_path, pages_df, stores):
    from dbpedia_spotlight_db_spark.plans.annotate import AnnotateConfig
    from dbpedia_spotlight_db_spark.plans.annotate_fused import (
        annotate_fused,
        build_model,
    )

    src = str(tmp_path / "pages_src")
    small = pages_df.limit(40)
    small.write.mode("overwrite").parquet(src)
    model_bc = spark.sparkContext.broadcast(build_model(stores))
    cfg = AnnotateConfig()

    stream = spark.readStream.schema(small.schema).parquet(src)
    ann = annotate_stream(spark, stream, stores, cfg, model_bc)
    assert ann.isStreaming
    q = (
        ann.writeStream.format("memory")
        .queryName("ann_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def keys(df):
        return {
            (r.url, r.start, r.end, r.surface_form, r.uri)
            for r in df.collect()
        }

    got = keys(spark.table("ann_stream"))
    want = keys(
        annotate_fused(
            spark, spark.read.parquet(src), stores, cfg, model_bc
        )
    )
    assert got == want and got
