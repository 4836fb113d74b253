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
    assert q.awaitTermination(120)
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
    assert q.awaitTermination(180)

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


def test_sessionize_stream_state_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted
    by the stream == batch sessions minus each user's final (still
    open) session. maxFilesPerTrigger=1 over range-partitioned files
    forces multiple micro-batches, so the open session genuinely
    rides in group state across batches."""
    from dbpedia_spotlight_db_spark.queries.qrel import events_sessionize
    from dbpedia_spotlight_db_spark.streaming.annotate_stream import (
        sessionize_stream,
    )

    src = str(tmp_path / "events_src")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # the operator's contract is in-order arrival per key across
    # micro-batches (a time-bucketed source); FileStreamSource orders
    # files by modification time, so write each time slice as its own
    # append with a distinct mtime
    import time as _time

    from pyspark.sql import functions as _F

    cuts = ev.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), array(0.25, 0.5, 0.75)) as p"
    ).collect()[0].p
    bounds = [float("-inf")] + list(cuts) + [float("inf")]
    for i in range(4):
        sl = ev.filter(
            (_F.unix_micros(_F.col("ts").cast("timestamp")) > bounds[i])
            & (_F.unix_micros(_F.col("ts").cast("timestamp")) <= bounds[i + 1])
        )
        sl.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert q.lastProgress is not None

    def norm(rows):
        return {
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in rows
        }

    got = norm(spark.table("sess_stream").collect())

    batch = events_sessionize(spark, "/root/testdata/sf0.001").collect()
    last_sid = {}
    for r in batch:
        last_sid[r.user_id] = max(last_sid.get(r.user_id, 0), r.session_id)
    want = norm(
        [r for r in batch if r.session_id != last_sid[r.user_id]]
    )
    assert got == want and got


def test_enrich_stream_across_batches(spark, tmp_path):
    """Stream-static join: the dimension attaches correctly in EVERY
    micro-batch (maxFilesPerTrigger=1 forces multiple batches), and
    the final appended set equals the batch join."""
    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.streaming.annotate_stream import enrich_stream

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    src = str(tmp_path / "events_src")
    e.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        enrich_stream(stream, dim)
        .writeStream.format("memory")
        .queryName("enrich_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = {
        (r.event_id, r.user_id, r.n_name, r.event_type)
        for r in spark.table("enrich_stream_t").collect()
    }
    want = {
        (r.event_id, r.user_id, r.n_name, r.event_type)
        for r in e.join(
            dim, dim.n_nationkey == (e.user_id % 25).cast("long")
        ).collect()
    }
    assert got == want and got


def test_stream_checkpoint_resume_exactly_once(spark, tmp_path):
    """Kill-and-resume on the streaming side: a second availableNow
    run against the SAME checkpoint processes only files that arrived
    after the first run — previously-committed batches are never
    re-emitted (file-sink exactly-once), mirroring the batch
    pipeline's resumability invariant (BASELINE.md)."""
    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.streaming.annotate_stream import enrich_stream

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = e.filter(F.col("event_id") % 3 != 0)
    late = e.filter(F.col("event_id") % 3 == 0)
    first.write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(e.schema).parquet(src)
        q = (
            enrich_stream(stream, dim)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()

    # new files land; the resumed query picks up ONLY the delta
    late.write.mode("append").parquet(src)
    run_once()

    got = spark.read.parquet(out)
    assert got.count() == e.count()  # every event exactly once
    assert (
        got.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
    )
