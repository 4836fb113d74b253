"""Structured Streaming faces (SURVEY.md §1.1 notes the reference has
no streams — it is a request/response service; north_rule is batch).
These are the production analogues of that service loop, kept
deliberately thin:

- ``annotate_stream``: "annotate pages as they arrive" — the SAME
  map-only fused pass (broadcast model + mapInPandas) applied to a
  streaming pages source. The pass is stateless, so it needs no
  watermark or state store; end-to-end exactly-once comes from the
  sink + checkpoint location (Spark's streaming commit protocol), the
  streaming twin of the batch pipeline's idempotent-overwrite rule.
- ``windowed_event_counts``: the generic watermark + windowed
  aggregation capability over the ``events`` table shape (late rows
  beyond the watermark are dropped; state is bounded by
  window + watermark).

Both are tested against their batch equivalents with
``trigger(availableNow=True)`` (tests/test_streaming.py) — streaming
result == batch result on the same input is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def annotate_stream(
    spark: SparkSession,
    pages_stream: DataFrame,
    stores: dict,
    cfg=None,
    model_bc=None,
) -> DataFrame:
    """Streaming P1+P2: lang-route -> fused annotate (broadcast model,
    zero shuffles) over a streaming pages DataFrame. Returns the
    streaming annotations relation; attach a sink with
    ``.writeStream.option("checkpointLocation", ...)``."""
    from ..plans.annotate import AnnotateConfig
    from ..plans.annotate_fused import annotate_fused

    return annotate_fused(
        spark, pages_stream, stores, cfg or AnnotateConfig(), model_bc
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window_dur: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type. State per
    key is dropped once the watermark passes the window end, so
    memory is bounded regardless of stream length. ``ts`` is cast to
    session-tz TIMESTAMP (watermarks reject TIMESTAMP_NTZ, which is
    what the fixture parquet carries)."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_dur).alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
        )
    )
