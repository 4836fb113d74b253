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


def sessionize_stream(
    events_stream: DataFrame, gap_seconds: int = 43200
) -> DataFrame:
    """Custom STATEFUL streaming operator via applyInPandasWithState:
    per-user sessionization (maximal runs with consecutive gaps <=
    ``gap_seconds``). The open session rides in the group state
    (start/last/n as epoch seconds) across micro-batches; a session is
    EMITTED when a later event closes it by exceeding the gap. The
    batch twin is queries/qrel.events_sessionize (lag + cumsum
    windows); tests/test_streaming.py proves the streamed closed
    sessions equal the batch sessions minus each user's final (still
    open) one, driving multiple micro-batches via maxFilesPerTrigger
    so state genuinely crosses batch boundaries.

    Contract: events arrive in ts order PER KEY across micro-batches
    (a time-bucketed file source or per-key-ordered log like a Kafka
    partition). Out-of-order sources need the event-time session
    window + watermark formulation instead."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events int"
    )
    # epoch MICROSECONDS as int64 — float seconds lose sub-microsecond
    # precision at 2024 epochs and fail Arrow's safe timestamp cast.
    # The gap test compares WHOLE SECONDS (integer division), mirroring
    # the batch twin's unix_timestamp()/date_diff('second') truncation —
    # sub-second gap boundaries must agree across the twins.
    state_schema = "start long, last long, n int"

    def fn(key, pdfs, state):
        (user_id,) = key
        ts_list: list[int] = []
        for pdf in pdfs:
            # applyInPandasWithState delivers session-tz-naive
            # datetime64[ns] wall clocks; keep everything naive so the
            # round-trip is tz-independent (the session tz is pinned
            # to UTC in session.py anyway)
            col = pdf["ts"]
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_localize(None)
            ts_list.extend(int(v) // 1000 for v in col.astype("int64"))
        ts_list.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        out = []
        for ts in ts_list:
            if start is None:
                start, last, n = ts, ts, 1
            elif ts // 1_000_000 - last // 1_000_000 > gap_seconds:
                out.append((user_id, start, last, n))
                start, last, n = ts, ts, 1
            else:
                last, n = ts, n + 1
        state.update((int(start), int(last), int(n)))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": pd.to_datetime(
                        [o[1] for o in out], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "n_events": pd.Series(
                        [o[3] for o in out], dtype="int32"
                    ),
                }
            )

    return (
        events_stream.filter(F.col("ts").isNotNull())  # NaT crashes int64
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.NoTimeout,
        )
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


def dedup_stream(
    events_stream: DataFrame,
    keys: list[str],
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming EXACT DEDUP: emit each key's first-seen row, drop
    every later arrival. The training-data use is content-hash dedup
    of an unbounded document feed (key = hash of the text); the state
    store holds one entry per distinct key.

    Scale note on state growth: with a plain ``dropDuplicates`` the
    state is the full distinct-key set — unbounded on an infinite
    stream, because Spark only evicts dropDuplicates state when the
    watermarked event-time column is ITSELF one of the dedup keys
    (which it isn't here: the keys are content hashes, not times).
    ``dropDuplicatesWithinWatermark`` is the operator built for this
    shape: dedup on arbitrary keys, state evicted once a key's event
    time falls behind the watermark — so "duplicate" is only promised
    within the watermark horizon. That horizon IS the contract a
    crawl pipeline wants — a re-crawl months later is a new snapshot,
    not a dup.

    ``ts`` cast as in the other faces (watermarks reject the
    fixture's TIMESTAMP_NTZ)."""
    return (
        events_stream.filter(F.col("ts").isNotNull())
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join — the canonical Structured
    Streaming shape for attaching a slowly-changing dimension to an
    event stream (user -> geo/account attributes here; entity -> type
    table in the KG pipeline). The static side is broadcast per
    micro-batch (Spark re-plans the static relation each batch, so a
    refreshed dim table is picked up without restarting the query);
    the stream side stays append-mode stateless — no watermark, no
    state store, unbounded uptime. Keyed on user_id % 25 to hit the
    25-row nation fixture."""
    d = F.broadcast(dim.select("n_nationkey", "n_name"))
    return (
        events.withColumn("nk", (F.col("user_id") % 25).cast("long"))
        .join(d, F.col("nk") == F.col("n_nationkey"))
        .select("event_id", "user_id", "n_name", "event_type")
    )


def make_running_counter():
    """Build the TWS StatefulProcessor for running_counts_tws.
    Factory (not module-level class) because the StatefulProcessor
    base only imports cleanly where pyspark's streaming extras are
    importable; the processor LOGIC is unit-tested against a fake
    ValueState in tests/test_streaming_tws.py, which is the testable
    seam in this sandbox (see running_counts_tws docstring)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    class RunningCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState("tot", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            cents = 0
            import numpy as np

            for pdf in rows:
                n += len(pdf)
                # round PER EVENT, then sum ints: batch-split
                # independent (rounding a per-batch float sum would
                # make the running total depend on trigger boundaries).
                # HALF-UP (away from zero), NOT pandas' .round():
                # numpy/pandas round half-to-even, so value=0.125
                # would give 12 cents here but 13 in the Spark/DuckDB
                # batch twin (both round half away from zero) — the
                # running==batch equality must hold on .5 boundaries
                x = pdf["value"].to_numpy() * 100.0
                cents += int(
                    (np.sign(x) * np.floor(np.abs(x) + 0.5)).sum()
                )
            if self._tot.exists():
                prev_n, prev_c = self._tot.get()
                n += int(prev_n)
                cents += int(prev_c)
            self._tot.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    return RunningCounter()


def running_counts_tws(events_stream: DataFrame) -> DataFrame:
    """Per-user running event counter on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    applyInPandasWithState (sessionize_stream above keeps the classic
    shape for contrast): state is DECLARED as named, schema-typed
    variables on a StatefulProcessorHandle (ValueState here; the API
    adds ListState/MapState, timers and TTL) instead of riding in one
    opaque tuple, and the runtime requires the RocksDB state store —
    the disk-spillable store a 10^12-key corpus needs anyway (the
    in-memory HDFS-backed store holds every key in executor heap).
    Emits (user_id, n_events, value_cents) running totals each time a
    micro-batch touches the user; the latest row per user equals the
    batch groupBy totals. Money is accumulated in exact integer
    cents — state that drifts per batch under float addition would
    break that equality.

    SANDBOX SEAM: TWS's state server speaks protobuf between the JVM
    and a Python driver worker, and `google.protobuf` is not
    installed here (no pip allowed) — the end-to-end query raises
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE at start. The
    operator is complete and the processor logic is fully unit-tested
    against a fake ValueState; tests/test_streaming_tws.py skips the
    end-to-end leg iff `google.protobuf` is missing, so it activates
    automatically on a real cluster image."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_counter(),
        outputStructType="user_id long, n_events long, value_cents long",
        outputMode="Update",
        timeMode="None",
    )


def join_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_days: int = 3,
    watermark: str = "1 day",
) -> DataFrame:
    """STREAM-STREAM inner join — the last Structured Streaming join
    shape the engine exercises (enrich_stream covers stream-static):
    click events joined to the purchase events that follow them
    within a bounded horizon, both sides unbounded. The event-time
    RANGE condition is what makes the state finite: with watermarks
    on both inputs and `p_ts BETWEEN c_ts AND c_ts + horizon`, Spark
    derives a state-eviction bound for each side (a click older than
    watermark + horizon can never match a future purchase and is
    dropped from the state store) — without the range predicate the
    join would have to buffer both streams forever. Inner join +
    trigger(availableNow) emits exactly the batch-join row set, so
    the DuckDB twin is the equivalent self-join with the same bounds.
    ``ts`` cast as in the other faces (watermarks reject the
    fixture's TIMESTAMP_NTZ)."""
    c = (
        clicks.filter(F.col("ts").isNotNull())
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    p = (
        purchases.filter(F.col("ts").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return c.join(
        p,
        F.expr(
            "p_user = c_user AND p_ts >= c_ts "
            f"AND p_ts <= c_ts + INTERVAL {horizon_days} DAYS"
        ),
    ).select("click_id", "purchase_id", F.col("c_user").alias("user_id"))


def semi_join_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_days: int = 3,
    watermark: str = "1 day",
) -> DataFrame:
    """STREAM-STREAM LEFT SEMI join — the existence filter shape
    (emit each click that a purchase followed within the horizon,
    WITHOUT duplicating the click per matching purchase and without
    carrying right-side columns): the streaming spelling of EXISTS,
    the conversion-filter feed. Same bounded-state geometry as
    join_streams (watermarks on both inputs + the event-time range
    predicate give both state stores a provable eviction bound); the
    semi join's own discipline is emit-once — a buffered click is
    released the first time a match arrives and never again, and an
    unmatched click is silently dropped when the watermark proves no
    future match, so no sentinel flush is needed for the MATCHED set
    under a single availableNow batch: the output is exactly the
    batch semi-join row set and the DuckDB twin is a plain EXISTS."""
    c = (
        clicks.filter(F.col("ts").isNotNull())
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    p = (
        purchases.filter(F.col("ts").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return c.join(
        p,
        F.expr(
            "p_user = c_user AND p_ts >= c_ts "
            f"AND p_ts <= c_ts + INTERVAL {horizon_days} DAYS"
        ),
        "left_semi",
    ).select("click_id", F.col("c_user").alias("user_id"))


def outer_join_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_days: int = 3,
    watermark: str = "1 hour",
    how: str = "leftOuter",
) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join — the join shape that reports
    the NON-converting clicks too (the funnel-drop feed: every click
    row, with purchase columns NULL when nothing followed within the
    horizon). Same bounded-state geometry as join_streams — both
    sides watermarked, event-time range predicate — plus the outer
    join's extra discipline: a click can only be emitted as UNMATCHED
    once the purchase-side watermark proves no future match is
    possible (p_watermark > c_ts + horizon), so outer rows trail the
    inner rows by up to horizon + watermark delay. Under
    trigger(availableNow) that means the LAST horizon of clicks would
    terminate still buffered — the stream_outer_join face pushes the
    final watermark past the data with sentinel rows (the standard
    end-of-stream flush for bounded replays) to make the output the
    exact batch left-join row set. ``ts`` cast as in the other faces
    (watermarks reject the fixture's TIMESTAMP_NTZ)."""
    c = (
        clicks.filter(F.col("ts").isNotNull())
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    p = (
        purchases.filter(F.col("ts").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return c.join(
        p,
        F.expr(
            "p_user = c_user AND p_ts >= c_ts "
            f"AND p_ts <= c_ts + INTERVAL {horizon_days} DAYS"
        ),
        how,
    ).select(
        "click_id",
        "purchase_id",
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
    )
