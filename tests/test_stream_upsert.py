"""Invariants for the foreachBatch streaming MERGE
(streaming/upsert_stream.py + the stream_upsert face): multi-epoch
execution really happens, chunking does not change the final state
(associativity), and the streamed state equals the batch crawl_upsert
answer row-for-row.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus
from dbpedia_spotlight_db_spark.queries.common import t
from dbpedia_spotlight_db_spark.streaming.upsert_stream import (
    compact_latest,
    run_upsert_stream,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.user_id, r.event_id, r.ts, r.event_type) for r in df.collect()
    )


def test_streamed_state_equals_batch_merge_and_is_multi_epoch(spark, tmp_path):
    e = t(spark, SF, "events").select("user_id", "event_id", "ts", "event_type")
    base = compact_latest(e.filter(F.col("event_id") % 10 < 8))
    delta_log = e.filter(F.col("event_id") % 10 >= 8)
    delta_dir = str(tmp_path / "delta")
    delta_log.repartition(3).write.parquet(delta_dir)

    state = run_upsert_stream(
        spark, delta_dir, delta_log.schema,
        str(tmp_path / "state"), str(tmp_path / "ckpt"),
    )
    # maxFilesPerTrigger=1 over a 3-file spool => >=3 real epochs
    assert state.generations >= 3
    got = _rows(state.merged(base))
    assert got == _rows(qcorpus.Q["crawl_upsert"](spark, SF))

    # associativity: the same delta in ONE epoch gives the same state
    one = run_upsert_stream(
        spark, delta_dir, delta_log.schema,
        str(tmp_path / "state1"), str(tmp_path / "ckpt1"),
        max_files_per_trigger=64,
    )
    assert one.generations == 1
    assert _rows(one.merged(base)) == got


def test_tombstones_delete_but_stay_as_state_markers(spark, tmp_path):
    import datetime

    rows = [
        # base: user 1 and 2 exist
        (10, datetime.datetime(2024, 1, 1), 1, "view"),
        (11, datetime.datetime(2024, 1, 1), 2, "view"),
        # delta file A: tombstone user 1
        (18, datetime.datetime(2024, 1, 2), 1, "error"),
        # delta file B: later re-fetch resurrects user 1, upserts user 2
        (28, datetime.datetime(2024, 1, 3), 1, "click"),
        (29, datetime.datetime(2024, 1, 3), 2, "purchase"),
    ]
    df = spark.createDataFrame(
        [(r[2], r[0], r[1], r[3]) for r in rows],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    base = compact_latest(df.filter(F.col("event_id") < 18))
    for i, lo, hi in ((0, 18, 28), (1, 28, 99)):
        df.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(
            1
        ).write.parquet(os.path.join(tmp_path, "delta", f"f{i}"))
    state = run_upsert_stream(
        spark, str(tmp_path / "delta" / "f0"), df.schema,
        str(tmp_path / "state"), str(tmp_path / "ckpt"),
    )
    # after only the tombstone epoch: user 1 deleted, user 2 intact
    assert _rows(state.merged(base)) == [
        (2, 11, rows[1][1], "view")
    ]
    # feed the second file through a new stream sharing the state
    state2 = run_upsert_stream(
        spark, str(tmp_path / "delta" / "f1"), df.schema,
        str(tmp_path / "state2"), str(tmp_path / "ckpt2"),
    )
    # merge the two delta states by replaying f1 onto state: emulate by
    # unioning the generations (the production path keeps ONE state dir)
    merged_delta = compact_latest(
        state.delta().unionByName(state2.delta())
    )
    kept = base.join(merged_delta.select("user_id"), "user_id", "left_anti")
    final = kept.unionByName(
        merged_delta.filter(F.col("event_type") != "error")
    )
    assert _rows(final) == [
        (1, 28, rows[3][1], "click"),
        (2, 29, rows[4][1], "purchase"),
    ]
