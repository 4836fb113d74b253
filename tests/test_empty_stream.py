"""Empty-source totality for the streaming faces — the streaming
counterpart of test_empty_corpus.py's zero-row sweep. Two cases a
real deployment hits on day one of a new tenant:

1. zero-ROW source: the stream's input files exist but carry no rows
   (a filtered snapshot, an empty partition) — exercised through the
   registry faces themselves against the empty-table fixture;
2. zero-FILE source: the watched directory exists but holds no data
   files yet — exercised against the underlying streaming transforms
   with trigger(availableNow), which must terminate after zero
   batches and leave an empty (not broken) sink.

Faces may return zero rows; they may not raise and they may not hang.
"""

from __future__ import annotations

import itertools
import os

import pyarrow.parquet as pq
import pytest

from dbpedia_spotlight_db_spark.queries import QUERIES

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

STREAM_FACES = [k for k in QUERIES if k.startswith("stream_")]

_ids = itertools.count()


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_stream_sf")
    for name in TABLES:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{name}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{name}.parquet"))
    return str(d)


@pytest.mark.parametrize("key", STREAM_FACES)
def test_stream_face_is_total_on_zero_row_source(spark, empty_sf, key):
    rows = QUERIES[key](spark, empty_sf).collect()
    assert rows == []


def _run_available_now(df, tmp, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sessionize_stream_on_zero_file_dir(spark, tmp_path):
    from dbpedia_spotlight_db_spark.streaming.annotate_stream import (
        sessionize_stream,
    )

    schema = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).schema
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    name = f"empty_sess_{next(_ids)}"
    src = spark.readStream.schema(schema).parquet(str(src_dir))
    _run_available_now(sessionize_stream(src), str(tmp_path), name)
    assert spark.table(name).count() == 0


def test_dedup_stream_on_zero_file_dir(spark, tmp_path):
    from dbpedia_spotlight_db_spark.streaming.annotate_stream import (
        dedup_stream,
    )

    schema = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).schema
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    name = f"empty_dedup_{next(_ids)}"
    src = spark.readStream.schema(schema).parquet(str(src_dir))
    _run_available_now(
        dedup_stream(src, ["user_id", "event_type"]), str(tmp_path), name
    )
    assert spark.table(name).count() == 0


def test_enrich_stream_on_zero_file_dir(spark, tmp_path):
    from dbpedia_spotlight_db_spark.streaming.annotate_stream import (
        enrich_stream,
    )

    schema = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).schema
    dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    name = f"empty_enrich_{next(_ids)}"
    src = spark.readStream.schema(schema).parquet(str(src_dir))
    _run_available_now(enrich_stream(src, dim), str(tmp_path), name)
    assert spark.table(name).count() == 0


def test_upsert_stream_on_zero_file_dir(spark, tmp_path):
    """foreachBatch MERGE with a delta directory that never receives a
    file: the state must come back empty and merged(base) must reduce
    to the base relation (minus tombstones) instead of failing on a
    never-written state store."""
    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.streaming.upsert_stream import (
        compact_latest,
        run_upsert_stream,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e = events.select("user_id", "event_id", "ts", "event_type")
    base = compact_latest(e.filter(F.col("event_id") % 10 < 8))
    delta_dir = tmp_path / "delta"
    delta_dir.mkdir()
    state = run_upsert_stream(
        spark,
        str(delta_dir),
        e.schema,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    merged = state.merged(base)
    # no deltas: the merged store IS the base, verbatim (the 'error'
    # tombstone filter applies to delta winners only, matching the
    # batch crawl_upsert oracle where base rows pass the anti-join
    # unfiltered)
    assert merged.count() == base.count()
    assert merged.exceptAll(base).count() == 0


def test_join_streams_on_zero_file_dirs(spark, tmp_path):
    from dbpedia_spotlight_db_spark.streaming.annotate_stream import (
        join_streams,
    )

    schema = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).schema
    for d in ("c_in", "p_in"):
        (tmp_path / d).mkdir()
    name = f"empty_sjoin_{next(_ids)}"
    c = spark.readStream.schema(schema).parquet(str(tmp_path / "c_in"))
    p = spark.readStream.schema(schema).parquet(str(tmp_path / "p_in"))
    _run_available_now(join_streams(c, p), str(tmp_path), name)
    assert spark.table(name).count() == 0


def test_join_streams_horizon_bounds_matches(spark, tmp_path):
    """A purchase 3 days after the click joins; 3 days + 1 second (or
    before the click) does not — the eviction-bound predicate is also
    the business rule."""
    import datetime

    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.streaming.annotate_stream import (
        join_streams,
    )

    t0 = datetime.datetime(2024, 1, 10, 0, 0, 0)
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + datetime.timedelta(days=3), 7, "purchase", 1.0, "{}"),
        (3, t0 + datetime.timedelta(days=3, seconds=1), 7, "purchase", 1.0, "{}"),
        (4, t0 - datetime.timedelta(seconds=1), 7, "purchase", 1.0, "{}"),
        (5, t0 + datetime.timedelta(days=1), 8, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.filter(F.col("event_type") == "click").write.parquet(
        str(tmp_path / "c_in")
    )
    df.filter(F.col("event_type") == "purchase").write.parquet(
        str(tmp_path / "p_in")
    )
    schema = df.schema
    name = f"sjoin_horizon_{next(_ids)}"
    c = spark.readStream.schema(schema).parquet(str(tmp_path / "c_in"))
    p = spark.readStream.schema(schema).parquet(str(tmp_path / "p_in"))
    _run_available_now(join_streams(c, p), str(tmp_path), name)
    got = {(r.click_id, r.purchase_id) for r in spark.table(name).collect()}
    assert got == {(1, 2)}
