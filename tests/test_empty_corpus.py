"""Totality sweep: every registered query face must execute — plan,
run, collect — on an EMPTY corpus (all ten tables present with the
right schemas, zero rows). Empty inputs are not hypothetical at
10^12-document scale: a partition-pruned scan, a new tenant, a
filtered snapshot, or a dry-run all hand operators zero rows, and
the two ANSI DIVIDE_BY_ZERO crashes found in review (drift_chi2,
kg_assortativity) show 'works on the fixture' does not imply 'total
on empty'. Faces are allowed to return zero rows (most do) — they
are not allowed to raise.

Streaming faces are exercised by their own harnesses; this sweep
covers every batch face in the registry.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# faces whose CONTRACT requires non-empty side inputs (documented):
# none currently — keep the set empty so any new exception is loud
KNOWN_PARTIAL: dict[str, str] = {}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for name in TABLES:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{name}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{name}.parquet"))
    return str(d)


def _batch_faces():
    from dbpedia_spotlight_db_spark.queries import QUERIES

    return [(k, fn) for k, fn in QUERIES.items() if not k.startswith("stream_")]


@pytest.mark.parametrize("key,fn", _batch_faces(), ids=[k for k, _ in _batch_faces()])
def test_face_is_total_on_empty_corpus(spark, empty_sf, key, fn):
    if key in KNOWN_PARTIAL:
        pytest.skip(KNOWN_PARTIAL[key])
    rows = fn(spark, empty_sf).collect()
    assert isinstance(rows, list)


def test_pandas_udf_faces_propagate_null_text(spark, tmp_path):
    """NULL text must flow through the Arrow UDF faces as NULL (the
    SQL twins' len(NULL) semantics), not crash pandas .map(len) on
    the NaN a null becomes. The synthetic fixture has no null texts,
    which is exactly why this needs its own fixture."""
    from dbpedia_spotlight_db_spark.queries import QUERIES

    rows = [
        (1, "hello world foo", "en", "s", 15),
        (2, None, "en", "s", 0),
        (3, "a b a", "de", "s", 5),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = {
        r.doc_id: r.n_tokens
        for r in QUERIES["udf_scalar"](spark, str(tmp_path)).collect()
    }
    assert got == {1: 3, 2: None, 3: 3}

    got2 = {
        r.doc_id: (r.n_tokens, r.n_types)
        for r in QUERIES["udf_map_iter"](spark, str(tmp_path)).collect()
    }
    assert got2 == {1: (3, 3), 2: (None, None), 3: (3, 2)}


def test_events_faces_total_under_null_ts_value_props(spark, tmp_path):
    """A null ts / value / props row must not crash any events face
    (most filter nulls explicitly; the rest group them). Totality
    only — cross-engine parity under nulls is governed by the
    fixture contract, which has none."""
    import datetime

    from dbpedia_spotlight_db_spark.queries import QUERIES

    rows = [
        (1, datetime.datetime(2024, 1, 1, 8), 1, "click", 1.0, '{"k": 5}'),
        (2, None, 1, "view", 2.0, None),
        (3, datetime.datetime(2024, 1, 3, 9), 2, "purchase", None, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    import os

    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", f"{tmp_path}/{t}.parquet"
        )
    keys = [
        "events_gapfill", "win_trailing_range", "events_outliers",
        "events_transitions", "events_sessionize", "events_funnel",
        "retention_cohorts", "events_rolling_dau", "events_intervals",
        "win_streaks", "win_rank_fns", "win_session_window",
        "agg_first_last", "pivot_events", "join_range", "join_interval",
        "join_asof", "json_fns", "json_variant", "unpivot_events",
        "udf_cogrouped", "win_moving_avg", "agg_histogram", "stat_corr",
    ]
    for k in keys:
        QUERIES[k](spark, str(tmp_path)).collect()
