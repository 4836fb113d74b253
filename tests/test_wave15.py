"""Wave-15 invariants: the session_window boundary at exactly the
gap (half-open windows), first/last argmin determinism, and the
mapInPandas iterator face.
"""

from __future__ import annotations

import datetime

from dbpedia_spotlight_db_spark.queries import qdata, qrel

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ev(i, user, etype, us):
    return (i, BASE + datetime.timedelta(microseconds=us), user, etype, 1.0, "{}")


def test_session_window_boundary_gap_end_is_closed(spark, tmp_path):
    GAP_US = 3600 * 1_000_000
    rows = [
        # user 1: second event at EXACTLY last + gap -> MERGED (Spark's
        # session_window closes the gap end; the oracle's strict
        # `diff > gap` mirrors it)
        _ev(1, 1, "click", 0), _ev(2, 1, "click", GAP_US),
        # user 2: one microsecond past the gap -> two sessions
        _ev(3, 2, "click", 0), _ev(4, 2, "click", GAP_US + 1),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = qrel.Q["win_session_window"](spark, str(tmp_path)).toPandas()
    by_user = got.groupby("user_id").size()
    assert by_user[1] == 1
    assert got[got["user_id"] == 1]["n_events"].iloc[0] == 2
    assert by_user[2] == 2


def test_first_last_ties_break_on_event_id(spark, tmp_path):
    rows = [
        # same second, increasing event_id: first/last decided by id
        _ev(10, 1, "view", 500_000), _ev(11, 1, "click", 900_000),
        _ev(12, 1, "purchase", 100_000),  # same whole second as the others
        _ev(20, 2, "signup", 0),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        r.user_id: r
        for r in qrel.Q["agg_first_last"](spark, str(tmp_path)).collect()
    }
    # all three of user 1's events truncate to the same second, so the
    # composite key falls back to event_id: first=10 (view), last=12
    assert got[1].first_type == "view"
    assert got[1].last_type == "purchase"
    assert got[1].span_s == 0
    assert got[2].first_type == got[2].last_type == "signup"


def test_map_iter_counts_types_vs_tokens(spark, tmp_path):
    docs = [
        (1, "a b a b a", "en", "s", 9),
        (2, "unique words only here", "en", "s", 22),
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: r
        for r in qdata.Q["udf_map_iter"](spark, str(tmp_path)).collect()
    }
    assert (got[1].n_tokens, got[1].n_types) == (5, 2)
    assert (got[2].n_tokens, got[2].n_types) == (4, 4)
