"""Round-trip faces must survive hostile content — delimiters,
quotes, newlines, unicode — not just the fixture word soup; plus the
interval-join overlap semantics on a crafted timeline.
"""

from __future__ import annotations

import datetime

from dbpedia_spotlight_db_spark.queries import qio, qrel

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

HOSTILE = [
    (1, 'comma, "quote" and \'single\'', "en", "s,1", 25),
    (2, "embedded\nnewline\r\nand\ttab", "de", 's"2', 24),
    (3, "unicode éè中文 \U0001f600", "zh", "s3", 12),
    (4, "", "en", "s,1", 0),
    (5, "trailing backslash \\", "en", "s3", 20),
]


def _write_docs(spark, tmp_path):
    spark.createDataFrame(HOSTILE, DOCS_SCHEMA).write.parquet(
        f"{tmp_path}/documents.parquet"
    )


def _expected_by_source(spark, tmp_path):
    import collections

    agg = collections.defaultdict(lambda: [0, 0])
    for r in HOSTILE:
        agg[r[3]][0] += 1
        agg[r[3]][1] = max(agg[r[3]][1], r[4])
    return dict(agg)


def test_csv_roundtrip_survives_hostile_text(spark, tmp_path):
    _write_docs(spark, tmp_path)
    got = {
        r.source: (r.n_docs, r.max_chars)
        for r in qio.Q["csv_roundtrip"](spark, str(tmp_path)).collect()
    }
    want = {
        k: (v[0], v[1]) for k, v in _expected_by_source(spark, tmp_path).items()
    }
    assert got == want


def test_json_roundtrip_survives_unicode_and_nesting(spark, tmp_path):
    _write_docs(spark, tmp_path)
    got = {
        (r.lang, r.source): (r.n_docs, r.sum_chars)
        for r in qio.Q["json_roundtrip"](spark, str(tmp_path)).collect()
    }
    assert got[("zh", "s3")] == (1, 12)
    assert got[("en", "s,1")] == (2, 25)
    # full-fidelity check: the raw text comes back bit-identical
    d = qio._sink_dir(spark, "probe")
    spark.createDataFrame(HOSTILE, DOCS_SCHEMA).write.mode("overwrite").json(d)
    back = spark.read.schema(DOCS_SCHEMA).json(d)
    assert {r.text for r in back.collect()} == {r[1] for r in HOSTILE}


def test_orc_roundtrip_counts(spark, tmp_path):
    _write_docs(spark, tmp_path)
    got = {
        r.lang: (r.n_docs, r.sum_chars)
        for r in qio.Q["orc_roundtrip"](spark, str(tmp_path)).collect()
    }
    assert got == {"en": (3, 45), "de": (1, 24), "zh": (1, 12)}


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_join_interval_overlap_semantics(spark, tmp_path):
    def ev(i, user, etype, day, hour):
        return (
            i,
            datetime.datetime(2024, 1, day, hour),
            user,
            etype,
            1.0,
            "{}",
        )

    rows = [
        # user 1, day 1: clicks 08-12, views 10-14 -> overlap
        ev(1, 1, "click", 1, 8), ev(2, 1, "click", 1, 12),
        ev(3, 1, "view", 1, 10), ev(4, 1, "view", 1, 14),
        # user 1, day 2: clicks 08-09, views 10-11 -> NO overlap
        ev(5, 1, "click", 2, 8), ev(6, 1, "click", 2, 9),
        ev(7, 1, "view", 2, 10), ev(8, 1, "view", 2, 11),
        # user 2: click day 3 overlaps nothing (no views at all)
        ev(9, 2, "click", 3, 8),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        (r.user_id, r.click_day, r.view_day)
        for r in qrel.Q["join_interval"](spark, str(tmp_path)).collect()
    }
    assert (1, "2024-01-01", "2024-01-01") in got
    assert (1, "2024-01-02", "2024-01-02") not in got
    assert not any(u == 2 for (u, _, _) in got)
    # single-point containment: a view instant inside the click span
    # (cross-day pairs where spans still overlap are included by design)
    assert all(u == 1 for (u, _, _) in got)
