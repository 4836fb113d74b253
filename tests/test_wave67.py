"""Wave-67 invariants: the resumed stream must contain each event
exactly once (any checkpoint failure doubles or halves counts), M4
must replay from per-bucket folds with composite-key ties, the batch
window() TVF must be epoch-aligned, and the multi-measure pivot must
keep Spark's {value}_{alias} naming contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qlake, qrel, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"
WEEK_US = 604800000000


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_stream_resume_exactly_once(spark):
    want = {}
    for r in (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    ):
        v = want.setdefault(r["event_type"], [0, 0])
        v[0] += 1
        v[1] += _rnd_away(r["value"] * 100)
    got = {
        r["event_type"]: (r["n"], r["cents"])
        for r in qrel.Q["stream_resume"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_m4_matches_fold_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            "event_type",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "value",
        )
        .collect()
    )
    agg: dict[tuple, list] = {}
    for r in rows:
        cents = _rnd_away(r["value"] * 100)
        tkey = (r["us"] // 1000000) * 1000000000 + r["event_id"]
        k = (r["event_type"], r["us"] // WEEK_US)
        v = agg.get(k)
        if v is None:
            agg[k] = [1, r["us"], r["us"], (tkey, cents), (tkey, cents), cents, cents]
        else:
            v[0] += 1
            v[1] = min(v[1], r["us"])
            v[2] = max(v[2], r["us"])
            v[3] = min(v[3], (tkey, cents))
            v[4] = max(v[4], (tkey, cents))
            v[5] = min(v[5], cents)
            v[6] = max(v[6], cents)
    got = {
        (r["event_type"], r["bucket"]): (
            r["n"],
            r["min_us"],
            r["max_us"],
            r["first_cents"],
            r["last_cents"],
            r["min_cents"],
            r["max_cents"],
        )
        for r in qadv.Q["events_m4"](spark, SF).collect()
    }
    assert got == {
        k: (v[0], v[1], v[2], v[3][1], v[4][1], v[5], v[6])
        for k, v in agg.items()
    }
    # the envelope orders correctly
    for v in got.values():
        assert v[5] <= v[3] <= v[6] and v[5] <= v[4] <= v[6]


def test_window_tvf_epoch_aligned(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "value",
        )
        .collect()
    )
    want: dict[int, list] = {}
    for r in rows:
        s = (r["us"] // WEEK_US) * WEEK_US
        v = want.setdefault(s, [0, 0])
        v[0] += 1
        v[1] += _rnd_away(r["value"] * 100)
    got = {
        r["win_start_us"]: (r["win_end_us"], r["n"], r["cents"])
        for r in qstats.Q["agg_window_tvf"](spark, SF).collect()
    }
    assert got == {
        s: (s + WEEK_US, v[0], v[1]) for s, v in want.items()
    }
    assert all(s % WEEK_US == 0 for s in got)


def test_pivot_multi_agg_names_and_values(spark):
    df = qlake.Q["pivot_multi_agg"](spark, SF)
    assert df.columns == [
        "user_id",
        "click_n",
        "click_cents",
        "purchase_n",
        "purchase_cents",
    ]
    want: dict[int, list] = {}
    for r in (
        t(spark, SF, "events")
        .filter("value IS NOT NULL AND user_id IS NOT NULL")
        .select("user_id", "event_type", "value")
        .collect()
    ):
        v = want.setdefault(r["user_id"], [0, None, 0, None])
        c = _rnd_away(r["value"] * 100)
        if r["event_type"] == "click":
            v[0] += 1
            v[1] = (v[1] or 0) + c
        elif r["event_type"] == "purchase":
            v[2] += 1
            v[3] = (v[3] or 0) + c
    got = {
        r["user_id"]: (
            r["click_n"],
            r["click_cents"],
            r["purchase_n"],
            r["purchase_cents"],
        )
        for r in df.collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
