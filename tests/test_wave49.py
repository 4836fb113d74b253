"""Wave-49 invariants: within-watermark streaming dedup equals the
batch distinct set, null-safe join against a Counter replay
(NULL-block product included), boolean aggregates against direct
recounts, and cross-correlation against a numpy replay at every
lag."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np

from dbpedia_spotlight_db_spark.queries import qrel, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_dedup_within_wm_equals_distinct(spark):
    want = {
        (r["user_id"], r["event_type"])
        for r in t(spark, SF, "events")
        .filter("ts IS NOT NULL")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    got = {
        (r["user_id"], r["event_type"])
        for r in qrel.Q["stream_dedup_within_wm"](spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_null_safe_join_matches_replay(spark):
    def keyed(rows, col):
        c: Counter = Counter()
        for r in rows:
            k = r[col]
            if hashlib.md5(str(k).encode()).hexdigest()[0] < "4":
                c[None] += 1
            else:
                c[k % 100] += 1
        return c

    ca = keyed(t(spark, SF, "orders").select("o_orderkey").collect(),
               "o_orderkey")
    cb = keyed(t(spark, SF, "lineitem").select("l_orderkey").collect(),
               "l_orderkey")
    want = {
        k: ca[k] * cb[k] for k in set(ca) & set(cb)
    }
    got = {
        r["k"]: r["n_pairs"]
        for r in qrel.Q["join_null_safe"](spark, SF).collect()
    }
    assert got == want
    assert None in got  # the NULL<=>NULL block actually matched


def test_agg_bool_matches_recount(spark):
    rows = t(spark, SF, "events").select("event_type", "value").collect()
    per: dict[str, list] = {}
    for r in rows:
        per.setdefault(r["event_type"], []).append(r["value"])
    got = {r["event_type"]: r for r in qrel.Q["agg_bool"](spark, SF).collect()}
    assert set(got) == set(per)
    for et, vals in per.items():
        g = got[et]
        assert g["n_high"] == sum(
            1 for v in vals if v is not None and v > 100
        )
        assert g["all_valued"] == all(v is not None for v in vals)
        assert g["any_extreme"] == any(
            v is not None and v > 400 for v in vals
        )


def test_crosscorr_matches_numpy_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter(
            "value IS NOT NULL AND event_type IN ('view', 'purchase')"
        )
        .select("event_type", "ts", "value")
        .collect()
    )
    daily: dict[tuple, int] = {}
    for r in rows:
        day = int(r["ts"].timestamp() * 1e6) // 86_400_000_000
        key = (r["event_type"], day)
        daily[key] = daily.get(key, 0) + _rnd_away(r["value"] * 100)
    xs = {
        d: c // 100 for (et, d), c in daily.items() if et == "view"
    }
    ys = {
        d: c // 100 for (et, d), c in daily.items() if et == "purchase"
    }
    got = {
        r["lag_days"]: r
        for r in qstats.Q["events_crosscorr"](spark, SF).collect()
    }
    assert set(got) <= set(range(-3, 4))
    for lg, g in got.items():
        pairs = [
            (xs[d], ys[d + lg]) for d in xs if d + lg in ys
        ]
        assert g["n"] == len(pairs)
        if g["r"] is not None:
            x = np.array([p[0] for p in pairs], float)
            y = np.array([p[1] for p in pairs], float)
            want = float(np.corrcoef(x, y)[0, 1])
            assert abs(g["r"] - want) < 1e-5
