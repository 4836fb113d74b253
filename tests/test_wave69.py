"""Wave-69 invariants: the multi-format parse chain against a Python
strptime replay (junk class must NULL, formats must route), UNPIVOT
against a wide-table melt replay (NULL rows dropped), the xor
fingerprint against functools.reduce, and time-to-convert against a
per-user first-click/first-subsequent-purchase replay."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime, timezone
from functools import reduce

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_try_timestamp_matches_strptime_replay(spark):
    rows = (
        t(spark, SF, "orders")
        .filter("o_orderdate IS NOT NULL")
        .select(
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "us"
            ),
        )
        .collect()
    )
    n_parsed = sum_s = 0
    min_us = None
    for r in rows:
        coin = hashlib.md5(f"ts:{r['o_orderkey']}".encode()).hexdigest()[0]
        if coin >= "c":
            continue  # junk class never parses
        if coin < "6":
            us = r["us"]  # full datetime round-trips exactly
        else:
            # dd/MM/yyyy drops the time of day
            dt = datetime.fromtimestamp(r["us"] / 1e6, tz=timezone.utc)
            us = int(
                datetime(
                    dt.year, dt.month, dt.day, tzinfo=timezone.utc
                ).timestamp()
                * 1e6
            )
        n_parsed += 1
        sum_s += us // 1000000
        min_us = us if min_us is None else min(min_us, us)
    got = qsql.Q["sql_try_timestamp"](spark, SF).collect()[0]
    assert got["n_rows"] == len(rows)
    assert got["n_parsed"] == n_parsed
    assert got["sum_s"] == sum_s
    assert got["min_us"] == min_us
    assert n_parsed < len(rows)  # the junk class is non-empty


def test_unpivot_matches_melt_replay(spark):
    wide: dict[int, dict] = {}
    for r in (
        t(spark, SF, "events")
        .filter("value IS NOT NULL AND user_id IS NOT NULL")
        .select("user_id", "event_type", "value")
        .collect()
    ):
        if r["event_type"] not in ("click", "view", "purchase"):
            continue
        u = wide.setdefault(r["user_id"], {})
        u[r["event_type"]] = u.get(r["event_type"], 0) + _rnd_away(
            r["value"] * 100
        )
    want: dict[str, list] = {}
    for u in wide.values():
        for m, c in u.items():
            v = want.setdefault(m, [0, 0])
            v[0] += 1
            v[1] += c
    got = {
        r["metric"]: (r["n_users"], r["cents"])
        for r in qsql.Q["sql_unpivot"](spark, SF).collect()
    }
    assert got == {m: tuple(v) for m, v in want.items()}
    # NULL rows dropped: not every user has every metric
    assert len({v[0] for v in got.values()}) > 1 or len(got) == 3


def test_bit_fns_matches_reduce_replay(spark):
    rows = (
        t(spark, SF, "events").select("event_type", "event_id").collect()
    )
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(r["event_id"])
    got = {
        r["event_type"]: (r["n"], r["xor_fp"], r["low_byte_sum"], r["popcount_sum"])
        for r in qrel.Q["bit_fns"](spark, SF).collect()
    }
    assert set(got) == set(per_type)
    for et, ids in per_type.items():
        g = got[et]
        assert g[0] == len(ids)
        assert g[1] == reduce(lambda a, b: a ^ b, ids)
        assert g[2] == sum(i & 255 for i in ids)
        assert g[3] == sum(bin(i).count("1") for i in ids)


def test_time_to_convert_matches_user_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND user_id IS NOT NULL")
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .collect()
    )
    clicks: dict[int, int] = {}
    purchases: dict[int, list] = {}
    for r in rows:
        if r["event_type"] == "click":
            clicks[r["user_id"]] = min(
                clicks.get(r["user_id"], r["us"]), r["us"]
            )
        elif r["event_type"] == "purchase":
            purchases.setdefault(r["user_id"], []).append(r["us"])
    lats = []
    for u, c in clicks.items():
        after = [p for p in purchases.get(u, []) if p >= c]
        if after:
            lats.append(min(after) - c)
    lats.sort()

    def q7(xs, p):
        h = (len(xs) - 1) * p
        lo = math.floor(h)
        return xs[lo] + (h - lo) * (xs[min(lo + 1, len(xs) - 1)] - xs[lo])

    got = qadv.Q["events_time_to_convert"](spark, SF).collect()[0]
    assert got["n_clickers"] == len(clicks)
    assert got["n_converted"] == len(lats)
    assert abs(
        got["conversion_rate"] - round(len(lats) / len(clicks), 6)
    ) < 1e-9
    assert abs(got["p50_lat_us"] - round(q7(lats, 0.5), 6)) < 1e-6
    assert abs(got["p90_lat_us"] - round(q7(lats, 0.9), 6)) < 1e-6
