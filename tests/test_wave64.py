"""Wave-64 invariants: the CAS dedup census against a hashlib replay,
Theil-Sen against a brute pairwise-median replay, INT96 epoch sums
against the NTZ original (zone-shift detector), and decimal strings
against exact integer-cents arithmetic."""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qdata, qio, qml, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_multimodal_dedup_matches_hashlib_census(spark):
    groups: dict[tuple, int] = {}
    for r in t(spark, SF, "documents").select("text").collect():
        payload = r["text"].encode("utf-8")
        k = (hashlib.md5(payload).hexdigest(), len(payload))
        groups[k] = groups.get(k, 0) + 1
    got = qdata.Q["multimodal_dedup"](spark, SF).collect()[0]
    n = sum(groups.values())
    assert got["n_media"] == n
    assert got["n_distinct"] == len(groups)
    assert got["n_dup_copies"] == n - len(groups)
    assert got["bytes_total"] == sum(
        c * nb for (_, nb), c in groups.items()
    )
    assert got["bytes_dedupable"] == sum(
        (c - 1) * nb for (_, nb), c in groups.items()
    )


def test_theilsen_matches_pairwise_median(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
            "value",
        )
        .collect()
    )
    daily: dict[int, int] = {}
    for r in rows:
        daily[r["day"]] = daily.get(r["day"], 0) + _rnd_away(
            r["value"] * 100
        )
    pts = sorted((d, c // 100) for d, c in daily.items())
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            slopes.append((pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0]))
    slopes.sort()
    n = len(slopes)
    h = (n - 1) * 0.5  # type-7 median
    lo = math.floor(h)
    med = slopes[lo] + (h - lo) * (slopes[min(lo + 1, n - 1)] - slopes[lo])
    got = qml.Q["stat_theilsen"](spark, SF).collect()[0]
    assert got["n_pairs"] == n
    assert abs(got["sen_slope_dollars_per_day"] - round(med, 6)) < 1e-6


def test_int96_roundtrip_preserves_epochs(spark):
    want = {
        r["event_type"]: (r["n"], r["s"], r["m"])
        for r in t(spark, SF, "events")
        .filter("ts IS NOT NULL")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.unix_micros(F.col("ts").cast("timestamp"))).alias("s"),
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("m"),
        )
        .collect()
    }
    got = {
        r["event_type"]: (r["n"], r["sum_us"], r["min_us"])
        for r in qio.Q["parquet_int96"](spark, SF).collect()
    }
    assert got == want


def test_decimal_strings_match_exact_cents(spark):
    per_flag: dict[str, list] = {}
    for r in (
        t(spark, SF, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        per_flag.setdefault(r["l_returnflag"], []).append(
            _rnd_away(r["l_extendedprice"] * 100)
        )
    got = {
        r["l_returnflag"]: (r["n"], r["total_dec"], r["avg_dec"])
        for r in qrel.Q["agg_decimal"](spark, SF).collect()
    }
    assert set(got) == set(per_flag)
    for flag, cents in per_flag.items():
        n = len(cents)
        total = Decimal(sum(cents)) / 100
        avg = (Decimal(sum(cents)) / 100 / n).quantize(
            Decimal("0.000001")
        )
        g = got[flag]
        assert g[0] == n
        assert Decimal(g[1]) == total
        # string forms are exact decimals with pinned scales
        assert g[1] == f"{total:.2f}"
        assert abs(Decimal(g[2]) - avg) <= Decimal("0.000001")
