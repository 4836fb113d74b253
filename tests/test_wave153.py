"""Wave-153 invariants: the DP median replays exactly through the
Gumbel-max argmax and lands in the central mass; the Bucketizer
grid matches a pure-Python CASE ladder, and the left-closed
boundary semantics are pinned on fabricated split-exact values."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from dbpedia_spotlight_db_spark.queries import qfeat, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_dp_quantile_matches_replay(spark):
    vals = [
        round(r["value"] * 100)
        for r in t(spark, SF, "events").collect()
        if r["value"] is not None
    ]
    cnt = Counter(vals)
    n = len(vals)
    cum = 0
    best = None
    for v in sorted(cnt):
        c = cnt[v]
        cum += c
        util = -abs(2 * cum - c - n)
        h = int(
            hashlib.md5(f"dpq:{v}".encode()).hexdigest()[:8], 16
        )
        u = (h + 1) / 4294967298.0
        noisy = round(
            1e6 * (util / 2.0 + 2.0 * (-math.log(-math.log(u))))
        )
        key = (-noisy, v)
        if best is None or key < best[0]:
            best = (key, v, noisy)
    got = qfeat.Q["privacy_dp_quantile"](spark, SF).collect()[0]
    assert got["n"] == n
    assert got["released_median_cents"] == best[1]
    assert got["noisy_mic"] == best[2]
    # concentration: the release sits in the central mass
    srt = sorted(vals)
    lo, hi = srt[n // 10], srt[9 * n // 10]
    assert lo <= got["released_median_cents"] <= hi
    # the raw median is NOT necessarily the release (noise is real)
    assert set(got.asDict()) == {
        "n", "released_median_cents", "noisy_mic",
    }


def _ladder(v: float) -> int:
    if v < 10.0:
        return 0
    if v < 50.0:
        return 1
    if v < 100.0:
        return 2
    if v < 500.0:
        return 3
    return 4


def test_bucketizer_matches_ladder(spark):
    agg = {}
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        b = _ladder(r["value"])
        cents = round(r["value"] * 100)
        if b not in agg:
            agg[b] = [0, 0, cents, cents]
        a = agg[b]
        a[0] += 1
        a[1] += cents
        a[2] = min(a[2], cents)
        a[3] = max(a[3], cents)
    got = {
        r["bucket"]: r
        for r in qml.Q["mllib_bucketizer"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for b, (nn, sc, mn, mx) in agg.items():
        assert (
            got[b]["n"],
            got[b]["sum_cents"],
            got[b]["min_cents"],
            got[b]["max_cents"],
        ) == (nn, sc, mn, mx)


def test_bucketizer_boundary_semantics(spark):
    # a value EXACTLY at an interior split lands in the UPPER bucket
    from pyspark.ml.feature import Bucketizer

    df = spark.createDataFrame(
        [(9.999,), (10.0,), (49.999,), (50.0,), (500.0,)], ["value"]
    )
    buck = Bucketizer(
        splits=[
            float("-inf"), 10.0, 50.0, 100.0, 500.0, float("inf"),
        ],
        inputCol="value",
        outputCol="bucket",
    )
    got = [
        int(r["bucket"])
        for r in buck.transform(df).orderBy("value").collect()
    ]
    assert got == [0, 1, 1, 2, 4]
