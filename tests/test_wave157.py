"""Wave-157 invariants: the AD tie-group weight folding equals the
naive per-observation (2i-1) sum, the uniformity trio agrees on the
fixture, and Cucconi's U/V/C replay exactly with U ~ -V symmetry on
the shared-distribution halves."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_ad_uniform_matches_naive_replay(spark):
    buckets = sorted(
        int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16)
        for r in t(spark, SF, "documents").collect()
    )
    n = len(buckets)
    # naive per-observation form with midpoint F
    s = 0.0
    for i in range(1, n + 1):
        f_i = (buckets[i - 1] + 0.5) / 256.0
        f_rev = (buckets[n - i] + 0.5) / 256.0
        s += (2 * i - 1) * (math.log(f_i) + math.log(1.0 - f_rev))
    a2_naive = -n - s / n
    # folded per-bucket replay (what the face computes, quantized)
    cnt = Counter(buckets)
    cum = 0
    s_mic = 0
    for bk in sorted(cnt):
        c = cnt[bk]
        a = cum
        cum += c
        fm = (bk + 0.5) / 256.0
        s_mic += round(
            1e6
            * (
                c * (2 * a + c) * math.log(fm)
                + c * (2 * n - 2 * a - c) * math.log(1.0 - fm)
            )
        )
    got = qstats.Q["stat_ad_uniform"](spark, SF).collect()[0]
    assert (got["n"], got["s_mic"]) == (n, s_mic)
    a2_folded = -n - s_mic / 1e6 / n
    assert abs(got["a2"] - round(a2_folded, 6)) <= 1e-9
    # the folding is exact: quantization aside, folded == naive
    assert abs(a2_folded - a2_naive) < 1e-3
    assert got["uniform_ok"] is True


def test_cucconi_matches_replay(spark):
    vals = []
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        h = hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0]
        vals.append((round(r["value"] * 100), 0 if h < "8" else 1))
    srt = sorted(v for v, _ in vals)
    first = {}
    cnt = Counter(srt)
    for i, v in enumerate(srt):
        if v not in first:
            first[v] = i + 1
    nn = len(vals)
    m = sum(g for _, g in vals)
    sd2 = rd2 = 0
    for v, g in vals:
        if g != 1:
            continue
        dr = 2 * first[v] + cnt[v] - 1
        sd2 += dr * dr
        refl = 2 * (nn + 1) - dr
        rd2 += refl * refl
    denom = math.sqrt(
        m * (nn - m) * (nn + 1.0) * (2 * nn + 1.0) * (8 * nn + 11.0)
        / 5.0
    )
    u = (6.0 * sd2 / 4.0 - m * (nn + 1.0) * (2 * nn + 1.0)) / denom
    v_ = (6.0 * rd2 / 4.0 - m * (nn + 1.0) * (2 * nn + 1.0)) / denom
    rho = (2.0 * (nn * nn - 4.0)) / (
        (2.0 * nn + 3.0) * (8.0 * nn + 11.0)
    ) - 1.0
    c = (u * u + v_ * v_ - 2 * rho * u * v_) / (2 * (1 - rho * rho))
    got = qstats.Q["stat_cucconi"](spark, SF).collect()[0]
    assert (got["n"], got["m"]) == (nn, m)
    assert abs(got["u_stat"] - round(u, 6)) <= 1e-9
    assert abs(got["v_stat"] - round(v_, 6)) <= 1e-9
    assert abs(got["c_stat"] - round(c, 6)) <= 1e-9
    # shared distribution: both components in the null bulk,
    # C approximately Exp(1)-scaled -> far below the 1% cut 4.6
    assert abs(got["u_stat"]) < 4 and abs(got["v_stat"]) < 4
    assert got["c_stat"] < 4.6
    # U and V are strongly negatively correlated by construction
    # (rho -> -7/8 as N -> inf)
    assert rho < -0.8
