"""Wave-161 invariants: the CvM tie-group folding (odd-square prefix
identity) equals the naive per-observation sum, the uniformity
quartet agrees, and the winsorized correlation replays through
hand-clipped margins with the positive-dependence pin."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_cvm_uniform_matches_naive(spark):
    buckets = sorted(
        int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16)
        for r in t(spark, SF, "documents").collect()
    )
    n = len(buckets)
    w2_naive = 1.0 / (12 * n) + sum(
        ((bk + 0.5) / 256.0 - (2 * i - 1) / (2.0 * n)) ** 2
        for i, bk in enumerate(buckets, start=1)
    )
    # folded replay (what the face computes, quantized per bucket)
    cnt = Counter(buckets)
    cum = 0
    s_mic = 0

    def s_odd(m):
        return m * (2 * m - 1) * (2 * m + 1)

    for bk in sorted(cnt):
        c = cnt[bk]
        a = cum
        cum += c
        fm = (bk + 0.5) / 256.0
        term = (
            c * fm * fm
            - fm * (c * (2.0 * a + c)) / n
            + (float(s_odd(cum)) - float(s_odd(a)))
            / 3.0
            / (4.0 * n * n)
        )
        s_mic += round(1e6 * term)
    got = qstats.Q["stat_cvm_uniform"](spark, SF).collect()[0]
    assert (got["n"], got["s_mic"]) == (n, s_mic)
    w2_folded = 1.0 / (12 * n) + s_mic / 1e6
    assert abs(got["w2"] - round(w2_folded, 6)) <= 1e-9
    assert abs(w2_folded - w2_naive) < 1e-3  # folding is exact
    assert got["uniform_ok"] is True


def test_winsorized_corr_matches_replay(spark):
    daily = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        d = daily[us // 86_400_000_000]
        d[0] += round(r["value"] * 100)
        d[1] += 1
    rows = [(day, x, y) for day, (x, y) in daily.items()]
    n = len(rows)

    def cuts(vals_days):
        srt = sorted(vals_days)
        lo = max(
            (v for i, (v, _) in enumerate(srt, 1) if 10 * i <= n),
            default=None,
        )
        hi = min(
            (v for i, (v, _) in enumerate(srt, 1) if 10 * i >= 9 * n),
            default=None,
        )
        return lo, hi

    lox, hix = cuts([(x, day) for day, x, _ in rows])
    loy, hiy = cuts([(y, day) for day, _, y in rows])

    def clip(v, lo, hi):
        if lo is not None:
            v = max(v, lo)
        if hi is not None:
            v = min(v, hi)
        return v

    wx = [clip(x, lox, hix) for _, x, _ in rows]
    wy = [clip(y, loy, hiy) for _, _, y in rows]
    sx, sy = sum(wx), sum(wy)
    sxy = sum(a * b for a, b in zip(wx, wy))
    sxx = sum(a * a for a in wx)
    syy = sum(b * b for b in wy)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = cov / math.sqrt(vx) / math.sqrt(vy)
    got = qstats.Q["stat_winsorized_corr"](spark, SF).collect()[0]
    assert got["n"] == n
    assert abs(got["r_winsorized"] - round(r, 6)) <= 1e-9
    # revenue = value-sum per day, count = rows per day: strongly
    # positively dependent
    assert got["r_winsorized"] > 0.5
