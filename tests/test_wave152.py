"""Wave-152 invariants: the unioned streams' output equals the batch
day x source grid under the MIN-watermark emission rule (both
branches flow into one state store), and the conditional-binomial
rate test replays exactly through the logfact quantization with the
A/A split pinned not-significant."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qadv, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_stream_union_matches_batch_replay(spark):
    rows = [
        r
        for r in t(spark, SF, "events").collect()
        if r["ts"] is not None and r["value"] is not None
    ]
    max_us = {"a": 0, "b": 0}
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        src = "a" if r["event_id"] % 2 == 0 else "b"
        max_us[src] = max(max_us[src], us)
        day = us // 86_400_000_000 * 86_400_000_000
        c = cells[(day, src)]
        c[0] += 1
        c[1] += round(r["value"] * 100)
    # min watermark policy across the two inputs, ms-floored
    w = min(
        max_us["a"] // 1000 * 1000, max_us["b"] // 1000 * 1000
    ) - 3_600_000_000
    want = {
        k: tuple(v)
        for k, v in cells.items()
        if k[0] + 86_400_000_000 <= w
    }
    got = {
        (r["day_start_us"], r["src"]): (r["n"], r["cents"])
        for r in qrel.Q["stream_union"](spark, SF).collect()
    }
    assert got == want
    # both branches actually emitted
    assert any(s == "a" for _, s in got) and any(
        s == "b" for _, s in got
    )


def test_poisson_2sample_matches_replay(spark):
    ids = [
        r["event_id"] for r in t(spark, SF, "events").collect()
    ]
    k1 = sum(
        1
        for i in ids
        if hashlib.md5(str(i).encode()).hexdigest()[0] < "8"
    )
    n = len(ids)
    li = [0] * (n + 1)
    for i in range(2, n + 1):
        li[i] = round(math.log(i) * 1e6)
    lf = [0] * (n + 1)
    for i in range(1, n + 1):
        lf[i] = lf[i - 1] + li[i]
    lbc = [lf[n] - lf[k] - lf[n - k] for k in range(n + 1)]
    obs = lbc[k1]
    k_inc = sum(1 for v in lbc if v <= obs)
    p_mic = sum(
        round(math.exp(v / 1e6 + n * math.log(0.5)) * 1e6)
        for v in lbc
        if v <= obs
    )
    got = qadv.Q["stat_poisson_2sample"](spark, SF).collect()[0]
    assert (got["n"], got["k1"], got["k2"]) == (n, k1, n - k1)
    assert got["k_included"] == k_inc
    assert got["p_micros"] == p_mic
    assert (
        abs(got["rate_ratio"] - round(k1 / (n - k1), 6)) <= 1e-9
    )
    # A/A split: rate ratio near 1, test not significant at 5%
    assert 0.8 < got["rate_ratio"] < 1.25
    assert got["p_micros"] > 50_000
