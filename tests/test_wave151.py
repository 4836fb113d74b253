"""Wave-151 invariants: the multi-char-delimiter roundtrip preserves
the head fragment's exact length mass (the writer-trim trap), and
the variance ratio replays from the daily series, pinning the
iid-levels VR ~ 1/q signature against the random-walk null."""

from __future__ import annotations

from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qio, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_multichar_delim_roundtrip(spark):
    agg = defaultdict(lambda: [0, 0, 0])
    for r in t(spark, SF, "documents").collect():
        a = agg[(r["lang"], r["source"])]
        a[0] += 1
        a[1] += r["n_chars"]
        a[2] += len((r["text"] or "")[:40])
    got = {
        (r["lang"], r["source"]): r
        for r in qio.Q["csv_multichar_delim"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for k, (n, sc, sh) in agg.items():
        assert (
            got[k]["n_docs"],
            got[k]["sum_chars"],
            got[k]["sum_head_len"],
        ) == (n, sc, sh), k
    # the trap this face pins: at least one head fragment ends in
    # whitespace, so a trimming writer WOULD have failed
    assert any(
        (r["text"] or "")[:40].endswith(" ")
        for r in t(spark, SF, "documents").collect()
    )


def test_variance_ratio_matches_replay(spark):
    cents = defaultdict(int)
    for r in t(spark, SF, "orders").collect():
        d = (
            int(r["o_orderdate"].timestamp() * 1_000_000)
            // 86_400_000_000
        )
        cents[d] += round(r["o_totalprice"] * 100)
    kd = {d: c // 100000 for d, c in cents.items()}
    days = sorted(kd)
    base = days[0]
    idx = {d: i for i, d in enumerate(days)}
    d1 = [
        kd[d] - kd[days[idx[d] - 1]]
        for d in days
        if idx[d] >= 1 and d - days[idx[d] - 1] == 1
    ]
    d5 = [
        kd[d] - kd[days[idx[d] - 5]]
        for d in days
        if idx[d] >= 5
        and d - days[idx[d] - 5] == 5
        and (d - base) % 5 == 0
    ]

    def var(xs):
        n = len(xs)
        s, ss = sum(xs), sum(x * x for x in xs)
        return (n * ss - s * s) / (n * (n - 1))

    vr = var(d5) / (5.0 * var(d1))
    got = qstats.Q["stat_variance_ratio"](spark, SF).collect()[0]
    assert (got["n1"], got["n5"]) == (len(d1), len(d5))
    assert abs(got["vr5"] - round(vr, 6)) <= 1e-9
    # iid daily levels: VR(5) ~ 1/5, decisively below the RW value 1
    assert got["vr5"] < 0.5
    assert got["mean_reverting"] is True
