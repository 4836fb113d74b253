"""Wave-101 invariants: Fisher's exact p equals an exact-rational
math.comb replay (inclusion rule replayed under the face's own
micros quantization, magnitude checked against the unquantized
rational); ps rolling equals the pandas replay; update mode's
compaction equals the batch aggregate and the emission counts equal
the chunk-membership counts."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict
from fractions import Fraction

from dbpedia_spotlight_db_spark.queries import qadv, qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_fisher_exact_matches_rational_replay(spark):
    orders = t(spark, SF, "orders").collect()
    a = sum(
        1
        for r in orders
        if r["o_orderkey"] % 2 == 0 and r["o_orderstatus"] == "F"
    )
    b = sum(
        1
        for r in orders
        if r["o_orderkey"] % 2 == 0 and r["o_orderstatus"] != "F"
    )
    c = sum(
        1
        for r in orders
        if r["o_orderkey"] % 2 == 1 and r["o_orderstatus"] == "F"
    )
    d = sum(
        1
        for r in orders
        if r["o_orderkey"] % 2 == 1 and r["o_orderstatus"] != "F"
    )
    r1, r2, c1 = a + b, c + d, a + c
    n = a + b + c + d
    row = qadv.Q["stat_fisher_exact"](spark, SF).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)

    # replay the face's own quantization: lf = cumulative per-term
    # round(ln(i)*1e6) sums, inclusion by integer compare
    lf = [0] * (n + 1)
    acc = 0
    for i in range(2, n + 1):
        acc += round(math.log(i) * 1000000)
        lf[i] = acc
    margin = lf[r1] + lf[r2] + lf[c1] + lf[n - c1] - lf[n]

    def lpm(k):
        return margin - lf[k] - lf[r1 - k] - lf[c1 - k] - lf[r2 - c1 + k]

    lp_a = lpm(a)
    ks = range(max(0, c1 - r2), min(r1, c1) + 1)
    inc = [k for k in ks if lpm(k) <= lp_a]
    p_mic = sum(round(math.exp(lpm(k) / 1000000.0) * 1000000) for k in inc)
    assert row["k_included"] == len(inc)
    assert row["p_micros"] == p_mic

    # unquantized exact-rational magnitude check
    denom = math.comb(n, c1)
    pmf_a = Fraction(math.comb(r1, a) * math.comb(r2, c1 - a), denom)
    p_exact = sum(
        Fraction(math.comb(r1, k) * math.comb(r2, c1 - k), denom)
        for k in ks
        if Fraction(math.comb(r1, k) * math.comb(r2, c1 - k), denom)
        <= pmf_a
    )
    assert abs(row["p_micros"] / 1e6 - float(p_exact)) < 1e-3


def test_ps_rolling_matches_pandas_replay(spark):
    daily = defaultdict(int)
    for r in t(spark, SF, "events").collect():
        day = (
            int(
                r["ts"].replace(tzinfo=dt.timezone.utc).timestamp()
                * 1000000
            )
            // 86400000000
        )
        if r["value"] is not None:
            daily[day] += round(r["value"] * 100)
        else:
            daily[day] += 0
    days = sorted(daily)
    expect = {}
    for i, day in enumerate(days):
        frame = [float(daily[d]) for d in days[max(0, i - 2) : i + 1]]
        expect[day] = round(sum(frame) / len(frame), 6) + 0.0
    got = {
        r["day"]: r["mavg"]
        for r in qsql.Q["ps_api_rolling"](spark, SF).collect()
    }
    assert got == expect


def test_update_mode_compaction_and_emissions(spark):
    ev = [
        (r["event_type"], r["user_id"], r["value"])
        for r in t(spark, SF, "events").collect()
        if r["user_id"] is not None
    ]
    n_exp = Counter(et for et, _, _ in ev)
    cents_exp = defaultdict(int)
    has_val = set()
    for et, _, v in ev:
        if v is not None:
            cents_exp[et] += round(v * 100)
            has_val.add(et)
    upd_exp = {
        et: len({uid % 3 for e2, uid, _ in ev if e2 == et})
        for et in n_exp
    }
    rows = qrel.Q["stream_update_mode"](spark, SF).collect()
    got = {
        r["event_type"]: (r["n"], r["cents"], r["n_updates"])
        for r in rows
    }
    expect = {
        et: (
            n_exp[et],
            cents_exp[et] if et in has_val else None,
            upd_exp[et],
        )
        for et in n_exp
    }
    assert got == expect
    assert any(v[2] > 1 for v in got.values())  # real multi-batch updates
