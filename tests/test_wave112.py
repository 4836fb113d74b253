"""Wave-112 invariants: CMH equals the exact stratified replay and
the fixture is non-degenerate; pagination returns exactly rows 31-50
of the total order and plans as TakeOrderedAndProject (no global
sort); the recursive scan actually lists the deep file and the
default lister provably does not see it as data rows; Kendall's W
equals the doubled-rank replay and lands in [0, 1]."""

from __future__ import annotations

import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qio, qsql, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_cmh_matches_stratified_replay(spark):
    cells = defaultdict(lambda: [0, 0, 0, 0])  # stratum -> a,b,c,d
    for r in t(spark, SF, "orders").collect():
        s = r["o_orderpriority"][0]
        e = r["o_custkey"] % 2
        y = 1 if r["o_orderstatus"] == "F" else 0
        cells[s][(1 - e) * 2 + (1 - y)] += 1
    o = e_mic = v_mic = ad = bc = 0
    for a, b, c, d in cells.values():
        T = a + b + c + d
        o += a
        e_mic += _rnd(1e6 * (a + b) * (a + c) / T)
        if T > 1:
            v_mic += _rnd(1e6 * (a + b) * (c + d) * (a + c) * (b + d) / (T * T * (T - 1)))
        ad += _rnd(1e6 * a * d / T)
        bc += _rnd(1e6 * b * c / T)
    got = qstats.Q["stat_cmh"](spark, SF).collect()[0]
    assert (got["k"], got["o_sum"], got["e_mic"], got["v_mic"]) == (
        len(cells), o, e_mic, v_mic,
    )
    assert v_mic > 0 and bc > 0, "degenerate fixture (granger lesson)"
    assert abs(got["chi2"] - round((o - e_mic / 1e6) ** 2 / (v_mic / 1e6), 6)) <= 1e-9
    assert abs(got["or_mh"] - round(ad / bc, 6)) <= 1e-9


def test_offset_fetch_is_page_two(spark):
    df = qsql.Q["sql_offset_fetch"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower(), "global sort leaked in"
    ordered = sorted(
        (
            (-round(r["o_totalprice"] * 100), r["o_orderkey"])
            for r in t(spark, SF, "orders").collect()
        )
    )
    expect = [(k, -negc) for negc, k in ordered[30:50]]
    got = [(r["o_orderkey"], r["cents"]) for r in df.collect()]
    assert sorted(got) == sorted(expect)
    assert len(got) == 20


def test_scan_recursive_sees_deep_file(spark):
    rows = qio.Q["scan_recursive"](spark, SF).collect()
    assert rows and all(r["deep_file_listed"] for r in rows)
    exp = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "documents").collect():
        exp[r["lang"]][0] += 1
        exp[r["lang"]][1] += r["doc_id"]
    assert {r["lang"]: [r["n_docs"], r["id_sum"]] for r in rows} == dict(exp)


def test_kendall_w_matches_doubled_rank_replay(spark):
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in t(spark, SF, "customer").collect()
    }
    cents = defaultdict(int)
    for r in t(spark, SF, "orders").collect():
        seg = cust.get(r["o_custkey"])
        if seg is not None:
            cents[(r["o_orderpriority"][0], seg)] += round(
                r["o_totalprice"] * 100
            )
    raters = sorted({p for p, _ in cents})
    items = sorted({s for _, s in cents})
    m, k = len(raters), len(items)
    v = {(p, s): cents.get((p, s), 0) // 100 for p in raters for s in items}
    drsum = defaultdict(int)
    tsum = 0
    for p in raters:
        vals = sorted(v[(p, s)] for s in items)
        from collections import Counter

        cnt = Counter(vals)
        for s in items:
            x = v[(p, s)]
            rank = sum(1 for y in vals if y < x) + 1
            drsum[s] += 2 * rank + cnt[x] - 1
        tsum += sum(t_ * t_ * t_ - t_ for t_ in cnt.values())
    s_d = sum((drsum[s] - m * (k + 1)) ** 2 for s in items)
    got = qstats.Q["stat_kendall_w"](spark, SF).collect()[0]
    assert (got["m"], got["k"], got["s_d"], got["tsum"]) == (m, k, s_d, tsum)
    denom = m * m * (k**3 - k) - m * tsum
    assert s_d > 0 and denom > 0, "degenerate fixture"
    assert abs(got["w"] - round(3.0 * s_d / denom, 6)) <= 1e-9
    assert 0.0 <= got["w"] <= 1.0
