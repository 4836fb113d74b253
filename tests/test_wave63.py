"""Wave-63 invariants: largest-remainder quotas must sum exactly to
the budget and stay within 1 of the real share, the quantified
rewrite must match a brute per-customer fold (including vacuous-ALL
and orderless customers), the evolving union must null-fill by NAME,
and the fairness report must replay from the deterministic rules."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qcorpus, qio, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"
BUDGET = 1000


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_allocation_sums_to_budget_within_one_of_share(spark):
    hist: dict[str, int] = {}
    for r in t(spark, SF, "documents").select("lang").collect():
        hist[r["lang"]] = hist.get(r["lang"], 0) + 1
    total = sum(hist.values())
    got = {
        r["lang"]: (r["n"], r["base_quota"], r["quota"], r["got_remainder"])
        for r in qcorpus.Q["sample_allocate"](spark, SF).collect()
    }
    assert {k: v[0] for k, v in got.items()} == hist
    assert sum(v[2] for v in got.values()) == BUDGET
    # Hamilton replay
    base = {k: BUDGET * n // total for k, n in hist.items()}
    rem = {k: BUDGET * n % total for k, n in hist.items()}
    leftover = BUDGET - sum(base.values())
    order = sorted(hist, key=lambda k: (-rem[k], k))
    want = {
        k: base[k] + (1 if i < leftover else 0)
        for i, k in enumerate(order)
    }
    assert {k: v[2] for k, v in got.items()} == want
    for k, n in hist.items():
        assert abs(got[k][2] - BUDGET * n / total) < 1.0


def test_any_all_matches_brute_fold(spark):
    orders: dict[int, list[int]] = {}
    for r in (
        t(spark, SF, "orders")
        .filter("o_orderstatus = 'F'")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        orders.setdefault(r["o_custkey"], []).append(
            _rnd_away(r["o_totalprice"] * 100)
        )
    want: dict[str, list] = {}
    orderless_seen = False
    for r in t(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect():
        v = want.setdefault(r["c_mktsegment"], [0, 0, 0])
        cs = orders.get(r["c_custkey"], [])
        v[0] += 1
        if any(c > 20000000 for c in cs):
            v[1] += 1
        if cs and all(c > 10000000 for c in cs):
            v[2] += 1
        orderless_seen |= not cs
    got = {
        r["seg"]: (r["n_customers"], r["n_any_big"], r["n_all_big"])
        for r in qadv.Q["sql_any_all"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    assert orderless_seen  # the left-join edge case is exercised


def test_union_evolve_nullfills_by_name(spark):
    df_docs = t(spark, SF, "documents")
    n = df_docs.count()
    chars = df_docs.agg(F.sum("n_chars")).collect()[0][0]
    got = {
        r["gen"]: (r["n"], r["n_lang"], r["sum_chars"])
        for r in qio.Q["set_union_evolve"](spark, SF).collect()
    }
    assert got == {"v1": (n, n, chars), "v2": (n, 0, chars)}


def test_fairness_matches_rule_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_id", "event_type", "value")
        .collect()
    )
    g: dict[str, list] = {}
    for r in rows:
        grp = (
            "g0"
            if hashlib.md5(f"grp:{r['event_id']}".encode()).hexdigest()[0]
            < "8"
            else "g1"
        )
        y = 1 if r["event_type"] == "purchase" else 0
        yhat = 1 if _rnd_away(r["value"] * 100) % 5 < 2 else 0
        v = g.setdefault(grp, [0, 0, 0, 0, 0, 0])  # n, pp, np, nn, tp, fp
        v[0] += 1
        v[1] += yhat
        v[2] += y
        v[3] += 1 - y
        v[4] += y and yhat
        v[5] += (1 - y) and yhat
    got = {
        r["grp"]: r for r in qml.Q["ml_fairness"](spark, SF).collect()
    }
    assert set(got) == set(g)
    max_rate = max(v[1] / v[0] for v in g.values())
    for grp, v in g.items():
        r = got[grp]
        assert r["n"] == v[0]
        assert abs(r["pos_rate"] - round(v[1] / v[0], 6)) < 1e-9
        assert abs(r["tpr"] - round(v[4] / v[2], 6)) < 1e-9
        assert abs(r["fpr"] - round(v[5] / v[3], 6)) < 1e-9
        assert (
            abs(r["parity_gap_vs_max"] - round(abs(v[1] / v[0] - max_rate), 6))
            < 1e-5
        )
