"""Wave-56 invariants: KS gap against a brute ECDF replay, Friedman Q
against a rank replay (including tie averaging and the complete-block
filter), pseudonymized join against the raw-key join plus a global
injectivity certificate, and the VALUES dim join against a dict
replay."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_ks_matches_ecdf_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("value", "event_type")
        .collect()
    )
    sup: dict[int, list] = {}
    for r in rows:
        c = _rnd_away(r["value"] * 100)
        v = sup.setdefault(c, [0, 0])
        v[0] += 1
        v[1] += 1 if r["event_type"] == "purchase" else 0
    pt = sum(v[1] for v in sup.values())
    nt = sum(v[0] - v[1] for v in sup.values())
    cp = cn = 0
    best = None
    for c in sorted(sup):
        cp += sup[c][1]
        cn += sup[c][0] - sup[c][1]
        gap = abs(cp * nt - cn * pt)
        if best is None or gap > best[0]:
            best = (gap, c)
    got = qml.Q["ml_ks"](spark, SF).collect()[0]
    assert (got["n_pos"], got["n_neg"]) == (pt, nt)
    assert got["ks_cents"] == best[1]
    assert abs(got["ks"] - round(best[0] / (pt * nt), 6)) < 1e-9


def test_friedman_matches_rank_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day"),
            "event_type",
            "value",
        )
        .collect()
    )
    daily: dict[tuple, int] = {}
    for r in rows:
        k = (r["day"], r["event_type"])
        daily[k] = daily.get(k, 0) + _rnd_away(r["value"] * 100)
    types = sorted({et for _, et in daily})
    k = len(types)
    blocks: dict[int, dict] = {}
    for (d, et), c in daily.items():
        blocks.setdefault(d, {})[et] = c // 100
    full = {d: b for d, b in blocks.items() if len(b) == k}
    n = len(full)
    rd: dict[str, int] = {et: 0 for et in types}
    tsum = 0
    for b in full.values():
        vals = sorted(b.values())
        for et, v in b.items():
            lt = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            rd[et] += 2 * (lt + 1) + eq - 1
        seen = set()
        for v in b.values():
            if v not in seen:
                seen.add(v)
                tc = sum(1 for x in b.values() if x == v)
                tsum += tc**3 - tc
    sr2d = sum(v * v for v in rd.values())
    q = 3.0 * sr2d / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    corr = 1 - tsum * 1.0 / (n * k * (k * k - 1))
    got = qml.Q["stat_friedman"](spark, SF).collect()[0]
    assert (got["n_blocks"], got["n_treatments"]) == (n, k)
    assert abs(got["q"] - round(q, 6)) < 1e-9
    if corr > 0:
        assert abs(got["q_tie_adj"] - round(q / corr, 6)) < 1e-9
    else:
        assert got["q_tie_adj"] is None
    # untied panel: adjusted equals raw
    if tsum == 0:
        assert got["q_tie_adj"] == got["q"]


def test_pseudonymize_matches_raw_join_and_is_injective(spark):
    cust = t(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    orders = t(spark, SF, "orders").select("o_custkey", "o_totalprice")
    seg = {r["c_custkey"]: r["c_mktsegment"] for r in cust.collect()}
    want: dict[str, list] = {}
    custs: dict[str, set] = {}
    for r in orders.collect():
        s = seg.get(r["o_custkey"])
        if s is None:
            continue
        v = want.setdefault(s, [0, 0])
        v[0] += 1
        v[1] += _rnd_away(r["o_totalprice"] * 100)
        custs.setdefault(s, set()).add(r["o_custkey"])
    got = {
        r["seg"]: (r["n_orders"], r["n_customers"], r["cents"])
        for r in qadv.Q["privacy_pseudonymize"](spark, SF).collect()
    }
    assert got == {
        s: (v[0], len(custs[s]), v[1]) for s, v in want.items()
    }
    # global injectivity of the salted digest on this key domain
    keys = set(seg)
    pseud = {
        hashlib.md5(f"pseud-salt-2026:{k}".encode()).hexdigest()[:16]
        for k in keys
    }
    assert len(pseud) == len(keys)


def test_inline_values_matches_dict_replay(spark):
    wmap = {
        "1-URGENT": 5,
        "2-HIGH": 4,
        "3-MEDIUM": 3,
        "4-NOT SPECIFIED": 2,
        "5-LOW": 1,
    }
    agg: dict[str, list] = {}
    for r in (
        t(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        c = _rnd_away(r["o_totalprice"] * 100)
        v = agg.setdefault(r["o_orderpriority"], [0, 0, 0])
        v[0] += 1
        v[1] += c
        v[2] += wmap[r["o_orderpriority"]] * c
    got = {
        r["prio"]: (r["weight"], r["n"], r["cents"], r["weighted_cents"])
        for r in qsql.Q["sql_inline_values"](spark, SF).collect()
    }
    assert got == {
        p: (wmap[p], v[0], v[1], v[2]) for p, v in agg.items()
    }
