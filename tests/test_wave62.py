"""Wave-62 invariants: grouping_id bits against the rollup-level
replay (and the data-NULL vs subtotal-NULL disambiguation), the
randomized-response debias against a coin replay, the array HOFs
against a per-row Python replay, and the peak detector against a
neighbor replay (including the plateau exclusion)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qfeat, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_grouping_id_matches_rollup_replay(spark):
    rows = (
        t(spark, SF, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .collect()
    )
    want: dict[tuple, int] = {}
    for r in rows:
        s, p = r["o_orderstatus"], r["o_orderpriority"]
        for key in ((s, p, 0, 0, 0), (s, None, 1, 0, 1), (None, None, 3, 1, 1)):
            want[key] = want.get(key, 0) + 1
    got = {
        (
            r["o_orderstatus"],
            r["o_orderpriority"],
            r["gid"],
            r["g_status"],
            r["g_prio"],
        ): r["n"]
        for r in qrel.Q["agg_grouping_id"](spark, SF).collect()
    }
    assert got == want
    # grand total row identified by gid=3, never by NULL inspection
    assert got[(None, None, 3, 1, 1)] == len(rows)


def test_randomized_response_debias_matches_coin_replay(spark):
    rows = (
        t(spark, SF, "events").select("event_id", "event_type").collect()
    )
    n_yes = n_true = 0
    for r in rows:
        y = 1 if r["event_type"] == "purchase" else 0
        coin = hashlib.md5(f"rr:{r['event_id']}".encode()).hexdigest()[:2]
        n_yes += (1 - y) if coin < "40" else y
        n_true += y
    got = qfeat.Q["privacy_randomized_response"](spark, SF).collect()[0]
    assert (got["n"], got["n_yes"]) == (len(rows), n_yes)
    assert abs(
        got["p_debiased"] - round((n_yes / len(rows) - 0.25) / 0.5, 6)
    ) < 1e-9
    assert abs(got["p_true"] - round(n_true / len(rows), 6)) < 1e-9
    # the debiased estimate should land near truth at this n
    assert abs(got["p_debiased"] - got["p_true"]) < 0.05


def test_array_hof_matches_python_replay(spark):
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in t(spark, SF, "embeddings")
        .filter("embedding IS NOT NULL")
        .collect()
    }
    got = {
        r["vec_id"]: (r["n_pos"], r["any_big"], r["rev_dot"], r["top3_sum"])
        for r in qrel.Q["sql_array_hof"](spark, SF).collect()
    }
    assert set(got) == set(emb)
    for vid, v in emb.items():
        rev_dot = 0.0
        for a, b in zip(v, reversed(v)):
            rev_dot += a * b
        top3 = 0.0
        for x in sorted(v, reverse=True)[:3]:
            top3 += x
        g = got[vid]
        assert g[0] == sum(1 for x in v if x > 0)
        assert g[1] == any(x > 2 for x in v)
        assert abs(g[2] - round(rev_dot, 6)) < 1e-9
        assert abs(g[3] - round(top3, 6)) < 1e-9


def test_peak_matches_neighbor_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
            "value",
        )
        .collect()
    )
    daily: dict[tuple, int] = {}
    for r in rows:
        k = (r["event_type"], r["day"])
        daily[k] = daily.get(k, 0) + _rnd_away(r["value"] * 100)
    series: dict[str, list] = {}
    for (et, d), c in sorted(daily.items()):
        series.setdefault(et, []).append((d, c // 100))
    want = {}
    for et, pts in series.items():
        for (d0, v0), (d1, v1), (d2, v2) in zip(pts, pts[1:], pts[2:]):
            if v1 > v0 and v1 > v2:
                want[(et, d1)] = (v1, v1 - max(v0, v2))
    got = {
        (r["event_type"], r["day_num"]): (r["dollars"], r["prominence"])
        for r in qadv.Q["events_peak"](spark, SF).collect()
    }
    assert got == want
    assert all(p >= 1 for _, p in got.values())  # strict peaks
