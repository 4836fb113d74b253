"""Wave-54 invariants: mean average precision against a per-user
ranking replay, the Brier decomposition against an exact-rational
replay, eigenvector centrality against a two-round integer matvec
replay, and the Bollinger breach flag against a rolling-window replay
(including the all-integer 2-sigma cross-multiplication)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qml, qpipe
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_map_matches_ranking_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL AND user_id IS NOT NULL")
        .select("user_id", "value", "event_id", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (
                -_rnd_away(r["value"] * 100),
                r["event_id"],
                1 if r["event_type"] == "purchase" else 0,
            )
        )
    aps = []
    for evs in by_user.values():
        evs.sort()
        cp = t_micros = np = 0
        for rn, (_, _, pos) in enumerate(evs, start=1):
            cp += pos
            if pos:
                np += 1
                t_micros += _rnd_away(1e6 * cp / rn)
        if np:
            aps.append(_rnd_away(t_micros / np))
    got = qml.Q["ml_map"](spark, SF).collect()[0]
    assert got["n_users"] == len(aps)
    assert abs(got["mean_ap"] - round(sum(aps) / 1e6 / len(aps), 6)) < 1e-9


def test_brier_matches_exact_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("value", "event_type")
        .collect()
    )
    cells: dict[int, list] = {}
    for r in rows:
        m = (_rnd_away(r["value"] * 100) % 1000 + 1000) % 1000
        y = 1 if r["event_type"] == "purchase" else 0
        c = cells.setdefault(m // 100, [0, 0, 0, 0])
        c[0] += 1
        c[1] += m
        c[2] += y
        c[3] += (m - 1000 * y) ** 2
    n = sum(c[0] for c in cells.values())
    p = sum(c[2] for c in cells.values())
    se = sum(c[3] for c in cells.values())
    rel = res = 0
    for nk, sm, pk, _ in cells.values():
        pbar, ybar_k = sm / (1000.0 * nk), pk * 1.0 / nk
        rel += _rnd_away(1e6 * nk * (pbar - ybar_k) ** 2 / n)
        res += _rnd_away(1e6 * nk * (ybar_k - p * 1.0 / n) ** 2 / n)
    got = qml.Q["ml_brier"](spark, SF).collect()[0]
    assert got["n_rows"] == n
    assert abs(got["brier"] - round(se / 1e6 / n, 6)) < 1e-9
    assert abs(got["reliability"] - round(rel / 1e6, 6)) < 1e-9
    assert abs(got["resolution"] - round(res / 1e6, 6)) < 1e-9
    ybar = p / n
    assert abs(got["uncertainty"] - round(ybar * (1 - ybar), 6)) < 1e-9


def test_eigenvector_matches_matvec_replay(spark):
    edges = [
        (r["src"], r["dst"])
        for r in qpipe._undirected_edges(spark, SF).collect()
    ]
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    x2: dict[str, int] = {}
    for s, d in edges:
        x2[s] = x2.get(s, 0) + deg[d]
    mx = max(x2.values())
    got = {
        r["uri"]: (r["x2"], r["ev_norm"])
        for r in qpipe.Q["kg_eigenvector"](spark, SF).collect()
    }
    assert got == {u: (v, round(v / mx, 6)) for u, v in x2.items()}
    assert any(v[1] == 1.0 for v in got.values())


def test_bollinger_matches_rolling_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day_num"),
            "value",
        )
        .collect()
    )
    daily: dict[tuple, int] = {}
    for r in rows:
        k = (r["event_type"], r["day_num"])
        daily[k] = daily.get(k, 0) + _rnd_away(r["value"] * 100)
    series: dict[str, list] = {}
    for (et, d), c in sorted(daily.items()):
        series.setdefault(et, []).append((d, c // 100 if c >= 0 else -((-c) // 100) - (1 if c % 100 else 0)))
    # Python // on negatives already floors like SQL div? SQL div truncates.
    # Daily sums in the fixture are positive; assert that holds.
    assert all(c >= 0 for c in daily.values())
    want = {}
    for et, pts in series.items():
        for i in range(6, len(pts)):
            win = [v for _, v in pts[i - 6 : i + 1]]
            d, v = pts[i]
            s1, s2 = sum(win), sum(x * x for x in win)
            var_num = 7 * s2 - s1 * s1
            breach = 0
            if 3 * (7 * v - s1) ** 2 > 14 * var_num:
                breach = 1 if 7 * v > s1 else -1
            band = 2 * math.sqrt(var_num / 42.0)
            want[(et, d)] = (
                v,
                round(s1 / 7.0, 6),
                round(s1 / 7.0 + band, 6),
                round(s1 / 7.0 - band, 6),
                breach,
            )
    got = {
        (r["event_type"], r["day_num"]): (
            r["dollars"],
            r["mid"],
            r["hi_band"],
            r["lo_band"],
            r["breach"],
        )
        for r in qadv.Q["events_bollinger"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, g in got.items():
        w = want[k]
        assert g[0] == w[0] and g[4] == w[4], (k, g, w)
        assert all(abs(a - b) < 1e-9 for a, b in zip(g[1:4], w[1:4]))
    assert any(g[4] != 0 for g in got.values()) or len(got) < 8
