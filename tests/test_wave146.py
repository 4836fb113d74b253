"""Wave-146 invariants: Yuen's trimmed/winsorized moments match a
brute-force sorted trim, the statistic sits in the null bulk on the
shared-distribution halves, and Theil's U replays exactly through
the micros-quantized entropy identity with its information
inequality."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_yuen_matches_sorted_trim(spark):
    groups = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        h = hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0]
        groups["a" if h < "8" else "b"].append(round(r["value"] * 100))
    stats = {}
    for grp, vs in groups.items():
        vs.sort()
        n = len(vs)
        g = n // 5
        trimmed = vs[g : n - g]
        h = len(trimmed)
        lo, hi = trimmed[0], trimmed[-1]
        wins = [lo] * g + trimmed + [hi] * g
        tmean = sum(trimmed) / 100.0 / h
        ws = sum(wins) / 100.0
        ws2 = sum(v * v for v in wins) / 10000.0
        se2 = (ws2 - ws * ws / n) / (h * (h - 1))
        stats[grp] = (n, g, h, tmean, se2)
    got = qstats.Q["stat_yuen"](spark, SF).collect()[0]
    (na, ga, ha, tma, s2a) = stats["a"]
    (nb, gb, hb, tmb, s2b) = stats["b"]
    assert (got["n_a"], got["n_b"], got["g_a"], got["g_b"]) == (
        na, nb, ga, gb,
    )
    assert abs(got["tmean_a"] - round(tma, 6)) <= 1e-9
    assert abs(got["tmean_b"] - round(tmb, 6)) <= 1e-9
    t_y = (tma - tmb) / math.sqrt(s2a + s2b)
    assert abs(got["t_yuen"] - round(t_y, 6)) <= 1e-9
    df = (s2a + s2b) ** 2 / (s2a**2 / (ha - 1) + s2b**2 / (hb - 1))
    assert abs(got["df"] - round(df, 6)) <= 1e-9
    # shared distribution: null bulk
    assert abs(got["t_yuen"]) < 4


def test_theil_u_matches_replay(spark):
    cells = Counter()
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        dow = (us // 86_400_000_000 + 4) % 7
        cells[(r["event_type"], dow)] += 1
    n = sum(cells.values())
    rx = Counter()
    cy = Counter()
    for (x, y), c in cells.items():
        rx[x] += c
        cy[y] += c
    mi_mic = sum(
        round(1e6 * c * math.log(n * c / (rx[x] * cy[y])))
        for (x, y), c in cells.items()
    )
    sy_mic = sum(round(1e6 * c * math.log(c)) for c in cy.values())
    nhy_mic = round(1e6 * n * math.log(n)) - sy_mic
    got = qstats.Q["stat_theil_u"](spark, SF).collect()[0]
    assert (got["n"], got["mi_mic"], got["nhy_mic"]) == (
        n, mi_mic, nhy_mic,
    )
    assert abs(got["u_yx"] - round(mi_mic / nhy_mic, 6)) <= 1e-9
    # information inequality on the quantized integers (tiny slack
    # for per-term rounding) and independence in the fixture
    assert -len(cells) <= mi_mic <= nhy_mic + len(cells)
    assert 0.0 - 1e-6 <= got["u_yx"] <= 1.0
    assert got["u_yx"] < 0.01
