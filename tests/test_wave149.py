"""Wave-149 invariants: the K^2 omnibus replays through the exact
power sums and the identical transform chain (scipy-free), flags the
heavy-tailed fixture as non-normal, and behaves on a fabricated
near-normal battery; the ps pivot_table equals a per-cell dict
replay including the NULL-for-absent-cell contract."""

from __future__ import annotations

import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qsql, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _k2_from_power_sums(n, s1, s2, s3, s4):
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu**3
    m4 = (
        s4 / n
        - 4.0 * mu * (s3 / n)
        + 6.0 * mu * mu * (s2 / n)
        - 3.0 * mu**4
    )
    g1 = m3 / (math.sqrt(m2) * m2)
    g2 = m4 / (m2 * m2)
    y = g1 * math.sqrt((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0)))
    beta2 = (
        3.0
        * (n * n + 27.0 * n - 70.0)
        * (n + 1.0)
        * (n + 3.0)
        / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    )
    w2 = math.sqrt(2.0 * (beta2 - 1.0)) - 1.0
    delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2.0 / (w2 - 1.0))
    z1 = delta * math.log(
        y / alpha + math.sqrt((y / alpha) ** 2 + 1.0)
    )
    eb2 = 3.0 * (n - 1.0) / (n + 1.0)
    vb2 = (
        24.0
        * n
        * (n - 2.0)
        * (n - 3.0)
        / ((n + 1.0) ** 2 * (n + 3.0) * (n + 5.0))
    )
    xx = (g2 - eb2) / math.sqrt(vb2)
    sb1 = (
        6.0
        * (n * n - 5.0 * n + 2.0)
        / ((n + 7.0) * (n + 9.0))
        * math.sqrt(
            6.0 * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0))
        )
    )
    aa = 6.0 + 8.0 / sb1 * (
        2.0 / sb1 + math.sqrt(1.0 + 4.0 / (sb1 * sb1))
    )
    kern = (1.0 - 2.0 / aa) / (
        1.0 + xx * math.sqrt(2.0 / (aa - 4.0))
    )
    z2 = (
        (1.0 - 2.0 / (9.0 * aa)) - math.copysign(abs(kern) ** (1 / 3), kern)
    ) / math.sqrt(2.0 / (9.0 * aa))
    return g1, g2, z1, z2, z1 * z1 + z2 * z2


def test_dagostino_matches_replay(spark):
    xs = [
        round(r["value"] * 100) // 100
        for r in t(spark, SF, "events").collect()
        if r["value"] is not None
    ]
    n = len(xs)
    s1, s2 = sum(xs), sum(x * x for x in xs)
    s3, s4 = sum(x**3 for x in xs), sum(x**4 for x in xs)
    got = qstats.Q["stat_dagostino"](spark, SF).collect()[0]
    assert (got["n"], got["s1"], got["s2"], got["s3"], got["s4"]) == (
        n, s1, s2, s3, s4,
    )
    g1, g2, z1, z2, k2 = _k2_from_power_sums(n, s1, s2, s3, s4)
    assert abs(got["g1"] - round(g1, 6)) <= 1e-6
    assert abs(got["g2"] - round(g2, 6)) <= 1e-6
    assert abs(got["z1"] - round(z1, 6)) <= 1e-5
    assert abs(got["z2"] - round(z2, 6)) <= 1e-5
    assert abs(got["k2"] - round(k2, 6)) <= 1e-4
    # heavy-tailed fixture: decisively non-normal
    assert got["k2"] > 13.82  # chi2_2 at alpha = 0.001


def test_dagostino_near_normal_battery():
    # symmetric light-tailed battery -> both Z's small, K^2 modest
    xs = []
    for i in range(-30, 31):
        xs.extend([i] * max(0, 100 - i * i // 3))
    n = len(xs)
    s1, s2 = sum(xs), sum(x * x for x in xs)
    s3, s4 = sum(x**3 for x in xs), sum(x**4 for x in xs)
    g1, g2, z1, z2, k2 = _k2_from_power_sums(n, s1, s2, s3, s4)
    assert abs(g1) < 0.01  # symmetric by construction
    assert abs(z1) < 1.0


def test_ps_pivot_table_matches_replay(spark):
    cells = defaultdict(int)
    seen = defaultdict(set)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        secs = int(r["ts"].timestamp() * 1_000_000) // 1_000_000
        dow = (secs // 86400 + 4) % 7
        cells[(r["event_type"], dow)] += round(r["value"] * 100)
        seen[r["event_type"]].add(dow)
    got = {
        r["event_type"]: r
        for r in qsql.Q["ps_api_pivot_table"](spark, SF).collect()
    }
    assert set(got) == set(seen)
    for typ in seen:
        for k in range(7):
            want = cells.get((typ, k))
            assert got[typ][f"d{k}"] == want, (typ, k)
