"""Wave-175 invariants: the partial correlation replays through the
exact within-dow centering + per-row normalization, and ICC(1,1)
replays through the unbalanced one-way ANOVA decomposition with the
near-zero pin on the shared-distribution fixture."""

from __future__ import annotations

import math
from collections import defaultdict


def _round_half_away(v: float) -> int:
    # SQL round() is half-AWAY-from-zero; Python round() is
    # half-to-even — they disagree exactly on .5 residuals
    return int(math.copysign(math.floor(abs(v) + 0.5), v))

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_partial_corr_matches_replay(spark):
    daily = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        d = daily[us // 86_400_000_000]
        d[0] += round(r["value"] * 100)
        d[1] += 1
    strata = defaultdict(list)
    for day, (x, y) in daily.items():
        strata[(day + 4) % 7].append((day, x, y))
    sx = []
    sy = []
    for rows in strata.values():
        m = len(rows)
        tx = sum(x for _, x, _ in rows)
        ty = sum(y for _, _, y in rows)
        for _, x, y in rows:
            sx.append(_round_half_away((m * x - tx) / m))
            sy.append(_round_half_away((m * y - ty) / m))
    sxy = sum(a * b for a, b in zip(sx, sy))
    sxx = sum(a * a for a in sx)
    syy = sum(b * b for b in sy)
    r = sxy / math.sqrt(sxx) / math.sqrt(syy)
    got = qstats.Q["stat_partial_corr"](spark, SF).collect()[0]
    assert got["n"] == len(sx)
    assert abs(got["r_partial"] - round(r, 6)) <= 1e-9
    # busy days are rich days even within a weekday stratum
    assert got["r_partial"] > 0.5


def test_icc_matches_replay(spark):
    groups = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["user_id"] is None or r["value"] is None:
            continue
        groups[r["user_id"]].append(round(r["value"] * 100))
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    q = sum(x * x for v in groups.values() for x in v)
    sn2 = sum(len(v) ** 2 for v in groups.values())
    sb = sum(sum(v) * sum(v) / len(v) for v in groups.values())
    msb = (sb - s * s / n) / (k - 1)
    msw = (q - sb) / (n - k)
    n0 = (n - sn2 / n) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    got = qstats.Q["stat_icc"](spark, SF).collect()[0]
    assert (got["n_groups"], got["n_obs"]) == (k, n)
    assert abs(got["icc1"] - round(icc, 6)) <= 1e-9
    # one shared distribution: between-user variance is noise
    assert -0.2 < got["icc1"] < 0.2
