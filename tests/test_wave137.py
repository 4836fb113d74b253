"""Wave-137 invariant: the ITS pre/post fits equal independent
least-squares replays, the level change evaluates both fits at the
cut day, and the trendless fixture keeps both changes bounded."""

from __future__ import annotations

from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _ols(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icept = sy / n - slope * sx / n
    return slope, icept


def test_its_matches_segmented_ols(spark):
    daily = defaultdict(int)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        daily[us // 86_400_000_000] += round(r["value"] * 100)
    days = sorted(daily)
    c = (days[0] + days[-1]) // 2
    pre = [(float(d), daily[d] / 100.0) for d in days if d < c]
    post = [(float(d), daily[d] / 100.0) for d in days if d >= c]
    sp, ip = _ols(pre)
    ss, is_ = _ols(post)
    got = qstats.Q["events_its"](spark, SF).collect()[0]
    assert (got["n_pre"], got["n_post"], got["cut_day"]) == (
        len(pre), len(post), c,
    )
    assert abs(got["slope_pre"] - sp) <= 1e-4
    assert abs(got["slope_post"] - ss) <= 1e-4
    assert abs(got["slope_change"] - (ss - sp)) <= 1e-4
    assert abs(got["level_change"] - ((is_ + ss * c) - (ip + sp * c))) <= 1e-3
    # trendless fixture: bounded effects (daily revenue ~ $2000)
    assert abs(got["slope_change"]) < 200
    assert abs(got["level_change"]) < 2000
