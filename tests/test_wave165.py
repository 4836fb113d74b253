"""Wave-165 invariants: median polish replays two full sweeps in
Python (exact lower medians), sweep-2 effects shrink (convergence),
residual mass matches; turning points replay with the strict-tie
convention and the iid fixture sits in the null band."""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _lower_median(vals):
    srt = sorted(vals)
    n = len(srt)
    for i, v in enumerate(srt, 1):
        if 2 * i >= n:
            return v


def test_median_polish_matches_replay(spark):
    daily = defaultdict(dict)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        d = us // 86_400_000_000
        daily[d][r["event_type"]] = daily[d].get(
            r["event_type"], 0
        ) + round(r["value"] * 100)
    types = sorted({ty for d in daily.values() for ty in d})
    k = len(types)
    grid = {
        (d, ty): c // 100
        for d, row in daily.items()
        if len(row) == k
        for ty, c in row.items()
    }
    days = sorted({d for d, _ in grid})
    col_eff = {ty: 0 for ty in types}
    for _sweep in (1, 2):
        for d in days:
            m = _lower_median([grid[(d, ty)] for ty in types])
            for ty in types:
                grid[(d, ty)] -= m
        sweep_cols = {}
        for ty in types:
            m = _lower_median([grid[(d, ty)] for d in days])
            sweep_cols[ty] = m
            for d in days:
                grid[(d, ty)] -= m
            col_eff[ty] += m
        if _sweep == 1:
            first_cols = dict(sweep_cols)
    resid = sum(abs(v) for v in grid.values())
    got = {
        r["event_type"]: r
        for r in qstats.Q["stat_median_polish"](spark, SF).collect()
    }
    assert set(got) == set(types)
    for ty in types:
        assert got[ty]["col_effect"] == col_eff[ty], ty
        assert got[ty]["resid_abs"] == resid
        assert got[ty]["n_cells"] == len(days) * k
    # convergence: sweep-2 column corrections are small vs sweep-1
    s1 = sum(abs(v) for v in first_cols.values())
    s2 = sum(abs(col_eff[ty] - first_cols[ty]) for ty in types)
    assert s2 <= s1


def test_turning_points_matches_replay(spark):
    cents = defaultdict(int)
    for r in t(spark, SF, "orders").collect():
        d = (
            int(r["o_orderdate"].timestamp() * 1_000_000)
            // 86_400_000_000
        )
        cents[d] += round(r["o_totalprice"] * 100)
    seq = [cents[d] for d in sorted(cents)]
    n = len(seq)
    tp = sum(
        1
        for i in range(1, n - 1)
        if (seq[i] > seq[i - 1] and seq[i] > seq[i + 1])
        or (seq[i] < seq[i - 1] and seq[i] < seq[i + 1])
    )
    got = qstats.Q["stat_turning_points"](spark, SF).collect()[0]
    assert (got["n"], got["n_turning"]) == (n, tp)
    z = (tp - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
    assert abs(got["z"] - round(z, 6)) <= 1e-9
    assert got["random_ok"] is True
    # iid: about two-thirds of interior points turn
    assert 0.5 < tp / (n - 2) < 0.8
