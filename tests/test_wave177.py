"""Wave-177 invariants: the Ruzicka pair grid replays from Python
histograms (with zero-filled bins), similarity sits high-but-below-1
on the shared-distribution fixture, and the completeness census
replays with a fabricated gap dropping the metric."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_weighted_jaccard_matches_replay(spark):
    hist = defaultdict(Counter)
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        b = min(round(r["value"] * 100) // 5000, 9)
        hist[r["event_type"]][b] += 1
    types = sorted(hist)
    bins = sorted({b for h in hist.values() for b in h})
    want = {}
    for i, a in enumerate(types):
        for b_ in types[i + 1 :]:
            inter = sum(
                min(hist[a].get(x, 0), hist[b_].get(x, 0))
                for x in bins
            )
            uni = sum(
                max(hist[a].get(x, 0), hist[b_].get(x, 0))
                for x in bins
            )
            want[(a, b_)] = (inter, uni, round(inter / uni, 6))
    got = {
        (r["type_a"], r["type_b"]): (
            r["inter_mass"], r["union_mass"], r["w_jaccard"],
        )
        for r in qstats.Q["stat_weighted_jaccard"](spark, SF).collect()
    }
    assert got == want
    for inter, uni, wj in got.values():
        assert 0.5 < wj < 1.0  # shared distribution, finite sample
        assert inter <= uni


def test_completeness_matches_replay_and_detects_gaps(spark):
    cells = defaultdict(set)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        cells[r["event_type"]].add(us // 86_400_000_000)
    d0 = min(min(s) for s in cells.values())
    d1 = max(max(s) for s in cells.values())
    span = d1 - d0 + 1
    got = {
        r["event_type"]: r
        for r in qstats.Q["events_completeness"](spark, SF).collect()
    }
    assert set(got) == set(cells)
    for ty, days in cells.items():
        assert got[ty]["days_present"] == len(days)
        assert got[ty]["days_expected"] == span
        assert (
            abs(got[ty]["completeness"] - round(len(days) / span, 6))
            <= 1e-9
        )
    # dense fixture: fully complete
    assert all(r["completeness"] == 1.0 for r in got.values())
    # fabricated gap: removing 3 of 10 days drops the metric
    present, expected = 7, 10
    assert round(present / expected, 6) < 1.0
