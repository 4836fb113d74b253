"""Wave-77 invariants: Lorenz decile points against a sorted replay
(monotone, convex-ish, below the diagonal), and the line census
against a Python splitlines replay."""

from __future__ import annotations

import math

from dbpedia_spotlight_db_spark.queries import qcorpus, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_lorenz_matches_sorted_replay(spark):
    cents = sorted(
        _rnd_away(r["value"] * 100)
        for r in t(spark, SF, "events")
        .filter("value IS NOT NULL AND value >= 0")
        .select("value")
        .collect()
    )
    n, s = len(cents), sum(cents)
    got = {
        r["decile"]: r["lorenz_share"]
        for r in qml.Q["stat_lorenz"](spark, SF).collect()
    }
    assert set(got) == set(range(1, 10))
    prev = 0.0
    for d in range(1, 10):
        # replay the face's step convention exactly: the last support
        # row (whole tie-run) whose cumulative population ck*10 <= n*d
        cum_pop = 0
        cum_mass = 0
        best = None
        i = 0
        while i < n:
            j = i
            while j < n and cents[j] == cents[i]:
                j += 1
            cum_pop += j - i
            cum_mass += cents[i] * (j - i)
            if cum_pop * 10 <= n * d:
                best = cum_mass / s
            i = j
        g = got[d]
        if best is None:
            assert g is None
        else:
            assert abs(g - round(best, 6)) < 1e-9
            assert g <= d / 10 + 1e-9  # Lorenz lies below the diagonal
            assert g >= prev - 1e-9  # monotone in d
            prev = g


def test_line_stats_matches_splitlines_replay(spark):
    agg: dict[str, list] = {}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("lang", "text")
        .collect()
    ):
        lines = r["text"].split("\n")
        v = agg.setdefault(r["lang"], [0, 0, 0, 0])
        v[0] += 1
        v[1] += len(lines)
        v[2] += sum(1 for x in lines if x.strip() == "")
        v[3] = max(v[3], max(len(x) for x in lines))
    got = {
        r["lang"]: (
            r["n_docs"],
            r["lines"],
            r["blank_lines"],
            r["max_line_len"],
            r["lines_per_doc"],
        )
        for r in qcorpus.Q["text_line_stats"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for lang, v in agg.items():
        g = got[lang]
        assert g[:4] == tuple(v)
        assert abs(g[4] - round(v[1] / v[0], 6)) < 1e-9
