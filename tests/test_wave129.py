"""Wave-129 invariants: the BH battery matches a scipy-free Python
replay (A&S erfc polynomial + integer step-up), p agrees with the
true normal tail within the polynomial's documented 2.5e-5, and
rejection is by rank <= k (the step-up), not the per-row
inequality."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5)


def _p_mic(az: float) -> int:
    x = az / math.sqrt(2.0)
    den = 1.0 + 0.47047 * x
    poly = 0.3480242 / den - 0.0958798 / den**2 + 0.7478556 / den**3
    return _rnd(1e6 * poly * math.exp(-x * x))


def test_bh_matches_replay_and_stepup(spark):
    vals = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None:
            vals[r["event_type"]].append(round(r["value"] * 100))
    allv = [c for vs in vals.values() for c in vs]
    gm = sum(allv) / len(allv)
    rows = []
    for et, vs in vals.items():
        if len(vs) < 2:
            continue
        s2 = statistics.variance(vs)
        if s2 <= 0:
            continue
        az = abs(sum(vs) / len(vs) - gm) / math.sqrt(s2 / len(vs))
        rows.append((et, round(az, 6), _p_mic(az)))
        # polynomial accuracy vs the true normal tail
        true_p = math.erfc(az / math.sqrt(2.0))
        assert abs(_p_mic(az) / 1e6 - true_p) <= 5e-5
    m = len(rows)
    ranked = sorted(rows, key=lambda r: (r[2], r[0]))
    k = 0
    for i, (_, _, pm) in enumerate(ranked, 1):
        if 20 * pm * m <= i * 1_000_000:
            k = i
    got = sorted(
        (
            (r["event_type"], r["z_abs"], r["p_mic"], r["rnk"],
             r["rejected"])
            for r in qstats.Q["stat_bh_fdr"](spark, SF).collect()
        ),
        key=lambda r: r[3],
    )
    assert [(g[0], g[1], g[2]) for g in got] == [
        (r[0], r[1], r[2]) for r in ranked
    ]
    assert [g[4] for g in got] == [i + 1 <= k for i in range(m)]
    assert m >= 4
    # the synthetic corpus is NULL-TRUE by construction (values are
    # iid across types), so the truthful verdict is zero rejections
    assert k == 0 and not any(g[4] for g in got)


def test_bh_stepup_property_on_fabricated_battery():
    # rank 2 fails its OWN threshold (0.025 > 2/5*0.05) but rank 3
    # passes (0.028 <= 0.03), so the step-up rejects ranks 1..3 —
    # the property a naive per-row threshold misses
    p_mics = [10_000, 25_000, 28_000, 900_000, 950_000]
    m = len(p_mics)
    k = 0
    own = []
    for i, pm in enumerate(p_mics, 1):
        ok = 20 * pm * m <= i * 1_000_000
        own.append(ok)
        if ok:
            k = i
    assert own == [True, False, True, False, False]
    assert k == 3
    rejected = [i + 1 <= k for i in range(m)]
    assert rejected == [True, True, True, False, False]
    assert rejected[1] and not own[1]
