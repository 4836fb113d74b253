"""Wave-116 invariants: the chained streaming rollup equals the
batch replay with every emitted day fully assembled from closed 6h
sub-windows; NULLS FIRST/LAST place the fabricated NULL block at
exactly the head/tail; max drawdown equals the running-peak replay
and the fixture actually draws down."""

from __future__ import annotations

from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qrel, qsql, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"

H6 = 21_600_000_000
DAY = 86_400_000_000


def test_chained_windows_match_batch_replay(spark):
    us_rows = [
        (int(r["ts"].timestamp() * 1_000_000), round(r["value"] * 100))
        for r in t(spark, SF, "events").collect()
        if r["ts"] is not None and r["value"] is not None
    ]
    wm = (max(us for us, _ in us_rows) // 1000) * 1000 - 3_600_000_000
    day = defaultdict(lambda: [0, 0, set()])
    for us, cents in us_rows:
        s6 = us // H6 * H6
        sd = s6 // DAY * DAY
        day[sd][0] += 1
        day[sd][1] += cents
        day[sd][2].add(s6)
    expect = {
        sd: (n, c, len(subs))
        for sd, (n, c, subs) in day.items()
        if sd + DAY <= wm
    }
    got = {
        r["day_start_us"]: (r["n"], r["cents"], r["n_sub"])
        for r in qrel.Q["stream_chained_windows"](spark, SF).collect()
    }
    assert got == expect and expect
    # every emitted day is fully assembled (4 closed 6h sub-windows)
    assert all(v[2] == 4 for v in got.values())


def test_nulls_ordering_head_and_tail(spark):
    rows = qsql.Q["sql_nulls_ordering"](spark, SF).collect()
    n_total = t(spark, SF, "events").count()
    nf_head = {r["rn_nf"]: r for r in rows if r["rn_nf"] <= 25}
    nl_head = {r["rn_nl"]: r for r in rows if r["rn_nl"] <= 25}
    assert len(nf_head) == 25 and len(nl_head) == 25
    n_null = sum(
        1
        for r in t(spark, SF, "events").collect()
        if r["user_id"] % 8 == 3
    )
    assert n_null > 25, "fixture needs a NULL block bigger than the head"
    # NULLS FIRST: the whole head is the NULL block, ordered by id
    assert all(r["k"] is None for r in nf_head.values())
    ids = [nf_head[i]["event_id"] for i in range(1, 26)]
    assert ids == sorted(ids)
    # NULLS LAST: no NULL key appears in the head
    assert all(r["k"] is not None for r in nl_head.values())
    # and the NULL block ends the NULLS LAST ordering: rank of the
    # first NULL row under NULLS LAST is n_total - n_null + 1 —
    # verify via the NULLS FIRST head's rank-1 row
    first_null = nf_head[1]
    assert first_null["rn_nl"] == n_total - n_null + 1


def test_drawdown_matches_running_peak_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        daily[r["event_type"]][us // DAY] += round(r["value"] * 100)
    expect = {}
    for et, days in daily.items():
        peak, mx, trough = None, 0, None
        for d in sorted(days):
            c = days[d]
            peak = c if peak is None else max(peak, c)
            draw = peak - c
            if draw > mx:
                mx, trough = draw, d
        if trough is None:
            trough = min(days)  # all-zero draw: first day ties at 0
        expect[et] = (mx, trough)
    got = {
        r["event_type"]: (r["max_drawdown_cents"], r["trough_day"])
        for r in qstats.Q["events_drawdown"](spark, SF).collect()
    }
    assert got == expect
    assert any(v[0] > 0 for v in got.values()), "fixture never draws down"
