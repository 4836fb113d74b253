"""Wave-158 invariants: the Page-Hinkley recursion replays day by
day through the quantization (online property: each term uses only
the prefix mean) with no alarm on the trendless fixture; the Allen
census replays from a Python classifier and the start-sort
impossibility classes are absent."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_page_hinkley_matches_replay(spark):
    daily = defaultdict(int)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        daily[us // 86_400_000_000] += round(r["value"] * 100)
    cs = 0
    m = 0
    mn = None
    ph = 0
    for i, d in enumerate(sorted(daily), start=1):
        cs += daily[d]
        dev = round(1e6 * (daily[d] - cs / i - 5000.0))
        m += dev
        mn = m if mn is None else min(mn, m)
        ph = max(ph, m - mn)
    got = qstats.Q["events_page_hinkley"](spark, SF).collect()[0]
    assert (got["n_days"], got["ph_mic"]) == (len(daily), ph)
    assert abs(got["ph_dollars"] - round(ph / 1e8, 6)) <= 1e-9
    assert got["alarm"] is False  # trendless fixture


def test_allen_census_matches_replay(spark):
    iv = defaultdict(list)
    acc = {}
    for r in t(spark, SF, "events").collect():
        if r["user_id"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        key = (r["user_id"], us // 86_400_000_000)
        lo, hi = acc.get(key, (us, us))
        acc[key] = (min(lo, us), max(hi, us))
    for (u, d), (s, e) in acc.items():
        iv[d].append((s, e, u))
    cnt = Counter()
    for d, rows in iv.items():
        rows.sort()
        for (s, e, _), (s2, e2, _) in zip(rows, rows[1:]):
            if e < s2:
                rel = "before"
            elif e == s2:
                rel = "meets"
            elif s == s2 and e == e2:
                rel = "equals"
            elif s == s2 and e < e2:
                rel = "starts"
            elif s == s2 and e > e2:
                rel = "started_by"
            elif e == e2:
                rel = "finished_by"
            elif e > e2:
                rel = "contains"
            else:
                rel = "overlaps"
            cnt[rel] += 1
    got = {
        r["rel"]: r["n"]
        for r in qstats.Q["events_allen_relations"](spark, SF).collect()
    }
    assert got == dict(cnt)
    # start-sorted neighbors can never be 'during'/'finishes' (the
    # left interval starts no later than the right one)
    assert "during" not in got and "finishes" not in got
    assert sum(got.values()) > 0
