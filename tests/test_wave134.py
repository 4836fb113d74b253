"""Wave-134 invariant: Dunn's pairwise z matches the pooled
doubled-rank replay with tie-exact variance over all 10 pairs, and
stays small on the null-true fixture."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_dunn_matches_pooled_rank_replay(spark):
    vals = defaultdict(list)
    allv = []
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None:
            c = round(r["value"] * 100)
            vals[r["event_type"]].append(c)
            allv.append(c)
    n = len(allv)
    cnt = Counter(allv)
    start, first = {}, 1
    for u in sorted(cnt):
        start[u] = first
        first += cnt[u]
    dr = {u: 2 * start[u] + cnt[u] - 1 for u in cnt}
    tsum = sum(tc**3 - tc for tc in cnt.values())
    mean_rank = {
        et: sum(dr[c] for c in cs) / len(cs) / 2.0
        for et, cs in vals.items()
    }
    types = sorted(vals)
    expect = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            na, nb = len(vals[ta]), len(vals[tb])
            var = (n * (n + 1) / 12.0 - tsum / (12.0 * (n - 1))) * (
                1.0 / na + 1.0 / nb
            )
            expect[(ta, tb)] = (
                na, nb,
                round((mean_rank[ta] - mean_rank[tb]) / math.sqrt(var), 6),
            )
    got = {
        (r["type_a"], r["type_b"]): (r["na"], r["nb"], r["z"])
        for r in qstats.Q["stat_dunn"](spark, SF).collect()
    }
    assert set(got) == set(expect) and len(got) == 10
    for k in expect:
        assert got[k][:2] == expect[k][:2]
        assert abs(got[k][2] - expect[k][2]) <= 1e-6
        assert abs(got[k][2]) < 5  # null-true fixture
