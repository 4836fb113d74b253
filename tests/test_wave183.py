"""Wave-183 invariants: the packed-integer top-3 equals a brute
per-group sort (the composite key keeps tiebreaks engine-unique),
and Chao1 replays from counts-of-counts with chao1 >= s_obs."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qadv, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_topn_array_matches_brute(spark):
    per = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        per[r["event_type"]].append(
            (round(r["value"] * 100), r["event_id"])
        )
    got = {
        r["event_type"]: r
        for r in qrel.Q["agg_topn_array"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for ty, rows in per.items():
        top = sorted(
            rows, key=lambda x: (x[0], x[1]), reverse=True
        )[:3]
        assert (
            got[ty]["c1"], got[ty]["c2"], got[ty]["c3"],
        ) == tuple(c for c, _ in top)
        assert got[ty]["id1"] == top[0][1]
        # composite-key precondition of the face
        assert all(eid < 10_000_000_000 for _, eid in rows)


def test_chao1_matches_replay(spark):
    vc = Counter()
    for r in t(spark, SF, "documents").collect():
        for tk in (r["text"] or "").split(" "):
            if tk != "":
                vc[tk] += 1
    s_obs = len(vc)
    f1 = sum(1 for c in vc.values() if c == 1)
    f2 = sum(1 for c in vc.values() if c == 2)
    if f2 > 0:
        unseen = f1 * f1 / (2.0 * f2)
    else:
        unseen = f1 * (f1 - 1) / 2.0
    got = qadv.Q["text_chao1"](spark, SF).collect()[0]
    assert (got["s_obs"], got["f1"], got["f2"]) == (s_obs, f1, f2)
    assert abs(got["chao1"] - round(s_obs + unseen, 6)) <= 1e-9
    assert abs(got["est_unseen"] - round(unseen, 6)) <= 1e-9
    assert got["chao1"] >= s_obs
    # closed synthetic vocabulary: unseen mass is a small share
    assert got["est_unseen"] < 0.5 * s_obs
