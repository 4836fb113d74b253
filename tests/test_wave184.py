"""Wave-184 invariants: the skew census replays from per-key counts,
the near-uniform fixture stays below the salting trigger, and a
fabricated celebrity key fires it."""

from __future__ import annotations

from collections import Counter

from dbpedia_spotlight_db_spark.queries import qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_key_skew_census_matches_replay(spark):
    kc = Counter()
    for r in t(spark, SF, "events").collect():
        if r["user_id"] is not None:
            kc[r["user_id"]] += 1
    n_keys = len(kc)
    n_rows = sum(kc.values())
    mx = max(kc.values())
    got = qrel.Q["agg_key_skew_census"](spark, SF).collect()[0]
    assert (got["n_keys"], got["n_rows"], got["max_key_rows"]) == (
        n_keys, n_rows, mx,
    )
    assert abs(got["top_key_share"] - round(mx / n_rows, 6)) <= 1e-9
    factor = mx * n_keys / n_rows
    assert abs(got["skew_factor"] - round(factor, 6)) <= 1e-9
    # near-uniform synthetic users: below the 4x salting trigger
    assert got["skew_factor"] < 4.0
    assert got["salting_recommended"] is False
    # fabricated celebrity key fires the trigger
    fab = Counter({u: 10 for u in range(100)})
    fab["celebrity"] = 5000
    f_factor = 5000 * len(fab) / sum(fab.values())
    assert f_factor > 4.0
