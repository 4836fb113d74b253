"""Wave-86 invariants: the chunked range join equals a brute-force
interval replay AND plans no nested-loop operator; burn rates match a
window replay; the struct-returning UDF splits both bands with exact
half-up cents."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qdata, qio, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _events(spark):
    return [
        (
            r["event_id"],
            r["event_type"],
            int(r["ts"].timestamp() * 1000000),
            _rnd_away(r["value"] * 100),
        )
        for r in t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select("event_id", "event_type", F.expr("CAST(ts AS TIMESTAMP)").alias("ts"), "value")
        .collect()
    ]


def test_range_chunked_matches_bruteforce_and_avoids_nested_loop(spark):
    ev = _events(spark)
    per: dict[int, list[int]] = {}
    for eid, etype, us, _ in ev:
        if etype != "error":
            continue
        hits = [c for _, _, u, c in ev if us <= u <= us + 3600000000]
        per[eid] = [len(hits), sum(hits)]
    top = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    df = qio.Q["join_range_chunked"](spark, SF)
    got = [(r["incident_id"], [r["n_within"], r["cents_within"]]) for r in df.collect()]
    assert got == top
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # every window catches at least itself
    assert all(n >= 1 for _, (n, _) in top)


def test_burn_rate_matches_window_replay(spark):
    ev = _events(spark)
    hours: dict[int, list[int]] = {}
    for _, etype, us, _ in ev:
        h = us // 3600000000
        a = hours.setdefault(h, [0, 0])
        a[0] += 1
        a[1] += 1 if etype == "error" else 0
    rep = {}
    for h, (tot, err) in hours.items():
        t6 = sum(v[0] for k, v in hours.items() if h - 5 <= k <= h)
        e6 = sum(v[1] for k, v in hours.items() if h - 5 <= k <= h)
        rep[h] = (
            err,
            tot,
            round(err * 1.0 / tot / 0.001, 6),
            round(e6 * 1.0 / t6 / 0.001, 6),
        )
    top = sorted(rep.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    got = qstats.Q["events_burn_rate"](spark, SF).collect()
    assert len(got) == len(top)
    for r, (h, (err, tot, b1, b6)) in zip(got, top):
        assert r["hour_num"] == h
        assert (r["errors"], r["total"]) == (err, tot)
        assert abs(r["burn_1h"] - b1) < 1e-9
        assert abs(r["burn_6h"] - b6) < 1e-9
        assert r["page"] == (b1 > 14.4 and b6 > 6.0)


def test_struct_udf_bands_match_exact_split(spark):
    ev = _events(spark)
    exp: dict[str, list[int]] = {}
    for _, _, _, cents in ev:
        band = "big" if cents >= 5000 else "small"
        a = exp.setdefault(band, [0, 0])
        a[0] += 1
        a[1] += cents
    got = {
        r["band"]: (r["n"], r["cents_sum"])
        for r in qdata.Q["udf_struct_return"](spark, SF).collect()
    }
    assert set(got) == set(exp) == {"big", "small"}
    for band, (n, s) in exp.items():
        assert got[band] == (n, s)
