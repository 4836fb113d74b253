"""Wave-132 invariants: Welch's ANOVA matches the moments replay
and sits near 1 on the null-true fixture; the bounded-frame pandas
window UDF matches a row-by-row frame replay AND plans as the
Arrow-batched Python window eval (not a rewritten JVM aggregate)."""

from __future__ import annotations

import statistics
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qdata, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_welch_anova_matches_replay(spark):
    vals = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None:
            vals[r["event_type"]].append(round(r["value"] * 100))
    ws = []
    for vs in vals.values():
        if len(vs) < 2:
            continue
        s2 = statistics.variance(vs)
        if s2 <= 0:
            continue
        n = len(vs)
        ws.append((n, sum(vs) / n, n / s2))
    k = len(ws)
    sw = sum(w for _, _, w in ws)
    mw = sum(w * m for _, m, w in ws) / sw
    num = sum(w * (m - mw) ** 2 for _, m, w in ws)
    lam = sum((1 - w / sw) ** 2 / (n - 1) for n, _, w in ws)
    f = num / (k - 1) / (1.0 + 2.0 * (k - 2) / (k * k - 1.0) * lam)
    got = qstats.Q["stat_anova_welch"](spark, SF).collect()[0]
    assert got["k"] == k >= 4
    assert abs(got["f_stat"] - round(f, 6)) <= 1e-6
    assert abs(got["df2"] - round((k * k - 1.0) / (3.0 * lam), 6)) <= 1e-6
    assert 0 < got["f_stat"] < 10  # null-true fixture


def test_window_udf_matches_frame_replay_and_plan(spark):
    df = qdata.Q["udf_window_bounded"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowInPandas" in plan or "ArrowWindowPython" in plan, plan[:500]
    rows = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None and r["user_id"] is not None:
            rows[r["user_id"]].append(
                (r["event_id"], round(r["value"] * 100))
            )
    expect = {}
    for uid, evs in rows.items():
        evs.sort()
        for i, (eid, _) in enumerate(evs):
            expect[(uid, eid)] = sum(
                c for _, c in evs[max(0, i - 2) : i + 1]
            )
    got = {
        (r["user_id"], r["event_id"]): r["roll3"]
        for r in df.collect()
    }
    assert got == expect and len(got) > 500
