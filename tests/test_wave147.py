"""Wave-147 invariants: the DISTINCT ON translation keeps exactly
the (ts, event_id)-maximal row per user and plans with
WindowGroupLimit (partial top-1 before the shuffle); the
business-day closed form equals a literal day-by-day calendar walk
including weekend-start and same-day edges."""

from __future__ import annotations

from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_distinct_on_matches_argmax(spark):
    best = {}
    for r in t(spark, SF, "events").collect():
        if r["user_id"] is None or r["value"] is None:
            continue
        key = (r["ts"], r["event_id"])
        if r["user_id"] not in best or key > best[r["user_id"]][0]:
            best[r["user_id"]] = (
                key,
                r["event_type"],
                round(r["value"] * 100),
                int(r["ts"].timestamp() * 1_000_000),
            )
    df = qsql.Q["sql_distinct_on"](spark, SF)
    got = {r["user_id"]: r for r in df.collect()}
    assert set(got) == set(best)
    for u, (_, typ, cents, us) in best.items():
        assert (
            got[u]["last_type"],
            got[u]["last_cents"],
            got[u]["last_us"],
        ) == (typ, cents, us)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def _bdays_walk(a: int, b: int) -> int:
    # literal half-open walk; dow 0=Mon via (day+3)%7, epoch day 0=Thu
    return sum(1 for d in range(a, b) if (d + 3) % 7 < 5)


def test_business_days_closed_form_edges():
    from dbpedia_spotlight_db_spark.queries.qrel import Q  # noqa: F401

    def closed(a, b):
        bd = 5 * ((b - a) // 7)
        rem = (b - a) % 7
        dow = (a + 3) % 7
        for i in range(6):
            if rem > i and (dow + i) % 7 < 5:
                bd += 1
        return bd

    # exhaustive over all weekday starts and spans 0..21
    for a in range(100, 107):
        for span in range(0, 22):
            assert closed(a, a + span) == _bdays_walk(a, a + span), (
                a, span,
            )


def test_business_days_matches_replay(spark):
    orders = {
        r["o_orderkey"]: (
            r["o_orderpriority"],
            int(r["o_orderdate"].timestamp() * 1_000_000)
            // 86_400_000_000,
        )
        for r in t(spark, SF, "orders").collect()
    }
    per = defaultdict(list)
    for r in t(spark, SF, "lineitem").collect():
        if r["l_orderkey"] not in orders:
            continue
        pri, a = orders[r["l_orderkey"]]
        b = (
            int(r["l_shipdate"].timestamp() * 1_000_000)
            // 86_400_000_000
        )
        if b >= a:
            per[pri].append(_bdays_walk(a, b))
    got = {
        r["priority"]: r
        for r in qrel.Q["date_business_days"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for pri, vals in per.items():
        assert (
            got[pri]["n"],
            got[pri]["total_bdays"],
            got[pri]["min_bdays"],
            got[pri]["max_bdays"],
        ) == (len(vals), sum(vals), min(vals), max(vals))
        assert (
            abs(got[pri]["avg_bdays"] - round(sum(vals) / len(vals), 6))
            <= 1e-9
        )
