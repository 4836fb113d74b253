"""Wave-81 invariants: dynamic-gap session_window vs a Python
interval-merge replay, cogrouped applyInArrow vs a plain-aggregate
replay, the try_* arithmetic census identities, and recall@5 vs a
pandas ranking replay."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qml, qrel, qsql, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"

GAP_US = {"view": 1_800_000_000}
DEFAULT_GAP_US = 3_600_000_000


def test_session_dynamic_matches_interval_merge_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
            "event_type",
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(
            (r.tus, r.event_id, GAP_US.get(r.event_type, DEFAULT_GAP_US))
        )
    want = {}  # user -> list of (start_us, n_events)
    for u, evs in by_user.items():
        evs.sort()
        sessions = []
        cur_start, cur_end, cur_n = None, None, 0
        for tus, _eid, gap in evs:
            if cur_start is None or tus > cur_end:
                if cur_start is not None:
                    sessions.append((cur_start, cur_n))
                cur_start, cur_end, cur_n = tus, tus + gap, 1
            else:
                cur_end = max(cur_end, tus + gap)
                cur_n += 1
        sessions.append((cur_start, cur_n))
        want[u] = sorted(sessions)
    got = defaultdict(list)
    out = qrel.Q["win_session_dynamic"](spark, SF).select(
        "user_id",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias(
            "sus"
        ),
        "n_events",
    )
    for r in out.collect():
        got[r.user_id].append((r.sus, r.n_events))
    got = {u: sorted(v) for u, v in got.items()}
    assert got == dict(want)


def test_cogroup_arrow_matches_plain_aggregate(spark):
    got = {
        r["user_id"]: (
            r["n_click"],
            r["n_purch"],
            r["click_cents"],
            r["purch_cents"],
        )
        for r in qstats.Q["udf_cogroup_arrow"](spark, SF).collect()
    }
    e = t(spark, SF, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    want = {
        r["user_id"]: (
            r["n_click"],
            r["n_purch"],
            r["click_cents"],
            r["purch_cents"],
        )
        for r in e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("n_click"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purch"),
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "click", cents)
                ),
                F.lit(0),
            ).alias("click_cents"),
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", cents)
                ),
                F.lit(0),
            ).alias("purch_cents"),
        )
        .collect()
    }
    assert got == want


def test_try_arith_census_identities(spark):
    r = qsql.Q["sql_try_arith"](spark, SF).collect()[0]
    b = (
        t(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            (F.col("event_id") % 5).alias("k"),
        )
        .collect()
    )
    n = len(b)
    k0 = sum(1 for x in b if x.k == 0)
    mul_null = sum(
        1 for x in b if abs(x.cents * 10**15) > 2**63 - 1
    )
    add_null = sum(
        1 for x in b if 9223372036854775000 + x.cents > 2**63 - 1
    )
    assert (r["n"], r["n_div_null"], r["n_mod_null"]) == (n, k0, k0)
    assert r["n_mul_null"] == mul_null
    assert r["n_add_null"] == add_null
    assert r["sum_mod"] == sum(x.cents % x.k for x in b if x.k != 0)
    # the overflow rungs must actually bite on the fixture
    assert 0 < mul_null or 0 < add_null


def test_recall_at_k_matches_pandas_replay(spark):
    got = {
        r["user_id"]: (r["n_rel"], r["hits_at_5"], r["recall_at_5"])
        for r in qml.Q["ml_recall_at_k"](spark, SF).collect()
    }
    rows = (
        t(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((-r.cents, r.event_id, r.event_type))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        n_rel = sum(1 for e in evs if e[2] == "purchase")
        if n_rel == 0:
            continue
        hits = sum(1 for e in evs[:5] if e[2] == "purchase")
        want[u] = (n_rel, hits, round(hits / n_rel, 6))
    assert got == want
