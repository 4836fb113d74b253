"""Invariant tests for the wave-11 analytics faces: basket-rule
probability identities, streak reconstruction on a crafted timeline,
rolling-distinct cross-check against a brute-force recount, and
graph-summary conservation laws.
"""

from __future__ import annotations

import datetime

import pandas as pd

from dbpedia_spotlight_db_spark.queries import qpipe, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_basket_rules_probability_identities(spark):
    got = qstats.Q["basket_rules"](spark, SF).toPandas()
    assert len(got) > 0
    n_orders = (
        t(spark, SF, "lineitem").select("l_orderkey").distinct().count()
    )
    # support recovers n_ab / n_orders; confidence and lift stay in range
    assert (
        (got["support"] - got["n_ab"] / n_orders).abs() < 1e-6
    ).all()
    assert ((got["confidence"] > 0) & (got["confidence"] <= 1)).all()
    assert (got["lift"] > 0).all()
    # the pair is stored once, oriented
    assert (got["pk_a"] < got["pk_b"]).all()


def test_win_streaks_crafted_timeline(spark, tmp_path):
    def ev(i, day, user):
        return (i, datetime.datetime(2024, 1, day, 8), user, "click", 1.0, "{}")

    # user 1: days 1,2,3 then 10,11 -> longest 3, 5 active days, 2 streaks
    # user 2: day 5 only (two events same day collapse) -> longest 1
    rows = [
        ev(1, 1, 1), ev(2, 2, 1), ev(3, 3, 1), ev(4, 10, 1), ev(5, 11, 1),
        ev(6, 5, 2), ev(7, 5, 2),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        r.user_id: r
        for r in qstats.Q["win_streaks"](spark, str(tmp_path)).collect()
    }
    assert got[1].longest_streak == 3
    assert got[1].n_active_days == 5
    assert got[1].n_streaks == 2
    assert got[2].longest_streak == 1
    assert got[2].n_streaks == 1


def test_rolling_dau_matches_bruteforce(spark):
    got = qstats.Q["events_rolling_dau"](spark, SF).toPandas()
    ud = (
        t(spark, SF, "events")
        .selectExpr("user_id", "CAST(ts AS DATE) AS day")
        .distinct()
        .toPandas()
    )
    ud["day"] = pd.to_datetime(ud["day"])
    for _, row in got.iterrows():
        d = pd.Timestamp(row["day"])
        lo = d - pd.Timedelta(days=6)
        brute = ud[(ud["day"] >= lo) & (ud["day"] <= d)]["user_id"].nunique()
        assert row["wau7"] == brute
        assert row["dau"] == ud[ud["day"] == d]["user_id"].nunique()
    assert (got["wau7"] >= got["dau"]).all()


def test_degree_dist_conservation(spark):
    got = qpipe.Q["graph_degree_dist"](spark, SF).toPandas()
    deg = (
        qpipe._undirected_edges(spark, SF)
        .groupBy("src")
        .count()
        .toPandas()
    )
    assert int(got["n_nodes"].sum()) == len(deg)
    n_directed = qpipe._undirected_edges(spark, SF).count()
    assert int((got["degree"] * got["n_nodes"]).sum()) == n_directed


def test_assortativity_is_a_correlation(spark):
    got = qpipe.Q["kg_assortativity"](spark, SF).collect()[0]
    assert -1.0 <= got.assortativity <= 1.0
    assert got.n_directed_edges == qpipe._undirected_edges(spark, SF).count()
