"""Invariant tests for the analytics/profiling breadth wave
(qstats.py). Spark-vs-DuckDB value equality is the oracle gate's job
(tools/check_oracle.py); these pin the semantics the hash compare
can't articulate: spine completeness, frame arithmetic, z-score
soundness, transition conservation, fuzzy-match recovery, cogroup
replay.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_gapfill_spine_is_complete_and_conserves_counts(spark):
    got = qstats.Q["events_gapfill"](spark, SF).toPandas()
    e = t(spark, SF, "events")
    n_types = e.select("event_type").distinct().count()
    days = sorted(got["day"].unique())
    # dense daily spine: every (type, day) cell exists exactly once
    assert len(got) == n_types * len(days)
    assert got.groupby(["event_type", "day"]).size().max() == 1
    # zero-filling must not invent events
    assert int(got["n_events"].sum()) == e.count()


def test_gapfill_fills_silent_days_with_zero(spark, tmp_path):
    import datetime

    rows = [
        (1, datetime.datetime(2024, 1, 1, 12), 1, "click", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 4, 12), 1, "click", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 2, 12), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")
    got = qstats.Q["events_gapfill"](spark, str(tmp_path)).toPandas()
    cells = {(r.event_type, r.day): r.n_events for r in got.itertuples()}
    # 2 types x 4 spine days, silent days present as explicit zeros
    assert len(cells) == 8
    assert cells[("click", "2024-01-02")] == 0
    assert cells[("click", "2024-01-03")] == 0
    assert cells[("view", "2024-01-01")] == 0
    assert cells[("click", "2024-01-01")] == 1
    assert cells[("view", "2024-01-02")] == 1


def test_trailing_range_matches_imperative_replay(spark):
    got = qstats.Q["win_trailing_range"](spark, SF).toPandas()
    e = t(spark, SF, "events").toPandas()
    e["day_num"] = (e["ts"].dt.normalize() - __import__("pandas").Timestamp("2024-01-01")).dt.days
    daily = (
        e.groupby(["event_type", "day_num"])["value"]
        .agg(n="count", v="sum")
        .reset_index()
    )
    daily["v"] = daily["v"].round(6)
    cells = {
        (r.event_type, r.day_num): (r.n, r.v) for r in daily.itertuples()
    }
    for r in got.itertuples():
        win = [
            cells[(r.event_type, k)]
            for k in range(r.day_num - 6, r.day_num + 1)
            if (r.event_type, k) in cells
        ]
        assert r.n_events == cells[(r.event_type, r.day_num)][0]
        assert r.trail_events == sum(w[0] for w in win)
        assert math.isclose(
            r.trail_value, round(sum(w[1] for w in win), 6), abs_tol=1e-5
        )
    # RANGE (not ROWS): the first day of each type has no predecessors
    first = got.sort_values("day_num").groupby("event_type").first()
    assert (first["trail_events"] == first["n_events"]).all()


def test_outliers_are_sound_zscores(spark):
    e = t(spark, SF, "events").toPandas()
    stats = e.groupby("event_type")["value"].agg(["mean", "std"])
    got = qstats.Q["events_outliers"](spark, SF).toPandas()
    assert len(got) > 0
    for r in got.itertuples():
        mu, sd = stats.loc[r.event_type]
        z = round((e.set_index("event_id").loc[r.event_id, "value"] - mu) / sd, 6)
        assert math.isclose(r.z, z, abs_tol=1e-6)
        assert abs(r.z) > 2.5
    # completeness: no qualifying event is missing
    e["z"] = e.apply(
        lambda r: round(
            (r["value"] - stats.loc[r.event_type, "mean"])
            / stats.loc[r.event_type, "std"],
            6,
        ),
        axis=1,
    )
    assert set(got["event_id"]) == set(e.loc[e["z"].abs() > 2.5, "event_id"])


def test_transitions_conserve_event_count(spark):
    got = qstats.Q["events_transitions"](spark, SF).toPandas()
    e = t(spark, SF, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    # each user's sequence of length L contributes exactly L-1 transitions
    assert int(got["n"].sum()) == n_events - n_users
    types = {r.event_type for r in e.select("event_type").distinct().collect()}
    assert set(got["from_type"]) <= types and set(got["to_type"]) <= types


def test_fuzzy_join_recovers_every_mutated_name(spark):
    got = qstats.Q["join_fuzzy"](spark, SF).toPandas()
    names = [r.n_name for r in t(spark, SF, "nation").collect()]
    assert len(got) == len(set(names))
    by_q = {r.qname: (r.matched, r.dist) for r in got.itertuples()}
    for name in names:
        qname = name[:2] + name[3:]
        matched, dist = by_q[qname]
        assert matched == name, (qname, matched)
        assert dist == 1


def test_cogrouped_matches_imperative_replay(spark):
    got = {
        r.user_id: (r.n_clicks_before, r.has_purchase)
        for r in qstats.Q["udf_cogrouped"](spark, SF).collect()
    }
    e = t(spark, SF, "events").toPandas()
    clicks = e[e.event_type == "click"]
    purch = e[e.event_type == "purchase"]
    expect = {}
    for uid in set(clicks.user_id) | set(purch.user_id):
        p = purch[purch.user_id == uid]
        c = clicks[clicks.user_id == uid]
        if len(p):
            expect[uid] = (int((c.ts < p.ts.min()).sum()), True)
        else:
            expect[uid] = (0, False)
    assert got == expect


def test_histogram_buckets_partition_the_value_space(spark):
    got = qstats.Q["agg_histogram"](spark, SF).toPandas()
    o = t(spark, SF, "orders")
    assert int(got["n_orders"].sum()) == o.count()
    w = qstats._HIST_W
    for r in got.itertuples():
        assert r.bucket * w <= r.min_price <= r.max_price < (r.bucket + 1) * w


def test_stat_corr_matches_numpy(spark):
    import numpy as np

    got = qstats.Q["stat_corr"](spark, SF).toPandas().set_index("l_returnflag")
    li = t(spark, SF, "lineitem").toPandas()
    for flag, grp in li.groupby("l_returnflag"):
        row = got.loc[flag]
        assert row["n"] == len(grp)
        c = np.corrcoef(grp["l_quantity"], grp["l_extendedprice"])[0, 1]
        assert math.isclose(row["corr_qty_price"], round(c, 6), abs_tol=2e-6)
        sd = grp["l_discount"].std(ddof=1)
        assert math.isclose(row["sd_disc"], round(sd, 6), abs_tol=2e-6)


def test_win_rank_fns_match_per_user_replay(spark):
    got = qstats.Q["win_rank_fns"](spark, SF).toPandas()
    e = t(spark, SF, "events").toPandas().sort_values(["user_id", "ts", "event_id"])
    by_ev = got.set_index("event_id")
    for uid, grp in e.groupby("user_id"):
        n = len(grp)
        for i, eid in enumerate(grp["event_id"]):
            row = by_ev.loc[eid]
            pr = 0.0 if n == 1 else i / (n - 1)
            cd = (i + 1) / n
            assert math.isclose(row["pr"], round(pr, 6), abs_tol=1e-6)
            assert math.isclose(row["cd"], round(cd, 6), abs_tol=1e-6)
            # ntile(4): first (n % 4) tiles get the extra rows
            base, extra = divmod(n, 4)
            bounds, acc = [], 0
            for q_ in range(4):
                acc += base + (1 if q_ < extra else 0)
                bounds.append(acc)
            tile = next(j + 1 for j, b in enumerate(bounds) if i < b)
            assert row["quartile"] == tile, (uid, eid)


def test_source_lang_stats_entropy_and_mode(spark):
    got = qstats.Q["source_lang_stats"](spark, SF).toPandas().set_index("source")
    d = t(spark, SF, "documents").toPandas()
    for src, grp in d.groupby("source"):
        row = got.loc[src]
        counts = grp.groupby("lang").size().sort_index()
        assert row["n_docs"] == len(grp)
        assert row["n_langs"] == len(counts)
        # mode: max count, lexicographic tiebreak
        best = counts[counts == counts.max()].index.min()
        assert row["top_lang"] == best
        p = counts / counts.sum()
        h = float(-(p * p.map(math.log)).sum())
        assert math.isclose(row["lang_entropy"], round(h, 6), abs_tol=1e-5)
        assert row["lang_entropy"] >= 0
