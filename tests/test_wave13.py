"""Invariant tests for the wave-13 faces: inter-arrival gap math on a
crafted timeline, backlog conservation (final backlog = never-shipped
orders), RFM score calibration, and the LSH histogram's conservation
plus its candidate-volume identity.
"""

from __future__ import annotations

import datetime

from dbpedia_spotlight_db_spark.queries import qdata, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_events_intervals_crafted_gaps(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, user, etype, sec):
        return (i, base + datetime.timedelta(seconds=sec), user, etype, 1.0, "{}")

    rows = [
        # user 1 clicks at 0, 10, 40 -> gaps 10, 30
        ev(1, 1, "click", 0), ev(2, 1, "click", 10), ev(3, 1, "click", 40),
        # user 2 clicks at 0, 100 -> gap 100; cross-user gaps never mix
        ev(4, 2, "click", 0), ev(5, 2, "click", 100),
        # a single view -> no gap row at all
        ev(6, 1, "view", 7),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        r.event_type: r
        for r in qstats.Q["events_intervals"](spark, str(tmp_path)).collect()
    }
    assert "view" not in got
    c = got["click"]
    assert c.n_gaps == 3
    assert c.max_gap_s == 100
    assert abs(c.mean_gap_s - (10 + 30 + 100) / 3) < 1e-6
    assert c.p50_gap_s == 30.0


def test_orders_backlog_conserves(spark):
    got = qstats.Q["orders_backlog"](spark, SF).toPandas()
    # running balance identity holds row over row
    run = 0
    for _, r in got.sort_values("day").iterrows():
        run += r["n_opened"] - r["n_completed"]
        assert r["backlog"] == run
    # final backlog == orders that never shipped a lineitem
    n_orders = t(spark, SF, "orders").count()
    n_shipped = (
        t(spark, SF, "lineitem").select("l_orderkey").distinct().count()
    )
    assert run == n_orders - n_shipped


def test_customer_rfm_scores_are_calibrated(spark):
    got = qstats.Q["customer_rfm"](spark, SF).toPandas()
    for c in ("r_score", "f_score", "m_score"):
        assert got[c].between(1, 5).all()
        # quintile cutoffs: no bucket may hold more than ~40% of
        # customers unless the metric is massively tied
        top = got[c].value_counts(normalize=True).iloc[0]
        assert top <= 0.6
    # recency is inverted: the most recent buyers score 5
    recent = got.loc[got["recency_days"] == got["recency_days"].min()]
    assert (recent["r_score"] == 5).all()
    # monotone: higher monetary never lowers m_score
    bym = got.sort_values("monetary_cents")
    assert bym["m_score"].is_monotonic_increasing


def test_lsh_bucket_stats_conservation_and_pair_volume(spark):
    from dbpedia_spotlight_db_spark.operators import dedup as dd

    got = qdata.Q["lsh_bucket_stats"](spark, SF).toPandas()
    docs = t(spark, SF, "documents")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", n_hashes=4)
    n_sigs = sigs.count()
    for band, g in got.groupby("band"):
        # every signed doc lands in exactly one bucket per band
        assert int((g["bucket_size"] * g["n_buckets"]).sum()) == n_sigs
    # candidate-volume identity: sum over bands of C(sz, 2) >= the
    # number of DISTINCT lsh pairs (bands can rediscover a pair)
    vol = int(
        (got["n_buckets"] * got["bucket_size"] * (got["bucket_size"] - 1) / 2).sum()
    )
    n_pairs = dd.lsh_pairs(sigs, n_hashes=4, bands=4).count()
    assert vol >= n_pairs
