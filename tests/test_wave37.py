"""Wave-37 invariants: LOCF carry semantics on the date spine, the
GROUPED_AGG pandas UDF vs built-in aggregates, and observe() metrics
vs a direct aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qdata, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_locf_carries_and_leading_gaps_stay_null(spark):
    rows = qstats.Q["events_locf"](spark, SF).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    n_days = len({r["day"] for r in rows})
    for et, series in by_type.items():
        series.sort(key=lambda r: r["day"])
        assert len(series) == n_days  # full spine per type
        carried = None
        for r in series:
            if r["observed"] is not None:
                assert r["filled"] == r["observed"]
                carried = r["observed"]
            else:
                # gap: carry the previous level; before any
                # observation the fill must stay NULL
                assert r["filled"] == carried

def test_locf_fills_a_real_gap(spark, tmp_path):
    """The sf0.001 fixture is dense (no gaps), so carry semantics and
    leading-NULL behavior are proven on a synthetic series: type A
    observes days 1 and 4 (gap 2-3 carries day 1's level), type B
    starts at day 3 (days 1-2 must stay NULL)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 12), 1, "A", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 4, 12), 1, "A", 40.0, "{}"),
        (3, dt.datetime(2024, 1, 3, 12), 2, "B", 7.0, "{}"),
        (4, dt.datetime(2024, 1, 4, 12), 2, "B", None, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        (r["event_type"], r["day"]): (r["observed"], r["filled"])
        for r in qstats.Q["events_locf"](spark, str(tmp_path)).collect()
    }
    assert got[("A", "2024-01-01")] == (10.0, 10.0)
    assert got[("A", "2024-01-02")] == (None, 10.0)  # gap carries
    assert got[("A", "2024-01-03")] == (None, 10.0)
    assert got[("A", "2024-01-04")] == (40.0, 40.0)
    assert got[("B", "2024-01-01")] == (None, None)  # leading: nothing
    assert got[("B", "2024-01-02")] == (None, None)  # to carry yet
    assert got[("B", "2024-01-03")] == (7.0, 7.0)
    # a NULL-value reading does not advance the level
    assert got[("B", "2024-01-04")] == (None, 7.0)


def test_grouped_agg_udf_matches_builtin(spark):
    got = {r["lang"]: r for r in qdata.Q["udf_grouped_agg"](spark, SF).collect()}
    want = {
        r["lang"]: r
        for r in t(spark, SF, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            (F.round(F.max("n_chars") / F.sum("n_chars"), 6) + F.lit(0.0)).alias(
                "max_share"
            ),
        )
        .collect()
    }
    assert set(got) == set(want)
    for lang in want:
        assert got[lang]["n_docs"] == want[lang]["n_docs"]
        assert got[lang]["sum_chars"] == want[lang]["sum_chars"]
        assert got[lang]["max_share"] == want[lang]["max_share"]


def test_observe_equals_direct_aggregation(spark):
    row = qdata.Q["scan_observe"](spark, SF).collect()[0]
    d = t(spark, SF, "documents")
    assert row["n_rows"] == d.count()
    assert row["sum_chars"] == d.agg(F.sum("n_chars")).collect()[0][0]
    assert row["n_null_text"] == d.filter(F.col("text").isNull()).count()
