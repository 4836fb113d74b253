"""Wave-57 invariants: join_dpp must actually plan a dynamic-pruning
subquery in the fact scan's PartitionFilters (and match the inlined
predicate), scan_modified_after must select exactly the young batch,
the DP histogram noise must replay from the cell-key md5, and the
delta/varint census must replay from per-user sorted timelines."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qfeat, qio
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_dpp_plans_pruning_subquery_and_matches(spark):
    df = qio.Q["join_dpp"](spark, SF)
    plan = df._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan.lower()
    want = {
        r["oyear"]: (r["n"], r["cents"])
        for r in t(spark, SF, "orders")
        .filter(F.year("o_orderdate") % 2 == 0)
        .groupBy(F.year("o_orderdate").cast("int").alias("oyear"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .collect()
    }
    got = {r["oyear"]: (r["n"], r["cents"]) for r in df.collect()}
    assert got == want
    assert all(y % 2 == 0 for y in got)


def test_modified_after_selects_young_batch_only(spark):
    got = {
        r["lang"]: (r["n_docs"], r["id_sum"])
        for r in qio.Q["scan_modified_after"](spark, SF).collect()
    }
    assert "en" not in got
    want = {
        r["lang"]: (r["n"], r["ids"])
        for r in t(spark, SF, "documents")
        .filter("lang <> 'en'")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("ids")
        )
        .collect()
    }
    assert got == want


def test_dp_histogram_noise_replays_from_cell_md5(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    cells: dict[tuple, int] = {}
    for r in rows:
        b = min(max(_rnd_away(r["value"] * 100) // 10000, 0), 9)
        cells[(r["event_type"], b)] = cells.get((r["event_type"], b), 0) + 1
    want = {}
    for (et, b), n in cells.items():
        u = int(
            hashlib.md5(f"{et}:{b}".encode()).hexdigest()[:8], 16
        ) / 4294967296.0 - 0.5
        sgn = (u > 0) - (u < 0)
        noise = _rnd_away(
            -10.0 * sgn * math.log(max(1.0 - 2.0 * abs(u), 1e-12))
        )
        want[(et, b)] = (n, noise, max(n + noise, 0))
    got = {
        (r["event_type"], r["bucket"]): (r["n"], r["noise"], r["noisy_n"])
        for r in qfeat.Q["privacy_dp_histogram"](spark, SF).collect()
    }
    assert got == want
    # parallel composition sanity: cells partition the filtered corpus
    assert sum(v[0] for v in got.values()) == len(rows)


def test_encode_delta_matches_timeline_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND user_id IS NOT NULL")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .collect()
    )
    streams: dict[int, list] = {}
    for r in rows:
        streams.setdefault(r["user_id"], []).append((r["us"], r["event_id"]))

    def varint(zz: int) -> int:
        nb = 1
        while zz >= 1 << (7 * nb) and nb < 9:
            nb += 1
        return nb

    n = total = 0
    for evs in streams.values():
        evs.sort()
        prev = None
        for us, _ in evs:
            n += 1
            total += 9 if prev is None else varint(2 * (us - prev))
            prev = us
    got = qfeat.Q["encode_delta"](spark, SF).collect()[0]
    assert got["n_events"] == n
    assert got["raw_bytes"] == 8 * n
    assert got["delta_bytes"] == total
    assert abs(got["ratio"] - round(total / (8 * n), 6)) < 1e-9
    assert got["delta_bytes"] < got["raw_bytes"]  # deltas must pay off
