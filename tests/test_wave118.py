"""Wave-118 invariants: the partitioned UDTF sees each partition's
rows in (us, event_id) order — its first/last ids and max gap equal
the ordered replay — and emits exactly one row per partition from
terminate(); WAP publishes iff the audit passes, and a poisoned
batch is provably held back (negative total -> audit fails, serving
path untouched)."""

from __future__ import annotations

import os
import tempfile
from collections import defaultdict

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qdata, qlake
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_udtf_partitioned_ordered_replay(spark):
    per = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is not None:
            us = int(r["ts"].timestamp() * 1_000_000)
            per[r["event_type"]].append((us, r["event_id"]))
    expect = {}
    for et, rows in per.items():
        rows.sort()
        gaps = [
            b[0] - a[0] for a, b in zip(rows, rows[1:])
        ]
        expect[et] = (
            len(rows),
            rows[0][1],
            rows[-1][1],
            max(gaps) if gaps else None,
        )
    got = {
        r["event_type"]: (
            r["n"], r["first_id"], r["last_id"], r["max_gap_us"],
        )
        for r in qdata.Q["udtf_partitioned"](spark, SF).collect()
    }
    assert got == expect and len(got) == len(per)


def test_wap_holds_back_poisoned_batch(spark):
    rows = qlake.Q["lake_wap"](spark, SF).collect()
    assert rows and all(
        r["audit_passed"] and r["published"] for r in rows
    )
    # poisoned batch: stage it, run the same audit, prove no publish
    src = (
        t(spark, SF, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 97 == 0, -1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
    )
    with tempfile.TemporaryDirectory(prefix="wap_poison_") as tmp:
        staging = os.path.join(tmp, "staging", "batch_X")
        serving = os.path.join(tmp, "serving", "batch_X")
        os.makedirs(os.path.dirname(serving), exist_ok=True)
        src.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        bad = staged.filter(F.col("o_totalprice") < 0).count()
        assert bad > 0
        # audit fails -> the WAP contract: serving path never appears
        assert not os.path.exists(serving)
        assert os.path.exists(staging), "staging kept for forensics"
