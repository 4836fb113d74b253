"""Wave-92 invariants: Complete mode's final emission equals batch
even when the drain takes multiple micro-batches; parse_url agrees
with urllib; xpath's sum() agrees with the direct arithmetic."""

from __future__ import annotations

import math
import os
import tempfile
from urllib.parse import urlsplit

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qio, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_complete_mode_multibatch_equals_batch(spark):
    # split the source into two files so the drain takes two
    # micro-batches; Complete mode's LAST emission must still equal
    # the batch aggregate (earlier emissions are partial tables)
    ev = t(spark, SF, "events").filter("value IS NOT NULL")
    with tempfile.TemporaryDirectory(prefix="complete_mb_") as tmp:
        src = os.path.join(tmp, "in")
        ev.filter("event_id % 2 = 0").write.parquet(os.path.join(src, "a"))
        ev.filter("event_id % 2 = 1").write.parquet(os.path.join(src, "b"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
            .select(
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias("c"),
            )
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("cents"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("complete_mb")
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert q.lastProgress["batchId"] >= 1  # really multi-batch
        got = {
            r["event_type"]: (r["n"], r["cents"])
            for r in spark.table("complete_mb").collect()
        }
    exp = {
        r["event_type"]: (r["n"], r["cents"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .collect()
    }
    assert got == exp


def test_url_parse_matches_urllib(spark):
    rows = qcorpus.Q["url_parse_fns"](spark, SF).collect()
    agg: dict[str, list] = {}
    for r in t(spark, SF, "documents").select("doc_id").collect():
        d = r["doc_id"]
        url = (
            f"https://h{d % 53}.example.com/p/{d % 7}/page"
            f"?k={d % 10}&x=1#s{d % 3}"
        )
        sp = urlsplit(url)
        a = agg.setdefault(sp.netloc, [0, set(), 0, set()])
        a[0] += 1
        a[1].add(sp.path)
        a[2] += d % 10
        a[3].add(sp.fragment)
    got = {r["host"]: r for r in rows}
    assert set(got) == set(agg)
    for host, (n, paths, ksum, frags) in agg.items():
        r = got[host]
        assert (r["n"], r["n_paths"], r["k_sum"], r["n_frags"]) == (
            n,
            len(paths),
            ksum,
            len(frags),
        )


def test_xpath_sum_matches_arithmetic(spark):
    got = {r["status"]: r for r in qio.Q["xml_xpath"](spark, SF).collect()}
    exp: dict[str, list[int]] = {}
    for r in (
        t(spark, SF, "orders")
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
        .collect()
    ):
        a = exp.setdefault(r["o_orderstatus"], [0, 0, 0])
        a[0] += 1
        a[1] += _rnd_away(r["o_totalprice"] * 100)
        a[2] += r["o_orderkey"] % 5 + r["o_orderkey"] % 3
    assert {k: (v["n"], v["cents_sum"], v["qty_sum"]) for k, v in got.items()} == {
        k: tuple(v) for k, v in exp.items()
    }
