"""Wave-90 invariants: the pandas-API face equals the DataFrame-API
aggregate; PACF matches an integer-mean replay (including the AR(1)
reading of phi22); the wholetext roundtrip is byte-exact with no
trailing separator."""

from __future__ import annotations

import hashlib
import math
import tempfile

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qio, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_ps_api_matches_dataframe_api(spark):
    got = {
        r["status"]: (r["n"], r["total_cents"])
        for r in qsql.Q["ps_api_groupby"](spark, SF).collect()
    }
    exp = {
        r["o_orderstatus"]: (r["n"], r["c"])
        for r in t(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("c"),
        )
        .collect()
    }
    assert got == exp


def test_pacf_matches_integer_mean_replay(spark):
    daily: dict[int, int] = {}
    for r in (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select("ts", "value")
        .collect()
    ):
        d = r["ts"].date().toordinal()
        daily[d] = daily.get(d, 0) + _rnd_away(r["value"] * 100)
    xs = [daily[d] // 100 for d in sorted(daily)]
    n = len(xs)
    s = sum(xs)
    mu = s // n if s >= 0 else -((-s) // n)
    e = [x - mu for x in xs]
    den = sum(v * v for v in e)
    num1 = sum(a * b for a, b in zip(e, e[1:]))
    num2 = sum(a * b for a, b in zip(e, e[2:]))
    rho1, rho2 = num1 / den, num2 / den
    phi22 = (rho2 - rho1 * rho1) / (1.0 - rho1 * rho1)
    got = qadv.Q["stat_pacf"](spark, SF).collect()[0]
    assert got["n"] == n
    assert (got["den"], got["num1"], got["num2"]) == (den, num1, num2)
    assert abs(got["rho1"] - round(rho1, 6)) < 1e-9
    assert abs(got["rho2"] - round(rho2, 6)) < 1e-9
    assert abs(got["phi22"] - round(phi22, 6)) < 1e-9


def test_wholetext_roundtrip_is_byte_exact(spark):
    base = spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    root = tempfile.mkdtemp(prefix="wt_test_", dir=base)
    docs = (
        t(spark, SF, "documents")
        .filter("doc_id % 101 = 0 AND text IS NOT NULL")
        .select("text", "doc_id")
    )
    docs.write.mode("overwrite").partitionBy("doc_id").text(root + "/d")
    back = {
        r["doc_id"]: r["value"]
        for r in spark.read.schema("value string, doc_id bigint")
        .option("wholetext", "true")
        .text(root + "/d")
        .collect()
    }
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert back == orig  # byte-exact, no trailing separator
    # and the face's digest equals a hashlib replay of the originals
    digest = sum(
        int(hashlib.md5(f"{k}:{v}".encode()).hexdigest()[:7], 16)
        for k, v in orig.items()
    )
    row = qio.Q["scan_wholetext"](spark, SF).collect()[0]
    assert row["n_docs"] == len(orig)
    assert row["digest"] == digest
