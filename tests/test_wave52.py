"""Wave-52 invariants: harmonic centrality against a BFS replay,
Jarque-Bera against a moment replay (including the per-power
quantization scales), corrupt-file tolerance proven non-vacuous (the
unpoisoned read must FAIL), and the bucketed join against the plain
spelling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qlake, qml, qpipe
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_harmonic_matches_bfs_replay(spark):
    edges = {
        (r["src"], r["dst"])
        for r in qpipe._undirected_edges(spark, SF).collect()
    }
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    want = {}
    for u, nbrs in adj.items():
        two = set()
        for v in nbrs:
            two |= adj.get(v, set())
        two -= nbrs | {u}
        want[u] = 2 * len(nbrs) + len(two)
    got = {
        r["uri"]: r["h2x"] for r in qpipe.Q["kg_harmonic"](spark, SF).collect()
    }
    assert got == want


def test_jarque_bera_matches_moment_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select(
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
            ).alias("us"),
            "value",
        )
        .collect()
    )
    per_day: dict[int, int] = {}
    for r in rows:
        day = r["us"] // 86400000000
        per_day[day] = per_day.get(day, 0) + _rnd_away(r["value"] * 100)
    hs = [c // 10000 for c in per_day.values()]  # positive cents: DIV==//
    n, s1 = len(hs), sum(hs)
    s2q = sum(_rnd_away(1e6 * (h - s1 / n) ** 2) for h in hs)
    s3q = sum(_rnd_away(1e3 * (h - s1 / n) ** 3) for h in hs)
    s4q = sum(_rnd_away((h - s1 / n) ** 4) for h in hs)
    m2 = s2q / 1e6 / n
    skew = (s3q / 1e3 / n) / m2**1.5
    exk = (s4q / n) / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew**2 + exk**2 / 4.0)
    got = qml.Q["stat_jarque_bera"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert abs(got["skewness"] - round(skew, 6)) < 1e-9
    assert abs(got["ex_kurtosis"] - round(exk, 6)) < 1e-9
    assert abs(got["jb"] - round(jb, 6)) < 1e-9


def test_ignore_corrupt_is_not_vacuous(spark, tmp_path):
    """The poison must actually poison: the same directory read
    WITHOUT ignoreCorruptFiles fails, so the face's green gate proves
    the option (not luck) saved the scan."""
    d = str(tmp_path / "poisoned")
    t(spark, SF, "documents").select("doc_id", "lang").write.parquet(d)
    with open(f"{d}/part-99999-garbage.parquet", "wb") as fh:
        fh.write(b"PAR1 this is not a parquet file" * 8)
    strict = spark.read.schema("doc_id long, lang string").parquet(d)
    try:
        strict.count()
        raise AssertionError("expected the poisoned strict read to fail")
    except Exception as ex:  # noqa: BLE001 — py4j wraps the Spark error
        assert "AssertionError" not in str(type(ex).__name__)
    tolerant = (
        spark.read.option("ignoreCorruptFiles", "true")
        .schema("doc_id long, lang string")
        .parquet(d)
    )
    assert tolerant.count() == t(spark, SF, "documents").count()


def test_bucketed_join_matches_plain_join(spark):
    got = {
        r["c_mktsegment"]: (r["n_cust"], r["n_orders"], r["total_cents"])
        for r in qlake.Q["join_bucketed"](spark, SF).collect()
    }
    cust = t(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    per = (
        t(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    plain = (
        cust.join(per, per["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("n_orders").alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
    )
    want = {
        r["c_mktsegment"]: (r["n_cust"], r["n_orders"], r["total_cents"])
        for r in plain.collect()
    }
    assert got == want
