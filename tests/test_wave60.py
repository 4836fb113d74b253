"""Wave-60 invariants: the catalog lifecycle must surface ANALYZE
stats to the optimizer, CACHE TABLE must serve from an
InMemoryRelation, codec writes must put the declared codec in the
parquet footers and round-trip losslessly, and the Fisher ratio must
replay from quantized moments."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qembed, qio, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_catalog_table_matches_and_surfaces_stats(spark):
    got = {
        r["o_orderstatus"]: (r["n"], r["cents"])
        for r in qsql.Q["sql_catalog_table"](spark, SF).collect()
    }
    want = {
        r["o_orderstatus"]: (r["n"], r["cents"])
        for r in t(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .collect()
    }
    assert got == want
    # ANALYZE must feed the CBO real stats on a managed table
    spark.sql("DROP TABLE IF EXISTS w60_stats_probe")
    spark.sql("CREATE TABLE w60_stats_probe (a BIGINT) USING PARQUET")
    spark.sql("INSERT INTO w60_stats_probe VALUES (1), (2), (3)")
    spark.sql("ANALYZE TABLE w60_stats_probe COMPUTE STATISTICS")
    desc = "\n".join(
        str(r) for r in spark.sql("DESC EXTENDED w60_stats_probe").collect()
    )
    assert "Statistics" in desc and "3 rows" in desc
    spark.sql("DROP TABLE w60_stats_probe")


def test_cached_view_matches_and_uses_inmemory_relation(spark):
    got = {
        r["event_type"]: (r["n"], r["cents"], r["min_cents"], r["max_cents"])
        for r in qsql.Q["sql_cached_view"](spark, SF).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["cents"], r["mn"], r["mx"])
        for r in t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("cents"),
            F.min("c").alias("mn"),
            F.max("c").alias("mx"),
        )
        .collect()
    }
    assert got == want
    # the caching mechanism itself: a cached view plans as InMemoryRelation
    t(spark, SF, "events").limit(10).createOrReplaceTempView("w60_cache")
    spark.sql("CACHE TABLE w60_cache")
    try:
        plan = (
            spark.sql("SELECT COUNT(*) FROM w60_cache")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "InMemoryRelation" in plan
    finally:
        spark.sql("UNCACHE TABLE IF EXISTS w60_cache")


def test_codec_writes_declare_codec_in_footers(spark, tmp_path):
    import pyarrow.parquet as pq

    got = {
        r["codec"]: (r["n_docs"], r["id_sum"], r["sum_chars"])
        for r in qio.Q["parquet_codecs"](spark, SF).collect()
    }
    base = (
        t(spark, SF, "documents")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("ids"),
            F.sum("n_chars").alias("chars"),
        )
        .collect()[0]
    )
    want = (base["n"], base["ids"], base["chars"])
    assert got == {"gzip": want, "zstd": want}
    for codec, pa_name in (("gzip", "GZIP"), ("zstd", "ZSTD")):
        d = str(tmp_path / codec)
        t(spark, SF, "documents").coalesce(1).write.option(
            "compression", codec
        ).parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        md = pq.ParquetFile(os.path.join(d, part)).metadata
        assert md.row_group(0).column(0).compression == pa_name


def test_fisher_matches_moment_replay(spark):
    rows = (
        t(spark, SF, "embeddings")
        .filter("embedding IS NOT NULL AND label IS NOT NULL")
        .select("label", "embedding")
        .collect()
    )
    cells: dict[tuple, list] = {}
    for r in rows:
        for dim, v in enumerate(r["embedding"]):
            q = _rnd_away(1000.0 * float(v))
            c = cells.setdefault((r["label"], dim), [0, 0, 0])
            c[0] += 1
            c[1] += q
            c[2] += q * q
    dims: dict[int, list] = {}
    for (lbl, dim), (n, s1, s2) in cells.items():
        dims.setdefault(dim, []).append((n, s1, s2))
    want = {}
    for dim, cs in dims.items():
        k = len(cs)
        nn = sum(n for n, _, _ in cs)
        t1 = sum(s1 for _, s1, _ in cs)
        sb = sum(_rnd_away(s1 * 1.0 * s1 / n) for n, s1, _ in cs)
        sw = sum(
            _rnd_away(s2 - s1 * 1.0 * s1 / n) for n, s1, s2 in cs
        )
        if k < 2 or nn <= k or sw <= 0:
            want[dim] = (k, None)
        else:
            fr = ((sb - t1 * 1.0 * t1 / nn) / (k - 1.0)) / (
                sw * 1.0 / (nn - k)
            )
            want[dim] = (k, round(fr, 6))
    got = {
        r["dim_idx"]: (r["n_labels"], r["f_ratio"])
        for r in qembed.Q["embed_fisher"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for dim, (k, fr) in want.items():
        g = got[dim]
        assert g[0] == k
        if fr is None:
            assert g[1] is None
        else:
            assert abs(g[1] - fr) < 1e-9
