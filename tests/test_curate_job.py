"""End-to-end test for jobs/curate.py + operators/curation.py: the
spark-submit curation pipeline (compaction -> filter -> decontaminate
-> dedup -> chunks -> split) on a synthesized multi-snapshot crawl.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.operators import curation
from dbpedia_spotlight_db_spark.sources import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curate_out(spark, tmp_path_factory):
    tdir = str(tmp_path_factory.mktemp("curate"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    crawl = docs.withColumn(
        "url", (F.col("doc_id") % 40).cast("string")
    ).withColumn("warc_ts", F.col("doc_id"))
    crawl.write.mode("overwrite").parquet(f"{tdir}/crawl.parquet")
    docs.filter(F.col("doc_id") % 97 == 0).write.mode("overwrite").parquet(
        f"{tdir}/bench.parquet"
    )

    from jobs.curate import main

    main(
        [
            "--docs", f"{tdir}/crawl.parquet",
            "--out", f"{tdir}/out",
            "--key-col", "url",
            "--ts-col", "warc_ts",
            "--min-quality", "0.0",
            "--benchmark", f"{tdir}/bench.parquet",
            "--stratify", "en=0.5,*=0.0625",
        ]
    )
    return tdir


def test_compaction_keeps_latest_snapshot(spark, curate_out):
    filtered = catalog.load(spark, "filtered", f"{curate_out}/out")
    # one row per url, and it is the max-warc_ts fetch of that url
    crawl = spark.read.parquet(f"{curate_out}/crawl.parquet")
    latest = crawl.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
    assert filtered.count() == 40
    assert (
        filtered.select("url", "warc_ts").exceptAll(latest).count() == 0
    )


def test_clean_is_decontaminated_subset(spark, curate_out):
    clean = catalog.load(spark, "clean", f"{curate_out}/out")
    filtered = catalog.load(spark, "filtered", f"{curate_out}/out")
    assert clean.count() <= filtered.count()
    assert clean.join(filtered, "doc_id", "left_anti").count() == 0
    # no surviving doc shares an 8-shingle with the benchmark
    bench = spark.read.parquet(f"{curate_out}/bench.parquet")
    bench_g = curation.word_shingles(bench, "doc_id", "text", 8).select(
        "gram"
    )
    leaked = (
        curation.word_shingles(clean, "doc_id", "text", 8)
        .join(bench_g, "gram", "left_semi")
        .count()
    )
    assert leaked == 0


def test_chunks_and_manifests(spark, curate_out):
    out = f"{curate_out}/out"
    chunks = catalog.load(spark, "chunks", out)
    clean = catalog.load(spark, "clean", out)
    # chunk rows = sum over clean docs of ceil(n_tok / stride)
    want = (
        clean.select(
            F.ceil(F.size(F.split("text", " ")) / F.lit(16)).alias("k")
        )
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    assert chunks.count() == want
    for name in ("filtered", "clean", "chunks", "sampled"):
        m = catalog.manifest(out, name)
        assert m["rows"] == catalog.load(spark, name, out).count()


def test_stratified_sample_general_fractions(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # frac=1.0 keeps everything; frac=0.0 drops everything
    all_rows = curation.stratified_sample(
        docs, "lang", {"en": 1.0}, default_frac=0.0
    )
    n_en = docs.filter(F.col("lang") == "en").count()
    assert all_rows.count() == n_en
    assert all_rows.filter(F.col("lang") != "en").count() == 0
    none_rows = curation.stratified_sample(
        docs, "lang", {}, default_frac=0.0
    )
    assert none_rows.count() == 0


def test_curate_job_extended_stages(spark, tmp_path_factory):
    """Second invocation exercising the round-3 stages: duplicate-line
    removal, repetition filter, PII redaction, sequence packing."""
    tdir = str(tmp_path_factory.mktemp("curate2"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.write.mode("overwrite").parquet(f"{tdir}/docs.parquet")

    from jobs.curate import main

    main(
        [
            "--docs", f"{tdir}/docs.parquet",
            "--out", f"{tdir}/out",
            "--min-quality", "0.0",
            "--line-dedup-width", "3",
            "--max-top-bigram", "0.15",
            "--redact-pii",
            "--pack-ctx", "256",
            "--pack-shards", "8",
        ]
    )
    out = f"{tdir}/out"
    clean = catalog.load(spark, "clean", out)
    filtered = catalog.load(spark, "filtered", out)
    assert 0 < clean.count() < filtered.count()
    # repetition filter held: recompute signals on the ORIGINAL text of
    # surviving docs (line dedup may only lower repetition)
    sig = curation.repetition_signals(clean)
    assert sig.filter(F.col("top_bigram_frac") > 0.15).count() == 0
    # line dedup held: no 3-block in the clean corpus occurs >= 3 times
    blocks = curation.doc_blocks(clean, width=3)
    hot = (
        blocks.groupBy("block")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 3)
    )
    assert hot.count() == 0 or blocks.count() == 0
    # packing tiles each shard contiguously
    packed = catalog.load(spark, "packed", out)
    assert packed.count() == clean.count()
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("tok_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chk = packed.withColumn(
        "want", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    assert chk.filter(F.col("tok_start") != F.col("want")).count() == 0
    assert catalog.manifest(out, "packed")["rows"] == packed.count()
