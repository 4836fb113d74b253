"""Catalog seam (SURVEY.md §7.1).

Production target is Iceberg (north_rule: "Iceberg tables of
Common-Crawl-style web pages"); the sandbox has no Iceberg jars and no
network, so the seam writes partitioned Parquet plus a JSON manifest
sidecar carrying the metrics Iceberg snapshots would carry. Nothing
outside this module may hard-code a format.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:
        return False


def load(spark: SparkSession, name: str, root: str) -> DataFrame:
    """Read table ``name`` from ``root`` (Iceberg identifier if a
    catalog is configured, else ``{root}/{name}.parquet`` or directory)."""
    p = os.path.join(root, f"{name}.parquet")
    if not os.path.exists(p):
        p = os.path.join(root, name)
    return spark.read.parquet(p)


def save(
    df: DataFrame,
    name: str,
    root: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write a table through the seam. Parquet fallback writes a JSON
    manifest with row count + partition layout (the lineage/metrics
    tables in plans/lineage.py reference it)."""
    path = os.path.join(root, name)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    spark = df.sparkSession
    n = spark.read.parquet(path).count()
    _write_manifest(root, name, rows=n, partition_by=partition_by or [])
    return path


def _write_manifest(root: str, name: str, **fields) -> None:
    manifest = {
        "table": name,
        "written_at": time.time(),
        "format": "parquet-fallback(iceberg-seam)",
        **fields,
    }
    with open(os.path.join(root, f"{name}.manifest.json"), "w") as f:
        json.dump(manifest, f)


def manifest(root: str, name: str) -> dict:
    """Read back the manifest sidecar ``save`` wrote for ``name`` —
    the local stand-in for an Iceberg snapshot summary. Jobs read row
    counts from here instead of re-counting tables they just wrote."""
    with open(os.path.join(root, f"{name}.manifest.json")) as f:
        return json.load(f)


def iceberg_ddl(
    name: str,
    schema,
    partition_by: list[str] | None = None,
    bucket_key: str | None = None,
    n_buckets: int = 16,
    catalog: str = "spark_catalog",
) -> str:
    """The production DDL this seam targets (SURVEY.md §4.3): an
    Iceberg table with identity partitioning on e.g. ``lang`` and
    hash-bucket partitioning on the join key, so J1/J3 bucket joins
    and partition pruning work without extra shuffles. The sandbox has
    no Iceberg jars (SURVEY.md §0), so this returns the statement for
    the deployment to execute; the parquet fallback in ``save`` /
    ``save_bucketed`` mirrors the same layout locally."""
    # backtick-quote identifiers: reserved words (`order`, `group`) or
    # odd characters in field names must still yield executable DDL
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    parts = [f"`{p}`" for p in (partition_by or [])]
    if bucket_key:
        parts.append(f"bucket({n_buckets}, `{bucket_key}`)")
    part_clause = f" PARTITIONED BY ({', '.join(parts)})" if parts else ""
    return (
        f"CREATE TABLE IF NOT EXISTS {catalog}.`{name}` ({cols}) "
        f"USING iceberg{part_clause} "
        "TBLPROPERTIES ('format-version' = '2', "
        "'write.distribution-mode' = 'hash')"
    )


def save_bucketed(
    df: DataFrame,
    name: str,
    root: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> str:
    """SURVEY.md §4.3 physical layout: store tables bucketed (and
    sorted) on their join key, so a join against them shuffles ONLY
    the probe side — the store side gets neither Exchange nor Sort.
    This is the sort-merge-bucket fallback for J1/J3 when a store
    exceeds the broadcast budget at web scale.

    Bucket metadata lives in the session catalog (saveAsTable); the
    sandbox has no Hive metastore or Iceberg jars, so the table
    registration is per-session (in-memory catalog) while the files
    persist under ``{root}/{name}`` — production swaps this for
    Iceberg bucket-partitioning through the same seam. Table name =
    ``name`` (re-registered idempotently)."""
    spark = df.sparkSession
    path = os.path.join(root, name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_key)
    )
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(name)
    _write_manifest(
        root,
        name,
        rows=spark.table(name).count(),
        bucket_key=bucket_key,
        n_buckets=n_buckets,
        sorted=sort,
    )
    return path


def read_nt_triples(spark: SparkSession, path: str) -> DataFrame:
    """S3: NT/NQ triple ingestion (redirects / disambiguations /
    instance-types files). Line-oriented `<s> <p> <o> .` parsed with
    JVM-side regex — no Python."""
    lines = spark.read.text(path)
    pat = r"^<([^>]+)>\s+<([^>]+)>\s+<?([^>\s]+)>?\s*\.?\s*$"
    return lines.select(
        F.regexp_extract("value", pat, 1).alias("subj"),
        F.regexp_extract("value", pat, 2).alias("pred"),
        F.regexp_extract("value", pat, 3).alias("obj"),
    ).filter(F.col("subj") != "")
