"""S3/S5 source-sink coverage: NT triple ingestion and the catalog
seam (partitioned-Parquet fallback with manifest sidecar)."""

from __future__ import annotations

import json
import os

from dbpedia_spotlight_db_spark.sources import catalog


def test_read_nt_triples(spark, tmp_path):
    nt = tmp_path / "redirects.nt"
    nt.write_text(
        "<http://dbpedia.org/resource/A> "
        "<http://dbpedia.org/ontology/wikiPageRedirects> "
        "<http://dbpedia.org/resource/B> .\n"
        "<http://dbpedia.org/resource/C> "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://dbpedia.org/ontology/Person> .\n"
        "# a comment line that must be dropped\n"
        "malformed line without angle brackets\n"
    )
    df = catalog.read_nt_triples(spark, str(nt))
    rows = {(r.subj, r.pred, r.obj) for r in df.collect()}
    assert rows == {
        (
            "http://dbpedia.org/resource/A",
            "http://dbpedia.org/ontology/wikiPageRedirects",
            "http://dbpedia.org/resource/B",
        ),
        (
            "http://dbpedia.org/resource/C",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://dbpedia.org/ontology/Person",
        ),
    }


def test_catalog_roundtrip_with_manifest(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "en"), (2, "fr"), (3, "en")], ["id", "lang"]
    )
    root = str(tmp_path)
    catalog.save(df, "t1", root, partition_by=["lang"])
    back = catalog.load(spark, "t1", root)
    assert back.count() == 3
    assert {r.lang for r in back.select("lang").distinct().collect()} == {"en", "fr"}
    manifest = json.load(open(os.path.join(root, "t1.manifest.json")))
    assert manifest["rows"] == 3 and manifest["partition_by"] == ["lang"]
    # idempotent overwrite (lineage requirement: never append)
    catalog.save(df, "t1", root, partition_by=["lang"])
    assert catalog.load(spark, "t1", root).count() == 3


def test_iceberg_ddl_shape():
    """The catalog seam's production DDL: identity + bucket
    partitioning over the declared schema (no Iceberg jars locally —
    SURVEY.md §0 — so the statement itself is the contract)."""
    from dbpedia_spotlight_db_spark import schemas
    from dbpedia_spotlight_db_spark.sources.catalog import iceberg_ddl

    ddl = iceberg_ddl(
        "pages", schemas.PAGES, partition_by=["lang"],
        bucket_key="url", n_buckets=32,
    )
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS spark_catalog.`pages` (")
    assert "`url` string" in ddl and "`html` binary" in ddl
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (`lang`, bucket(32, `url`))" in ddl
    assert "'format-version' = '2'" in ddl

    plain = iceberg_ddl("triples", schemas.TRIPLES)
    assert "PARTITIONED BY" not in plain
