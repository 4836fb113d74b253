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
