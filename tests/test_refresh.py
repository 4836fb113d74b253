"""Incremental KG refresh (jobs/refresh.py): the merged snapshot must
equal a from-scratch annotate of the corpus' current state — stale
triples for re-crawled urls replaced wholesale, tombstoned urls gone,
untouched urls carried over byte-identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.entrypoint import (
    annotate_to_triples,
    documents_as_pages,
    world_model_bc,
    world_stores,
)
from dbpedia_spotlight_db_spark.sources import catalog
from jobs.refresh import main, merge_triples

SF = "/root/testdata/sf0.001"


def _same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_refresh_end_to_end(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stores = world_stores(spark, docs)
    model_bc = world_model_bc(spark, stores)
    pages = documents_as_pages(docs)
    delta_pred = "CAST(substr(url, 7) AS BIGINT) % 7 = 0"
    old_pages = pages.filter(f"NOT ({delta_pred})")

    # base snapshot = annotate of the pre-refresh corpus, PLUS planted
    # stale rows for two delta urls (the refresh must erase them even
    # though today's annotate would never emit them)
    base = annotate_to_triples(spark, old_pages, stores, model_bc=model_bc)
    stale = spark.createDataFrame(
        [("doc://0", "stale_pred", "stale_obj"),
         ("doc://7", "stale_pred", "stale_obj")],
        ["subj", "pred", "obj"],
    )
    base_root = str(tmp_path / "base")
    catalog.save(base.unionByName(stale), "triples", base_root)

    # two non-delta urls disappear from the web
    gone = old_pages.select("url").limit(2)
    gone_path = str(tmp_path / "gone.parquet")
    gone.write.parquet(gone_path)
    gone_urls = {r["url"] for r in gone.collect()}

    out_root = str(tmp_path / "refreshed")
    main([
        "--base", base_root,
        "--pages", f"world:{SF}",
        "--stores", f"world:{SF}",
        "--out", out_root,
        "--gone-urls", gone_path,
        "--delta-filter", delta_pred,
    ])

    got = catalog.load(spark, "triples", out_root)
    # stale rows erased, tombstoned urls gone
    assert got.filter(F.col("pred") == "stale_pred").count() == 0
    assert got.filter(F.col("subj").isin(*gone_urls)).count() == 0
    # merged snapshot == from-scratch annotate of the current corpus
    expected = annotate_to_triples(
        spark,
        pages.filter(~F.col("url").isin(*gone_urls)),
        stores,
        model_bc=model_bc,
    )
    _same(got, expected)
    # manifest row count matches the data
    assert catalog.manifest(out_root, "triples")["rows"] == got.count()


def test_merge_triples_is_unhinted(spark):
    """The per-subject anti-join must leave the broadcast decision to
    AQE — the base is corpus-sized and the delta key set is only
    usually small (same discipline as dedup_survivors)."""
    base = spark.createDataFrame(
        [("u1", "dbo:mentions", "o"), ("u2", "dbo:mentions", "o")],
        ["subj", "pred", "obj"],
    )
    fresh = spark.createDataFrame(
        [("u2", "dbo:mentions", "o2")], ["subj", "pred", "obj"]
    )
    merged = merge_triples(base, fresh, fresh.select("subj"))
    logical = merged._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical
    rows = {(r["subj"], r["obj"]) for r in merged.collect()}
    assert rows == {("u1", "o"), ("u2", "o2")}
