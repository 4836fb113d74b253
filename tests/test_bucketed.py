"""SURVEY.md §4.3 physical layout: store tables bucketed+sorted on
their join key (catalog.save_bucketed) so the sort-merge-bucket
fallback join — for stores beyond the broadcast budget — shuffles
ONLY the probe (mentions) side: the bucketed store scan contributes
no Exchange and no Sort."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.operators import scoring
from dbpedia_spotlight_db_spark.sources import catalog


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_smb_fallback_shuffles_probe_side_only(spark, stores, tmp_path):
    root = str(tmp_path)
    catalog.save_bucketed(
        stores["candidate_map"], "cm_bucketed", root, "sf_id", n_buckets=8
    )
    catalog.save_bucketed(
        stores["entities"], "ent_bucketed", root, "entity_id", n_buckets=8
    )
    cm = spark.table("cm_bucketed")
    ent = spark.table("ent_bucketed")
    # probe side: one fabricated mention per known surface form —
    # materialized to a local relation so the plan under test contains
    # only the join (not the cached store-build lineage)
    mentions = spark.createDataFrame(
        stores["surface_forms"]
        .select("sf_id", F.xxhash64("surface_form").alias("mention_id"))
        .collect()
    )

    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        smb = scoring.attach_candidates(mentions, cm, ent, broadcast=False)
        p = _plan(smb)
        # both joins are sort-merge; each bucketed scan reports its
        # bucket layout and contributes no Exchange of its own
        assert "SortMergeJoin" in p
        assert p.count("Bucketed: true") >= 2, p
        # count physical nodes via their "(n) Exchange" detail headers
        # (the tree rendering repeats each node name)
        n_exchange = len(re.findall(r"\(\d+\) Exchange\b", p))
        # probe side shuffles into the bucket layout; the two store
        # scans do not (3 inputs, at most 2 exchanges total — and the
        # second join's left side reuses the first join's clustering)
        assert n_exchange <= 2, p
        got = {
            (r.mention_id, r.entity_id, r.pair_count)
            for r in smb.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    want = {
        (r.mention_id, r.entity_id, r.pair_count)
        for r in scoring.attach_candidates(
            mentions, stores["candidate_map"], stores["entities"]
        ).collect()
    }
    assert got == want and got


def test_build_stores_job_writes_bucketed_warehouse(
    spark, wiki_df, tmp_path
):
    """The production stores job writes every table through
    save_bucketed on its join key (not plain save): the manifest
    sidecars carry the bucket layout, and a broadcast-disabled probe
    join against the written candidate_map has no store-side
    Exchange/Sort."""
    from jobs.build_stores import STORE_BUCKET_KEYS, main

    corpus_p = str(tmp_path / "corpus")
    out = str(tmp_path / "warehouse")
    wiki_df.write.parquet(corpus_p)
    main(["--corpus", corpus_p, "--out", out, "--n-buckets", "4"])

    for name, key in STORE_BUCKET_KEYS.items():
        m = catalog.manifest(out, name)
        assert m["bucket_key"] == key and m["n_buckets"] == 4
        assert m["rows"] > 0
        assert spark.table(name).count() == m["rows"]

    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = spark.range(50).select(F.col("id").alias("sf_id"))
        p = _plan(probe.join(spark.table("candidate_map"), "sf_id"))
        assert "Bucketed: true" in p
        # exactly the probe-side exchange; the bucketed scan adds none
        assert len(re.findall(r"\(\d+\) Exchange\b", p)) <= 1, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
