"""Wave-96 invariants: the mono-id contract booleans are earned on a
multi-partition layout; Arrow batching really receives <=100-row
batches (and the conf restores); try_element_at matches a bounds-check
replay and actually exercises both hit and miss."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qdata, qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_mono_id_contract_on_multipartition_layout(spark):
    row = qrel.Q["mono_id_contract"](spark, SF).collect()[0]
    assert row["n"] == t(spark, SF, "events").count()
    assert row["all_distinct"] is True
    assert row["monotone_within_partition"] is True
    # the raw generator on a forced multi-partition layout still
    # honors distinctness (the property the face certifies)
    ids = (
        t(spark, SF, "events")
        .repartition(7)
        .select(F.monotonically_increasing_id().alias("mid"))
    )
    n = ids.count()
    assert ids.distinct().count() == n


def test_arrow_batching_bounds_and_restores(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key)
    row = qdata.Q["udf_arrow_batching"](spark, SF).collect()[0]
    ev = t(spark, SF, "events")
    n = ev.count()
    assert row["n"] == n
    assert row["n_batches"] == (n + qdata._ARROW_BATCH - 1) // qdata._ARROW_BATCH
    assert row["n_batches"] > 1  # the bound actually split the hop
    assert row["max_ok"] is True
    assert row["id_sum"] == ev.agg(F.sum("event_id")).collect()[0][0]
    assert spark.conf.get(key) == before


def test_try_element_at_matches_bounds_replay(spark):
    n = n_hit = hit_len = 0
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    ):
        toks = r["text"].split(" ")
        idx = 1 + r["doc_id"] % 40
        n += 1
        if idx <= len(toks):
            n_hit += 1
            hit_len += len(toks[idx - 1])
    got = qsql.Q["sql_try_element_at"](spark, SF).collect()[0]
    assert (got["n"], got["n_hit"], got["hit_len_sum"]) == (
        n,
        n_hit,
        hit_len,
    )
    assert 0 < n_hit < n  # both the hit and the NULL path exercised
