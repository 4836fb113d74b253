"""Wave-75 invariants: bucket pruning must report SelectedBucketsCount
1-of-8 in the executed plan, the knn profile against an adjacency
replay, DROPMALFORMED against the deterministic corruption replay,
and LISTAGG against a sorted-set replay."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qio, qlake, qpipe, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_bucket_prune_reads_one_bucket(spark):
    df = qlake.Q["scan_bucket_prune"](spark, SF)
    # the face checkpoints its result (conf restore would re-plan a
    # lazy return); probe the pruned scan on the table it registered
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        probe = spark.table("bp_cust").filter(F.col("c_custkey") == 42)
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, prev)
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:2000]
    want = (
        t(spark, SF, "customer")
        .filter("c_custkey = 42")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    got = df.collect()
    assert {(r["c_mktsegment"], r["n"]) for r in got} == {
        (r["c_mktsegment"], r["count"]) for r in want
    }
    assert all(r["key_sum"] == 42 * r["n"] for r in got)


def test_knn_profile_matches_adjacency_replay(spark):
    edges = [
        (r["src"], r["dst"])
        for r in qpipe._undirected_edges(spark, SF).collect()
    ]
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    prof: dict[int, list] = {}
    for s, d in edges:
        v = prof.setdefault(deg[s], [0, 0])
        v[0] += 1
        v[1] += deg[d]
    got = {
        r["k"]: (r["n_endpoints"], r["neigh_deg_sum"], r["knn"])
        for r in qpipe.Q["kg_knn_profile"](spark, SF).collect()
    }
    assert got == {
        k: (v[0], v[1], round(v[1] / v[0], 6)) for k, v in prof.items()
    }


def test_dropmalformed_matches_corruption_replay(spark):
    rows = (
        t(spark, SF, "documents").select("doc_id", "n_chars").collect()
    )
    kept = [
        r
        for r in rows
        if hashlib.md5(f"cm:{r['doc_id']}".encode()).hexdigest()[0] >= "2"
    ]
    got = qio.Q["csv_dropmalformed"](spark, SF).collect()[0]
    assert got["n_total"] == len(rows)
    assert got["n_kept"] == len(kept)
    assert got["n_dropped"] == len(rows) - len(kept)
    assert got["kept_chars"] == sum(r["n_chars"] for r in kept)
    assert got["n_dropped"] > 0  # the corruption class is non-empty


def test_listagg_matches_sorted_set_replay(spark):
    per_user: dict[int, set] = {}
    for r in (
        t(spark, SF, "events")
        .filter("user_id IS NOT NULL")
        .select("user_id", "event_type")
        .collect()
    ):
        per_user.setdefault(r["user_id"], set()).add(r["event_type"])
    got = {
        r["user_id"]: (r["type_list"], r["n_types"])
        for r in qsql.Q["agg_listagg"](spark, SF).collect()
    }
    assert got == {
        u: (",".join(sorted(s)), len(s)) for u, s in per_user.items()
    }
