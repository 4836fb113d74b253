"""Wave-32 invariants: exact heavy hitters (Misra-Gries candidate
pass is transparent and partitioning-independent), mutual information
vs a pandas brute force, EXISTS/NOT EXISTS semantics vs a manual
semi/anti construction, and star-join revenue reconciliation."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qsketch
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_heavy_hitters_match_naive_threshold(spark):
    got = {
        r["tk"]: (r["c"], r["n"], r["share_ppm"])
        for r in qsketch.Q["agg_heavy_hitters"](spark, SF).collect()
    }
    tok = (
        t(spark, SF, "documents")
        .select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
    )
    cnt = {r["tk"]: r["c"] for r in tok.groupBy("tk").agg(F.count(F.lit(1)).alias("c")).collect()}
    n = sum(cnt.values())
    want = {k: v for k, v in cnt.items() if v * qsketch._HH_K > n}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k][0] == v
        assert got[k][1] == n
        assert got[k][2] == (v * 1_000_000) // n
    assert got  # the fixture corpus has genuine heavy hitters


def test_heavy_hitters_partitioning_independent(spark):
    """The MG candidate pass sees different per-partition streams under
    different partitionings; the FINAL exact answer must not."""
    base = qsketch.Q["agg_heavy_hitters"](spark, SF)
    want = sorted((r["tk"], r["c"]) for r in base.collect())
    d = t(spark, SF, "documents")
    for nparts in (1, 7):
        view = d.repartition(nparts)
        p1 = view.select("text").mapInPandas(
            qsketch._mg_candidates, schema="tk string, c long"
        )
        cand = {r["tk"] for r in p1.collect() if r["tk"] is not None}
        # superset property: every true heavy hitter survives pass 1
        assert {tk for tk, _ in want} <= cand
        # and pass 1 is bounded: <= CAP candidates per partition
        per_part = (
            view.select("text")
            .mapInPandas(qsketch._mg_candidates, schema="tk string, c long")
            .filter(F.col("tk").isNotNull())
            .count()
        )
        assert per_part <= qsketch._HH_CAP * nparts


def test_mutual_info_matches_bruteforce(spark):
    got = qadv.Q["stat_mutual_info"](spark, SF).collect()[0]
    li = t(spark, SF, "lineitem").select("l_returnflag", "l_linestatus").toPandas()
    ct = pd.crosstab(li["l_returnflag"], li["l_linestatus"])
    n = int(ct.values.sum())
    mi = 0.0
    for x in ct.index:
        for y in ct.columns:
            nxy = int(ct.loc[x, y])
            if nxy == 0:
                continue
            mi += (nxy / n) * math.log(nxy * n / (int(ct.loc[x].sum()) * int(ct[y].sum())))
    assert got["n"] == n
    assert got["mi_nats"] == pytest.approx(mi, abs=1e-4)
    assert got["mi_nats"] >= 0 or abs(got["mi_nats"]) < 1e-4


def test_exists_subq_matches_manual_semi_anti(spark):
    got = {
        r["c_mktsegment"]: (r["n_customers"], r["acctbal_cents"])
        for r in qadv.Q["join_exists_subq"](spark, SF).collect()
    }
    c = t(spark, SF, "customer")
    o = t(spark, SF, "orders")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    urg = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    manual = (
        c.join(fin, c["c_custkey"] == fin["o_custkey"], "left_semi")
        .join(urg, c["c_custkey"] == urg["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("c_acctbal") * 100).cast("long").alias("cents"),
        )
    )
    want = {r["c_mktsegment"]: (r["n"], r["cents"]) for r in manual.collect()}
    assert got == want


def test_join_star_reconciles_to_fact_total(spark):
    """Every lineitem with a qualifying part appears in exactly one
    (region, brand) cell — the rollup must reconcile to the filtered
    fact count (dims are complete: every suppkey resolves)."""
    rows = qadv.Q["join_star"](spark, SF).collect()
    li = t(spark, SF, "lineitem")
    p = t(spark, SF, "part").filter(F.col("p_size") <= 25)
    want = li.join(p, li["l_partkey"] == p["p_partkey"], "left_semi").count()
    assert sum(r["n_items"] for r in rows) == want
    assert all(r["revenue_cents"] > 0 for r in rows)
