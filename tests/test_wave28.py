"""Invariant tests for the round-4 wave-28 sketch/selection faces —
properties the DuckDB oracle gate cannot express (sketch dominance,
bloom transparency, order-statistic identity, brute-force square
counts), at sf0.001."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qpipe, qsketch
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_countmin_estimates_dominate_true_counts(spark):
    cm = qsketch.Q["agg_countmin"](spark, SF).toPandas()
    assert len(cm) == 20
    # CMS never underestimates, and overcount is the reported delta
    assert (cm["cm_est"] >= cm["true_cnt"]).all()
    assert (cm["overcount"] == cm["cm_est"] - cm["true_cnt"]).all()
    # the probed tokens ARE the true top-20 heavy hitters
    d = t(spark, SF, "documents")
    true_top = (
        d.select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tk")
        .limit(20)
        .toPandas()
    )
    assert set(cm["tk"]) == set(true_top["tk"])


def test_bloom_join_is_transparent(spark):
    """The bloom pre-filter must not change the answer: the face
    equals the plain exact semi-join computed without it."""
    got = {
        r["o_orderpriority"]: (r["n_orders"], r["total_cents"])
        for r in qsketch.Q["join_bloom"](spark, SF).collect()
    }
    o = t(spark, SF, "orders")
    c = t(spark, SF, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    want = {
        r["o_orderpriority"]: (r["n"], r["cents"])
        for r in o.join(
            c, o["o_custkey"] == c["c_custkey"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_two_pass_median_is_the_exact_order_statistic(spark):
    med = {
        r["l_returnflag"]: (r["n_rows"], r["median_cents_x2"])
        for r in qsketch.Q["quantile_2pass"](spark, SF).collect()
    }
    li = (
        t(spark, SF, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("c"),
        )
        .toPandas()
    )
    assert len(med) == li["l_returnflag"].nunique()
    for g, grp in li.groupby("l_returnflag"):
        vals = sorted(grp["c"])
        n = len(vals)
        lo, hi = vals[(n + 1) // 2 - 1], vals[n // 2]
        assert med[g] == (n, lo + hi)


def test_kg_squares_matches_bruteforce_enumeration(spark):
    got = qsketch.Q["kg_squares"](spark, SF).collect()[0]
    edges = {
        frozenset((r["uri_a"], r["uri_b"]))
        for r in qpipe._entity_pairs(spark, SF).collect()
    }
    adj: dict[str, set[str]] = {}
    for e in edges:
        a, b = sorted(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # fixture graph is hub-free: the degree cap must not bind
    assert all(len(v) <= qsketch._SQ_DEG_CAP for v in adj.values())
    n_sq = 0
    nodes = sorted(adj)
    for u, v in combinations(nodes, 2):
        common = adj[u] & adj[v]
        c = len(common)
        n_sq += c * (c - 1) // 2
    assert n_sq % 2 == 0
    assert got["n_squares"] == n_sq // 2
    assert got["n_wedge_pairs"] == n_sq


def test_heaps_fit_is_sublinear_growth(spark):
    row = qsketch.Q["text_heaps"](spark, SF).collect()[0]
    # 10 thresholds, all usable at fixture scale
    assert row["n"] == 10
    # vocabulary grows sub-linearly in tokens; the fixture's CLOSED
    # synthetic vocabulary saturates at the first prefix, so beta = 0
    # is the correct fit there (real crawls sit near 0.5)
    assert 0.0 <= row["beta"] < 1.05
    assert row["ln_k"] is not None
