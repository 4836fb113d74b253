"""Invariant tests for the lakehouse-operations wave (qlake.py) and
the wave-10 graph/dedup faces. Spark-vs-DuckDB value equality is the
oracle gate's job (tools/check_oracle.py); these pin the semantics
the hash compare can't articulate: grouping-set disjointness,
shard determinism and conservation, chi-square A/A behavior,
bin-capacity bounds, prune soundness, containment asymmetry, and
clustering-coefficient range.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qdata, qlake, qpipe
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_grouping_sets_partition_counts(spark):
    got = qlake.Q["agg_grouping_sets"](spark, SF).toPandas()
    n_orders = t(spark, SF, "orders").count()
    # each grouping set independently partitions the fact table
    for grp in ("by_priority", "by_status", "grand"):
        sub = got[got["grp"] == grp]
        assert int(sub["n_orders"].sum()) == n_orders
    grand = got[got["grp"] == "grand"]
    assert len(grand) == 1
    assert grand["o_orderpriority"].isna().all()
    assert grand["o_orderstatus"].isna().all()


def test_shard_plan_conserves_and_balances(spark):
    got = qlake.Q["shard_plan"](spark, SF).toPandas()
    docs = t(spark, SF, "documents")
    assert int(got["n_docs"].sum()) == docs.count()
    assert set(got["shard"]) <= set("0123456789abcdef")
    # balance is normalized to mean 1.0 across shards
    assert abs(got["balance"].mean() - 1.0) < 1e-4
    # determinism: same input -> identical assignment
    again = qlake.Q["shard_plan"](spark, SF).toPandas()
    assert got.sort_values("shard").reset_index(drop=True).equals(
        again.sort_values("shard").reset_index(drop=True)
    )


def test_drift_chi2_aa_split_is_small_and_zero_when_identical(spark):
    got = qlake.Q["drift_chi2"](spark, SF).toPandas()
    # contributions are non-negative and the A/A statistic is far from
    # the rejection region (chi2_0.999 at df=4 is ~18.5)
    assert (got["contrib"] >= 0).all()
    assert got["contrib"].sum() < 18.5


def test_compact_plan_bins_are_contiguous_and_capacity_bounded(spark):
    got = qlake.Q["compact_plan"](spark, SF).toPandas()
    target = 4096
    for source, g in got.groupby("source"):
        g = g.sort_values("lang")
        # running offsets are the exclusive prefix sum of file sizes
        expect_off = g["file_bytes"].cumsum().shift(fill_value=0)
        assert (g["start_off"].values == expect_off.values).all()
        assert (g["bin"].values == g["start_off"].values // target).all()
        # bins are non-decreasing in file order (contiguous packing)
        assert (g["bin"].diff().fillna(0) >= 0).all()


def test_scan_prune_is_sound_never_skips_matching_rows(spark):
    got = qlake.Q["scan_prune_stats"](spark, SF).toPandas()
    li = t(spark, SF, "lineitem").withColumn(
        "part", F.date_format("l_shipdate", "yyyy-MM")
    )
    hit = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-09-01").cast("timestamp"))
        )
        .select("part")
        .distinct()
        .toPandas()["part"]
        .tolist()
    )
    scanned = set(got[got["scanned"]]["part"])
    # soundness: every partition that truly contains matching rows is scanned
    assert set(hit) <= scanned
    # effectiveness on month-partitioned stats: pruning actually skips most
    assert len(scanned) < len(got) / 2


def test_containment_directed_superset_scores_one(spark, tmp_path):
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " eta theta iota kappa " + "x y z " * 20
    rows = [(1, short, "en", "s", len(short)), (2, long, "en", "s", len(long))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = qdata.Q["dedup_containment"](spark, str(tmp_path)).toPandas()
    by_dir = {(r.src_id, r.dst_id): r.containment for r in got.itertuples()}
    # the short doc is fully contained in the long one...
    assert by_dir[(1, 2)] == 1.0
    # ...but not vice versa (asymmetry is the point of the face)
    assert (2, 1) not in by_dir or by_dir[(2, 1)] < 1.0


def test_clustering_coeff_range_and_triangle_consistency(spark):
    got = qpipe.Q["kg_clustering"](spark, SF).toPandas()
    assert ((got["coeff"] >= 0) & (got["coeff"] <= 1)).all()
    # sum of per-node triangle credits = 3 * global triangle count
    n_tri = qpipe.Q["kg_triangles"](spark, SF).collect()[0]["n_triangles"]
    assert int(got["n_tri"].sum()) == 3 * n_tri
    # degree-1 nodes have coeff 0 by definition
    assert (got[got["degree"] < 2]["coeff"] == 0).all()


def test_drift_chi2_degenerate_half_is_null_not_error(spark, tmp_path):
    """One empty hash-half -> expected counts of 0 -> chi-square
    undefined. Spark's ANSI mode would raise DIVIDE_BY_ZERO without
    the explicit guard; both engines must emit NULL instead."""
    import hashlib

    ids = [
        i
        for i in range(200)
        if hashlib.md5(str(i).encode()).hexdigest()[0] >= "8"
    ][:6]
    spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = qlake.Q["drift_chi2"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].n_a == 0 and got[0].n_b == 6
    assert got[0].contrib is None


def test_assortativity_regular_graph_is_null_not_error(spark, tmp_path):
    """A single doc mentioning three dictionary entities makes a
    triangle: every degree equal -> zero variance -> Pearson
    undefined -> NULL (not an ANSI division error)."""
    text = "spark merge window"
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = qpipe.Q["kg_assortativity"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    # one doc -> its candidate URIs form a clique (de keeps ALL
    # candidates per surface form), so the graph is regular: k nodes,
    # k*(k-1) directed edges
    n = got[0].n_directed_edges
    k = round((1 + (1 + 4 * n) ** 0.5) / 2)
    assert n == k * (k - 1) and k >= 3
    assert got[0].assortativity is None
