"""Wave-33 invariants: PR-curve rows reconcile against brute-force
threshold counts, lift conservation and terminal cumulative lift,
stump impurity never exceeds the parent's, Spearman matches pandas'
tie-averaged implementation, and the bootstrap is deterministic with
mean-1 weights."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _events_pd(spark):
    pdf = (
        t(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            (F.col("event_type") == "purchase").cast("int").alias("pos"),
        )
        .toPandas()
    )
    return pdf


def test_pr_curve_matches_bruteforce_threshold_counts(spark):
    pdf = _events_pd(spark)
    n, pos_tot = len(pdf), int(pdf["pos"].sum())
    rows = qml.Q["ml_pr_curve"](spark, SF).collect()
    assert rows
    for r in rows:
        above = pdf[pdf["cents"] >= r["threshold_cents"]]
        assert r["n_above"] == len(above)
        assert r["pos_above"] == int(above["pos"].sum())
        # threshold row k is the tie-run containing global rank
        # ceil(k*n/20): inclusive count reaches the target, exclusive
        # count does not
        target = -(-r["k"] * n // 20)
        run = int((pdf["cents"] == r["threshold_cents"]).sum())
        assert r["n_above"] >= target > r["n_above"] - run
        assert math.isclose(
            r["precision"], round(r["pos_above"] / r["n_above"], 6)
        )
        assert math.isclose(
            r["recall"], round(r["pos_above"] / pos_tot, 6)
        )


def test_lift_conserves_and_terminates_at_one(spark):
    pdf = _events_pd(spark)
    rows = sorted(
        qml.Q["ml_lift"](spark, SF).collect(), key=lambda r: r["decile"]
    )
    assert sum(r["n_d"] for r in rows) == len(pdf)
    assert sum(r["pos_d"] for r in rows) == int(pdf["pos"].sum())
    assert all(1 <= r["decile"] <= 10 for r in rows)
    # cumulative lift over the whole population is exactly 1
    assert rows[-1]["cum_lift"] == 1.0


def test_stump_split_never_worse_than_parent(spark):
    r = qml.Q["ml_stump"](spark, SF).collect()
    assert len(r) == 1
    row = r[0]
    n_orders = t(spark, SF, "orders").count()
    assert row["n_left"] + row["n_right"] == n_orders
    assert row["n_left"] >= 1 and row["n_right"] >= 1
    # weighted child impurity <= parent impurity (Gini is concave);
    # micros quantization can perturb by at most 1
    assert row["gini_micros"] <= row["base_gini_micros"] + 1


def test_spearman_matches_pandas(spark):
    got = qml.Q["stat_spearman"](spark, SF).collect()[0]
    pdf = (
        t(spark, SF, "lineitem")
        .select("l_quantity", "l_discount")
        .toPandas()
    )
    # pandas' method="spearman" needs scipy (absent in the sandbox):
    # rank with tie-averaging, then plain Pearson on the ranks
    rx = pdf["l_quantity"].rank(method="average")
    ry = pdf["l_discount"].rank(method="average")
    want = rx.corr(ry)
    assert got["n"] == len(pdf)
    assert abs(got["rho"] - want) < 1e-6


def test_bootstrap_deterministic_mean_one_weights(spark):
    rows = {r["b"]: r for r in qml.Q["stat_bootstrap"](spark, SF).collect()}
    assert set(rows) == set(range(16))
    again = {r["b"]: r for r in qml.Q["stat_bootstrap"](spark, SF).collect()}
    assert all(
        rows[b]["n_eff"] == again[b]["n_eff"]
        and rows[b]["mean_price"] == again[b]["mean_price"]
        for b in rows
    )
    o = t(spark, SF, "orders").select("o_totalprice").toPandas()
    n, true_mean = len(o), float(o["o_totalprice"].mean())
    for r in rows.values():
        # weights are {0,1,2} uniform (mean 1, var 2/3): n_eff stays
        # near n and the resample mean near the true mean
        assert abs(r["n_eff"] - n) < max(10.0, 6 * math.sqrt(n * 2 / 3))
        assert abs(r["mean_price"] - true_mean) / true_mean < 0.2
