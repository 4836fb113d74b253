"""Invariant tests for the round-4 wave-31 faces — polymorphic-UDTF
schema arity, MinHash estimator error bounds, and a brute-force
Cramér's V recomputation, at sf0.001."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qdata
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_udtf_analyze_schema_comes_from_analyze(spark):
    df = qdata.Q["udtf_analyze"](spark, SF)
    # analyze() computed w1..w3 at plan time from the literal arg
    assert df.columns == ["doc_id", "w1", "w2", "w3"]
    rows = df.toPandas()
    docs = (
        t(spark, SF, "documents")
        .filter(F.col("doc_id") % 101 == 0)
        .select("doc_id", "text")
        .toPandas()
    )
    assert len(rows) == len(docs)  # exactly one output row per input
    by_id = {r.doc_id: r for _, r in rows.iterrows()}
    for _, d in docs.iterrows():
        toks = (d.text or "").split(" ")
        got = by_id[d.doc_id]
        for i, col in enumerate(["w1", "w2", "w3"]):
            want = toks[i] if i < len(toks) else None
            assert got[col] == want or (want is None and got[col] is None)


def test_minhash_eval_error_is_bounded(spark):
    row = qdata.Q["dedup_minhash_eval"](spark, SF).collect()[0]
    assert row["n_pairs"] > 0
    # estimates are multiples of 0.25 and jaccard >= 0.2, so per-pair
    # error < 1 and the aggregate MAE must sit well inside [0, 0.8]
    assert 0.0 <= row["mae"] <= 0.8
    assert abs(row["bias"]) <= row["mae"] + 1e-9


def test_cramers_v_matches_bruteforce(spark):
    got = qadv.Q["stat_cramers_v"](spark, SF).collect()[0]
    o = (
        t(spark, SF, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .toPandas()
    )
    import pandas as pd

    ct = pd.crosstab(o["o_orderpriority"], o["o_orderstatus"])
    n = ct.values.sum()
    chi2 = 0.0
    for r in ct.index:
        for c in ct.columns:
            e = ct.loc[r].sum() * ct[c].sum() / n
            # mirror the face's per-cell micros quantization
            chi2 += round(1e6 * (ct.loc[r, c] - e) ** 2 / e) / 1e6
    v = math.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    assert got["n"] == n
    assert got["df"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert abs(got["chi2"] - chi2) < 1e-5
    assert abs(got["v"] - v) < 1e-6
    assert 0.0 <= got["v"] <= 1.0