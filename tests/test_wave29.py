"""Invariant tests for the round-4 wave-29 feature/governance faces —
properties the DuckDB oracle gate cannot express (selection-set
equality vs the naive sort, IV non-negativity, brute-force encoding
arithmetic), at sf0.001."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Window, functions as F

from dbpedia_spotlight_db_spark.queries import qfeat
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_balanced_sample_matches_naive_global_sort(spark):
    got = {
        r["lang"]: (r["n_sampled"], r["id_sum"])
        for r in qfeat.Q["sample_balanced"](spark, SF).collect()
    }
    d = t(spark, SF, "documents").select("doc_id", "lang").toPandas()
    k = d.groupby("lang").size().min()
    want = {}
    for lang, grp in d.groupby("lang"):
        ids = sorted(
            grp["doc_id"],
            key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
        )[:k]
        want[lang] = (k, sum(ids))
    assert got == want
    # balance achieved: every class at exactly the min class size
    assert len({v[0] for v in got.values()}) == 1


def test_woe_signs_and_iv_nonnegative(spark):
    rows = qfeat.Q["feat_woe"](spark, SF).toPandas()
    o = t(spark, SF, "orders")
    n_pos = o.filter(F.col("o_orderstatus") == "F").count()
    assert rows["pos"].sum() == n_pos
    pt, nt = rows["pos"].sum(), rows["neg"].sum()
    for _, r in rows.iterrows():
        if r.woe is None or (isinstance(r.woe, float) and math.isnan(r.woe)):
            assert r.pos == 0 or r.neg == 0
            continue
        rate_diff = r.pos / pt - r.neg / nt
        # WOE and the rate difference share a sign, so IV terms are
        # non-negative by construction
        assert (r.woe > 0) == (rate_diff > 0) or r.woe == 0
        assert r.iv_term >= -1e-9


def test_ldiversity_partitions_and_flags(spark):
    rows = qfeat.Q["privacy_ldiversity"](spark, SF).toPandas()
    o = t(spark, SF, "orders")
    assert rows["k"].sum() == o.count()
    n_status = o.select("o_orderstatus").distinct().count()
    assert (rows["l"] <= n_status).all()
    assert (rows["l"] >= 1).all()
    assert ((rows["k"] >= 5) == rows["k_anonymous"]).all()
    assert ((rows["l"] >= 2) == rows["l_diverse"]).all()


def test_encode_dict_matches_bruteforce_ranking(spark):
    row = qfeat.Q["encode_dict"](spark, SF).collect()[0]
    docs = t(spark, SF, "documents").select("text").toPandas()
    from collections import Counter

    cnt = Counter()
    for txt in docs["text"]:
        for tk in (txt or "").split(" "):
            if tk:
                cnt[tk] += 1
    assert row["vocab"] == len(cnt)
    assert row["n_occ"] == sum(cnt.values())
    bytes_raw = sum(c * (len(tk) + 1) for tk, c in cnt.items())
    assert row["bytes_raw"] == bytes_raw

    def width(rank):
        return 1 if rank <= 128 else (2 if rank <= 16384 else 3)

    # rank by count desc; tie order is irrelevant to the byte sizing
    ranked = sorted(cnt.items(), key=lambda kv: -kv[1])
    stream = sum(c * width(i + 1) for i, (_, c) in enumerate(ranked))
    ids = sum(width(i + 1) for i in range(len(ranked)))
    strings = sum(len(tk) + 1 for tk in cnt)
    assert row["bytes_encoded"] == stream + ids + strings
    assert abs(row["ratio"] - (stream + ids + strings) / bytes_raw) < 1e-6


def test_balanced_sample_two_pass_shape(spark):
    """The Spark plan must not contain a per-class global sort of the
    corpus: the only row_number window runs over the single target
    bucket (~1/256 of a class)."""
    plan = (
        qfeat.Q["sample_balanced"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the naive form would sort (lang, h) over the whole corpus; the
    # two-pass form windows over (lang, bkt) partitions only
    assert "bkt" in plan