"""Wave-103 invariants: the semantic-equivalence booleans are earned
at the exact plan level each API operates on; execution-mode
invariance restores every conf and all three modes agree; try_sum
matches the plain sum and really nulls on overflow; Page's L equals
a doubled-rank replay."""

from __future__ import annotations

import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_semantic_equiv_levels(spark):
    rows = qsql.Q["sql_semantic_equiv"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["api_eq_sql"] is True
        assert r["pipe_analyzed_eq"] is False
        assert r["pipe_optimized_eq"] is True
    exp = {
        (r["o_orderpriority"], r["count"])
        for r in t(spark, SF, "orders")
        .filter("o_orderstatus = 'F'")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    assert {(r["o_orderpriority"], r["n"]) for r in rows} == exp


def test_exec_invariance_restores_and_agrees(spark):
    keys = [
        "spark.sql.codegen.wholeStage",
        "spark.sql.parquet.enableVectorizedReader",
        "spark.sql.adaptive.enabled",
    ]
    before = {k: spark.conf.get(k) for k in keys}
    rows = qsql.Q["sql_exec_invariance"](spark, SF).collect()
    assert {k: spark.conf.get(k) for k in keys} == before
    assert rows
    for r in rows:
        assert r["codegen_off_eq"] is True
        assert r["vectorized_off_eq"] is True
        assert r["aqe_off_eq"] is True


def test_try_agg_matches_and_overflow_nulls(spark):
    row = qsql.Q["sql_try_agg"](spark, SF).collect()[0]
    cents = [
        round(r["o_totalprice"] * 100)
        for r in t(spark, SF, "orders").collect()
    ]
    assert row["n"] == len(cents)
    assert row["sum_cents"] == sum(cents)
    assert abs(row["avg_cents"] - round(sum(cents) / len(cents), 6)) <= 1e-9
    assert row["overflow_is_null"] is True


def test_page_trend_matches_doubled_rank_replay(spark):
    daily = defaultdict(int)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        day = (r["ts"].date() - __import__("datetime").date(2024, 1, 1)).days
        daily[(day, r["event_type"])] += round(r["value"] * 100)
    cells = {k: v // 100 for k, v in daily.items()}
    types = sorted({et for _, et in cells})
    k = len(types)
    jmap = {et: i + 1 for i, et in enumerate(types)}
    days = sorted({d for d, _ in cells})
    full = [d for d in days if all((d, et) in cells for et in types)]
    rd = defaultdict(int)
    for d in full:
        vals = [(cells[(d, et)], et) for et in types]
        for v, et in vals:
            less = sum(1 for w, _ in vals if w < v)
            ties = sum(1 for w, _ in vals if w == v)
            rd[et] += 2 * (less + 1) + ties - 1
    l2 = sum(jmap[et] * rd[et] for et in types)
    n = len(full)
    row = qml.Q["stat_page_trend"](spark, SF).collect()[0]
    assert (row["n_blocks"], row["n_treatments"], row["l_doubled"]) == (
        n,
        k,
        l2,
    )
    mean2 = n * k * (k + 1) ** 2 / 2.0
    var2 = n * float(k) * k * (k + 1) * (k * k - 1) / 36.0
    assert abs(row["z"] - round((l2 - mean2) / math.sqrt(var2), 6)) <= 1e-9
