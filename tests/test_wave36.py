"""Wave-36 invariants: ambiguity entropy closed forms, delta
reconciliation against a direct per-epoch recount, vacuum retention
arithmetic vs a pandas recount, and quantile-bin ordering."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qfeat, qgraph, qlake
from dbpedia_spotlight_db_spark.queries.common import t
from dbpedia_spotlight_db_spark.queries.qpipe import (
    SPOT_CANDIDATES,
    _doc_entities,
)

SF = "/root/testdata/sf0.001"


def test_ambiguity_entropy_closed_form(spark):
    rows = {r["surface_form"]: r for r in qgraph.Q["kg_ambiguity"](spark, SF).collect()}
    assert set(rows) == {sf for sf, _, _ in SPOT_CANDIDATES}
    # closed form for 'spark' (w = 8, 2)
    p = [8 / 10, 2 / 10]
    want = -sum(x * math.log(x) for x in p)
    assert abs(rows["spark"]["prior_entropy"] - want) < 1e-5
    assert rows["spark"]["n_candidates"] == 2
    # single-candidate forms have exactly zero entropy, not -0.0
    assert rows["hash join"]["prior_entropy"] == 0.0
    assert str(rows["hash join"]["prior_entropy"]) == "0.0"
    # the tie pair ('vector': 4,4) is maximal: ln 2
    assert abs(rows["vector"]["prior_entropy"] - math.log(2)) < 1e-5


def test_delta_reconciles_per_epoch_recount(spark):
    rows = {(r["kind"], r["status"]): r["n"] for r in qgraph.Q["kg_delta"](spark, SF).collect()}
    de = _doc_entities(spark, SF).select("doc_id", "uri").collect()
    n0 = {r["uri"] for r in de if r["doc_id"] % 2 == 0}
    n1 = {r["uri"] for r in de if r["doc_id"] % 2 == 1}
    assert rows.get(("node", "kept"), 0) == len(n0 & n1)
    assert rows.get(("node", "added"), 0) == len(n1 - n0)
    assert rows.get(("node", "removed"), 0) == len(n0 - n1)
    per_doc = {}
    for r in de:
        per_doc.setdefault(r["doc_id"], set()).add(r["uri"])
    e0, e1 = set(), set()
    for doc, us in per_doc.items():
        tgt = e0 if doc % 2 == 0 else e1
        us = sorted(us)
        for i, a in enumerate(us):
            for b in us[i + 1 :]:
                tgt.add((a, b))
    assert rows.get(("edge", "kept"), 0) == len(e0 & e1)
    assert rows.get(("edge", "added"), 0) == len(e1 - e0)
    assert rows.get(("edge", "removed"), 0) == len(e0 - e1)


def test_vacuum_plan_matches_pandas_recount(spark):
    got = {r["event_type"]: r for r in qlake.Q["vacuum_plan"](spark, SF).collect()}
    pdf = (
        t(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "event_type", "ts", "value")
        .toPandas()
    )
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    pdf = pdf.sort_values(["ts", "event_id"], ascending=False)
    pdf["rn"] = pdf.groupby("user_id").cumcount() + 1
    for et, g in pdf.groupby("event_type"):
        assert got[et]["n_total"] == len(g)
        assert got[et]["n_retained"] == int((g["rn"] <= 2).sum())
        assert got[et]["n_expired"] == int((g["rn"] > 2).sum())
        assert got[et]["bytes_expired"] == int(g.loc[g["rn"] > 2, "cents"].sum())
        assert got[et]["n_total"] == got[et]["n_retained"] + got[et]["n_expired"]


def test_quantile_bins_ordered_and_conserving(spark):
    rows = sorted(
        qfeat.Q["feat_quantile_bins"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in rows] == [1, 2, 3, 4]
    n_cust = t(spark, SF, "customer").count()
    assert sum(r["n_rows"] for r in rows) == n_cust
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] < b["lo_cents"]  # tie-runs never straddle bins
        # quartiles are within one tie-run of n/4
        assert a["n_rows"] >= 1
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        assert (
            r["lo_cents"] / 100.0 - 0.01
            <= r["mean_bal"]
            <= r["hi_cents"] / 100.0 + 0.01
        )
