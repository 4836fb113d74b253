"""Wave-42 invariants: t-closeness against a pure-Python TVD replay
(including the absent-status fold), encode_rle against the serial
run count (proving the seam repair makes the distributed count
partitioning-invariant), Cohen's kappa against the textbook formula,
and Simpson diversity against a Counter replay."""

from __future__ import annotations

import math
from collections import Counter

from dbpedia_spotlight_db_spark.queries import qcorpus, qfeat, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_tcloseness_matches_tvd_replay(spark):
    rows = (
        t(spark, SF, "orders")
        .selectExpr(
            "o_orderpriority AS qi1",
            "CAST(year(o_orderdate) AS INT) AS yr",
            "o_orderstatus AS s",
        )
        .collect()
    )
    glob = Counter(r["s"] for r in rows)
    n = len(rows)
    groups: dict[tuple, Counter] = {}
    for r in rows:
        groups.setdefault((r["qi1"], r["yr"]), Counter())[r["s"]] += 1
    got = {
        (r["o_orderpriority"], r["yr"]): r
        for r in qfeat.Q["privacy_tcloseness"](spark, SF).collect()
    }
    assert set(got) == set(groups)
    for key, cg in groups.items():
        ng = sum(cg.values())
        tvd = 0.5 * sum(
            abs(cg.get(s, 0) / ng - glob[s] / n) for s in glob
        )
        g = got[key]
        assert g["k"] == ng
        assert abs(g["t_dist"] - tvd) < 1e-6
        assert g["t_close"] == (tvd <= qfeat._TCLOSE_T_PCT / 100 + 1e-12)


def test_rle_matches_serial_count(spark):
    rows = (
        t(spark, SF, "lineitem")
        .select(
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
        )
        .collect()
    )
    rows.sort(
        key=lambda r: (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"])
    )

    def runs(col):
        prev, k = object(), 0
        for r in rows:
            if r[col] != prev:
                k += 1
                prev = r[col]
        return k

    got = {r["col"]: r for r in qfeat.Q["encode_rle"](spark, SF).collect()}
    assert set(got) == {"l_returnflag", "l_linestatus"}
    for col in got:
        assert got[col]["n_rows"] == len(rows)
        assert got[col]["n_runs"] == runs(col)
        assert (
            abs(got[col]["rle_ratio"] - len(rows) / runs(col)) < 1e-6
        )


def test_kappa_matches_formula(spark):
    def _rnd_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("value", "event_type")
        .collect()
    )
    tp = fp = fn = tn = 0
    for r in rows:
        hit = _rnd_away(r["value"] * 100) >= qml._CONF_T
        pos = r["event_type"] == "purchase"
        if hit and pos:
            tp += 1
        elif hit:
            fp += 1
        elif pos:
            fn += 1
        else:
            tn += 1
    n = tp + fp + fn + tn
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / n**2
    want = (po - pe) / (1 - pe)
    got = qml.Q["ml_cohen_kappa"](spark, SF).collect()[0]
    assert got["n"] == n
    assert abs(got["po"] - po) < 1e-6
    assert abs(got["pe"] - pe) < 1e-6
    assert abs(got["kappa"] - want) < 1e-6


def test_simpson_matches_counter_replay(spark):
    docs = t(spark, SF, "documents").select("lang", "text").collect()
    per_lang: dict[str, Counter] = {}
    for r in docs:
        c = per_lang.setdefault(r["lang"], Counter())
        for tk in (r["text"] or "").split(" "):
            if tk:
                c[tk] += 1
    got = {r["lang"]: r for r in qcorpus.Q["text_simpson"](spark, SF).collect()}
    assert set(got) == set(per_lang)
    for lang, c in per_lang.items():
        n = sum(c.values())
        rep2 = sum(v * (v - 1) for v in c.values())
        g = got[lang]
        assert g["n_tokens"] == n and g["vocab"] == len(c)
        assert abs(g["simpson"] - rep2 / (n * (n - 1))) < 1e-6
        assert abs(g["eff_vocab"] - n * (n - 1) / rep2) < 1e-6
