"""Wave-99 invariants: the AES padded length matches the PKCS#7
closed form byte-for-byte and every document roundtrips; Cronbach's
alpha equals a NumPy variance replay; the F1 sweep equals a
brute-force per-threshold confusion replay and flags the true argmax;
the lateral-alias chain is algebraically consistent."""

from __future__ import annotations

import numpy as np

from dbpedia_spotlight_db_spark.queries import qadv, qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_aes_padded_length_closed_form(spark):
    rows = qsql.Q["sql_aes_roundtrip"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["roundtrip_ok"] is True
        assert r["ct_len"] == 16 * (r["pt_len"] // 16 + 1)
    texts = {
        r["doc_id"]: r["text"]
        for r in t(spark, SF, "documents").collect()
        if r["text"] is not None
    }
    got = {r["doc_id"]: r["pt_len"] for r in rows}
    assert got == {k: len(v.encode("utf-8")) for k, v in texts.items()}


def test_cronbach_matches_numpy_replay(spark):
    li = t(spark, SF, "lineitem").collect()
    x = np.array(
        [
            [
                int(r["l_quantity"]),
                round(r["l_discount"] * 100),
                round(r["l_tax"] * 100),
            ]
            for r in li
        ],
        dtype=np.int64,
    )
    k = 3
    item_vars = x.var(axis=0, ddof=1).sum()
    tot_var = x.sum(axis=1).var(ddof=1)
    alpha = (k / (k - 1)) * (1 - item_vars / tot_var)
    row = qadv.Q["stat_cronbach"](spark, SF).collect()[0]
    assert row["n"] == len(li)
    assert abs(row["alpha"] - round(alpha, 6)) <= 1e-6


def test_f1_sweep_matches_bruteforce(spark):
    ev = [
        (round(r["value"] * 100), 1 if r["event_type"] == "purchase" else 0)
        for r in t(spark, SF, "events").collect()
        if r["value"] is not None
    ]
    pos_tot = sum(p for _, p in ev)
    expect = {}
    for thr in sorted({c for c, _ in ev}):
        tp = sum(p for c, p in ev if c >= thr)
        pp = sum(1 for c, _ in ev if c >= thr)
        expect[thr] = (
            tp,
            pp - tp,
            pos_tot - tp,
            (2000000 * tp) // (pp + pos_tot),
        )
    rows = qml.Q["ml_f1_sweep"](spark, SF).collect()
    got = {
        r["thr_cents"]: (r["tp"], r["fp"], r["fn"], r["f1_micros"])
        for r in rows
    }
    assert got == expect
    best = max(v[3] for v in expect.values())
    assert {r["thr_cents"] for r in rows if r["is_best"]} == {
        k for k, v in expect.items() if v[3] == best
    }


def test_lateral_alias_chain_consistent(spark):
    rows = qsql.Q["sql_lateral_alias"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["cents_x2"] == 2 * r["cents"]
        assert r["delta"] == r["cents"]
