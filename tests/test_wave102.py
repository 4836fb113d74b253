"""Wave-102 invariants: the Arrow UDTF equals a Python split replay
and actually takes the Arrow path (vs udtf_ngrams' pickled path);
Cochran's Q equals the textbook formula replay; the missing-file
read drops exactly the deleted half and proves the file was listed;
interval arithmetic equals datetime replays including month-end
clamping."""

from __future__ import annotations

import calendar
import datetime as dt

from dbpedia_spotlight_db_spark.queries import qadv, qdata, qio, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_arrow_udtf_matches_replay_and_takes_arrow_path(spark):
    df = qdata.Q["udtf_arrow_split"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan
    expect = set()
    for r in t(spark, SF, "documents").collect():
        if r["text"] is None:
            continue
        for i, w in enumerate(r["text"].split(" ")):
            expect.add((r["doc_id"], i, w, len(w.encode())))
    got = {
        (r["doc_id"], r["pos"], r["tok"], r["tok_bytes"])
        for r in df.collect()
    }
    assert got == expect


def test_cochran_q_matches_formula(spark):
    flags = {}
    for r in t(spark, SF, "orders").collect():
        x = flags.setdefault(r["o_custkey"], [0, 0, 0])
        if r["o_orderstatus"] == "F":
            x[0] = 1
        if r["o_orderpriority"] == "1-URGENT":
            x[1] = 1
        if r["o_totalprice"] > 100000.0:
            x[2] = 1
    s = [sum(v[j] for v in flags.values()) for j in range(3)]
    sr = sum(sum(v) for v in flags.values())
    sr2 = sum(sum(v) ** 2 for v in flags.values())
    num = 2 * (3 * sum(x * x for x in s) - sr * sr)
    den = 3 * sr - sr2
    row = qadv.Q["stat_cochran_q"](spark, SF).collect()[0]
    assert row["n_subj"] == len(flags)
    assert (row["q_num"], row["q_den"]) == (num, den)
    assert abs(row["q"] - round(num / den, 6)) <= 1e-9


def test_ignore_missing_drops_exactly_the_deleted_half(spark):
    rows = qio.Q["scan_ignore_missing"](spark, SF).collect()
    assert rows and all(r["survived_listing_race"] for r in rows)
    docs = [
        (r["doc_id"], r["lang"])
        for r in t(spark, SF, "documents").collect()
        if r["doc_id"] % 2 == 0
    ]
    exp = {}
    for did, lang in docs:
        n, sm = exp.get(lang, (0, 0))
        exp[lang] = (n + 1, sm + did)
    got = {r["lang"]: (r["n_docs"], r["id_sum"]) for r in rows}
    assert got == exp


def _add_months_clamped(d, months):
    y = d.year + (d.month - 1 + months) // 12
    m = (d.month - 1 + months) % 12 + 1
    return dt.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))


def test_interval_arith_matches_datetime_replay(spark):
    got = {
        r["o_orderkey"]: r
        for r in qrel.Q["date_interval_arith"](spark, SF).collect()
    }
    epoch = dt.date(1970, 1, 1)
    anchor = dt.datetime(1990, 1, 1)
    for r in t(spark, SF, "orders").collect():
        od = r["o_orderdate"]
        d = od.date()
        g = got[r["o_orderkey"]]
        assert g["due30_day"] == (d + dt.timedelta(days=30) - epoch).days
        assert g["plus36h_us"] == int(
            (od.replace(tzinfo=dt.timezone.utc) + dt.timedelta(hours=36))
            .timestamp() * 1000000
        )
        assert g["plus2mo_day"] == (_add_months_clamped(d, 2) - epoch).days
        assert g["hours_since_1990"] == int(
            (od - anchor).total_seconds() // 3600
        )
