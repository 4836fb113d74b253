"""Wave-110 invariants: mode(x, true) really picks the LOWEST tied
maximum (tie fabricated and checked); Cochran-Armitage equals the
exact-moment replay; ordinal references bind to select-list
positions."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qadv, qsql, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_mode_det_lowest_tie(spark):
    # fabricated tie: the flag must pick the LOWEST tied maximum
    got = spark.sql(
        "SELECT mode(x, true) AS m FROM VALUES (5),(2),(5),(2),(9) AS "
        "t(x)"
    ).collect()[0]["m"]
    assert got == 2
    cnt = defaultdict(Counter)
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None:
            cnt[r["event_type"]][round(r["value"] * 100)] += 1
    expect = {}
    for et, c in cnt.items():
        mx = max(c.values())
        expect[et] = min(v for v, n in c.items() if n == mx)
    rows = {
        r["event_type"]: r["mode_cents"]
        for r in qstats.Q["agg_mode_det"](spark, SF).collect()
    }
    assert rows == expect


def test_cochran_armitage_matches_replay(spark):
    g = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "orders").collect():
        s = int(r["o_orderpriority"][0])
        g[s][0] += 1
        if r["o_orderstatus"] == "F":
            g[s][1] += 1
    nt = sum(v[0] for v in g.values())
    at = sum(v[1] for v in g.values())
    tstat = sum(s * v[1] for s, v in g.items())
    s1 = sum(s * v[0] for s, v in g.items())
    s2 = sum(s * s * v[0] for s, v in g.items())
    z = round(
        (nt * tstat - at * s1)
        / math.sqrt(at * (nt - at) * (nt * s2 - s1 * s1) / nt),
        6,
    )
    row = qadv.Q["stat_cochran_armitage"](spark, SF).collect()[0]
    assert (row["k"], row["n_total"], row["n_pos"]) == (len(g), nt, at)
    assert (row["t_stat"], row["s1"], row["s2"]) == (tstat, s1, s2)
    assert abs(row["z"] - z) <= 1e-9


def test_ordinal_refs_bind_positionally(spark):
    rows = qsql.Q["sql_ordinal_refs"](spark, SF).collect()
    exp = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "orders").collect():
        exp[r["o_orderpriority"]][0] += 1
        exp[r["o_orderpriority"]][1] += round(r["o_totalprice"] * 100)
    assert {
        r["o_orderpriority"]: [r["n"], r["cents"]] for r in rows
    } == dict(exp)
    # the face's ORDER BY 2 DESC is presentation-only but must parse
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
