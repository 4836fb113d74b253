"""Wave-107 invariants: the SQL PIVOT clause equals a Counter replay
including the {value}_{alias} naming; quantified LIKE equals the
expanded boolean spelling; Jonckheere's 2J equals a brute-force
pairwise comparison count (concordant*2 + ties)."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from dbpedia_spotlight_db_spark.queries import qadv, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_pivot_clause_matches_replay_and_naming(spark):
    df = qsql.Q["sql_pivot_clause"](spark, SF)
    assert sorted(df.columns) == sorted(
        ["o_orderpriority", "F_n", "F_cents", "O_n", "O_cents",
         "P_n", "P_cents"]
    )
    agg = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "orders").collect():
        cell = agg[(r["o_orderpriority"], r["o_orderstatus"])]
        cell[0] += 1
        cell[1] += round(r["o_totalprice"] * 100)
    for r in df.collect():
        for st in ("F", "O", "P"):
            key = (r["o_orderpriority"], st)
            if key in agg:
                assert (r[f"{st}_n"], r[f"{st}_cents"]) == tuple(agg[key])
            else:
                assert r[f"{st}_n"] is None and r[f"{st}_cents"] is None


def test_like_quantified_equals_expansion(spark):
    for r in qsql.Q["sql_like_quantified"](spark, SF).collect():
        nm = r["p_name"]
        assert r["any_color"] == (("green" in nm) or ("blue" in nm))
        assert r["all_marks"] == (("s" in nm) and (" " in nm))
        assert r["no_vowel_ae"] == (not (("a" in nm) or ("e" in nm)))


def test_jonckheere_matches_bruteforce(spark):
    groups = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None:
            groups[r["event_type"]].append(round(r["value"] * 100))
    types = sorted(groups)
    j2 = 0
    for a, b in combinations(types, 2):
        for x in groups[a]:
            for y in groups[b]:
                if x < y:
                    j2 += 2
                elif x == y:
                    j2 += 1
    row = qadv.Q["stat_jonckheere"](spark, SF).collect()[0]
    assert row["k"] == len(types)
    assert row["n_total"] == sum(len(v) for v in groups.values())
    assert row["j_doubled"] == j2
