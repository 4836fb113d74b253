"""Wave-128 invariants: CLV matches the cohort replay; age-0
revenue is positive for every cohort; cumulative revenue is
nondecreasing; the cells partition the corpus revenue exactly."""

from __future__ import annotations

from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_clv_matches_cohort_replay(spark):
    orders = [
        (r["o_custkey"], r["o_orderdate"].year,
         round(r["o_totalprice"] * 100))
        for r in t(spark, SF, "orders").collect()
    ]
    first = {}
    for ck, yr, _ in orders:
        first[ck] = min(first.get(ck, yr), yr)
    size = defaultdict(int)
    for ck in first:
        size[first[ck]] += 1
    cell = defaultdict(int)
    for ck, yr, c in orders:
        cell[(first[ck], yr - first[ck])] += c
    expect = {}
    for cohort in {c for c, _ in cell}:
        cum = 0
        for age in sorted(a for c, a in cell if c == cohort):
            cum += cell[(cohort, age)]
            expect[(cohort, age)] = (
                size[cohort], cell[(cohort, age)], cum,
                round(cum / 100.0 / size[cohort], 6),
            )
    got = {
        (r["cohort"], r["age"]): (
            r["cohort_size"], r["rev_cents"], r["cum_cents"], r["clv"],
        )
        for r in qstats.Q["customer_clv"](spark, SF).collect()
    }
    assert got == expect
    cohorts = {c for c, _ in got}
    assert len(cohorts) >= 2
    for c in cohorts:
        assert got[(c, 0)][1] > 0, "age-0 revenue must be positive"
        ages = sorted(a for cc, a in got if cc == c)
        cums = [got[(c, a)][2] for a in ages]
        assert cums == sorted(cums)
    total = sum(v[1] for v in got.values())
    assert total == sum(c for _, _, c in orders)
