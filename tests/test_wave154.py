"""Wave-154 invariants: Bartels' doubled-rank NUM/DEN replay exactly
(including the doubled-mean = n+1 identity), the iid fixture sits at
RVN ~ 2, and the multi-column SCALAR_ITER UDF matches the row
contract with tuple-batched inputs."""

from __future__ import annotations

import re
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qdata, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_bartels_matches_replay(spark):
    cents = defaultdict(int)
    for r in t(spark, SF, "orders").collect():
        d = (
            int(r["o_orderdate"].timestamp() * 1_000_000)
            // 86_400_000_000
        )
        cents[d] += round(r["o_totalprice"] * 100)
    days = sorted(cents)
    n = len(days)
    vals = sorted(cents.values())
    # doubled midrank: 2*rank + ties - 1 (rank = 1 + #smaller)
    first = {}
    count = defaultdict(int)
    for i, v in enumerate(vals):
        if v not in first:
            first[v] = i + 1
        count[v] += 1
    dr = {
        d: 2 * first[cents[d]] + count[cents[d]] - 1 for d in days
    }
    assert sum(dr.values()) == n * (n + 1)  # doubled ranks sum
    num = sum(
        (dr[days[i]] - dr[days[i + 1]]) ** 2 for i in range(n - 1)
    )
    den = sum((dr[d] - (n + 1)) ** 2 for d in days)
    got = qstats.Q["stat_bartels_rank"](spark, SF).collect()[0]
    assert (got["n"], got["num"], got["den"]) == (n, num, den)
    rvn = num / den
    assert abs(got["rvn"] - round(rvn, 6)) <= 1e-9
    # iid daily revenue: RVN near 2, |z| inside the null bulk
    assert 1.5 < got["rvn"] < 2.5
    assert got["random_ok"] is True


def test_scalar_iter_multi_matches_rows(spark):
    vowel = re.compile(r"[aeiou]")
    want = {}
    for r in t(spark, SF, "documents").collect():
        txt = r["text"]
        if txt is None:
            want[r["doc_id"]] = None
        else:
            want[r["doc_id"]] = (
                len(vowel.findall(txt.lower())) + r["n_chars"] % 7
            )
    got = {
        r["doc_id"]: r["score"]
        for r in qdata.Q["udf_scalar_iter_multi"](spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0
