"""Wave-124 invariants: the systematic sample equals the replayed
stride over the md5 permutation (exact membership via id sums) and
its size is exactly ceil(n/10); the MDE closed form matches the
replay and the A/A split is correctly reported as NOT powered."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qfeat, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_systematic_sample_matches_stride_replay(spark):
    docs = [
        (r["doc_id"], r["lang"])
        for r in t(spark, SF, "documents").collect()
    ]
    order = sorted(
        docs,
        key=lambda d: (
            hashlib.md5(f"sys:{d[0]}".encode()).hexdigest(),
            d[0],
        ),
    )
    kept = order[::10]  # rn % 10 == 1 -> positions 1, 11, 21, ...
    expect = defaultdict(lambda: [0, 0])
    for did, lang in kept:
        expect[lang][0] += 1
        expect[lang][1] += did
    got = {
        r["lang"]: [r["n_kept"], r["id_sum"]]
        for r in qfeat.Q["sample_systematic"](spark, SF).collect()
    }
    assert got == dict(expect)
    assert sum(v[0] for v in got.values()) == math.ceil(len(docs) / 10)


def test_power_mde_matches_replay(spark):
    n = {0: 0, 1: 0}
    x = {0: 0, 1: 0}
    for r in t(spark, SF, "events").collect():
        g = (
            1
            if hashlib.md5(f"pw:{r['event_id']}".encode()).hexdigest()[0]
            < "8"
            else 0
        )
        n[g] += 1
        x[g] += r["event_type"] == "purchase"
    p0, p1 = x[0] / n[0], x[1] / n[1]
    mde = round(
        (1.9599639845400545 + 0.8416212335729143)
        * math.sqrt(p0 * (1 - p0) / n[0] + p1 * (1 - p1) / n[1]),
        6,
    )
    got = qstats.Q["stat_power_mde"](spark, SF).collect()[0]
    assert (got["n0"], got["n1"], got["x0"], got["x1"]) == (
        n[0], n[1], x[0], x[1],
    )
    assert abs(got["mde"] - mde) <= 1e-9
    assert got["powered"] == (abs(round(p1 - p0, 6)) > mde)
    # an A/A hash split should essentially never clear its own MDE
    assert got["powered"] is False
