"""Wave-120 invariant: the margin report equals the exact Python
replay (rounded centroids, per-component micros squares, integer
sums), the heavily-overlapping synthetic labels produce real violations
(the hard-negative miner has work to do), and n sums to the
corpus."""

from __future__ import annotations

import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qembed
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_margin_matches_exact_replay(spark):
    vecs = [
        (r["vec_id"], r["label"], [float(x) for x in r["embedding"]])
        for r in t(spark, SF, "embeddings").collect()
    ]
    bylab = defaultdict(list)
    for _, lab, v in vecs:
        bylab[lab].append(v)
    cents = {
        lab: [
            round(sum(v[j] for v in vs) / len(vs), 6)
            for j in range(64)
        ]
        for lab, vs in bylab.items()
    }
    expect = defaultdict(lambda: [0, 0, 0])
    for _, lab, v in vecs:
        d2 = {
            cl: sum(
                _rnd(1e6 * (v[j] - c[j]) * (v[j] - c[j]))
                for j in range(64)
            )
            for cl, c in cents.items()
        }
        own = d2[lab]
        other = min(d for cl, d in d2.items() if cl != lab)
        expect[lab][0] += 1
        expect[lab][1] += other - own < 0
        expect[lab][2] += other - own
    got = {
        r["label"]: [r["n"], r["n_violations"], r["sum_margin_mic"]]
        for r in qembed.Q["embed_margin"](spark, SF).collect()
    }
    assert got == {k: list(v) for k, v in expect.items()}
    assert sum(v[0] for v in got.values()) == len(vecs)
    # informative fixture: margins are non-trivial (the synthetic
    # labels overlap heavily, so violations MUST exist)
    assert sum(v[1] for v in got.values()) > 0
    assert any(v[2] != 0 for v in got.values())
