"""Wave-136 invariant: MATTR equals the sliding-window replay
exactly (20-token windows, distinct counts, micros-quantized doc
means), short docs drop, and every source MATTR is in (0, 1]."""

from __future__ import annotations

import math
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qcorpus
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"

W = 20


def _rnd(x: float) -> int:
    return math.floor(x + 0.5)


def test_mattr_matches_sliding_replay(spark):
    per_src = defaultdict(lambda: [0, 0])
    n_short = 0
    for r in t(spark, SF, "documents").collect():
        toks = [w for w in (r["text"] or "").split(" ") if w]
        if len(toks) < W:
            n_short += 1
            continue
        ttrs = [
            len(set(toks[i : i + W])) / float(W)
            for i in range(len(toks) - W + 1)
        ]
        mic = _rnd(1e6 * (sum(ttrs) / len(ttrs)))
        per_src[r["source"]][0] += 1
        per_src[r["source"]][1] += mic
    got = {
        r["source"]: (r["n_docs"], r["sum_mattr_mic"], r["mattr"])
        for r in qcorpus.Q["text_mattr"](spark, SF).collect()
    }
    assert set(got) == set(per_src)
    for src, (n, s) in per_src.items():
        gn, gs, gm = got[src]
        assert (gn, gs) == (n, s)
        assert abs(gm - round(s / 1e6 / n, 6)) <= 1e-9
        assert 0 < gm <= 1.0
