"""Wave-109 invariants: self-BLEU equals a pure-Python BLEU-2 replay
(clipped counts, brevity penalty, geometric mean) on every adjacent
pair; Krippendorff's alpha equals the coincidence-matrix replay with
single-rating units excluded from both sides."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qdata, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_self_bleu_matches_python_replay(spark):
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in t(spark, SF, "documents").collect()
        if r["text"] is not None
    }
    ids = sorted(docs)
    expect = {}
    for cand, ref in zip(ids, ids[1:]):
        ct, rt = docs[cand], docs[ref]
        c1g, r1g = Counter(ct), Counter(rt)
        c2g = Counter(zip(ct, ct[1:]))
        r2g = Counter(zip(rt, rt[1:]))
        c1 = sum(min(c, r1g[g]) for g, c in c1g.items())
        t1 = sum(c1g.values())
        c2 = sum(min(c, r2g[g]) for g, c in c2g.items())
        t2 = sum(c2g.values())
        if c1 == 0 or c2 == 0 or t2 == 0:
            b = 0
        else:
            bp = 1.0 if len(ct) >= len(rt) else math.exp(
                1.0 - len(rt) / len(ct)
            )
            b = round(
                1000000.0
                * bp
                * math.exp(0.5 * (math.log(c1 / t1) + math.log(c2 / t2)))
            )
        expect[(cand, ref)] = (c1, t1, c2, t2, b)
    got = {
        (r["cand_id"], r["ref_id"]): (
            r["c1"], r["t1"], r["c2"], r["t2"], r["bleu_micros"]
        )
        for r in qdata.Q["text_self_bleu"](spark, SF).collect()
    }
    assert got == expect


def test_krippendorff_matches_replay(spark):
    units = defaultdict(Counter)
    for r in t(spark, SF, "events").collect():
        if r["user_id"] is None or r["value"] is None:
            continue
        units[r["user_id"]][round(r["value"] * 100) // 2000] += 1
    keep = {u: c for u, c in units.items() if sum(c.values()) >= 2}
    nn = sum(sum(c.values()) for c in keep.values())
    do_mic = sum(
        round(
            1000000.0
            * (sum(c.values()) ** 2 - sum(x * x for x in c.values()))
            / (sum(c.values()) - 1)
        )
        for c in keep.values()
    )
    pooled = Counter()
    for c in keep.values():
        pooled.update(c)
    de_num = nn * nn - sum(x * x for x in pooled.values())
    alpha = round(1.0 - (nn - 1) * (do_mic / 1e6) / de_num, 6)
    row = qml.Q["ml_krippendorff"](spark, SF).collect()[0]
    assert row["n_units"] == len(keep)
    assert row["n_ratings"] == nn
    assert row["do_mic"] == do_mic
    assert row["de_num"] == de_num
    assert abs(row["alpha"] - alpha) <= 1e-9
