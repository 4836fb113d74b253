"""Wave-127 invariant: TTR/hapax equal the Counter replay per
source, every ratio is in (0, 1], and the fixture is informative
(multiple sources, real hapaxes)."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qcorpus
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_ttr_matches_counter_replay(spark):
    tf = defaultdict(Counter)
    for r in t(spark, SF, "documents").collect():
        for w in (r["text"] or "").split(" "):
            if w:
                tf[r["source"]][w] += 1
    expect = {}
    for src, c in tf.items():
        n_tok = sum(c.values())
        if not n_tok:
            continue
        n_typ = len(c)
        hap = sum(1 for v in c.values() if v == 1)
        expect[src] = (
            n_tok, n_typ, hap,
            round(n_typ / n_tok, 6), round(hap / n_typ, 6),
        )
    got = {
        r["source"]: (
            r["n_tokens"], r["n_types"], r["n_hapax"],
            r["ttr"], r["hapax_share"],
        )
        for r in qcorpus.Q["text_ttr"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) >= 3
    assert all(0 < v[3] <= 1 and 0 <= v[4] <= 1 for v in got.values())
    assert any(v[2] > 0 for v in got.values()), "no hapaxes anywhere?"
