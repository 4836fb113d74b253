"""Wave-139 invariants: the confusion matrix sums to the corpus
and reports the heuristic's real (poor) behavior on the synthetic
texts honestly: only en ever scores (the synthetic fr/es/de shards
carry no marker stopwords), en's diagonal dominates its row, zh is
never predicted, and every label row is present."""

from __future__ import annotations

from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qdata
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_langid_confusion_structure(spark):
    rows = qdata.Q["text_langid_confusion"](spark, SF).collect()
    n_docs = t(spark, SF, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    mat = defaultdict(dict)
    for r in rows:
        mat[r["lang"]][r["guess"]] = r["n"]
    # en is the only language whose markers fire on the synthetic
    # texts — its diagonal must exist and dominate its row
    en = mat["en"]
    assert en.get("en", 0) > 0
    assert en["en"] >= max(
        (v for g, v in en.items() if g != "en"), default=0
    )
    # the non-en shards carry no marker stopwords: their rows land
    # entirely off-diagonal (the report that disqualifies the
    # heuristic for this corpus — which is the face's point)
    for lang in ("fr", "es", "de", "zh"):
        assert lang in mat and mat[lang]
        assert mat[lang].get(lang, 0) == 0
    # zh can never be predicted (no zh markers by design)
    assert all(r["guess"] != "zh" for r in rows)
