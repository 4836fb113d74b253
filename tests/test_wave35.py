"""Wave-35 invariants: BPE pair counts vs a pure-Python recount, JSD
bounds + brute-force proximity, the seasonal decomposition identity,
and VoID stats reconciliation against direct counts."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qgraph, qstats
from dbpedia_spotlight_db_spark.queries.common import t
from dbpedia_spotlight_db_spark.queries.qpipe import (
    _doc_entities,
    _entity_pairs,
)

SF = "/root/testdata/sf0.001"


def test_bpe_merge_matches_python_recount(spark):
    rows = qcorpus.Q["text_bpe_merge"](spark, SF).collect()
    assert len(rows) == 20
    texts = [r["text"] for r in t(spark, SF, "documents").select("text").collect()]
    cnt = Counter()
    for txt in texts:
        for tk in (txt or "").split(" "):
            for i in range(len(tk) - 1):
                cnt[tk[i : i + 2]] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["pair"], r["c"]) for r in sorted(rows, key=lambda r: r["rnk"])]
    assert got == want


def test_jsd_bounded_and_near_bruteforce(spark):
    rows = qcorpus.Q["text_jsd"](spark, SF).collect()
    assert rows
    docs = t(spark, SF, "documents").select("source", "text").collect()
    per_src = {}
    for r in docs:
        c = per_src.setdefault(r["source"], Counter())
        c.update((r["text"] or "").split(" "))
    tot = Counter()
    for c in per_src.values():
        tot.update(c)
    n_tot = sum(tot.values())
    for row in rows:
        assert row["jsd"] is not None
        # JSD in nats is bounded by ln 2
        assert -1e-3 <= row["jsd"] <= math.log(2) + 1e-3
        cs = per_src[row["source"]]
        ns = sum(cs.values())
        assert row["n_tokens"] == ns
        nr = n_tot - ns
        jsd = 0.0
        for tk in tot:
            p = cs.get(tk, 0) / ns
            q = (tot[tk] - cs.get(tk, 0)) / nr
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log(q / m)
        # micros quantization: per-term |error| <= 0.5e-6 summed over
        # the support
        assert abs(row["jsd"] - jsd) < 2e-3


def test_seasonal_decomposition_identity(spark):
    rows = qstats.Q["events_seasonal"](spark, SF).collect()
    assert rows
    full = [r for r in rows if r["trend"] is not None]
    assert full  # the fixture spans well over 7 days
    for r in full:
        assert r["seasonal"] is not None and r["residual"] is not None
        # total = trend + seasonal + residual (up to round-6 noise)
        assert abs(r["total"] - (r["trend"] + r["seasonal"] + r["residual"])) < 5e-6
    # edge days have no full centered window
    days = sorted(r["day"] for r in rows)
    partial = {r["day"] for r in rows if r["trend"] is None}
    assert set(days[:3]) <= partial and set(days[-3:]) <= partial


def test_void_stats_reconcile(spark):
    rows = {r["pred"]: r for r in qgraph.Q["kg_void_stats"](spark, SF).collect()}
    assert set(rows) == {
        "dbo:mentions",
        "dbo:cooccursWith",
        "dbo:inLanguage",
        "dbo:fromSource",
    }
    n_docs = t(spark, SF, "documents").count()
    de = _doc_entities(spark, SF)
    assert rows["dbo:inLanguage"]["n_triples"] == n_docs
    assert rows["dbo:fromSource"]["n_triples"] == n_docs
    assert rows["dbo:mentions"]["n_triples"] == de.count()
    assert rows["dbo:mentions"]["n_subjects"] == de.select("doc_id").distinct().count()
    assert rows["dbo:cooccursWith"]["n_triples"] == _entity_pairs(spark, SF).count()
    assert (
        rows["dbo:inLanguage"]["n_objects"]
        == t(spark, SF, "documents").select("lang").distinct().count()
    )
