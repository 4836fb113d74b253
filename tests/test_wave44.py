"""Wave-44 invariants: the two Arrow-native UDF faces against direct
recounts, text_textrank against a pure-Python two-round damped
PageRank replay (quantized per-term), and ml_perplexity against a
hashlib split + Laplace-smoothed log-likelihood replay."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from dbpedia_spotlight_db_spark.queries import qcorpus, qdata, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_map_arrow_matches_recount(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL AND value >= 0")
        .select("event_type", "value")
        .collect()
    )
    want = Counter(
        (r["event_type"], _rnd_away(r["value"] * 100) // 1000)
        for r in rows
    )
    got = {
        (r["event_type"], r["bucket"]): r["n"]
        for r in qdata.Q["udf_map_arrow"](spark, SF).collect()
    }
    assert got == dict(want)


def test_apply_arrow_matches_recount(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    per: dict[str, list[int]] = {}
    for r in rows:
        per.setdefault(r["event_type"], []).append(
            _rnd_away(r["value"] * 100)
        )
    got = {
        r["event_type"]: r
        for r in qdata.Q["udf_apply_arrow"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for et, cs in per.items():
        g = got[et]
        assert (g["n"], g["sum_cents"], g["min_cents"], g["max_cents"]) == (
            len(cs),
            sum(cs),
            min(cs),
            max(cs),
        )


def test_textrank_matches_power_replay(spark):
    docs = t(spark, SF, "documents").select("doc_id", "text").collect()
    edges: Counter = Counter()
    for r in docs:
        toks = [tk for tk in (r["text"] or "").split(" ") if tk]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                edges[(a, b)] += 1
                edges[(b, a)] += 1
    wd: Counter = Counter()
    for (u, _), w in edges.items():
        wd[u] += w
    p1: Counter = Counter()
    for (u, v), w in edges.items():
        p1[v] += _rnd_away(850000.0 * w / wd[u])
    p1 = Counter({v: 150000 + x for v, x in p1.items()})
    p2: Counter = Counter()
    for (u, v), w in edges.items():
        p2[v] += _rnd_away(0.85 * p1[u] * w / wd[u])
    p2 = {v: 150000 + x for v, x in p2.items()}
    top = sorted(p2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = qcorpus.Q["text_textrank"](spark, SF).collect()
    assert [(r["word"], r["pr_micros"]) for r in got] == top
    for r in got:
        assert abs(r["textrank"] - r["pr_micros"] / 1e6) < 1e-6


def test_perplexity_matches_replay(spark):
    docs = t(spark, SF, "documents").select("doc_id", "text").collect()
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in docs:
        train = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[0] < "8"
        for tk in (r["text"] or "").split(" "):
            if tk:
                (ca if train else cb)[tk] += 1
    na, v = sum(ca.values()), len(ca)
    lp = {
        tk: _rnd_away(1e6 * math.log((c + 1) / (float(na) + v + 1)))
        for tk, c in ca.items()
    }
    lp_oov = _rnd_away(1e6 * math.log(1.0 / (float(na) + v + 1)))
    n_eval = sum(cb.values())
    ll = sum(c * lp.get(tk, lp_oov) for tk, c in cb.items())
    n_oov = sum(c for tk, c in cb.items() if tk not in lp)
    got = qml.Q["ml_perplexity"](spark, SF).collect()[0]
    assert got["n_eval"] == n_eval and got["n_oov"] == n_oov
    assert abs(got["oov_rate"] - n_oov / n_eval) < 1e-6
    want_ppl = math.exp(-(ll / 1e6) / n_eval)
    assert abs(got["ppl"] - want_ppl) < 1e-6 * max(1.0, want_ppl)
    # a unigram LM's perplexity is bounded by the smoothed vocab size
    assert 1.0 <= got["ppl"] <= na + v + 1
