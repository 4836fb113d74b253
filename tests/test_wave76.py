"""Wave-76 invariants: odds ratio + Wald CI against a 2x2 replay
(OR inside its own CI), the KL mix monitor against a share replay
(zero-count convention, total >= 0), and the REBALANCE hint's plan
node plus value neutrality."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"
Z = 1.95996398454005
TARGET = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_odds_ratio_matches_2x2_replay(spark):
    a = b = c = d = 0
    for r in (
        t(spark, SF, "events").select("event_id", "event_type").collect()
    ):
        exposed = (
            hashlib.md5(f"or:{r['event_id']}".encode()).hexdigest()[0]
            < "8"
        )
        y = r["event_type"] == "purchase"
        if exposed and y:
            a += 1
        elif exposed:
            b += 1
        elif y:
            c += 1
        else:
            d += 1
    got = qml.Q["stat_odds_ratio"](spark, SF).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (a, b, c, d)
    orx = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(got["odds_ratio"] - round(orx, 6)) < 1e-6
    assert abs(got["or_lo"] - round(math.exp(math.log(orx) - Z * se), 6)) < 1e-6
    assert abs(got["or_hi"] - round(math.exp(math.log(orx) + Z * se), 6)) < 1e-6
    assert got["or_lo"] <= got["odds_ratio"] <= got["or_hi"]


def test_mix_kl_matches_share_replay(spark):
    counts: dict[str, int] = {}
    for r in t(spark, SF, "documents").select("lang").collect():
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    tot = sum(counts.get(lg, 0) for lg in TARGET)
    terms = {}
    for lg, q in TARGET.items():
        n = counts.get(lg, 0)
        terms[lg] = (
            0
            if n == 0
            else _rnd_away(1e6 * (n / tot) * math.log((n / tot) / q))
        )
    kl_total = round(sum(terms.values()) / 1e6, 6)
    got = {
        r["lang"]: (r["n"], r["p"], r["q"], r["kl_term_us"], r["kl_total"])
        for r in qcorpus.Q["mix_kl_target"](spark, SF).collect()
    }
    assert set(got) == set(TARGET)
    for lg, q in TARGET.items():
        g = got[lg]
        assert g[0] == counts.get(lg, 0)
        assert abs(g[1] - round(counts.get(lg, 0) / tot, 6)) < 1e-9
        assert g[2] == q
        assert g[3] == terms[lg]
        assert abs(g[4] - kl_total) < 1e-9
    # Gibbs: total KL is non-negative (up to quantization noise)
    assert kl_total >= -1e-4


def test_rebalance_hint_plans_and_is_value_neutral(spark):
    df = qsql.Q["sql_rebalance_hint"](spark, SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RebalancePartitions" in opt
    want = {
        r["lang"]: (r["n"], r["chars"])
        for r in t(spark, SF, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
        )
        .collect()
    }
    got = {r["lang"]: (r["n_docs"], r["sum_chars"]) for r in df.collect()}
    assert got == want
