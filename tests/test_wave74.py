"""Wave-74 invariants: Cp/Cpk against a moments replay (Cpk <= Cp
always — the centering penalty), the two-proportion z against a coin
replay, column DEFAULTs against the fill rule, and Good-Turing
against a frequency-spectrum replay (P0 equals the hapax share)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_cpk_matches_moments_and_is_centered_penalty(spark):
    per_type: dict[str, list] = {}
    for r in (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    ):
        per_type.setdefault(r["event_type"], []).append(
            _rnd_away(r["value"] * 100)
        )
    got = {
        r["event_type"]: (r["n"], r["cp"], r["cpk"])
        for r in qml.Q["stat_cpk"](spark, SF).collect()
    }
    assert set(got) == set(per_type)
    for et, cs in per_type.items():
        n, s1, s2 = len(cs), sum(cs), sum(c * c for c in cs)
        sd = math.sqrt((n * s2 - s1 * 1.0 * s1) / (n * (n - 1.0)))
        mean = s1 / n
        cp = (50000 - 1000) / 6.0 / sd
        cpk = min(50000 - mean, mean - 1000) / 3.0 / sd
        g = got[et]
        assert g[0] == n
        assert abs(g[1] - round(cp, 6)) < 1e-6
        assert abs(g[2] - round(cpk, 6)) < 1e-6
        assert g[2] <= g[1] + 1e-9  # centering can only cost


def test_prop_ztest_matches_coin_replay(spark):
    n1 = k1 = n2 = k2 = 0
    for r in (
        t(spark, SF, "events").select("event_id", "event_type").collect()
    ):
        ina = (
            hashlib.md5(f"pz:{r['event_id']}".encode()).hexdigest()[0]
            < "8"
        )
        y = 1 if r["event_type"] == "purchase" else 0
        if ina:
            n1 += 1
            k1 += y
        else:
            n2 += 1
            k2 += y
    pool = (k1 + k2) / (n1 + n2)
    z = (k1 / n1 - k2 / n2) / math.sqrt(
        pool * (1 - pool) * (1 / n1 + 1 / n2)
    )
    got = qml.Q["stat_prop_ztest"](spark, SF).collect()[0]
    assert (got["n1"], got["k1"], got["n2"], got["k2"]) == (n1, k1, n2, k2)
    assert abs(got["z"] - round(z, 6)) < 1e-9


def test_column_default_fill_rule(spark):
    want: dict[str, list] = {}
    for r in (
        t(spark, SF, "documents").select("doc_id", "source").collect()
    ):
        v = want.setdefault(r["source"], [0, 0, 0])
        v[0] += 1
        if r["doc_id"] % 3 == 0:
            v[2] += r["doc_id"] % 100
        else:
            v[1] += 1  # defaulted
            v[2] += 42
    got = {
        r["source"]: (r["n"], r["n_defaulted"], r["score_sum"])
        for r in qsql.Q["sql_column_default"](spark, SF).collect()
    }
    assert got == {s: tuple(v) for s, v in want.items()}
    assert any(v[1] > 0 for v in got.values())


def test_good_turing_matches_spectrum_replay(spark):
    tf: dict[str, int] = {}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("text")
        .collect()
    ):
        for w in r["text"].split(" "):
            if w:
                tf[w] = tf.get(w, 0) + 1
    n_tokens = sum(tf.values())
    f1 = sum(1 for c in tf.values() if c == 1)
    f2 = sum(1 for c in tf.values() if c == 2)
    got = qcorpus.Q["text_good_turing"](spark, SF).collect()[0]
    assert got["n_tokens"] == n_tokens
    assert got["n_types"] == len(tf)
    assert got["f1"] == f1 and got["f2"] == f2
    assert abs(got["p0_unseen"] - round(f1 / n_tokens, 6)) < 1e-9
    # the synthetic vocab has no hapaxes (every word recurs), so the
    # estimator's P0 = 0 — the closed-vocabulary reading, pinned
    assert 0.0 <= got["p0_unseen"] < 1.0
    assert (got["p0_unseen"] == 0.0) == (f1 == 0)
