"""Wave-55 invariants: Theil decomposition against an exact-share
replay (including T = between + within, which the engine never
asserts), rich-club phi against a brute-force club enumeration,
Kneser-Ney bigram probabilities against a dict replay, and the
glob scan against a filtered full read (plus the zero-match guard)."""

from __future__ import annotations

import math

from dbpedia_spotlight_db_spark.queries import qadv, qio, qml, qpipe
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_theil_matches_share_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL AND value > 0")
        .select("event_type", "value")
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in rows:
        groups.setdefault(r["event_type"], []).append(
            _rnd_away(r["value"] * 100)
        )
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    mu = s / n
    # exact-share Theil (no quantization) as the semantic reference
    t_total = sum(
        (x / s) * math.log(x / mu) for v in groups.values() for x in v
    )
    t_between = sum(
        (sum(v) / s) * math.log((sum(v) / s) / (len(v) / n))
        for v in groups.values()
    )
    t_within = sum(
        (sum(v) / s)
        * sum((x / sum(v)) * math.log(x / (sum(v) / len(v))) for x in v)
        for v in groups.values()
    )
    assert abs(t_total - (t_between + t_within)) < 1e-9  # the identity
    got = qml.Q["stat_theil"](spark, SF).collect()[0]
    assert got["n_rows"] == n
    # engine quantizes to millis/micros: allow 1e-4 vs the exact replay
    assert abs(got["theil_total"] - t_total) < 1e-4
    assert abs(got["theil_between"] - t_between) < 1e-4
    assert abs(got["theil_within"] - t_within) < 1e-4
    assert (
        abs(
            got["theil_total"]
            - (got["theil_between"] + got["theil_within"])
        )
        < 1e-4
    )


def test_rich_club_matches_enumeration(spark):
    edges = {
        (r["src"], r["dst"])
        for r in qpipe._undirected_edges(spark, SF).collect()
    }
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    thresholds = sorted(
        set(deg.values())
        | {min(deg[a], deg[b]) for a, b in edges}
    )
    want = {}
    for k in thresholds:
        rich = {u for u, d in deg.items() if d > k}
        e2 = sum(1 for a, b in edges if a in rich and b in rich)
        phi = (
            None
            if len(rich) < 2
            else round(e2 / (len(rich) * (len(rich) - 1)), 6)
        )
        want[k] = (len(rich), e2, phi)
    got = {
        r["k"]: (r["n_rich"], r["e2_rich"], r["phi"])
        for r in qpipe.Q["kg_rich_club"](spark, SF).collect()
    }
    assert got == want


def test_kn_bigram_matches_dict_replay(spark):
    docs = t(spark, SF, "documents").select("text").collect()
    cb: dict[tuple, int] = {}
    for r in docs:
        toks = (r["text"] or "").split(" ")
        for a, b in zip(toks, toks[1:]):
            if a and b:
                cb[(a, b)] = cb.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    n1h: dict[str, int] = {}
    n1c: dict[str, int] = {}
    for (a, b), c in cb.items():
        c1[a] = c1.get(a, 0) + c
        n1h[a] = n1h.get(a, 0) + 1
        n1c[b] = n1c.get(b, 0) + 1
    tt = len(cb)
    top = sorted(cb.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {
        (a, b): (
            c,
            c1[a],
            n1h[a],
            n1c[b],
            round(
                (c - 0.75) / c1[a] + 0.75 * n1h[a] / c1[a] * (n1c[b] / tt),
                6,
            ),
        )
        for (a, b), c in top
    }
    got = {
        (r["w1"], r["w2"]): (r["c12"], r["c1"], r["n1h"], r["n1c"], r["p_kn"])
        for r in qadv.Q["text_kn_bigram"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, g in got.items():
        w = want[k]
        assert g[:4] == w[:4]
        assert abs(g[4] - w[4]) < 1e-9
    # the discounted term alone is strictly below the smoothed prob
    # (interpolated KN adds positive backoff mass on top of it)
    for (a, b), (c, ca, nh, nc, p) in got.items():
        assert (c - 0.75) / ca < p


def test_scan_glob_matches_filtered_full_read(spark):
    from pyspark.sql import functions as F

    base = (
        t(spark, SF, "documents")
        .filter(F.col("lang").like("e%"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("ids"),
            F.sum("n_chars").alias("chars"),
        )
    )
    want = {
        r["lang"]: (r["n"], r["ids"], r["chars"]) for r in base.collect()
    }
    got = {
        r["lang"]: (r["n_docs"], r["id_sum"], r["sum_chars"])
        for r in qio.Q["scan_glob"](spark, SF).collect()
    }
    assert got == want and len(got) >= 2  # en + es in the fixture
