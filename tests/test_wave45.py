"""Wave-45 invariants: local bridges against a networkx-free triangle
replay, Brown-Forsythe W against the textbook formula on exact
deviations, agg_mode against a Counter argmax with the same tie rule,
and csv_permissive against the md5-coin replay (including that the
corrupt slice is actually non-empty — the column-pruning trap this
face exists to document)."""

from __future__ import annotations

import math
from collections import Counter

from dbpedia_spotlight_db_spark.queries import qgraph, qio, qml, qstats
from dbpedia_spotlight_db_spark.queries.common import t
from dbpedia_spotlight_db_spark.queries.qpipe import _entity_pairs

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_local_bridges_matches_replay(spark):
    pairs = {
        (r["uri_a"], r["uri_b"])
        for r in _entity_pairs(spark, SF).collect()
    }
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    bridges = sum(1 for a, b in pairs if not (adj[a] & adj[b] - {a, b}))
    got = qgraph.Q["kg_local_bridges"](spark, SF).collect()[0]
    assert got["n_edges"] == len(pairs)
    assert got["n_bridges"] == bridges
    assert abs(got["bridge_ratio"] - bridges / len(pairs)) < 1e-6


def test_levene_matches_formula(spark):
    import numpy as np

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
    # exact quarter-cent deviations from the type-7 median
    zs: dict[str, list[int]] = {}
    for g, cs in per.items():
        med4 = _rnd_away(4 * float(np.percentile(np.array(cs, float), 50)))
        zs[g] = [abs(4 * c - med4) for c in cs]
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    s = sum(sum(v) for v in zs.values())
    q = sum(sum(x * x for x in v) for v in zs.values())
    bsum = sum(_rnd_away(1.0 * sum(v) ** 2 / len(v)) for v in zs.values())
    want = ((n - k) * (bsum - round(1.0 * s * s / n))) / (
        (k - 1.0) * (q - bsum)
    )
    got = qml.Q["stat_levene"](spark, SF).collect()[0]
    assert got["k"] == k and got["n"] == n
    assert abs(got["w_stat"] - want) < 1e-5


def test_mode_matches_counter_argmax(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    per: dict[str, Counter] = {}
    for r in rows:
        per.setdefault(r["event_type"], Counter())[
            _rnd_away(r["value"] * 100) // 1000
        ] += 1
    got = {r["event_type"]: r for r in qstats.Q["agg_mode"](spark, SF).collect()}
    assert set(got) == set(per)
    for et, c in per.items():
        bucket, cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (got[et]["mode_bucket"], got[et]["mode_count"]) == (
            bucket,
            cnt,
        )


def test_csv_permissive_matches_coin_replay(spark):
    import hashlib

    rows = (
        t(spark, SF, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    n_bad = n_clean = clean_cents = 0
    for r in rows:
        if hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[0] < "2":
            n_bad += 1
        else:
            n_clean += 1
            clean_cents += _rnd_away(r["o_totalprice"] * 100)
    got = qio.Q["csv_permissive"](spark, SF).collect()[0]
    assert got["n_corrupt"] == n_bad
    assert got["n_clean"] == n_clean
    assert got["clean_cents"] == clean_cents
    # the face exists to catch the pruning trap: the corrupt slice
    # must be genuinely exercised, not vacuously zero
    assert n_bad > 0
