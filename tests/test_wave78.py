"""Wave-78 invariants: the graph summary against an adjacency replay
(handshake: sum of degrees = 2x edges), and bag-semantics set ops
against a Counter replay (min/max multiplicity identities)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from dbpedia_spotlight_db_spark.queries import qpipe, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_kg_summary_matches_adjacency_replay(spark):
    edges = [
        (r["src"], r["dst"])
        for r in qpipe._undirected_edges(spark, SF).collect()
    ]
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    m = sum(deg.values()) // 2
    got = qpipe.Q["kg_summary"](spark, SF).collect()[0]
    assert got["n_nodes"] == n
    assert got["n_edges"] == m
    assert got["max_degree"] == max(deg.values())
    assert abs(got["avg_degree"] - round(sum(deg.values()) / n, 6)) < 1e-9
    assert abs(
        got["density"] - round(sum(deg.values()) / (n * (n - 1)), 6)
    ) < 1e-9
    # handshake lemma
    assert sum(deg.values()) == 2 * m


def test_set_ops_all_matches_counter_replay(spark):
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_id", "event_type", "value")
        .collect()
    ):
        key = (r["event_type"], _rnd_away(r["value"] * 100) // 1000)
        if hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0] < "8":
            ca[key] += 1
        else:
            cb[key] += 1
    inter = sum(min(ca[k], cb[k]) for k in ca)
    exc = sum(max(ca[k] - cb[k], 0) for k in ca)
    got = qrel.Q["set_ops_all"](spark, SF).collect()[0]
    assert got["n_a"] == sum(ca.values())
    assert got["n_b"] == sum(cb.values())
    assert got["n_intersect_all"] == inter
    assert got["n_except_all"] == exc
    # bag identity: A splits exactly into the shared and private parts
    assert got["n_a"] == got["n_intersect_all"] + got["n_except_all"]
    assert got["n_intersect_all"] > 0  # real overlap exercised
