"""Invariant tests for the second graph wave (HITS, neighborhood
Jaccard). The oracle gate pins cross-engine value equality; these pin
the graph semantics: normalization, degree arithmetic, and replay
against an adjacency dict built independently from the edge list.
"""

from __future__ import annotations

import math

from dbpedia_spotlight_db_spark.queries import qpipe

SF = "/root/testdata/sf0.001"


def _adj(spark):
    adj = {}
    for r in qpipe._undirected_edges(spark, SF).collect():
        adj.setdefault(r.src, set()).add(r.dst)
    return adj


def test_hits_matches_degree_replay(spark):
    got = {r.uri: (r.hub, r.auth) for r in qpipe.Q["kg_hits"](spark, SF).collect()}
    pairs = [(r.uri_a, r.uri_b) for r in qpipe._entity_pairs(spark, SF).collect()]
    indeg = {}
    for _, b in pairs:
        indeg[b] = indeg.get(b, 0) + 1
    hub = {}
    for a, b in pairs:
        hub[a] = hub.get(a, 0) + indeg.get(b, 0)
    amax, hmax = max(indeg.values()), max(hub.values())
    nodes = set(
        r.uri for r in qpipe._doc_entities(spark, SF).select("uri").distinct().collect()
    )
    assert set(got) == nodes
    for u in nodes:
        eh, ea = hub.get(u, 0) / hmax, indeg.get(u, 0) / amax
        assert math.isclose(got[u][0], round(eh, 6), abs_tol=1e-6), u
        assert math.isclose(got[u][1], round(ea, 6), abs_tol=1e-6), u
    # max-normalization: the best hub and best authority score exactly 1
    assert max(v[0] for v in got.values()) == 1.0
    assert max(v[1] for v in got.values()) == 1.0


def test_node_sim_is_neighborhood_jaccard(spark):
    adj = _adj(spark)
    got = qpipe.Q["kg_node_sim"](spark, SF).collect()
    pairs = {
        (r.uri_a, r.uri_b) for r in qpipe._entity_pairs(spark, SF).collect()
    }
    # one row per connected pair, oriented a < b
    assert {(r.uri_a, r.uri_b) for r in got} == pairs
    for r in got:
        na, nb = adj[r.uri_a], adj[r.uri_b]
        common = len(na & nb)
        assert r.n_common == common, (r.uri_a, r.uri_b)
        expect = common / len(na | nb)
        assert math.isclose(r.jaccard, round(expect, 6), abs_tol=1e-6)
        assert r.uri_a < r.uri_b


def test_ppr_mass_conservation_and_seed_dominance(spark):
    """2-round PPR from a single seed: total rank mass stays 1
    (teleport + spread conserve probability on a graph with no
    dangling nodes — every node in e has degree >= 1), and the seed
    keeps the largest rank at this damping."""
    from dbpedia_spotlight_db_spark.queries import qpipe

    got = qpipe.Q["kg_ppr"](spark, "/root/testdata/sf0.001").toPandas()
    assert abs(got["ppr"].sum() - 1.0) < 1e-4
    seed = qpipe._undirected_edges(spark, "/root/testdata/sf0.001").agg(
        {"src": "min"}
    ).collect()[0][0]
    top = got.sort_values("ppr", ascending=False).iloc[0]
    assert top["uri"] == seed
