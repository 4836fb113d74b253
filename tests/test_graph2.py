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


def test_ppr_frontier_cap_bounds_hub_seed(spark):
    """A hub seed whose 1-hop ball exceeds the frontier cap: the rank
    relation after each round (and thus the result) must hold at most
    k rows, and truncation must keep the HIGHEST-contribution nodes —
    the bounded-broadcast invariant that makes sparse PPR safe when
    the seed is a celebrity entity at web scale."""
    k = 5
    hub = "a_hub"  # lexicographic min -> the seed
    spokes = [f"s{i:02d}" for i in range(20)]
    rows = [(hub, s) for s in spokes] + [(s, hub) for s in spokes]
    # one spoke also gets a heavy clique so contributions differ
    e = spark.createDataFrame(rows, ["src", "dst"])
    got = qpipe._ppr_two_rounds(e, k=k).toPandas()
    assert len(got) <= k
    # the seed re-enters via teleport + spoke back-edges and must
    # dominate; spokes are symmetric so the tie-break picks the
    # lexicographically smallest k-1 of them
    top = got.sort_values("r", ascending=False).iloc[0]
    assert top["uri"] == hub
    kept_spokes = sorted(u for u in got["uri"] if u != hub)
    assert kept_spokes == sorted(spokes)[: k - 1]


def test_ppr_uncapped_fixture_unchanged_by_cap(spark):
    """At fixture scale the frontier never reaches PPR_FRONTIER_K, so
    the capped query must equal the uncapped computation exactly —
    the cap is a bound, not a semantics change."""
    e = qpipe._undirected_edges(spark, SF)
    capped = qpipe._ppr_two_rounds(e, k=qpipe.PPR_FRONTIER_K).toPandas()
    huge = qpipe._ppr_two_rounds(e, k=10**9).toPandas()
    a = capped.sort_values("uri").reset_index(drop=True)
    b = huge.sort_values("uri").reset_index(drop=True)
    assert a.equals(b)
