"""Wave-34 invariants: random walks only traverse real edges and are
deterministic, negative samples never collide with positive edges,
and conductance reconciles against directly-counted cuts/volumes."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qgraph
from dbpedia_spotlight_db_spark.queries.qpipe import (
    _entity_pairs,
    _undirected_edges,
)

SF = "/root/testdata/sf0.001"


def test_walks_traverse_real_edges_and_are_deterministic(spark):
    walks = qgraph.Q["kg_walks"](spark, SF).collect()
    assert walks
    edges = {
        (r["src"], r["dst"]) for r in _undirected_edges(spark, SF).collect()
    }
    starts = [w["start_uri"] for w in walks]
    assert len(starts) == len(set(starts))  # one walk per start node
    for w in walks:
        assert (w["start_uri"], w["v1"]) in edges
        assert (w["v1"], w["v2"]) in edges
        assert (w["v2"], w["v3"]) in edges
    again = qgraph.Q["kg_walks"](spark, SF).collect()
    assert sorted(map(tuple, walks)) == sorted(map(tuple, again))


def test_negative_samples_disjoint_from_positives(spark):
    rows = qgraph.Q["kg_negative_sample"](spark, SF).collect()
    pos = {(r["uri_a"], r["uri_b"]) for r in rows if r["label"] == 1}
    neg = {(r["uri_a"], r["uri_b"]) for r in rows if r["label"] == 0}
    want_pos = {
        (r["uri_a"], r["uri_b"]) for r in _entity_pairs(spark, SF).collect()
    }
    assert pos == want_pos
    assert not (pos & neg)
    assert neg  # corruption produced at least one usable negative
    assert len(neg) <= len(pos)  # one corruption per positive, deduped
    nodes = {u for ab in want_pos for u in ab}
    for a, b in neg:
        assert a < b  # normalized orientation
        assert a in nodes and b in nodes


def test_conductance_reconciles(spark):
    rows = qgraph.Q["kg_conductance"](spark, SF).collect()
    assert rows
    p = _entity_pairs(spark, SF)
    e = _undirected_edges(spark, SF)
    two_m = e.count()
    assert sum(r["vol"] for r in rows) == two_m
    for r in rows:
        assert 0 <= r["cut"] <= r["vol"]
        if r["conductance"] is not None:
            assert 0.0 <= r["conductance"] <= 1.0
    # every cross-community edge credits exactly two communities
    from dbpedia_spotlight_db_spark.queries.qpipe import (
        _doc_entities,
        _lpa_two_rounds,
    )

    comm = {
        r["uri"]: r["community"]
        for r in _lpa_two_rounds(
            e, _doc_entities(spark, SF).select("uri").distinct()
        ).collect()
    }
    n_cross = sum(
        1
        for r in p.collect()
        if comm[r["uri_a"]] != comm[r["uri_b"]]
    )
    assert sum(r["cut"] for r in rows) == 2 * n_cross
