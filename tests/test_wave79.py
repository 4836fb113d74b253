"""Wave-79 invariants: the wedge degree cap (VERDICT r4 "What's
wrong" #1). ``_capped_edges`` must (a) be a no-op on the hub-free
fixture graph — the oracle gate already proves the capped faces stay
hash-green there — and (b) actually BIND on a synthetic hub graph:
the induced deg <= cap subgraph drops every hub-incident edge while
keeping the non-hub clique intact, so wedge fan-out is bounded by
cap^2 per key regardless of the real degree distribution."""

from __future__ import annotations

from dbpedia_spotlight_db_spark.queries import qpipe

SF = "/root/testdata/sf0.001"


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src string, dst string",
    )


def test_capped_edges_noop_on_hubfree_fixture(spark):
    e = qpipe._undirected_edges(spark, SF)
    ce = qpipe._capped_edges(e)
    assert ce.count() == e.count()
    # and the fixture really is hub-free, i.e. the cap has headroom
    max_deg = (
        e.groupBy("src").count().agg({"count": "max"}).collect()[0][0]
    )
    assert max_deg <= qpipe.KG_WEDGE_DEG_CAP


def test_capped_edges_drops_hub_incident_edges(spark):
    # star: hub h connected to s0..s9, plus a disjoint triangle.
    star = [("h", f"s{i}") for i in range(10)]
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    e = _edges_df(spark, star + tri)
    ce = qpipe._capped_edges(e, max_deg=3)
    kept = {(r.src, r.dst) for r in ce.collect()}
    # every hub-incident edge gone (deg(h)=10 > 3), triangle intact
    assert not any("h" in p for p in kept)
    assert kept == {
        ("a", "b"), ("b", "a"), ("b", "c"),
        ("c", "b"), ("a", "c"), ("c", "a"),
    }


def test_capped_edges_keeps_boundary_degree(spark):
    # deg exactly == cap is KEPT (<=, not <): path x-y plus y-z
    e = _edges_df(spark, [("x", "y"), ("y", "z")])
    ce = qpipe._capped_edges(e, max_deg=2)
    assert ce.count() == 4
