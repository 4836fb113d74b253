"""Invariant tests for the wave-14 serving/reporting faces."""

from __future__ import annotations

from dbpedia_spotlight_db_spark.operators import dedup as dd
from dbpedia_spotlight_db_spark.queries import qdata, qpipe
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_entity_card_matches_degree_face_and_orders_top3(spark):
    cards = qpipe.Q["kg_entity_card"](spark, SF).toPandas()
    deg = qpipe.Q["kg_degree"](spark, SF).toPandas()
    merged = cards.merge(deg, on="uri", suffixes=("_card", "_deg"))
    assert len(merged) == len(cards) == len(deg)
    assert (merged["degree_card"] == merged["degree_deg"]).all()
    assert (merged["strength_card"] == merged["strength_deg"]).all()
    # card lists at most 3 related entities, none equal to the entity
    for _, r in cards.iterrows():
        rel = r["top_related"].split(",")
        assert 1 <= len(rel) <= 3
        assert r["uri"] not in rel
        assert len(set(rel)) == len(rel)


def test_entity_card_top1_is_heaviest_neighbor(spark):
    cards = {
        r.uri: r.top_related.split(",")
        for r in qpipe.Q["kg_entity_card"](spark, SF).collect()
    }
    # recompute weighted neighbors independently
    de = qpipe._doc_entities(spark, SF).toPandas()
    import collections

    wt = collections.Counter()
    for _, g in de.groupby("doc_id"):
        us = sorted(set(g["uri"]))
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                wt[(us[i], us[j])] += 1
    best = {}
    for (a, b), n in wt.items():
        for u, v in ((a, b), (b, a)):
            cur = best.get(u)
            # heaviest first; ties break on the lexicographically
            # smaller neighbor (the face's ORDER BY n_ab DESC, nbr)
            key = (-n, v)
            if cur is None or key < cur:
                best[u] = key
    for u, (negn, v) in best.items():
        assert cards[u][0] == v, (u, cards[u], v)


def test_dup_cluster_stats_conservation(spark):
    got = qdata.Q["dup_cluster_stats"](spark, SF).toPandas()
    sigs = dd.minhash_signatures(
        t(spark, SF, "documents"), "doc_id", "text", n_hashes=4
    )
    comps = dd.connected_components(
        dd.lsh_pairs(sigs, n_hashes=4, bands=4)
    ).toPandas()
    assert (got["cluster_size"] >= 2).all()  # singletons never enter CC
    assert int((got["cluster_size"] * got["n_clusters"]).sum()) == len(comps)
    assert int(got["n_clusters"].sum()) == comps["component"].nunique()
