"""Wave-182 invariants: the survivor-policy census replays from the
operator cluster assignments (policies genuinely disagree
somewhere), and the distribute/sort layout changes no values while
both plan certificates hold."""

from __future__ import annotations

from collections import defaultdict

from dbpedia_spotlight_db_spark.operators import dedup as dd
from dbpedia_spotlight_db_spark.queries import qdata, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_survivor_policies_matches_replay(spark):
    docs = t(spark, SF, "documents")
    sigs = dd.minhash_signatures(
        docs, "doc_id", "text", n_hashes=4, shingle_n=3
    )
    comp = {
        r["id"]: r["component"]
        for r in dd.connected_components(
            dd.lsh_pairs(sigs, n_hashes=4, bands=4)
        ).collect()
    }
    nchars = {
        r["doc_id"]: r["n_chars"] for r in docs.collect()
    }
    clusters = defaultdict(list)
    for did, c in comp.items():
        clusters[c].append(did)
    n_agree = 0
    for c, ids in clusters.items():
        keep_minid = min(ids)
        keep_longest = min(
            ids, key=lambda i: (-nchars[i], i)
        )
        if keep_minid == keep_longest:
            n_agree += 1
    got = qdata.Q["dedup_survivor_policies"](spark, SF).collect()[0]
    assert got["n_clusters"] == len(clusters)
    assert got["n_agree"] == n_agree
    assert (
        abs(got["agree_rate"] - round(n_agree / len(clusters), 6))
        <= 1e-9
    )
    assert 0.0 < got["agree_rate"] <= 1.0
    # the comparison is non-trivial: clusters exist
    assert len(clusters) > 0


def test_distribute_sort_values_and_certificates(spark):
    agg = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        a = agg[r["event_type"]]
        a[0] += 1
        a[1] += round(r["value"] * 100)
    got = {
        r["event_type"]: r
        for r in qsql.Q["sql_distribute_sort"](spark, SF).collect()
    }
    assert {k: (g["n"], g["sum_cents"]) for k, g in got.items()} == {
        k: tuple(v) for k, v in agg.items()
    }
    for g in got.values():
        assert g["repartitioned"] is True
        assert g["locally_sorted"] is True
