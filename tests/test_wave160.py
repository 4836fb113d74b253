"""Wave-160 invariants: transitivity's closed-form wedge count and
oriented triangle count satisfy 3T <= W with the capped-graph brute
force, and the Nemenyi pair grid replays from the Friedman panel
with no significant pair on the shared-distribution fixture."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qml, qpipe
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_transitivity_matches_brute_force(spark):
    edges = {
        (r["src"], r["dst"])
        for r in qpipe._capped_edges(
            qpipe._undirected_edges(spark, SF)
        ).collect()
    }
    deg = Counter(s for s, _ in edges)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    und = {(min(a, b), max(a, b)) for a, b in edges}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
    tris = sum(
        1
        for a, b in und
        for c in adj[b]
        if c in adj[a]
    )
    got = qpipe.Q["kg_transitivity"](spark, SF).collect()[0]
    assert (got["n_wedges"], got["n_triangles"]) == (wedges, tris)
    assert 3 * tris <= wedges  # structural invariant
    if wedges:
        assert (
            abs(got["transitivity"] - round(3.0 * tris / wedges, 6))
            <= 1e-9
        )
        assert 0.0 <= got["transitivity"] <= 1.0


def test_nemenyi_matches_replay(spark):
    import datetime

    daily = defaultdict(dict)
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        dn = (r["ts"].date() - datetime.date(2024, 1, 1)).days
        daily[dn][r["event_type"]] = daily[dn].get(
            r["event_type"], 0
        ) + round(r["value"] * 100)
    types = sorted({ty for d in daily.values() for ty in d})
    k = len(types)
    complete = {
        dn: {ty: c // 100 for ty, c in d.items()}
        for dn, d in daily.items()
        if len(d) == k
    }
    rd = Counter()
    n = len(complete)
    for d in complete.values():
        vals = sorted(d.values())
        firstpos = {}
        cnt = Counter(vals)
        for i, v in enumerate(vals):
            if v not in firstpos:
                firstpos[v] = i + 1
        for ty, v in d.items():
            rd[ty] += 2 * firstpos[v] + cnt[v] - 1
    got = {
        (r["type_a"], r["type_b"]): r
        for r in qml.Q["stat_nemenyi"](spark, SF).collect()
    }
    assert len(got) == k * (k - 1) // 2
    import math

    cd = round(2.728 * math.sqrt(k * (k + 1.0) / (6.0 * n)), 6)
    for (ta, tb), r in got.items():
        assert abs(
            r["mean_rank_a"] - round(rd[ta] / 2.0 / n, 6)
        ) <= 1e-9
        assert abs(
            r["mean_rank_b"] - round(rd[tb] / 2.0 / n, 6)
        ) <= 1e-9
        assert abs(
            r["abs_diff"] - round(abs(rd[ta] - rd[tb]) / 2.0 / n, 6)
        ) <= 1e-9
        if k == 5:
            assert abs(r["cd_05"] - cd) <= 1e-9
            # shared distribution: no pair separates
            assert r["significant"] is False
