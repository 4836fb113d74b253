"""Wave-94 invariant: two SimRank iterations on the capped
co-occurrence subgraph match an adjacency-dict replay with the same
all-integer picos quantization."""

from __future__ import annotations

from dbpedia_spotlight_db_spark.queries import qpipe

SF = "/root/testdata/sf0.001"


def test_simrank_matches_adjacency_replay(spark):
    ce = [
        (r["src"], r["dst"])
        for r in qpipe._capped_edges(
            qpipe._undirected_edges(spark, SF)
        ).collect()
    ]
    adj: dict[str, set[str]] = {}
    for s, d in ce:
        adj.setdefault(s, set()).add(d)
    deg = {k: len(v) for k, v in adj.items()}
    # unordered wedge-connected candidate pairs + common-neighbor counts
    cn: dict[tuple[str, str], int] = {}
    nodes = sorted(adj)
    for ai, a in enumerate(nodes):
        for b in nodes[ai + 1 :]:
            c = len(adj[a] & adj[b])
            if c:
                cn[(a, b)] = c
    s1 = {
        (a, b): (2 * 800000000000 * c + deg[a] * deg[b])
        // (2 * deg[a] * deg[b])
        for (a, b), c in cn.items()
    }
    s2 = {}
    for (a, b), c in cn.items():
        total = 0
        for i in adj[a]:
            for j in adj[b]:
                if i == j:
                    total += 1000000000000
                else:
                    total += s1.get((min(i, j), max(i, j)), 0)
        d = deg[a] * deg[b]
        s2[(a, b)] = (8 * total + 5 * d) // (10 * d)
    top = sorted(s2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        ((r["uri_a"], r["uri_b"]), r["s2_ps"])
        for r in qpipe.Q["kg_simrank"](spark, SF).collect()
    ]
    assert got == top
    # recursion does something: s2 must differ from s1 somewhere in
    # the top set (else the second iteration degenerated)
    assert any(s1.get(p) != v for p, v in top)
    # scores live in (0, C * 1e12]
    assert all(0 < v <= 800000000000 for _, v in top)
