"""J4/J5: redirect closure fixpoint, chains, cycles, canonicalization."""

from __future__ import annotations

import pytest

from dbpedia_spotlight_db_spark import fixtures, schemas
from dbpedia_spotlight_db_spark.operators.closure import (
    canonicalize,
    redirect_closure,
)


def test_closure_resolves_chains(spark):
    red = spark.createDataFrame(fixtures.gen_redirects(), schema=schemas.REDIRECTS)
    got = {r.src_uri: r.dst_uri for r in redirect_closure(red).collect()}
    # chain 175 -> 176 -> 177 -> 0 resolves fully
    assert got["dbr:Entity_175"] == "dbr:Entity_0"
    assert got["dbr:Entity_176"] == "dbr:Entity_0"
    assert got["dbr:Entity_177"] == "dbr:Entity_0"
    # single hop
    assert got["dbr:Entity_187"] == "dbr:Entity_10"
    # 2-cycle members drop out (canonicalize to themselves)
    assert "dbr:Entity_198" not in got
    assert "dbr:Entity_199" not in got


def test_canonicalize_rewrites_and_drops(spark):
    red = spark.createDataFrame(fixtures.gen_redirects(), schema=schemas.REDIRECTS)
    dis = spark.createDataFrame(
        fixtures.gen_disambiguations(), schema=schemas.DISAMBIGUATIONS
    )
    ann = spark.createDataFrame(
        [
            ("u1", "dbr:Entity_175"),   # chain -> Entity_0
            ("u2", "dbr:Entity_50"),    # untouched
            ("u3", "dbr:Entity_165"),   # disambiguation page -> dropped
            ("u4", "dbr:Entity_198"),   # cycle member -> kept as-is
        ],
        ["url", "uri"],
    )
    closure = redirect_closure(red)
    out = {r.url: r.uri for r in canonicalize(ann, closure, dis).collect()}
    assert out == {
        "u1": "dbr:Entity_0",
        "u2": "dbr:Entity_50",
        "u4": "dbr:Entity_198",
    }


def test_odd_cycle_members_stay_unredirected(spark):
    """Odd cycles oscillate under f∘f; the stability filter must drop
    them (and chains feeding them) — nothing may canonicalize to a
    URI that is itself still a redirect source."""
    from dbpedia_spotlight_db_spark.operators.closure import redirect_closure

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),   # 3-cycle
            ("x", "a"),                            # chain into the cycle
            ("m", "n"), ("n", "o"),                # clean chain
        ],
        ["src_uri", "dst_uri"],
    )
    got = {(r.src_uri, r.dst_uri) for r in redirect_closure(edges).collect()}
    assert got == {("m", "o"), ("n", "o")}


def test_chain_into_even_cycle_gets_no_redirect(spark):
    """A chain feeding an even cycle (a->b, b->c, c<->d) must
    canonicalize every involved node to itself — the reference's
    visited-set bailout treats any revisit as 'no redirect'. The
    collapsed self-loop (c->c under f∘f) is still a redirect source,
    so the terminal-target filter must drop rows landing on it."""
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"), ("d", "c"),  # chain -> 2-cycle
            ("m", "n"),                                       # clean single hop
        ],
        ["src_uri", "dst_uri"],
    )
    got = {(r.src_uri, r.dst_uri) for r in redirect_closure(edges).collect()}
    assert got == {("m", "n")}


def test_pagerank_matches_reference_recurrence(spark):
    """3-iteration PageRank on a small directed graph equals an
    independent dict-based evaluation of the same recurrence
    (uniform init, (1-d)/|V| + d * sum rank/outdeg, dangling nodes
    contribute nothing)."""
    from dbpedia_spotlight_db_spark.operators.closure import pagerank

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),  # d has out-edges; nothing points at d
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.uri: r.rank for r in pagerank(df, iterations=3).collect()}

    nodes = sorted({u for e in edges for u in e})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        m = {v: 0.0 for v in nodes}
        for s, d in edges:
            m[d] += rank[s] / outdeg[s]
        rank = {v: 0.15 / n + 0.85 * m[v] for v in nodes}
    assert got.keys() == rank.keys()
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], rel=1e-12), v
    # ranks form a probability-ish mass: sum <= 1 with dangling loss
    assert sum(got.values()) <= 1.0 + 1e-9
