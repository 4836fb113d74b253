"""End-to-end invariants for jobs/graph.py: the materialized graph
warehouse must be internally consistent (edge orientation, node
completeness, degree arithmetic, component soundness vs a driver-side
union-find replay) and the NT sink must round-trip through the S3
NT source.
"""

from __future__ import annotations

from dbpedia_spotlight_db_spark.sources import catalog
from jobs.graph import _NT_REL, main

SF = "/root/testdata/sf0.001"


def test_graph_job_end_to_end(spark, tmp_path):
    out = str(tmp_path / "graph")
    main(["--triples", f"world:{SF}", "--out", out])

    edges = spark.read.parquet(f"{out}/edges").collect()
    nodes = spark.read.parquet(f"{out}/nodes").collect()
    assert len(edges) > 0 and len(nodes) > 0
    # manifests carry the real row counts
    assert catalog.manifest(out, "edges")["rows"] == len(edges)
    assert catalog.manifest(out, "nodes")["rows"] == len(nodes)

    # orientation + positive weights
    for e in edges:
        assert e.src < e.dst and e.n_docs >= 1

    # node table covers exactly the edge endpoints
    endpoints = {e.src for e in edges} | {e.dst for e in edges}
    assert {n.uri for n in nodes} == endpoints

    # degree/strength replay
    deg, stren = {}, {}
    for e in edges:
        for u in (e.src, e.dst):
            deg[u] = deg.get(u, 0) + 1
            stren[u] = stren.get(u, 0) + e.n_docs
    for n in nodes:
        assert n.degree == deg[n.uri] and n.strength == stren[n.uri]
        assert 0 < n.rank <= 1

    # component soundness: union-find replay; component id = min uri
    parent = {u: u for u in endpoints}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for e in edges:
        ra, rb = find(e.src), find(e.dst)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = {}
    for u in endpoints:
        roots.setdefault(find(u), set()).add(u)
    expect = {u: min(m) for r, m in roots.items() for u in m}
    assert {n.uri: n.component for n in nodes} == expect

    # NT sink round-trips through the S3 source with the full IRIs
    nt = catalog.read_nt_triples(spark, f"{out}/graph_nt").collect()
    assert len(nt) == len(edges)
    assert {t.pred for t in nt} == {_NT_REL}
    pairs = {
        (t.subj.rsplit("/", 1)[1], t.obj.rsplit("/", 1)[1]) for t in nt
    }
    assert pairs == {
        (e.src.split(":", 1)[1], e.dst.split(":", 1)[1]) for e in edges
    }


def test_min_cooccur_prunes_noise_edges(spark, tmp_path):
    out1 = str(tmp_path / "g1")
    out2 = str(tmp_path / "g2")
    main(["--triples", f"world:{SF}", "--out", out1])
    main(["--triples", f"world:{SF}", "--out", out2, "--min-cooccur", "2"])
    e1 = spark.read.parquet(f"{out1}/edges")
    e2 = spark.read.parquet(f"{out2}/edges").collect()
    assert all(e.n_docs >= 2 for e in e2)
    strong = e1.filter("n_docs >= 2").count()
    assert len(e2) == strong < e1.count()
