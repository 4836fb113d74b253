"""Wave-180 invariants: the centrality Spearman replays against a
brute-force rank correlation over the operator outputs, with the
agree-but-not-identical pin."""

from __future__ import annotations

import math
from collections import Counter

from dbpedia_spotlight_db_spark.queries import qpipe
from dbpedia_spotlight_db_spark.queries.common import t  # noqa: F401

SF = "/root/testdata/sf0.001"


def _doubled_ranks(vals):
    srt = sorted(vals)
    first = {}
    cnt = Counter(srt)
    for i, v in enumerate(srt):
        if v not in first:
            first[v] = i + 1
    return [2 * first[v] + cnt[v] - 1 for v in vals]


def test_centrality_corr_matches_replay(spark):
    deg = {
        r["uri"]: r["degree"]
        for r in qpipe.Q["kg_degree"](spark, SF)
        .selectExpr("uri", "degree")
        .collect()
    }
    pr = {
        r["uri"]: r["rank"]
        for r in qpipe.Q["kg_pagerank"](spark, SF).collect()
    }
    common = sorted(set(deg) & set(pr))
    dx = _doubled_ranks([deg[u] for u in common])
    dy = _doubled_ranks([pr[u] for u in common])
    n = len(common)
    sx, sy = sum(dx), sum(dy)
    sxy = sum(a * b for a, b in zip(dx, dy))
    sxx = sum(a * a for a in dx)
    syy = sum(b * b for b in dy)
    rho = (n * sxy - sx * sy) / math.sqrt(n * sxx - sx * sx) / math.sqrt(
        n * syy - sy * sy
    )
    got = qpipe.Q["kg_centrality_corr"](spark, SF).collect()[0]
    assert got["n_entities"] == n
    assert abs(got["spearman_deg_pr"] - round(rho, 6)) <= 1e-9
    # degree and PageRank agree strongly on the hub-free graph —
    # at sf0.001 the two rankings coincide exactly (rho rounds to 1)
    assert 0.5 < got["spearman_deg_pr"] <= 1.0
