"""Driver-facing query registry.

Key ORDER is part of the contract: the round driver evaluates the
first N registry entries (r2 ran exactly the first 50 of 59), so the
queries that most need a driver-correctness row must sit early.
``_FRONT`` holds the keys that fell outside r2's 50-query window (and
therefore have never had a driver row — VERDICT.md r2 "What's missing"
#1); ``_TAIL`` holds cheap, long-stable relational keys that have been
green since round 1 and can safely absorb any window truncation.
"""

from __future__ import annotations

from . import (
    qadv,
    qcorpus,
    qdata,
    qembed,
    qfeat,
    qgraph,
    qio,
    qlake,
    qml,
    qpipe,
    qrel,
    qsketch,
    qsql,
    qstats,
)

_QUERIES = {}
_ORACLES = {}
for mod in (
    qrel,
    qpipe,
    qdata,
    qcorpus,
    qembed,
    qstats,
    qlake,
    qio,
    qadv,
    qsketch,
    qfeat,
    qml,
    qgraph,
    qsql,
):
    _dups = set(_QUERIES) & set(mod.Q)
    assert not _dups, (
        f"query key(s) {_dups} registered in more than one module — "
        "a later registration would silently shadow the earlier face"
    )
    _QUERIES.update(mod.Q)
    _ORACLES.update(mod.O)

# Round-4 rotation (VERDICT r3 "Next round" #2): _FRONT is EXACTLY the
# 50 registry keys that have never had a driver-correctness row — the
# complement of union(CORRECTNESS_r01..r03) over the 150-key registry,
# computed mechanically. With the driver's 50-key window, a green r4
# makes the cross-round union 150/150. The r3-covered wave faces moved
# behind (driver rows are durable across rounds).
_FRONT = [
    "dedup_embed_lsh",    # fell at position 52 in r3 — just missed the window
    "kg_cooccurrence",    # entity PMI graph
    "kg_pagerank",        # entity salience over that graph
    "stream_sessionize",  # stateful streaming on the oracle gate
    "join_asof",          # as-of join, union-scan form
    "join_range",         # bucketed time-range join, no equi key
    "kg_degree",          # graph degree/strength
    "kg_triangles",       # oriented triangle count
    "agg_percentiles",    # exact grouped quantiles
    "agg_rollup_orders",  # grouping sets + summed measure
    "pivot_events",       # explicit-values pivot
    "sample_hash",        # deterministic corpus split
    "text_unigram_lm",    # unigram-LM quality score
    "url_normalize",      # crawl URL canonicalization
    "join_salted",        # explicit skew-salted join
    "stream_dedup",       # watermarked streaming dedup
    "crawl_latest",       # latest-snapshot compaction, qcorpus
    "decontaminate",      # benchmark n-gram anti-leak
    "text_chunks",        # token-window training chunks
    "host_stats",         # per-host crawl stats
    "sample_stratified",  # per-lang deterministic split
    "token_topk",         # vocabulary heavy hitters
    "bm25_search",        # BM25 retrieval scoring
    "doc_tfidf_topterms", # per-doc keyword extraction
    "kg_disambiguate",    # reference lifecycle E2 face
    "dedup_lines",        # C4 corpus-level duplicate-line removal
    "text_repetition",    # Gopher repetition signals, map-only
    "pack_sequences",     # greedy training-sequence packing
    "pii_redact",         # compliance scrub, JVM regex
    "dedup_semantic",     # SemDeDup: cluster-then-dedup
    "embed_kmeans",       # unrolled Lloyd iterations
    "kg_khop",            # bounded 2-hop neighborhood size
    "mix_domains",        # temperature-rebalanced domain mix
    "crawl_upsert",       # changelog merge, tombstone deletes
    "profile_columns",    # one-scan table profiling
    "kg_shortest_path",   # bounded BFS min-distance
    "kg_labelprop",       # min-label community rounds
    "quality_gate",       # Gopher-style composite filter
    "host_blocklist",     # derived spam-host anti-join
    "index_postings",     # inverted-index posting lists
    "events_funnel",      # ordered-sequence funnel stages
    "retention_cohorts",  # cohort-retention matrix
    "text_token_bpe",     # BPE-ish pretokenizer count
    "stream_enrich",      # stream-static broadcast join
    "kg_export_nt",       # N-Triples sink, source inverse
    "snapshot_diff",      # added/removed/changed report
    "agg_cube",           # CUBE grouping sets
    "win_moving_avg",     # ROWS-frame rolling metrics
    "unpivot_events",     # wide-to-long melt
    "check_constraints",  # data-quality violation report
]
_TAIL = [
    "sort_limit",
    "set_union",
    "set_except",
    "set_intersect",
    "str_fns",
    "date_fns",
    "math_fns",
    "arr_fns",
    "json_fns",
]

_missing = [k for k in _FRONT + _TAIL if k not in _QUERIES]
assert not _missing, f"registry reorder references unknown keys: {_missing}"

_order = (
    _FRONT
    + [k for k in _QUERIES if k not in _FRONT and k not in _TAIL]
    + _TAIL
)
QUERIES = {k: _QUERIES[k] for k in _order}
ORACLES = {k: _ORACLES[k] for k in _order if k in _ORACLES}
