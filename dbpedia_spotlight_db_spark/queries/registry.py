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

from . import qcorpus, qdata, qembed, qio, qlake, qpipe, qrel, qstats

_QUERIES = {}
_ORACLES = {}
for mod in (qrel, qpipe, qdata, qcorpus, qembed, qstats, qlake, qio):
    _dups = set(_QUERIES) & set(mod.Q)
    assert not _dups, (
        f"query key(s) {_dups} registered in more than one module — "
        "a later registration would silently shadow the earlier face"
    )
    _QUERIES.update(mod.Q)
    _ORACLES.update(mod.O)

_FRONT = [
    "events_gapfill",       # new in r3 wave 5 (date-spine zero-fill)
    "win_trailing_range",   # new in r3 wave 5 (RANGE interval frame)
    "stat_corr",            # new in r3 wave 5 (grouped second moments)
    "agg_histogram",        # new in r3 wave 5 (fixed-width histogram)
    "events_outliers",      # new in r3 wave 5 (broadcast z-score screen)
    "events_transitions",   # new in r3 wave 5 (Markov transition counts)
    "join_fuzzy",           # new in r3 wave 5 (levenshtein dim matching)
    "udf_cogrouped",        # new in r3 wave 5 (cogroup applyInPandas)
    "kg_hits",              # new in r3 wave 6 (hubs/authorities round)
    "kg_node_sim",          # new in r3 wave 6 (neighborhood Jaccard)
    "stream_upsert",        # new in r3 wave 7 (foreachBatch MERGE)
    "win_rank_fns",         # new in r3 wave 9 (percent_rank/cume_dist/ntile)
    "source_lang_stats",    # new in r3 wave 9 (lang mode + entropy)
    "agg_grouping_sets",    # new in r3 wave 10 (non-hierarchical sets)
    "shard_plan",           # new in r3 wave 10 (token-balanced sharding)
    "drift_chi2",           # new in r3 wave 10 (chi-square drift detect)
    "compact_plan",         # new in r3 wave 10 (small-file bin packing)
    "scan_prune_stats",     # new in r3 wave 10 (zone-map pruning report)
    "dedup_containment",    # new in r3 wave 10 (asymmetric near-dup)
    "kg_clustering",        # new in r3 wave 10 (local clustering coeff)
    "basket_rules",         # new in r3 wave 11 (support/confidence/lift)
    "win_streaks",          # new in r3 wave 11 (gaps-and-islands)
    "events_rolling_dau",   # new in r3 wave 11 (rolling distinct actives)
    "graph_degree_dist",    # new in r3 wave 11 (degree histogram)
    "kg_assortativity",     # new in r3 wave 11 (endpoint-degree Pearson)
    "orc_roundtrip",        # new in r3 wave 12 (lossless ORC sink+source)
    "csv_roundtrip",        # new in r3 wave 12 (quoted CSV, explicit schema)
    "json_roundtrip",       # new in r3 wave 12 (JSONL with nested struct)
    "join_interval",        # new in r3 wave 12 (overlap join, equi+residual)
    "events_intervals",     # new in r3 wave 13 (inter-arrival profile)
    "orders_backlog",       # new in r3 wave 13 (running open balance)
    "customer_rfm",         # new in r3 wave 13 (broadcast-cutoff scoring)
    "lsh_bucket_stats",     # new in r3 wave 13 (band bucket histogram)
    "kg_entity_card",       # new in r3 wave 14 (serving view, top-3 card)
    "dup_cluster_stats",    # new in r3 wave 14 (CC size histogram)
    "win_session_window",   # new in r3 wave 15 (native session_window)
    "agg_first_last",       # new in r3 wave 15 (min_by/max_by profile)
    "udf_map_iter",         # new in r3 wave 15 (mapInPandas iterator)
    "pyds_nt_source",       # new in r3 wave 16 (Python DataSource API)
    "json_variant",         # new in r3 wave 16 (VariantType shredding)
    "stat_regression",      # new in r3 wave 17 (REGR_* OLS aggregates)
    "kg_ppr",               # new in r3 wave 17 (personalized PageRank)
    "multimodal_features",  # r1's only hard failure; fixed, never driver-run
    "multimodal_meta",
    "multimodal_frames",
    "multimodal_resize",
    "text_langid",
    "text_token_count",
    "text_fingerprint",
    "text_stopword_ratio",
    "dedup_embed_lsh",
    "kg_cooccurrence",  # new in r3 (entity PMI graph)
    "kg_pagerank",      # new in r3 (entity salience over that graph)
    "stream_sessionize",  # new in r3 (stateful streaming on the oracle gate)
    "join_asof",          # new in r3 (as-of join, union-scan form)
    "join_range",         # new in r3 (bucketed time-range join, no equi key)
    "kg_degree",          # new in r3 (graph degree/strength)
    "kg_triangles",       # new in r3 (oriented triangle count)
    "agg_percentiles",    # new in r3 (exact grouped quantiles)
    "agg_rollup_orders",  # new in r3 (grouping sets + summed measure)
    "pivot_events",       # new in r3 (explicit-values pivot)
    "sample_hash",        # new in r3 (deterministic corpus split)
    "text_unigram_lm",    # new in r3 (unigram-LM quality score)
    "url_normalize",      # new in r3 (crawl URL canonicalization)
    "join_salted",        # new in r3 (explicit skew-salted join)
    "stream_dedup",       # new in r3 (watermarked streaming dedup)
    "crawl_latest",       # new in r3 (latest-snapshot compaction, qcorpus)
    "decontaminate",      # new in r3 (benchmark n-gram anti-leak)
    "text_chunks",        # new in r3 (token-window training chunks)
    "host_stats",         # new in r3 (per-host crawl stats)
    "sample_stratified",  # new in r3 (per-lang deterministic split)
    "token_topk",         # new in r3 (vocabulary heavy hitters)
    "bm25_search",        # new in r3 (BM25 retrieval scoring)
    "doc_tfidf_topterms", # new in r3 (per-doc keyword extraction)
    "kg_disambiguate",    # new in r3 (reference lifecycle E2 face)
    "dedup_lines",        # new in r3 (C4 corpus-level duplicate-line removal)
    "text_repetition",    # new in r3 (Gopher repetition signals, map-only)
    "pack_sequences",     # new in r3 (greedy training-sequence packing)
    "pii_redact",         # new in r3 (compliance scrub, JVM regex)
    "dedup_semantic",     # new in r3 (SemDeDup: cluster-then-dedup)
    "embed_kmeans",       # new in r3 (unrolled Lloyd iterations)
    "kg_khop",            # new in r3 (bounded 2-hop neighborhood size)
    "mix_domains",        # new in r3 (temperature-rebalanced domain mix)
    "crawl_upsert",       # new in r3 (changelog merge, tombstone deletes)
    "profile_columns",    # new in r3 (one-scan table profiling)
    "kg_shortest_path",   # new in r3 (bounded BFS min-distance)
    "kg_labelprop",       # new in r3 (min-label community rounds)
    "quality_gate",       # new in r3 (Gopher-style composite filter)
    "host_blocklist",     # new in r3 (derived spam-host anti-join)
    "index_postings",     # new in r3 (inverted-index posting lists)
    "events_funnel",      # new in r3 (ordered-sequence funnel stages)
    "retention_cohorts",  # new in r3 (cohort-retention matrix)
    "text_token_bpe",     # new in r3 (BPE-ish pretokenizer count)
    "stream_enrich",      # new in r3 (stream-static broadcast join)
    "kg_export_nt",       # new in r3 (N-Triples sink, source inverse)
    "snapshot_diff",      # new in r3 (added/removed/changed report)
    "agg_cube",           # new in r3 (CUBE grouping sets)
    "win_moving_avg",     # new in r3 (ROWS-frame rolling metrics)
    "unpivot_events",     # new in r3 (wide-to-long melt)
    "check_constraints",  # new in r3 (data-quality violation report)
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
