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

# Round-5 rotation (VERDICT r4 "Next round" #1 + CLAUDE.md "R5
# ROTATION PREP"): union(CORRECTNESS_r01..r04) covers 150 keys; the
# 239 wave-18..78 keys have no driver row. _FRONT is the 50
# highest-value of those 239, picked one-per-family: the streaming
# quadrants, the scale-mechanism faces (DPP / bucket+nested pruning /
# dynamic overwrite / bucketed + shuffle-hash joins), the sketch
# family, the ml_*/stat_* eval blocks, the tolerance ladder, the
# wedge-family graph faces (which this round also gain the degree cap
# VERDICT r4 "What's wrong" #1 demands — a driver row proves the fix
# stays hash-green), and the UDF/Arrow quadrants. Keys already
# driver-covered moved behind (driver rows are durable across rounds).
_FRONT = [
    "stream_window",          # sliding-window append-mode agg
    "stream_resume",          # exactly-once across two runs
    "stream_pyds_nt",         # Python DataSource stream reader
    "stream_pyds_sink",       # Python DataSource stream writer
    "stream_join",            # stream-stream inner join
    "stream_outer_join",      # stream-stream left outer join
    "join_dpp",               # dynamic partition pruning fires
    "scan_bucket_prune",      # SelectedBucketsCount 1-of-8
    "scan_nested_prune",      # nested-schema pruning
    "hive_dynamic_overwrite", # dynamic partition overwrite
    "join_bucketed",          # bucketed join, zero Exchange
    "join_shuffle_hash",      # SHJ hint flips SMJ
    "hive_partition_prune",   # PartitionFilters pruning
    "agg_countmin",           # count-min sketch
    "agg_kmv",                # KMV distinct sketch
    "agg_lincount",           # linear counting
    "join_bloom",             # bloom-prefiltered semi-join
    "agg_heavy_hitters",      # exact Misra-Gries two-phase
    "ml_auc",                 # ROC AUC, rank form
    "ml_map",                 # mean average precision
    "ml_brier",               # Brier score, exact cents
    "ml_ks",                  # model KS separation
    "ml_fairness",            # group fairness metrics
    "stat_friedman",          # Friedman rank test
    "stat_theil",             # Theil inequality decomposition
    "stat_hurst",             # R/S Hurst exponent
    "stat_gumbel",            # extreme-value fit
    "stat_ks",                # two-sample KS, integer ECDFs
    "sql_try_cast",           # TRY_CAST tolerance ladder
    "sql_try_timestamp",      # try_to_timestamp patterns
    "csv_permissive",         # PERMISSIVE corrupt-record capture
    "csv_dropmalformed",      # DROPMALFORMED mode
    "scan_ignore_corrupt",    # ignoreCorruptFiles scan
    "kg_adamic_adar",         # wedge join, degree-capped (r5)
    "kg_betweenness",         # length-2 betweenness, capped (r5)
    "kg_kcore",               # k-core peel rounds
    "kg_truss",               # k-truss peel rounds
    "kg_reach_recursive",     # Spark 4 WITH RECURSIVE
    "udf_grouped_agg",        # GROUPED_AGG pandas UDF
    "udf_map_arrow",          # mapInArrow quadrant
    "udf_scalar_iter",        # Iterator[pd.Series] scalar UDF
    "text_bpe_merge",         # one BPE merge round
    "text_jsd",               # Jensen-Shannon divergence
    "dedup_url",              # canonical-URL min-keeper
    "dedup_minhash_eval",     # MinHash estimator quality
    "events_attribution",     # running-max attribution
    "events_changepoint",     # CUSUM changepoint
    "merge_scd2",             # SCD2 interval merge
    "privacy_dp_histogram",   # DP noisy histogram
    "multimodal_dedup",       # binary-blob CAS census
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
