"""Invariant tests for the round-4 wave-18/19 faces — properties the
DuckDB oracle gate cannot express (structural identities, interval
chaining, tile bounds), at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qdata, qlake, qpipe, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_adamic_adar_scores_only_missing_links(spark):
    aa = qpipe.Q["kg_adamic_adar"](spark, SF).toPandas()
    edges = {
        (r.uri_a, r.uri_b)
        for r in qpipe._entity_pairs(spark, SF).collect()
    }
    assert len(aa) > 0
    for _, r in aa.iterrows():
        assert (r.uri_a, r.uri_b) not in edges  # non-adjacent only
        assert r.uri_a < r.uri_b
        assert r.n_common >= 1
        assert r.aa_score > 0
        # each common neighbor contributes at most 1/ln(2)
        assert r.aa_score <= r.n_common / 0.693 + 1e-6


def test_kcore_survivors_subset_with_bounded_degree(spark):
    core = {
        r.uri: r.core_deg for r in qpipe.Q["kg_kcore"](spark, SF).collect()
    }
    deg0 = {
        r.src: r.d
        for r in qpipe._undirected_edges(spark, SF)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    assert core, "2-core of the fixture graph must be non-empty"
    for uri, d in core.items():
        assert deg0[uri] >= 2  # survivor passed the first peel
        assert 1 <= d <= deg0[uri]  # residual degree never grows


def test_truss_edges_are_edges_with_triangle_support(spark):
    truss = qpipe.Q["kg_truss"](spark, SF).toPandas()
    edges = {
        (r.uri_a, r.uri_b)
        for r in qpipe._entity_pairs(spark, SF).collect()
    }
    assert len(truss) > 0
    assert (truss["support"] >= 1).all()
    for _, r in truss.iterrows():
        assert (r.uri_a, r.uri_b) in edges  # truss ⊆ edge set


def test_modularity_identities(spark):
    mod = qpipe.Q["kg_modularity"](spark, SF).toPandas()
    m = qpipe._entity_pairs(spark, SF).count()
    # degree sums over communities partition the total degree mass 2m
    assert mod["degree_sum"].sum() == 2 * m
    assert mod["internal_edges"].sum() <= m
    q_total = mod["q_contrib"].sum()
    assert -1.0 <= q_total <= 1.0
    # the min-label community id is a member of the community
    labels = qpipe.Q["kg_labelprop"](spark, SF).toPandas()
    by_comm = labels.groupby("community")["uri"].apply(set)
    for comm, members in by_comm.items():
        assert comm in members
        assert comm == min(members)


def test_scd2_intervals_chain_per_user(spark):
    scd = qlake.Q["merge_scd2"](spark, SF).toPandas()
    assert (scd.groupby("user_id")["is_current"].sum() == 1).all()
    for _, g in scd.groupby("user_id"):
        g = g.sort_values("valid_from_us")
        # consecutive states differ (no-op updates suppressed)
        states = list(g["state"])
        assert all(a != b for a, b in zip(states, states[1:]))
        # each interval closes exactly where the next opens
        closes = list(g["valid_to_us"])[:-1]
        opens = list(g["valid_from_us"])[1:]
        assert closes == opens
        assert g["valid_to_us"].iloc[-1] is None or bool(
            g["valid_to_us"].isna().iloc[-1]
        )


def test_attribution_covers_every_purchase_within_window(spark):
    att = qstats.Q["events_attribution"](spark, SF).toPandas()
    ev = t(spark, SF, "events")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert len(att) == n_purch
    hit = att[att["attributed"]]
    assert len(hit) > 0
    assert (hit["click_us"] < hit["purchase_us"]).all()
    assert (
        hit["purchase_us"] - hit["click_us"] <= 7 * 86400 * 1_000_000
    ).all()
    miss = att[~att["attributed"]]
    assert miss["click_us"].isna().all() and miss["lag_s"].isna().all()


def test_zorder_buckets_bound_both_dimensions(spark):
    z = qlake.Q["zorder_plan"](spark, SF).toPandas()
    n_li = t(spark, SF, "lineitem").count()
    assert z["n_rows"].sum() == n_li
    # zbucket fixes the top 3 bits of BOTH 8-bit dims -> 32-wide tiles
    assert (z["max_px"] - z["min_px"] < 32).all()
    assert (z["max_py"] - z["min_py"] < 32).all()
    assert (z["zbucket"] >= 0).all() and (z["zbucket"] < 64).all()


def test_pruned_lm_tracks_unpruned_on_head_tokens(spark):
    full = (
        qdata.Q["text_unigram_lm"](spark, SF)
        .toPandas()
        .set_index("doc_id")["nll"]
    )
    pruned = (
        qdata.Q["text_unigram_lm_pruned"](spark, SF)
        .toPandas()
        .set_index("doc_id")["nll"]
    )
    assert set(full.index) == set(pruned.index)
    assert (pruned > 0).all()
    # pruning collapses tail tokens into one higher-mass UNK bucket,
    # so the pruned NLL never exceeds the unpruned by more than the
    # tail's share; on the fixture the two must correlate strongly
    joined = full.to_frame("f").join(pruned.to_frame("p"))
    assert joined["f"].corr(joined["p"]) > 0.9


def test_dedup_url_folds_constant_branches(spark):
    dd = qdata.Q["dedup_url"](spark, SF).toPandas()
    docs = t(spark, SF, "documents").select("doc_id").toPandas()
    n = len(docs)
    n_b2 = int((docs["doc_id"] % 4 == 2).sum())
    n_b3 = int((docs["doc_id"] % 4 == 3).sum())
    # branches 0/1 stay unique; branches 2 and 3 fold to one row each
    assert len(dd) == (n - n_b2 - n_b3) + 2
    assert dd["n_docs"].sum() == n
    folded = dd[dd["n_docs"] > 1]
    assert set(folded["n_docs"]) == {n_b2, n_b3}
    k2 = docs[docs["doc_id"] % 4 == 2]["doc_id"].min()
    k3 = docs[docs["doc_id"] % 4 == 3]["doc_id"].min()
    assert set(folded["keeper"]) == {k2, k3}


def test_events_paths_counts_match_window_arithmetic(spark):
    paths = qstats.Q["events_paths"](spark, SF).toPandas()
    assert 1 <= len(paths) <= 20
    # every path is exactly three known event types
    types = {
        r.event_type
        for r in t(spark, SF, "events").select("event_type").distinct().collect()
    }
    for p in paths["path"]:
        steps = p.split(">")
        assert len(steps) == 3 and set(steps) <= types
    # total trigrams across ALL paths = sum over users of max(n_i-2, 0)
    from pyspark.sql import Window

    ev = t(spark, SF, "events")
    per_user = ev.groupBy("user_id").count().toPandas()
    want_total = int((per_user["count"] - 2).clip(lower=0).sum())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.lead("event_type", 2).over(w).alias("e3")
    ).filter(F.col("e3").isNotNull())
    assert s.count() == want_total
    # top-20 is sorted desc with path tie-break
    ns = list(paths["n"])
    assert ns == sorted(ns, reverse=True)


def test_ttest_aa_split_is_centered(spark):
    tt = qstats.Q["stat_ttest"](spark, SF).toPandas()
    assert (tt["n_a"] + tt["n_b"] > 0).all()
    # A/A split of the same distribution: |t| should be small
    finite = tt["t_welch"].dropna()
    assert len(finite) > 0
    assert (finite.abs() < 5).all()


def test_udtf_ngrams_row_count_matches_token_arithmetic(spark):
    got = qdata.Q["udtf_ngrams"](spark, SF).count()
    docs = t(spark, SF, "documents").select(
        F.greatest(
            F.size(F.split("text", " ")) - 2, F.lit(0)
        ).alias("n")
    )
    want = docs.agg(F.sum("n")).collect()[0][0]
    assert got == want
