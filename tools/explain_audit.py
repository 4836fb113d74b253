"""Physical-plan audit (SURVEY.md §4.1 "verify in explain() during
bench, don't reimplement"). Asserts the plan properties the 100TB
design depends on and writes EXPLAIN_AUDIT.md with the evidence:

- store-table joins in the annotation path are BroadcastHashJoin
  (never shuffle the corpus side);
- parquet scans push filters and prune columns (PushedFilters +
  narrow ReadSchema);
- the fused annotate pass is map-only: no Exchange between the pages
  scan and the mapInPandas operator;
- the salted aggregation is two-phase (partial agg before the
  exchange, final after);
- per-group top-k uses a windowed partial sort, not a global Sort.

Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent.parent / "EXPLAIN_AUDIT.md"
SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.entrypoint import (
        documents_as_pages,
        world_model_bc,
        world_stores,
    )
    from dbpedia_spotlight_db_spark.operators.salted_agg import salted_count
    from dbpedia_spotlight_db_spark.plans.annotate import AnnotateConfig
    from dbpedia_spotlight_db_spark.plans.annotate_fused import annotate_fused
    from dbpedia_spotlight_db_spark.queries import QUERIES
    from dbpedia_spotlight_db_spark.session import get_spark

    spark = get_spark("explain-audit", cores=8, shuffle_partitions=16)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stores = world_stores(spark, docs)
    model_bc = world_model_bc(spark, stores)
    checks: list[tuple[str, bool, str]] = []
    sections: list[str] = []

    def check(name: str, ok: bool, detail: str, plan: str | None = None):
        checks.append((name, ok, detail))
        if plan:
            sections.append(f"## {name}\n\n```\n{plan[:4000]}\n```\n")

    # 1. fused annotate: map-only (no Exchange above the pages scan)
    pages = documents_as_pages(docs)
    ann = annotate_fused(spark, pages, stores, AnnotateConfig(), model_bc)
    p = plan_of(ann)
    n_exchanges = len(re.findall(r"\bExchange\b", p))
    check(
        "fused annotate is map-only",
        n_exchanges == 0,
        f"{n_exchanges} Exchange nodes in the annotate plan (want 0)",
        p,
    )

    # 2. candidate-attach joins broadcast the store side
    p = plan_of(QUERIES["kg_annotate_prior"](spark, SF))
    bhj = len(re.findall(r"BroadcastHashJoin", p))
    smj = len(re.findall(r"SortMergeJoin", p))
    check(
        "store joins are broadcast",
        bhj >= 2 and smj == 0,
        f"{bhj} BroadcastHashJoin / {smj} SortMergeJoin in kg_annotate_prior",
        p,
    )

    # 3. pushdown + column pruning on a filtered scan
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") >= "1995-01-01").select("l_orderkey", "l_quantity")
    p = plan_of(q)
    pushed = "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in p
    schema_m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    ncols = len(schema_m.group(1).split(",")) if schema_m else 99
    check(
        "filter pushdown + column pruning",
        pushed and ncols <= 3,
        f"pushed={pushed}, scanned cols={ncols} (want <=3 of 16)",
        p,
    )

    # 4. salted agg is two-phase (partial + final HashAggregate around one exchange)
    occ = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    p = plan_of(salted_count(occ, ["w"], out="c", salt_n=16))
    n_hashagg = len(re.findall(r"HashAggregate", p))
    check(
        "salted agg two-phase",
        n_hashagg >= 4,
        f"{n_hashagg} HashAggregate nodes (partial+final per phase, want >=4)",
        p,
    )

    # 5. top-k per group: Window + filter, no global Sort over all rows
    p = plan_of(QUERIES["win_topk"](spark, SF))
    global_sort = bool(re.search(r"\bSort\b(?!Aggregate).*global=true.*rows", p)) or (
        "Exchange SinglePartition" in p
    )
    check(
        "win_topk avoids global sort",
        not global_sort,
        "no single-partition exchange / global sort in win_topk plan",
        p,
    )

    # 6. P0 store build has NO single-partition exchange anywhere
    # (the old _dense_ids global-order window funneled every distinct
    # key through one task; ids are now xxhash64 — map-side)
    bad = []
    for tbl in ("entities", "surface_forms", "tokens", "entity_vectors"):
        p = plan_of(stores[tbl])
        if "Exchange SinglePartition" in p:
            bad.append(tbl)
    check(
        "P0 stores: no single-partition exchange",
        not bad,
        f"store tables with Exchange SinglePartition: {bad or 'none'}",
        plan_of(stores["tokens"]),
    )

    # 7. IVF cell assignment is map-only (centroid argmax via array
    # HOFs against a driver-built literal — zero Exchange, zero Window)
    from dbpedia_spotlight_db_spark.operators.ann import (
        _assign_cells,
        ivf_centroid_rows,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # EXACTLY ivf_topk's quantizer (shared helper) so the audited plan
    # cannot drift from the shipped operator
    cent_rows = ivf_centroid_rows(emb, 8, "vec_id", "embedding")
    p = plan_of(_assign_cells(emb, cent_rows, "vec_id", "embedding"))
    n_ex = len(re.findall(r"\bExchange\b", p))
    n_win = len(re.findall(r"\bWindow\b", p))
    check(
        "IVF assignment is map-only",
        n_ex == 0 and n_win == 0,
        f"{n_ex} Exchange / {n_win} Window nodes in cell assignment (want 0/0)",
        p,
    )

    # 8. jaccard inverted-index self-join is df-capped: the hot-shingle
    # exclusion shows as a broadcast LeftAnti join, and there is no
    # window operator anywhere in the plan
    p = plan_of(QUERIES["dedup_jaccard"](spark, SF))
    has_anti = "LeftAnti" in p
    n_win = len(re.findall(r"\bWindow\b", p))
    check(
        "jaccard self-join is df-capped (broadcast anti-join)",
        has_anti and n_win == 0,
        f"LeftAnti={has_anti}, {n_win} Window nodes in dedup_jaccard plan",
        p,
    )

    # 9. survivors anti-join is UNHINTED: losers is corpus-proportional
    # at real dup rates, so a forced broadcast there is a scale-killer;
    # AQE must be free to pick the strategy from runtime sizes. The
    # hint would survive into the analyzed logical plan as ResolvedHint.
    surv = QUERIES["dedup_survivors"](spark, SF)
    logical = surv._jdf.queryExecution().analyzed().toString()
    check(
        "survivors anti-join has no forced broadcast",
        "ResolvedHint" not in logical and "UnresolvedHint" not in logical,
        "no broadcast hint in dedup_survivors' analyzed plan "
        f"(hints present: {'ResolvedHint' in logical})",
        logical,
    )

    # 10. bucketed store warehouse (jobs/build_stores.py layout): a
    # broadcast-disabled probe join against a save_bucketed table
    # shuffles ONLY the probe side — the bucketed scan reports its
    # layout and contributes no Exchange of its own
    import tempfile

    from dbpedia_spotlight_db_spark.sources import catalog as cat

    with tempfile.TemporaryDirectory(prefix="audit_bucketed_") as tdir:
        cat.save_bucketed(
            stores["candidate_map"], "audit_cm", tdir, "sf_id", n_buckets=4
        )
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = spark.range(64).select(F.col("id").alias("sf_id"))
            p = plan_of(probe.join(spark.table("audit_cm"), "sf_id"))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        n_ex = len(re.findall(r"\(\d+\) Exchange\b", p))
        check(
            "bucketed store scan adds no Exchange",
            "Bucketed: true" in p and n_ex <= 1,
            f"Bucketed scan={'Bucketed: true' in p}, {n_ex} Exchange "
            "nodes (want <=1: probe side only)",
            p,
        )

    # 11. minhash signatures are map-only: the per-doc min is an
    # array-HOF reduction inside the row, not an explode + groupBy —
    # zero Exchange between the documents scan and the signature
    from dbpedia_spotlight_db_spark.operators.dedup import (
        minhash_signatures,
    )

    p = plan_of(minhash_signatures(docs, "doc_id", "text"))
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "minhash signatures are map-only",
        n_ex == 0,
        f"{n_ex} Exchange nodes in the signature plan (want 0)",
        p,
    )

    # 12. simhash banded candidate join: bucket-equality equi-join
    # (never a cartesian/broadcast-nested-loop), no Window operator
    p = plan_of(QUERIES["dedup_simhash_pairs"](spark, SF))
    bad_join = ("CartesianProduct" in p) or ("BroadcastNestedLoopJoin" in p)
    n_win = len(re.findall(r"\bWindow\b", p))
    check(
        "simhash banded join is an equi-join",
        not bad_join and n_win == 0,
        f"cartesian/BNLJ={bad_join}, {n_win} Window nodes in "
        "dedup_simhash_pairs plan",
        p,
    )

    # 14. time-range join is bucket-quantized into an EQUI-join: the
    # no-equi-key theta-join would plan as BroadcastNestedLoopJoin /
    # CartesianProduct (|L|x|R| at corpus scale); the bucket column
    # must make it a hash-partitionable join
    p = plan_of(QUERIES["join_range"](spark, SF))
    bad_join = ("CartesianProduct" in p) or ("BroadcastNestedLoopJoin" in p)
    has_equi = ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    )
    check(
        "time-range join is a bucketed equi-join",
        not bad_join and has_equi,
        f"cartesian/BNLJ={bad_join}, equi-join present={has_equi} "
        "in join_range plan",
        p,
    )

    # 15. salted skew join: with auto-broadcast off, the join is a
    # shuffle equi-join whose key set includes the salt (hot keys
    # spread over salt_n partitions) — and never a nested-loop shape
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(QUERIES["join_salted"](spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    shuffle_join = ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)
    salted_key = "_salt" in p
    bad_join = ("CartesianProduct" in p) or ("BroadcastNestedLoopJoin" in p)
    check(
        "salted join shuffles on (key, salt)",
        shuffle_join and salted_key and not bad_join,
        f"shuffle equi-join={shuffle_join}, salt in join keys={salted_key}, "
        f"cartesian/BNLJ={bad_join} in join_salted plan",
        p,
    )

    # 16. decontaminate: the corpus-vs-benchmark shingle overlap is a
    # broadcast LeftSemi (the benchmark gram set is benchmark-sized,
    # never a corpus-by-gram shuffle) and nothing degenerates into a
    # cartesian scan
    simple = (
        QUERIES["decontaminate"](spark, SF)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    bcast_semi = bool(
        re.search(r"BroadcastHashJoin .*LeftSemi", simple)
    )
    bad_join = "CartesianProduct" in simple
    check(
        "decontaminate semi-join broadcasts the benchmark",
        bcast_semi and not bad_join,
        f"broadcast LeftSemi={bcast_semi}, cartesian={bad_join} "
        "in decontaminate plan",
        simple,
    )

    # 17. crawl_latest compaction is ONE two-phase agg around exactly
    # one exchange: partial aggregation runs BEFORE the shuffle, so
    # the exchange carries at most one candidate row per (key, map
    # task) — hot keys cannot skew it — where the row_number-window
    # formulation would shuffle every fetch of every url. (Spark
    # plans max_by-of-struct as SortAggregate — the var-width struct
    # buffer can't hash-aggregate — so we assert the agg pair + no
    # Window, not the agg flavor.)
    p = plan_of(QUERIES["crawl_latest"](spark, SF))
    n_win = len(re.findall(r"\bWindow\b", p))
    n_ex = len(re.findall(r"\(\d+\) Exchange\b", p))
    n_agg = len(re.findall(r"(?:Hash|Sort)Aggregate", p))
    check(
        "crawl_latest is a single two-phase agg",
        n_win == 0 and n_ex == 1 and n_agg >= 2,
        f"{n_win} Window / {n_ex} Exchange / {n_agg} aggregate nodes "
        "in crawl_latest plan (want 0/1/>=2)",
        p,
    )

    # 18. text_chunks is map-only (pure array math, zero Exchange) and
    # token_topk's head is TakeOrderedAndProject (per-partition top-k
    # merged on the driver), never a global Sort of the vocabulary
    p = plan_of(QUERIES["text_chunks"](spark, SF))
    n_ex = len(re.findall(r"\bExchange\b", p))
    p2 = plan_of(QUERIES["token_topk"](spark, SF))
    take_ordered = "TakeOrderedAndProject" in p2
    check(
        "chunking map-only; token_topk TakeOrdered",
        n_ex == 0 and take_ordered,
        f"{n_ex} Exchange in text_chunks (want 0); "
        f"TakeOrderedAndProject in token_topk={take_ordered}",
        p,
    )

    # 19. text_repetition is strictly map-only (the max-bigram count
    # is an in-row run-length fold, NOT a per-doc groupBy): zero
    # Exchange — at 10^12 docs the signals cost one scan. pii_redact
    # shares the contract and must also prune the documents scan to
    # the 2 columns it reads.
    p = plan_of(QUERIES["text_repetition"](spark, SF))
    n_ex = len(re.findall(r"\bExchange\b", p))
    p2 = plan_of(QUERIES["pii_redact"](spark, SF))
    n_ex2 = len(re.findall(r"\bExchange\b", p2))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p2)
    cols = [c.split(":")[0] for c in m.group(1).split(",")] if m else []
    check(
        "repetition/PII scrubs are map-only with pruned scans",
        n_ex == 0 and n_ex2 == 0 and sorted(cols) == ["doc_id", "text"],
        f"{n_ex}/{n_ex2} Exchange in text_repetition/pii_redact (want 0/0); "
        f"pii_redact reads {cols} (want [doc_id, text])",
        p,
    )

    # 20. dedup_lines: the hot-block set joins back as a LeftAnti with
    # NO forced BroadcastExchange on the logical plan (boilerplate
    # sets are corpus-proportional at crawl scale — AQE may still
    # choose broadcast at runtime when it fits; same discipline as
    # the dedup_survivors fix), and block counting is a two-phase agg
    # (partial before the shuffle).
    df = QUERIES["dedup_lines"](spark, SF)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    forced = "ResolvedHint" in logical or re.search(
        r"(?i)hints=\[broadcast", logical
    )
    p = plan_of(df)
    has_anti = "LeftAnti" in p
    n_agg = len(re.findall(r"(?:ObjectHash|Hash|Sort)Aggregate", p))
    check(
        "dedup_lines anti-join is unhinted; counts are two-phase",
        has_anti and not forced and n_agg >= 2,
        f"LeftAnti={has_anti}, forced-broadcast-hint={bool(forced)}, "
        f"{n_agg} hash-agg nodes in dedup_lines plan",
        p,
    )

    # 21. SemDeDup cell assignment inherits the IVF map-only property
    # (centroid argmax inside the row), so the ONLY exchanges in the
    # whole dedup_semantic plan are the cid pair-join and the loser
    # anti-join — never an exchange keyed by the raw vector.
    p = plan_of(QUERIES["dedup_semantic"](spark, SF))
    n_ex = len(re.findall(r"\(\d+\) Exchange\b", p))
    has_anti = "LeftAnti" in p
    check(
        "dedup_semantic shuffles only by cell id",
        has_anti and n_ex <= 4,
        f"{n_ex} Exchange nodes (cid join + anti-join sides, want <=4), "
        f"LeftAnti={has_anti} in dedup_semantic plan",
        p,
    )

    # 22. crawl_upsert: both logs compact via two-phase max_by aggs
    # (0 Window — a row_number compaction would sort every fetch of
    # every key), the base-vs-delta merge is an UNHINTED LeftAnti
    # (the base is corpus-sized; only AQE may broadcast), and
    # profile_columns is a single scan of the table (one parquet scan
    # node feeding the Expand for the 5-way exact distinct).
    df = QUERIES["crawl_upsert"](spark, SF)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    forced = "ResolvedHint" in logical or re.search(
        r"(?i)hints=\[broadcast", logical
    )
    p = plan_of(df)
    n_window = len(re.findall(r"\bWindow\b", p))
    has_anti = "LeftAnti" in p
    p2 = plan_of(QUERIES["profile_columns"](spark, SF))
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", p2))
    has_expand = "Expand" in p2
    check(
        "crawl_upsert agg-compacted unhinted anti-join; profile is one scan",
        has_anti and not forced and n_window == 0 and n_scans == 1
        and has_expand,
        f"LeftAnti={has_anti}, forced-hint={bool(forced)}, {n_window} Window "
        f"in crawl_upsert; {n_scans} parquet scan (want 1), Expand="
        f"{has_expand} in profile_columns",
        p,
    )

    # 23. quality_gate is map-only with a pruned scan (the composite
    # Gopher gate must never shuffle the corpus: pure column exprs
    # reading 2 of 5 columns), and host_blocklist's corpus filter is
    # an UNHINTED LeftAnti (host lists can reach millions of rows on
    # a full crawl — AQE, not a forced hint, picks broadcast).
    pq = plan_of(QUERIES["quality_gate"](spark, SF))
    qg_exchanges = len(re.findall(r"\bExchange\b", pq))
    m = re.search(r"ReadSchema: struct<([^>]*)>", pq)
    qg_cols = sorted(c.split(":")[0] for c in m.group(1).split(",")) if m else []
    hb = QUERIES["host_blocklist"](spark, SF)
    hb_logical = hb._jdf.queryExecution().optimizedPlan().toString()
    hb_forced = "ResolvedHint" in hb_logical or re.search(
        r"(?i)hints=\[broadcast", hb_logical
    )
    ph = plan_of(hb)
    hb_anti = "LeftAnti" in ph
    check(
        "quality_gate map-only pruned; host_blocklist unhinted anti-join",
        qg_exchanges == 0 and qg_cols == ["doc_id", "text"]
        and hb_anti and not hb_forced,
        f"{qg_exchanges} Exchange in quality_gate (want 0), reads {qg_cols} "
        f"(want [doc_id, text]); LeftAnti={hb_anti}, "
        f"forced-hint={bool(hb_forced)} in host_blocklist",
        pq,
    )

    # 24. index_postings: the per-token top-k is a grouped window
    # limit (WindowGroupLimit = partial top-k before the shuffle, no
    # corpus-wide Sort), no cartesian anywhere, and the window + both
    # aggs line up on the token key so the plan needs few exchanges.
    pi = plan_of(QUERIES["index_postings"](spark, SF))
    ip_wgl = "WindowGroupLimit" in pi
    ip_cart = "CartesianProduct" in pi or "BroadcastNestedLoopJoin" in pi
    ip_exchanges = len(
        re.findall(r"\(\d+\) Exchange\b", pi)
    )
    check(
        "index_postings grouped-window top-k, exchanges line up on token",
        ip_wgl and not ip_cart and ip_exchanges <= 4,
        f"WindowGroupLimit={ip_wgl}, cartesian={ip_cart}, "
        f"{ip_exchanges} Exchange (want <=4) in index_postings",
        pi,
    )

    # 25. events_gapfill folds the corpus into one checkpointed cell
    # relation: the query plan must contain NO scan of the raw events
    # table (the only corpus read happens once, at checkpoint build),
    # and the spine side must attach by broadcast, not shuffle.
    pg = plan_of(QUERIES["events_gapfill"](spark, SF))
    gf_event_scans = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", pg) if "events" in s]
    )
    gf_smj = len(re.findall(r"SortMergeJoin", pg))
    check(
        "events_gapfill single corpus scan via checkpoint, broadcast spine",
        gf_event_scans == 0 and gf_smj == 0,
        f"{gf_event_scans} raw events scans in the gapfill query plan "
        f"(want 0 — corpus folded at checkpoint build), {gf_smj} SortMergeJoin",
        pg,
    )

    # 26. events_outliers attaches |types|-sized group stats by
    # broadcast (never a window over a whole type partition, never a
    # shuffled join of the fact side); events_transitions' LEAD window
    # is partitioned by user (no single-partition exchange).
    po = plan_of(QUERIES["events_outliers"](spark, SF))
    ol_bhj = len(re.findall(r"BroadcastHashJoin", po))
    ol_smj = len(re.findall(r"SortMergeJoin", po))
    ol_win = len(re.findall(r"\bWindow\b", po))
    pt = plan_of(QUERIES["events_transitions"](spark, SF))
    tr_single = "Exchange SinglePartition" in pt
    check(
        "events_outliers broadcast stats; transitions windowed per user",
        ol_bhj >= 1 and ol_smj == 0 and ol_win == 0 and not tr_single,
        f"outliers: {ol_bhj} BroadcastHashJoin / {ol_smj} SortMergeJoin / "
        f"{ol_win} Window (want >=1/0/0); transitions single-partition "
        f"exchange={tr_single} (want False)",
        po,
    )

    # 27. wave-10 lakehouse faces: GROUPING SETS must be ONE Expand +
    # one scan (not a per-set union of re-scans); the compaction
    # planner's prefix-sum window must be partitioned by source
    # (a single-partition window would serialize the whole manifest).
    pgs = plan_of(QUERIES["agg_grouping_sets"](spark, SF))
    gs_expand = "Expand" in pgs
    # formatted plans print each node twice (tree + numbered detail);
    # count only the "(n) Scan parquet" detail headers
    gs_scans = len(re.findall(r"\(\d+\) Scan parquet", pgs))
    pcp = plan_of(QUERIES["compact_plan"](spark, SF))
    cp_single = "Exchange SinglePartition" in pcp
    cp_win = len(re.findall(r"\bWindow\b", pcp))
    check(
        "grouping sets one Expand+scan; compact_plan window per source",
        gs_expand and gs_scans == 1 and cp_win >= 1 and not cp_single,
        f"grouping_sets: Expand={gs_expand}, {gs_scans} parquet scan "
        f"(want 1); compact_plan: {cp_win} Window, single-partition "
        f"exchange={cp_single} (want False)",
        pgs,
    )

    # 28. drift_chi2 attaches the 1-row total by broadcast (never a
    # shuffled join against the per-lang relation); dedup_containment
    # keeps the jaccard family's shapes — df-cap LeftAnti before the
    # quadratic step, no cartesian anywhere.
    pdc = plan_of(QUERIES["drift_chi2"](spark, SF))
    dc_bcast = "Broadcast" in pdc
    dc_smj = len(re.findall(r"SortMergeJoin", pdc))
    pct = plan_of(QUERIES["dedup_containment"](spark, SF))
    ct_anti = "LeftAnti" in pct
    ct_cart = "CartesianProduct" in pct
    check(
        "drift totals broadcast; containment df-capped, no cartesian",
        dc_bcast and dc_smj == 0 and ct_anti and not ct_cart,
        f"drift_chi2: Broadcast={dc_bcast}, {dc_smj} SortMergeJoin "
        f"(want 0); containment: LeftAnti={ct_anti}, "
        f"cartesian={ct_cart} (want False)",
        pct,
    )

    # 29. customer_rfm's whole point is scoring WITHOUT a global
    # NTILE (a totally-ordered single partition of every customer):
    # the plan must contain 0 Window operators — cutoffs attach by
    # broadcast. events_rolling_dau must reach rolling-distinct via
    # the bounded explode, never a fact-table self-join.
    prfm = plan_of(QUERIES["customer_rfm"](spark, SF))
    rfm_win = len(re.findall(r"\bWindow\b", prfm))
    rfm_bcast = "Broadcast" in prfm
    pdau = plan_of(QUERIES["events_rolling_dau"](spark, SF))
    dau_smj = len(re.findall(r"SortMergeJoin", pdau))
    # the explode lands as a Generate node with explode(...) args
    dau_expl = "explode(" in pdau and "Generate" in pdau
    check(
        "rfm scores by broadcast cutoffs (no window); dau by bounded explode",
        rfm_win == 0 and rfm_bcast and dau_expl and dau_smj <= 1,
        f"customer_rfm: {rfm_win} Window (want 0), Broadcast={rfm_bcast}; "
        f"events_rolling_dau: explode={dau_expl}, {dau_smj} SortMergeJoin "
        f"(want <=1 — only the final day-key join may shuffle)",
        prfm,
    )

    # 30. kg_ppr's frontier must attach by BROADCAST (the sparse rank
    # relation is the small side each round — a shuffled join would
    # move the edge list per iteration); kg_entity_card's top-3 must
    # plan as a grouped window limit (rank pushdown), not a global
    # sort.
    # (the doc-keyed SELF-join building the co-occurrence pairs
    # legitimately sort-merges — it's big-big — and is replicated per
    # unrolled round; the PPR-specific property is that the rank
    # frontier attaches by broadcast and nothing degenerates to a
    # cartesian product)
    pppr = plan_of(QUERIES["kg_ppr"](spark, SF))
    ppr_bcast = len(re.findall(r"BroadcastHashJoin", pppr))
    ppr_cart = "CartesianProduct" in pppr or "BroadcastNestedLoop" in pppr
    pcard = plan_of(QUERIES["kg_entity_card"](spark, SF))
    card_wgl = "WindowGroupLimit" in pcard
    check(
        "ppr frontier broadcast per round; entity-card grouped top-k",
        ppr_bcast >= 2 and not ppr_cart and card_wgl,
        f"kg_ppr: {ppr_bcast} BroadcastHashJoin (want >=2), "
        f"cartesian/BNLJ={ppr_cart} (want False); kg_entity_card: "
        f"WindowGroupLimit={card_wgl}",
        pppr,
    )

    # 31. the vocabulary joins in text_unigram_lm / doc_tfidf_topterms
    # are UNHINTED (r3 VERDICT "What's wrong" #2): the per-token
    # relation is corpus-cardinality on web text (billions of distinct
    # tokens), so a forced F.broadcast there OOMs executors. Probe: with
    # auto-broadcast disabled, an unhinted tk-join MUST plan as a
    # shuffle equi-join — a leftover hint would still force
    # BroadcastHashJoin at threshold -1 and fail this check. The 1-row
    # scalar totals keep their hints (provably bounded; they surface as
    # BroadcastNestedLoopJoin on the crossJoin, which we ignore).
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p_lm = plan_of(QUERIES["text_unigram_lm"](spark, SF))
        p_tf = plan_of(QUERIES["doc_tfidf_topterms"](spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    lm_bhj = len(re.findall(r"BroadcastHashJoin", p_lm))
    lm_shuffle = ("SortMergeJoin" in p_lm) or ("ShuffledHashJoin" in p_lm)
    tf_bhj = len(re.findall(r"BroadcastHashJoin", p_tf))
    tf_shuffle = ("SortMergeJoin" in p_tf) or ("ShuffledHashJoin" in p_tf)
    check(
        "vocabulary joins are unhinted (unigram_lm, tfidf_topterms)",
        lm_bhj == 0 and lm_shuffle and tf_bhj == 0 and tf_shuffle,
        f"unigram_lm: {lm_bhj} BroadcastHashJoin (want 0), shuffle "
        f"equi-join={lm_shuffle}; tfidf: {tf_bhj} BroadcastHashJoin "
        f"(want 0), shuffle equi-join={tf_shuffle} — at threshold -1 "
        "only a forced hint could broadcast the vocab side",
        p_lm,
    )

    # 32. kg_adamic_adar (r4): the existing-edge anti-join must be
    # UNHINTED — the pair relation is O(|E|) on a web KG, the same
    # footgun class as survivors (#9). The lineage legitimately
    # carries many hints (the bounded spotting-dictionary broadcast
    # appears in every subtree), so a whole-plan hint count proves
    # nothing; probe like #31 instead: at autoBroadcast threshold -1
    # the anti-join must plan as a SHUFFLE LeftAnti — only a forced
    # hint could still make it a BroadcastHashJoin LeftAnti.
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p_aa = plan_of(QUERIES["kg_adamic_adar"](spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    aa_anti_shuffle = bool(
        re.search(r"(SortMergeJoin|ShuffledHashJoin)[^\n]*LeftAnti", p_aa)
    )
    aa_anti_bcast = bool(
        re.search(r"Broadcast\w*Join[^\n]*LeftAnti", p_aa)
    )
    aa_cart = "CartesianProduct" in p_aa
    check(
        "adamic-adar: anti-join unhinted (shuffle LeftAnti at thr -1)",
        aa_anti_shuffle and not aa_anti_bcast and not aa_cart,
        f"shuffle LeftAnti={aa_anti_shuffle} (want True), broadcast "
        f"LeftAnti={aa_anti_bcast} (want False), cartesian={aa_cart} "
        "(want False)",
        p_aa,
    )

    # 33. merge_scd2 (r4): both windows (LAG change-detect, LEAD
    # validity close) must share ONE user_id Exchange — a second
    # shuffle would double the corpus movement for no reason; and
    # events_attribution must be join-free (one Exchange, one Window,
    # zero joins — the running-max window replaces a
    # purchases-x-clicks self-join).
    p_scd = plan_of(QUERIES["merge_scd2"](spark, SF))
    scd_exch = len(re.findall(r"\(\d+\) Exchange", p_scd))
    scd_win = len(re.findall(r"\(\d+\) Window", p_scd))
    p_att = plan_of(QUERIES["events_attribution"](spark, SF))
    att_exch = len(re.findall(r"\(\d+\) Exchange", p_att))
    att_join = ("Join" in p_att) or ("CartesianProduct" in p_att)
    check(
        "scd2 shares one exchange across both windows; attribution join-free",
        scd_exch == 1 and scd_win == 2 and att_exch == 1 and not att_join,
        f"merge_scd2: {scd_exch} Exchange (want 1), {scd_win} Window "
        f"(want 2); events_attribution: {att_exch} Exchange (want 1), "
        f"join={att_join} (want False)",
        p_scd,
    )

    # 34. zorder_plan (r4): the Morton-key computation is map-only
    # bit math — the plan must be scan -> project -> two-phase agg
    # (partial HashAggregate BEFORE the single Exchange), and the
    # scan must prune to exactly the two key columns.
    p_z = plan_of(QUERIES["zorder_plan"](spark, SF))
    z_exch = len(re.findall(r"\(\d+\) Exchange", p_z))
    m = re.search(r"ReadSchema: ([^\n]*)", p_z)
    z_schema = m.group(1) if m else ""
    z_cols_ok = (
        "l_partkey" in z_schema
        and "l_suppkey" in z_schema
        and "l_orderkey" not in z_schema
        and "l_extendedprice" not in z_schema
    )
    # node ids grow input->output, so a partial agg BEFORE the shuffle
    # means min(HashAggregate id) < Exchange id (the printed tree is
    # output-first, so text order proves nothing — CLAUDE.md lesson)
    agg_ids = [int(i) for i in re.findall(r"\((\d+)\) HashAggregate", p_z)]
    exch_ids = [int(i) for i in re.findall(r"\((\d+)\) Exchange", p_z)]
    z_partial_first = bool(agg_ids and exch_ids) and min(agg_ids) < min(
        exch_ids
    )
    check(
        "zorder key is map-only; agg two-phase; scan pruned to key cols",
        z_exch == 1 and z_cols_ok and z_partial_first,
        f"{z_exch} Exchange (want 1), ReadSchema={z_schema[:80]} "
        f"(want only the two key columns), partial-agg-before-shuffle="
        f"{z_partial_first}",
        p_z,
    )

    # 35. join_lateral (r4 wave 21): Catalyst must DECORRELATE the
    # lateral subquery into a window-ranked join — if decorrelation
    # failed the plan degenerates to a nested-loop/cartesian
    # re-execution of the subquery per outer row, which is quadratic
    # at corpus scale. WindowGroupLimit (or at minimum a Window) with
    # no CartesianProduct proves the win_topk physical family.
    p_lat = plan_of(QUERIES["join_lateral"](spark, SF))
    lat_win = ("WindowGroupLimit" in p_lat) or bool(
        re.search(r"\(\d+\) Window", p_lat)
    )
    lat_nested = ("CartesianProduct" in p_lat) or (
        "BroadcastNestedLoopJoin" in p_lat
    )
    check(
        "lateral subquery decorrelates to a windowed join",
        lat_win and not lat_nested,
        f"window/group-limit={lat_win} (want True), nested-loop/"
        f"cartesian={lat_nested} (want False)",
        p_lat,
    )

    # 36. bigram-LM vocab joins unhinted (the #31 probe applied to
    # wave 22's LM face: bigram/head-count relations are
    # vocab-cardinality — a forced broadcast OOMs at web scale); and
    # feat_hashing is map-only to ONE two-phase agg with the scan
    # pruned to (doc_id, text) — the hashing trick's whole point is
    # no vocabulary state, so any join or second exchange is a bug.
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p_blm = plan_of(QUERIES["text_bigram_lm"](spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    blm_bhj = len(re.findall(r"BroadcastHashJoin", p_blm))
    blm_shuffle = ("SortMergeJoin" in p_blm) or ("ShuffledHashJoin" in p_blm)
    p_fh = plan_of(QUERIES["feat_hashing"](spark, SF))
    fh_exch = len(re.findall(r"\(\d+\) Exchange", p_fh))
    fh_join = "Join" in p_fh
    m = re.search(r"ReadSchema: ([^\n]*)", p_fh)
    fh_schema = m.group(1) if m else ""
    fh_pruned = (
        "doc_id" in fh_schema
        and "text" in fh_schema
        and "lang" not in fh_schema
        and "source" not in fh_schema
    )
    check(
        "bigram-LM vocab joins unhinted; feat_hashing map-only + pruned",
        blm_bhj == 0 and blm_shuffle and fh_exch == 1 and not fh_join
        and fh_pruned,
        f"text_bigram_lm: {blm_bhj} BroadcastHashJoin (want 0), shuffle "
        f"equi-join={blm_shuffle}; feat_hashing: {fh_exch} Exchange "
        f"(want 1), join={fh_join} (want False), "
        f"ReadSchema={fh_schema[:60]}",
        p_blm,
    )

    # 37. agg_bitmap_distinct (r4 wave 22): the bitmap rollup must be
    # TWO-PHASE — partial bitmap_construct_agg BEFORE the (type,
    # bucket) exchange (node ids grow input->output, so partial-first
    # means min agg id < min exchange id); otherwise the raw
    # (type, user) pairs shuffle and the face is just a worse
    # COUNT(DISTINCT). And pareto_front's window input must be the
    # per-size AGGREGATE, not the part scan: the single-partition
    # window Exchange is safe only because the per-size relation is
    # dozens of rows — assert an agg sits below the window.
    p_bm = plan_of(QUERIES["agg_bitmap_distinct"](spark, SF))
    # bitmap_construct_agg has a var-width buffer, so the partial
    # phase plans as SortAggregate, not HashAggregate (the max_by
    # compaction precedent) — match all three aggregate flavors
    bm_agg_ids = [
        int(i)
        for i in re.findall(
            r"\((\d+)\) (?:ObjectHashAggregate|HashAggregate|SortAggregate)",
            p_bm,
        )
    ]
    bm_exch_ids = [int(i) for i in re.findall(r"\((\d+)\) Exchange", p_bm)]
    bm_partial_first = bool(bm_agg_ids and bm_exch_ids) and min(
        bm_agg_ids
    ) < min(bm_exch_ids)
    p_par = plan_of(QUERIES["pareto_front"](spark, SF))
    par_agg_ids = [
        int(i)
        for i in re.findall(r"\((\d+)\) (?:Object)?HashAggregate", p_par)
    ]
    par_win_ids = [int(i) for i in re.findall(r"\((\d+)\) Window", p_par)]
    par_agg_below_win = bool(par_agg_ids and par_win_ids) and min(
        par_agg_ids
    ) < min(par_win_ids)
    check(
        "bitmap rollup two-phase; pareto window runs on the per-size agg",
        bm_partial_first and par_agg_below_win,
        f"bitmap: partial-agg-before-shuffle={bm_partial_first} "
        f"(agg ids {bm_agg_ids}, exchange ids {bm_exch_ids}); pareto: "
        f"agg-below-window={par_agg_below_win} (agg ids {par_agg_ids}, "
        f"window ids {par_win_ids})",
        p_bm,
    )

    # 38. wave-24 shapes: events_changepoint's four window functions
    # must all run under the per-TYPE partitioning (a SinglePartition
    # window Exchange would serialize the calendar relation of every
    # type through one task); text_readability is the map-only
    # zero-UDF contract (0 Exchange, scan pruned to doc_id+text);
    # stat_gini's window must sit ABOVE the count-of-counts aggregate
    # (the whole point of the closed-form rank-sum is never sorting
    # the vocab-sized relation); events_autocorr's lagged pairing is
    # an EQUI-join (bounded explode), never a range/nested-loop join.
    p_cp = plan_of(QUERIES["events_changepoint"](spark, SF))
    cp_single = "Exchange SinglePartition" in p_cp
    p_rd = plan_of(QUERIES["text_readability"](spark, SF))
    rd_exch = len(re.findall(r"\(\d+\) Exchange", p_rd))
    m = re.search(r"ReadSchema: ([^\n]*)", p_rd)
    rd_schema = m.group(1) if m else ""
    rd_pruned = (
        "doc_id" in rd_schema
        and "text" in rd_schema
        and "lang" not in rd_schema
    )
    p_gn = plan_of(QUERIES["stat_gini"](spark, SF))
    gn_agg_ids = [
        int(i)
        for i in re.findall(
            r"\((\d+)\) (?:Object)?HashAggregate", p_gn
        )
    ]
    gn_win_ids = [int(i) for i in re.findall(r"\((\d+)\) Window", p_gn)]
    gn_agg_below_win = bool(gn_agg_ids and gn_win_ids) and min(
        gn_agg_ids
    ) < min(gn_win_ids)
    p_ac = plan_of(QUERIES["events_autocorr"](spark, SF))
    ac_nested = ("CartesianProduct" in p_ac) or (
        "BroadcastNestedLoopJoin" in p_ac
    )
    check(
        "changepoint windows per-type; readability map-only; gini "
        "window over count-of-counts; autocorr equi-join",
        (not cp_single)
        and rd_exch == 0
        and rd_pruned
        and gn_agg_below_win
        and not ac_nested,
        f"changepoint single-partition window={cp_single} (want False); "
        f"readability: {rd_exch} Exchange (want 0), "
        f"ReadSchema={rd_schema[:50]}; gini agg-below-window="
        f"{gn_agg_below_win} (agg ids {gn_agg_ids}, window ids "
        f"{gn_win_ids}); autocorr nested-loop={ac_nested} (want False)",
        p_cp,
    )

    # 39. hive_partition_prune: the lang filter must resolve at the
    # DIRECTORY level — PartitionFilters on the scan, not a post-scan
    # data Filter (at 100 TB this is scan-one-language vs
    # scan-everything); and the scan's ReadSchema must NOT carry the
    # partition column (it comes from the path). events_forecast's
    # lag pairing must be an equi-join, never a nested loop.
    p_hp = plan_of(QUERIES["hive_partition_prune"](spark, SF))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p_hp)
    hp_pf = m.group(1) if m else ""
    hp_pruned = "lang" in hp_pf and "= en" in hp_pf
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p_hp)
    hp_pushed = m.group(1) if m else ""
    hp_no_data_filter = "lang" not in hp_pushed
    p_fc = plan_of(QUERIES["events_forecast"](spark, SF))
    fc_nested = ("CartesianProduct" in p_fc) or (
        "BroadcastNestedLoopJoin" in p_fc
    )
    check(
        "partition pruning at the directory level; forecast equi-join",
        hp_pruned and hp_no_data_filter and not fc_nested,
        f"hive_partition_prune: PartitionFilters=[{hp_pf[:60]}] (want "
        f"lang = en), lang in PushedFilters={not hp_no_data_filter} "
        f"(want False); events_forecast nested-loop={fc_nested} "
        f"(want False)",
        p_hp,
    )

    # 40. wave-27 shapes: text_novelty's first-occurrence attach must
    # be an UNHINTED equi-join (the shingle relation is
    # corpus-cardinality — a forced broadcast is the survivors-class
    # footgun; AQE may still pick broadcast at fixture scale, same
    # discipline as dedup_lines); abc_classification's running sum
    # must be the
    # distributed prefix-sum form — a Window in the plan but NO
    # Exchange SinglePartition (a global-order window would serialize
    # the part dimension through one task); scan_row_index's sink
    # scan must prune to n_chars only (the _metadata struct is
    # synthesized from the split, not read from data pages).
    nv_df = QUERIES["text_novelty"](spark, SF)
    nv_logical = nv_df._jdf.queryExecution().optimizedPlan().toString()
    nv_forced = "ResolvedHint" in nv_logical or bool(
        re.search(r"(?i)hints=\[broadcast", nv_logical)
    )
    p_nv = plan_of(nv_df)
    nv_equi_join = ("Join" in p_nv) and not (
        "CartesianProduct" in p_nv or "BroadcastNestedLoopJoin" in p_nv
    )
    p_abc = plan_of(QUERIES["abc_classification"](spark, SF))
    abc_single = "Exchange SinglePartition" in p_abc
    abc_window = "Window" in p_abc
    p_ri = plan_of(QUERIES["scan_row_index"](spark, SF))
    m = re.search(r"ReadSchema: ([^\n]*)", p_ri)
    ri_schema = m.group(1) if m else ""
    ri_pruned = (
        "n_chars" in ri_schema
        and "text" not in ri_schema
        and "doc_id" not in ri_schema
    )
    check(
        "novelty attach unhinted equi-join; abc prefix-sum window "
        "partitioned; row-index scan pruned",
        (not nv_forced)
        and nv_equi_join
        and abc_window
        and (not abc_single)
        and ri_pruned,
        f"text_novelty: forced-broadcast-hint={nv_forced} (want "
        f"False), equi-join={nv_equi_join}; abc: window={abc_window}, "
        f"single-partition={abc_single} (want False); scan_row_index "
        f"ReadSchema={ri_schema[:50]}",
        p_nv,
    )

    # 41. wave-28 shapes: join_bloom's bit-test pre-filter must exist
    # in the plan BELOW an exact LeftSemi join (the runtime-filter
    # pattern — FP removal is the join's job, volume reduction the
    # filter's); quantile_2pass must never range-partition the corpus
    # (no global sort — the whole point of 2-pass selection) and its
    # pass-2 bucket restriction must be a broadcast join;
    # agg_countmin's sketch cells must aggregate below the probe join
    # (sketch from the vocab-sized relation, probes join 80 cells).
    p_bl = plan_of(QUERIES["join_bloom"](spark, SF))
    bl_semi = "LeftSemi" in p_bl
    bl_prefilter = "shiftrightunsigned" in p_bl
    p_q2 = plan_of(QUERIES["quantile_2pass"](spark, SF))
    q2_no_range = "rangepartitioning" not in p_q2
    q2_bcast = "BroadcastHashJoin" in p_q2
    p_cm = plan_of(QUERIES["agg_countmin"](spark, SF))
    cm_agg_ids = [
        int(i)
        for i in re.findall(r"\((\d+)\) (?:Object)?HashAggregate", p_cm)
    ]
    cm_join_ids = [
        int(i) for i in re.findall(r"\((\d+)\) \w*HashJoin", p_cm)
    ]
    cm_agg_below_join = bool(cm_agg_ids and cm_join_ids) and min(
        cm_agg_ids
    ) < min(cm_join_ids)
    check(
        "bloom prefilter below exact semi-join; 2-pass median never "
        "range-partitions; count-min cells aggregated below probe join",
        bl_semi
        and bl_prefilter
        and q2_no_range
        and q2_bcast
        and cm_agg_below_join,
        f"join_bloom: LeftSemi={bl_semi}, bit-test-filter={bl_prefilter}; "
        f"quantile_2pass: no-rangepartitioning={q2_no_range}, "
        f"broadcast-pass2={q2_bcast}; agg_countmin agg-below-join="
        f"{cm_agg_below_join} (agg ids {cm_agg_ids}, join ids "
        f"{cm_join_ids})",
        p_bl,
    )

    # 42. wave-29 shapes: sample_balanced must not sort a class
    # globally — no SinglePartition window Exchange and no range
    # partitioning of the corpus (both pass-1 histogram windows and
    # the pass-2 boundary-bucket window are hash-partitioned);
    # encode_dict's one global-order window must sit ABOVE the
    # count-of-counts aggregate (the stat_gini discipline: the sorted
    # relation is distinct FREQUENCIES, never the vocabulary).
    p_sb = plan_of(QUERIES["sample_balanced"](spark, SF))
    sb_single = "Exchange SinglePartition" in p_sb
    sb_no_range = "rangepartitioning" not in p_sb
    p_ed = plan_of(QUERIES["encode_dict"](spark, SF))
    ed_agg_ids = [
        int(i)
        for i in re.findall(r"\((\d+)\) (?:Object)?HashAggregate", p_ed)
    ]
    ed_win_ids = [int(i) for i in re.findall(r"\((\d+)\) Window", p_ed)]
    ed_agg_below_win = bool(ed_agg_ids and ed_win_ids) and min(
        ed_agg_ids
    ) < min(ed_win_ids)
    check(
        "balanced sample never sorts a class globally; dict-encode "
        "window runs on the count-of-counts agg",
        (not sb_single) and sb_no_range and ed_agg_below_win,
        f"sample_balanced: single-partition-window={sb_single} (want "
        f"False), no-rangepartitioning={sb_no_range}; encode_dict "
        f"agg-below-window={ed_agg_below_win} (agg ids {ed_agg_ids}, "
        f"window ids {ed_win_ids})",
        p_sb,
    )

    # 43. wave-32 shapes: join_star must broadcast EVERY dimension
    # (zero SortMergeJoin — the fact table is scanned once and never
    # shuffled for a join) with the p_size filter pushed into the
    # part scan; join_exists_subq must decorrelate to LeftSemi +
    # LeftAnti hash joins (no nested-loop re-execution of the
    # subquery); agg_heavy_hitters' exact pass is ONE corpus scan +
    # ONE exchange (the candidate set is a collected literal, the MG
    # pass ran at plan-build); stat_mutual_info scans the corpus
    # exactly once (marginals are windows over the cells relation,
    # not re-aggregations).
    p_st = plan_of(QUERIES["join_star"](spark, SF))
    st_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", p_st))
    st_smj = len(re.findall(r"\(\d+\) SortMergeJoin", p_st))
    st_pushed = "LessThanOrEqual(p_size,25)" in p_st
    p_ex = plan_of(QUERIES["join_exists_subq"](spark, SF))
    ex_semi = "LeftSemi" in p_ex
    ex_anti = "LeftAnti" in p_ex
    ex_nlj = "NestedLoop" in p_ex or "Cartesian" in p_ex
    p_hh = plan_of(QUERIES["agg_heavy_hitters"](spark, SF))
    hh_scans = len(re.findall(r"\(\d+\) Scan parquet", p_hh))
    hh_exch = len(re.findall(r"\(\d+\) Exchange", p_hh))
    p_mi = plan_of(QUERIES["stat_mutual_info"](spark, SF))
    mi_scans = len(re.findall(r"\(\d+\) Scan parquet", p_mi))
    check(
        "star join broadcasts all dims; EXISTS decorrelates to "
        "semi/anti; heavy hitters and mutual info scan the corpus "
        "once",
        st_bhj >= 4
        and st_smj == 0
        and st_pushed
        and ex_semi
        and ex_anti
        and not ex_nlj
        and hh_scans == 1
        and hh_exch == 1
        and mi_scans == 1,
        f"join_star: {st_bhj} BroadcastHashJoin / {st_smj} "
        f"SortMergeJoin, p_size pushed={st_pushed}; exists_subq: "
        f"LeftSemi={ex_semi}, LeftAnti={ex_anti}, nested-loop="
        f"{ex_nlj} (want False); heavy_hitters scans={hh_scans} "
        f"(want 1) exchanges={hh_exch} (want 1); mutual_info "
        f"scans={mi_scans} (want 1)",
        p_st,
    )

    # 44. wave-33 shapes: every model-evaluation face must scan its
    # input exactly ONCE — totals and marginals are windows over the
    # count-of-counts support relation (SUM() OVER (), RANGE-frame
    # cumulatives), never a second aggregation branch (a relation
    # consumed by 2+ branches re-runs its subtree per branch — the
    # wave-32 stat_mutual_info lesson). stat_bootstrap additionally
    # must fan out map-side: exactly one Exchange (the 16-key agg).
    ml_scan_counts = {}
    for key in (
        "ml_pr_curve",
        "ml_lift",
        "ml_stump",
        "stat_spearman",
        "stat_bootstrap",
    ):
        p_k = plan_of(QUERIES[key](spark, SF))
        ml_scan_counts[key] = len(re.findall(r"\(\d+\) Scan parquet", p_k))
    p_bs = plan_of(QUERIES["stat_bootstrap"](spark, SF))
    bs_exch = len(re.findall(r"\(\d+\) Exchange", p_bs))
    check(
        "model-eval faces scan the corpus once; bootstrap is "
        "map-side fan-out + one exchange",
        all(v == 1 for v in ml_scan_counts.values()) and bs_exch == 1,
        f"scan counts {ml_scan_counts} (want all 1); stat_bootstrap "
        f"exchanges={bs_exch} (want 1)",
        p_bs,
    )

    # 45. wave-34 shapes: kg_walks' per-step successor selection must
    # be a per-node window (partitioned by src — never a global
    # single-partition sort) chained by equi-joins (no nested loop);
    # kg_negative_sample must verify negatives via LeftAnti, and its
    # only nested-loop join is the 1-row |V|-count broadcast.
    p_wk = plan_of(QUERIES["kg_walks"](spark, SF))
    wk_single = "Exchange SinglePartition" in p_wk
    wk_nlj = "NestedLoop" in p_wk or "CartesianProduct" in p_wk
    p_ns = plan_of(QUERIES["kg_negative_sample"](spark, SF))
    ns_anti = "LeftAnti" in p_ns
    ns_nlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p_ns))
    ns_cart = "CartesianProduct" in p_ns
    check(
        "walk steps are per-node windows + equi-joins; negative "
        "sampler anti-joins true edges",
        (not wk_single)
        and (not wk_nlj)
        and ns_anti
        and ns_nlj <= 1
        and not ns_cart,
        f"kg_walks: single-partition={wk_single} nested-loop={wk_nlj} "
        f"(want False); kg_negative_sample: LeftAnti={ns_anti}, "
        f"nested-loop joins={ns_nlj} (want <=1, the 1-row count "
        f"broadcast), cartesian={ns_cart} (want False)",
        p_wk,
    )

    # 46. wave-35 shapes: text_bpe_merge's top-20 must be
    # TakeOrderedAndProject over the pair-count agg (per-partition
    # heaps, never a global sort) on ONE corpus scan; events_seasonal
    # scans the corpus once (trend and dow-seasonal are windows over
    # the per-day support, not re-aggregations); text_jsd's branches
    # must consume the parquet checkpoint, never re-tokenize the
    # corpus (no documents scan in the post-checkpoint plan);
    # kg_void_stats' two COUNT DISTINCTs must plan as a single-pass
    # Expand, not a self-join.
    p_bpe = plan_of(QUERIES["text_bpe_merge"](spark, SF))
    bpe_top = "TakeOrderedAndProject" in p_bpe
    bpe_scans = len(re.findall(r"\(\d+\) Scan parquet", p_bpe))
    p_sea = plan_of(QUERIES["events_seasonal"](spark, SF))
    sea_scans = len(re.findall(r"\(\d+\) Scan parquet", p_sea))
    p_jsd = plan_of(QUERIES["text_jsd"](spark, SF))
    jsd_no_docs = "documents.parquet" not in p_jsd
    p_void = plan_of(QUERIES["kg_void_stats"](spark, SF))
    void_expand = "Expand" in p_void
    check(
        "bpe top-k via per-partition heaps; seasonal one scan; jsd "
        "branches read the checkpoint; void stats single-pass expand",
        bpe_top
        and bpe_scans == 1
        and sea_scans == 1
        and jsd_no_docs
        and void_expand,
        f"text_bpe_merge: TakeOrderedAndProject={bpe_top}, scans="
        f"{bpe_scans} (want 1); events_seasonal scans={sea_scans} "
        f"(want 1); text_jsd reads-no-documents={jsd_no_docs}; "
        f"kg_void_stats Expand={void_expand}",
        p_bpe,
    )

    # 47. wave-36 shapes: vacuum_plan is one corpus scan + one
    # key-partitioned window (never single-partition);
    # feat_quantile_bins scans the corpus once (total as OVER () on
    # the support); kg_delta reconciles epochs via grouped MAX-CASE
    # flags, never a full-outer join of per-epoch branches;
    # kg_ambiguity's mention count joins the dictionary by broadcast.
    p_vac = plan_of(QUERIES["vacuum_plan"](spark, SF))
    vac_scans = len(re.findall(r"\(\d+\) Scan parquet", p_vac))
    vac_single = "Exchange SinglePartition" in p_vac
    p_qb = plan_of(QUERIES["feat_quantile_bins"](spark, SF))
    qb_scans = len(re.findall(r"\(\d+\) Scan parquet", p_qb))
    p_kd = plan_of(QUERIES["kg_delta"](spark, SF))
    kd_fullouter = "FullOuter" in p_kd
    p_amb = plan_of(QUERIES["kg_ambiguity"](spark, SF))
    amb_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", p_amb))
    amb_scans = len(re.findall(r"\(\d+\) Scan parquet", p_amb))
    check(
        "vacuum one partitioned window; quantile bins one scan; "
        "delta has no full-outer; ambiguity broadcasts the dict",
        vac_scans == 1
        and not vac_single
        and qb_scans == 1
        and not kd_fullouter
        and amb_bhj >= 1
        # the shared grams builder unions a unigram and a bigram
        # branch (each scans documents) — 2 scans is its floor for
        # every grams-based face, not a regression of this one
        and amb_scans <= 2,
        f"vacuum_plan scans={vac_scans} (want 1) single-partition="
        f"{vac_single} (want False); feat_quantile_bins scans="
        f"{qb_scans} (want 1); kg_delta FullOuter={kd_fullouter} "
        f"(want False); kg_ambiguity BroadcastHashJoin={amb_bhj} "
        f"(want >=1) scans={amb_scans} (want <=2, the grams uni+bi union)",
        p_vac,
    )

    # 48. wave-37 shapes: events_locf mirrors the gapfill discipline —
    # the query plan must contain NO raw events scan (corpus folded
    # once at checkpoint build) and no SortMergeJoin (the spine
    # attaches by broadcast); udf_grouped_agg's GROUPED_AGG pandas
    # UDF must plan as Arrow aggregation nodes (window + final agg),
    # never a grouped-map fallback.
    p_lf = plan_of(QUERIES["events_locf"](spark, SF))
    lf_event_scans = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", p_lf) if "events" in s]
    )
    lf_smj = len(re.findall(r"SortMergeJoin", p_lf))
    p_ga = plan_of(QUERIES["udf_grouped_agg"](spark, SF))
    ga_arrow_agg = "ArrowAggregatePython" in p_ga
    ga_win = "ArrowWindowPython" in p_ga
    check(
        "locf single corpus scan + broadcast spine; grouped-agg UDF "
        "plans as Arrow aggregation",
        lf_event_scans == 0 and lf_smj == 0 and ga_arrow_agg and ga_win,
        f"events_locf raw events scans={lf_event_scans} (want 0), "
        f"SortMergeJoin={lf_smj} (want 0); udf_grouped_agg "
        f"ArrowAggregatePython={ga_arrow_agg}, ArrowWindowPython={ga_win}",
        p_lf,
    )

    # 49. wave-38 shapes: events_anomaly_stl's median/deviation fan-out
    # must consume the checkpointed residual relation, never re-run
    # the corpus-scale daily agg (no raw events scan in the query
    # plan); text_fertility is one corpus scan + one exchange
    # (map-only derivation, map-side-combinable agg).
    p_an = plan_of(QUERIES["events_anomaly_stl"](spark, SF))
    an_event_scans = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", p_an) if "events" in s]
    )
    p_fe = plan_of(QUERIES["text_fertility"](spark, SF))
    fe_scans = len(re.findall(r"\(\d+\) Scan parquet", p_fe))
    fe_exch = len(re.findall(r"\(\d+\) Exchange", p_fe))
    check(
        "anomaly screen reads the residual checkpoint; fertility is "
        "one scan + one exchange",
        an_event_scans == 0 and fe_scans == 1 and fe_exch == 1,
        f"events_anomaly_stl raw events scans={an_event_scans} (want "
        f"0 — residuals checkpointed); text_fertility scans="
        f"{fe_scans} (want 1), exchanges={fe_exch} (want 1)",
        p_an,
    )

    # 50. wave-39 shapes: ml_auc derives AUC from ONE corpus scan to
    # the shared score support (rank-sum identity — never the n+*n-
    # pair join); stat_kendall's concordance join and tie windows
    # consume the checkpointed cell support, never re-scanning
    # lineitem; agg_kmv's bottom-k is TakeOrderedAndProject (per-
    # partition heaps) over the checkpointed hash relation (no
    # documents re-scan); events_survival is one events scan with
    # all risk-set/product math as windows over the duration support
    # (no corpus self-join).
    p_auc = plan_of(QUERIES["ml_auc"](spark, SF))
    auc_scans = len(re.findall(r"\(\d+\) Scan parquet", p_auc))
    p_kt = plan_of(QUERIES["stat_kendall"](spark, SF))
    kt_li_scans = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", p_kt)
         if "lineitem" in s]
    )
    p_kmv = plan_of(QUERIES["agg_kmv"](spark, SF))
    kmv_doc_scans = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", p_kmv)
         if "documents" in s]
    )
    kmv_top = "TakeOrderedAndProject" in p_kmv
    p_sv = plan_of(QUERIES["events_survival"](spark, SF))
    sv_scans = len(re.findall(r"\(\d+\) Scan parquet", p_sv))
    sv_smj = len(re.findall(r"SortMergeJoin", p_sv))
    check(
        "auc one scan via rank identity; kendall reads the cell "
        "checkpoint; kmv bottom-k is a per-partition heap; survival "
        "one scan no self-join",
        auc_scans == 1
        and kt_li_scans == 0
        and kmv_doc_scans == 0
        and kmv_top
        and sv_scans == 1
        and sv_smj == 0,
        f"ml_auc scans={auc_scans} (want 1); stat_kendall lineitem "
        f"scans={kt_li_scans} (want 0 — cells checkpointed); agg_kmv "
        f"documents scans={kmv_doc_scans} (want 0) "
        f"TakeOrderedAndProject={kmv_top}; events_survival scans="
        f"{sv_scans} (want 1) SortMergeJoin={sv_smj} (want 0)",
        p_auc,
    )

    # 51. wave-40 shapes: the model-eval quartet each scans its
    # corpus exactly once (confusion cells are conditional sums over
    # the shared support, calibration's min/max are OVER () windows,
    # kruskal's global tie-rank is the window pair, ndcg's discount
    # attach is an array-literal expression — NO join for the
    # 10-row discount table).
    scans40 = {}
    for k40 in ("ml_confusion", "stat_kruskal", "ml_calibration",
                "ml_ndcg"):
        p40 = plan_of(QUERIES[k40](spark, SF))
        scans40[k40] = len(re.findall(r"\(\d+\) Scan parquet", p40))
    p_ndcg = plan_of(QUERIES["ml_ndcg"](spark, SF))
    ndcg_joins = len(re.findall(r"Join", p_ndcg))
    check(
        "model-eval quartet one scan each; ndcg discounts are "
        "literals not a join",
        all(v == 1 for v in scans40.values()) and ndcg_joins == 0,
        f"scan counts {scans40} (want all 1); ml_ndcg Join nodes="
        f"{ndcg_joins} (want 0 — element_at over array literals)",
        p_ndcg,
    )

    # 52. wave-41 SQL-surface faces cost nothing over the DataFrame
    # spelling: pipe syntax still pushes its WHERE into the scan;
    # the SQL UDF is Catalyst-inlined (no Python eval node); the
    # bound :minv parameter still lands in PushedFilters; the dual
    # collated/binary DISTINCT plans as one Expand pass.
    p_pipe = plan_of(QUERIES["sql_pipe"](spark, SF))
    pipe_pushed = bool(
        re.search(r"PushedFilters: \[[^\]]*o_orderstatus", p_pipe)
    )
    p_sudf = plan_of(QUERIES["sql_udf"](spark, SF))
    sudf_nopython = "EvalPython" not in p_sudf
    p_prm = plan_of(QUERIES["sql_params"](spark, SF))
    prm_pushed = bool(
        re.search(r"PushedFilters: \[[^\]]*value", p_prm)
    )
    p_coll = plan_of(QUERIES["text_collation"](spark, SF))
    coll_expand = "Expand" in p_coll
    coll_scans = len(re.findall(r"\(\d+\) Scan parquet", p_coll))
    check(
        "pipe pushes filters; SQL UDF inlines; bound params push; "
        "collated dual-distinct is one Expand",
        pipe_pushed
        and sudf_nopython
        and prm_pushed
        and coll_expand
        and coll_scans == 1,
        f"sql_pipe pushed o_orderstatus={pipe_pushed}; sql_udf "
        f"python-free={sudf_nopython}; sql_params pushed value="
        f"{prm_pushed}; text_collation Expand={coll_expand} scans="
        f"{coll_scans} (want 1)",
        p_sudf,
    )

    # 53. wave-42 shapes: t-closeness marginals are windows over the
    # one cells relation (one scan, no group-by-status cross join);
    # encode_rle's run count reads the range-partitioned checkpoint
    # with per-pid windows (no raw lineitem scan; the only
    # SinglePartition exchange is the final 1-row agg); kappa rides
    # the shared support (one scan); simpson is one scan of
    # count-of-counts with no sort of the vocabulary.
    p_tc = plan_of(QUERIES["privacy_tcloseness"](spark, SF))
    tc_scans = len(re.findall(r"\(\d+\) Scan parquet", p_tc))
    tc_cart = ("CartesianProduct" in p_tc) or (
        "BroadcastNestedLoopJoin" in p_tc
    )
    p_rle = plan_of(QUERIES["encode_rle"](spark, SF))
    rle_li = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", p_rle)
         if "lineitem" in s]
    )
    rle_sp = len(re.findall(r"Exchange SinglePartition", p_rle))
    p_kap = plan_of(QUERIES["ml_cohen_kappa"](spark, SF))
    kap_scans = len(re.findall(r"\(\d+\) Scan parquet", p_kap))
    p_simp = plan_of(QUERIES["text_simpson"](spark, SF))
    simp_scans = len(re.findall(r"\(\d+\) Scan parquet", p_simp))
    check(
        "tcloseness windows over one cells scan; rle reads the "
        "ranged checkpoint; kappa and simpson one scan",
        tc_scans == 1
        and not tc_cart
        and rle_li == 0
        and rle_sp <= 1
        and kap_scans == 1
        and simp_scans == 1,
        f"privacy_tcloseness scans={tc_scans} (want 1) cross-join="
        f"{tc_cart} (want False); encode_rle lineitem scans={rle_li} "
        f"(want 0 — checkpointed) SinglePartition exchanges={rle_sp} "
        f"(want <=1, the 1-row agg); ml_cohen_kappa scans={kap_scans} "
        f"(want 1); text_simpson scans={simp_scans} (want 1)",
        p_tc,
    )

    # 54. wave-43 shapes: events_markov's power rounds consume the
    # checkpointed transition cells (no raw events scan; the only
    # nested-loop join is the 1-row state-count broadcast);
    # feat_robust_scale's fit-then-apply joins the tiny stats
    # relation by broadcast (no SortMergeJoin); scan_binaryfile's
    # returned plan reads the binaryFile source, not parquet.
    p_mk = plan_of(QUERIES["events_markov"](spark, SF))
    mk_ev = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", p_mk)
         if "events" in s]
    )
    mk_nl = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p_mk))
    p_rs = plan_of(QUERIES["feat_robust_scale"](spark, SF))
    rs_bhj = len(re.findall(r"BroadcastHashJoin", p_rs))
    rs_smj = len(re.findall(r"SortMergeJoin", p_rs))
    p_bf = plan_of(QUERIES["scan_binaryfile"](spark, SF))
    bf_bin = "binaryFile" in p_bf
    bf_parquet = len(re.findall(r"Scan parquet", p_bf))
    check(
        "markov reads the cell checkpoint; robust-scale broadcasts "
        "the fit; binaryfile plan reads binary not parquet",
        mk_ev == 0
        and mk_nl <= 1
        and rs_bhj >= 1
        and rs_smj == 0
        and bf_bin
        and bf_parquet == 0,
        f"events_markov events scans={mk_ev} (want 0) nested-loop="
        f"{mk_nl} (want <=1, the 1-row m); feat_robust_scale "
        f"BroadcastHashJoin={rs_bhj} (want >=1) SortMergeJoin="
        f"{rs_smj} (want 0); scan_binaryfile binary-source={bf_bin} "
        f"parquet scans={bf_parquet} (want 0)",
        p_mk,
    )

    # 55. wave-44 shapes: the Arrow UDF faces plan as Arrow eval
    # nodes (mapInArrow one scan + one exchange for the final agg;
    # applyInArrow exactly one exchange on the group key);
    # text_textrank's rounds and ranking consume the checkpointed
    # edge relation (no documents re-scan) and the top-20 is
    # TakeOrderedAndProject; ml_perplexity's vocabulary join is
    # UNHINTED (no forced broadcast of a corpus-cardinality
    # relation — the r3 text_unigram_lm lesson).
    p_ma = plan_of(QUERIES["udf_map_arrow"](spark, SF))
    ma_arrow = ("ArrowEvalPython" in p_ma) or ("MapInArrow" in p_ma)
    ma_scans = len(re.findall(r"\(\d+\) Scan parquet", p_ma))
    p_aa = plan_of(QUERIES["udf_apply_arrow"](spark, SF))
    aa_arrow = "Arrow" in p_aa
    aa_exch = len(re.findall(r"\(\d+\) Exchange", p_aa))
    p_tr = plan_of(QUERIES["text_textrank"](spark, SF))
    tr_docs = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", p_tr)
         if "documents" in s]
    )
    tr_top = "TakeOrderedAndProject" in p_tr
    import inspect as _inspect

    from dbpedia_spotlight_db_spark.queries import qml as _qml
    ppl_src = _inspect.getsource(_qml.ml_perplexity)
    ppl_unhinted = "broadcast(" not in ppl_src
    check(
        "arrow UDFs plan as Arrow nodes; textrank reads the edge "
        "checkpoint with heap top-k; perplexity vocab join unhinted",
        ma_arrow
        and ma_scans == 1
        and aa_arrow
        and aa_exch == 1
        and tr_docs == 0
        and tr_top
        and ppl_unhinted,
        f"udf_map_arrow arrow-node={ma_arrow} scans={ma_scans} (want "
        f"1); udf_apply_arrow arrow-node={aa_arrow} exchanges="
        f"{aa_exch} (want 1); text_textrank documents scans={tr_docs} "
        f"(want 0) TakeOrderedAndProject={tr_top}; ml_perplexity "
        f"source has no F.broadcast hint={ppl_unhinted}",
        p_tr,
    )

    # 56. wave-45 shapes: kg_local_bridges enumerates triangles off
    # the checkpointed pairs relation (no documents re-scan) and its
    # bridge anti-join is a real LeftAnti; stat_levene's median fit
    # broadcasts back (no SortMergeJoin); agg_mode is one scan with
    # a partitioned window (never single-partition); csv_permissive's
    # returned plan reads the csv scan (not parquet).
    p_lb = plan_of(QUERIES["kg_local_bridges"](spark, SF))
    lb_docs = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", p_lb)
         if "documents" in s]
    )
    lb_anti = "LeftAnti" in p_lb
    p_lv = plan_of(QUERIES["stat_levene"](spark, SF))
    lv_smj = len(re.findall(r"\(\d+\) SortMergeJoin", p_lv))
    lv_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", p_lv))
    p_md = plan_of(QUERIES["agg_mode"](spark, SF))
    md_scans = len(re.findall(r"\(\d+\) Scan parquet", p_md))
    md_single = "Exchange SinglePartition" in p_md
    p_cp = plan_of(QUERIES["csv_permissive"](spark, SF))
    cp_csv = "Scan csv" in p_cp
    cp_parquet = len(re.findall(r"Scan parquet", p_cp))
    check(
        "bridges read the pairs checkpoint with a real anti-join; "
        "levene broadcasts the fit; mode is one scan partitioned; "
        "permissive reads csv",
        lb_docs == 0
        and lb_anti
        and lv_smj == 0
        and lv_bhj >= 1
        and md_scans == 1
        and not md_single
        and cp_csv
        and cp_parquet == 0,
        f"kg_local_bridges documents scans={lb_docs} (want 0) "
        f"LeftAnti={lb_anti}; stat_levene SMJ={lv_smj} (want 0) "
        f"BHJ={lv_bhj} (want >=1); agg_mode scans={md_scans} (want 1) "
        f"single-partition={md_single} (want False); csv_permissive "
        f"csv-scan={cp_csv} parquet scans={cp_parquet} (want 0)",
        p_lb,
    )

    # 57. wave-46 shapes: stat_wilcoxon is one corpus scan (pairing
    # via min_by/max_by aggregation, never a per-user sort window);
    # ml_log_loss rides the shared one-scan support with min/max as
    # OVER () windows (no stats branch).
    p_wx = plan_of(QUERIES["stat_wilcoxon"](spark, SF))
    wx_scans = len(re.findall(r"\(\d+\) Scan parquet", p_wx))
    wx_win_sort = len(re.findall(r"\(\d+\) Window", p_wx))
    p_llz = plan_of(QUERIES["ml_log_loss"](spark, SF))
    ll_scans = len(re.findall(r"\(\d+\) Scan parquet", p_llz))
    check(
        "wilcoxon one scan with agg pairing; log loss one scan",
        wx_scans == 1 and wx_win_sort <= 1 and ll_scans == 1,
        f"stat_wilcoxon scans={wx_scans} (want 1) Window nodes="
        f"{wx_win_sort} (want <=1 — only the support-rank window, "
        f"no per-user window); ml_log_loss scans={ll_scans} (want 1)",
        p_wx,
    )

    # 58. wave-47 shapes: events_concurrency's sweep window is
    # PARTITIONED by event type (never a single-partition global
    # sort) over one corpus scan; json_permissive's returned plan
    # reads the json scan; agg_approx_quantile's rank recount reads
    # the cents checkpoint, not lineitem.
    p_cc = plan_of(QUERIES["events_concurrency"](spark, SF))
    cc_scans = len(re.findall(r"\(\d+\) Scan parquet", p_cc))
    cc_single = "Exchange SinglePartition" in p_cc
    p_jp = plan_of(QUERIES["json_permissive"](spark, SF))
    jp_json = "Scan json" in p_jp
    p_aq = plan_of(QUERIES["agg_approx_quantile"](spark, SF))
    aq_li = len(
        [s for s in re.findall(r"Scan parquet[^\n]*", p_aq)
         if "lineitem" in s]
    )
    check(
        "concurrency sweep partitioned; permissive-json reads json; "
        "approx-quantile certificate off the checkpoint",
        cc_scans == 1 and not cc_single and jp_json and aq_li == 0,
        f"events_concurrency scans={cc_scans} (want 1) "
        f"single-partition={cc_single} (want False); json_permissive "
        f"json-scan={jp_json}; agg_approx_quantile lineitem scans="
        f"{aq_li} (want 0 — checkpointed)",
        p_cc,
    )

    # 59. wave-48 shapes: embed_norms' census joins the tiny
    # per-label stats by broadcast (no SMJ) and the dims-exploded
    # relation is scanned once; stat_runs' LAG window runs over the
    # day-bounded series off one corpus scan.
    p_en = plan_of(QUERIES["embed_norms"](spark, SF))
    en_raw = len(
        [x for x in re.findall(r"Scan parquet[^\n]*", p_en)
         if "embeddings" in x]
    )
    en_smj = len(re.findall(r"\(\d+\) SortMergeJoin", p_en))
    p_rn = plan_of(QUERIES["stat_runs"](spark, SF))
    rn_raw = len(
        [x for x in re.findall(r"Scan parquet[^\n]*", p_rn)
         if "events" in x]
    )
    check(
        "embed-norms and runs test read their checkpoints, not the "
        "corpus twice",
        en_raw == 0 and en_smj == 0 and rn_raw == 0,
        f"embed_norms raw embeddings scans={en_raw} (want 0 — nv "
        f"checkpointed) SortMergeJoin={en_smj} (want 0); stat_runs "
        f"raw events scans={rn_raw} (want 0 — daily checkpointed)",
        p_en,
    )

    # 60. wave-49 shapes: join_null_safe's <=> must plan as a HASH
    # join (null-safe equality is hashable; the naive OR-rewrite
    # degenerates to nested-loop); agg_bool is one scan; crosscorr's
    # lag fan-out reads the checkpointed cells (no raw events scan)
    # and the day+lag align is an equi-join.
    p_ns = plan_of(QUERIES["join_null_safe"](spark, SF))
    ns_hash = (
        "BroadcastHashJoin" in p_ns or "ShuffledHashJoin" in p_ns
        or "SortMergeJoin" in p_ns
    )
    ns_nl = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p_ns))
    p_ab = plan_of(QUERIES["agg_bool"](spark, SF))
    ab_scans = len(re.findall(r"\(\d+\) Scan parquet", p_ab))
    p_xc = plan_of(QUERIES["events_crosscorr"](spark, SF))
    xc_raw = len(
        [x for x in re.findall(r"Scan parquet[^\n]*", p_xc)
         if "events" in x]
    )
    xc_nl = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p_xc))
    check(
        "null-safe join hashes; bool aggs one scan; crosscorr reads "
        "the cell checkpoint with equi-join alignment",
        ns_hash
        and ns_nl == 0
        and ab_scans == 1
        and xc_raw == 0
        and xc_nl == 0,
        f"join_null_safe hash-join={ns_hash} nested-loop={ns_nl} "
        f"(want 0); agg_bool scans={ab_scans} (want 1); "
        f"events_crosscorr raw events scans={xc_raw} (want 0) "
        f"nested-loop={xc_nl} (want 0)",
        p_ns,
    )

    # 61. wave-51 shapes: ml_mrr's per-user groupBy must REUSE the
    # window's user_id hash partitioning (corpus scan -> ONE exchange
    # -> window + agg), and privacy_dp_count is one scan / one
    # exchange with the noise arithmetic applied post-agg (no second
    # corpus branch, no window).
    p_mrr = plan_of(QUERIES["ml_mrr"](spark, SF))
    mrr_ex = len(re.findall(r"\(\d+\) Exchange", p_mrr))
    mrr_scans = len(re.findall(r"\(\d+\) Scan parquet", p_mrr))
    p_dp = plan_of(QUERIES["privacy_dp_count"](spark, SF))
    dp_ex = len(re.findall(r"\(\d+\) Exchange", p_dp))
    dp_scans = len(re.findall(r"\(\d+\) Scan parquet", p_dp))
    dp_win = len(re.findall(r"\(\d+\) Window", p_dp))
    check(
        "ml_mrr window+agg share one user_id exchange; dp_count is "
        "one scan/one exchange, no window",
        mrr_ex <= 2 and mrr_scans == 1
        and dp_ex == 1 and dp_scans == 1 and dp_win == 0,
        f"ml_mrr exchanges={mrr_ex} (want <=2: user hash + final "
        f"singleton) scans={mrr_scans} (want 1); privacy_dp_count "
        f"exchanges={dp_ex} scans={dp_scans} windows={dp_win}",
        p_mrr,
    )

    # 62. wave-52 shapes: join_bucketed's two save_bucketed sides
    # join with NO exchange of their own (bucket layout = pre-paid
    # shuffle; both scans report Bucketed: true, the only exchange
    # is the final rollup), and kg_harmonic's min-distance fold adds
    # no join beyond the single 2-hop frontier equi-join.
    p_jb = plan_of(QUERIES["join_bucketed"](spark, SF))
    jb_bucketed = p_jb.count("Bucketed: true")
    jb_smj = "SortMergeJoin" in p_jb
    jb_ex = len(re.findall(r"\(\d+\) Exchange", p_jb))
    check(
        "bucketed join: both scans bucketed, SMJ, only the rollup "
        "exchange",
        jb_bucketed >= 2 and jb_smj and jb_ex <= 1,
        f"join_bucketed Bucketed:true={jb_bucketed} (want >=2) "
        f"SortMergeJoin={jb_smj} exchanges={jb_ex} (want <=1 — the "
        f"final agg only)",
        p_jb,
    )

    # 63. wave-53..56 shapes: ml_ks and text_kn_bigram compute all
    # marginals as windows over their single-scan support and emit
    # top-1/top-20 via TakeOrderedAndProject (never a global sort);
    # sql_try_cast's try_* family stays JVM-side (no Python eval
    # node); kg_betweenness reaches distance-2 via one LeftAnti
    # against the edge set with no forced broadcast.
    p_ks = plan_of(QUERIES["ml_ks"](spark, SF))
    ks_scans = len(re.findall(r"\(\d+\) Scan parquet", p_ks))
    ks_topk = "TakeOrderedAndProject" in p_ks
    p_kn = plan_of(QUERIES["text_kn_bigram"](spark, SF))
    kn_scans = len(re.findall(r"\(\d+\) Scan parquet", p_kn))
    kn_topk = "TakeOrderedAndProject" in p_kn
    p_tc = plan_of(QUERIES["sql_try_cast"](spark, SF))
    tc_py = len(
        re.findall(r"BatchEvalPython|ArrowEvalPython", p_tc)
    )
    tc_scans = len(re.findall(r"\(\d+\) Scan parquet", p_tc))
    bw = QUERIES["kg_betweenness"](spark, SF)
    bw_logical = bw._jdf.queryExecution().optimizedPlan().toString()
    bw_forced = "ResolvedHint" in bw_logical or re.search(
        r"(?i)hints=\[broadcast", bw_logical
    )
    p_bw = plan_of(bw)
    bw_anti = "LeftAnti" in p_bw
    check(
        "ml_ks/kn_bigram single-scan + top-k; try_* JVM-side; "
        "betweenness unhinted anti-join",
        ks_scans == 1
        and ks_topk
        and kn_scans == 1
        and kn_topk
        and tc_py == 0
        and tc_scans == 1
        and bw_anti
        and not bw_forced,
        f"ml_ks scans={ks_scans} topk={ks_topk}; text_kn_bigram "
        f"scans={kn_scans} topk={kn_topk}; sql_try_cast "
        f"python-nodes={tc_py} scans={tc_scans}; kg_betweenness "
        f"LeftAnti={bw_anti} forced-broadcast={bool(bw_forced)}",
        p_ks,
    )

    # 64. wave-57..62 shapes: join_dpp must actually fire dynamic
    # partition pruning (a dynamicpruning expression in the fact
    # scan's PartitionFilters — the whole point of the face);
    # sql_named_window's three functions share ONE Window operator;
    # agg_grouping_id's rollup is a single Expand; sql_array_hof's
    # in-row lambdas add NO Generate (explode) node.
    p_dpp = QUERIES["join_dpp"](spark, SF)._jdf.queryExecution().toString()
    dpp_fires = "dynamicpruning" in p_dpp.lower()
    p_nw = (
        QUERIES["sql_named_window"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    nw_windows = len(re.findall(r"\bWindow\b", p_nw))
    p_gid = plan_of(QUERIES["agg_grouping_id"](spark, SF))
    gid_expand = len(re.findall(r"\(\d+\) Expand", p_gid))
    p_hof = plan_of(QUERIES["sql_array_hof"](spark, SF))
    hof_generate = "Generate" in p_hof
    hof_scans = len(re.findall(r"\(\d+\) Scan parquet", p_hof))
    check(
        "DPP fires; named window plans once; rollup single Expand; "
        "array HOFs stay in-row",
        dpp_fires
        and nw_windows == 1
        and gid_expand == 1
        and not hof_generate
        and hof_scans == 1,
        f"join_dpp dynamicpruning={dpp_fires}; sql_named_window "
        f"Window nodes={nw_windows} (want 1); agg_grouping_id "
        f"Expand={gid_expand} (want 1); sql_array_hof Generate="
        f"{hof_generate} (want False) scans={hof_scans}",
        p_nw,
    )

    # 65. wave-64..66 shapes: nested-schema pruning keeps the text
    # payload out of ReadSchema; the SHUFFLE_HASH hint actually
    # flips the strategy; TRANSFORM plans a ScriptTransformation;
    # theilsen's quadratic pair join is calendar-sized (the corpus
    # scan collapses to the daily agg BEFORE the self-join — one
    # parquet scan only).
    p_np = (
        QUERIES["scan_nested_prune"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    np_rs = [ln for ln in p_np.splitlines() if "ReadSchema" in ln]
    np_pruned = bool(np_rs) and "text" not in np_rs[0]
    p_sh = (
        QUERIES["join_shuffle_hash"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    sh_ok = "ShuffledHashJoin" in p_sh and "SortMergeJoin" not in p_sh
    p_ts = plan_of(QUERIES["stat_theilsen"](spark, SF))
    ts_scans = p_ts.count("events.parquet")
    p_tr = (
        QUERIES["sql_transform_script"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    tr_ok = "ScriptTransformation" in p_tr
    check(
        "nested pruning drops payload; shuffle-hash hint lands; "
        "script transform plans; theilsen reads the daily checkpoint",
        np_pruned and sh_ok and ts_scans == 0 and tr_ok,
        f"scan_nested_prune ReadSchema-no-text={np_pruned}; "
        f"join_shuffle_hash SHJ-not-SMJ={sh_ok}; stat_theilsen "
        f"raw events scans={ts_scans} (want 0 — checkpointed); "
        f"sql_transform_script "
        f"ScriptTransformation={tr_ok}",
        p_np,
    )

    # 66. wave-67..75 shapes: events_m4 is ONE map-side agg (no
    # Window, no sort); lake_content_digest is map-only single-scan;
    # text_vocab_coverage windows ride the vocab relation, never a
    # second corpus scan; events_stickiness reads its checkpointed
    # user-day distinct (0 raw events scans).
    p_m4 = plan_of(QUERIES["events_m4"](spark, SF))
    m4_win = len(re.findall(r"\(\d+\) Window", p_m4))
    m4_scans = len(re.findall(r"\(\d+\) Scan parquet", p_m4))
    p_dg = plan_of(QUERIES["lake_content_digest"](spark, SF))
    dg_scans = len(re.findall(r"\(\d+\) Scan parquet", p_dg))
    dg_ex = len(re.findall(r"\(\d+\) Exchange", p_dg))
    p_vc = plan_of(QUERIES["text_vocab_coverage"](spark, SF))
    vc_scans = p_vc.count("documents.parquet")
    p_st = plan_of(QUERIES["events_stickiness"](spark, SF))
    st_raw = p_st.count("events.parquet")
    check(
        "M4 windowless single agg; digest map-only; vocab coverage "
        "one corpus scan; stickiness checkpointed",
        m4_win == 0
        and m4_scans == 1
        and dg_scans == 1
        and dg_ex == 1
        and vc_scans == 1
        and st_raw == 0,
        f"events_m4 windows={m4_win} scans={m4_scans}; "
        f"lake_content_digest scans={dg_scans} exchanges={dg_ex}; "
        f"text_vocab_coverage documents scans={vc_scans} (want 1); "
        f"events_stickiness raw events scans={st_raw} (want 0)",
        p_m4,
    )

    # 67. wedge degree cap (VERDICT r4 "What's wrong" #1): every
    # wedge-/hop-generating graph face runs its self-join on the
    # deg <= KG_WEDGE_DEG_CAP induced subgraph. The cap is two
    # left-semi joins against the keep set applied BELOW the wedge
    # join by construction (their (src,dst) output feeds it), so the
    # pin is: >= 2 LeftSemi joins in the optimized plan AND the cap
    # literal in a Filter — and the |V|-sized degree marginals attach
    # UNHINTED: the ONLY broadcast-hinted joins allowed are the
    # model-dictionary sf=sf attaches inside _GRAMS (model-sized,
    # intentional); a hint on any uri-/degree-keyed join is the
    # vocabulary-broadcast footgun this check exists to catch.
    from dbpedia_spotlight_db_spark.queries.qpipe import KG_WEDGE_DEG_CAP

    wedge_detail = []
    wedge_ok = True
    for wk in (
        "kg_adamic_adar",
        "kg_node_sim",
        "kg_betweenness",
        "kg_harmonic",
        "kg_khop",
    ):
        wq = QUERIES[wk](spark, SF)
        opt = wq._jdf.queryExecution().optimizedPlan().toString()
        n_semi = len(re.findall(r"Join LeftSemi", opt))
        has_cap = f"<= {KG_WEDGE_DEG_CAP}" in opt
        bad_hints = [
            ln.strip()[:120]
            for ln in opt.splitlines()
            if "Hint=(strategy=" in ln
            and not re.search(r"\(sf#\d+ = sf#\d+\)", ln)
        ]
        ok = n_semi >= 2 and has_cap and not bad_hints
        wedge_ok &= ok
        wedge_detail.append(
            f"{wk} LeftSemi={n_semi} (want >=2) cap-filter={has_cap} "
            f"non-dictionary-hinted-joins={len(bad_hints)} (want 0)"
        )
    check(
        "wedge faces run on the degree-capped induced subgraph, "
        "marginals unhinted",
        wedge_ok,
        "; ".join(wedge_detail),
    )

    # 68. AQE skew-join split FIRES on join_skew_aqe's join shape
    # (the join_dpp discipline: a scale-mechanism face must prove its
    # mechanism); agg_approx_pctl_cert reads its cents checkpoint
    # (two consumers — GK agg + rank count — zero raw events scans).
    import os as _os
    import tempfile as _tempfile

    _skew_confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    _old = {k: spark.conf.get(k, None) for k in _skew_confs}
    try:
        for k, v in _skew_confs.items():
            spark.conf.set(k, v)
        _ev = spark.read.parquet(f"{SF}/events.parquet").select(
            F.when(F.col("event_id") % 10 < 8, F.lit("hot"))
            .otherwise(F.col("event_type"))
            .alias("k"),
            "event_id",
        )
        _amp = _ev.select(
            "k",
            "event_id",
            F.explode(F.sequence(F.lit(1), F.lit(64))).alias("rep"),
        ).repartition(8)
        with _tempfile.TemporaryDirectory(prefix="audit_skew_") as _tmp:
            _dimp = _os.path.join(_tmp, "dim")
            _ev.select("k").distinct().withColumn(
                "tag", F.length("k")
            ).write.parquet(_dimp)
            _dim = spark.read.parquet(_dimp)
            _out = _amp.join(_dim, "k").agg(
                F.count(F.lit(1)).alias("n")
            )
            _out.collect()
            p_sk = _out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in _old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    sk_fired = "skew=true" in p_sk and "AQEShuffleRead skewed" in p_sk
    p_ap = plan_of(QUERIES["agg_approx_pctl_cert"](spark, SF))
    ap_raw = p_ap.count("events.parquet")
    check(
        "AQE skew-join split fires on the hot-key join; approx-pctl "
        "certificate reads its checkpoint",
        sk_fired and ap_raw == 0,
        f"join_skew_aqe skew=true+skewed-read={sk_fired}; "
        f"agg_approx_pctl_cert raw events scans={ap_raw} (want 0)",
        p_sk,
    )

    # 69. wave 83: mix_dsir reads its tokenized checkpoint (zero raw
    # documents scans — the two-consumer rule), DW plans exactly one
    # Window (the LAG over the post-agg daily relation), and
    # approx_top_k aggregates in two phases (partial sketch merge
    # before the single-row final — map-side combine of the sketch
    # buffer, never a shuffle of raw rows)
    p_ds = plan_of(QUERIES["mix_dsir"](spark, SF))
    ds_raw = p_ds.count("documents.parquet")
    p_dw = (
        QUERIES["stat_durbin_watson"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    dw_windows = len(re.findall(r"\bWindow\b", p_dw))
    p_tk = plan_of(QUERIES["agg_approx_topk"](spark, SF))
    tk_two_phase = "partial_approx_top_k" in p_tk or (
        "approx_top_k" in p_tk and "partial" in p_tk.lower()
    )
    check(
        "wave 83: DSIR checkpoint consumers, single DW window, "
        "two-phase approx_top_k",
        ds_raw == 0 and dw_windows == 1 and tk_two_phase,
        f"mix_dsir raw documents scans={ds_raw} (want 0); "
        f"stat_durbin_watson Window nodes={dw_windows} (want 1); "
        f"approx_top_k two-phase={tk_two_phase}",
        p_ds,
    )

    # 70. wave 84: the two engine-native scale mechanisms fire with
    # the faces' conf recipe (parquet aggregate pushdown answers
    # MIN/MAX/COUNT from footer stats; Catalyst injects its runtime
    # bloom filter on the shuffle join), RAKE reads its island
    # checkpoint (zero raw documents scans), and Granger's two LAGs
    # share ONE Window operator.
    _k_push = "spark.sql.parquet.aggregatePushdown"
    _k_v1 = "spark.sql.sources.useV1SourceList"
    _prev_push, _prev_v1 = spark.conf.get(_k_push), spark.conf.get(_k_v1)
    spark.conf.set(_k_push, "true")
    spark.conf.set(
        _k_v1,
        ",".join(s for s in _prev_v1.split(",") if s.strip() != "parquet"),
    )
    try:
        _agg = spark.read.parquet(f"{SF}/orders.parquet").agg(
            F.min("o_totalprice"), F.max("o_totalprice"),
            F.count(F.lit(1)),
        )
        _p_push = _agg._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(_k_push, _prev_push)
        spark.conf.set(_k_v1, _prev_v1)
    push_fired = "PushedAggregation: [MIN" in _p_push
    _bf_confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    _bf_prev = {k: spark.conf.get(k, None) for k in _bf_confs}
    for k, v in _bf_confs.items():
        spark.conf.set(k, v)
    try:
        _fact = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        _dim = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        _j = _fact.join(_dim, _fact.l_orderkey == _dim.o_orderkey).agg(
            F.count(F.lit(1)).alias("n")
        )
        _p_bf = _j._jdf.queryExecution().optimizedPlan().toString()
    finally:
        for k, v in _bf_prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    bloom_fired = (
        "might_contain" in _p_bf and "bloom_filter_agg" in _p_bf
    )
    p_rake = plan_of(QUERIES["text_rake"](spark, SF))
    rake_raw = p_rake.count("documents.parquet")
    p_gr = (
        QUERIES["stat_granger"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    gr_windows = len(re.findall(r"\bWindow\b", p_gr))
    check(
        "wave 84: aggregate pushdown + runtime bloom fire; RAKE reads "
        "its checkpoint; Granger LAGs share one Window",
        push_fired and bloom_fired and rake_raw == 0 and gr_windows == 1,
        f"PushedAggregation={push_fired}; bloom inject={bloom_fired}; "
        f"text_rake raw documents scans={rake_raw} (want 0); "
        f"stat_granger Window nodes={gr_windows} (want 1)",
        _p_bf,
    )

    # 71. wave 85: the SQL table function inlines to scan -> Generate
    # (one corpus scan, zero joins — the UNION-ALL body shape planned
    # 3 scans, measured); Bartlett and the minhash-merge certificate
    # are each ONE corpus scan with no join/window (conditional aggs
    # carry the halves).
    p_tf = (
        QUERIES["sql_table_udf"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    tf_scans = len(re.findall(r"FileScan parquet", p_tf))
    tf_gen = len(re.findall(r"\bGenerate\b", p_tf))
    tf_join = len(re.findall(r"Join", p_tf))
    p_bt = (
        QUERIES["stat_bartlett"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    bt_scans = len(re.findall(r"FileScan parquet", p_bt))
    bt_join = len(re.findall(r"Join", p_bt))
    p_mm = (
        QUERIES["dedup_minhash_merge"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    mm_scans = len(re.findall(r"FileScan parquet", p_mm))
    mm_join = len(re.findall(r"Join", p_mm))
    mm_win = len(re.findall(r"\bWindow\b", p_mm))
    check(
        "wave 85: table function inlines to one scan + Generate; "
        "Bartlett and minhash-merge are single-scan join-free",
        tf_scans == 1 and tf_gen >= 1 and tf_join == 0
        and bt_scans == 1 and bt_join == 0
        and mm_scans == 1 and mm_join == 0 and mm_win == 0,
        f"sql_table_udf scans={tf_scans} (want 1) Generate={tf_gen} "
        f"joins={tf_join} (want 0); stat_bartlett scans={bt_scans} "
        f"joins={bt_join}; dedup_minhash_merge scans={mm_scans} "
        f"joins={mm_join} windows={mm_win}",
        p_tf,
    )

    # 72. wave 86: the chunked range join plans NO nested-loop
    # operator (the whole point — interval overlap as equi-join on
    # chunk + residual), burn-rate runs one corpus scan + one Window
    # over the hourly relation, and the struct-returning pandas UDF
    # crosses the Arrow hop exactly once.
    p_rc = (
        QUERIES["join_range_chunked"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    rc_nested = (
        "BroadcastNestedLoopJoin" in p_rc or "CartesianProduct" in p_rc
    )
    rc_gen = len(re.findall(r"\bGenerate\b", p_rc))
    p_br = (
        QUERIES["events_burn_rate"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    br_scans = len(re.findall(r"FileScan parquet", p_br))
    br_win = len(re.findall(r"\bWindow\b", p_br))
    p_su = (
        QUERIES["udf_struct_return"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    su_arrow = len(re.findall(r"ArrowEvalPython", p_su))
    su_rowpy = len(re.findall(r"BatchEvalPython", p_su))
    check(
        "wave 86: chunked range join has no nested loop; burn-rate "
        "single scan + one window; struct UDF one Arrow hop",
        not rc_nested and rc_gen >= 1
        and br_scans == 1 and br_win == 1
        and su_arrow == 1 and su_rowpy == 0,
        f"join_range_chunked nested-loop={rc_nested} (want False) "
        f"Generate={rc_gen}; events_burn_rate scans={br_scans} "
        f"windows={br_win}; udf_struct_return ArrowEvalPython="
        f"{su_arrow} (want 1) BatchEvalPython={su_rowpy} (want 0)",
        p_rc,
    )

    # 73. wave 87: PyDS filter pushdown leaves only the residual in
    # the post-scan Filter (the accepted bound is never re-checked);
    # the variant census plans exactly one Generate (the lateral
    # variant_explode) over one scan.
    _pd_key = "spark.sql.python.filterPushdown.enabled"
    _pd_prev = spark.conf.get(_pd_key, None)
    spark.conf.set(_pd_key, "true")
    try:
        from dbpedia_spotlight_db_spark.sources import pushdown_ints

        pushdown_ints.register(spark)
        _pd_df = (
            spark.read.format("pushdown_ints")
            .option("n", 1000)
            .option("parts", 4)
            .load()
            .filter((F.col("id") >= 750) & (F.col("id") % 2 == 0))
        )
        p_pd = _pd_df._jdf.queryExecution().executedPlan().toString()
    finally:
        if _pd_prev is None:
            spark.conf.unset(_pd_key)
        else:
            spark.conf.set(_pd_key, _pd_prev)
    _pd_filter_lines = [
        ln for ln in p_pd.splitlines() if "Filter" in ln
    ]
    pd_residual_ok = bool(_pd_filter_lines) and all(
        ">= 750" not in ln for ln in _pd_filter_lines
    )
    p_vc = (
        QUERIES["json_variant_census"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    vc_gen = len(re.findall(r"\bGenerate\b", p_vc))
    vc_scans = len(re.findall(r"FileScan parquet", p_vc))
    check(
        "wave 87: PyDS pushdown drops the accepted bound from the "
        "residual Filter; variant census is scan -> Generate -> agg",
        pd_residual_ok and vc_gen == 1 and vc_scans == 1,
        f"pyds residual Filter lacks pushed bound={pd_residual_ok}; "
        f"json_variant_census Generate={vc_gen} (want 1) "
        f"scans={vc_scans} (want 1)",
        p_pd,
    )

    # 74. wave 88: the two ECDF statistics run one corpus scan each
    # with their window chain over the support-sized relation (no
    # join, no second scan); output-sizing reads its checkpoint.
    for _k in ("stat_wasserstein", "stat_cvm"):
        _p = (
            QUERIES[_k](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        _scans = len(re.findall(r"FileScan parquet", _p))
        _joins = len(re.findall(r"Join", _p))
        check(
            f"wave 88: {_k} single-scan join-free ECDF chain",
            _scans == 1 and _joins == 0,
            f"{_k} scans={_scans} (want 1) joins={_joins} (want 0)",
        )
    p_os = plan_of(QUERIES["lake_output_sizing"](spark, SF))
    os_raw = p_os.count("events.parquet")
    check(
        "wave 88: lake_output_sizing returns its checkpoint, not a "
        "raw corpus scan",
        os_raw == 0,
        f"lake_output_sizing raw events scans={os_raw} (want 0)",
    )

    # 75. wave 89: the in-row moment fold is explode-free (zero
    # Generate — the whole point vs the posexplode formulation) on
    # one scan; the permutation fan-out explodes the CALENDAR-sized
    # daily relation, never the corpus (Generate sits above the
    # day-grouped aggregate).
    p_im = (
        QUERIES["text_inrow_moments"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    im_gen = len(re.findall(r"\bGenerate\b", p_im))
    im_scans = len(re.findall(r"FileScan parquet", p_im))
    p_pt = (
        QUERIES["stat_perm_test"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    _gen_pos = p_pt.find("Generate")
    _agg_pos = p_pt.rfind("HashAggregate")
    pt_gen_above_agg = 0 <= _gen_pos < _agg_pos
    check(
        "wave 89: in-row moments explode-free; permutation fan-out "
        "sits above the daily aggregate",
        im_gen == 0 and im_scans == 1 and pt_gen_above_agg,
        f"text_inrow_moments Generate={im_gen} (want 0) "
        f"scans={im_scans} (want 1); stat_perm_test Generate-above-"
        f"bottom-aggregate={pt_gen_above_agg}",
        p_im,
    )

    # 76. wave 90: the pandas-API face plans the same one-scan
    # shuffle-agg a DataFrame face would (no Python eval anywhere —
    # pyspark.pandas compiles to Catalyst); PACF is one scan with
    # its windows over the calendar relation; wholetext returns its
    # checkpoint.
    p_ps = (
        QUERIES["ps_api_groupby"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ps_py = len(re.findall(r"EvalPython|ArrowEval", p_ps))
    ps_scans = len(re.findall(r"FileScan parquet", p_ps))
    p_pf = (
        QUERIES["stat_pacf"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf_scans = len(re.findall(r"FileScan parquet", p_pf))
    pf_joins = len(re.findall(r"Join", p_pf))
    p_wt = plan_of(QUERIES["scan_wholetext"](spark, SF))
    wt_raw = p_wt.count("documents.parquet")
    check(
        "wave 90: pandas-API face is pure Catalyst one-scan; PACF "
        "single-scan join-free; wholetext checkpointed",
        ps_py == 0 and ps_scans == 1
        and pf_scans == 1 and pf_joins == 0 and wt_raw == 0,
        f"ps_api_groupby python-nodes={ps_py} (want 0) scans="
        f"{ps_scans} (want 1); stat_pacf scans={pf_scans} joins="
        f"{pf_joins}; scan_wholetext raw documents scans={wt_raw}",
        p_ps,
    )

    # 77. wave 91: both carried as-of columns share ONE Window
    # operator (two last_values over the identical spec — a second
    # Window would double the sort); the native-moments face is one
    # scan with the native and exact aggregates fused into a single
    # HashAggregate pair.
    p_at = (
        QUERIES["join_asof_tolerance"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    at_windows = len(re.findall(r"\bWindow\b", p_at))
    p_nm = (
        QUERIES["agg_native_moments"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    nm_scans = len(re.findall(r"FileScan parquet", p_nm))
    nm_aggs = len(re.findall(r"HashAggregate|SortAggregate", p_nm))
    check(
        "wave 91: tolerance as-of keeps one Window; native moments "
        "fuse into one two-phase aggregate over one scan",
        at_windows == 1 and nm_scans == 1 and nm_aggs <= 2,
        f"join_asof_tolerance Window nodes={at_windows} (want 1); "
        f"agg_native_moments scans={nm_scans} (want 1) "
        f"agg nodes={nm_aggs} (want <=2)",
        p_at,
    )

    # 78. wave 92: the parse_url and xpath families stay pure
    # map-side expressions into one two-phase aggregate — no Python
    # nodes, no Generate, one scan each (the whole point of
    # function-level extraction vs parser UDFs in the hot path).
    for _k in ("url_parse_fns", "xml_xpath"):
        _p = (
            QUERIES[_k](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        _scans = len(re.findall(r"FileScan parquet", _p))
        _py = len(re.findall(r"EvalPython|ArrowEval", _p))
        _gen = len(re.findall(r"\bGenerate\b", _p))
        check(
            f"wave 92: {_k} is a map-side function chain",
            _scans == 1 and _py == 0 and _gen == 0,
            f"{_k} scans={_scans} (want 1) python-nodes={_py} "
            f"(want 0) Generate={_gen} (want 0)",
        )

    # 79. wave 93: the AQE conversion face reads its checkpoint (the
    # mechanism evidence lives in the hashed booleans, earned at
    # eager execution); Mahalanobis broadcasts the 1-row moment
    # relation onto the corpus (BNLJ on a 1-row side IS the
    # broadcast attach — what must NOT appear is a shuffle of the
    # corpus for the attach) and takes top-20 without a global sort.
    p_aq = plan_of(QUERIES["join_aqe_bhj_convert"](spark, SF))
    aq_raw = p_aq.count("lineitem.parquet")
    p_mh = (
        QUERIES["stat_mahalanobis"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    mh_topk = "TakeOrderedAndProject" in p_mh
    mh_sort_global = len(re.findall(r"\bSort\b.*global=true", p_mh))
    check(
        "wave 93: AQE face checkpointed; Mahalanobis top-k without "
        "a global sort",
        aq_raw == 0 and mh_topk and mh_sort_global == 0,
        f"join_aqe_bhj_convert raw lineitem scans={aq_raw} (want 0); "
        f"stat_mahalanobis TakeOrderedAndProject={mh_topk} "
        f"global-sorts={mh_sort_global} (want 0)",
        p_mh,
    )

    # 80. wave 94: kg_simrank runs entirely on the capped subgraph
    # checkpoints — zero raw documents scans in the returned plan
    # (ce and cn each feed 2+ consumers), and the top-20 takes
    # TakeOrderedAndProject, not a global sort.
    p_sr = plan_of(QUERIES["kg_simrank"](spark, SF))
    sr_raw = p_sr.count("documents.parquet")
    sr_topk = "TakeOrderedAndProject" in p_sr
    check(
        "wave 94: simrank reads its checkpoints and top-ks without "
        "a global sort",
        sr_raw == 0 and sr_topk,
        f"kg_simrank raw documents scans={sr_raw} (want 0) "
        f"TakeOrderedAndProject={sr_topk}",
        p_sr,
    )

    # 81. wave 95: EB shrinkage is one corpus scan (the prior fit
    # and the per-segment attach both run on the k-sized relation);
    # split sizing returns its checkpoint.
    p_eb = (
        QUERIES["stat_eb_shrinkage"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    eb_raw = p_eb.count("events.parquet")
    p_ss = plan_of(QUERIES["scan_split_sizing"](spark, SF))
    ss_raw = p_ss.count("events.parquet")
    check(
        "wave 95: EB shrinkage reads its segment checkpoint (two "
        "consumers); split-sizing checkpointed",
        eb_raw == 0 and ss_raw == 0,
        f"stat_eb_shrinkage raw events scans={eb_raw} (want 0); "
        f"scan_split_sizing raw events scans={ss_raw} (want 0)",
    )

    # 82. wave 96: the try_element_at probe is in-row (no Generate,
    # one scan — the whole point vs exploding to find the k-th
    # token); the Arrow-batching face returns its checkpoint; the
    # mono-id certificate runs one scan with its per-partition
    # window.
    p_te = (
        QUERIES["sql_try_element_at"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    te_gen = len(re.findall(r"\bGenerate\b", p_te))
    te_scans = len(re.findall(r"FileScan parquet", p_te))
    p_ab = plan_of(QUERIES["udf_arrow_batching"](spark, SF))
    ab_raw = p_ab.count("events.parquet")
    p_mi = (
        QUERIES["mono_id_contract"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    mi_scans = len(re.findall(r"FileScan parquet", p_mi))
    mi_win = len(re.findall(r"\bWindow\b", p_mi))
    check(
        "wave 96: try_element_at in-row; arrow-batching "
        "checkpointed; mono-id one scan + one window",
        te_gen == 0 and te_scans == 1 and ab_raw == 0
        and mi_scans == 1 and mi_win == 1,
        f"sql_try_element_at Generate={te_gen} scans={te_scans}; "
        f"udf_arrow_batching raw events scans={ab_raw} (want 0); "
        f"mono_id_contract scans={mi_scans} windows={mi_win}",
    )

    # 83. wave 97: the HLL certificate fuses exact + sketch into one
    # two-phase aggregate over one scan; the G-test is single-scan
    # with its windows over the |langs| relation; linear attribution
    # counts touches as a purchase-keyed window, never a second join.
    p_cd = (
        QUERIES["agg_approx_cd_cert"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    cd_scans = len(re.findall(r"FileScan parquet", p_cd))
    p_gt = (
        QUERIES["stat_gtest"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    gt_scans = len(re.findall(r"FileScan parquet", p_gt))
    gt_joins = len(re.findall(r"Join", p_gt))
    p_al = (
        QUERIES["events_attribution_linear"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    al_joins = len(re.findall(r"Join", p_al))
    al_win = len(re.findall(r"\bWindow\b", p_al))
    check(
        "wave 97: HLL-cert single scan; G-test join-free; linear "
        "attribution one join + one window",
        cd_scans == 1 and gt_scans == 1 and gt_joins == 0
        and al_joins == 1 and al_win == 1,
        f"agg_approx_cd_cert scans={cd_scans} (want 1); stat_gtest "
        f"scans={gt_scans} joins={gt_joins}; "
        f"events_attribution_linear joins={al_joins} (want 1) "
        f"windows={al_win} (want 1)",
    )

    # 84. wave 98: CBO face reads its checkpoint (the mechanism
    # evidence lives in the hashed boolean); crosstab's unpivot adds
    # no Python nodes and one corpus scan feeds the wide pass.
    p_cb = plan_of(QUERIES["join_cbo_reorder"](spark, SF))
    cb_raw = (
        p_cb.count("orders.parquet")
        + p_cb.count("customer.parquet")
        + p_cb.count("nation.parquet")
    )
    p_xt = (
        QUERIES["stat_api_crosstab"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    xt_py = len(re.findall(r"EvalPython|ArrowEval", p_xt))
    check(
        "wave 98: CBO face checkpointed; crosstab unpivot stays "
        "JVM-side",
        cb_raw == 0 and xt_py == 0,
        f"join_cbo_reorder raw scans={cb_raw} (want 0); "
        f"stat_api_crosstab python-nodes={xt_py} (want 0)",
    )

    # 85. wave 99: AES roundtrip is map-only (the cipher runs inside
    # codegen — zero Exchange, zero Python nodes); the lateral-alias
    # chain inlines to ONE Project with the filter still pushed to
    # the scan; cronbach is one scan, zero Window (power sums in one
    # agg); the F1 sweep touches the corpus once.
    p_ae = (
        QUERIES["sql_aes_roundtrip"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ae_ex = len(re.findall(r"Exchange", p_ae))
    ae_py = len(re.findall(r"EvalPython|ArrowEval", p_ae))
    p_la = (
        QUERIES["sql_lateral_alias"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    la_stages = len(set(re.findall(r"\*\((\d+)\)", p_la)))
    la_ex = len(re.findall(r"Exchange", p_la))
    la_join = len(re.findall(r"\bJoin\b", p_la))
    la_pushed = "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in p_la
    p_cr = (
        QUERIES["stat_cronbach"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    cr_scans = len(re.findall(r"FileScan parquet", p_cr))
    cr_win = len(re.findall(r"\bWindow\b", p_cr))
    p_f1 = (
        QUERIES["ml_f1_sweep"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    f1_scans = len(re.findall(r"FileScan parquet", p_f1))
    check(
        "wave 99: AES map-only JVM-side; lateral alias fused to one "
        "codegen stage + pushed filter; cronbach one scan zero Window; "
        "F1 sweep one scan",
        ae_ex == 0 and ae_py == 0 and la_stages == 1 and la_ex == 0
        and la_join == 0 and la_pushed and cr_scans == 1 and cr_win == 0
        and f1_scans == 1,
        f"sql_aes_roundtrip Exchange={ae_ex} python={ae_py} (want 0/0); "
        f"sql_lateral_alias codegen-stages={la_stages} (want 1) "
        f"Exchange={la_ex} Join={la_join} pushed={la_pushed}; "
        f"stat_cronbach scans={cr_scans} windows={cr_win}; "
        f"ml_f1_sweep scans={f1_scans} (want 1)",
    )

    # 86. wave 100: the AQE-coalesce face returns its checkpoint (the
    # runtime evidence lives in the hashed booleans — no raw re-scan);
    # the exact-regime histogram is one corpus scan; the MLlib
    # pipeline transform is map-only (labels baked as literals — no
    # join, no Python); column stats return collected literals (no
    # FileScan at all in the returned plan).
    p_ac = (
        QUERIES["agg_aqe_coalesce"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ac_raw = p_ac.count("orders.parquet")
    p_hn = (
        QUERIES["agg_hist_numeric"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    hn_scans = len(re.findall(r"FileScan parquet", p_hn))
    p_mp = (
        QUERIES["mllib_feature_pipeline"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    mp_join = len(re.findall(r"\bJoin\b", p_mp))
    mp_py = len(re.findall(r"EvalPython|ArrowEval", p_mp))
    p_cs = (
        QUERIES["sql_column_stats"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    cs_scans = len(re.findall(r"FileScan parquet", p_cs))
    check(
        "wave 100: AQE-coalesce checkpointed; exact-regime histogram one "
        "scan; MLlib transform join-free JVM-side; column stats literal",
        ac_raw == 0 and hn_scans == 1 and mp_join == 0 and mp_py == 0
        and cs_scans == 0,
        f"agg_aqe_coalesce raw scans={ac_raw} (want 0); agg_hist_numeric "
        f"scans={hn_scans} (want 1); mllib_feature_pipeline joins={mp_join} "
        f"python={mp_py} (want 0/0); sql_column_stats FileScans={cs_scans} "
        f"(want 0)",
    )

    # 87. wave 101: Fisher's returned plan never re-touches the raw
    # corpus (cells collected, log-factorials checkpointed — 5
    # consumers) and carries exactly the 4 support-to-lf joins; the
    # pandas-on-Spark rolling compiles to ONE Catalyst Window with
    # zero Python nodes.
    p_fi = (
        QUERIES["stat_fisher_exact"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    fi_raw = p_fi.count("orders.parquet")
    fi_joins = len(re.findall(r"HashJoin|SortMergeJoin|NestedLoop", p_fi))
    p_pr = (
        QUERIES["ps_api_rolling"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pr_py = len(re.findall(r"EvalPython|ArrowEval", p_pr))
    pr_win = len(re.findall(r"\bWindow\b", p_pr))
    check(
        "wave 101: Fisher checkpointed + exactly 4 lf joins; ps rolling "
        "one Window zero Python",
        fi_raw == 0 and fi_joins == 4 and pr_py == 0 and pr_win == 1,
        f"stat_fisher_exact raw scans={fi_raw} (want 0) joins={fi_joins} "
        f"(want 4); ps_api_rolling python={pr_py} (want 0) "
        f"windows={pr_win} (want 1)",
    )

    # 88. wave 102: the Arrow UDTF really crosses via Arrow (node is
    # ArrowEvalPythonUDTF, never the pickled BatchEval) over one
    # pruned scan with zero Exchange; Cochran's Q is one scan;
    # ignore-missing returns its checkpoint; interval arithmetic is
    # map-only (zero Exchange).
    p_au = (
        QUERIES["udtf_arrow_split"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    au_arrow = "ArrowEvalPythonUDTF" in p_au
    au_pickled = "BatchEvalPythonUDTF" in p_au
    au_ex = len(re.findall(r"Exchange", p_au))
    p_cq = (
        QUERIES["stat_cochran_q"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    cq_scans = len(re.findall(r"FileScan parquet", p_cq))
    p_im = (
        QUERIES["scan_ignore_missing"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    im_raw = p_im.count("documents.parquet")
    p_ia = (
        QUERIES["date_interval_arith"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ia_ex = len(re.findall(r"Exchange", p_ia))
    check(
        "wave 102: UDTF crosses via Arrow, zero Exchange; Cochran one "
        "scan; ignore-missing checkpointed; interval arith map-only",
        au_arrow and not au_pickled and au_ex == 0 and cq_scans == 1
        and im_raw == 0 and ia_ex == 0,
        f"udtf_arrow_split arrow={au_arrow} pickled={au_pickled} "
        f"Exchange={au_ex}; stat_cochran_q scans={cq_scans} (want 1); "
        f"scan_ignore_missing raw scans={im_raw} (want 0); "
        f"date_interval_arith Exchange={ia_ex} (want 0)",
    )

    # 89. wave 103: try_sum plans with a partial before the shuffle
    # (the try_ forms must not forfeit map-side combine); Page's
    # trend reads its daily checkpoint (no raw events re-scan in the
    # returned plan); exec-invariance returns its checkpoint.
    p_ta = (
        QUERIES["sql_try_agg"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ta_partial = "partial_try_sum" in p_ta
    p_pt = (
        QUERIES["stat_page_trend"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pt_raw = p_pt.count("events.parquet")
    p_ei = (
        QUERIES["sql_exec_invariance"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ei_raw = p_ei.count("lineitem.parquet")
    check(
        "wave 103: try_sum keeps map-side partials; Page trend "
        "checkpointed; exec-invariance checkpointed",
        ta_partial and pt_raw == 0 and ei_raw == 0,
        f"sql_try_agg partial_try_sum={ta_partial}; stat_page_trend raw "
        f"events scans={pt_raw} (want 0); sql_exec_invariance raw "
        f"scans={ei_raw} (want 0)",
    )

    # 90. wave 104: the PQ code table never shuffles vectors — the
    # returned plan is two pruned corpus scans (one per subspace
    # assignment against literal centroids), ONE vec_id join, zero
    # Windows; Mood's median re-touches the corpus once for cells
    # (the median came back as a literal) with the marginals as one
    # Window over the k-row cells relation.
    p_pq = (
        QUERIES["embed_pq_codebook"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pq_scans = p_pq.count("embeddings.parquet")
    pq_win = len(re.findall(r"\bWindow\b", p_pq))
    pq_joins = len(re.findall(r"HashJoin|SortMergeJoin|NestedLoop", p_pq))
    p_mm = (
        QUERIES["stat_mood_median"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    mm_scans = p_mm.count("events.parquet")
    mm_win = len(re.findall(r"\bWindow\b", p_mm))
    check(
        "wave 104: PQ two subspace scans + one join + zero Window; "
        "Mood one cells scan + one marginal Window",
        pq_scans == 2 and pq_win == 0 and pq_joins == 1
        and mm_scans == 1 and mm_win == 1,
        f"embed_pq_codebook scans={pq_scans} (want 2) windows={pq_win} "
        f"joins={pq_joins} (want 1); stat_mood_median scans={mm_scans} "
        f"(want 1) windows={mm_win} (want 1)",
    )

    # 91. wave 105: the band join is a BroadcastNestedLoopJoin with
    # the bands built (never a CartesianProduct, never a shuffle for
    # the join — the only Exchange is the rollup's).
    p_bn = (
        QUERIES["join_bnlj_bands"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    bn_bnlj = "BroadcastNestedLoopJoin" in p_bn
    bn_cart = "CartesianProduct" in p_bn
    bn_ex = len(re.findall(r"Exchange (hashpartitioning|SinglePartition)",
                           p_bn))
    check(
        "wave 105: band join is BNLJ (no cartesian), join-side "
        "shuffle-free",
        bn_bnlj and not bn_cart and bn_ex <= 1,
        f"join_bnlj_bands BNLJ={bn_bnlj} cartesian={bn_cart} "
        f"shuffle exchanges={bn_ex} (want <=1, the rollup's)",
    )

    # 92. wave 106: the correlated scalar subquery decorrelates to
    # exactly one join with an Aggregate on the inner side and no
    # surviving per-row subquery execution.
    p_sq = (
        QUERIES["sql_scalar_subquery"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    sq_joins = len(re.findall(r"HashJoin|SortMergeJoin|NestedLoop", p_sq))
    sq_agg = len(re.findall(r"HashAggregate|SortAggregate", p_sq))
    sq_subq = len(re.findall(r"Subquery(?!Alias)", p_sq))
    check(
        "wave 106: scalar subquery decorrelated (one join, inner "
        "aggregate, zero subquery nodes)",
        sq_joins == 1 and sq_agg >= 1 and sq_subq == 0,
        f"sql_scalar_subquery joins={sq_joins} (want 1) "
        f"aggregates={sq_agg} (want >=1) subquery nodes={sq_subq} "
        f"(want 0)",
    )

    # 93. wave 107: the PIVOT clause lowers to ONE scan + two-phase
    # aggregate (no per-status branch); quantified LIKE folds to a
    # map-only scan (no join, no Python); Jonckheere's returned plan
    # reads its checkpoints, never the raw corpus.
    p_pc = (
        QUERIES["sql_pivot_clause"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pc_scans = len(re.findall(r"FileScan parquet", p_pc))
    pc_aggs = len(re.findall(r"HashAggregate|SortAggregate", p_pc))
    p_lk = (
        QUERIES["sql_like_quantified"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lk_join = len(re.findall(r"HashJoin|SortMergeJoin|NestedLoop", p_lk))
    lk_ex = len(re.findall(r"Exchange", p_lk))
    p_jt = (
        QUERIES["stat_jonckheere"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    jt_raw = p_jt.count("events.parquet")
    check(
        "wave 107: PIVOT clause one scan two-phase agg; quantified "
        "LIKE map-only; Jonckheere checkpointed",
        pc_scans == 1 and pc_aggs >= 2 and lk_join == 0 and lk_ex == 0
        and jt_raw == 0,
        f"sql_pivot_clause scans={pc_scans} (want 1) aggs={pc_aggs} "
        f"(want >=2); sql_like_quantified joins={lk_join} "
        f"Exchange={lk_ex} (want 0/0); stat_jonckheere raw "
        f"scans={jt_raw} (want 0)",
    )

    # 94. wave 108: localCheckpoint's returned plan bottoms out at
    # the materialized RDD (zero FileScan); .to(schema) stays a
    # map-only Project (zero Exchange, zero joins).
    p_lc = (
        QUERIES["scan_local_checkpoint"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lc_scans = len(re.findall(r"FileScan parquet", p_lc))
    lc_rdd = "ExistingRDD" in p_lc or "LogicalRDD" in p_lc
    p_se = (
        QUERIES["sql_schema_enforce"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    se_ex = len(re.findall(r"Exchange", p_se))
    se_join = len(re.findall(r"HashJoin|SortMergeJoin|NestedLoop", p_se))
    check(
        "wave 108: localCheckpoint plan is the materialized RDD; "
        ".to(schema) map-only",
        lc_scans == 0 and lc_rdd and se_ex == 0 and se_join == 0,
        f"scan_local_checkpoint FileScans={lc_scans} (want 0) "
        f"rdd-backed={lc_rdd}; sql_schema_enforce Exchange={se_ex} "
        f"joins={se_join} (want 0/0)",
    )

    # 95. wave 109: the self-BLEU gram relations are checkpointed
    # (each consumed by BOTH join sides — zero raw documents scans
    # in the returned plan); Krippendorff reads its checkpointed
    # cells (zero raw events scans) and forms no unit-pair join.
    p_sb = (
        QUERIES["text_self_bleu"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    sb_raw = p_sb.count("documents.parquet")
    p_ka = (
        QUERIES["ml_krippendorff"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ka_raw = p_ka.count("events.parquet")
    check(
        "wave 109: self-BLEU + Krippendorff fully checkpointed (no "
        "raw corpus re-scan in returned plans)",
        sb_raw == 0 and ka_raw == 0,
        f"text_self_bleu raw documents scans={sb_raw} (want 0); "
        f"ml_krippendorff raw events scans={ka_raw} (want 0)",
    )

    # 96. wave 110: the native deterministic mode plans exactly like
    # the plain agg (one scan, partial before the shuffle, no
    # Window); Cochran-Armitage is one scan; ordinal refs lower to
    # the identical agg plan as named refs (plus the presentation
    # sort).
    p_md = (
        QUERIES["agg_mode_det"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    md_scans = len(re.findall(r"FileScan parquet", p_md))
    md_win = len(re.findall(r"\bWindow\b", p_md))
    md_partial = "partial_mode" in p_md
    p_ca = (
        QUERIES["stat_cochran_armitage"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ca_scans = len(re.findall(r"FileScan parquet", p_ca))
    check(
        "wave 110: deterministic mode one scan + map-side partial, "
        "no Window; Cochran-Armitage one scan",
        md_scans == 1 and md_win == 0 and md_partial
        and ca_scans == 1,
        f"agg_mode_det scans={md_scans} (want 1) windows={md_win} "
        f"partial_mode={md_partial}; stat_cochran_armitage "
        f"scans={ca_scans} (want 1)",
    )

    # 97. waves 111-113: Brunner-Munzel's two doubled-midrank layers
    # (pooled + internal) fold onto ONE events scan — the two Window
    # specs share the relation instead of re-scanning per layer; the
    # regression-metrics face likewise computes its group-mean model
    # via windows over ONE orders scan (no self-join); Kendall's W
    # returns a plan whose inputs are the parquet CHECKPOINTS — the
    # orders/customer join subtree must not be re-run by the
    # grid/rank/moment consumers (the stat_mutual_info double-scan
    # class).
    p_bm = (
        QUERIES["stat_brunner_munzel"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    bm_scans = len(re.findall(r"FileScan parquet", p_bm))
    bm_win = len(re.findall(r"\bWindow\b", p_bm))
    p_rm = (
        QUERIES["ml_regression_metrics"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    rm_scans = len(re.findall(r"FileScan parquet", p_rm))
    rm_join = len(re.findall(r"Join", p_rm))
    p_kw = (
        QUERIES["stat_kendall_w"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    kw_orders = len(re.findall(r"FileScan parquet \[o_", p_kw))
    kw_cust = len(re.findall(r"FileScan parquet \[c_", p_kw))
    check(
        "waves 111-113: BM one scan / two windows; regression "
        "metrics one scan no join; Kendall W consumes checkpoints",
        bm_scans == 1 and bm_win >= 2 and rm_scans == 1
        and rm_join == 0 and kw_orders == 0 and kw_cust == 0,
        f"brunner_munzel scans={bm_scans} (want 1) windows={bm_win} "
        f"(want >=2); regression_metrics scans={rm_scans} (want 1) "
        f"joins={rm_join} (want 0); kendall_w orders-scans="
        f"{kw_orders} customer-scans={kw_cust} (want 0/0)",
    )

    # 98. waves 117-123: the exact-binomial face consumes its logfact
    # CHECKPOINTS (the corpus-sized support grid is materialized
    # once, never re-derived per join branch — 3 lf-alias joins over
    # one parquet relation); the learning-curve fan-out happens on
    # the PRE-AGGREGATED support (one events scan; the x3 fraction
    # multiply joins after the groupBy, so no corpus re-scan per
    # fraction); the DP top-k ranks a category-bounded relation with
    # ONE window and ONE events scan.
    p_bt = (
        QUERIES["stat_binom_test"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    bt_events = len(re.findall(r"FileScan parquet \[event", p_bt))
    p_lc = (
        QUERIES["ml_learning_curve"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lc_scans = len(re.findall(r"FileScan parquet \[", p_lc))
    p_dp = (
        QUERIES["privacy_dp_topk"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    dp_scans = len(re.findall(r"FileScan parquet", p_dp))
    dp_win = len(re.findall(r"\bWindow\b", p_dp))
    check(
        "waves 117-123: binom consumes checkpoints (no events "
        "re-scan); learning curve one scan; dp_topk one scan + one "
        "window",
        bt_events == 0 and lc_scans == 1 and dp_scans == 1
        and dp_win == 1,
        f"binom events-scans={bt_events} (want 0); learning_curve "
        f"scans={lc_scans} (want 1); dp_topk scans={dp_scans} "
        f"windows={dp_win} (want 1/1)",
    )

    # 99. waves 130-134: the normal-scores family consumes its
    # parquet checkpoints — van-der-Waerden and Fligner-Killeen's
    # multi-consumer aggregates (group sums, pooled moments, totals)
    # must read the materialized scores, never re-run the corpus
    # window per branch (the stat_mutual_info double-scan class);
    # Games-Howell's pair grid self-joins the checkpointed moment
    # relation, not the corpus; the bounded-frame pandas window UDF
    # really crosses into Python (WindowInPandas node).
    def _ev_scans(key):
        pl = (
            QUERIES[key](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # count scans of the fixture table itself (checkpoint scans
        # also lead with an event_type column — match the path)
        return len(re.findall(r"events\.parquet", pl)), pl

    vdw_s, _ = _ev_scans("stat_van_der_waerden")
    fk_s, _ = _ev_scans("stat_fligner_killeen")
    gh_s, _ = _ev_scans("stat_games_howell")
    dunn_s, _ = _ev_scans("stat_dunn")
    _, p_wb = _ev_scans("udf_window_bounded")
    wb_ok = "WindowInPandas" in p_wb or "ArrowWindowPython" in p_wb
    check(
        "waves 130-134: normal-scores faces consume checkpoints; "
        "pair grids never re-scan the corpus; window UDF crosses "
        "via Arrow",
        vdw_s == 0 and fk_s == 0 and gh_s == 0 and dunn_s <= 1
        and wb_ok,
        f"events-scans vdw={vdw_s} fk={fk_s} gh={gh_s} (want 0) "
        f"dunn={dunn_s} (want <=1); window-udf Arrow node={wb_ok}",
    )

    # 103. waves 141-150: the pair-census faces never materialize
    # pairs — Cliff's delta and Somers' D fold to window chains over
    # the value-support grid with ZERO joins and one corpus scan;
    # the concordance index consumes its user-panel checkpoint (no
    # events re-scan after the per-user aggregate); Fleiss' kappa's
    # two marginal consumers read the checkpointed cell relation.
    def _plan_of(key):
        return (
            QUERIES[key](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    p_cliff = _plan_of("stat_cliff_delta")
    cliff_scans = len(re.findall(r"FileScan parquet", p_cliff))
    cliff_joins = len(re.findall(r"Join", p_cliff))
    p_som = _plan_of("stat_somers_d")
    som_scans = len(re.findall(r"FileScan parquet", p_som))
    som_joins = len(re.findall(r"Join", p_som))
    p_cidx = _plan_of("ml_concordance_index")
    cidx_ev = len(re.findall(r"events\.parquet", p_cidx))
    p_fl = _plan_of("stat_fleiss_kappa")
    fl_ev = len(re.findall(r"events\.parquet", p_fl))
    check(
        "waves 141-150: grid pair-census faces join-free on one "
        "scan; concordance + Fleiss consume checkpoints",
        cliff_scans == 1 and cliff_joins == 0 and som_scans == 1
        and som_joins == 0 and cidx_ev == 0 and fl_ev == 0,
        f"cliff scans={cliff_scans} joins={cliff_joins} (want 1/0); "
        f"somers scans={som_scans} joins={som_joins} (want 1/0); "
        f"c-index events-scans={cidx_ev} fleiss events-scans={fl_ev} "
        "(want 0/0)",
    )

    # 104. waves 151-166: the Q1 pricing summary is the minimal
    # benchmark plan — ONE lineitem scan with the shipdate filter
    # PUSHED to it, a partial-before-shuffle aggregate, no Window,
    # no Join; the CDC census reads the corpus once; the p-chart
    # consumes its daily checkpoint (no events re-scan).
    p_q1 = _plan_of("lineitem_pricing_summary")
    q1_scans = len(re.findall(r"FileScan parquet", p_q1))
    q1_pushed = "PushedFilters" in p_q1 and "l_shipdate" in p_q1
    q1_partial = "partial" in p_q1.lower()
    q1_win = len(re.findall(r"\bWindow\b", p_q1))
    q1_join = len(re.findall(r"Join", p_q1))
    p_cdc = _plan_of("dedup_cdc")
    cdc_scans = len(re.findall(r"documents\.parquet", p_cdc))
    p_pc = _plan_of("stat_p_chart")
    pc_ev = len(re.findall(r"events\.parquet", p_pc))
    check(
        "waves 151-166: Q1 minimal plan (1 scan, pushed filter, "
        "partial agg, no window/join); CDC one corpus scan; "
        "p-chart consumes checkpoint",
        q1_scans == 1 and q1_pushed and q1_partial and q1_win == 0
        and q1_join == 0 and cdc_scans == 1 and pc_ev == 0,
        f"q1 scans={q1_scans} pushed={q1_pushed} "
        f"partial={q1_partial} windows={q1_win} joins={q1_join} "
        f"(want 1/T/T/0/0); cdc doc-scans={cdc_scans} (want 1); "
        f"p-chart events-scans={pc_ev} (want 0)",
    )

    # 13. whole-stage codegen present on the relational surface (AQE
    # finalizes codegen per stage at runtime: execute, then inspect
    # the final adaptive plan)
    q6 = QUERIES["agg_counts"](spark, SF)
    q6.collect()  # count() would execute a different (count-agg) plan
    p_final = q6._jdf.queryExecution().executedPlan().toString()
    n_codegen = len(re.findall(r"\*\(\d+\)", p_final))
    check(
        "whole-stage codegen on aggregations",
        "isFinalPlan=true" in p_final and n_codegen >= 2,
        f"{n_codegen} codegen stages `*(n)` in agg_counts final adaptive plan",
    )

    lines = ["# EXPLAIN AUDIT", "", "Generated by tools/explain_audit.py", ""]
    ok_all = True
    for name, ok, detail in checks:
        ok_all &= ok
        lines.append(f"- {'PASS' if ok else 'FAIL'} — {name}: {detail}")
    lines.append("")
    lines.extend(sections)
    OUT.write_text("\n".join(lines))
    print("\n".join(lines[:4 + len(checks)]))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
