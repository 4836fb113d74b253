"""Lakehouse-operations faces (round-3 wave 10): the table-maintenance
and pipeline-engineering operators a 100-TB crawl warehouse runs
BETWEEN the analytics — non-hierarchical GROUPING SETS profiles,
deterministic token-balanced output sharding, A/B drift detection
(chi-square), small-file compaction planning, and zone-map partition
pruning — each as a Spark face with a value-identical DuckDB twin.

Conventions are the sibling modules': md5-based hashing wherever both
engines must agree bit-for-bit, float math written in the SAME
operation order on both sides, final floats rounded to 6, integer
division spelled `DIV` / `//` (DuckDB `/` is float division —
CLAUDE.md), DATE/TIMESTAMP cells emitted as ISO strings.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import SQL_CENTS, cents, t

Q = {}
O = {}


def q(name: str, sql: str | None):
    def deco(fn):
        assert name not in Q, f"duplicate query key {name!r}"
        Q[name] = fn
        if sql is not None:
            O[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# GROUPING SETS — non-hierarchical multi-profile in one scan
# ---------------------------------------------------------------------------
@q(
    "agg_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           CASE WHEN o_orderpriority IS NOT NULL THEN 'by_priority'
                WHEN o_orderstatus IS NOT NULL THEN 'by_status'
                ELSE 'grand' END AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(round(SUM(o_totalprice) * 100) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark, sf):
    """GROUPING SETS with NON-hierarchical sets — two independent
    one-dimension profiles plus the grand total in ONE pass, which
    ROLLUP/CUBE cannot express (rollup is prefix-nested, cube is the
    full lattice; this is a hand-picked subset). Spark plans a single
    Expand + two-phase hash aggregate: the fact table is scanned
    once and each row is replicated only per requested set (3x here)
    with map-side partials — at 10^12 rows that beats three separate
    scans-and-shuffles by the scan cost alone. The grouping columns
    are never NULL in the data, so the output NULL pattern uniquely
    identifies the set; ``grp`` makes that explicit instead of
    relying on engine-specific GROUPING_ID bit orders."""
    o = t(spark, sf, "orders")
    pri, st = F.col("o_orderpriority"), F.col("o_orderstatus")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.when(pri.isNotNull(), F.lit("by_priority"))
        .when(st.isNotNull(), F.lit("by_status"))
        .otherwise(F.lit("grand"))
        .alias("grp"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        cents(F.sum("o_totalprice")).alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# deterministic token-balanced output sharding
# ---------------------------------------------------------------------------
@q(
    "shard_plan",
    r"""
    WITH toks AS (
      SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             len(string_split_regex(trim(text), '\s+')) AS ntok
      FROM documents),
    per AS (
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(ntok) AS BIGINT) AS n_tokens
      FROM toks GROUP BY shard)
    SELECT shard, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) * 16.0
                 / SUM(n_tokens) OVER (), 6) AS balance
    FROM per
    """,
)
def shard_plan(spark, sf):
    """Output-shard assignment + balance audit for a training-data
    writer: every doc lands in one of 16 shards by CONTENT-INDEPENDENT
    key hash (same doc -> same shard on every engine / run / cluster
    size — the property epoch-reproducible training needs), and the
    report shows each shard's token mass relative to perfect balance
    (1.0). The shard assignment is a pure map-side expression that
    composes with DataFrameWriter.partitionBy; the balance window
    runs over the 16-row POST-aggregate relation, never the corpus.
    md5-on-key keeps the DuckDB twin bit-identical."""
    d = t(spark, sf, "documents")
    per = (
        d.select(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias(
                "shard"
            ),
            F.size(F.split(F.trim("text"), r"\s+")).alias("ntok"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    return per.select(
        "shard",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") * 16.0
            / F.sum("n_tokens").over(w),
            6,
        ).alias("balance"),
    )


# ---------------------------------------------------------------------------
# distribution-drift detection: chi-square over a deterministic A/B split
# ---------------------------------------------------------------------------
@q(
    "drift_chi2",
    """
    WITH lab AS (
      SELECT lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'a' ELSE 'b' END AS half
      FROM documents),
    ct AS (
      SELECT lang,
             CAST(COUNT(*) FILTER (WHERE half = 'a') AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (WHERE half = 'b') AS BIGINT) AS n_b
      FROM lab GROUP BY lang),
    tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
                   CAST(SUM(n_b) AS BIGINT) AS tb FROM ct),
    ex AS (
      SELECT lang, n_a, n_b,
             CAST(n_a + n_b AS DOUBLE) * ta / (ta + tb) AS e_a,
             CAST(n_a + n_b AS DOUBLE) * tb / (ta + tb) AS e_b
      FROM ct CROSS JOIN tot)
    SELECT lang, n_a, n_b,
           CASE WHEN e_a = 0 OR e_b = 0 THEN NULL
                ELSE round((n_a - e_a) * (n_a - e_a) / e_a
                           + (n_b - e_b) * (n_b - e_b) / e_b, 6)
           END AS contrib
    FROM ex
    """,
)
def drift_chi2(spark, sf):
    """Snapshot-drift detector: chi-square homogeneity contributions
    of the language distribution between two deterministic hash
    halves of the corpus (the same machinery compares yesterday's
    crawl to today's; on an A/A split like this the statistic should
    be small — the twin checks the math, production checks the
    value). Two-phase conditional-count agg over the corpus, then the
    |langs|-sized table crosses the 1-row total by broadcast; the
    expected-count expressions are written in the IDENTICAL operation
    order on both engines so round-6 equality holds bit-for-bit."""
    d = t(spark, sf, "documents")
    half = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8", "a"
    ).otherwise("b")
    ct = (
        d.select("lang", half.alias("half"))
        .groupBy("lang")
        .agg(
            F.count(F.when(F.col("half") == "a", 1)).cast("long").alias("n_a"),
            F.count(F.when(F.col("half") == "b", 1)).cast("long").alias("n_b"),
        )
    )
    tot = ct.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    ex = ct.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_a",
        "n_b",
        (
            (F.col("n_a") + F.col("n_b")).cast("double")
            * F.col("ta")
            / (F.col("ta") + F.col("tb"))
        ).alias("e_a"),
        (
            (F.col("n_a") + F.col("n_b")).cast("double")
            * F.col("tb")
            / (F.col("ta") + F.col("tb"))
        ).alias("e_b"),
    )
    return ex.select(
        "lang",
        "n_a",
        "n_b",
        # a degenerate split (one empty half) makes chi-square
        # undefined: expected counts of 0 would divide-by-zero —
        # an ERROR under Spark's ANSI mode but inf in DuckDB, so
        # BOTH engines must short-circuit to NULL explicitly
        F.when(
            (F.col("e_a") == 0) | (F.col("e_b") == 0), F.lit(None)
        )
        .otherwise(
            F.round(
                (F.col("n_a") - F.col("e_a"))
                * (F.col("n_a") - F.col("e_a"))
                / F.col("e_a")
                + (F.col("n_b") - F.col("e_b"))
                * (F.col("n_b") - F.col("e_b"))
                / F.col("e_b"),
                6,
            )
        )
        .alias("contrib"),
    )


# ---------------------------------------------------------------------------
# small-file compaction planning (bin packing by running offset)
# ---------------------------------------------------------------------------
@q(
    "compact_plan",
    """
    WITH files AS (
      SELECT source, lang, CAST(SUM(n_chars) AS BIGINT) AS file_bytes
      FROM documents GROUP BY 1, 2),
    cum AS (
      SELECT source, lang, file_bytes,
             CAST(COALESCE(SUM(file_bytes) OVER (
                    PARTITION BY source ORDER BY lang
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS start_off
      FROM files)
    SELECT source, lang, file_bytes, start_off,
           start_off // 4096 AS bin
    FROM cum
    """,
)
def compact_plan(spark, sf):
    """Small-file compaction planner — the OPTIMIZE/rewriteDataFiles
    primitive every Iceberg/Delta crawl warehouse schedules: within
    each table partition (``source``), order the data files
    deterministically, compute each file's running start offset, and
    assign it to output bin floor(offset / target) so every bin
    coalesces to ~target bytes. The per-(source, lang) byte totals
    stand in for the file manifest (same shape the real planner reads
    from Iceberg metadata, no corpus scan). Scale shape: the window
    is partitioned BY source — per-partition planning, no global
    sort, exactly how compaction parallelizes across a 10^12-row
    table's partitions. All-integer arithmetic (`DIV`; DuckDB `/`
    would be float — CLAUDE.md) so the twin is exact."""
    d = t(spark, sf, "documents")
    files = d.groupBy("source", "lang").agg(
        F.sum("n_chars").cast("long").alias("file_bytes")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("lang")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = files.withColumn(
        "start_off",
        F.coalesce(F.sum("file_bytes").over(w), F.lit(0)).cast("long"),
    )
    return cum.select(
        "source",
        "lang",
        "file_bytes",
        "start_off",
        F.expr("start_off DIV 4096").alias("bin"),
    )


# ---------------------------------------------------------------------------
# zone-map partition pruning (data skipping from min/max stats)
# ---------------------------------------------------------------------------
@q(
    "scan_prune_stats",
    """
    WITH parts AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS part,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx
      FROM lineitem GROUP BY 1)
    SELECT part, n_rows,
           strftime(mn, '%Y-%m-%d') AS min_ship,
           strftime(mx, '%Y-%m-%d') AS max_ship,
           NOT (mx <  TIMESTAMP '1998-06-01'
                OR mn >= TIMESTAMP '1998-09-01') AS scanned
    FROM parts
    """,
)
def scan_prune_stats(spark, sf):
    """Zone-map data skipping made visible: build the per-partition
    min/max stats an Iceberg manifest (or parquet row-group footer)
    keeps for ``l_shipdate``, then evaluate which monthly partitions
    a BETWEEN '1998-06' .. '1998-08' predicate can skip WITHOUT
    reading them (scanned = stats range intersects the predicate
    range). This is the planning half of partition pruning — the
    execution half is what `.explain` shows as PartitionFilters /
    PushedFilters on the real scans (EXPLAIN_AUDIT.md asserts it for
    the pipeline's pruned pages scan). Stats build is one two-phase
    agg; the prune decision is per-stats-row arithmetic on an
    ~O(partitions) relation. TIMESTAMP cells exit as ISO strings
    (DuckDB DATE/TIMESTAMP -> pandas Timestamp breaks the str()
    hash — CLAUDE.md)."""
    li = t(spark, sf, "lineitem")
    lo = F.lit("1998-06-01").cast("timestamp")
    hi = F.lit("1998-09-01").cast("timestamp")
    parts = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("part")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("l_shipdate").alias("mn"),
        F.max("l_shipdate").alias("mx"),
    )
    return parts.select(
        "part",
        "n_rows",
        F.date_format("mn", "yyyy-MM-dd").alias("min_ship"),
        F.date_format("mx", "yyyy-MM-dd").alias("max_ship"),
        (~((F.col("mx") < lo) | (F.col("mn") >= hi))).alias("scanned"),
    )


@q(
    "merge_scd2",
    """
    WITH c AS (
      SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS us,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events),
    chg AS (SELECT user_id, event_id, state, us FROM c
            WHERE prev_state IS NULL OR state <> prev_state),
    v AS (SELECT user_id, state, us AS valid_from_us,
                 LEAD(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS valid_to_us
          FROM chg)
    SELECT user_id, state, valid_from_us, valid_to_us,
           (valid_to_us IS NULL) AS is_current
    FROM v
    """,
)
def merge_scd2(spark, sf):
    """Type-2 slowly-changing-dimension build from a changelog: the
    per-user event stream collapses to state-CHANGE rows (LAG-based
    change detection drops consecutive duplicates — the no-op-update
    suppression real SCD-2 merges need), then each change opens a
    validity interval closed by the next change (LEAD), with the open
    interval flagged is_current — the standard dimension-table
    maintenance op a lakehouse runs on every upstream snapshot. Plan
    shape: both windows share the user_id partitioning, so Catalyst
    plans ONE Exchange and two Window operators over it (the
    change-detect filter sits between them); no join against the
    previous dimension state — the full rebuild form is the
    oracle-checkable face, while the incremental form is
    stream_upsert's foreachBatch MERGE. Validity bounds exit as
    exact epoch-microsecond integers (no timestamp-format parity
    surface; the NTZ→TIMESTAMP cast under the UTC-pinned session
    timezone is the identity, matching DuckDB's naive epoch_us);
    ordering is the total (ts, event_id) so intervals are
    engine-stable."""
    e = t(spark, sf, "events")
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = e.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.lag("event_type").over(w1).alias("prev_state"),
    )
    chg = c.filter(
        F.col("prev_state").isNull()
        | (F.col("state") != F.col("prev_state"))
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return chg.select(
        "user_id",
        "state",
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w2).alias("valid_to_us"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


def _z_interleave(x: str, y: str, bits: int, spark_dialect: bool) -> str:
    """Bit-interleave expression text for a 2-column z-order key —
    x's bit i lands at position 2i, y's at 2i+1. The disjoint shifted
    bits are combined with +, which equals OR here. Emitted in both
    dialects (Spark SQL spells shifts as shiftleft/shiftright
    functions; DuckDB as << / >>); all ops are exact integer bitwise
    math, so the twins agree bit-for-bit."""
    terms = []
    for i in range(bits):
        if spark_dialect:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@q(
    "zorder_plan",
    f"""
    WITH b AS (
      SELECT l_partkey & 255 AS px, l_suppkey & 255 AS py
      FROM lineitem),
    z AS (SELECT px, py,
                 {_z_interleave('px', 'py', 8, False)} AS zval
          FROM b)
    SELECT CAST(zval >> 10 AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(px) AS BIGINT) AS min_px,
           CAST(MAX(px) AS BIGINT) AS max_px,
           CAST(MIN(py) AS BIGINT) AS min_py,
           CAST(MAX(py) AS BIGINT) AS max_py
    FROM z GROUP BY zval >> 10
    """,
)
def zorder_plan(spark, sf):
    """Z-order clustering plan: interleave the low 8 bits of two
    scan dimensions into one 16-bit Morton key and report, per
    64-row-group bucket (zval >> 10), the min/max RANGE OF BOTH
    dimensions — the report that justifies a lakehouse OPTIMIZE
    ZORDER BY (l_partkey, l_suppkey): every bucket bounds BOTH
    columns (each covers a 32x64 tile of the key space), so zone-map
    skipping prunes on either predicate, which single-column sort
    order cannot do. The key computation is map-only exact integer
    bit math (shared expression generator emits both dialects); the
    report is one map-side-combinable agg over ~64 groups. Scale
    shape: at 100 TB the same key feeds a repartitionByRange write —
    this face is the planning/verification report, and it touches
    only the two key columns (column-pruned scan)."""
    li = t(spark, sf, "lineitem").selectExpr(
        "l_partkey & 255 AS px", "l_suppkey & 255 AS py"
    )
    z = li.selectExpr(
        "px", "py", _z_interleave("px", "py", 8, True) + " AS zval"
    )
    return z.groupBy(
        F.expr("shiftright(zval, 10)").cast("long").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("px").cast("long").alias("min_px"),
        F.max("px").cast("long").alias("max_px"),
        F.min("py").cast("long").alias("min_py"),
        F.max("py").cast("long").alias("max_py"),
    )


# ---------------------------------------------------------------------------
# version-retention vacuum planner — keep last K versions per key
# ---------------------------------------------------------------------------
@q(
    "vacuum_plan",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE value IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN rn <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(SUM(CASE WHEN rn > 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_expired,
           CAST(SUM(CASE WHEN rn > 2 THEN cents ELSE 0 END) AS BIGINT)
             AS bytes_expired
    FROM v GROUP BY event_type
    """,
)
def vacuum_plan(spark, sf):
    """Version-retention VACUUM planner — the expiry half of lakehouse
    maintenance (Delta VACUUM / Iceberg expire_snapshots): per key
    (user), every version beyond the newest K=2 is expirable; the
    report aggregates what a sweep would reclaim per table partition
    (event_type), with the value column standing in for file bytes.
    This is the PLAN face — it marks and measures, the destructive
    half belongs to a job with a gate (the compact.py discipline:
    gate BEFORE writing the manifest). Scale shape: ONE corpus scan,
    ONE window partitioned by the version key (hash-partitioned —
    per-key version chains are short, and the plan never sorts
    globally), ONE map-side-combinable rollup; ties on the version
    timestamp break on event_id so the retained set is deterministic
    across engines and runs. All outputs are exact integers."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    v = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number().over(w).alias("rn"),
    )
    keep = F.col("rn") <= 2
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_retained"),
        F.sum(F.when(~keep, 1).otherwise(0)).cast("long").alias("n_expired"),
        F.sum(F.when(~keep, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("bytes_expired"),
    )


# ---------------------------------------------------------------------------
# bucketed co-located join — the zero-shuffle join layout, driver-visible
# ---------------------------------------------------------------------------
@q(
    "join_bucketed",
    """
    WITH per_cust AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey)
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(p.n_orders) AS BIGINT) AS n_orders,
           CAST(SUM(p.cents) AS BIGINT) AS total_cents
    FROM customer c JOIN per_cust p ON p.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_bucketed(spark, sf):
    """Bucketed co-located join, driver-visible: both sides are
    written through catalog.save_bucketed (bucketBy+sortBy on the
    join key, 8 buckets — SURVEY §4.3's physical layout for stores
    that outgrow the broadcast budget), and the MERGE-hinted join
    then needs NO Exchange and NO Sort on either side — the bucket
    layout IS the shuffle, paid once at write time and amortized
    over every subsequent join (audit #62 pins 'Bucketed: true' on
    both scans and at most the final agg exchange in the plan). At
    100 TB this is the difference between re-shuffling the fact
    table per query and reading it pre-clustered. The twin computes
    the same rollup from the raw parquet, so hash equality also
    proves the bucketed write/read round trip is lossless."""
    import tempfile

    from ..sources import catalog

    base = spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    root = tempfile.mkdtemp(prefix="qlake_bucketed_", dir=base)
    cust = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    catalog.save_bucketed(cust, "jb_cust", root, "c_custkey", n_buckets=8)
    catalog.save_bucketed(
        per_cust, "jb_orders", root, "o_custkey", n_buckets=8
    )
    c = spark.table("jb_cust")
    p = spark.table("jb_orders")
    j = c.hint("merge").join(
        p, p["o_custkey"] == c["c_custkey"], "inner"
    )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# multi-measure pivot — the column-name contract
# ---------------------------------------------------------------------------
@q(
    "pivot_multi_agg",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS click_n,
           CAST(SUM(CASE WHEN event_type = 'click'
                         THEN CAST(round(value * 100) AS BIGINT) END)
                AS BIGINT) AS click_cents,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchase_n,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT) END)
                AS BIGINT) AS purchase_cents
    FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    GROUP BY user_id
    """,
)
def pivot_multi_agg(spark, sf):
    """Pivot with MULTIPLE measures per pivoted value — the API
    wrinkle pivot_events' single-measure form hides: with two
    aggregates Spark names the output columns `{value}_{alias}`
    (click_n, click_cents, ...), and that naming is a CONTRACT the
    downstream schema depends on, so the face pins it against
    explicitly-aliased CASE folds in the twin (the portable
    spelling — DuckDB's PIVOT names differently, one more dialect
    seam made explicit). The plan is the same single two-phase
    aggregation as any pivot over explicit values (values are
    declared, so no extra distinct-scan pass); per-type cents sums
    keep the SUM-over-empty = NULL semantics on both engines (a
    user with no purchases gets NULL cents, 0 count)."""
    e = t(spark, sf, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    p = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "purchase"])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    return p.select(
        "user_id",
        F.coalesce("click_n", F.lit(0)).cast("long").alias("click_n"),
        F.col("click_cents").cast("long").alias("click_cents"),
        F.coalesce("purchase_n", F.lit(0))
        .cast("long")
        .alias("purchase_n"),
        F.col("purchase_cents").cast("long").alias("purchase_cents"),
    )


# ---------------------------------------------------------------------------
# content digest ledger — tamper-evident table fingerprint
# ---------------------------------------------------------------------------
@q(
    "lake_content_digest",
    """
    WITH h AS (
      SELECT ('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               COALESCE(CAST(o_custkey AS VARCHAR), '') || '|' ||
               COALESCE(o_orderstatus, '') || '|' ||
               COALESCE(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR), '')), 1, 15))::UBIGINT AS rh
      FROM orders)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(rh // 268435456) AS BIGINT) AS digest_hi,
           CAST(SUM(rh % 268435456) AS BIGINT) AS digest_lo,
           CAST(bit_xor(CAST(rh AS BIGINT)) AS BIGINT) AS digest_xor
    FROM h
    """,
)
def lake_content_digest(spark, sf):
    """Content digest ledger: every orders row canonicalizes to a
    delimited string, hashes to a 60-bit md5 prefix, and the table
    fingerprint is the SUM and XOR of the row hashes — the
    tamper-evidence / replication-audit primitive (two copies of a
    10^12-row table agree iff counts + both digests agree; bit_fns
    fingerprints the KEY SET, this face fingerprints the VALUES —
    an in-place update that keeps every key flips it). Both folds
    are commutative-associative map-side aggregates, so the digest
    is partitioning/order/engine-invariant by construction, and
    carrying BOTH sum and xor closes each one's blind spot (xor
    misses even-multiplicity duplicate rows, sum is the classic
    complement). Canonicalization is the contract: explicit
    delimiters, COALESCE('') for NULLs, money as exact cents —
    any two writers that agree on it agree on the digest. The sum
    rides LIMB-SPLIT: the 60-bit hash splits into 28-bit hi/lo
    limbs summed separately (a direct BIGINT sum of 2^60-scale
    hashes overflows ANSI at 8 rows — measured; two 2^28-limb sums
    stay exact to 2^35 rows, and equality of (hi, lo) pairs is
    equality of the full sum), the canonical big-integer-sum trick
    for any checksum wider than the accumulator."""
    rh = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.coalesce(F.col("o_custkey").cast("string"), F.lit("")),
                    F.coalesce(F.col("o_orderstatus"), F.lit("")),
                    F.coalesce(
                        F.round(F.col("o_totalprice") * 100)
                        .cast("long")
                        .cast("string"),
                        F.lit(""),
                    ),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    h = t(spark, sf, "orders").select(rh.alias("rh"))
    return h.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.expr("rh div 268435456")).cast("long").alias("digest_hi"),
        F.sum(F.expr("rh % 268435456")).cast("long").alias("digest_lo"),
        F.expr("bit_xor(rh)").cast("long").alias("digest_xor"),
    )


# ---------------------------------------------------------------------------
# bucket pruning — an equality filter reads 1 bucket of N
# ---------------------------------------------------------------------------
@q(
    "scan_bucket_prune",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey = 42 GROUP BY c_mktsegment
    """,
)
def scan_bucket_prune(spark, sf):
    """Bucket PRUNING on a point lookup: the customer table written
    bucketBy(8, c_custkey), then filtered c_custkey = 42 — the
    filter hashes the literal to its bucket and the scan opens 1
    file group of 8 (the executed plan prints SelectedBucketsCount:
    1 out of 8, pinned in the test), making the bucketed layout a
    coarse hash INDEX, not just a pre-paid join shuffle
    (join_bucketed's use). At 100 TB this turns entity point
    lookups — 'show me this customer' — from a table scan into a
    bucket read without any external index; the residual in-bucket
    filter still applies (pruning is per-bucket, not per-row).
    The twin answers the same lookup from raw parquet; equality
    proves pruning dropped nothing it shouldn't."""
    import tempfile

    from ..sources import catalog

    base = spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    root = tempfile.mkdtemp(prefix="qlake_bprune_", dir=base)
    cust = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    catalog.save_bucketed(cust, "bp_cust", root, "c_custkey", n_buckets=8)
    # DisableUnnecessaryBucketedScan turns bucketed reading off when
    # the plan avoids no shuffle — which also forfeits bucket PRUNING
    # on point lookups; pin it off for index-style reads (measured:
    # "Bucketed: false (disabled by query planner)" without this)
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        back = spark.table("bp_cust").filter(F.col("c_custkey") == 42)
        out = back.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
        from ..operators.dedup import parquet_checkpoint

        return parquet_checkpoint(out, "bucket_prune_out")
    finally:
        spark.conf.set(key, prev)


# ---------------------------------------------------------------------------
# parquet aggregate pushdown — MIN/MAX/COUNT answered from footer statistics
# ---------------------------------------------------------------------------
@q(
    "scan_agg_pushdown",
    """
    SELECT CAST(round(MIN(o_totalprice) * 100) AS BIGINT) AS min_cents,
           CAST(round(MAX(o_totalprice) * 100) AS BIGINT) AS max_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS pushed
    FROM orders
    """,
)
def scan_agg_pushdown(spark, sf):
    """Parquet AGGREGATE pushdown: with
    ``spark.sql.parquet.aggregatePushdown`` on and the scan routed
    through the DSv2 reader (parquet dropped from
    ``useV1SourceList``), MIN/MAX/COUNT(*) are answered from the
    row-group FOOTER STATISTICS — the executed plan prints
    ``PushedAggregation: [MIN(..), MAX(..), COUNT(*)]`` and the scan
    reads ZERO data pages. At 100 TB this is the difference between
    a metadata-only operation (one footer read per file, seconds)
    and a full-table scan (hours) for exactly the profiling
    aggregates a lake runs constantly; it composes with partition
    pruning, and it degrades safely at PLAN time — any unsupported
    shape (filters, group-by on data columns, nested fields) falls
    back to the normal scan with identical results. One failure mode
    is NOT plan-time safe and this face handles it: a file whose row
    groups carry no min/max statistics (pyarrow writes empty tables
    that way; stats can also be legitimately dropped) makes the
    pushed reader THROW `No min/max found` at RUNTIME, so the eager
    execution retries unpushed with pushed=false on that seam — at
    100 TB a single stats-less file in a million must not kill the
    profiling job. The mechanism itself is
    hash-gated, not just audited: the face rides the plan-derived
    ``pushed`` boolean into the output row (the join_dpp discipline
    upgraded — a regression to the unpushed plan flips the column
    and FAILS the oracle gate). Cents-casting happens in a
    projection ABOVE the pushed aggregate, so the scan still pushes
    the raw MIN/MAX. Conf scoping follows scan_bucket_prune: set,
    execute eagerly into a parquet checkpoint, restore in finally."""
    from ..operators.dedup import parquet_checkpoint

    k_push = "spark.sql.parquet.aggregatePushdown"
    k_v1 = "spark.sql.sources.useV1SourceList"
    prev_push = spark.conf.get(k_push)
    prev_v1 = spark.conf.get(k_v1)
    spark.conf.set(k_push, "true")
    spark.conf.set(
        k_v1,
        ",".join(
            s for s in prev_v1.split(",") if s.strip() != "parquet"
        ),
    )
    def build(pushed_flag: bool):
        agg = t(spark, sf, "orders").agg(
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        if pushed_flag:
            plan = agg._jdf.queryExecution().executedPlan().toString()
            pushed_flag = "PushedAggregation: [MIN" in plan
        return agg.select(
            F.round(F.col("mn") * 100).cast("long").alias("min_cents"),
            F.round(F.col("mx") * 100).cast("long").alias("max_cents"),
            "n_rows",
            F.lit(pushed_flag).alias("pushed"),
        )

    try:
        try:
            return parquet_checkpoint(build(True), "agg_pushdown_out")
        except Exception:
            # stats-less row groups (e.g. pyarrow empty tables) make
            # the pushed reader throw at runtime — retry unpushed
            spark.conf.set(k_push, "false")
            spark.conf.set(k_v1, prev_v1)
            return parquet_checkpoint(build(False), "agg_pushdown_out")
    finally:
        spark.conf.set(k_push, prev_push)
        spark.conf.set(k_v1, prev_v1)


# ---------------------------------------------------------------------------
# MSCK REPAIR TABLE — catalog discovery of out-of-band partition files
# ---------------------------------------------------------------------------
@q(
    "lake_msck_repair",
    """
    SELECT CAST(0 AS BIGINT) AS n_before,
           CAST(COUNT(*) AS BIGINT) AS n_after,
           CAST(COUNT(DISTINCT event_id % 4) AS BIGINT) AS n_partitions,
           CAST(COALESCE(SUM(event_id), 0) AS BIGINT) AS id_sum
    FROM events
    """,
)
def lake_msck_repair(spark, sf):
    """MSCK REPAIR TABLE (a.k.a. ALTER TABLE RECOVER PARTITIONS):
    the catalog-repair operation every partitioned lake needs when
    files land OUT OF BAND — a backfill job, a vendor drop, a
    distcp — under an external table's LOCATION without going
    through the catalog. The face simulates exactly that: events
    written partitionBy(p) as a bare path write (no catalog), an
    external partitioned table created over the directory, and the
    before/after counts prove the semantics — an external
    partitioned table KNOWS NOTHING until recovery (n_before = 0,
    the classic new-table-reads-empty surprise), and one MSCK later
    every partition and row is visible (n_after, id_sum match the
    raw parquet twin exactly). At 100 TB partition discovery is a
    LISTING-scale operation, not a data-scale one — Spark walks the
    directory tree in parallel (spark.rdd.parallelListingThreshold)
    and touches zero data files, which is why repair stays cheap
    even when the table does not. Table name is suffixed with the
    applicationId (sql_catalog_table precedent) and dropped in
    finally; counts are computed AFTER repair from the repaired
    table itself and checkpointed eagerly so the drop cannot race
    the returned plan."""
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    base = spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    root = tempfile.mkdtemp(prefix="qlake_msck_", dir=base)
    tbl = f"msck_events_{spark.sparkContext.applicationId.replace('-', '_')}"
    (
        t(spark, sf, "events")
        .select("event_id", (F.col("event_id") % 4).alias("p"))
        .write.mode("overwrite")
        .partitionBy("p")
        .parquet(root)
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"CREATE TABLE {tbl} (event_id BIGINT) USING parquet "
        f"PARTITIONED BY (p INT) LOCATION '{root}'"
    )
    try:
        n_before = spark.table(tbl).count()  # 0: catalog knows nothing
        spark.sql(f"MSCK REPAIR TABLE {tbl}")
        n_parts = spark.sql(f"SHOW PARTITIONS {tbl}").count()
        out = spark.table(tbl).agg(
            F.lit(int(n_before)).cast("long").alias("n_before"),
            F.count(F.lit(1)).cast("long").alias("n_after"),
            F.lit(int(n_parts)).cast("long").alias("n_partitions"),
            F.coalesce(F.sum("event_id"), F.lit(0))
            .cast("long")
            .alias("id_sum"),
        )
        return parquet_checkpoint(out, "msck_out")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


# ---------------------------------------------------------------------------
# Python Data Source filter pushdown — the source prunes, Spark trusts it
# ---------------------------------------------------------------------------
@q(
    "pyds_filter_pushdown",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(id * 7), 0) AS BIGINT) AS cents_sum,
           CAST(COUNT(DISTINCT id // 250) AS BIGINT) AS n_parts
    FROM range(1000) t(id)
    WHERE id >= 750 AND id % 2 = 0
    """,
)
def pyds_filter_pushdown(spark, sf):
    """Spark 4.1 Python Data Source FILTER PUSHDOWN
    (``DataSourceReader.pushFilters``): the planner hands the
    source the conjunctive filters, the source keeps the bounds it
    can evaluate natively (here ``id >= 750`` — accepted, partitions
    outside the bound pruned at planning, rows pruned in read()) and
    returns the rest as residuals (``id % 2 = 0`` — no Filter
    subclass models modulo, Spark re-applies it post-scan). The
    split is visible in the executed plan: the residual Filter node
    carries the modulo but NOT the bound (audit #73), and 3 of 4
    input partitions never get a task. This is the quadrant that
    makes a Python connector honest at 100 TB — a database / REST /
    feed source that cannot push bounds ships the whole table to
    Spark per query. The trust model is the sharp edge: once a
    filter is accepted Spark never re-checks it, so a source that
    accepts-but-does-not-apply silently corrupts — exactly what the
    closed-form DuckDB twin over the same synthetic feed
    (id in [0,1000), cents = id*7, pid = id div 250) hash-detects.
    sf-independent by design: the feed is the connector's own.
    PyDS pushdown ships behind a feature flag
    (spark.sql.python.filterPushdown.enabled, default FALSE in 4.1 —
    a reader implementing pushFilters with the flag off is an
    ERROR, not a silent fallback); scoped via the eager-checkpoint
    idiom."""
    from ..operators.dedup import parquet_checkpoint
    from ..sources import pushdown_ints

    pushdown_ints.register(spark)
    key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        df = (
            spark.read.format("pushdown_ints")
            .option("n", 1000)
            .option("parts", 4)
            .load()
            .filter((F.col("id") >= 750) & (F.col("id") % 2 == 0))
        )
        out = df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias(
                "cents_sum"
            ),
            F.countDistinct("pid").cast("long").alias("n_parts"),
        )
        return parquet_checkpoint(out, "pyds_pushdown_out")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# ---------------------------------------------------------------------------
# output file sizing — maxRecordsPerFile actually bounds the written files
# ---------------------------------------------------------------------------
_MAXREC = 1000


@q(
    "lake_output_sizing",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CEIL(COUNT(*) / {_MAXREC}.0) AS BIGINT) AS n_files,
           TRUE AS size_ok,
           CAST(COALESCE(SUM(event_id), 0) AS BIGINT) AS id_sum
    FROM events
    """,
)
def lake_output_sizing(spark, sf):
    """``maxRecordsPerFile`` — the writer-side knob that bounds
    output file ROW COUNT, the complement of compact_plan (which
    fixes files already too small, this prevents files too big): a
    single write task splits its output into ceil(rows/N) files, so
    downstream scans get bounded-size splits regardless of how
    skewed the writing tasks were. The face writes the events ids
    coalesced to ONE task (making the file count the closed form
    ceil(n/N) the twin can state), reads the result back with
    ``_metadata.file_path`` (the scan_row_index machinery), and
    emits the file census: row count and id checksum prove
    losslessness, n_files pins the split arithmetic, and size_ok
    certifies every file honors the bound (COALESCE-d to TRUE on an
    empty corpus, where Spark writes no data files at all). At
    100 TB this knob is how a compaction/export job guarantees its
    consumers' memory envelope; without coalesce(1) the bound still
    holds per-file — only the closed-form COUNT becomes
    sum-over-tasks, which is why the face pins the 1-task case."""
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    base = spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    root = tempfile.mkdtemp(prefix="qlake_sizing_", dir=base)
    out_dir = f"{root}/out"
    (
        t(spark, sf, "events")
        .select("event_id")
        .coalesce(1)
        .write.option("maxRecordsPerFile", _MAXREC)
        .mode("overwrite")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir).select(
        "event_id", F.col("_metadata.file_path").alias("fp")
    )
    per = back.groupBy("fp").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("event_id").cast("long").alias("s"),
    )
    out = per.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.coalesce(F.max("cnt") <= _MAXREC, F.lit(True)).alias(
            "size_ok"
        ),
        F.coalesce(F.sum("s"), F.lit(0)).cast("long").alias("id_sum"),
    )
    return parquet_checkpoint(out, "output_sizing_out")


# ---------------------------------------------------------------------------
# input split sizing — maxPartitionBytes actually re-splits the scan
# ---------------------------------------------------------------------------
@q(
    "scan_split_sizing",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(event_id), 0) AS BIGINT) AS id_sum,
           TRUE AS more_splits
    FROM events
    """,
)
def scan_split_sizing(spark, sf):
    """``spark.sql.files.maxPartitionBytes`` (+ openCostInBytes) —
    the knob that decides how many TASKS a file scan becomes, pinned
    as a face: the same parquet input planned under a 64 KB split
    target yields strictly more input partitions than under the
    default 128 MB, values identical either way (splits are a pure
    physical re-chunking). This is the repo's own measured tuning
    lever (CLAUDE.md: 16 MB splits raised busy-fraction on the
    1.7 GB bench input but per-task overhead ate smaller splits) —
    at 100 TB split sizing is the difference between 800k
    well-pipelined tasks and 80 starved ones, and it interacts with
    AQE's advisory sizes downstream. Mechanism rides the hash as
    the more_splits boolean (both partition counts measured from
    the planned scan RDDs under conf scope, restored in finally);
    correctness rides the count + id checksum, which a mis-split
    scan (dropped or doubled split) would break."""
    key_b = "spark.sql.files.maxPartitionBytes"
    key_o = "spark.sql.files.openCostInBytes"
    prev_b, prev_o = spark.conf.get(key_b), spark.conf.get(key_o)
    ev = t(spark, sf, "events").select("event_id")
    n_default = ev.rdd.getNumPartitions()
    spark.conf.set(key_b, "65536")
    spark.conf.set(key_o, "0")
    try:
        ev_small = t(spark, sf, "events").select("event_id")
        n_small = ev_small.rdd.getNumPartitions()
        out = ev_small.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("event_id"), F.lit(0))
            .cast("long")
            .alias("id_sum"),
            F.lit(bool(n_small > n_default)).alias("more_splits"),
        )
        from ..operators.dedup import parquet_checkpoint

        return parquet_checkpoint(out, "split_sizing_out")
    finally:
        spark.conf.set(key_b, prev_b)
        spark.conf.set(key_o, prev_o)


# ---------------------------------------------------------------------------
# CBO join reorder — ANALYZE'd stats actually change the join order
# ---------------------------------------------------------------------------
@q(
    "join_cbo_reorder",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)),
                         0) AS BIGINT) AS rev_cents,
           TRUE AS reordered
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE n.n_name = 'FRANCE'
    """,
)
def join_cbo_reorder(spark, sf):
    """Cost-based join REORDERING: with per-column statistics
    (ANALYZE TABLE ... FOR ALL COLUMNS) and
    spark.sql.cbo.joinReorder.enabled, Catalyst moves the selective
    customer-nation reduction AHEAD of the big orders join — measured
    here as the optimized plan's scan order flipping from the
    syntactic (orders, customer, nation) to (customer, nation,
    orders) the moment CBO sees the stats. That is the third leg of
    the optimizer-mechanism family: DPP (join_dpp) prunes inputs,
    AQE (join_aqe_bhj_convert) fixes strategies at runtime from
    MEASURED sizes, CBO fixes join ORDER at plan time from COLLECTED
    stats — and order is the one of the three that can change cost
    by orders of magnitude on a 100-TB snowflake (joining the fact
    table first materializes it twice). The face builds app-suffixed
    analyzed catalog tables (sql_catalog_table's collision
    discipline), plans the same query under cbo off/on, rides the
    order-changed boolean into the hash, executes the CBO plan
    eagerly, and drops the tables in finally. Values are
    order-independent — which is exactly why reordering is always
    legal and only cost decides."""
    import re as _re

    from ..operators.dedup import parquet_checkpoint

    app = spark.sparkContext.applicationId.replace("-", "_")
    names = {}
    confs = {
        "spark.sql.cbo.enabled": None,
        "spark.sql.cbo.joinReorder.enabled": None,
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for tbl in ("customer", "orders", "nation"):
            nm = f"cbo_{tbl}_{app}"
            names[tbl] = nm
            spark.sql(f"DROP TABLE IF EXISTS {nm}")
            t(spark, sf, tbl).write.saveAsTable(nm)
            spark.sql(
                f"ANALYZE TABLE {nm} COMPUTE STATISTICS FOR ALL COLUMNS"
            )
        q_sql = f"""
            SELECT COUNT(*) AS n,
                   COALESCE(SUM(CAST(round(o_totalprice * 100)
                                     AS BIGINT)), CAST(0 AS BIGINT))
                     AS rev_cents
            FROM {names['orders']} o
            JOIN {names['customer']} c ON c.c_custkey = o.o_custkey
            JOIN {names['nation']} n ON n.n_nationkey = c.c_nationkey
            WHERE n.n_name = 'FRANCE'
        """

        def scan_order(cbo: str) -> list:
            spark.conf.set("spark.sql.cbo.enabled", cbo)
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo)
            plan = (
                spark.sql(q_sql)
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
            seen = []
            for m in _re.findall(r"cbo_(\w+?)_", plan):
                if m not in seen:
                    seen.append(m)
            return seen

        base_order = scan_order("false")
        cbo_order = scan_order("true")
        reordered = (
            base_order != cbo_order and cbo_order[-1] == "orders"
        )
        out_df = spark.sql(q_sql).select(  # executes under cbo=true
            "n",
            "rev_cents",
            F.lit(reordered).alias("reordered"),
        )
        return parquet_checkpoint(out_df, "cbo_reorder_out")
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for nm in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {nm}")


# ---------------------------------------------------------------------------
# wave 100: AQE partition coalescing — the small-output shuffle fix
# ---------------------------------------------------------------------------
@q(
    "agg_aqe_coalesce",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM({cents}) AS BIGINT) AS cents,
           TRUE AS coalesced,
           TRUE AS parts_bounded
    FROM orders GROUP BY o_orderpriority
    """.format(cents=SQL_CENTS.format(x="o_totalprice")),
)
def agg_aqe_coalesce(spark, sf):
    """AQE partition coalescing — the third leg of the
    runtime-adaptivity triad (join_aqe_bhj_convert fixes STRATEGY,
    join_skew_aqe SPLITS fat partitions, this face MERGES thin ones):
    the job is planned with a deliberately oversized
    spark.sql.shuffle.partitions = 200 — the defensive setting a
    shared 100-TB cluster runs so the BIG aggregations don't spill —
    and AQE's coalescePartitions rewrites the shuffle read at runtime
    down to a handful of partitions once the map stage reports tiny
    actual bytes, so the 5-group rollup doesn't schedule 200
    near-empty reducers (pure overhead: task launch + fetch per
    partition, multiplied across every small stage of a 1000-stage
    pipeline). Runtime effect, so the face executes eagerly and rides
    two booleans into the hash (join_aqe_bhj_convert discipline):
    `AQEShuffleRead coalesced` present in the final plan, and the
    materialized reducer count strictly below the planned 200.
    Values are the plain priority rollup — coalescing is
    value-neutral, which is what makes it hash-gatable."""
    from ..operators.dedup import parquet_checkpoint

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        agg = (
            t(spark, sf, "orders")
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.coalesce(F.sum(cents(F.col("o_totalprice"))), F.lit(0))
                .cast("long")
                .alias("cents"),
            )
        )
        agg.collect()  # drive AQE to the final plan
        final = agg._jdf.queryExecution().executedPlan().toString()
        coalesced = "AQEShuffleRead coalesced" in final
        n_parts = agg.rdd.getNumPartitions()
        out = agg.select(
            "o_orderpriority",
            "n",
            "cents",
            F.lit(bool(coalesced)).alias("coalesced"),
            F.lit(bool(n_parts < 200)).alias("parts_bounded"),
        )
        return parquet_checkpoint(out, "aqe_coalesce_out")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


# ---------------------------------------------------------------------------
# wave 100: histogram_numeric in its exact regime — zero-distance
# merges only while ndv <= nbins
# ---------------------------------------------------------------------------
@q(
    "agg_hist_numeric",
    """
    SELECT CAST(l_quantity AS BIGINT) AS qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
    """,
)
def agg_hist_numeric(spark, sf):
    """``histogram_numeric`` (the Hive/Spark streaming histogram
    sketch) gated EXACTLY in its provable regime — the
    agg_approx_topk discipline applied to the third native sketch.
    The sketch trims to nbins by repeatedly merging the CLOSEST
    centroid pair; while the input's distinct-value count stays
    <= nbins, every partial and every merge always contains a
    zero-distance pair (duplicate centroids from different
    partitions) before any pair of DISTINCT values, so trimming only
    ever fuses exact duplicates: centroids stay exact input values
    and weights stay exact counts. The raw array is still
    partition-ORDER-dependent (duplicates split across partials —
    measured: 20 bins for 7 values), so the face re-aggregates the
    exploded sketch with a GROUP BY — that reduction, not the raw
    array, is the deterministic object, and it equals the plain
    GROUP-BY histogram the twin computes. l_quantity has 50 distinct
    integral values vs nbins=64. Outside this regime (ndv > nbins)
    centroids become partition-dependent weighted means and NOTHING
    is hashable — the boundary this face documents."""
    h = (
        t(spark, sf, "lineitem")
        .agg(F.expr("histogram_numeric(l_quantity, 64)").alias("h"))
        .select(F.explode("h").alias("b"))
        .select(
            F.col("b.x").cast("long").alias("qty"),
            F.col("b.y").alias("w"),
        )
    )
    return h.groupBy("qty").agg(
        F.round(F.sum("w")).cast("long").alias("n")
    )


# ---------------------------------------------------------------------------
# wave 105: broadcast nested-loop join — the O(1)-build-side regime
# where BNLJ is the RIGHT plan
# ---------------------------------------------------------------------------
@q(
    "join_bnlj_bands",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('tiny', 0, 10), ('small', 10, 20), ('mid', 20, 35),
             ('large', 35, 45), ('huge', 45, 1000000)),
    j AS (
      SELECT b.band, l.l_quantity
      FROM lineitem l JOIN bands b
        ON l.l_quantity >= b.lo AND l.l_quantity < b.hi)
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
    FROM j GROUP BY band
    """,
)
def join_bnlj_bands(spark, sf):
    """BroadcastNestedLoopJoin in the ONE regime where it is the
    right plan — completing the join-strategy matrix (BHJ:
    join_broadcast, SMJ: join_sortmerge, SHJ: join_shuffle_hash,
    and the chunked equi-rewrite join_range_chunked exists precisely
    to AVOID BNLJ between two big sides): a pure-inequality join
    against an O(1)-row config/band table. With no equi-key Spark
    has only nested-loop strategies, and broadcasting the 5-row band
    table makes the 'loop' a 5-predicate test fused into the scan
    pipeline — zero shuffle for the join (the only Exchange is the
    final rollup's), cost 5n comparisons, which no rewrite beats.
    The audit pins BroadcastNestedLoopJoin BuildRight in the plan so
    a regression to CartesianProduct (both sides shuffled+looped —
    the scale-killer spelling) or to a misplaced sort-merge can't
    land silently. Bands tile the domain disjointly so the join is
    row-preserving — COUNT conservation is part of the test."""
    bands = spark.createDataFrame(
        [
            ("tiny", 0, 10),
            ("small", 10, 20),
            ("mid", 20, 35),
            ("large", 35, 45),
            ("huge", 45, 1000000),
        ],
        "band string, lo int, hi int",
    )
    li = t(spark, sf, "lineitem").select("l_quantity")
    j = li.join(
        F.broadcast(bands),
        (F.col("l_quantity") >= F.col("lo"))
        & (F.col("l_quantity") < F.col("hi")),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("l_quantity").cast("long"))
        .cast("long")
        .alias("qty_sum"),
    )


# ---------------------------------------------------------------------------
# wave 118: write-audit-publish — staged write, constraint audit,
# atomic rename publish
# ---------------------------------------------------------------------------
@q(
    "lake_wap",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents,
           TRUE AS audit_passed, TRUE AS published
    FROM orders GROUP BY o_orderpriority
    """,
)
def lake_wap(spark, sf):
    """Write-Audit-Publish — the lakehouse deployment pattern that
    keeps bad data out of consumer view without table-format
    branches: the batch lands in a STAGING path invisible to
    readers, an audit pass runs the quality gates against the
    staged files (here: row-count reconciliation against the
    source, zero NULL keys, zero negative totals — the
    check_constraints shape), and only a passing audit PUBLISHES by
    an atomic directory rename into the serving path — a failed
    audit leaves the serving path untouched and the staging dir for
    forensics (the face would return audit_passed = FALSE and
    publish nothing; the gate hashing TRUE proves the happy path
    end-to-end: what was published is byte-for-byte what was
    staged). This
    is WAP on plain parquet — Iceberg/Delta make the rename a
    metadata swap (documented catalog seam, SURVEY §0); the
    mechanics and the audit contract are identical. Eager +
    checkpoint because the staging/serving tree is reclaimed on
    return (the scan_recursive discipline). Scale note: the rename
    is O(1) on a real filesystem and the audit reads only the
    staged batch, never the serving history."""
    import os
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    src = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    n_src = src.count()
    with tempfile.TemporaryDirectory(prefix="lake_wap_") as tmp:
        staging = os.path.join(tmp, "staging", "batch_001")
        serving = os.path.join(tmp, "serving", "batch_001")
        os.makedirs(os.path.dirname(serving), exist_ok=True)
        src.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        bad = staged.filter(
            F.col("o_orderkey").isNull() | (F.col("o_totalprice") < 0)
        ).count()
        audit_passed = bool(bad == 0 and staged.count() == n_src)
        published = False
        if audit_passed:
            os.rename(staging, serving)
            published = True
        read_path = serving if published else staging
        out = (
            spark.read.parquet(read_path)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                )
                .cast("long")
                .alias("cents"),
            )
            .select(
                "o_orderpriority",
                "n",
                "cents",
                F.lit(audit_passed).alias("audit_passed"),
                F.lit(published).alias("published"),
            )
        )
        return parquet_checkpoint(out, "lake_wap_out")
