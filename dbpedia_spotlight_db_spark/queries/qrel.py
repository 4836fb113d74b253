"""Relational operator surface (SURVEY.md §2.6) — scans, projections,
filters, every join flavor, aggregations (incl. the salted two-phase
variant), windows, sorts, set ops, and the scalar-function families.

Each entry: (spark_fn, duckdb_sql | None). Column names match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.salted_agg import salted_count
from .common import cents, t

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
# scans / projection / filter
# ---------------------------------------------------------------------------
@q("scan_parquet", "SELECT n_nationkey, n_name, n_regionkey FROM nation")
def scan_parquet(spark, sf):
    return t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")


@q(
    "project_expr",
    f"""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS disc_cents,
           upper(l_returnflag) AS rf
    FROM lineitem
    """,
)
def project_expr(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "disc_cents"
        ),
        F.upper("l_returnflag").alias("rf"),
    )


@q(
    "filter_pred",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05
      AND l_quantity < 24
    """,
)
def filter_pred(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_discount") > 0.05)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------
@q(
    "join_broadcast",
    f"""
    SELECT c.c_mktsegment, COUNT(*) AS n_orders,
           CAST(round(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))) AS BIGINT) AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_broadcast(spark, sf):
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("tc", cents(F.col("o_totalprice")))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("tc").cast("long").alias("total_cents"),
        )
    )


@q(
    "join_sortmerge",
    """
    SELECT o.o_orderstatus, COUNT(*) AS n_items,
           CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_sortmerge(spark, sf):
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    # big-big join: force shuffle merge (the plan the cluster would pick)
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
    )


@q(
    "join_anti",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@q(
    "join_semi",
    """
    SELECT c_nationkey, COUNT(*) AS n_active
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_nationkey
    """,
)
def join_semi(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@q(
    "join_outer_eval",
    """
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_cust_only,
           COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_order_only
    FROM customer c FULL JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_outer_eval(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("n_cust_only"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_order_only"),
    )


# ---------------------------------------------------------------------------
# aggregations
# ---------------------------------------------------------------------------
@q(
    "agg_counts",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_counts(spark, sf):
    li = t(spark, sf, "lineitem").withColumn("pc", cents(F.col("l_extendedprice")))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.sum("pc").cast("long").alias("sum_cents"),
    )


@q(
    "agg_salted",
    "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag",
)
def agg_salted(spark, sf):
    """Salted two-phase agg ≡ plain agg — the skew-safety invariant,
    checked against the plain-SQL oracle."""
    return salted_count(t(spark, sf, "lineitem"), ["l_returnflag"], out="n")


@q(
    "agg_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def agg_distinct(spark, sf):
    return t(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@q(
    "agg_count_distinct",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )


@q("agg_approx_cd", None)  # approximate — rows-only check by design
def agg_approx_cd(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))
    )


@q(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# windows / sort
# ---------------------------------------------------------------------------
@q(
    "win_topk",
    """
    SELECT o_custkey, o_orderkey, rk FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) WHERE rk <= 3
    """,
)
def win_topk(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t(spark, sf, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
    )


@q(
    "win_rank",
    """
    SELECT event_id,
           rank() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk,
           lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event
    FROM events
    """,
)
def win_rank(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf, "events").select(
        "event_id",
        F.rank().over(w).alias("rk"),
        F.lag("event_id").over(w).alias("prev_event"),
    )


@q(
    "events_sessionize",
    """
    WITH o AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE ts IS NOT NULL),
    f AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev IS NULL
                       OR date_diff('second', prev, ts) > 43200
                  THEN 1 ELSE 0 END AS new_s
      FROM o),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM f)
    SELECT user_id, CAST(sid AS INT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS INT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def events_sessionize(spark, sf):
    """Sessionization (batch face): a session is a maximal run of a
    user's events with consecutive gaps <= 12h — the gap-and-cumsum
    window formulation (lag -> new-session flag -> running sum as
    session id). Deterministic tie-break (ts, event_id). The streaming
    twin (streaming/sessionize_stream, applyInPandasWithState) carries
    the open session as group state instead of a window."""
    # null-ts events are excluded (parity with sessionize_stream)
    e = t(spark, sf, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = 43200
    flagged = e.select(
        "user_id", "event_id", "ts", F.lag("ts").over(w).alias("prev")
    ).withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (
                F.unix_timestamp(F.col("ts").cast("timestamp"))
                - F.unix_timestamp(F.col("prev").cast("timestamp"))
                > gap
            ),
            1,
        ).otherwise(0),
    )
    sid = flagged.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sid.groupBy("user_id", F.col("sid").cast("int").alias("session_id")).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )


@q(
    "stream_sessionize",
    """
    WITH o AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE ts IS NOT NULL),
    f AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev IS NULL
                       OR date_diff('second', prev, ts) > 43200
                  THEN 1 ELSE 0 END AS new_s
      FROM o),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM f),
    sess AS (
      SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(COUNT(*) AS INT) AS n_events
      FROM s GROUP BY user_id, sid),
    mx AS (SELECT user_id, MAX(sid) AS mx FROM sess GROUP BY user_id)
    SELECT sess.user_id, sess.session_start, sess.session_end, sess.n_events
    FROM sess JOIN mx ON sess.user_id = mx.user_id AND sess.sid < mx.mx
    """,
)
def stream_sessionize(spark, sf):
    """The STATEFUL STREAMING sessionizer under the full oracle gate:
    runs streaming/sessionize_stream (applyInPandasWithState) over the
    events table as a file-source stream with trigger(availableNow),
    collects the append-mode output from a memory sink, and returns
    it. The stream emits exactly the CLOSED sessions — every session
    but each user's final (still-open) one — so the DuckDB twin is the
    batch gap-and-cumsum sessionization minus each user's max session
    id. This puts the state-store path on the hard driver signal
    instead of only the batch-equivalence test."""
    import os
    import tempfile

    from ..streaming.annotate_stream import sessionize_stream

    name = f"stream_sess_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_sess_") as tmp:
        # The file stream source wants a DIRECTORY of files; the test
        # fixtures are single .parquet files, so stage a symlink.
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        src = spark.readStream.schema(schema).parquet(src_dir)
        q_ = (
            sessionize_stream(src)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


import itertools as _itertools

_STREAM_Q_COUNTER = _itertools.count()


@q(
    "join_asof",
    """
    WITH e AS (SELECT * FROM events WHERE ts IS NOT NULL),
    u AS (
      SELECT user_id AS k, ts, 1 AS is_r, event_id AS click_id,
             CAST(NULL AS BIGINT) AS purchase_id
      FROM e WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, 0, CAST(NULL AS BIGINT), event_id
      FROM e WHERE event_type = 'purchase'),
    w AS (
      SELECT *, last_value(click_id IGNORE NULLS) OVER (
          PARTITION BY k ORDER BY ts, is_r DESC, coalesce(click_id, -1)
          ROWS UNBOUNDED PRECEDING) AS asof_click_id
      FROM u)
    SELECT purchase_id AS event_id, k AS user_id, ts, asof_click_id
    FROM w WHERE is_r = 0
    """,
)
def join_asof(spark, sf):
    """AS-OF JOIN (a custom operator Spark lacks natively): for each
    purchase event, the user's most recent click at or before its
    timestamp. Implemented as the SCALABLE union-scan form — tag both
    sides, one shuffle+sort per user on (ts, side), carry the last
    non-null right key forward with last_value(ignoreNulls) — never
    the naive key-join + filter + row_number, whose candidate fan-out
    is |left_per_key| x |right_per_key|. Ties at equal ts: the right
    side wins (<= semantics), and among equal-ts clicks the largest
    event_id (deterministic). Events with no prior click keep NULL.
    Operator: operators/asof.asof_join (unit-tested edge semantics)."""
    from ..operators.asof import asof_join

    e = t(spark, sf, "events").filter(F.col("ts").isNotNull())
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return asof_join(
        purchases, clicks, "user_id", "ts", "click_id", "asof_click_id"
    ).select("event_id", "user_id", "ts", "asof_click_id")


@q(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS q25,
           round(quantile_cont(l_quantity, 0.5), 6) AS q50,
           round(quantile_cont(l_quantity, 0.75), 6) AS q75,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf):
    """EXACT percentiles (linear interpolation) per group — Spark's
    ``percentile`` aggregate == DuckDB ``quantile_cont``, both the
    standard type-7 quantile. Scale note: exact percentile is a
    sort-based agg (per-group collect of the column); at corpus scale
    the streaming-friendly variant is ``approx_percentile`` (KLL-ish
    sketch, map-side combinable) — kept exact here because the oracle
    gate demands bit-equality and the grouped column fits per group."""
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("q50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q75"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias(
            "p90_price"
        ),
    )


@q(
    "agg_rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(round(SUM(o_totalprice) * 100) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_orders(spark, sf):
    """ROLLUP grouping sets (subtotals + grand total) with a summed
    measure, on the orders table (the plain-count lineitem rollup is
    the long-stable `agg_rollup` face above — this one previously
    shadowed it under the same key until the q() duplicate guard).
    Spark expands rollup into a single expand+hash-agg pass (one
    shuffle, map-side partials per grouping set) — no per-set re-scan
    of the fact table, which is the property that matters at 10^12
    rows."""
    o = t(spark, sf, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        cents(F.sum("o_totalprice")).alias("total_cents"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@q(
    "pivot_events",
    f"""
    SELECT user_id,
           {', '.join(
               f"CAST(COUNT(*) FILTER (WHERE event_type = '{et}') AS BIGINT)"
               f" AS {et}" for et in _EVENT_TYPES
           )}
    FROM events GROUP BY user_id
    """,
)
def pivot_events(spark, sf):
    """Pivot (long -> wide): per-user event-type counts. The pivot
    value list is EXPLICIT — with it Spark plans a single two-phase
    hash aggregation (one shuffle); without it a values-discovery
    job must scan the corpus first, and an unbounded distinct-value
    set would blow the schema at web scale."""
    e = t(spark, sf, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        # absent (user, type) cells pivot to NULL; the FILTER-agg twin
        # (and any sane consumer) wants 0
        .na.fill(0, _EVENT_TYPES)
    )


@q(
    "join_range",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS purchase_user, c.user_id AS click_user
    FROM events p
    JOIN events c
      ON c.ts >= p.ts - INTERVAL 600 SECOND AND c.ts < p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      AND p.ts IS NOT NULL AND c.ts IS NOT NULL
    """,
)
def join_range(spark, sf):
    """TIME-RANGE JOIN with no equi key (every purchase paired with
    every click — any user — in the preceding 10 minutes). The naive
    theta-join is |P| x |C| and Spark would plan a
    BroadcastNestedLoopJoin; operators/rangejoin.time_range_join
    quantizes time into window-width buckets so it becomes a shuffle
    EQUI-join on the bucket id (left side explodes to exactly 2
    candidate buckets) + a residual filter — the partition-friendly
    shape at web scale. The DuckDB twin is the declarative theta-join
    (its IEJoin handles fixture scale)."""
    from ..operators.rangejoin import time_range_join

    e = t(spark, sf, "events").filter(F.col("ts").isNotNull())
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("c_ts"),
    )
    return time_range_join(
        purchases, clicks, "p_ts", "c_ts", window_sec=600
    ).select("purchase_id", "click_id", "purchase_user", "click_user")


@q(
    "sample_hash",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    """,
)
def sample_hash(spark, sf):
    """Deterministic ~1/16 corpus sample by content-independent key
    hash (the reproducible-split primitive for training-data
    pipelines: the same doc lands in the same split on every engine,
    every run, every cluster size). Pure map-side filter — pushes to
    the scan, no shuffle, and composes with any downstream op.
    md5-on-key keeps the DuckDB twin bit-identical (Spark xxhash64
    has no DuckDB counterpart)."""
    d = t(spark, sf, "documents")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    ).select("doc_id", "lang")


@q(
    "sort_limit",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 50
    """,
)
def sort_limit(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(50)
        .select("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# set ops
# ---------------------------------------------------------------------------
@q(
    "set_union",
    """
    SELECT c_custkey AS k FROM customer
    UNION SELECT o_custkey AS k FROM orders
    """,
)
def set_union(spark, sf):
    c = t(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = t(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    return c.union(o).distinct()


@q(
    "set_except",
    """
    SELECT c_custkey AS k FROM customer
    EXCEPT SELECT o_custkey AS k FROM orders
    """,
)
def set_except(spark, sf):
    c = t(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = t(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    return c.exceptAll(o).distinct()


@q(
    "set_intersect",
    """
    SELECT c_custkey AS k FROM customer
    INTERSECT SELECT o_custkey AS k FROM orders
    """,
)
def set_intersect(spark, sf):
    c = t(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = t(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    return c.intersect(o)


# ---------------------------------------------------------------------------
# scalar function families
# ---------------------------------------------------------------------------
@q(
    "str_fns",
    """
    SELECT p_partkey, lower(p_brand) AS lb, length(p_name) AS ln,
           substring(p_type, 1, 5) AS t5,
           replace(p_name, ' ', '_') AS uname,
           concat(p_brand, ':', p_type) AS bt
    FROM part
    """,
)
def str_fns(spark, sf):
    return t(spark, sf, "part").select(
        "p_partkey",
        F.lower("p_brand").alias("lb"),
        F.length("p_name").alias("ln"),
        F.substring("p_type", 1, 5).alias("t5"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("uname"),
        F.concat_ws(":", "p_brand", "p_type").alias("bt"),
    )


@q(
    "date_fns",
    """
    SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(dayofmonth(o_orderdate) AS INT) AS d,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    """,
)
def date_fns(spark, sf):
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


@q(
    "math_fns",
    """
    SELECT l_orderkey, l_linenumber,
           round(ln(l_extendedprice), 6) AS log_price,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           abs(l_discount - 0.05) AS d_off,
           CAST(round(power(l_quantity, 2)) AS BIGINT) AS qty_sq
    FROM lineitem
    """,
)
def math_fns(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.abs(F.col("l_discount") - 0.05).alias("d_off"),
        F.round(F.pow("l_quantity", 2)).cast("long").alias("qty_sq"),
    )


@q(
    "arr_fns",
    """
    SELECT vec_id, len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS l1
    FROM embeddings
    """,
)
def arr_fns(spark, sf):
    e = t(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.round(
            F.expr(
                "aggregate(embedding, 0.0d, (acc, x) -> acc + cast(x as double))"
            ),
            6,
        ).alias("l1"),
    )


@q(
    "json_fns",
    "SELECT event_id, CAST(props->>'k' AS INTEGER) AS k FROM events",
)
def json_fns(spark, sf):
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@q(
    "join_salted",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_name, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def join_salted(spark, sf):
    """Explicitly skew-salted equi-join (operators/skewjoin): the big
    side carries a content-derived salt, the dim side is replicated
    salt_n x, and the hot key's rows spread over salt_n reduce tasks
    instead of one. Result set == the plain join (the oracle IS the
    plain join); this face pins that identity on real tables. Used
    where AQE's adaptive skew split can't reach (required
    distributions, stats that predate the hot key) — north_rule's
    "skew handled explicitly"."""
    from ..operators.skewjoin import salted_join

    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    pt = t(spark, sf, "part").select("p_partkey", "p_name", "p_brand")
    return salted_join(
        li,
        pt,
        "l_partkey",
        "p_partkey",
        salt_n=8,
        salt_cols=["l_orderkey", "l_linenumber"],
    ).select("l_orderkey", "l_linenumber", "l_partkey", "p_name", "p_brand")


@q(
    "stream_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events WHERE ts IS NOT NULL
    """,
)
def stream_dedup(spark, sf):
    """Streaming EXACT DEDUP on the oracle gate: dedup_stream
    (watermarked dropDuplicates — streaming/annotate_stream.py) over
    the events table as a file-source stream, trigger(availableNow),
    memory sink. Emitting only the key columns makes the output the
    deterministic distinct-key SET (which physical row wins per key
    is arrival-order-dependent and irrelevant), so the DuckDB twin is
    a plain DISTINCT. The batch-scale twin of this exact semantics is
    dedup_exact; this face puts the state-store path on the hard
    driver signal."""
    import os
    import tempfile

    from ..streaming.annotate_stream import dedup_stream

    name = f"stream_dedup_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_dedup_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        src = spark.readStream.schema(schema).parquet(src_dir)
        q_ = (
            dedup_stream(src, ["user_id", "event_type"])
            .select("user_id", "event_type")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


@q(
    "events_funnel",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT v.user_id,
           CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
                AS INT) AS stage
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def events_funnel(spark, sf):
    """Ordered-sequence funnel (view -> click -> purchase): per user,
    the deepest stage reached with the strict-ordering semantics
    (each stage must occur AFTER the previous stage's first
    occurrence) — the sequential-pattern analytics face. Per stage:
    one map-side-combinable min-agg over a pushed-down event_type
    filter, then a user-keyed join to gate the next stage; the user
    dimension is what shuffles, never the raw event log twice per
    stage. At web scale the stage relations are |users|-sized and
    the left joins collapse into one user-partitioned stage chain."""
    e = t(spark, sf, "events")

    def first_after(ev, gate, tcol, prev_t):
        j = e.filter(F.col("event_type") == ev)
        if gate is None:
            return j.groupBy("user_id").agg(F.min("ts").alias(tcol))
        return (
            j.join(gate, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    v = first_after("view", None, "t1", None)
    c = first_after("click", v, "t2", "t1")
    p = first_after("purchase", c, "t3", "t2")
    return (
        v.join(c.select("user_id", F.lit(1).alias("s2")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("s3")), "user_id", "left")
        .select(
            "user_id",
            (F.lit(1) + F.coalesce("s2", F.lit(0)) + F.coalesce("s3", F.lit(0)))
            .cast("int")
            .alias("stage"),
        )
    )


@q(
    "retention_cohorts",
    """
    WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS d FROM events e)
    SELECT CAST((f.first_day - DATE '2024-01-01') // 7 AS INT) AS cohort_week,
           CAST((a.d - f.first_day) // 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark, sf):
    """Cohort-retention matrix: users bucketed by first-seen week,
    counted once per later active week — the cohort/retention
    analytics face. Week buckets are integer day-arithmetic (days
    since a fixed epoch, floor-div 7), not engine week-truncation,
    so bucket edges are bit-identical across engines and timezones —
    the twin must use DuckDB's `//` (its `/` is FLOAT division, and
    the round-half-even int cast disagrees with Spark's floor()
    whenever days % 7 >= 4; caught by the sf0.01 gate).
    Scale shape: first-seen is one min-agg; the activity relation is
    distinct (user, day) — bounded by users x horizon, not event
    volume — and the final matrix agg is map-side combinable on a
    tiny (cohort, offset) key space."""
    e = t(spark, sf, "events")
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    a = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    j = a.join(f, "user_id")
    return (
        j.select(
            F.floor(F.datediff("first_day", F.lit("2024-01-01")) / 7)
            .cast("int")
            .alias("cohort_week"),
            F.floor(F.datediff("d", "first_day") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@q(
    "stream_enrich",
    """
    SELECT e.event_id, e.user_id, n.n_name, e.event_type
    FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
    """,
)
def stream_enrich(spark, sf):
    """STREAM-STATIC JOIN on the oracle gate: enrich_stream
    (streaming/annotate_stream.py) joins the events file-stream to
    the static nation dimension with a broadcast hash join inside
    each micro-batch — the stateless enrichment shape (no watermark,
    no state store) that attaches dimension attributes to an
    unbounded stream. trigger(availableNow) + memory sink makes the
    final output the exact batch-join row set, so the DuckDB twin is
    the plain equi-join. The static side is re-planned per batch at
    scale (dimension refreshes are picked up live)."""
    import os
    import tempfile

    from ..streaming.annotate_stream import enrich_stream

    name = f"stream_enrich_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    dim = t(spark, sf, "nation")
    with tempfile.TemporaryDirectory(prefix="stream_enrich_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        src = spark.readStream.schema(schema).parquet(src_dir)
        q_ = (
            enrich_stream(src, dim)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


@q(
    "stream_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 3 DAY
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      AND c.ts IS NOT NULL AND p.ts IS NOT NULL
    """,
)
def stream_join(spark, sf):
    """STREAM-STREAM JOIN on the oracle gate: join_streams
    (streaming/annotate_stream.py) joins the click file-stream to the
    purchase file-stream on user within a 3-day event-time horizon —
    watermarks on BOTH inputs plus the time-range predicate give the
    state store a provable eviction bound (a click can leave state
    once the purchase watermark passes click_ts + horizon), the shape
    that keeps a double-unbounded join finite. Inner join under
    trigger(availableNow) emits exactly the batch-join row set, so
    the DuckDB twin is the equivalent bounded self-join. Completes
    the streaming join family: stream-static (stream_enrich) and now
    stream-stream."""
    import os
    import tempfile

    from ..streaming.annotate_stream import join_streams

    name = f"stream_join_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_join_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        clicks = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .filter(F.col("event_type") == "click")
        )
        purchases = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .filter(F.col("event_type") == "purchase")
        )
        q_ = (
            join_streams(clicks, purchases)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


@q(
    "stream_outer_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
    FROM events c LEFT JOIN events p
      ON p.user_id = c.user_id AND p.event_type = 'purchase'
     AND p.ts IS NOT NULL
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 3 DAY
    WHERE c.event_type = 'click' AND c.ts IS NOT NULL
    """,
)
def stream_outer_join(spark, sf):
    """STREAM-STREAM LEFT OUTER join on the oracle gate — the
    non-converting-clicks feed (outer_join_streams in
    streaming/annotate_stream.py). The outer side adds the one
    discipline the inner join doesn't have: an unmatched click is
    emitted only when the purchase watermark PROVES no future match
    (wm > c_ts + horizon), so a bounded replay would terminate with
    the last horizon of clicks still buffered in state. The face
    pushes the final watermark past the data with far-future
    SENTINEL rows (negative user ids, filtered out post-join) fed as
    separate micro-batches via maxFilesPerTrigger=1 — two push
    rounds, because outer emission uses the watermark computed at
    the END of the PREVIOUS batch; this is the standard end-of-
    stream flush for replaying a bounded log through a streaming
    topology. With the flush, availableNow output == the exact batch
    left-join row set, so the DuckDB twin is a plain LEFT JOIN."""
    import glob
    import os
    import shutil
    import tempfile

    from ..streaming.annotate_stream import outer_join_streams

    name = f"stream_ojoin_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_ojoin_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "00_events.parquet"),
        )
        import datetime as _dt

        for i, (yr, et) in enumerate(
            [(2030, "click"), (2030, "purchase"),
             (2035, "click"), (2035, "purchase")]
        ):
            sdir = os.path.join(tmp, f"s{i}")
            spark.createDataFrame(
                [(-(100 + i), _dt.datetime(yr, 1, 1), -(100 + i), et,
                  0.0, "{}")],
                schema,
            ).coalesce(1).write.mode("overwrite").parquet(sdir)
            part = glob.glob(os.path.join(sdir, "part-*.parquet"))[0]
            shutil.copy(part, os.path.join(src_dir, f"{10 + i:02d}_s.parquet"))

        def side(et):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
                .filter(F.col("event_type") == et)
            )

        q_ = (
            outer_join_streams(side("click"), side("purchase"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name).filter(F.col("user_id") >= 0)


@q(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf):
    """CUBE grouping sets (all 2^k dimension subsets in one Expand +
    one agg pass — the OLAP dual of agg_rollup's hierarchy). Same
    scale shape as rollup: the Expand multiplies rows map-side by the
    number of grouping sets, then one map-side-combinable agg; never
    k separate scans of the fact table."""
    return (
        t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
    )


@q(
    "win_moving_avg",
    """
    SELECT user_id, event_id,
           round(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
    FROM events
    """,
)
def win_moving_avg(spark, sf):
    """Framed window aggregates: a 3-row moving average and a running
    total per user in event-time order — the rolling-metric face
    (smoothed rates, cumulative spend) that complements win_topk's
    ranking windows with ROWS-frame aggregation. The running total
    sums exact integer cents (cross-engine float SUM over a growing
    frame would accumulate differently); the moving average divides
    a <=3-value frame once and rounds to 6. (ts, event_id) is a total
    order so frames are engine-identical. Scale shape: one shuffle on
    user_id, per-partition sort, single pass — no self-join
    formulation, which is the naive O(frame x rows) alternative."""
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("mavg"),
        F.sum(cents(F.col("value")))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("run_cents"),
    )


@q(
    "unpivot_events",
    """
    SELECT event_type, 'n_events' AS metric,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, 'cents',
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, 'n_users',
           CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM events GROUP BY event_type
    """,
)
def unpivot_events(spark, sf):
    """Wide-to-long reshaping (the inverse of pivot_events): per-type
    metrics computed wide in ONE agg pass, then melted to (event_type,
    metric, total) rows with DataFrame.unpivot — the tidy-format
    export shape dashboards and metric stores ingest. The twin builds
    the same long relation from first principles (stacked UNION ALL),
    so the oracle checks the reshape semantics, not the operator
    spelling. Scale shape: one
    map-side-combinable agg on the tiny type key, then a row-local
    melt — the unpivot itself adds no exchange."""
    e = t(spark, sf, "events")
    wide = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents(F.col("value"))).cast("long").alias("cents"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return wide.unpivot(
        ["event_type"], ["n_events", "cents", "n_users"], "metric", "total"
    )


@q(
    "check_constraints",
    """
    SELECT 'orders.o_custkey_not_null' AS rule,
           CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders.o_orderkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.o_totalprice_positive',
           CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.fk_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
)
def check_constraints(spark, sf):
    """Data-quality constraint report (the Deequ/expectations face):
    declared table constraints -> one (rule, n_violations) row
    each — the validation gate a pipeline runs before publishing a
    snapshot. Three single-table checks (not-null, key uniqueness,
    value range) fold into ONE scan-and-aggregate pass over the fact
    table (conditional counts + count-distinct side by side); the
    referential check is a separate anti-join against the dimension
    (unhinted — the dimension may be corpus-sized at web scale; AQE
    picks broadcast when it fits). The report is tiny and total:
    violation COUNTS, not violating rows, so it aggregates instead of
    materializing the (possibly huge) offender set — offender
    sampling is a follow-up query on a named constraint."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    one = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1))
        .cast("long")
        .alias("o_custkey_not_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("o_orderkey_unique"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1))
        .cast("long")
        .alias("o_totalprice_positive"),
    )
    singles = one.unpivot(
        [], ["o_custkey_not_null", "o_orderkey_unique", "o_totalprice_positive"],
        "k", "n_violations",
    ).select(
        F.concat(F.lit("orders."), F.col("k")).alias("rule"),
        "n_violations",
    )
    orphans = (
        o.filter(F.col("o_custkey").isNotNull())
        .join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(
            F.lit("orders.fk_customer").alias("rule"), "n_violations"
        )
    )
    return singles.unionByName(orphans)


@q(
    "join_interval",
    """
    WITH ci AS (
      SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS click_day,
             MIN(ts) AS c_lo, MAX(ts) AS c_hi
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, CAST(ts AS DATE)),
    vi AS (
      SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS view_day,
             MIN(ts) AS v_lo, MAX(ts) AS v_hi
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, CAST(ts AS DATE))
    SELECT ci.user_id, ci.click_day, vi.view_day
    FROM ci JOIN vi ON vi.user_id = ci.user_id
     AND ci.c_lo <= vi.v_hi AND vi.v_lo <= ci.c_hi
    """,
)
def join_interval(spark, sf):
    """INTERVAL-OVERLAP join: each user's daily click activity span
    [first, last] matched to their view spans that overlap it in
    time (the attribution primitive for 'was the user browsing while
    clicking'). Unlike join_range (no equi key -> bucket
    quantization), interval joins in practice carry a natural
    co-partitioning key — here user_id — so the scale shape is an
    EQUI-join shuffled once on that key with the overlap condition
    [lo_a <= hi_b AND lo_b <= hi_a] as a residual filter; per-key
    group sizes are bounded (days per user), so no quadratic blow-up
    and no nested-loop fallback. Interval endpoints never leave the
    plan (days exit as ISO strings — CLAUDE.md DATE rule)."""
    e = t(spark, sf, "events")

    def spans(etype, day_alias, lo, hi):
        return (
            e.filter(F.col("event_type") == etype)
            .groupBy("user_id", F.to_date("ts").alias("_d"))
            .agg(F.min("ts").alias(lo), F.max("ts").alias(hi))
            .select(
                "user_id",
                F.date_format("_d", "yyyy-MM-dd").alias(day_alias),
                lo,
                hi,
            )
        )

    ci = spans("click", "click_day", "c_lo", "c_hi")
    vi = spans("view", "view_day", "v_lo", "v_hi")
    return (
        ci.join(vi, "user_id")
        .filter(
            (F.col("c_lo") <= F.col("v_hi")) & (F.col("v_lo") <= F.col("c_hi"))
        )
        .select("user_id", "click_day", "view_day")
    )


@q(
    "win_session_window",
    """
    WITH o AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE ts IS NOT NULL),
    f AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev IS NULL
                       OR epoch_us(ts) - epoch_us(prev) > 3600000000
                  THEN 1 ELSE 0 END AS new_s
      FROM o),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM f)
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def win_session_window(spark, sf):
    """Sessionization via Spark's NATIVE ``session_window`` aggregate
    (the built-in dynamic-gap session operator, one hash-agg pass
    that merges overlapping [t, t+gap) windows — the same primitive
    the streaming engine uses for stateful session aggregation, here
    on a batch frame). The oracle is the classic gaps-and-islands
    formulation, with the boundary matched EXACTLY: session_window
    MERGES an event that lands at precisely last + gap (closed gap
    end — pinned by tests/test_wave15.py), so the twin's new-session
    test is STRICT ``diff > gap`` in MICROSECONDS (epoch_us on both
    sides — date_diff('second') truncates and would disagree on
    fractional boundaries). Events carry microsecond timestamps;
    equality of the two formulations is therefore exact, and a green
    hash proves the native operator == the window-algebra
    definition."""
    e = t(spark, sf, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "3600 seconds").alias("w")
        )
        .agg(F.min("ts").alias("session_start"),
             F.count(F.lit(1)).cast("long").alias("n_events"))
        .select("user_id", "session_start", "n_events")
    )


@q(
    "agg_first_last",
    """
    SELECT user_id,
           min_by(event_type,
                  (epoch_us(ts) // 1000000) * 1000000000 + event_id)
             AS first_type,
           max_by(event_type,
                  (epoch_us(ts) // 1000000) * 1000000000 + event_id)
             AS last_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(epoch_us(ts) // 1000000)
                - MIN(epoch_us(ts) // 1000000) AS BIGINT) AS span_s
    FROM events WHERE ts IS NOT NULL GROUP BY user_id
    """,
)
def agg_first_last(spark, sf):
    """First/last event type per user in ONE aggregation pass via
    min_by/max_by over a composite integer key (whole seconds *
    10^9 + event_id) — the entry/exit-page profile computed WITHOUT
    a row_number window (the agg is map-side combinable; a window
    would sort every user partition just to keep two rows). Key
    bounds: the multiplier must EXCEED every event_id or the id
    component bleeds into the time component (an id of 2x10^9 under
    a 10^9 multiplier would masquerade as +2 seconds); 10^9 holds
    for per-partition/log-segment ids and keeps epoch*10^9 inside
    int64 until year ~2262 (the int64-nanosecond horizon). Corpora
    with wider ids should key on struct(ts, event_id) instead —
    kept integer here because DuckDB min_by on a struct has no
    documented cross-engine ordering guarantee. Same truncation on
    both engines (unix_timestamp == epoch_us // 1e6), so the key —
    and therefore the argmin/argmax winner — is bit-identical."""
    e = t(spark, sf, "events").filter(F.col("ts").isNotNull())
    key = "unix_timestamp(ts) * 1000000000 + event_id"
    return e.groupBy("user_id").agg(
        F.expr(f"min_by(event_type, {key})").alias("first_type"),
        F.expr(f"max_by(event_type, {key})").alias("last_type"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts")))
        .cast("long")
        .alias("span_s"),
    )


@q(
    "json_variant",
    """
    WITH k AS (SELECT CAST(props->>'k' AS INTEGER) AS k FROM events)
    SELECT k // 10 AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum
    FROM k GROUP BY 1
    """,
)
def json_variant(spark, sf):
    """Semi-structured ingestion via Spark 4 VARIANT: parse_json
    shreds the props payload into the binary variant encoding once,
    variant_get extracts the typed field — the modern replacement for
    per-access get_json_object re-parsing (json_fns above keeps the
    classic path on the gate for contrast). At 10^12 events the
    difference is parse-once vs parse-per-expression; the decode
    stays JVM-side columnar either way. Bucketed rollup keeps the
    face's output small and the hash stable."""
    ev = t(spark, sf, "events")
    k = ev.select(
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("k")
    )
    return k.groupBy(F.expr("k DIV 10").alias("k_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("k_sum"),
    )


@q(
    "stream_dedup_within_wm",
    """
    SELECT DISTINCT user_id, event_type FROM events WHERE ts IS NOT NULL
    """,
)
def stream_dedup_within_wm(spark, sf):
    """``dropDuplicatesWithinWatermark`` on the oracle gate — the
    Spark 3.5+ BOUNDED-STATE cousin of stream_dedup's plain
    dropDuplicates: state for a key is evicted once the watermark
    passes its first arrival + delay, so the store size is bounded
    by the duplicate-arrival horizon instead of the full key
    cardinality — the version that survives an unbounded-key feed
    (exactly the crawl-dedup regime: duplicates cluster in time).
    Semantics differ from exact dedup ONLY for duplicates farther
    apart than the delay; the bounded availableNow replay keeps
    every duplicate inside one batch, so the emitted key set equals
    plain DISTINCT and the face rides the full DuckDB gate while
    still executing the within-watermark state path."""
    import os
    import tempfile

    name = f"stream_dedup_wm_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_dedup_wm_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        src = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .filter(F.col("ts").isNotNull())
            # parquet ts is TIMESTAMP_NTZ; watermarks demand TIMESTAMP
            # (identity under the UTC-pinned session — CLAUDE.md rule)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "3650 days")
        )
        q_ = (
            src.dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


@q(
    "join_null_safe",
    """
    WITH a AS (
      SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                       < '4'
                  THEN NULL ELSE o_orderkey % 100 END AS k,
             CAST(COUNT(*) AS BIGINT) AS ca
      FROM orders GROUP BY 1),
    b AS (
      SELECT CASE WHEN substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1)
                       < '4'
                  THEN NULL ELSE l_orderkey % 100 END AS k,
             CAST(COUNT(*) AS BIGINT) AS cb
      FROM lineitem GROUP BY 1)
    SELECT a.k, CAST(a.ca * b.cb AS BIGINT) AS n_pairs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe(spark, sf):
    """NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM) — the join
    semantics every entity-resolution pipeline eventually needs
    (NULL keys are "unknown", and two unknowns DO match in a
    blocking pass, where plain `=` silently drops every NULL row
    from both sides). A deterministic md5 quarter of each side's
    keys is nulled in-flight; both sides pre-aggregate to (key,
    count) BEFORE the join, so the NULL×NULL group joins as one
    row-pair with an exact product count instead of materializing
    the quadratic NULL-block blowup — the blocking-key discipline
    at any scale. Spark plans `<=>` as a HASH join key (null-safe
    equality is still hashable) — asserted by audit #60, because
    the naive rewrite `(a = b) OR (a IS NULL AND b IS NULL)` would
    degenerate to a nested-loop join."""
    bad_a = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) < "4"
    a = (
        t(spark, sf, "orders")
        .select(
            F.when(bad_a, F.lit(None).cast("long"))
            .otherwise(F.col("o_orderkey") % 100)
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("ca"))
    )
    bad_b = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1) < "4"
    b = (
        t(spark, sf, "lineitem")
        .select(
            F.when(bad_b, F.lit(None).cast("long"))
            .otherwise(F.col("l_orderkey") % 100)
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("k"),
        (F.col("ca") * F.col("cb")).cast("long").alias("n_pairs"),
    )


@q(
    "agg_bool",
    """
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT)
             AS n_high,
           bool_and(value IS NOT NULL) AS all_valued,
           bool_or(value > 400) AS any_extreme
    FROM events GROUP BY event_type
    """,
)
def agg_bool(spark, sf):
    """Boolean aggregate surface — count_if / bool_and (every) /
    bool_or (any), the grouped assertion primitives a data-quality
    layer compiles its rules into (check_constraints builds violation
    REPORTS; these are the underlying engine aggregates, gated
    directly). All three are map-side-combinable JVM aggregates with
    exact semantics — NULL handling follows three-valued logic on
    both engines (bool_and over a group with NULLs ignores them; the
    predicate count_if never counts NULL-valued comparisons as
    true), which is precisely the class of corner every hand-rolled
    CASE-WHEN spelling gets subtly wrong."""
    e = t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.expr("count_if(value > 100)").cast("long").alias("n_high"),
        F.expr("bool_and(value IS NOT NULL)").alias("all_valued"),
        F.expr("bool_or(value > 400)").alias("any_extreme"),
    )


# ---------------------------------------------------------------------------
# watermarked sliding-window streaming aggregate — on the full gate
# ---------------------------------------------------------------------------
@q(
    "stream_window",
    """
    WITH src AS (
      SELECT epoch_us(ts) AS us, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    wm AS (
      SELECT (MAX(us) // 1000) * 1000 - 86400000000 AS w FROM src),
    fan AS (
      SELECT (us // 86400000000) * 86400000000 AS s, event_type, cents
      FROM src
      UNION ALL
      SELECT (us // 86400000000) * 86400000000 - 86400000000,
             event_type, cents
      FROM src)
    SELECT s AS win_start_us, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM fan CROSS JOIN wm
    WHERE s + 172800000000 <= wm.w
    GROUP BY s, event_type
    """,
)
def stream_window(spark, sf):
    """Watermarked SLIDING-window streaming aggregate on the full
    oracle gate — the time-windowed state-store path the streaming
    family was missing (sessionize = gap windows, dedup = key state,
    join = buffered sides; this is the rate/rollup shape every
    metrics pipeline runs): window(ts, 2 days, 1 day) fans each
    event into its two overlapping windows, the 1-day watermark
    bounds state, and append mode emits exactly the windows whose
    END the final watermark passed. The twin reproduces the fan-out
    relationally (each event's two candidate day-aligned starts)
    and the emission rule (end <= max_event_time_ms - delay;
    Spark's watermark is millisecond-floored, hence the //1000*1000
    — with day-aligned window ends the 3-minute fixture margin makes
    the <= vs < edge moot). Open windows never emit — state the
    driver can't see is state the gate doesn't hash. Scale shape:
    the x2 fan-out is map-side (the events_rolling_dau trick), state
    is bounded by watermark horizon / slide, and the aggregation is
    the ordinary partial/final pair per micro-batch."""
    import os
    import tempfile

    name = f"stream_window_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_window_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        src = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .select(
                F.col("ts").cast("timestamp").alias("ets"),
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
            .withWatermark("ets", "1 day")
        )
        agg = src.groupBy(
            F.window("ets", "2 days", "1 day"), "event_type"
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        out = agg.select(
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            "event_type",
            "n",
            "cents",
        )
        q_ = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# nearest-in-time as-of join — bidirectional, tolerance-bounded
# ---------------------------------------------------------------------------
@q(
    "join_asof_nearest",
    """
    WITH e AS (SELECT * FROM events
               WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    u AS (
      SELECT user_id AS k,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             1 AS is_c, event_id AS click_id,
             CAST(NULL AS BIGINT) AS p_us
      FROM e WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)), 0,
             CAST(NULL AS BIGINT), epoch_us(CAST(ts AS TIMESTAMP))
      FROM e WHERE event_type = 'purchase'),
    w AS (
      SELECT *,
             last_value(p_us IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY us, is_c, coalesce(click_id, -1)
               ROWS UNBOUNDED PRECEDING) AS back_us,
             first_value(p_us IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY us, is_c, coalesce(click_id, -1)
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_us
      FROM u),
    pick AS (
      SELECT click_id AS event_id, k AS user_id, us,
             CASE WHEN back_us IS NULL AND fwd_us IS NULL THEN NULL
                  WHEN fwd_us IS NULL THEN back_us
                  WHEN back_us IS NULL THEN fwd_us
                  WHEN us - back_us <= fwd_us - us THEN back_us
                  ELSE fwd_us END AS m_us
      FROM w WHERE is_c = 1)
    SELECT event_id, user_id, us AS click_us,
           CASE WHEN m_us IS NOT NULL AND abs(us - m_us) <= 86400000000
                THEN m_us END AS purchase_us,
           CASE WHEN m_us IS NOT NULL AND abs(us - m_us) <= 86400000000
                THEN abs(us - m_us) END AS diff_us,
           CASE WHEN m_us IS NULL
                     OR abs(us - m_us) > 86400000000 THEN NULL
                WHEN m_us <= us THEN 'b' ELSE 'f' END AS direction
    FROM pick
    """,
)
def join_asof_nearest(spark, sf):
    """NEAREST-in-time as-of join: each click matched to the closest
    purchase in EITHER direction within a 1-day tolerance — pandas'
    merge_asof(direction='nearest') as a distributed operator, and
    the attribution question join_asof's backward-only form can't
    answer (a click 5 seconds AFTER the purchase is the same session;
    backward-asof throws it away). Same scalable union-scan shape as
    join_asof — tag both sides, ONE shuffle+sort per user, carry the
    last purchase time forward (last_value IGNORE NULLS, UNBOUNDED
    PRECEDING) and the next purchase time backward (first_value
    IGNORE NULLS, CURRENT..UNBOUNDED FOLLOWING) in the SAME window
    sort — never the key-join + fan-out + argmin, whose candidate
    blow-up is quadratic per key. Equal timestamps sort purchases
    first, so a same-instant purchase is the backward candidate at
    diff 0; the backward side wins exact-tie distances (deterministic
    on both engines). Out-of-tolerance or purchase-less clicks keep
    NULL match columns (left-join totality)."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"),
        us.alias("us"),
        F.lit(1).alias("is_c"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("p_us"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        us.alias("us"),
        F.lit(0).alias("is_c"),
        F.lit(None).cast("long").alias("click_id"),
        us.alias("p_us"),
    )
    u = clicks.unionByName(purch)
    order = [F.col("us"), F.col("is_c"), F.coalesce("click_id", F.lit(-1))]
    wb = (
        Window.partitionBy("k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w = u.select(
        "*",
        F.last("p_us", ignorenulls=True).over(wb).alias("back_us"),
        F.first("p_us", ignorenulls=True).over(wf).alias("fwd_us"),
    )
    back, fwd = F.col("back_us"), F.col("fwd_us")
    m_us = (
        F.when(back.isNull() & fwd.isNull(), F.lit(None).cast("long"))
        .when(fwd.isNull(), back)
        .when(back.isNull(), fwd)
        .when(F.col("us") - back <= fwd - F.col("us"), back)
        .otherwise(fwd)
    )
    pick = w.filter(F.col("is_c") == 1).select(
        F.col("click_id").alias("event_id"),
        F.col("k").alias("user_id"),
        "us",
        m_us.alias("m_us"),
    )
    within = F.col("m_us").isNotNull() & (
        F.abs(F.col("us") - F.col("m_us")) <= 86400000000
    )
    return pick.select(
        "event_id",
        "user_id",
        F.col("us").alias("click_us"),
        F.when(within, F.col("m_us")).alias("purchase_us"),
        F.when(within, F.abs(F.col("us") - F.col("m_us"))).alias("diff_us"),
        F.when(~within, F.lit(None).cast("string"))
        .when(F.col("m_us") <= F.col("us"), "b")
        .otherwise("f")
        .alias("direction"),
    )


# ---------------------------------------------------------------------------
# grouping_id — telling subtotal NULLs from data NULLs
# ---------------------------------------------------------------------------
@q(
    "agg_grouping_id",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT)
             AS gid,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark, sf):
    """grouping_id() / grouping() over a ROLLUP — the disambiguator
    agg_rollup deliberately leaves out: in a rollup result a NULL
    group value is AMBIGUOUS (is this row the subtotal across
    priorities, or the group of rows whose priority IS NULL?), and
    every BI layer and downstream join on a rollup keys on the
    grouping id, not the NULLs. grouping(col) is 1 exactly when the
    row aggregates col away; grouping_id packs those bits
    (status*2 + prio here) — both computed by the engine's Expand
    operator for free, not derived from the data. Identical
    ROLLUP + GROUPING_ID spelling on both engines; the plan is the
    single-Expand two-phase agg the audit pins for agg_cube."""
    o = t(spark, sf, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select(
        "o_orderstatus",
        "o_orderpriority",
        "gid",
        "g_status",
        "g_prio",
        "n",
    )


# ---------------------------------------------------------------------------
# array higher-order functions — filter / exists / zip_with / sorted slice
# ---------------------------------------------------------------------------
@q(
    "sql_array_hof",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           len(list_filter(embedding, x -> x > 2)) > 0 AS any_big,
           round(list_sum(list_transform(
                   list_zip(embedding, list_reverse(embedding)),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
                 6) + 0 AS rev_dot,
           round(list_sum(list_transform(
                   (list_sort(embedding, 'DESC'))[1:3],
                   x -> CAST(x AS DOUBLE))), 6) + 0 AS top3_sum
    FROM embeddings WHERE embedding IS NOT NULL
    """,
)
def sql_array_hof(spark, sf):
    """The array higher-order-function family beyond arr_fns'
    aggregate(): filter (positive-component count), exists
    (any component above 2), zip_with (dot product with the
    reversed self — the in-row pairwise combine ann's cosine rides),
    and slice-of-sort_array (top-3 mass) — all evaluated INSIDE the
    row by Catalyst's lambda machinery, which is the entire scale
    point: per-element work without exploding d rows per vector and
    re-aggregating (compare embed_dim_stats, which explodes because
    it aggregates ACROSS rows; in-row reductions never should).
    Sorting inside the row is fine at any corpus scale — it's d
    elements, not the relation. Floats fold in index order on both
    engines (zip_with and the transform both preserve element
    order), so round-6 parity is exact; DuckDB spells the same
    lambdas list_filter / list_zip / list_sort."""
    e = t(spark, sf, "embeddings").filter(F.col("embedding").isNotNull())
    return e.select(
        "vec_id",
        F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_pos"),
        F.expr("exists(embedding, x -> x > 2)").alias("any_big"),
        (
            F.round(
                F.expr(
                    "aggregate(zip_with(embedding, reverse(embedding),"
                    " (a, b) -> cast(a as double) * cast(b as double)),"
                    " 0.0d, (acc, x) -> acc + x)"
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("rev_dot"),
        (
            F.round(
                F.expr(
                    "aggregate(slice(sort_array(embedding, false), 1, 3),"
                    " 0.0d, (acc, x) -> acc + cast(x as double))"
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("top3_sum"),
    )


# ---------------------------------------------------------------------------
# DECIMAL money — exact fixed-point aggregation surface
# ---------------------------------------------------------------------------
@q(
    "agg_decimal",
    """
    WITH d AS (
      SELECT l_returnflag,
             CAST(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS
                       DECIMAL(18, 2)) * CAST(0.01 AS DECIMAL(8, 2))
                  AS DECIMAL(18, 2)) AS price_dec
      FROM lineitem)
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(price_dec) AS DECIMAL(38, 2)) AS VARCHAR)
             AS total_dec,
           CAST(CAST(AVG(price_dec) AS DECIMAL(38, 6)) AS VARCHAR)
             AS avg_dec
    FROM d GROUP BY l_returnflag
    """,
)
def agg_decimal(spark, sf):
    """Fixed-point DECIMAL aggregation — the money type family every
    other face deliberately side-steps via integer cents, exercised
    on its own terms: prices land in DECIMAL(18,2) through an
    exact integer-cents cast (never a float-to-decimal cast, which
    would bake in the double's representation error), SUM
    accumulates in the widened decimal both engines grow to
    (exact — decimal sums are order-independent by construction,
    the property integer cents emulate), and BOTH aggregates are
    pinned to explicit result types before the string cast because
    the engines' defaults diverge twice over: result scales differ
    (Spark grows avg scale by 4), and — the trap this face pins —
    DuckDB's `/` on a DECIMAL silently returns DOUBLE, so the
    cents-to-price step must be a decimal MULTIPLICATION by
    0.01::DECIMAL, never a division, or the oracle side degrades
    to float behind identical-looking SQL. Emitted as
    strings so the gate compares exact decimal digits, not a
    float re-parse. Scale note: decimal arithmetic runs ~2-4x
    slower than LONG cents in codegen — the integer-cents idiom
    everywhere else is a deliberate throughput choice, this face
    documents the exact-type alternative."""
    li = t(spark, sf, "lineitem")
    d = li.select(
        "l_returnflag",
        F.expr(
            "CAST(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS"
            " DECIMAL(18, 2)) * CAST(0.01 AS DECIMAL(8, 2))"
            " AS DECIMAL(18, 2))"
        ).alias("price_dec"),
    )
    return d.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("price_dec").cast("decimal(38,2)").cast("string").alias(
            "total_dec"
        ),
        F.avg("price_dec")
        .cast("decimal(38,6)")
        .cast("string")
        .alias("avg_dec"),
    )


# ---------------------------------------------------------------------------
# SHUFFLE_HASH hint — overriding the sort-merge default, safely
# ---------------------------------------------------------------------------
@q(
    "join_shuffle_hash",
    """
    SELECT c.c_mktsegment AS seg,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_shuffle_hash(spark, sf):
    """The orders-customer join executed under an explicit
    SHUFFLE_HASH hint — the third join-strategy control after
    broadcast (join_broadcast) and the sort-merge default
    (join_sortmerge): hash-join skips BOTH sort passes, which wins
    when one side fits a partition's memory but is too big to
    broadcast — the mid-size-dimension regime a 100-TB star schema
    hits constantly; the trade is no spill-friendly sort order, so
    the hint is a per-query scalpel, not a default. Hints change
    STRATEGY, never semantics — the twin is the plain join, and
    the audit-style assertion lives in the test: the plan must
    show ShuffledHashJoin where the unhinted spelling shows
    SortMergeJoin, and the aggregation partials still sit before
    the exchanges."""
    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    return j.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# checkpoint-resumed stream — exactly-once across two separate runs
# ---------------------------------------------------------------------------
@q(
    "stream_resume",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def stream_resume(spark, sf):
    """Checkpoint RESUMPTION — the streaming property none of the
    single-run faces exercise: the query starts, drains batch 1 to
    a parquet file sink, STOPS (deploy, crash, rescale), new files
    land, and a SECOND start with the SAME checkpointLocation must
    process exactly the new files — the file-source offsets live in
    the checkpoint and the file sink's _spark_metadata commit log
    makes the output exactly-once across restarts. This is the
    operational contract a 100-TB ingest actually runs on (nobody's
    stream lives forever; resumption IS the product). The gate is
    sharp: if run 2 re-read batch 1, every count doubles; if it
    missed batch 2, they halve — the twin is the plain batch
    aggregate of everything. Both runs are availableNow; the final
    aggregate is parquet-checkpointed before the temp spool dirs
    are reclaimed (the stream_upsert discipline)."""
    import os
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    schema = "event_id long, event_type string, cents long"
    with tempfile.TemporaryDirectory(prefix="stream_resume_") as tmp:
        src = os.path.join(tmp, "in")
        out = os.path.join(tmp, "out")
        ckpt = os.path.join(tmp, "ckpt")
        e.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(
            src
        )

        def _run():
            q_ = (
                spark.readStream.schema(schema)
                .parquet(src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q_.awaitTermination()

        _run()
        e.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(
            src
        )
        _run()
        back = spark.read.schema(schema).parquet(out)
        agg = back.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        return parquet_checkpoint(agg, "stream_resume_final")


# ---------------------------------------------------------------------------
# bitwise family — xor fingerprints and popcount census
# ---------------------------------------------------------------------------
@q(
    "bit_fns",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(bit_xor(event_id) AS BIGINT) AS xor_fp,
           CAST(SUM(event_id & 255) AS BIGINT) AS low_byte_sum,
           CAST(SUM(bit_count(event_id)) AS BIGINT) AS popcount_sum
    FROM events GROUP BY event_type
    """,
)
def bit_fns(spark, sf):
    """The bitwise family: per type an XOR fingerprint of the id
    set, a masked low-byte sum, and a popcount census — and the
    xor aggregate is the practical one: XOR is commutative,
    associative, and self-inverse, so bit_xor(id) is an
    order-independent SET fingerprint computable map-side in one
    pass — the cheapest reconciliation check between two copies of
    a 10^12-row table (equal counts AND equal xor-fp catches any
    single-row difference; compare snapshot_diff, which finds WHICH
    rows differ at full join cost — the xor fingerprint is the
    screen you run first). Masks and popcounts are the
    encode-family's bit-level arithmetic (zorder_plan interleaves
    bits; this face pins the primitive ops' parity). All-integer
    end to end."""
    return t(spark, sf, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("bit_xor(event_id)").cast("long").alias("xor_fp"),
        F.sum(F.expr("event_id & 255")).cast("long").alias("low_byte_sum"),
        F.sum(F.bit_count("event_id")).cast("long").alias("popcount_sum"),
    )


# ---------------------------------------------------------------------------
# AQE empty-relation propagation — dead branches cost nothing
# ---------------------------------------------------------------------------
@q(
    "join_empty_prop",
    """
    SELECT CAST(0 AS BIGINT) AS n_matched,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders
    """,
)
def join_empty_prop(spark, sf):
    """AQE empty-relation propagation: orders joined to a dimension
    filtered to ZERO rows (an impossible predicate a dashboard
    parameter produces daily) — at runtime AQE sees the empty build
    side's actual size and collapses the ENTIRE join branch to an
    empty LocalTableScan, so the 100-TB probe side is never
    scanned for a join that cannot match (the complement of
    join_dpp: DPP prunes to the matching partitions, empty
    propagation prunes to NOTHING; both are runtime decisions no
    static optimizer could make safely). The face returns the
    matched count (0) next to the table count computed through an
    independent subquery — proving the empty branch didn't poison
    the rest of the plan; the test pins the executed plan's
    LocalTableScan/EmptyRelation collapse. Inner-join-with-empty
    is the safe case; outer joins only simplify on the preserved
    side — semantics first, savings second."""
    o = t(spark, sf, "orders")
    dim = (
        t(spark, sf, "customer")
        .filter(F.col("c_custkey") < 0)  # impossible: keys are positive
        .select(F.col("c_custkey").alias("k"))
    )
    matched = o.join(dim, o.o_custkey == dim.k).agg(
        F.count(F.lit(1)).cast("long").alias("n_matched")
    )
    total = o.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    return matched.crossJoin(total)


# ---------------------------------------------------------------------------
# percentile_disc vs percentile_cont — the discrete/interpolated seam
# ---------------------------------------------------------------------------
@q(
    "agg_percentile_disc",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(quantile_disc(CAST(round(l_extendedprice * 100)
                                   AS BIGINT), 0.5) AS BIGINT)
             AS p50_disc_cents,
           round(quantile_cont(CAST(round(l_extendedprice * 100)
                                    AS BIGINT), 0.5), 6) + 0
             AS p50_cont_cents,
           CAST(quantile_disc(CAST(round(l_extendedprice * 100)
                                   AS BIGINT), 0.9) AS BIGINT)
             AS p90_disc_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_disc(spark, sf):
    """percentile_disc next to percentile_cont on the same column —
    the discrete/interpolated seam made explicit: disc returns an
    ACTUAL data value (the smallest value at or above the
    cumulative fraction — what "median order" must mean when the
    answer is shown to a human or used as a key), cont interpolates
    between neighbors (what belongs in arithmetic). On even-sized
    groups the two DIFFER, and code that treats them as
    interchangeable ships a subtle bias — this face pins both
    engines' agreement on each definition separately
    (Spark percentile_disc == DuckDB quantile_disc; the cont pair
    is the agg_percentiles precedent). disc's result is an exact
    BIGINT cents value by construction — no rounding needed, which
    is itself the point."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    li = t(spark, sf, "lineitem").select(
        "l_returnflag", cents.alias("cents")
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("p50_disc_cents"),
        (F.round(F.expr("percentile(cents, 0.5)"), 6) + F.lit(0.0)).alias(
            "p50_cont_cents"
        ),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("p90_disc_cents"),
    )


# ---------------------------------------------------------------------------
# INTERSECT ALL / EXCEPT ALL — set operators with bag semantics
# ---------------------------------------------------------------------------
@q(
    "set_ops_all",
    """
    WITH a AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) // 1000 AS b
      FROM events
      WHERE value IS NOT NULL
            AND substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'),
    bb AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) // 1000 AS b
      FROM events
      WHERE value IS NOT NULL
            AND substr(md5(CAST(event_id AS VARCHAR)), 1, 1) >= '8'),
    i AS (SELECT * FROM a INTERSECT ALL SELECT * FROM bb),
    x AS (SELECT * FROM a EXCEPT ALL SELECT * FROM bb)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bb) AS n_b,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM i) AS n_intersect_all,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM x) AS n_except_all
    FROM (SELECT 1)
    """,
)
def set_ops_all(spark, sf):
    """INTERSECT ALL and EXCEPT ALL — the BAG-semantics set
    operators (set_intersect/except cover the DISTINCT forms):
    multiplicities matter, so a row appearing 5 times in A and 3
    times in B contributes min(5,3)=3 to INTERSECT ALL and
    max(5-3,0)=2 to EXCEPT ALL — the reconciliation arithmetic for
    row-level feed comparison where duplicate rows are LEGITIMATE
    (retry-at-least-once logs, fanout joins), and where the
    DISTINCT forms silently erase exactly the discrepancies you're
    hunting. The engines implement it as a count-compare under the
    hood (Spark: aggregate counts per value then replicate) — the
    identity pinned in the test: |A| = |A INTERSECT ALL B| +
    |A EXCEPT ALL B| whenever B's rows are a submultiset-or-not,
    i.e. always, row-for-row. md5 halves of the bucketed value
    stream give both sides real overlapping multiplicity."""
    base = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT) div 1000").alias("b"),
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1).alias(
            "coin"
        ),
    )
    a = base.filter(F.col("coin") < "8").drop("coin")
    b = base.filter(F.col("coin") >= "8").drop("coin")
    i = a.intersectAll(b)
    x = a.exceptAll(b)
    import functools

    counts = [
        df.agg(F.count(F.lit(1)).cast("long").alias(name))
        for df, name in (
            (a, "n_a"),
            (b, "n_b"),
            (i, "n_intersect_all"),
            (x, "n_except_all"),
        )
    ]
    return functools.reduce(lambda l, r: l.crossJoin(r), counts)


# ---------------------------------------------------------------------------
# statestore reader — inspecting a streaming checkpoint's state as a table
# ---------------------------------------------------------------------------
@q(
    "scan_statestore",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def scan_statestore(spark, sf):
    """Spark 4's ``statestore`` batch source: the state a streaming
    aggregation checkpointed is READ BACK as a DataFrame
    (key struct + value struct per state row) — the operational
    debugger for stateful pipelines ("what does the store think the
    running totals are?") and the only way to audit state without
    replaying the stream. The face runs a complete-mode
    availableNow aggregation over the events table spooled to a
    file source, then reads the checkpoint's state store and
    re-emits the aggregates FROM STATE; the DuckDB twin is the
    plain batch aggregate, so the gate proves state contents ==
    batch truth exactly. Scale shape: the state source reads one
    store shard per state partition in parallel — same layout the
    stream wrote — with no replay of the input; the final aggregate
    is parquet-checkpointed before the temp spool is reclaimed
    (the stream_resume discipline)."""
    import os
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    schema = "event_id long, event_type string, cents long"
    with tempfile.TemporaryDirectory(prefix="scan_statestore_") as tmp:
        src = os.path.join(tmp, "in")
        ckpt = os.path.join(tmp, "ckpt")
        e.write.mode("append").parquet(src)
        qname = "ssq_" + os.path.basename(tmp)
        q_ = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("cents").cast("long").alias("cents"),
            )
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
        st = spark.read.format("statestore").load(ckpt)
        # state rows hold the aggregation BUFFER, whose struct fields
        # are named by FUNCTION (count, sum), not by output alias
        out = st.select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("long").alias("n"),
            F.col("value.sum").cast("long").alias("cents"),
        )
        return parquet_checkpoint(out, "scan_statestore_final")


# ---------------------------------------------------------------------------
# state-metadata reader — the checkpoint's operator manifest
# ---------------------------------------------------------------------------
@q(
    "scan_state_metadata",
    """
    SELECT 'stateStoreSave' AS operator_name,
           'default' AS store_name,
           CAST(1 AS BIGINT) AS n_batches
    """,
)
def scan_state_metadata(spark, sf):
    """The companion ``state-metadata`` source: the checkpoint's
    operator manifest (which stateful operators exist, their store
    names, and the batch range the state covers) — what an operator
    reads FIRST before pointing the statestore source at a shard.
    One availableNow complete-mode aggregation produces exactly one
    stateStoreSave operator with the default store and a single
    committed batch (min == max == 0), so the manifest is a
    deterministic literal and the twin pins it verbatim.
    numPartitions is deliberately NOT emitted — it equals the
    session's shuffle-partition setting, an environment knob, not a
    property of the pipeline."""
    import os
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events").select("event_id", "event_type")
    with tempfile.TemporaryDirectory(prefix="scan_state_md_") as tmp:
        src = os.path.join(tmp, "in")
        ckpt = os.path.join(tmp, "ckpt")
        e.write.mode("append").parquet(src)
        qname = "smq_" + os.path.basename(tmp)
        q_ = (
            spark.readStream.schema("event_id long, event_type string")
            .parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
        md = spark.read.format("state-metadata").load(ckpt)
        out = md.select(
            F.col("operatorName").alias("operator_name"),
            F.col("stateStoreName").alias("store_name"),
            (F.col("maxBatchId") - F.col("minBatchId") + 1)
            .cast("long")
            .alias("n_batches"),
        )
        return parquet_checkpoint(out, "scan_state_md_final")


# ---------------------------------------------------------------------------
# session_window with a DYNAMIC per-event gap expression
# ---------------------------------------------------------------------------
@q(
    "win_session_dynamic",
    """
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS tus,
             CASE WHEN event_type = 'view' THEN 1800000000
                  ELSE 3600000000 END AS gap_us
      FROM events WHERE ts IS NOT NULL),
    m AS (
      SELECT user_id, event_id, ts, tus,
             MAX(tus + gap_us) OVER (
               PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
      FROM e),
    f AS (
      SELECT user_id, event_id, ts, tus,
             CASE WHEN prev_end IS NULL OR tus > prev_end
                  THEN 1 ELSE 0 END AS new_s
      FROM m),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM f)
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def win_session_dynamic(spark, sf):
    """``session_window`` with a DYNAMIC gap — the per-event timeout
    is an EXPRESSION (views idle out in 30 minutes, everything else
    in 60), which is the form real engagement analytics needs: the
    inactivity horizon depends on what the user was doing. Each
    event contributes the interval [t, t + gap(e)); a session is a
    maximal union of overlapping intervals, so the oracle is the
    interval-merge form of gaps-and-islands: a running MAX of
    interval ENDS over strictly-preceding rows, new session iff the
    event starts strictly after that running end (the closed-end
    merge matched to the fixed-gap face's boundary pin,
    tests/test_wave15.py). win_session_window pins the fixed-gap
    operator == window algebra; this face pins the dynamic-gap
    GENERALIZATION where the gap column varies row to row. Scale
    shape: one hash-agg pass per user key, no self-join — identical
    to the fixed-gap plan; the gap expression is evaluated map-side
    before the shuffle."""
    e = t(spark, sf, "events").filter(F.col("ts").isNotNull())
    gap = F.when(
        F.col("event_type") == "view", F.lit("1800 seconds")
    ).otherwise(F.lit("3600 seconds"))
    return (
        e.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select("user_id", "session_start", "n_events")
    )


# ---------------------------------------------------------------------------
# as-of join with a tolerance horizon — stale matches become non-matches
# ---------------------------------------------------------------------------
_ASOF_TOL_US = 3600 * 1000000  # 1 hour


@q(
    "join_asof_tolerance",
    f"""
    WITH e AS (SELECT * FROM events WHERE ts IS NOT NULL),
    u AS (
      SELECT user_id AS k, ts, 1 AS is_r, event_id AS click_id,
             CAST(NULL AS BIGINT) AS purchase_id
      FROM e WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, 0, CAST(NULL AS BIGINT), event_id
      FROM e WHERE event_type = 'purchase'),
    w AS (
      SELECT *,
             last_value(click_id IGNORE NULLS) OVER (
                 PARTITION BY k ORDER BY ts, is_r DESC,
                 coalesce(click_id, -1)
                 ROWS UNBOUNDED PRECEDING) AS asof_id,
             last_value(CASE WHEN is_r = 1 THEN ts END IGNORE NULLS)
               OVER (
                 PARTITION BY k ORDER BY ts, is_r DESC,
                 coalesce(click_id, -1)
                 ROWS UNBOUNDED PRECEDING) AS asof_ts
      FROM u),
    g AS (
      SELECT purchase_id AS event_id, k AS user_id,
             epoch_us(ts) - epoch_us(asof_ts) AS gap_us,
             asof_id
      FROM w WHERE is_r = 0)
    SELECT event_id, user_id,
           CASE WHEN gap_us IS NOT NULL
                     AND gap_us <= {_ASOF_TOL_US}
                THEN asof_id END AS asof_click_id,
           CASE WHEN gap_us IS NOT NULL
                     AND gap_us <= {_ASOF_TOL_US}
                THEN CAST(gap_us AS BIGINT) END AS gap_us
    FROM g
    """,
)
def join_asof_tolerance(spark, sf):
    """As-of join WITH A TOLERANCE (pandas merge_asof's `tolerance`,
    kdb's windowed aj): the most recent prior click still matches
    ONLY if it happened within the last hour — beyond that the
    purchase is organic, not attributed, and a NULL is the correct
    answer where join_asof would return a stale match (attribution
    windows, sensor staleness, quote validity: the tolerance IS the
    business rule). Same scalable union-scan shape as join_asof —
    one shuffle+sort per user, NO candidate fan-out join — with the
    matched CLICK TIMESTAMP carried forward through a second
    last_value over the IDENTICAL window spec (both carried columns
    are non-null exactly on click rows, so they always come from the
    same row and the plan keeps ONE Window operator, audit #77); the
    tolerance gate is then a pure projection. Gap emitted as exact
    epoch-us BIGINT (the sub-second emission rule), NULLed with the
    match so a non-match carries no partial information."""
    e = t(spark, sf, "events").filter(F.col("ts").isNotNull())
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(1).alias("is_r"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(0).alias("is_r"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    u = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("k")
        .orderBy(
            F.col("ts"),
            F.col("is_r").desc(),
            F.coalesce(F.col("click_id"), F.lit(-1)),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("click_id", ignorenulls=True).over(w).alias("asof_id"),
        F.last(
            F.when(F.col("is_r") == 1, F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("asof_ts"),
    )
    g = carried.filter(F.col("is_r") == 0).select(
        F.col("purchase_id").alias("event_id"),
        F.col("k").alias("user_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_ts").cast("timestamp"))
        ).alias("gap_us"),
        "asof_id",
    )
    ok = F.col("gap_us").isNotNull() & (
        F.col("gap_us") <= _ASOF_TOL_US
    )
    return g.select(
        "event_id",
        "user_id",
        F.when(ok, F.col("asof_id")).alias("asof_click_id"),
        F.when(ok, F.col("gap_us").cast("long")).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# Complete-mode streaming aggregate — the full-table re-emission mode
# ---------------------------------------------------------------------------
@q(
    "stream_complete_topk",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def stream_complete_topk(spark, sf):
    """COMPLETE output mode — the third and last streaming output
    mode (append: stream_window, update: the upsert family): every
    trigger re-emits the ENTIRE result table, which is only sane
    when the result cardinality is bounded (a per-category dashboard
    like this one — |event_type| rows forever), and is then the
    simplest exactly-right live rollup there is: no watermark, no
    eviction, state = the result itself. The memory sink holds
    exactly the final emission after the availableNow drain, so the
    plain batch GROUP BY is the full-gate twin — Complete mode's
    semantics ARE 'as if batch over everything so far'. At 100 TB
    the mode's contract is the design constraint worth a face:
    unbounded-key aggregates under Complete mode grow state without
    bound, which is why the windowed/append family exists at all."""
    import os
    import tempfile

    name = f"stream_complete_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_complete_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        src = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .filter(F.col("value").isNotNull())
            .select(
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
        )
        agg = src.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        q_ = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# monotonically_increasing_id — the contract, certified, never the values
# ---------------------------------------------------------------------------
@q(
    "mono_id_contract",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS all_distinct,
           TRUE AS monotone_within_partition
    FROM events
    """,
)
def mono_id_contract(spark, sf):
    """``monotonically_increasing_id`` certified by CONTRACT, never
    by value: the generated ids are partition-layout-dependent
    (63-bit partition-id-shifted counters), so no cross-engine — or
    even cross-run — value comparison can exist; what IS stable, and
    what every consumer actually relies on, is the contract: ids are
    globally DISTINCT and strictly INCREASING within each partition.
    The face generates ids over the corpus and hashes exactly those
    two properties (count-distinct == count; a per-partition LAG
    window finds zero non-increasing steps), the scan_agg_pushdown
    ride-along discipline applied to a nondeterministic generator.
    The practical 100-TB note rides in the docstring: the ids are
    NOT dense and NOT stable across recomputations of the same
    lineage under AQE/retries — surrogate keys that must be stable
    belong to content hashes (sample_hash/md5 family), and row
    positions to _metadata.row_index (scan_row_index); this
    generator is for within-job temporary tags only."""
    ids = t(spark, sf, "events").select(
        F.monotonically_increasing_id().alias("mid"),
        F.spark_partition_id().alias("pid"),
    )
    w = Window.partitionBy("pid").orderBy("mid")
    stepped = ids.select(
        "mid",
        "pid",
        F.lag("mid").over(w).alias("prev"),
    )
    return stepped.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.countDistinct("mid") == F.count(F.lit(1))).alias(
            "all_distinct"
        ),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("mid") <= F.col("prev")),
                    1,
                ).otherwise(0)
            )
            == 0,
            F.lit(True),
        ).alias("monotone_within_partition"),
    )


# ---------------------------------------------------------------------------
# wave 101: UPDATE output mode — the changed-keys-only emission,
# gated through an order-independent certificate
# ---------------------------------------------------------------------------
@q(
    "stream_update_mode",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(COUNT(DISTINCT user_id % 3) AS BIGINT) AS n_updates
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY event_type
    """,
)
def stream_update_mode(spark, sf):
    """UPDATE output mode, gated explicitly — the mode matrix's last
    direct face (append: stream_window, complete: stream_complete_
    topk; the upsert family exercised update SEMANTICS through
    foreachBatch but never the mode itself). The corpus is split
    into 3 deterministic chunks (user_id % 3) replayed as separate
    micro-batches via maxFilesPerTrigger=1; update mode re-emits a
    key ONLY in batches whose chunk touched it. The sink transcript
    is therefore batch-ORDER-dependent in its intermediate values
    (each emission carries that moment's running aggregate) — so the
    face hashes only the two order-INDEPENDENT projections: the
    latest row per key (running count n strictly increases per
    emission, so max_by(struct, n) compaction — crawl_upsert's
    associativity — recovers exactly the final totals = the batch
    GROUP BY), and the per-key EMISSION COUNT, which equals the
    number of distinct chunks containing the key regardless of
    replay order — COUNT(DISTINCT user_id % 3) in the twin. That
    count doubles as the proof the key really was updated
    incrementally across batches rather than recomputed once. At
    100 TB update mode is the dashboard-sink contract: per-trigger
    output is O(changed keys), state is O(keys) — the face's
    docstring boundary vs complete mode's O(result) re-emission."""
    import glob
    import os
    import shutil
    import tempfile

    name = f"stream_update_{next(_STREAM_Q_COUNTER)}"
    ev = t(spark, sf, "events").filter(F.col("user_id").isNotNull())
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_update_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        for bkt in range(3):
            sdir = os.path.join(tmp, f"chunk{bkt}")
            ev.filter(F.col("user_id") % 3 == bkt).coalesce(
                1
            ).write.mode("overwrite").parquet(sdir)
            parts = glob.glob(os.path.join(sdir, "part-*.parquet"))
            if parts:
                shutil.copy(
                    parts[0],
                    os.path.join(src_dir, f"{bkt:02d}_chunk.parquet"),
                )
        agg = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(
                    F.round(F.col("value") * 100).cast("long")
                ).cast("long").alias("cents"),
            )
        )
        q_ = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    sink = spark.table(name)
    return sink.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max_by("cents", "n").cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_updates"),
    )


# ---------------------------------------------------------------------------
# wave 102: INTERVAL arithmetic — date/timestamp shifting emitted as
# exact epoch integers
# ---------------------------------------------------------------------------
@q(
    "date_interval_arith",
    """
    SELECT o_orderkey,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY
                     AS DATE)
                - DATE '1970-01-01' AS BIGINT) AS due30_day,
           CAST(epoch_us(o_orderdate + INTERVAL 36 HOUR) AS BIGINT)
             AS plus36h_us,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH
                     AS DATE)
                - DATE '1970-01-01' AS BIGINT) AS plus2mo_day,
           CAST(date_diff('hour', TIMESTAMP '1990-01-01 00:00:00',
                          o_orderdate) AS BIGINT) AS hours_since_1990
    FROM orders
    """,
)
def date_interval_arith(spark, sf):
    """INTERVAL-type arithmetic — the ANSI year-month and day-time
    interval surface date_fns leaves untouched: DATE + INTERVAL DAY,
    TIMESTAMP + INTERVAL HOUR, month addition with END-OF-MONTH
    CLAMPING (Jan 31 + 1 month = Feb 28 in BOTH engines — the
    calendar hazard this face pins), and timestampdiff unit
    counting. Every result leaves as an exact epoch integer (days
    since 1970 / epoch micros — the CLAUDE.md sub-second rule), so
    formatting never enters the hash. Unit-diff parity caveat the
    docstring carries: Spark's timestampdiff counts COMPLETE units,
    DuckDB's date_diff counts boundary CROSSINGS — equal here only
    because order timestamps sit exactly on midnight; for arbitrary
    timestamps emit epoch differences instead. Map-only: one
    projection over the scan, intervals fold inside codegen."""
    o = t(spark, sf, "orders")
    d = F.col("o_orderdate").cast("date")
    ts = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.datediff(
            d + F.expr("INTERVAL '30' DAY"), F.lit("1970-01-01")
        )
        .cast("long")
        .alias("due30_day"),
        F.unix_micros(ts + F.expr("INTERVAL '36' HOUR"))
        .cast("long")
        .alias("plus36h_us"),
        F.datediff(
            F.add_months(d, 2), F.lit("1970-01-01")
        )
        .cast("long")
        .alias("plus2mo_day"),
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP '1990-01-01 00:00:00', "
            "cast(o_orderdate AS TIMESTAMP))"
        )
        .cast("long")
        .alias("hours_since_1990"),
    )


# ---------------------------------------------------------------------------
# wave 105: stream-stream FULL OUTER join — the join-type matrix's
# last streaming cell
# ---------------------------------------------------------------------------
@q(
    "stream_full_outer_join",
    """
    WITH c AS (
      SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
      FROM events WHERE event_type = 'click' AND ts IS NOT NULL),
    p AS (
      SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
    SELECT c.click_id, p.purchase_id,
           COALESCE(c.c_user, p.p_user) AS user_id
    FROM c FULL OUTER JOIN p
      ON p.p_user = c.c_user AND p.p_ts >= c.c_ts
     AND p.p_ts <= c.c_ts + INTERVAL 3 DAY
    """,
)
def stream_full_outer_join(spark, sf):
    """Stream-stream FULL OUTER join — the last streaming cell of
    the join-type matrix (inner: stream_join, left outer:
    stream_outer_join): every click AND every orphaned purchase
    flows out, the two-sided funnel feed (drops AND attribution-less
    conversions in one topology). State discipline is symmetric now:
    an UNMATCHED row on EITHER side is only emitted once the OTHER
    side's watermark proves no future partner (that is what makes
    full outer strictly harder than left — both buffers must drain
    by watermark, not just one), so the bounded replay needs the
    sentinel flush on BOTH sides; the existing two-round far-future
    sentinel push already advances both watermarks, and emission
    lags one batch exactly as documented on stream_outer_join.
    With the flush, availableNow output == the exact batch FULL
    OUTER row set, so the DuckDB twin is the plain FULL JOIN —
    the strongest gate a streaming topology can get. At 100 TB the
    face's boundary note: full-outer state holds BOTH horizons of
    BOTH streams, double the left-outer footprint — size watermarks
    accordingly."""
    import datetime as _dt
    import glob
    import os
    import shutil
    import tempfile

    from ..streaming.annotate_stream import outer_join_streams

    name = f"stream_fojoin_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_fojoin_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "00_events.parquet"),
        )
        for i, (yr, et) in enumerate(
            [(2030, "click"), (2030, "purchase"),
             (2035, "click"), (2035, "purchase")]
        ):
            sdir = os.path.join(tmp, f"s{i}")
            spark.createDataFrame(
                [(-(100 + i), _dt.datetime(yr, 1, 1), -(100 + i), et,
                  0.0, "{}")],
                schema,
            ).coalesce(1).write.mode("overwrite").parquet(sdir)
            part = glob.glob(os.path.join(sdir, "part-*.parquet"))[0]
            shutil.copy(
                part, os.path.join(src_dir, f"{10 + i:02d}_s.parquet")
            )

        def side(et):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
                .filter(F.col("event_type") == et)
            )

        q_ = (
            outer_join_streams(
                side("click"), side("purchase"), how="fullOuter"
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name).filter(
        F.coalesce(F.col("user_id"), F.lit(-1)) >= 0
    )


# ---------------------------------------------------------------------------
# wave 106: StreamingQueryProgress — the observability contract
# (dropped-by-watermark + bounded state) gated, not just logged
# ---------------------------------------------------------------------------
@q(
    "stream_progress_metrics",
    """
    WITH src AS (
      SELECT epoch_us(ts) AS us, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    wm AS (
      SELECT (MAX(us) // 1000) * 1000 - 86400000000 AS w FROM src),
    fan AS (
      SELECT (us // 86400000000) * 86400000000 AS s, event_type, cents
      FROM src
      UNION ALL
      SELECT (us // 86400000000) * 86400000000 - 86400000000,
             event_type, cents
      FROM src)
    SELECT s AS win_start_us, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents,
           TRUE AS late_dropped,
           TRUE AS state_bounded
    FROM fan CROSS JOIN wm
    WHERE s + 172800000000 <= wm.w
    GROUP BY s, event_type
    """,
)
def stream_progress_metrics(spark, sf):
    """StreamingQueryProgress as a GATED contract — the
    observability face: every production streaming job watches
    numRowsDroppedByWatermark and stateOperators.numRowsTotal on a
    dashboard; this face makes both load-bearing. The stream_window
    topology replays with fabricated 1992 'late_probe' rows arriving
    as the THIRD micro-batch, behind a neutral watermark-burn batch
    (maxFilesPerTrigger=1) — necessarily third, because the
    input-side late filter uses the watermark committed at the
    PREVIOUS batch boundary, which itself lags the event-time stats
    by one batch (measured: the probe as batch 1 sails through under
    a still-1970 filter watermark and its already-closed windows
    flush straight to the sink — the leak this face exists to catch).
    The state store must DROP the probes (late_dropped rides the
    summed numRowsDroppedByWatermark > 0), and the value rows must be
    byte-identical to stream_window's twin — a leaked 1992 window
    would hash-mismatch, so the drop is proven twice, by metric AND
    by values. state_bounded pins max numRowsTotal <= total fan-in
    pairs (2 windows x events), the boundedness claim watermark
    eviction exists to provide. At 100 TB these two numbers are the
    difference between 'the job runs' and 'the job runs forever':
    unbounded state growth and silent late-data loss are both
    invisible in the OUTPUT until far too late — the progress feed
    is where they show first."""
    import datetime as _dt
    import glob
    import os
    import shutil
    import tempfile

    name = f"stream_progress_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_progress_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "00_events.parquet"),
        )
        n_events = t(spark, sf, "events").count()
        if n_events > 0:
            # the probe only makes sense once batch 1 can stand a
            # watermark — on the empty corpus there is nothing to be
            # late RELATIVE TO (the probes would seed the watermark
            # themselves and leak). The NEUTRAL middle batch matters:
            # the input-side late filter uses the watermark COMMITTED
            # at the previous batch boundary, which itself lags the
            # event-time stats by one batch (measured: a late file as
            # batch 1 sails through with wm still 1970 and its
            # already-closed windows flush straight to the sink) — so
            # the probe must arrive as batch 2, behind a burn batch.
            maxts = (
                t(spark, sf, "events")
                .agg(F.max(F.col("ts")))
                .collect()[0][0]
            )

            def _push(fname, rows):
                sdir = os.path.join(tmp, fname)
                spark.createDataFrame(rows, schema).coalesce(
                    1
                ).write.mode("overwrite").parquet(sdir)
                parts = glob.glob(os.path.join(sdir, "part-*.parquet"))
                if parts:
                    shutil.copy(
                        parts[0],
                        os.path.join(src_dir, fname + ".parquet"),
                    )

            _push(
                "01_neutral",
                [(-800, maxts, -800, "wm_push", 1.0, "{}")],
            )
            _push(
                "02_late",
                [
                    (-900 - i, _dt.datetime(1992, 1, 1 + i), -900 - i,
                     "late_probe", 1.0, "{}")
                    for i in range(3)
                ],
            )
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .select(
                F.col("ts").cast("timestamp").alias("ets"),
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
            .withWatermark("ets", "1 day")
        )
        agg = src.groupBy(
            F.window("ets", "2 days", "1 day"), "event_type"
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        out = agg.select(
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            "event_type",
            "n",
            "cents",
        )
        q_ = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
        dropped = 0
        max_state = 0
        for prog in q_.recentProgress:
            for op in prog.get("stateOperators", []):
                dropped += op.get("numRowsDroppedByWatermark", 0) or 0
                max_state = max(
                    max_state, op.get("numRowsTotal", 0) or 0
                )
    return spark.table(name).select(
        "win_start_us",
        "event_type",
        "n",
        "cents",
        F.lit(bool(dropped > 0)).alias("late_dropped"),
        F.lit(bool(max_state <= 2 * n_events + 6)).alias(
            "state_bounded"
        ),
    )


# ---------------------------------------------------------------------------
# wave 113: stream-stream LEFT SEMI join — the streaming EXISTS
# ---------------------------------------------------------------------------
@q(
    "stream_semi_join",
    """
    SELECT c.event_id AS click_id, c.user_id
    FROM events c
    WHERE c.event_type = 'click' AND c.ts IS NOT NULL
      AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.ts IS NOT NULL
          AND p.user_id = c.user_id
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 3 DAY)
    """,
)
def stream_semi_join(spark, sf):
    """STREAM-STREAM LEFT SEMI join on the oracle gate — the third
    and last stream-stream join shape after inner (stream_join) and
    left outer (stream_outer_join): the converting-clicks EXISTS
    filter, one output row per click no matter how many purchases
    follow, no right-side columns in the output, no row explosion.
    Semi state discipline differs from both siblings: a click emits
    the FIRST time a match arrives (then leaves state), and an
    unmatched click is dropped — never emitted — when the purchase
    watermark passes c_ts + horizon; since only the MATCHED set
    reaches the sink, a single availableNow batch needs no sentinel
    flush (the outer join's two-round flush is exactly the machinery
    this face proves unnecessary). DuckDB twin is the decorrelated
    EXISTS — also pinning that Spark's batch planner and its
    streaming state machine agree with a third engine on semi-join
    multiplicity semantics."""
    import os
    import tempfile

    from ..streaming.annotate_stream import semi_join_streams

    name = f"stream_sjoin_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_sjoin_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        clicks = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .filter(F.col("event_type") == "click")
        )
        purchases = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .filter(F.col("event_type") == "purchase")
        )
        q_ = (
            semi_join_streams(clicks, purchases)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# wave 116: chained streaming aggregations — two stateful operators
# in ONE query (6h rollup re-aggregated to days)
# ---------------------------------------------------------------------------
@q(
    "stream_chained_windows",
    """
    WITH src AS (
      SELECT epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    wm AS (
      SELECT (MAX(us) // 1000) * 1000 - 3600000000 AS w FROM src),
    sub AS (
      SELECT (us // 21600000000) * 21600000000 AS s6, cents
      FROM src),
    day AS (
      SELECT (s6 // 86400000000) * 86400000000 AS sd,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(COUNT(DISTINCT s6) AS BIGINT) AS n_sub
      FROM sub GROUP BY 1)
    SELECT sd AS day_start_us, n, cents, n_sub
    FROM day CROSS JOIN wm
    WHERE sd + 86400000000 <= wm.w
    """,
)
def stream_chained_windows(spark, sf):
    """CHAINED streaming aggregations — two stateful operators in
    ONE query (Spark's multiple-stateful-operator support): a 6-hour
    tumbling rollup re-aggregated into day windows by passing the
    window STRUCT column back into window() — the hierarchical
    rollup topology (minute -> hour -> day) every metrics pipeline
    wants but pre-3.4 engines forced into two queries with a sink
    between them. The mechanics the face pins: the upstream agg
    emits a 6h window downstream only once the shared watermark
    closes it, the downstream agg closes a day window by the SAME
    watermark, and because a day's END is always <= its last 6h
    constituent's end, every emitted day window has its full
    complement of closed sub-windows — n_sub rides the hash to prove
    no partially-assembled day ever reached the sink (4 per interior
    day). Emission rule in the twin: day end <= (max_us//1000)*1000
    - 1h (the stream_window millisecond-floor discipline). Scale
    shape: state is one row per open window per operator — the 4:1
    reduction between stages is exactly why the chained form beats
    two queries (the intermediate never hits storage)."""
    import os
    import tempfile

    name = f"stream_chw_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_chw_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        src = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .filter(F.col("value").isNotNull())
            .select(
                F.col("ts").cast("timestamp").alias("ets"),
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
            .withWatermark("ets", "1 hour")
        )
        six = src.groupBy(F.window("ets", "6 hours")).agg(
            F.count(F.lit(1)).cast("long").alias("n6"),
            F.sum("cents").cast("long").alias("c6"),
        )
        day = six.groupBy(
            F.window(F.col("window"), "1 day").alias("dwin")
        ).agg(
            F.sum("n6").cast("long").alias("n"),
            F.sum("c6").cast("long").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n_sub"),
        )
        out = day.select(
            F.unix_micros(F.col("dwin.start")).alias("day_start_us"),
            "n",
            "cents",
            "n_sub",
        )
        q_ = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# wave 125: ISO-week rollup — Monday alignment from pure epoch-day
# arithmetic
# ---------------------------------------------------------------------------
@q(
    "date_iso_week",
    """
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    w AS (
      SELECT day - ((day + 3) % 7) AS week_start, cents FROM d)
    SELECT CAST(week_start AS BIGINT) AS week_start_day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM w GROUP BY week_start
    """,
)
def date_iso_week(spark, sf):
    """ISO-week (Monday-aligned) revenue rollup via PURE epoch-day
    arithmetic: week_start = day - ((day + 3) % 7), exploiting that
    epoch day 0 (1970-01-01) was a THURSDAY — the +3 rotates Monday
    to the modulus origin. This is the only portable spelling: the
    engines' calendar functions disagree at every turn (Spark
    dayofweek() is 1=Sunday, DuckDB's is 0=Sunday, both
    locale-shifting — the events_heatmap lesson; Spark weekofyear is
    ISO-8601 while DuckDB week() is too but their YEAR boundary
    splits differ, so week NUMBERS cross-tabulate wrong at every
    January). Emitting the week's START DAY instead of a (year,
    week#) pair sidesteps the year-boundary trap entirely — a week
    is identified by its Monday, which both engines compute from
    the same integers. Scale shape: map-side key derivation, one
    ordinary grouped agg."""
    d = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    w = d.select(
        (F.col("day") - ((F.col("day") + 3) % 7)).alias("week_start"),
        "cents",
    )
    return w.groupBy("week_start").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    ).select(
        F.col("week_start").cast("long").alias("week_start_day"),
        "n",
        "cents",
    )


# ---------------------------------------------------------------------------
# wave 138: dedup -> windowed agg chained in ONE streaming query
# ---------------------------------------------------------------------------
@q(
    "stream_dedup_agg",
    """
    WITH src AS (
      SELECT DISTINCT event_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM (
        SELECT event_id, ts, value FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
        UNION ALL
        SELECT event_id, ts, value FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND event_id % 3 = 0)),
    wm AS (
      SELECT (MAX(us) // 1000) * 1000 - 3600000000 AS w FROM src),
    day AS (
      SELECT (us // 86400000000) * 86400000000 AS sd,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM src GROUP BY 1)
    SELECT sd AS day_start_us, n, cents
    FROM day CROSS JOIN wm
    WHERE sd + 86400000000 <= wm.w
    """,
)
def stream_dedup_agg(spark, sf):
    """dropDuplicates -> windowed aggregation chained in ONE
    streaming query — the OTHER multiple-stateful-operator topology
    (stream_chained_windows is agg -> agg; this is the
    exactly-once-metrics shape every at-least-once feed needs:
    upstream retries duplicate events, the dedup operator absorbs
    them by key within the watermark, and the downstream day window
    aggregates the deduplicated stream without an intermediate
    sink). The face FABRICATES the duplicates (every third event
    appended twice — the input is provably at-least-once), dedups
    on (event_id, ets) with a 1-hour watermark, rolls into day
    windows, and the twin is DISTINCT-then-aggregate in batch SQL:
    equality proves the dedup state absorbed every duplicate BEFORE
    the window state counted it — double-counting would inflate n
    on exactly the fabricated third. Emission rule as
    stream_window (day end <= ms-floored watermark). State bound:
    dedup keys evicted past the watermark, one row per open day
    window downstream."""
    import glob
    import os
    import shutil
    import tempfile

    name = f"stream_dedup_agg_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_ddagg_") as tmp:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        os.symlink(
            os.path.join(sf, "events.parquet"),
            os.path.join(src_dir, "00_events.parquet"),
        )
        dup_dir = os.path.join(tmp, "dups")
        (
            t(spark, sf, "events")
            .filter(F.col("event_id") % 3 == 0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(dup_dir)
        )
        part = glob.glob(os.path.join(dup_dir, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src_dir, "01_dups.parquet"))
        src = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
            .select(
                "event_id",
                F.col("ts").cast("timestamp").alias("ets"),
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
            .withWatermark("ets", "1 hour")
        )
        dd = src.dropDuplicates(["event_id", "ets"])
        day = dd.groupBy(F.window("ets", "1 day")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        out = day.select(
            F.unix_micros(F.col("window.start")).alias("day_start_us"),
            "n",
            "cents",
        )
        q_ = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# wave 147: business-day latency — closed-form weekday arithmetic
# ---------------------------------------------------------------------------
@q(
    "date_business_days",
    """
    WITH pairs AS (
      SELECT o.o_orderpriority AS priority,
             CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT)
               AS a,
             CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT)
               AS b
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate),
    bd AS (
      SELECT priority,
             5 * ((b - a) // 7)
             + (CASE WHEN (b - a) % 7 > 0
                     AND ((a + 3) % 7 + 0) % 7 < 5 THEN 1 ELSE 0 END)
             + (CASE WHEN (b - a) % 7 > 1
                     AND ((a + 3) % 7 + 1) % 7 < 5 THEN 1 ELSE 0 END)
             + (CASE WHEN (b - a) % 7 > 2
                     AND ((a + 3) % 7 + 2) % 7 < 5 THEN 1 ELSE 0 END)
             + (CASE WHEN (b - a) % 7 > 3
                     AND ((a + 3) % 7 + 3) % 7 < 5 THEN 1 ELSE 0 END)
             + (CASE WHEN (b - a) % 7 > 4
                     AND ((a + 3) % 7 + 4) % 7 < 5 THEN 1 ELSE 0 END)
             + (CASE WHEN (b - a) % 7 > 5
                     AND ((a + 3) % 7 + 5) % 7 < 5 THEN 1 ELSE 0 END)
               AS bdays
      FROM pairs)
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(bdays) AS BIGINT) AS total_bdays,
           CAST(MIN(bdays) AS BIGINT) AS min_bdays,
           CAST(MAX(bdays) AS BIGINT) AS max_bdays,
           round(CAST(SUM(bdays) AS DOUBLE) / COUNT(*), 6) + 0
             AS avg_bdays
    FROM bd GROUP BY priority ORDER BY priority
    """,
)
def date_business_days(spark, sf):
    """Business-day order-to-ship latency per priority — weekday
    counting as CLOSED-FORM integer arithmetic, no calendar table,
    no UDF, no generate_series: for the half-open span [a, b),
    bdays = 5*((b-a) div 7) + #{i in [0, (b-a) mod 7) :
    (dow_a + i) % 7 < 5} with dow_a = (a+3) % 7 (epoch day 0 is a
    THURSDAY, +3 makes Monday 0 — the events_heatmap epoch-
    arithmetic rule; dayofweek() is locale-shifted and engine-
    divergent). The remainder term unrolls to six gated CASE terms
    (rem <= 6 always), so the whole expression is map-side,
    branch-free of any date function, and engine-exact — the same
    spelling runs on both engines character-for-character. The
    SLA question this answers ("how many WORKING days did
    fulfilment take") is the one raw day-diffs overstate by ~40%
    on weekend-spanning spans; the replay test pins the closed
    form against a literal day-by-day Python walk, including
    weekend-start and same-day edges. One join (orderkey
    equi-join), one aggregate — no window, no shuffle beyond the
    join and the 5-row group."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.expr(
                "unix_micros(cast(o_orderdate AS TIMESTAMP))"
                " div 86400000000"
            )
            .cast("long")
            .alias("a"),
            F.expr(
                "unix_micros(cast(l_shipdate AS TIMESTAMP))"
                " div 86400000000"
            )
            .cast("long")
            .alias("b"),
        )
    )
    span = F.col("b") - F.col("a")
    dow_a = (F.col("a") + 3) % 7
    bdays = (5 * F.expr("(b - a) div 7")).cast("long")
    for i in range(6):
        bdays = bdays + F.when(
            (span % 7 > i) & ((dow_a + i) % 7 < 5), 1
        ).otherwise(0)
    bd = pairs.select("priority", bdays.cast("long").alias("bdays"))
    return (
        bd.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("bdays").cast("long").alias("total_bdays"),
            F.min("bdays").cast("long").alias("min_bdays"),
            F.max("bdays").cast("long").alias("max_bdays"),
            (
                F.round(
                    F.sum("bdays").cast("double") / F.count(F.lit(1)),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_bdays"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# wave 152: union of two streams -> one windowed aggregate (min watermark)
# ---------------------------------------------------------------------------
@q(
    "stream_union",
    """
    WITH src AS (
      SELECT epoch_us(ts) AS us,
             CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS src,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    wms AS (
      SELECT LEAST(
               (SELECT (MAX(us) // 1000) * 1000 FROM src
                WHERE src = 'a'),
               (SELECT (MAX(us) // 1000) * 1000 FROM src
                WHERE src = 'b')) - 3600000000 AS w),
    day AS (
      SELECT (us // 86400000000) * 86400000000 AS s, src,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM src GROUP BY 1, 2)
    SELECT s AS day_start_us, src, n, cents
    FROM day CROSS JOIN wms
    WHERE s + 86400000000 <= wms.w
    """,
)
def stream_union(spark, sf):
    """UNION of two independent file-source streams feeding ONE
    windowed aggregate — the fan-in topology (every prior streaming
    face had a single source or a two-sided JOIN; metrics pipelines
    routinely merge N regional feeds into one rollup). Each branch
    carries its OWN withWatermark before the union, and Spark's
    default multipleWatermarkPolicy = MIN advances the query
    watermark only as far as the SLOWEST input — the twin computes
    both branch watermarks (ms-floored max - 1h) and applies
    LEAST(), so if Spark ever emitted on the faster branch's clock
    the gate would catch the extra day. The even/odd event_id split
    makes the two branches deterministic partitions of one table;
    each keeps its source tag through the union so the output
    proves BOTH branches flowed into the same state store (day x
    src grid). availableNow drains both directories in one run;
    append emits exactly the days whose END the final min-watermark
    passed (the stream_window emission rule). State: one row per
    open (day, src) cell, bounded by the watermark horizon."""
    import os
    import tempfile

    name = f"stream_union_{next(_STREAM_Q_COUNTER)}"
    schema = t(spark, sf, "events").schema
    with tempfile.TemporaryDirectory(prefix="stream_union_") as tmp:
        dir_a = os.path.join(tmp, "a")
        dir_b = os.path.join(tmp, "b")
        base = t(spark, sf, "events").filter(
            F.col("ts").isNotNull() & F.col("value").isNotNull()
        )
        base.filter(F.col("event_id") % 2 == 0).write.mode(
            "overwrite"
        ).parquet(dir_a)
        base.filter(F.col("event_id") % 2 == 1).write.mode(
            "overwrite"
        ).parquet(dir_b)

        def branch(d, tag):
            return (
                spark.readStream.schema(schema)
                .parquet(d)
                .filter(
                    F.col("ts").isNotNull()
                    & F.col("value").isNotNull()
                )
                .select(
                    F.col("ts").cast("timestamp").alias("ets"),
                    F.lit(tag).alias("src"),
                    F.round(F.col("value") * 100)
                    .cast("long")
                    .alias("cents"),
                )
                .withWatermark("ets", "1 hour")
            )

        u = branch(dir_a, "a").unionAll(branch(dir_b, "b"))
        day = u.groupBy(F.window("ets", "1 day"), "src").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        out = day.select(
            F.unix_micros(F.col("window.start")).alias(
                "day_start_us"
            ),
            "src",
            "n",
            "cents",
        )
        q_ = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", os.path.join(tmp, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# wave 156: distribution window functions — percent_rank/cume_dist/ntile
# ---------------------------------------------------------------------------
@q(
    "win_dist_fns",
    """
    WITH lab AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT event_type, event_id, cents,
             percent_rank() OVER
               (PARTITION BY event_type
                ORDER BY cents, event_id) AS pr,
             cume_dist() OVER
               (PARTITION BY event_type
                ORDER BY cents, event_id) AS cd,
             ntile(4) OVER
               (PARTITION BY event_type
                ORDER BY cents, event_id) AS quartile
      FROM lab)
    SELECT event_type,
           CAST(quartile AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           round(MIN(pr), 6) + 0 AS min_pr,
           round(MAX(pr), 6) + 0 AS max_pr,
           round(MAX(cd), 6) + 0 AS max_cd
    FROM w GROUP BY event_type, quartile
    ORDER BY event_type, quartile
    """,
)
def win_dist_fns(spark, sf):
    """The DISTRIBUTION window-function trio — percent_rank,
    cume_dist, ntile(4) — the last uncovered corner of the window
    surface (win_rank_fns covers the rank family, win_nth_value /
    value_range the frame family): percent_rank = (rank-1)/(n-1),
    cume_dist = #(peers <=)/n, and ntile deals ceil-then-floor
    sized buckets — three DIFFERENT tie/edge conventions that
    engines silently disagree on unless the ordering is total, so
    the (cents, event_id) tiebreak is mandatory and makes every
    value an exact rational both engines compute identically (the
    rounding is belt-and-braces, not load-bearing). The per-
    (type, quartile) rollup pins bucket sizes (ntile's ceil/floor
    split), the quartile boundary ranks (min/max percent_rank per
    bucket), and the closing cume_dist = 1.0 on the last bucket.
    One scan, one window partitioned by type — at 100 TB the
    partition keys shard the sort; no global ordering anywhere."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ww = lab.select(
        "event_type",
        "cents",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return (
        ww.groupBy(
            "event_type",
            F.col("quartile").cast("long").alias("quartile"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
            (F.round(F.min("pr"), 6) + F.lit(0.0)).alias("min_pr"),
            (F.round(F.max("pr"), 6) + F.lit(0.0)).alias("max_pr"),
            (F.round(F.max("cd"), 6) + F.lit(0.0)).alias("max_cd"),
        )
        .orderBy("event_type", "quartile")
    )


# ---------------------------------------------------------------------------
# wave 166: TPC-H Q1 pricing summary — exact scaled-integer money chain
# ---------------------------------------------------------------------------
@q(
    "lineitem_pricing_summary",
    """
    WITH l AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity) AS BIGINT) AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(round(l_discount * 100) AS BIGINT) AS disc_h,
             CAST(round(l_tax * 100) AS BIGINT) AS tax_h
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'),
    x AS (
      SELECT l_returnflag, l_linestatus, qty, cents, disc_h, tax_h,
             CAST(cents * (100 - disc_h) AS BIGINT) AS disc_e4,
             CAST(cents * (100 - disc_h) * (100 + tax_h) AS BIGINT)
               AS charge_e6
      FROM l)
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS count_order,
           CAST(SUM(qty) AS BIGINT) AS sum_qty,
           CAST(SUM(cents) AS BIGINT) AS sum_base_cents,
           CAST(SUM(disc_e4) AS BIGINT) AS sum_disc_price_e4,
           CAST(SUM(charge_e6) AS BIGINT) AS sum_charge_e6,
           round(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 6) + 0
             AS avg_qty,
           round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 6)
             + 0 AS avg_price,
           round(CAST(SUM(disc_h) AS DOUBLE) / COUNT(*) / 100.0, 6)
             + 0 AS avg_disc
    FROM x GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def lineitem_pricing_summary(spark, sf):
    """The TPC-H Q1 pricing summary — the canonical scan-heavy
    reporting aggregate this engine somehow never had as its own
    face: per (returnflag, linestatus), order counts, quantity and
    money sums, and the discounted / discounted+taxed money chain.
    The money chain is EXACT scaled integers instead of the
    specification's DECIMAL: price in cents, discount and tax in
    exact hundredths (the fixture generates them on the 0.01
    grid), so disc_price = cents*(100-disc_h) is an exact e4-
    scaled BIGINT and charge = cents*(100-disc_h)*(100+tax_h) an
    exact e6-scaled one — per-row magnitude ~1e13, safe through
    sf0.1 corpus sums; at sf1+ the charge sum crosses 2^63 and
    production would limb-split (lake_content_digest's hi/lo
    trick, documented not implemented). The averages divide the
    exact sums once, rounded. The shipdate filter is the spec's
    fixed date, pushed to the scan. One scan, one map-side-
    combinable aggregate over 6 cells — the plan IS the benchmark:
    scan + partial agg + exchange + final agg, nothing else
    (pinned in the audit)."""
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    x = li.select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_h"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_h"),
    ).select(
        "l_returnflag",
        "l_linestatus",
        "qty",
        "cents",
        "disc_h",
        (F.col("cents") * (100 - F.col("disc_h")))
        .cast("long")
        .alias("disc_e4"),
        (
            F.col("cents")
            * (100 - F.col("disc_h"))
            * (100 + F.col("tax_h"))
        )
        .cast("long")
        .alias("charge_e6"),
    )
    return (
        x.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("count_order"),
            F.sum("qty").cast("long").alias("sum_qty"),
            F.sum("cents").cast("long").alias("sum_base_cents"),
            F.sum("disc_e4").cast("long").alias("sum_disc_price_e4"),
            F.sum("charge_e6").cast("long").alias("sum_charge_e6"),
            (
                F.round(
                    F.sum("qty").cast("double") / F.count(F.lit(1)),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_qty"),
            (
                F.round(
                    F.sum("cents").cast("double")
                    / F.count(F.lit(1))
                    / F.lit(100.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_price"),
            (
                F.round(
                    F.sum("disc_h").cast("double")
                    / F.count(F.lit(1))
                    / F.lit(100.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# wave 167: TPC-H Q3 shipping priority — 3-way join + revenue top-10
# ---------------------------------------------------------------------------
@q(
    "orders_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100)
                             AS BIGINT))) AS BIGINT) AS revenue_e4,
           CAST(epoch_us(o.o_orderdate) AS BIGINT) AS orderdate_us,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_e4 DESC, orderdate_us, l.l_orderkey
    LIMIT 10
    """,
)
def orders_shipping_priority(spark, sf):
    """TPC-H Q3 (shipping priority) — the canonical
    filter-join-aggregate-topk: BUILDING-segment customers, orders
    placed before the cut date with lineitems shipping after it,
    revenue per order, top 10. The join-strategy story IS the
    face: the segment filter prunes customers ~5x BEFORE the join
    (predicate pushdown to the scan), the pruned customer side
    broadcasts under AQE (unhinted — the text_unigram_lm rule: at
    sf1e6 customers no longer fit and AQE shuffles instead, the
    plan adapts, the answer doesn't), and the order-lineitem join
    shuffles on the natural orderkey. Revenue is the exact e4-
    scaled integer cents*(100-disc_h) (the pricing-summary money
    discipline — the spec's DECIMAL sums reproduced without
    DECIMAL), so the top-10 cut ranks exact BIGINTs with the
    (revenue, orderdate, orderkey) total tiebreak, via
    TakeOrderedAndProject — no global sort. Dates emitted as
    exact epoch-us (the sub-second emission rule)."""
    c = t(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = t(spark, sf, "orders").filter(
        F.col("o_orderdate")
        < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate")
        > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            "l_orderkey",
            F.expr(
                "unix_micros(cast(o_orderdate AS TIMESTAMP))"
            )
            .cast("long")
            .alias("orderdate_us"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("long").alias("revenue_e4"))
        .select(
            "l_orderkey", "revenue_e4", "orderdate_us",
            "o_orderpriority",
        )
        .orderBy(
            F.desc("revenue_e4"), "orderdate_us", "l_orderkey"
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# wave 167: TPC-H Q5 local supplier volume — the 6-table snowflake
# ---------------------------------------------------------------------------
@q(
    "orders_local_volume",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100)
                             AS BIGINT))) AS BIGINT) AS revenue_e4
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue_e4 DESC, nation
    """,
)
def orders_local_volume(spark, sf):
    """TPC-H Q5 (local supplier volume) — the 6-table snowflake
    and the classic join-ORDER test: revenue by nation for EUROPE-
    region customers served by suppliers in their OWN nation over
    the 1995-98 window (the spec's ASIA + single-1994 window is
    EMPTY on this fixture's 1995-2001 calendar and sparse
    same-nation pairing — the granger degenerate-but-equal lesson:
    a zero-row join both engines agree on proves nothing, so the
    face pins region x window combinations measured non-empty, and
    the replay test asserts rows exist). The correlated s_nationkey =
    c_nationkey predicate is what makes Q5 famous — it is not an
    FK edge, so a naive planner joins supplier by suppkey alone
    and filters late, dragging the full supplier fan through the
    shuffle; expressing it IN the join condition lets Catalyst
    evaluate it at the join and lets the region->nation->customer
    chain prune first (the filter reaches the region scan, the
    two-row dim broadcasts, and AQE picks broadcast-vs-shuffle
    per join by measured size — all unhinted). Money is the exact
    e4 integer chain; the final 5-row ranking ties broken by
    nation name. The replay test pins against a pure-Python
    6-way dict join. At 100 TB: dims broadcast, the fact-fact
    orderkey join shuffles once, the agg is 25-cells-bounded."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        (
            F.col("o_orderdate")
            >= F.lit("1995-01-01 00:00:00").cast("timestamp")
        )
        & (
            F.col("o_orderdate")
            < F.lit("1999-01-01 00:00:00").cast("timestamp")
        )
    )
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (s["s_suppkey"] == li["l_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(n, n["n_nationkey"] == c["c_nationkey"])
        .join(r, r["r_regionkey"] == n["n_regionkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("long").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "nation")
    )


# ---------------------------------------------------------------------------
# wave 168: TPC-H Q10 returned-item reporting — customer-grain top-20
# ---------------------------------------------------------------------------
@q(
    "orders_returned_item",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100)
                             AS BIGINT))) AS BIGINT) AS revenue_e4,
           CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue_e4 DESC, c.c_custkey LIMIT 20
    """,
)
def orders_returned_item(spark, sf):
    """TPC-H Q10 (returned-item reporting) — the customer-grain
    top-k: which customers RETURNED the most revenue in a quarter-
    year window (the spec's 3-month window widened to the 1995
    order year so the fixture's return flags populate every
    nation). Shape: two selective predicates (returnflag = 'R'
    pushed into the lineitem scan, the date window into orders),
    the fact-fact orderkey join, the nation dim broadcast, and a
    customer-grain aggregate whose group count is bounded by
    |customers| — then TakeOrderedAndProject's top-20 on the exact
    e4 revenue with custkey tiebreak. This is the query class
    where the GROUP BY grain (customer) is much wider than the
    output (20 rows): the ranking must happen after the full
    aggregate, so the plan's cost lives in the shuffle on
    custkey, and the partial-agg before it is what keeps the
    exchange narrow. Exact integers throughout; acctbal emitted
    as exact cents."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        (
            F.col("o_orderdate")
            >= F.lit("1995-01-01 00:00:00").cast("timestamp")
        )
        & (
            F.col("o_orderdate")
            < F.lit("1996-01-01 00:00:00").cast("timestamp")
        )
    )
    li = t(spark, sf, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = t(spark, sf, "nation")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(n, n["n_nationkey"] == c["c_nationkey"])
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.round(F.col("c_acctbal") * 100)
            .cast("long")
            .alias("acctbal_cents"),
        )
        .agg(F.sum(rev).cast("long").alias("revenue_e4"))
        .select(
            "c_custkey", "c_name", "nation", "revenue_e4",
            "acctbal_cents",
        )
        .orderBy(F.desc("revenue_e4"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# wave 168: TPC-H Q14 promotion effect — conditional-share aggregate
# ---------------------------------------------------------------------------
@q(
    "part_promo_revenue",
    """
    WITH j AS (
      SELECT p.p_type,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               AS rev_e4
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00')
    SELECT CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
                                  THEN rev_e4 ELSE 0 END), 0)
                AS BIGINT) AS promo_e4,
           CAST(COALESCE(SUM(rev_e4), 0) AS BIGINT) AS total_e4,
           CASE WHEN COALESCE(SUM(rev_e4), 0) = 0 THEN NULL
                ELSE round(100.0
                     * SUM(CASE WHEN p_type = 'PROMO'
                                THEN rev_e4 ELSE 0 END)
                     / SUM(rev_e4), 6) + 0
           END AS promo_pct
    FROM j
    """,
)
def part_promo_revenue(spark, sf):
    """TPC-H Q14 (promotion effect) — the conditional-share
    aggregate: what percentage of a shipping year's discounted
    revenue came from PROMO-type parts. The textbook spelling is a
    CASE inside SUM over a fact-dim join — ONE pass computes both
    the conditional and unconditional mass (never two branches,
    which would scan the join twice — the stat_mutual_info
    one-scan rule applied to the simplest possible query), the
    date window pushes to the lineitem scan, and the part dim
    joins on partkey (broadcast under AQE at test scale, shuffle
    at 100 TB — unhinted as always). Revenue is the exact e4
    chain; the single percentage is the only float. The fixture's
    p_type is a flat categorical (PROMO is 1 of 6 values), so the
    share pins near 1/6 in the replay — and the exact integers
    make promo_e4 <= total_e4 a hard invariant rather than a
    float hope."""
    li = t(spark, sf, "lineitem").filter(
        (
            F.col("l_shipdate")
            >= F.lit("1995-01-01 00:00:00").cast("timestamp")
        )
        & (
            F.col("l_shipdate")
            < F.lit("1996-01-01 00:00:00").cast("timestamp")
        )
    )
    p = t(spark, sf, "part")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    j = li.join(p, p["p_partkey"] == li["l_partkey"]).select(
        "p_type", rev.alias("rev_e4")
    )
    promo = F.coalesce(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("rev_e4"))
            .otherwise(0)
        ),
        F.lit(0),
    ).cast("long")
    tot = F.coalesce(F.sum("rev_e4"), F.lit(0)).cast("long")
    return j.agg(
        promo.alias("promo_e4"),
        tot.alias("total_e4"),
        F.when(tot == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(100.0) * promo / tot,
                6,
            )
            + F.lit(0.0)
        )
        .alias("promo_pct"),
    )


# ---------------------------------------------------------------------------
# wave 169: TPC-H Q18 large-volume customers — HAVING-driven semi join
# ---------------------------------------------------------------------------
@q(
    "orders_large_volume",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 250),
    j AS (
      SELECT c.c_custkey, c.c_name, o.o_orderkey,
             CAST(epoch_us(o.o_orderdate) AS BIGINT) AS orderdate_us,
             CAST(round(o.o_totalprice * 100) AS BIGINT)
               AS totalprice_cents,
             CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
               AS sum_qty
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN big b ON b.l_orderkey = o.o_orderkey
      GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
               o.o_totalprice)
    SELECT c_custkey, c_name, o_orderkey, orderdate_us,
           totalprice_cents, sum_qty
    FROM j
    ORDER BY totalprice_cents DESC, orderdate_us, o_orderkey
    LIMIT 20
    """,
)
def orders_large_volume(spark, sf):
    """TPC-H Q18 (large-volume customers) — the HAVING-driven semi
    join: first find orders whose TOTAL quantity crosses the
    threshold (an aggregate over the fact table — the spec's
    "> 300" lowered to 250 so the fixture's 378-max quantity
    distribution yields a working set), then join those keys back
    to re-aggregate with customer context. The two-pass shape is
    the point: the inner aggregate's output is keys-only and
    SMALL, so the join back is a broadcast-able semi-join-like
    prune even though the spelling is an inner join on the
    aggregated relation — the pattern every "entities crossing a
    volume threshold" report uses. Quantities sum as exact
    integers (the fixture's l_quantity is whole-valued; round()
    makes the contract explicit), prices as exact cents; top-20
    by (totalprice, orderdate, orderkey) total order via
    TakeOrderedAndProject."""
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round("l_quantity").cast("long"))
            .cast("long")
            .alias("sq")
        )
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(
            big.withColumnRenamed("l_orderkey", "bk"),
            F.col("bk") == o["o_orderkey"],
        )
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.expr("unix_micros(cast(o_orderdate AS TIMESTAMP))")
            .cast("long")
            .alias("orderdate_us"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("totalprice_cents"),
        )
        .agg(
            F.sum(F.round("l_quantity").cast("long"))
            .cast("long")
            .alias("sum_qty")
        )
        .orderBy(
            F.desc("totalprice_cents"), "orderdate_us", "o_orderkey"
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# wave 169: TPC-H Q19 disjunctive predicate revenue
# ---------------------------------------------------------------------------
@q(
    "part_disjunctive_revenue",
    """
    SELECT CAST(COALESCE(SUM(
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))),
             0) AS BIGINT) AS revenue_e4,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def part_disjunctive_revenue(spark, sf):
    """TPC-H Q19 (discounted revenue, disjunctive predicates) —
    the OR-of-conjunctions query that separates planners: three
    brand/size/quantity bands OR-ed together, where the naive plan
    evaluates the whole disjunction post-join but a good one
    derives the COMMON implied predicates (brand IN (...), size
    >= 1) and pushes them into the part scan, shrinking the build
    side before the join; the residual disjunction evaluates on
    the joined row. Catalyst does exactly this constraint
    propagation — the audit-worthy behavior this face exists to
    hold still. The spec's brand/size triplet is re-based
    onto brands the fixture POPULATES AT EVERY SF (Brand#34 has
    zero parts at sf0.001 — a silently-empty arm is the granger
    degenerate-but-equal trap in disjunctive clothing, so the
    test pins every arm individually non-empty). Quantity bounds
    compare the fixture's whole-valued doubles directly (spelled
    identically both engines);
    money is the exact e4 chain; one scan of each table, one
    1-row aggregate. The replay test evaluates the disjunction
    row-by-row in Python."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    j = li.join(p, p["p_partkey"] == li["l_partkey"])
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 50)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 21)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 50)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 50)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 40)
        )
    )
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    return j.filter(band).agg(
        F.coalesce(F.sum(rev), F.lit(0))
        .cast("long")
        .alias("revenue_e4"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# wave 169: TPC-H Q6 forecasting revenue change — the pushdown yardstick
# ---------------------------------------------------------------------------
@q(
    "lineitem_forecast_revenue",
    """
    SELECT CAST(COALESCE(SUM(
             CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT)), 0)
             AS BIGINT) AS revenue_e4,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND round(l_discount * 100) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def lineitem_forecast_revenue(spark, sf):
    """TPC-H Q6 (forecasting revenue change) — the scan-and-filter
    yardstick: no join, no window, just three selective predicates
    and one sum, which makes it the purest measurement of filter
    pushdown + whole-stage codegen the suite has (every column the
    filter touches is in ReadSchema; everything else is pruned —
    the plan IS two lines). The spec's DECIMAL discount equality
    band becomes an exact integer-hundredths band (round(disc*100)
    BETWEEN 5 AND 7 — comparing the raw double to 0.05..0.07
    would be the classic float-band bug this face documents
    instead of committing), and the revenue = price * discount
    product is an exact e4 BIGINT per row. One scan, one 1-row
    fold; at 100 TB this query is I/O-bound by construction,
    which is why it is the canonical scan-throughput probe."""
    li = t(spark, sf, "lineitem")
    disc_h = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (
                F.col("l_shipdate")
                >= F.lit("1995-01-01 00:00:00").cast("timestamp")
            )
            & (
                F.col("l_shipdate")
                < F.lit("1996-01-01 00:00:00").cast("timestamp")
            )
            & disc_h.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast(
                        "long"
                    )
                    * disc_h
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("revenue_e4"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# wave 170: TPC-H Q22 analog — scalar-subquery threshold + anti join
# ---------------------------------------------------------------------------
@q(
    "customer_dormant_value",
    """
    WITH thr AS (
      SELECT AVG(CAST(round(c_acctbal * 100) AS BIGINT)) AS cut
      FROM customer WHERE c_acctbal > 0.0),
    rich AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal
      FROM customer c CROSS JOIN thr
      WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > thr.cut),
    dormant AS (
      SELECT r.c_custkey, r.c_nationkey, r.bal
      FROM rich r
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = r.c_custkey
                          AND o.o_orderdate
                              >= TIMESTAMP '2000-01-01 00:00:00')),
    nn AS (SELECT n_nationkey, n_name FROM nation)
    SELECT nn.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(d.bal) AS BIGINT) AS total_bal_cents
    FROM dormant d JOIN nn ON nn.n_nationkey = d.c_nationkey
    GROUP BY nn.n_name ORDER BY nn.n_name
    """,
)
def customer_dormant_value(spark, sf):
    """TPC-H Q22 analog (global sales opportunity) — the scalar-
    subquery-threshold + ANTI-JOIN composition: customers whose
    balance exceeds the average positive balance (a 1-row global
    aggregate attached to every row — Catalyst decorrelates the
    scalar subquery to an aggregate-below-join, sql_scalar_subquery's
    shape) who have placed no orders SINCE 2000 (NOT EXISTS over the
    date-filtered orders -> LeftAnti on custkey,
    join_exists_subq's shape; the spec's "no orders ever" is
    EMPTY on this fixture — every custkey appears in orders — so
    the face pins the recency-dormancy variant, which is what a
    real win-back campaign asks anyway; the granger
    degenerate-but-equal rule), rolled up by nation. The
    spec's phone-prefix country filter is replaced by the nation
    dim (no phone column in the fixture); the analytical content —
    "rich, dormant, where" — is identical. The threshold compare
    runs on exact integer cents against the exact average (DuckDB
    AVG(BIGINT) and Spark avg(long) both compute in double from
    exact integers, identical op order — and the compare is
    strict, so the knife-edge row would need the average itself
    to be representable ambiguously, which integer cents
    preclude). At 100 TB: the anti-join build side is the orders
    key projection, the dims broadcast, one shuffle."""
    c = t(spark, sf, "customer")
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg(
            F.round(F.col("c_acctbal") * 100).cast("long")
        ).alias("cut")
    )
    rich = (
        c.crossJoin(thr)
        .filter(
            F.round(F.col("c_acctbal") * 100).cast("long")
            > F.col("cut")
        )
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100)
            .cast("long")
            .alias("bal"),
        )
    )
    o = (
        t(spark, sf, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    dormant = rich.join(
        o, rich["c_custkey"] == o["o_custkey"], "left_anti"
    )
    n = t(spark, sf, "nation")
    return (
        dormant.join(n, n["n_nationkey"] == dormant["c_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.sum("bal").cast("long").alias("total_bal_cents"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# wave 170: TPC-H Q4 analog — EXISTS decorrelation on late shipping
# ---------------------------------------------------------------------------
@q(
    "orders_priority_wait",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
            > 90 * 86400000000)
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def orders_priority_wait(spark, sf):
    """TPC-H Q4 analog (order priority checking) — the canonical
    EXISTS decorrelation: per priority, how many orders have AT
    LEAST ONE lineitem shipping more than 90 days after the order
    date (the spec's commitdate-vs-receiptdate lateness re-based
    on the columns the fixture carries; the analytical shape —
    count orders WHERE EXISTS a late line — is identical). EXISTS
    with a correlated predicate lowers to a LEFT SEMI join on
    orderkey with the lateness residual in the join condition —
    one fact-fact shuffle, the semi form guaranteeing each order
    counts ONCE no matter how many of its lines are late (the
    mistake the inner-join spelling makes is exactly the
    double-count this face's replay test would catch). Lateness
    compares exact epoch-microsecond differences against the
    literal 90-day span — never date arithmetic with its
    boundary-crossing vs complete-units engine split
    (date_interval_arith's lesson). 5-row output, count per
    priority."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        F.expr("unix_micros(cast(l_shipdate AS TIMESTAMP))")
        - F.expr("unix_micros(cast(o_orderdate AS TIMESTAMP))")
        > F.lit(90) * 86400000000
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# wave 171: conditional-count aggregate family — count_if / any / every
# ---------------------------------------------------------------------------
@q(
    "agg_count_if",
    """
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE value > 100.0) AS BIGINT)
             AS n_big,
           CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT)
             AS n_null,
           bool_or(value > 500.0) AS any_huge,
           bool_and(value IS NOT NULL) AS every_valued
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_count_if(spark, sf):
    """The conditional-aggregate family — count_if, any/bool_or,
    every/bool_and — the predicates-as-aggregates trio every data-
    quality rollup uses (check_constraints builds exactly these by
    hand; the native forms are shorter and fold to the same
    partial-aggregatable plan). Dialect mapping measured:
    Spark 4's count_if(p) == DuckDB's COUNT(*) FILTER (WHERE p);
    Spark `any`/`every` == DuckDB bool_or/bool_and — with the
    THREE-VALUED-LOGIC footnote that matters: any(p) over a group
    whose p values are all NULL is NULL, not FALSE, on both
    engines, and count_if never counts NULL predicate results (a
    NULL value fails `value > 100` silently — the n_null column
    makes the invisible visible, the csv_permissive
    touch-every-column lesson). Exact counts plus two booleans
    per type; one scan, map-side-combinable throughout."""
    e = t(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.expr("count_if(value > 100.0)")
            .cast("long")
            .alias("n_big"),
            F.expr("count_if(value IS NULL)")
            .cast("long")
            .alias("n_null"),
            F.expr("any(value > 500.0)").alias("any_huge"),
            F.expr("every(value IS NOT NULL)").alias("every_valued"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# wave 173: GROUPS window frames — dialect gap + exact emulation
# ---------------------------------------------------------------------------
@q(
    "win_groups_frame",
    """
    WITH lab AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    per_day AS (
      SELECT event_type, day,
             CAST(SUM(cents) AS BIGINT) AS day_cents,
             CAST(COUNT(*) AS BIGINT) AS day_n
      FROM lab GROUP BY event_type, day)
    SELECT event_type, day,
           CAST(SUM(day_cents) OVER (PARTITION BY event_type
             ORDER BY day
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
             AS win_cents,
           CAST(SUM(day_n) OVER (PARTITION BY event_type
             ORDER BY day
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
             AS win_n
    FROM per_day ORDER BY event_type, day
    """,
)
def win_groups_frame(spark, sf):
    """GROUPS window frames — the third frame type (ROWS counts
    rows, RANGE measures values, GROUPS counts DISTINCT ordering
    values: 'previous day + today + next day, however many rows
    each has'). NEITHER engine here has it — Spark 4.1's parser
    accepts only ROWS/RANGE (the gap CLAUDE.md has documented
    since round 4) and this DuckDB build answers "GROUPS mode ...
    not implemented yet" (both rejections measured and pinned in
    the test). The face therefore holds the SEMANTICS still via
    the exact translation both engines can run: aggregate to one
    row per (partition, ordering value), then a plain ROWS
    BETWEEN 1 PRECEDING AND 1 FOLLOWING — over unique ordering
    values, ROWS and GROUPS coincide by definition — carrying
    both the frame sum and the per-group row count. Day
    boundaries from epoch arithmetic; all sums exact cents. At
    100 TB the emulation is strictly cheaper than a native GROUPS
    frame would be: the window runs over the pre-aggregated
    calendar-sized relation, not the raw rows."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            )
            .cast("long")
            .alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    per_day = lab.groupBy("event_type", "day").agg(
        F.sum("cents").cast("long").alias("day_cents"),
        F.count(F.lit(1)).cast("long").alias("day_n"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-1, 1)
    )
    return per_day.select(
        "event_type",
        "day",
        F.sum("day_cents").over(w).cast("long").alias("win_cents"),
        F.sum("day_n").over(w).cast("long").alias("win_n"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# wave 173: SHUFFLE_REPLICATE_NL — the fourth join-strategy hint
# ---------------------------------------------------------------------------
@q(
    "join_replicate_nl",
    """
    SELECT a.r_name AS region_a, b.r_name AS region_b,
           CAST(length(a.r_name) + length(b.r_name) AS BIGINT)
             AS name_len
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    ORDER BY region_a, region_b
    """,
)
def join_replicate_nl(spark, sf):
    """SHUFFLE_REPLICATE_NL — the fourth and last join-strategy
    hint (join_broadcast = BHJ, join_shuffle_hash = SHJ,
    join_sortmerge = SMJ; this face pins the cartesian path): a
    non-equi join has no key to hash or sort on, so Spark's only
    strategies are broadcast-NL or replicate-NL, and the hint
    forces the replicated form — each side partitioned, every
    partition pair joined, the strategy that scales a
    GENUINELY-cartesian workload past what one broadcast side
    allows. Safe here by construction: the 5x5 region pair grid
    with the inequality residual is the textbook bounded cross
    product (the 'every non-broadcast crossJoin is a 1-row or
    dim-bounded attach' rule). The plan test pins
    CartesianProduct in the executed plan — the hint's visible
    effect — and the result is the exact 20-row pair relation
    with deterministic ordering. At scale the lesson inverts:
    replicate-NL on two FACT tables is the scale-killer every
    other face avoids; the face exists so the strategy's
    legitimate bounded use has a pinned shape."""
    a = t(spark, sf, "region").alias("a")
    b = t(spark, sf, "region").alias("b")
    j = a.hint("shuffle_replicate_nl").crossJoin(b).filter(
        F.col("a.r_regionkey") != F.col("b.r_regionkey")
    )
    return j.select(
        F.col("a.r_name").alias("region_a"),
        F.col("b.r_name").alias("region_b"),
        (
            F.length(F.col("a.r_name")) + F.length(F.col("b.r_name"))
        )
        .cast("long")
        .alias("name_len"),
    ).orderBy("region_a", "region_b")


# ---------------------------------------------------------------------------
# wave 174: LAG ... IGNORE NULLS — the gap-skipping offset function
# ---------------------------------------------------------------------------
@q(
    "win_lag_ignore_nulls",
    """
    WITH lab AS (
      SELECT user_id, event_id,
             CAST(epoch_us(ts) AS BIGINT) AS us,
             CASE WHEN value IS NULL OR value < 50.0 THEN NULL
                  ELSE CAST(round(value * 100) AS BIGINT) END
               AS big_cents
      FROM events WHERE user_id IS NOT NULL),
    w AS (
      SELECT user_id, event_id, us, big_cents,
             lag(big_cents IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, event_id)
               AS prev_big
      FROM lab)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(prev_big) AS BIGINT) AS n_with_prev,
           CAST(COALESCE(SUM(CASE WHEN big_cents IS NOT NULL
                                  THEN COALESCE(prev_big, 0)
                             END), 0) AS BIGINT)
             AS sum_prev_at_big
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def win_lag_ignore_nulls(spark, sf):
    """``lag(...) IGNORE NULLS`` — the gap-skipping offset function
    (plain lag returns whatever the previous ROW held, NULL
    included; IGNORE NULLS returns the previous NON-NULL, which is
    the 'value of my last big transaction' question — the
    offset-function sibling of events_locf's last_value fill).
    Dialect quirk measured and held still: BOTH engines support
    it, in DIFFERENT syntactic positions — DuckDB takes the
    modifier INSIDE the call (lag(x IGNORE NULLS) OVER ...; the
    outside position is a parser error), Spark takes it OUTSIDE
    (lag(x) IGNORE NULLS OVER ...) — one semantic feature, two
    grammars, exactly the class of translation the dialect-pair
    faces exist to pin. Sub-$50 values play the NULL role
    (deterministic NULL injection), the per-user rollup hashes
    the skip behavior (n_with_prev counts rows that HAVE a
    preceding big value; the conditional sum fingerprints WHICH
    value was carried), and the (us, event_id) order is total.
    One scan, one per-user window."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.expr("unix_micros(cast(ts AS TIMESTAMP))")
            .cast("long")
            .alias("us"),
            F.when(
                F.col("value").isNull() | (F.col("value") < 50.0),
                F.lit(None).cast("long"),
            )
            .otherwise(F.round(F.col("value") * 100).cast("long"))
            .alias("big_cents"),
        )
    )
    lab.createOrReplaceTempView("lag_in_probe")
    w = lab.sparkSession.sql(
        """
        SELECT user_id, event_id, us, big_cents,
               lag(big_cents) IGNORE NULLS OVER
                 (PARTITION BY user_id ORDER BY us, event_id)
                 AS prev_big
        FROM lag_in_probe
        """
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("prev_big").cast("long").alias("n_with_prev"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("big_cents").isNotNull(),
                        F.coalesce(F.col("prev_big"), F.lit(0)),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("sum_prev_at_big"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# wave 183: aggregation-based top-N — the window-free alternative plan
# ---------------------------------------------------------------------------
@q(
    "agg_topn_array",
    """
    WITH lab AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) * 10000000000
             + event_id AS keyed
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT event_type,
             list_slice(list_sort(list(keyed), 'DESC'), 1, 3)
               AS top3
      FROM lab GROUP BY event_type)
    SELECT event_type,
           CAST(top3[1] // 10000000000 AS BIGINT) AS c1,
           CAST(top3[2] // 10000000000 AS BIGINT) AS c2,
           CAST(top3[3] // 10000000000 AS BIGINT) AS c3,
           CAST(top3[1] % 10000000000 AS BIGINT) AS id1
    FROM g ORDER BY event_type
    """,
)
def agg_topn_array(spark, sf):
    """Top-3 per group WITHOUT a window — collect, sort in-row,
    slice: the aggregation-based alternative to win_topk's
    rank-filter, and the plan-shape contrast is the face (the
    window plans a per-partition sort of EVERY row with
    WindowGroupLimit; the aggregate plans an ObjectHashAggregate
    whose buffer holds the collected array — the agg wins when
    groups are many and small, the window when groups are huge
    and k tiny, and at 100 TB a skewed group OOMs the collect
    buffer where the window only spills, which is why win_topk is
    the default and this face documents the boundary). Values and
    tiebreak pack into ONE composite integer (cents * 1e10 +
    event_id — the agg_first_last keyed-struct trick in pure
    arithmetic, id < 1e10 asserted by the fixture contract) so
    the in-row sort is total and engine-identical; the unpack is
    exact integer div/mod. collect_list alone is order-unstable —
    the sort_array AFTER collection is load-bearing (the
    kg_entity_card lesson). The twin mirrors with
    list_sort/list_slice; both engines emit the top-3 cents and
    the winner's id."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (
                F.round(F.col("value") * 100).cast("long")
                * F.lit(10000000000)
                + F.col("event_id")
            ).alias("keyed"),
        )
    )
    g = lab.groupBy("event_type").agg(
        F.slice(
            F.sort_array(F.collect_list("keyed"), asc=False), 1, 3
        ).alias("top3")
    )
    return g.select(
        "event_type",
        F.expr("top3[0] div 10000000000").cast("long").alias("c1"),
        F.expr("top3[1] div 10000000000").cast("long").alias("c2"),
        F.expr("top3[2] div 10000000000").cast("long").alias("c3"),
        (F.expr("top3[0]") % 10000000000)
        .cast("long")
        .alias("id1"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# wave 184: shuffle-key skew census — the pre-join salting diagnostic
# ---------------------------------------------------------------------------
@q(
    "agg_key_skew_census",
    """
    WITH kc AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    cw AS (
      SELECT c,
             CAST(SUM(c) OVER (ORDER BY c) AS BIGINT) AS cum_rows,
             CAST(ROW_NUMBER() OVER (ORDER BY c, user_id) AS BIGINT)
               AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_keys,
             CAST(SUM(c) OVER () AS BIGINT) AS n_rows,
             CAST(MAX(c) OVER () AS BIGINT) AS max_c
      FROM kc)
    SELECT CAST(MAX(n_keys) AS BIGINT) AS n_keys,
           CAST(MAX(n_rows) AS BIGINT) AS n_rows,
           CAST(MAX(max_c) AS BIGINT) AS max_key_rows,
           round(CAST(MAX(max_c) AS DOUBLE) / MAX(n_rows), 6) + 0
             AS top_key_share,
           round(CAST(MAX(max_c) AS DOUBLE) * MAX(n_keys)
                 / MAX(n_rows), 6) + 0 AS skew_factor,
           round(CAST(MAX(max_c) AS DOUBLE) * MAX(n_keys)
                 / MAX(n_rows), 6) > 4.0 AS salting_recommended
    FROM cw
    """,
)
def agg_key_skew_census(spark, sf):
    """Shuffle-KEY skew census — the diagnostic that DECIDES whether
    the salting machinery (agg_salted, join_salted, AQE skew join)
    is worth its overhead before a big shuffle runs: per-key row
    counts for the prospective shuffle key (user_id), the top key's
    absolute and relative mass, and the skew factor max_c * n_keys
    / n_rows (= top key's load versus a perfectly uniform
    partition-per-key ideal; 1.0 is flat, and the 4x threshold is
    the embedded rule of thumb at which one straggler task
    dominates a stage's wall clock). Everything is exact BIGINTs
    from ONE map-side-combinable groupBy plus windows over the
    |keys|-sized support; the verdict boolean compares the ROUNDED
    factor. The synthetic fixture's users are near-uniform, so
    salting_recommended pins FALSE — and the replay test fabricates
    a celebrity key to show the trigger fires. At 100 TB this
    census costs one pass over the fact table and saves re-running
    a skew-killed join; run it FIRST, not after the retry."""
    kc = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = kc.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_key_rows"),
    )
    share = F.round(
        F.col("max_key_rows").cast("double") / F.col("n_rows"), 6
    )
    factor = F.round(
        F.col("max_key_rows").cast("double")
        * F.col("n_keys")
        / F.col("n_rows"),
        6,
    )
    return agg.select(
        "n_keys",
        "n_rows",
        "max_key_rows",
        (share + F.lit(0.0)).alias("top_key_share"),
        (factor + F.lit(0.0)).alias("skew_factor"),
        (factor > F.lit(4.0)).alias("salting_recommended"),
    )
