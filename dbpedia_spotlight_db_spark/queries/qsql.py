"""Spark-4 SQL-surface faces (round-4 wave 41): the declarative entry
points a SQL-first user of the engine reaches for — pipe-syntax
queries, SQL scalar UDFs (CREATE FUNCTION ... RETURN, inlined by
Catalyst — the fast path the Python-UDF family deliberately
contrasts), parameterized queries with IDENTIFIER() table binding
(injection-safe dynamic SQL), and collation-aware comparison
(UTF8_LCASE). Each face is pure syntax/semantics surface over plans
the audit already pins elsewhere — the point is that the SAME engine
answers the SAME question through every public API face, gated by
the SAME DuckDB oracle.

Every face here goes through ``spark.sql`` (the others are DataFrame
API) — parquet inputs are referenced via ``parquet.`path``` scans or
an explicitly created temp view, both of which keep predicate
pushdown and column pruning (the scan is the same
FileSourceScanExec)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import t

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
# SQL pipe syntax — Spark 4.0 `|>` operator chain
# ---------------------------------------------------------------------------
@q(
    "sql_pipe",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_pipe(spark, sf):
    """The finished-orders revenue rollup written in Spark 4's SQL
    PIPE syntax (`FROM ... |> WHERE ... |> EXTEND ... |> AGGREGATE
    ... GROUP BY`) — the linear query dialect for interactive
    exploration. Pipe syntax is PURE SYNTAX: Catalyst lowers it to
    the identical logical plan as the nested spelling, so the filter
    still pushes into the parquet scan and the aggregate is still
    two-phase (audit #52 asserts both against this face's plan —
    using the API must not cost anything). Money rides the exact
    integer-cents discipline; the oracle is the plain-SQL spelling
    of the same query."""
    return spark.sql(
        f"""
        FROM parquet.`{sf}/orders.parquet`
        |> WHERE o_orderstatus = 'F'
        |> EXTEND CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(cents) AS BIGINT) AS total_cents
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n, total_cents
        """
    )


# ---------------------------------------------------------------------------
# SQL scalar UDF — CREATE FUNCTION ... RETURN, Catalyst-inlined
# ---------------------------------------------------------------------------
@q(
    "sql_udf",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
                               * (1.0 + l_tax) * 100) AS BIGINT))
                AS BIGINT) AS net_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_udf(spark, sf):
    """Net revenue per return flag computed through a SQL scalar UDF
    (`CREATE OR REPLACE TEMPORARY FUNCTION net_cents(...) RETURNS
    BIGINT RETURN ...`, Spark 4) — the engine's answer to "let
    analysts package business logic" WITHOUT the Python-UDF tax:
    a SQL UDF is expanded by Catalyst at analysis time into the
    plan, so the hot path stays whole-stage-codegen JVM expression
    work (audit #52: no ArrowEvalPython / BatchEvalPython node may
    appear — contrast udf_scalar, which deliberately measures the
    slow path). The UDF body uses the same single-round
    exact-cents quantization as every money face; the oracle
    inlines the identical expression."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_cents(
            price DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS BIGINT
        RETURN CAST(round(price * (1.0 - disc) * (1.0 + tax) * 100)
                    AS BIGINT)
        """
    )
    return spark.sql(
        f"""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(net_cents(l_extendedprice, l_discount, l_tax))
                    AS BIGINT) AS net_cents
        FROM parquet.`{sf}/lineitem.parquet`
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# parameterized SQL + IDENTIFIER() — injection-safe dynamic queries
# ---------------------------------------------------------------------------
_PARAM_MIN_VALUE = 50.0


@q(
    "sql_params",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    WHERE value IS NOT NULL AND value >= {_PARAM_MIN_VALUE!r}
    GROUP BY event_type
    """,
)
def sql_params(spark, sf):
    """High-value event rollup through a PARAMETERIZED query: the
    table arrives as `IDENTIFIER(:tbl)` (name-binding that cannot
    splice SQL — the injection-safe dynamic-table idiom) and the
    threshold as a named scalar `:minv`. Parameter binding happens
    at parse time, so the bound literal behaves exactly like an
    inline one: the `value >= :minv` predicate still lands in the
    parquet scan's PushedFilters (audit #52 asserts it). The temp
    view is CREATE OR REPLACE — re-running the face (the oracle
    harness does) is idempotent. Oracle: the same query with the
    parameters spliced as literals."""
    t(spark, sf, "events").createOrReplaceTempView("sql_params_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM IDENTIFIER(:tbl)
        WHERE value IS NOT NULL AND value >= :minv
        GROUP BY event_type
        """,
        args={"tbl": "sql_params_events", "minv": _PARAM_MIN_VALUE},
    )


# ---------------------------------------------------------------------------
# collation-aware distinct — UTF8_LCASE vs binary vocabulary
# ---------------------------------------------------------------------------
@q(
    "text_collation",
    """
    WITH tok AS (
      SELECT lang, doc_id, unnest(string_split(text, ' ')) AS tk
      FROM documents),
    cased AS (
      SELECT lang,
             CASE WHEN substr(md5(tk || '|' || CAST(doc_id AS VARCHAR)),
                              1, 1) < '8'
                  THEN upper(tk) ELSE tk END AS tk
      FROM tok WHERE tk <> ''),
    agg AS (
      SELECT lang,
             CAST(COUNT(DISTINCT tk) AS BIGINT) AS vocab_cs,
             CAST(COUNT(DISTINCT lower(tk)) AS BIGINT) AS vocab_ci
      FROM cased GROUP BY lang)
    SELECT lang, vocab_cs, vocab_ci,
           CASE WHEN vocab_ci = 0 THEN NULL
                ELSE round(vocab_cs / CAST(vocab_ci AS DOUBLE), 6) + 0
           END AS case_blowup
    FROM agg
    """,
)
def text_collation(spark, sf):
    """Per-language vocabulary size under binary (UTF8_BINARY) vs
    case-insensitive (`COLLATE UTF8_LCASE`) comparison — the Spark 4
    collation surface, and the measurement behind "should this
    corpus be case-folded before tokenizer training?" (vocab_cs /
    vocab_ci is the case-variant blowup a cased BPE vocabulary
    pays). Case variants are derived IN-FLIGHT by the md5-coin
    discipline (upper() half the (token, doc) occurrences —
    deterministic across engines, runs, and partitionings; the
    fixture corpus is monocase so the raw column would make the
    face vacuous). The two DISTINCT counts land in ONE aggregate —
    Spark plans them as a single-pass Expand (the kg_void_stats
    shape, audit #52), not two corpus branches. DuckDB has no
    collation clause, so the oracle spells case-insensitivity as
    COUNT(DISTINCT lower(tk)) — equivalent on this ASCII corpus
    (UTF8_LCASE and lower() agree on ASCII; non-ASCII case folding
    is where they'd diverge, documented limit)."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "lang",
        "doc_id",
        F.explode(F.split("text", " ")).alias("tk"),
    ).filter(F.col("tk") != "")
    coin = F.substring(
        F.md5(F.concat_ws("|", F.col("tk"), F.col("doc_id"))), 1, 1
    )
    cased = tok.select(
        "lang",
        F.when(coin < "8", F.upper("tk")).otherwise(F.col("tk")).alias("tk"),
    )
    agg = cased.groupBy("lang").agg(
        F.count_distinct(F.col("tk")).cast("long").alias("vocab_cs"),
        F.count_distinct(F.expr("tk COLLATE UTF8_LCASE"))
        .cast("long")
        .alias("vocab_ci"),
    )
    return agg.select(
        "lang",
        "vocab_cs",
        "vocab_ci",
        F.when(F.col("vocab_ci") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("vocab_cs") / F.col("vocab_ci").cast("double"), 6
            )
            + F.lit(0.0)
        )
        .alias("case_blowup"),
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL — the analyst-ergonomics grouping surface
# ---------------------------------------------------------------------------
@q(
    "sql_group_by_all",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY 1, 2
    """,
)
def sql_group_by_all(spark, sf):
    """`GROUP BY ALL` (Spark 3.4+/DuckDB dialect convergence): the
    grouping set is INFERRED as every non-aggregate select item —
    the ergonomics feature that kills the classic copy-paste bug
    where a new select column silently falls out of the GROUP BY
    (plain SQL would error or, with ordinals, group by the wrong
    thing). Pure resolver sugar: the analyzed plan is the identical
    two-phase hash aggregate, filters still push, nothing changes
    physically — which is exactly what gating it against the
    explicit-ordinal oracle proves. Completes qsql's dialect
    surface alongside pipe syntax and parameterized queries."""
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM parquet.`{sf}/orders.parquet`
        GROUP BY ALL
        """
    )


# ---------------------------------------------------------------------------
# MapType surface — create_map / map_filter / explode
# ---------------------------------------------------------------------------
@q(
    "map_fns",
    """
    WITH v AS (
      SELECT event_type, user_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    kv AS (
      SELECT event_type, 'user' AS mkey, CAST(user_id AS BIGINT) AS mval
      FROM v WHERE user_id > 0
      UNION ALL
      SELECT event_type, 'cents', cents FROM v WHERE cents > 0)
    SELECT event_type, mkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(mval) AS BIGINT) AS total
    FROM kv GROUP BY event_type, mkey
    """,
)
def map_fns(spark, sf):
    """MapType surface — the one complex-type family without a
    dedicated face (arrays: arr_fns/HOFs; structs: json_roundtrip;
    variant: json_variant): each event builds an in-row
    `create_map('user', …, 'cents', …)`, `map_filter` drops the
    non-positive entries (the higher-order-function path over map
    entries — JVM codegen, no UDF), and `explode` unpivots the map
    to (key, value) rows for a relational rollup. The oracle
    computes the same answer from a plain UNION-ALL unpivot, so
    hash equality proves construction, per-entry lambda filtering,
    and map explosion are lossless. Maps stay in-ROW (bounded
    entries) — the schema pattern for sparse per-row attributes at
    scale, vs. columns (fixed) or melted tables (join-heavy)."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("user_id").cast("long").alias("user_id"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    m = v.select(
        "event_type",
        F.create_map(
            F.lit("user"), F.col("user_id"), F.lit("cents"), F.col("cents")
        ).alias("m"),
    )
    filt = m.select(
        "event_type",
        F.map_filter("m", lambda k, x: x > 0).alias("m"),
    )
    kv = filt.select(
        "event_type", F.explode("m").alias("mkey", "mval")
    )
    return kv.groupBy("event_type", "mkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mval").cast("long").alias("total"),
    )


# ---------------------------------------------------------------------------
# EXECUTE IMMEDIATE — dynamic SQL with bound parameters, in-dialect
# ---------------------------------------------------------------------------
@q(
    "sql_exec_immediate",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
)
def sql_exec_immediate(spark, sf):
    """EXECUTE IMMEDIATE (Spark 4 SQL-scripting surface): the query
    text is a STRING VALUE composed at runtime and executed from
    within SQL, with values bound through named USING parameters —
    the third dynamic-SQL binding path alongside sql_params
    (spark.sql(args=) + IDENTIFIER) and plain f-strings, and the one
    a SQL-only client (thriftserver, notebook cell) can use without
    any Python. The bound marker keeps the untrusted value OUT of
    the query text (injection hygiene — same motivation as
    sql_params). The inner statement is parsed and planned by the
    ordinary Catalyst path: the pushed-down priority filter and the
    two-phase hash aggregate are identical to the static spelling,
    which gating against the static oracle proves."""
    inner = (
        "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS total_cents "
        f"FROM parquet.`{sf}/orders.parquet` "
        "WHERE o_orderpriority = :prio GROUP BY o_orderstatus"
    )
    return spark.sql(
        f"EXECUTE IMMEDIATE '{inner}' USING '1-URGENT' AS prio"
    )


# ---------------------------------------------------------------------------
# try_* family — ANSI-mode error tolerance as values, not crashes
# ---------------------------------------------------------------------------
@q(
    "sql_try_cast",
    """
    WITH d AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS coin
      FROM orders),
    dirty AS (
      SELECT o_orderkey, cents,
             CASE WHEN coin < '3' THEN CAST(o_orderkey AS VARCHAR)
                  WHEN coin < '6' THEN '  ' || CAST(o_orderkey AS VARCHAR)
                                       || ' '
                  WHEN coin < '9' THEN CAST(o_orderkey AS VARCHAR) || '.75'
                  WHEN coin < 'c' THEN 'N/A'
                  ELSE '99999999999999999999999' END AS s
      FROM d),
    parsed AS (
      SELECT o_orderkey, cents,
             CASE WHEN regexp_matches(s, '^\\s*[+-]?\\d+\\s*$')
                  THEN TRY_CAST(s AS BIGINT) END AS v,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE cents / (o_orderkey % 5) END AS dv,
             CASE WHEN o_orderkey = 0 THEN 0
                  WHEN o_orderkey = 1 THEN 9223372036854775807
                  ELSE NULL END AS mv
      FROM dirty)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(v) AS BIGINT) AS n_parsed,
           CAST(SUM(v) AS BIGINT) AS parsed_sum,
           CAST(SUM(CASE WHEN dv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_null,
           round(SUM(CAST(round(dv * 1000000) AS BIGINT)) / 1000000.0, 6)
             + 0 AS div_sum,
           CAST(COUNT(mv) AS BIGINT) AS n_mul_ok
    FROM parsed
    """,
)
def sql_try_cast(spark, sf):
    """The try_* tolerance family (try_cast / try_divide /
    try_multiply) — under this engine's ANSI mode a bad cast, a zero
    divisor, or a BIGINT overflow is a JOB-KILLING exception, and at
    100 TB one poisoned row must become a NULL, not a dead pipeline
    (the expression-level rung of the ladder: csv/json_permissive
    quarantine rows, scan_ignore_corrupt skips files, try_* absorbs
    cells). Dirty strings are minted deterministically per row (md5
    coin: clean int / padded int / decimal / junk / overflow-digits).
    Engine-parity lesson pinned by the twin: DuckDB's TRY_CAST is
    LAXER than Spark's (it rounds '7.75' to 8 and parses '1e3');
    the oracle regexp-gates to Spark's stricter integral grammar,
    making the dialect divergence explicit instead of latent.
    try_divide's NULL-on-zero folds to a CASE twin; try_multiply's
    overflow-to-NULL has the closed-form twin (only |o_orderkey| <= 1
    survives x LONG_MAX — and the fixture DOES contain a key 0, the
    off-by-one the first gate run caught). Per-row division is
    micros-quantized so the sum stays order-independent."""
    d = t(spark, sf, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).alias(
            "coin"
        ),
    )
    ok = F.col("o_orderkey").cast("string")
    dirty = d.select(
        "o_orderkey",
        "cents",
        F.when(F.col("coin") < "3", ok)
        .when(F.col("coin") < "6", F.concat(F.lit("  "), ok, F.lit(" ")))
        .when(F.col("coin") < "9", F.concat(ok, F.lit(".75")))
        .when(F.col("coin") < "c", F.lit("N/A"))
        .otherwise(F.lit("99999999999999999999999"))
        .alias("s"),
    )
    parsed = dirty.select(
        "o_orderkey",
        "cents",
        F.expr("try_cast(s AS BIGINT)").alias("v"),
        F.expr("try_divide(cents, o_orderkey % 5)").alias("dv"),
        F.expr(
            "try_multiply(o_orderkey, 9223372036854775807L)"
        ).alias("mv"),
    )
    return parsed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("v").cast("long").alias("n_parsed"),
        F.sum("v").cast("long").alias("parsed_sum"),
        F.sum(F.when(F.col("dv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_div_null"),
        (
            F.round(
                F.sum(F.round(F.col("dv") * 1000000).cast("long"))
                / F.lit(1000000.0),
                6,
            )
            + F.lit(0.0)
        ).alias("div_sum"),
        F.count("mv").cast("long").alias("n_mul_ok"),
    )


# ---------------------------------------------------------------------------
# VALUES inline table — literal dims broadcast for free
# ---------------------------------------------------------------------------
@q(
    "sql_inline_values",
    """
    WITH w(prio, weight) AS (VALUES
      ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
      ('4-NOT SPECIFIED', 2), ('5-LOW', 1))
    SELECT w.prio, CAST(w.weight AS INT) AS weight,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(SUM(w.weight * CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS weighted_cents
    FROM orders o JOIN w ON w.prio = o.o_orderpriority
    GROUP BY w.prio, w.weight
    """,
)
def sql_inline_values(spark, sf):
    """An inline VALUES table as the join dimension — the literal
    lookup (priority -> SLA weight) every pipeline embeds somewhere,
    expressed as first-class SQL instead of a CASE ladder or a
    driver-side dict. The inline relation plans as a
    LocalTableScan, so Catalyst broadcasts it for free (a
    BroadcastHashJoin with zero scan cost on the build side — the
    join_broadcast scale rule without even a file read) and the
    probe side stays a single pass over orders with the aggregation
    partial before the exchange. Weighted revenue stays in exact
    integer cents (weight is an exact integer factor). The twin is
    the identical VALUES spelling — both engines support the
    standard CTE column-list form."""
    return spark.sql(
        f"""
        WITH w(prio, weight) AS (VALUES
          ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
          ('4-NOT SPECIFIED', 2), ('5-LOW', 1))
        SELECT w.prio, CAST(w.weight AS INT) AS weight,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(SUM(w.weight * CAST(round(o_totalprice * 100)
                                        AS BIGINT)) AS BIGINT)
                 AS weighted_cents
        FROM parquet.`{sf}/orders.parquet` o
        JOIN w ON w.prio = o.o_orderpriority
        GROUP BY w.prio, w.weight
        """
    )


# ---------------------------------------------------------------------------
# SELECT * EXCEPT + ORDER BY ALL — projection-subtraction dialects
# ---------------------------------------------------------------------------
@q(
    "sql_select_except",
    """
    SELECT * EXCLUDE (o_orderdate, o_totalprice),
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    ORDER BY ALL
    LIMIT 25
    """,
)
def sql_select_except(spark, sf):
    """Projection subtraction + ORDER BY ALL — the wide-table
    ergonomics pair (Spark 4 spells it `SELECT * EXCEPT (...)`,
    DuckDB `EXCLUDE (...)`; the twin pins the dialect divergence
    explicitly instead of leaving it latent): on a 100-column
    corpus table "everything but the payload blobs" is the daily
    projection, and writing it as subtraction keeps the query
    stable as columns are ADDED — exactly the schema-drift regime
    parquet_merge_schema models. Catalyst expands the star at
    analysis time, so column pruning still reaches the scan with
    the subtracted columns absent from ReadSchema (o_totalprice
    survives only because the cents expression references it).
    ORDER BY ALL orders by every output column left-to-right —
    o_orderkey leads, so the order is total and LIMIT 25 is
    deterministic, planning as TakeOrderedAndProject."""
    return spark.sql(
        f"""
        SELECT * EXCEPT (o_orderdate, o_totalprice),
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM parquet.`{sf}/orders.parquet`
        ORDER BY ALL
        LIMIT 25
        """
    )


# ---------------------------------------------------------------------------
# named WINDOW clause — one spec, many functions
# ---------------------------------------------------------------------------
@q(
    "sql_named_window",
    """
    SELECT event_id, user_id,
           CAST(rank() OVER w AS INT) AS rnk,
           lag(CAST(round(value * 100) AS BIGINT)) OVER w AS prev_cents,
           SUM(CAST(round(value * 100) AS BIGINT)) OVER w2 AS run_cents
    FROM events
    WHERE user_id IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING)
    """,
)
def sql_named_window(spark, sf):
    """The named WINDOW clause: one declared spec shared by rank(),
    lag() and a framed running sum — the SQL-surface spelling of
    what the DataFrame faces do with a reused WindowSpec object
    (win_rank / win_moving_avg), and the form that matters for
    PLAN quality: all three functions name the same (user_id;
    ts, event_id) sort, so Catalyst computes them in a single
    Window operator over ONE exchange+sort instead of re-sorting
    per function — on a 100-TB event log the difference between
    one shuffle and three. The running sum declares its ROWS frame
    explicitly (the ml_map RANGE-vs-ROWS discipline); rank and lag
    are frameless by definition. Total (ts, event_id) order makes
    every output deterministic; money rides exact cents."""
    return spark.sql(
        f"""
        SELECT event_id, user_id,
               CAST(rank() OVER w AS INT) AS rnk,
               lag(CAST(round(value * 100) AS BIGINT)) OVER w
                 AS prev_cents,
               SUM(CAST(round(value * 100) AS BIGINT)) OVER w2
                 AS run_cents
        FROM parquet.`{sf}/events.parquet`
        WHERE user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)
        """
    )


import itertools as _itertools

_DDL_COUNTER = _itertools.count()


# ---------------------------------------------------------------------------
# catalog-managed table — CREATE / INSERT / ANALYZE / stats-aware join
# ---------------------------------------------------------------------------
@q(
    "sql_catalog_table",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def sql_catalog_table(spark, sf):
    """The catalog-managed-table lifecycle: CREATE TABLE ... USING
    PARQUET, INSERT INTO ... SELECT from the raw feed, ANALYZE TABLE
    COMPUTE STATISTICS, then query the TABLE — the DDL surface every
    other face skips by reading parquet paths directly, and the one
    that matters operationally at 100 TB because ANALYZE is what
    feeds the cost-based optimizer real rowCount/sizeInBytes instead
    of file-size guesses (join reordering and broadcast decisions
    are only as good as these stats; the test pins that the catalog
    actually RETURNS them). The table is dropped and recreated per
    run (idempotent under re-invocation, unique name per session
    counter); INSERT INTO SELECT is the same distributed write as
    df.write, just spelled in SQL. Results hash against the raw
    feed — the managed round trip loses nothing."""
    # table names carry a per-session suffix: a managed table's
    # LOCATION outlives the session's in-memory catalog, so a fixed
    # name collides with the warehouse dir a previous session left
    # behind (LOCATION_ALREADY_EXISTS); the stale dir is also swept
    import re as _re
    import shutil as _shutil

    sid = _re.sub(
        r"[^0-9a-zA-Z]", "_", spark.sparkContext.applicationId
    )[-12:]
    name = f"spark_graft_orders_{sid}_{next(_DDL_COUNTER)}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    _shutil.rmtree(f"{wh}/{name.lower()}", ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {name} (
          o_orderstatus STRING, cents BIGINT
        ) USING PARQUET
        """
    )
    spark.sql(
        f"""
        INSERT INTO {name}
        SELECT o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM parquet.`{sf}/orders.parquet`
        """
    )
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM {name} GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# CACHE TABLE — explicit SQL-surface caching, InMemoryRelation reuse
# ---------------------------------------------------------------------------
@q(
    "sql_cached_view",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM v GROUP BY event_type
    """,
)
def sql_cached_view(spark, sf):
    """CACHE TABLE over a temp view — the explicit SQL caching
    surface (the DataFrame faces cache via parquet_checkpoint for
    corpus-scale reuse; a CACHED VIEW is the interactive-session
    tool for a WORKING SET that several queries will hit, columnar
    in executor memory with automatic spill). The face creates the
    view, caches it EAGERLY (plain CACHE TABLE is lazy — the
    eager form materializes now, so the query below is served from
    the InMemoryRelation, which the test pins in the plan), reads
    it, and uncaches in a finally (never leak executor memory into
    the next face — cache lifecycle is part of the surface).
    Caching changes WHERE bytes come from, never WHAT they are:
    the twin aggregates the raw feed."""
    name = f"spark_graft_cached_{next(_DDL_COUNTER)}"
    t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).createOrReplaceTempView(name)
    spark.sql(f"CACHE TABLE {name}")
    try:
        out = spark.sql(
            f"""
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS cents,
                   CAST(MIN(cents) AS BIGINT) AS min_cents,
                   CAST(MAX(cents) AS BIGINT) AS max_cents
            FROM {name} GROUP BY event_type
            """
        )
        # materialize while the cache is alive; result is tiny
        rows = out.collect()
    finally:
        spark.sql(f"UNCACHE TABLE IF EXISTS {name}")
    return spark.createDataFrame(
        rows,
        "event_type string, n long, cents long, "
        "min_cents long, max_cents long",
    )


# ---------------------------------------------------------------------------
# TRANSFORM ... USING — the Hive script-streaming interface
# ---------------------------------------------------------------------------
@q(
    "sql_transform_script",
    """
    WITH piped AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM piped GROUP BY event_type
    """,
)
def sql_transform_script(spark, sf):
    """TRANSFORM ... USING 'cat' — Hive's script-streaming
    interface, the THIRD external-execution surface after Python
    UDFs (Arrow batches to a Python worker) and SQL UDFs
    (Catalyst-inlined): rows serialize to tab-delimited lines on a
    subprocess's stdin and parse back from its stdout, which is how
    legacy Hive pipelines bolted perl/awk/sed stages into SQL — a
    migration from such a warehouse has to run these verbatim
    before porting them. The script here is the identity (`cat`) so
    the oracle can gate the round trip exactly: any delimiter,
    quoting, or type-coercion drift in the serde flips the hash
    (values come back as STRINGS and must be re-cast — the trap
    this face pins). Scale shape: one subprocess per task streaming
    rows — slower than codegen but parallel like any map; the
    aggregation after it is ordinary two-phase."""
    return spark.sql(
        f"""
        WITH src AS (
          SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
          FROM parquet.`{sf}/events.parquet` WHERE value IS NOT NULL),
        piped AS (
          SELECT TRANSFORM(event_type, cents)
          USING 'cat' AS (event_type STRING, cents_s STRING)
          FROM src)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(cents_s AS BIGINT)) AS BIGINT) AS cents
        FROM piped GROUP BY event_type
        """
    )


# ---------------------------------------------------------------------------
# try_to_timestamp — multi-format dirty date parsing
# ---------------------------------------------------------------------------
@q(
    "sql_try_timestamp",
    """
    WITH d AS (
      SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts,
             substr(md5('ts:' || CAST(o_orderkey AS VARCHAR)), 1, 1)
               AS coin
      FROM orders WHERE o_orderdate IS NOT NULL),
    dirty AS (
      SELECT o_orderkey,
             CASE WHEN coin < '6'
                    THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
                  WHEN coin < 'c' THEN strftime(ts, '%d/%m/%Y')
                  ELSE 'not-a-date' END AS s
      FROM d),
    parsed AS (
      SELECT COALESCE(
               try_strptime(s, '%Y-%m-%d %H:%M:%S'),
               try_strptime(s, '%d/%m/%Y')) AS pts
      FROM dirty)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(pts) AS BIGINT) AS n_parsed,
           CAST(SUM(epoch_us(pts) // 1000000) AS BIGINT) AS sum_s,
           CAST(MIN(epoch_us(pts)) AS BIGINT) AS min_us
    FROM parsed
    """,
)
def sql_try_timestamp(spark, sf):
    """Multi-format tolerant timestamp parsing — the ingest-side
    date mess as a first-class face: order dates arrive as ISO
    datetimes, as European dd/MM/yyyy, or as junk (md5-coin minted,
    deterministic), and the parse chain
    COALESCE(try_to_timestamp(iso), try_to_timestamp(dmy)) absorbs
    each row into the first grammar that fits, NULLing the rest —
    the date member of the try_* tolerance family (sql_try_cast
    holds the numeric seat; under ANSI an untry'd to_timestamp on
    one junk row kills the job at 100 TB). The dialect seam is the
    FORMAT LANGUAGE itself: Spark speaks Java patterns
    ('dd/MM/yyyy'), DuckDB speaks strptime ('%d/%m/%Y') — the twin
    pins that the two pattern systems denote the same grammar on
    this data. The sum certificate rides whole SECONDS (an
    epoch-us sum overflows BIGINT at ~5k rows x 1.7e15 — measured
    at sf0.01; the events_burstiness headroom rule), the min stays
    exact micros; naive == UTC under the pinned session, and the
    minting strftime/date_format pair is its own round-trip check."""
    return spark.sql(
        f"""
        WITH d AS (
          SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts,
                 substr(md5('ts:' || CAST(o_orderkey AS STRING)), 1, 1)
                   AS coin
          FROM parquet.`{sf}/orders.parquet`
          WHERE o_orderdate IS NOT NULL),
        dirty AS (
          SELECT o_orderkey,
                 CASE WHEN coin < '6'
                        THEN date_format(ts, 'yyyy-MM-dd HH:mm:ss')
                      WHEN coin < 'c' THEN date_format(ts, 'dd/MM/yyyy')
                      ELSE 'not-a-date' END AS s
          FROM d),
        parsed AS (
          SELECT COALESCE(
                   try_to_timestamp(s, 'yyyy-MM-dd HH:mm:ss'),
                   try_to_timestamp(s, 'dd/MM/yyyy')) AS pts
          FROM dirty)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(pts) AS BIGINT) AS n_parsed,
               CAST(SUM(unix_micros(pts) div 1000000) AS BIGINT)
                 AS sum_s,
               CAST(MIN(unix_micros(pts)) AS BIGINT) AS min_us
        FROM parsed
        """
    )


# ---------------------------------------------------------------------------
# SQL UNPIVOT clause — melt as first-class syntax
# ---------------------------------------------------------------------------
@q(
    "sql_unpivot",
    """
    WITH wide AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click'
                      THEN CAST(round(value * 100) AS BIGINT) END)
                  AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type = 'view'
                      THEN CAST(round(value * 100) AS BIGINT) END)
                  AS BIGINT) AS view,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT) END)
                  AS BIGINT) AS purchase
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
      GROUP BY user_id),
    melted AS (
      SELECT user_id, 'click' AS metric, click AS cents FROM wide
      WHERE click IS NOT NULL
      UNION ALL
      SELECT user_id, 'view', view FROM wide WHERE view IS NOT NULL
      UNION ALL
      SELECT user_id, 'purchase', purchase FROM wide
      WHERE purchase IS NOT NULL)
    SELECT metric, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM melted GROUP BY metric
    """,
)
def sql_unpivot(spark, sf):
    """The SQL UNPIVOT clause (Spark 3.4+) melting a wide per-user
    metrics table back to long form — the SYNTAX face over the
    semantics unpivot_events pins via the DataFrame melt(): wide
    tables are how feature stores serve, long tables are how
    aggregation pipelines want them, and the melt direction has one
    subtle default this face makes explicit — UNPIVOT DROPS NULL
    measure rows (a user with no purchases contributes no
    'purchase' row), which the twin spells as WHERE ... IS NOT NULL
    on each UNION branch (the portable form; DuckDB's UNPIVOT
    quoting/naming differs enough that the explicit spelling IS the
    safer oracle). The pivot-then-unpivot pair in one plan also
    pins that the two are inverses up to the dropped NULLs."""
    return spark.sql(
        f"""
        WITH wide AS (
          SELECT user_id,
                 SUM(CASE WHEN event_type = 'click'
                     THEN CAST(round(value * 100) AS BIGINT) END)
                   AS click,
                 SUM(CASE WHEN event_type = 'view'
                     THEN CAST(round(value * 100) AS BIGINT) END)
                   AS view,
                 SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(round(value * 100) AS BIGINT) END)
                   AS purchase
          FROM parquet.`{sf}/events.parquet`
          WHERE value IS NOT NULL AND user_id IS NOT NULL
          GROUP BY user_id)
        SELECT metric, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM wide UNPIVOT (cents FOR metric IN (click, view, purchase))
        GROUP BY metric
        """
    )


# ---------------------------------------------------------------------------
# aggregate FILTER clause — conditional aggregation as syntax
# ---------------------------------------------------------------------------
@q(
    "sql_filter_clause",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE value IS NOT NULL) AS BIGINT)
             AS n_valued,
           CAST(SUM(CAST(round(value * 100) AS BIGINT))
                FILTER (WHERE value > 100) AS BIGINT) AS big_cents,
           CAST(COUNT(DISTINCT user_id)
                FILTER (WHERE user_id % 2 = 0) AS BIGINT)
             AS n_even_users
    FROM events GROUP BY event_type
    """,
)
def sql_filter_clause(spark, sf):
    """The standard-SQL aggregate FILTER clause — four differently-
    conditioned aggregates in ONE Aggregate operator over one scan
    (the syntax this repo's twins spell everywhere as
    SUM(CASE WHEN ...) folds; FILTER is the declared form, it
    composes with DISTINCT where CASE can't cleanly — a
    conditional COUNT(DISTINCT) via CASE needs a NULL-eating
    expression and a comment), identical spelling on both engines.
    Semantics pinned: FILTER on a SUM over no qualifying rows
    yields NULL (not 0) exactly like the CASE fold; the filtered
    COUNT(DISTINCT) plans as the same Expand the unfiltered one
    does. One map-side-combinable pass regardless of how many
    FILTER conditions ride it — the scale property that makes the
    clause the right spelling for metric sheets with dozens of
    conditioned measures."""
    return spark.sql(
        f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE value IS NOT NULL) AS BIGINT)
                 AS n_valued,
               CAST(SUM(CAST(round(value * 100) AS BIGINT))
                    FILTER (WHERE value > 100) AS BIGINT) AS big_cents,
               CAST(COUNT(DISTINCT user_id)
                    FILTER (WHERE user_id % 2 = 0) AS BIGINT)
                 AS n_even_users
        FROM parquet.`{sf}/events.parquet` GROUP BY event_type
        """
    )


# ---------------------------------------------------------------------------
# SHOW PARTITIONS — the catalog's partition inventory
# ---------------------------------------------------------------------------
@q(
    "sql_show_partitions",
    """
    SELECT 'lang=' || lang AS partition,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def sql_show_partitions(spark, sf):
    """SHOW PARTITIONS over a catalog-managed partitioned table —
    the partition INVENTORY surface (ops scripts diff it against
    yesterday's to catch partitions that vanished or appeared;
    retention jobs drive ALTER TABLE DROP PARTITION from it), which
    reads the METASTORE listing, not the data — O(partitions), the
    reason it's the tool for 100-TB tables where even a pruned scan
    is too slow for an inventory check. The face creates the
    partitioned managed table (per-session name + stale-location
    sweep, the sql_catalog_table discipline), INSERTs the corpus,
    and joins SHOW PARTITIONS' strings back to per-partition counts
    from the table — proving the inventory and the data agree; the
    twin derives the same inventory relationally. Dynamic partition
    INSERT needs the partition column LAST in the select list —
    position, not name, binds it."""
    import re as _re
    import shutil as _shutil

    sid = _re.sub(
        r"[^0-9a-zA-Z]", "_", spark.sparkContext.applicationId
    )[-12:]
    name = f"spark_graft_docs_{sid}_{next(_DDL_COUNTER)}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    _shutil.rmtree(f"{wh}/{name.lower()}", ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {name} (doc_id BIGINT, n_chars BIGINT)
        USING PARQUET PARTITIONED BY (lang STRING)
        """
    )
    spark.sql(
        f"""
        INSERT INTO {name}
        SELECT doc_id, n_chars, lang
        FROM parquet.`{sf}/documents.parquet`
        """
    )
    parts = spark.sql(f"SHOW PARTITIONS {name}").select(
        F.col("partition")
    )
    counts = spark.sql(
        f"""
        SELECT 'lang=' || lang AS partition,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM {name} GROUP BY lang
        """
    )
    return parts.join(counts, "partition").select("partition", "n_docs")


# ---------------------------------------------------------------------------
# column DEFAULT — schema-evolution ergonomics in DDL
# ---------------------------------------------------------------------------
@q(
    "sql_column_default",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN tier = 'unrated' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_defaulted,
           CAST(SUM(score) AS BIGINT) AS score_sum
    FROM (
      SELECT source,
             CASE WHEN doc_id % 3 = 0 THEN 'gold' ELSE 'unrated' END
               AS tier,
             CASE WHEN doc_id % 3 = 0 THEN doc_id % 100 ELSE 42 END
               AS score
      FROM documents)
    GROUP BY source
    """,
)
def sql_column_default(spark, sf):
    """Column DEFAULT values (Spark 3.4+ DDL): the curation table
    declares tier STRING DEFAULT 'unrated' and score BIGINT DEFAULT
    42, the backfill INSERT names only the columns it has, and the
    engine fills the rest — the schema-evolution ergonomic that
    keeps every legacy writer valid when a table grows review
    columns (the DDL-side sibling of parquet_merge_schema's
    read-side null-fill, with a crucial difference the face pins:
    DEFAULT fills a VALUE, merge-schema fills NULL — downstream
    NOT-NULL logic only survives the former). Rows with ratings
    insert all columns; rows without insert (doc_id, source) and
    inherit both defaults; the twin reproduces the fill rule
    relationally. Per-session table name + stale-location sweep
    (the sql_catalog_table discipline)."""
    import re as _re
    import shutil as _shutil

    sid = _re.sub(
        r"[^0-9a-zA-Z]", "_", spark.sparkContext.applicationId
    )[-12:]
    name = f"spark_graft_defaults_{sid}_{next(_DDL_COUNTER)}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    _shutil.rmtree(f"{wh}/{name.lower()}", ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {name} (
          doc_id BIGINT, source STRING,
          tier STRING DEFAULT 'unrated',
          score BIGINT DEFAULT 42
        ) USING PARQUET
        """
    )
    spark.sql(
        f"""
        INSERT INTO {name}
        SELECT doc_id, source, 'gold', doc_id % 100
        FROM parquet.`{sf}/documents.parquet` WHERE doc_id % 3 = 0
        """
    )
    spark.sql(
        f"""
        INSERT INTO {name} (doc_id, source)
        SELECT doc_id, source
        FROM parquet.`{sf}/documents.parquet` WHERE doc_id % 3 <> 0
        """
    )
    return spark.sql(
        f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN tier = 'unrated' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_defaulted,
               CAST(SUM(score) AS BIGINT) AS score_sum
        FROM {name} GROUP BY source
        """
    )


# ---------------------------------------------------------------------------
# LISTAGG — ordered string aggregation, deterministic by decree
# ---------------------------------------------------------------------------
@q(
    "agg_listagg",
    """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type)
             AS type_list,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
    """,
)
def agg_listagg(spark, sf):
    """LISTAGG (Spark 4) / string_agg (DuckDB): each user's
    distinct event types joined into one ordered string — the
    denormalized label column every export and BI sheet wants, and
    an aggregate that is NONDETERMINISTIC BY DEFAULT (concatenation
    order follows arrival order, i.e. partitioning) unless the
    WITHIN GROUP (ORDER BY ...) clause pins it — the same
    discipline kg_entity_card needs for collect_list (array_sort
    over carried structs) spelled as first-class syntax. DISTINCT
    + ORDER BY together make the string a pure function of the
    SET, so it hashes identically across engines, runs, and
    cluster sizes; without the clause this face would be
    gate-red on its first shuffle change. Engine wart pinned while
    building it: Spark 4.1's LISTAGG(DISTINCT ...) WITHIN GROUP
    throws a ClassCastException in the partial-agg path, so the
    dedup runs as a DISTINCT subquery UNDER the aggregate — same
    semantics, and the shape a migration must use today. The
    dialect seam (LISTAGG ... WITHIN GROUP vs
    string_agg(... ORDER BY)) is pinned by the twin."""
    return spark.sql(
        f"""
        WITH ut AS (
          SELECT DISTINCT user_id, event_type
          FROM parquet.`{sf}/events.parquet`
          WHERE user_id IS NOT NULL)
        SELECT user_id,
               listagg(event_type, ',')
                 WITHIN GROUP (ORDER BY event_type) AS type_list,
               CAST(COUNT(event_type) AS BIGINT) AS n_types
        FROM ut GROUP BY user_id
        """
    )


# ---------------------------------------------------------------------------
# REBALANCE hint — AQE-split output partitions before a write
# ---------------------------------------------------------------------------
@q(
    "sql_rebalance_hint",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
)
def sql_rebalance_hint(spark, sf):
    """The REBALANCE hint — the output-file skew fixer: before a
    partitionBy-style write, /*+ REBALANCE(lang) */ asks AQE to
    hash-distribute by the column but SPLIT oversized partitions at
    runtime (and coalesce tiny ones), which is what prevents the
    one-giant-file-per-hot-language layout a plain
    repartition(lang) produces — REPARTITION guarantees the
    partitioning, REBALANCE guarantees the SIZES, and only at
    write time does the difference matter (a skewed shuffle
    partition inside a query is AQE's ordinary job; a skewed
    OUTPUT FILE lives forever). The hint is a physical-layout
    directive with zero semantic content — the twin is the plain
    aggregate, and the test pins RebalancePartitions in the
    optimized plan. The aggregate AFTER the rebalance also shows
    hints compose: Catalyst still plans the normal two-phase
    agg above it."""
    return spark.sql(
        f"""
        SELECT /*+ REBALANCE(lang) */
               lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM parquet.`{sf}/documents.parquet` GROUP BY lang
        """
    )


# ---------------------------------------------------------------------------
# DataFrame.transpose — Spark 4.0 relational pivot-without-aggregation
# ---------------------------------------------------------------------------
@q(
    "sql_transpose",
    """
    SELECT 'n' AS key,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS "F",
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
             AS "O"
    FROM orders
    UNION ALL
    SELECT 'cents',
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             FILTER (WHERE o_orderstatus = 'F') AS BIGINT),
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
    FROM orders
    """,
)
def sql_transpose(spark, sf):
    """Spark 4.0 ``DataFrame.transpose()`` — rows become columns with
    the index column's VALUES as the new column names (the "flip a
    small metrics table for a report" op; pivot_events aggregates
    into cells, transpose only reorients). The input MUST already be
    tiny — transpose collects the index column to the driver to name
    the output schema, so the scale discipline is aggregate-first
    (here: 2 statuses x 2 measures from one orders scan),
    transpose-last; transposing anything corpus-proportional is a
    driver OOM by construction, exactly like an uncapped collect().
    Measures must share one type (both BIGINT here) because values
    of one original row land in one output column. Statuses
    restricted to the always-present F/O so the output schema is
    identical at every sf (TPC-H 'P' is rare and would make the
    column set data-dependent); the DuckDB twin spells the same
    table as FILTERed conditional aggregates."""
    agg = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("o_orderstatus")
    )
    return agg.transpose()


# ---------------------------------------------------------------------------
# try_* arithmetic — the ANSI-overflow tolerance ladder
# ---------------------------------------------------------------------------
@q(
    "sql_try_arith",
    """
    WITH b AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             event_id % 5 AS k
      FROM events WHERE value IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE k = 0) AS BIGINT) AS n_div_null,
           CAST(COUNT(*) FILTER (WHERE k = 0) AS BIGINT) AS n_mod_null,
           CAST(COUNT(*) FILTER (WHERE
             abs(CAST(cents AS HUGEINT) * 1000000000000000)
               > 9223372036854775807) AS BIGINT) AS n_mul_null,
           CAST(COUNT(*) FILTER (WHERE
             CAST(9223372036854775000 AS HUGEINT) + CAST(cents AS HUGEINT)
               > 9223372036854775807) AS BIGINT) AS n_add_null,
           CAST(COALESCE(SUM(cents % k) FILTER (WHERE k <> 0), 0)
                AS BIGINT) AS sum_mod,
           CAST(COALESCE(SUM(CAST(round(cents / k * 1000000) AS BIGINT))
                  FILTER (WHERE k <> 0), 0) AS BIGINT) AS sum_div_micros
    FROM b
    """,
)
def sql_try_arith(spark, sf):
    """The try_* ARITHMETIC family (try_divide / try_mod /
    try_multiply / try_add) — the tolerance ladder's numeric rungs:
    under ANSI mode (this engine's default) divide-by-zero and
    BIGINT overflow THROW and kill the job, and at 10^12 rows there
    is always one row that overflows; try_* converts exactly those
    rows to NULL and nothing else. The census pins each rung
    against a twin that PREDICTS the poisoned rows arithmetically
    (k = 0 for divide/mod; a HUGEINT-gated magnitude test for
    multiply/add — DuckDB has no try_* so the twin must decide
    overflow BEFORE attempting it). Division is double math; its
    surviving sum rides per-row integer-micros quantization
    (identical IEEE doubles -> identical round on both engines).
    sql_try_cast covers the casting rungs; this face covers
    arithmetic."""
    b = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            (F.col("event_id") % 5).alias("k"),
        )
    )
    w = b.select(
        F.expr("try_divide(cents, k)").alias("d"),
        F.expr("try_mod(cents, k)").alias("m"),
        F.expr("try_multiply(cents, 1000000000000000L)").alias("mu"),
        F.expr("try_add(9223372036854775000L, cents)").alias("ad"),
    )
    return w.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("d").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_div_null"),
        F.sum(F.when(F.col("m").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_mod_null"),
        F.sum(F.when(F.col("mu").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_mul_null"),
        F.sum(F.when(F.col("ad").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_add_null"),
        F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("sum_mod"),
        F.coalesce(
            F.sum(F.round(F.col("d") * 1000000).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("sum_div_micros"),
    )


# ---------------------------------------------------------------------------
# SQL scripting — Spark 4 BEGIN/DECLARE/WHILE/IF procedural block
# ---------------------------------------------------------------------------
@q(
    "sql_scripting",
    """
    WITH s AS (
      SELECT COALESCE(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT), 0) AS tot
      FROM orders),
    g AS (
      SELECT tot,
             CAST(floor(sqrt(CAST(tot AS DOUBLE))) AS BIGINT) AS g0
      FROM s),
    a AS (
      SELECT tot,
             CASE WHEN (g0 + 1) * (g0 + 1) <= tot THEN g0 + 1
                  WHEN g0 * g0 > tot THEN g0 - 1
                  ELSE g0 END AS r
      FROM g)
    SELECT CAST(tot AS BIGINT) AS tot_cents,
           CAST(r AS BIGINT) AS isqrt_cents,
           r * r <= tot AND (r + 1) * (r + 1) > tot AS ok
    FROM a
    """,
)
def sql_scripting(spark, sf):
    """Spark 4 SQL scripting (`BEGIN ... END` compound with DECLARE /
    SET / IF / WHILE — SQL:2016 PSM surface, new in 4.0): the whole
    procedural block executes DRIVER-SIDE as a sequence of Catalyst
    statements, so loop iterations cost one tiny job each while the
    heavy statement (the corpus aggregate that seeds `tot`) is still
    one distributed scan — the right division of labor for control
    flow that a 100-TB job would otherwise push into a driver-side
    Python loop over `.collect()`. The demo computes the exact
    integer square root of total revenue cents with a doubling seed
    (x <- 2x while x^2 <= tot, so x lands in (isqrt, 2*isqrt] and
    x^2 never exceeds 4*tot — the naive seed x = tot overflows
    BIGINT at the first x*x) followed by the classic y < x Newton
    descent, which terminates at exactly floor(sqrt(tot)). The twin
    has no scripting, so it uses the closed form floor(sqrt(double))
    with a +/-1 integer correction — exact for tot < 2^52 (double
    integer-exactness; ~10^6x the sf0.01 revenue) — and both sides
    carry the self-certifying gate r^2 <= tot < (r+1)^2. Empty
    corpus: SUM is NULL -> COALESCE 0, isqrt 0, gate TRUE."""
    return spark.sql(
        f"""
        BEGIN
          DECLARE tot BIGINT;
          DECLARE x BIGINT DEFAULT 0;
          DECLARE y BIGINT;
          SET tot = (
            SELECT COALESCE(CAST(SUM(CAST(round(o_totalprice * 100)
                                          AS BIGINT)) AS BIGINT),
                            CAST(0 AS BIGINT))
            FROM parquet.`{sf}/orders.parquet`);
          IF tot > 0 THEN
            SET x = 1;
            WHILE x * x <= tot DO
              SET x = x * 2;
            END WHILE;
            SET y = (x + tot DIV x) DIV 2;
            WHILE y < x DO
              SET x = y;
              SET y = (x + tot DIV x) DIV 2;
            END WHILE;
          END IF;
          SELECT tot AS tot_cents, x AS isqrt_cents,
                 x * x <= tot AND (x + 1) * (x + 1) > tot AS ok;
        END
        """
    )


# ---------------------------------------------------------------------------
# SQL TABLE function — CREATE FUNCTION ... RETURNS TABLE, LATERAL-correlated
# ---------------------------------------------------------------------------
@q(
    "sql_table_udf",
    """
    WITH b AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    f AS (
      SELECT 'lo' AS band, least(cents, 10000000) AS amount FROM b
      UNION ALL
      SELECT 'hi', greatest(cents - 10000000, 0) FROM b)
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(amount), 0) AS BIGINT) AS amount_cents
    FROM f GROUP BY band
    """,
)
def sql_table_udf(spark, sf):
    """SQL TABLE function (Spark 4 `CREATE FUNCTION ... RETURNS
    TABLE ... RETURN <query>`, the SQL-standard UDTF): the function
    body is a QUERY inlined by Catalyst at every LATERAL call site —
    the declarative sibling of the Python UDTF faces (udtf_ngrams /
    udtf_analyze) with none of their Python-worker cost, and the
    table-valued sibling of sql_udf's scalar inlining. The demo
    splits every order's price into a capped 'lo' band and an
    overflow 'hi' band (two rows per order — a genuine one-to-many
    expansion), correlates it LATERAL against the orders scan, and
    aggregates per band; the conservation identity (lo + hi sums
    back to total revenue) rides the hashed group rows. Body shape
    MATTERS for the plan: an inline VALUES cannot reference the
    parameter at all (INVALID_INLINE_TABLE), and a UNION ALL of two
    parameter SELECTs decorrelates into orders JOIN (orders UNION
    orders) — THREE corpus scans for a two-row expansion (measured);
    the explode-over-parameter-array body below is the one Catalyst
    collapses to scan -> Generate -> agg, ONE corpus scan, zero
    joins (audit #71 pins it). CREATE OR REPLACE keeps
    re-registration idempotent across calls in one session. DuckDB
    has no SQL macro-with-TABLE in the same shape, so the twin
    expands the call site by hand — which is exactly what Catalyst
    does, making plan equivalence the point of the face."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION price_bands(cents BIGINT)
           RETURNS TABLE (band STRING, amount BIGINT)
           RETURN SELECT s.col.band, s.col.amount
                  FROM (SELECT explode(array(
                          named_struct('band', 'lo', 'amount',
                                       least(cents, 10000000L)),
                          named_struct('band', 'hi', 'amount',
                                       greatest(cents - 10000000L, 0L))
                        )) AS col) s"""
    )
    return spark.sql(
        f"""
        SELECT band, COUNT(*) AS n,
               COALESCE(SUM(amount), CAST(0 AS BIGINT)) AS amount_cents
        FROM parquet.`{sf}/orders.parquet`,
        LATERAL price_bands(CAST(round(o_totalprice * 100) AS BIGINT))
        GROUP BY band
        """
    )


# ---------------------------------------------------------------------------
# pandas API on Spark — the DataFrame-as-pandas front end hits the same engine
# ---------------------------------------------------------------------------
@q(
    "ps_api_groupby",
    """
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def ps_api_groupby(spark, sf):
    """pandas API on Spark (``pyspark.pandas``) — the third public
    query front end after the DataFrame API and SQL (the face
    families' usual two), and the migration path for pandas
    codebases that outgrow one machine: ps.read_parquet ->
    groupby -> agg writes pandas, executes Catalyst. The face does
    the cents rounding and the aggregation THROUGH the pandas
    surface (assign + groupby.agg), converts back with
    to_spark(), and the plain GROUP BY twin certifies that the
    pandas semantics layered on top (here: groupby semantics,
    no pandas index materialization) changed no values. The
    attach-default-index overhead trap is dodged by
    index_col-free reads feeding straight into a groupby (the
    index is never materialized as a distributed sequence). One
    scan, one shuffle — the same plan the DataFrame face would
    make, which is the point."""
    import pyspark.pandas as ps

    with ps.option_context("compute.default_index_type", "distributed"):
        pdf = ps.read_parquet(f"{sf}/orders.parquet")
        pdf = pdf.assign(
            cents=(pdf["o_totalprice"] * 100).round(0).astype("int64")
        )
        g = (
            pdf.groupby("o_orderstatus")
            .agg(n=("cents", "count"), total_cents=("cents", "sum"))
            .reset_index()
        )
        out = g.to_spark()
    return out.select(
        F.col("o_orderstatus").alias("status"),
        F.col("n").cast("long").alias("n"),
        F.col("total_cents").cast("long").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# SQL session variables — DECLARE VARIABLE / SET VAR / reference in queries
# ---------------------------------------------------------------------------
@q(
    "sql_variables",
    """
    WITH s AS (
      SELECT COALESCE(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT), 0) AS tot,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders),
    c AS (
      SELECT tot, cnt,
             CASE WHEN cnt = 0 THEN 0
                  ELSE (3 * (tot // cnt)) // 2 END AS big_cut
      FROM s)
    SELECT CAST(c.tot AS BIGINT) AS tot_cents,
           CAST(c.big_cut AS BIGINT) AS cutoff_cents,
           CAST(COUNT(CASE WHEN CAST(round(o.o_totalprice * 100)
                                     AS BIGINT) > c.big_cut
                           THEN 1 END) AS BIGINT) AS n_above,
           CAST(COALESCE(SUM(CASE WHEN CAST(round(o.o_totalprice * 100)
                                            AS BIGINT) > c.big_cut
                                  THEN CAST(round(o.o_totalprice * 100)
                                            AS BIGINT) END),
                         0) AS BIGINT) AS above_cents
    FROM c LEFT JOIN orders o ON TRUE
    GROUP BY c.tot, c.big_cut
    """,
)
def sql_variables(spark, sf):
    """SQL session variables (Spark 4 `DECLARE VARIABLE` / `SET VAR` /
    bare-name reference): the two-statement analytic idiom — compute
    a scalar once, reuse it as a CONSTANT in later queries — without
    the scripting block sql_scripting wraps around it, and without
    re-evaluating the scalar subquery per consumer: at SET VAR time
    the aggregate runs ONCE and the variable folds into every later
    plan as a literal (the driver-literal closure discipline the
    flagship uses, surfaced as SQL). The face sets the revenue total
    as a variable, derives a 1.5x-average cutoff through a SECOND variable that
    references the first (variables compose), and counts/totals the
    orders above it — the 'whales above average' report, with a
    cutoff the data actually splits (the first cut used 5% of total
    book, which NO order reaches: a degenerate-but-hash-green face,
    the stat_granger lesson, caught by the replay test this time).
    The twin has no variables, so it reproduces the same dataflow
    with a 1-row CTE cross-joined in (same values, two evaluation
    strategies — which is the point; and conditional aggregation,
    never LEFT JOIN ON predicate + COUNT(*), which counts the
    no-match null row). DECLARE OR REPLACE keeps re-runs
    idempotent."""
    spark.sql("DECLARE OR REPLACE VARIABLE rev_tot BIGINT")
    spark.sql("DECLARE OR REPLACE VARIABLE big_cut BIGINT")
    spark.sql(
        f"""SET VAR rev_tot = (
              SELECT COALESCE(CAST(SUM(CAST(round(o_totalprice * 100)
                                            AS BIGINT)) AS BIGINT),
                              CAST(0 AS BIGINT))
              FROM parquet.`{sf}/orders.parquet`)"""
    )
    spark.sql(
        f"""SET VAR big_cut = (
              SELECT CASE WHEN COUNT(*) = 0 THEN CAST(0 AS BIGINT)
                          ELSE (3 * (rev_tot DIV COUNT(*))) DIV 2 END
              FROM parquet.`{sf}/orders.parquet`)"""
    )
    return spark.sql(
        f"""
        SELECT rev_tot AS tot_cents,
               big_cut AS cutoff_cents,
               COUNT(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                               > big_cut THEN 1 END) AS n_above,
               COALESCE(SUM(CASE WHEN CAST(round(o_totalprice * 100)
                                           AS BIGINT) > big_cut
                                 THEN CAST(round(o_totalprice * 100)
                                           AS BIGINT) END),
                        CAST(0 AS BIGINT)) AS above_cents
        FROM parquet.`{sf}/orders.parquet`
        GROUP BY rev_tot, big_cut
        """
    )


# ---------------------------------------------------------------------------
# try_element_at — the collection rung of the ANSI tolerance ladder
# ---------------------------------------------------------------------------
@q(
    "sql_try_element_at",
    """
    WITH a AS (
      SELECT string_split(text, ' ') AS arr,
             CAST(1 + doc_id % 40 AS BIGINT) AS idx
      FROM documents WHERE text IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN idx <= len(arr) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           CAST(SUM(CASE WHEN idx <= len(arr)
                         THEN length(arr[CAST(idx AS INT)])
                         ELSE 0 END) AS BIGINT) AS hit_len_sum
    FROM a
    """,
)
def sql_try_element_at(spark, sf):
    """``try_element_at`` — the collection rung of the try_*
    tolerance ladder (arith: sql_try_arith, casts: sql_try_cast,
    timestamps: sql_try_timestamp): under ANSI mode a plain
    element_at past the end of the array THROWS
    INVALID_ARRAY_INDEX, so probing 'the (1 + doc_id mod 40)-th
    token' of variable-length documents is a crash without the try_
    form and a clean NULL with it. The face counts probes that land
    (and the total length of the tokens they fetch); the twin
    bounds-checks explicitly, which is exactly the rewrite try_
    spares you at 100 TB — one deep document keeps the job alive
    while the short ones return NULL, the same
    tolerate-the-tail contract as csv_permissive. In-row array
    access only: no Generate, one scan."""
    a = (
        t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.split("text", " ").alias("arr"),
            (F.lit(1) + F.col("doc_id") % 40)
            .cast("int")
            .alias("idx"),
        )
    )
    probe = a.select(
        F.expr("try_element_at(arr, idx)").alias("tok")
    )
    return probe.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("tok").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_hit"),
        F.coalesce(F.sum(F.length("tok")), F.lit(0))
        .cast("long")
        .alias("hit_len_sum"),
    )


# ---------------------------------------------------------------------------
# wave 99: crypto function surface — AES roundtrip with the padding
# arithmetic as the cross-engine certificate
# ---------------------------------------------------------------------------
@q(
    "sql_aes_roundtrip",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS pt_len,
           CAST((strlen(text) // 16 + 1) * 16 AS BIGINT) AS ct_len,
           TRUE AS roundtrip_ok
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def sql_aes_roundtrip(spark, sf):
    """``aes_encrypt``/``aes_decrypt`` — the at-rest column-encryption
    surface a compliance pipeline wraps around PII columns before the
    lake write. ECB + PKCS padding is the one DETERMINISTIC mode
    (GCM, the default, salts a random IV per call — hashing its
    output would be flaky by construction), so the face can gate two
    things exactly: the decrypt(encrypt(x)) == x roundtrip per
    document, and the PKCS#7 padded ciphertext length, whose closed
    form 16*(bytes DIV 16 + 1) the DuckDB twin (no AES at all)
    reproduces from byte-length arithmetic alone — the empty string
    pads to one full 16-byte block, an off-by-one the naive
    ceil(n/16) spelling gets wrong. Scale shape: map-only (one
    project over the scan, zero Exchange — the cipher runs inside
    whole-stage codegen JVM-side, never a Python hop), so it
    pipelines at scan speed on 100 TB. Spark ``octet_length`` ==
    DuckDB ``strlen`` (BYTES, not characters — multi-byte UTF-8
    documents diverge under length())."""
    key = "0123456789abcdef"
    d = t(spark, sf, "documents").filter(F.col("text").isNotNull())
    ct = F.expr(
        f"aes_encrypt(cast(text AS BINARY), '{key}', 'ECB', 'PKCS')"
    )
    pt = F.expr(
        f"cast(aes_decrypt(aes_encrypt(cast(text AS BINARY), '{key}', "
        f"'ECB', 'PKCS'), '{key}', 'ECB', 'PKCS') AS STRING)"
    )
    return d.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("pt_len"),
        F.octet_length(ct).cast("long").alias("ct_len"),
        (pt == F.col("text")).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# wave 99: lateral column aliases — the SELECT-list dependency chain
# ---------------------------------------------------------------------------
@q(
    "sql_lateral_alias",
    """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           cents * 2 AS cents_x2,
           cents_x2 - cents AS delta
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def sql_lateral_alias(spark, sf):
    """Lateral column aliases — a SELECT item referencing an alias
    defined EARLIER IN THE SAME LIST (`cents`, then `cents*2 AS
    cents_x2`, then `cents_x2 - cents`), the spreadsheet-style idiom
    Spark added in 3.4 and DuckDB supports natively, so the oracle is
    the literal same text. The semantic trap the face pins: lateral
    resolution must NOT re-evaluate the source or join the relation
    to itself per reference — Catalyst lowers each alias level to a
    stacked Project and whole-stage codegen fuses the stack into ONE
    generated stage (audit #85 asserts a single `*(1)` codegen stage,
    zero Exchange, zero joins), and the status filter still reaches
    the parquet scan below the aliased projection. Using the
    convenience costs nothing at 100 TB — the plan is one pipelined
    map over the scan."""
    return spark.sql(
        f"""
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               cents * 2 AS cents_x2,
               cents_x2 - cents AS delta
        FROM parquet.`{sf}/orders.parquet`
        WHERE o_orderstatus = 'F'
        """
    )


# ---------------------------------------------------------------------------
# wave 100: catalog column statistics — ANALYZE ... FOR COLUMNS read
# back and gated against the data they summarize
# ---------------------------------------------------------------------------
@q(
    "sql_column_stats",
    """
    SELECT 'o_custkey' AS col_name, 'min' AS stat,
           CAST(MIN(o_custkey) AS BIGINT) AS value FROM orders
    UNION ALL
    SELECT 'o_custkey', 'max', CAST(MAX(o_custkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_custkey', 'num_nulls',
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', 'num_nulls',
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', 'max_col_len',
           CAST(MAX(strlen(o_orderpriority)) AS BIGINT) FROM orders
    """,
)
def sql_column_stats(spark, sf):
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS, read back
    through DESCRIBE EXTENDED <table> <col> and gated against the
    data it summarizes — the stats feed join_cbo_reorder consumes
    blind, here checked for TRUTH: catalog min/max/num_nulls for a
    BIGINT key and num_nulls/max_col_len for a string column must
    equal the direct aggregates (the twin computes them from the
    rows). distinct_count is deliberately EXCLUDED from the hash:
    it is HyperLogLog-estimated with no one-sided guarantee — the
    freqItems/approx_top_k lesson, applied to the catalog itself.
    The stats arrive as catalog STRINGS, so the face casts them back
    to BIGINT (a lossless trip only for integral stats — min/max of
    a DOUBLE column would round-trip through decimal formatting,
    another reason the face pins the integer column). Managed table
    carries the app-suffixed name + warehouse sweep + finally-DROP
    (sql_catalog_table discipline); output rows are collected
    literals, so the DROP cannot race the driver's collect."""
    import re as _re
    import shutil as _shutil

    sid = _re.sub(
        r"[^0-9a-zA-Z]", "_", spark.sparkContext.applicationId
    )[-12:]
    name = f"spark_graft_colstats_{sid}_{next(_DDL_COUNTER)}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    _shutil.rmtree(f"{wh}/{name.lower()}", ignore_errors=True)
    try:
        spark.sql(
            f"""
            CREATE TABLE {name} USING PARQUET
            AS SELECT o_custkey, o_orderpriority
            FROM parquet.`{sf}/orders.parquet`
            """
        )
        if spark.table(name).count() == 0:
            # empty corpus: the SQL twin's aggregates over zero rows
            # are NULL for min/max/max_len and 0 for the null counts;
            # the catalog's empty-table stats encode the same facts
            # but with engine-specific NULL spellings — short-circuit
            # to the twin semantics (stat_api_crosstab discipline)
            rows = [
                ("o_custkey", "min", None),
                ("o_custkey", "max", None),
                ("o_custkey", "num_nulls", 0),
                ("o_orderpriority", "num_nulls", 0),
                ("o_orderpriority", "max_col_len", None),
            ]
            return spark.createDataFrame(
                rows, "col_name string, stat string, value bigint"
            )
        spark.sql(
            f"ANALYZE TABLE {name} COMPUTE STATISTICS "
            f"FOR COLUMNS o_custkey, o_orderpriority"
        )

        def col_stats(col):
            return {
                r["info_name"]: r["info_value"]
                for r in spark.sql(
                    f"DESCRIBE EXTENDED {name} {col}"
                ).collect()
            }

        ck, pr = col_stats("o_custkey"), col_stats("o_orderpriority")
        rows = [
            ("o_custkey", "min", int(ck["min"])),
            ("o_custkey", "max", int(ck["max"])),
            ("o_custkey", "num_nulls", int(ck["num_nulls"])),
            ("o_orderpriority", "num_nulls", int(pr["num_nulls"])),
            ("o_orderpriority", "max_col_len", int(pr["max_col_len"])),
        ]
        return spark.createDataFrame(
            rows, "col_name string, stat string, value bigint"
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


# ---------------------------------------------------------------------------
# wave 101: pandas-on-Spark rolling — positional window through the
# pandas API, compiled to one Catalyst Window
# ---------------------------------------------------------------------------
@q(
    "ps_api_rolling",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             COALESCE(SUM(CAST(round(value * 100) AS BIGINT)), 0) AS cents
      FROM events GROUP BY 1)
    SELECT day,
           round(AVG(CAST(cents AS DOUBLE)) OVER (
             ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             6) + 0 AS mavg
    FROM daily
    """,
)
def ps_api_rolling(spark, sf):
    """pandas-on-Spark ``rolling(3).mean()`` — the time-series idiom
    a pandas user types verbatim, here proven to compile to ONE
    Catalyst Window (rows-frame AVG ordered by the post-sort natural
    order — zero Python nodes, audit #87) over the day-indexed daily
    rollup. The determinism contract the face documents: ps rolling
    is POSITIONAL (pandas semantics — exactly 3 physical rows, not 3
    calendar days; win_trailing_range is the calendar-RANGE
    counterpart), and position is defined by the index, so the
    pipeline sets a UNIQUE sorted index first — on a non-unique or
    unsorted index the natural order is partition-dependent and
    nothing would be hashable. Daily cents are exact BIGINTs, the
    3-value frame divides once, rounds to 6, and `+ 0` normalizes
    IEEE -0.0 (stat_corr). Scale shape: the pre-agg shuffles once on
    day; the global-ordered window is the documented
    single-partition cost over the BOUNDED daily relation, not the
    corpus."""
    import pyspark.pandas as ps

    daily = (
        t(spark, sf, "events")
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day")
        )
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("value") * 100).cast("long")),
                F.lit(0),
            ).alias("cents")
        )
    )
    pdf = ps.DataFrame(daily).set_index("day").sort_index()
    roll = (
        pdf["cents"].astype("double").rolling(3, min_periods=1).mean()
    )
    out = roll.to_frame("mavg_raw").to_spark(index_col="day")
    return out.select(
        "day",
        (F.round(F.col("mavg_raw"), 6) + F.lit(0.0)).alias("mavg"),
    )


# ---------------------------------------------------------------------------
# wave 103: semantic-equivalence certificate — three spellings, one
# canonical plan
# ---------------------------------------------------------------------------
@q(
    "sql_semantic_equiv",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS api_eq_sql,
           FALSE AS pipe_analyzed_eq,
           TRUE AS pipe_optimized_eq
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_semantic_equiv(spark, sf):
    """``sameSemantics``/``semanticHash`` — the planner's own
    plan-fingerprint APIs, pinned at BOTH levels they actually
    operate on. The same query is spelled three ways (DataFrame API,
    SQL text, Spark-4 pipe syntax): API vs SQL are sameSemantics-
    equal, but API vs PIPE is contractually FALSE — sameSemantics
    canonicalizes the ANALYZED plan, and pipe's trailing |> SELECT
    survives analysis as an extra Project that only the OPTIMIZER
    collapses (the canonicalized optimized plans are measured
    identical, the third boolean). That split is the face's real
    content: sameSemantics is the cheap pre-optimization test Spark's
    plan cache runs, so result-reuse layers keyed on it MISS across
    dialects that optimize identically — budget cache hit rates
    accordingly. All three booleans ride the hash; values come from
    the API spelling. semanticHash values themselves are
    version-dependent and never hashed."""
    api = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    t(spark, sf, "orders").createOrReplaceTempView("sem_orders")
    sql_df = spark.sql(
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM sem_orders WHERE o_orderstatus = 'F' "
        "GROUP BY o_orderpriority"
    )
    pipe_df = spark.sql(
        """
        FROM sem_orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n
        """
    )
    eq_sql = api.sameSemantics(sql_df)
    eq_pipe_analyzed = api.sameSemantics(pipe_df)
    eq_pipe_opt = (
        api._jdf.queryExecution().optimizedPlan().canonicalized()
        .toString()
        == pipe_df._jdf.queryExecution().optimizedPlan()
        .canonicalized()
        .toString()
    )
    return api.select(
        "o_orderpriority",
        "n",
        F.lit(bool(eq_sql)).alias("api_eq_sql"),
        F.lit(bool(eq_pipe_analyzed)).alias("pipe_analyzed_eq"),
        F.lit(bool(eq_pipe_opt)).alias("pipe_optimized_eq"),
    )


# ---------------------------------------------------------------------------
# wave 103: execution-mode invariance — codegen / vectorized reader /
# AQE off must not change one bit
# ---------------------------------------------------------------------------
@q(
    "sql_exec_invariance",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS rev_cents,
           TRUE AS codegen_off_eq,
           TRUE AS vectorized_off_eq,
           TRUE AS aqe_off_eq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_exec_invariance(spark, sf):
    """Execution-mode INVARIANCE certificate: the same aggregate
    re-executed under three degraded engine modes — whole-stage
    codegen off (interpreted expression evaluation), the vectorized
    parquet reader off (row-at-a-time scan), and AQE off (static
    plans) — must return bit-identical rows, with the three equality
    booleans riding the hash. These are exactly the fallback paths a
    production 100-TB job silently takes (codegen falls back past
    the 64KB JVM method limit / wide schemas; the vectorized reader
    falls back on nested types and version skew; AQE is disabled by
    some resource managers), so 'fast path == slow path' is a
    correctness contract, not an optimization detail — and the
    integer-cents discipline is what makes bitwise equality the
    right test (float SUM would legitimately differ under different
    partial-agg trees). Eager, conf-restoring, checkpointed
    (join_aqe_bhj_convert discipline)."""
    from ..operators.dedup import parquet_checkpoint

    def run():
        return sorted(
            (r["l_returnflag"], r["n"], r["rev_cents"])
            for r in t(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                )
                .cast("long")
                .alias("rev_cents"),
            )
            .collect()
        )

    base = run()
    modes = {
        "codegen_off_eq": ("spark.sql.codegen.wholeStage", "false"),
        "vectorized_off_eq": (
            "spark.sql.parquet.enableVectorizedReader",
            "false",
        ),
        "aqe_off_eq": ("spark.sql.adaptive.enabled", "false"),
    }
    flags = {}
    for label, (key, off) in modes.items():
        prev = spark.conf.get(key)
        spark.conf.set(key, off)
        try:
            flags[label] = run() == base
        finally:
            spark.conf.set(key, prev)
    rows = [
        (rf, n, rc, flags["codegen_off_eq"],
         flags["vectorized_off_eq"], flags["aqe_off_eq"])
        for rf, n, rc in base
    ]
    out = spark.createDataFrame(
        rows,
        "l_returnflag string, n bigint, rev_cents bigint, "
        "codegen_off_eq boolean, vectorized_off_eq boolean, "
        "aqe_off_eq boolean",
    )
    return parquet_checkpoint(out, "exec_invariance_out")


# ---------------------------------------------------------------------------
# wave 103: try_* aggregates — the ANSI-safe aggregation rung
# ---------------------------------------------------------------------------
@q(
    "sql_try_agg",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents,
           round(AVG(CAST(round(o_totalprice * 100) AS BIGINT)), 6) + 0
             AS avg_cents,
           TRUE AS overflow_is_null
    FROM orders
    """,
)
def sql_try_agg(spark, sf):
    """``try_sum`` / ``try_avg`` — the AGGREGATE rung of the try_*
    tolerance ladder (sql_try_arith covers scalar arithmetic,
    sql_try_cast parsing, sql_try_element_at lookup): under ANSI
    mode a single overflowing partial kills the whole job, and
    try_sum instead degrades the answer to NULL — the right contract
    for a speculative metric over 10^12 rows where one poisoned
    value must not cost the run. On clean integer-cents input the
    try_ forms must equal the plain SUM/AVG bit-for-bit (that
    equality is the hashed value), and the face also drives try_sum
    into a REAL BIGINT overflow (two Long.MaxValue rows) and rides
    `result IS NULL` as the certificate — the DuckDB twin cannot
    overflow (native HUGEINT accumulation) so the boolean is the
    gated literal, the scan_agg_pushdown one-sided discipline.
    Same plan shape as the plain aggregate: partial try_sum before
    the shuffle, one scan."""
    o = t(spark, sf, "orders")
    cents_col = F.round(F.col("o_totalprice") * 100).cast("long")
    ov = (
        spark.range(0, 2)
        .agg(
            F.expr("try_sum(9223372036854775807)").alias("s")
        )
        .collect()[0]["s"]
    )
    return o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "try_sum(CAST(round(o_totalprice * 100) AS BIGINT))"
        )
        .cast("long")
        .alias("sum_cents"),
        (
            F.round(
                F.expr(
                    "try_avg(CAST(round(o_totalprice * 100) AS BIGINT))"
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("avg_cents"),
    ).select(
        "n",
        "sum_cents",
        "avg_cents",
        F.lit(ov is None).alias("overflow_is_null"),
    )


# ---------------------------------------------------------------------------
# wave 106: correlated scalar subquery — decorrelated to one join,
# never a per-row probe
# ---------------------------------------------------------------------------
@q(
    "sql_scalar_subquery",
    """
    SELECT c.c_custkey,
           (SELECT CAST(MAX(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT)
            FROM orders o WHERE o.o_custkey = c.c_custkey)
             AS max_order_cents
    FROM customer c
    """,
)
def sql_scalar_subquery(spark, sf):
    """Correlated SCALAR subquery — the third decorrelation face
    (join_exists_subq: EXISTS/NOT EXISTS; join_lateral: correlated
    LATERAL): each customer's maximum order value written as the
    textbook per-row subquery, which Catalyst must rewrite into ONE
    aggregate-below-left-outer-join — executed naively it is a full
    orders scan PER CUSTOMER, the O(n*m) spelling that kills any
    100-TB run; decorrelated it is one orders aggregate and one
    join. The audit pins the rewrite: exactly one join in the
    executed plan, an Aggregate on the orders side, and zero
    remaining subquery-execution nodes. The customer-without-orders
    row keeps the scalar contract (NULL, not a dropped row — LEFT
    outer, not inner) and the MAX-of-empty NULL is identical in both
    engines. The SQL text is engine-portable verbatim; the oracle
    runs the same string."""
    t(spark, sf, "orders").createOrReplaceTempView("ssq_orders")
    t(spark, sf, "customer").createOrReplaceTempView("ssq_customer")
    return spark.sql(
        """
        SELECT c.c_custkey,
               (SELECT CAST(MAX(CAST(round(o.o_totalprice * 100)
                                     AS BIGINT)) AS BIGINT)
                FROM ssq_orders o WHERE o.o_custkey = c.c_custkey)
                 AS max_order_cents
        FROM ssq_customer c
        """
    )


# ---------------------------------------------------------------------------
# wave 107: SQL PIVOT clause — the dialect spelling of the wide
# reshape, and its multi-measure naming contract
# ---------------------------------------------------------------------------
@q(
    "sql_pivot_clause",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                AS BIGINT) AS F_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS F_cents,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END)
                AS BIGINT) AS O_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS O_cents,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END)
                AS BIGINT) AS P_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS P_cents
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_pivot_clause(spark, sf):
    """The SQL-text ``PIVOT`` clause (`FROM ... PIVOT (aggs FOR col
    IN (...))`) — the dialect spelling of what pivot_events /
    pivot_multi_agg do through the DataFrame API, worth its own face
    because the CLAUSE carries two contracts the API doesn't
    surface: the IN list is MANDATORY and literal (Spark never
    infers pivot values in SQL — the eager-distinct scan the API's
    values-less pivot hides is simply unavailable, which is the
    scale-safe default), and multi-measure columns are named
    {value}_{alias} (the pivot_multi_agg naming lesson, now pinned
    from the SQL side). Catalyst lowers the clause to the same
    single-scan two-phase conditional aggregate as the twin's
    CASE-WHEN spelling — pivoting is syntax, never a plan shape.
    Missing (priority, status) cells surface as NULL (SUM over an
    empty set), identical in both engines."""
    t(spark, sf, "orders").createOrReplaceTempView("pv_orders")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT o_orderpriority, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM pv_orders)
        PIVOT (
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(cents) AS BIGINT) AS cents
          FOR o_orderstatus IN ('F', 'O', 'P'))
        """
    )


# ---------------------------------------------------------------------------
# wave 107: quantified LIKE — LIKE ANY / LIKE ALL predicate lists
# ---------------------------------------------------------------------------
@q(
    "sql_like_quantified",
    """
    SELECT p_partkey, p_name,
           (p_name LIKE '%green%' OR p_name LIKE '%blue%') AS any_color,
           (p_name LIKE '%s%' AND p_name LIKE '% %') AS all_marks,
           NOT (p_name LIKE '%a%' OR p_name LIKE '%e%') AS no_vowel_ae
    FROM part
    """,
)
def sql_like_quantified(spark, sf):
    """Quantified LIKE predicates — ``LIKE ANY (...)`` / ``LIKE ALL
    (...)`` / ``NOT LIKE ANY`` over literal pattern lists, the
    dialect surface a migration from Teradata/Snowflake SQL hits
    first. DuckDB has no quantified LIKE at all, so the twin is the
    expanded OR/AND spelling — which is also exactly what Catalyst
    lowers the quantified forms to (LikeAny/LikeAll expressions fold
    to the disjunction/conjunction at analysis; the plan is the same
    map-only scan either way, pinned by the sql_any_all precedent
    where the QUANTIFIED-SUBQUERY form, by contrast, does not parse
    at all — lists yes, subqueries no, the asymmetry this face
    documents). Pattern semantics (%, _) are common SQL; no regex
    dialect divergence can enter."""
    t(spark, sf, "part").createOrReplaceTempView("lq_part")
    return spark.sql(
        """
        SELECT p_partkey, p_name,
               p_name LIKE ANY ('%green%', '%blue%') AS any_color,
               p_name LIKE ALL ('%s%', '% %') AS all_marks,
               NOT (p_name LIKE ANY ('%a%', '%e%')) AS no_vowel_ae
        FROM lq_part
        """
    )


# ---------------------------------------------------------------------------
# wave 110: ordinal references — GROUP BY 1 / ORDER BY 2 position
# binding
# ---------------------------------------------------------------------------
@q(
    "sql_ordinal_refs",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders
    GROUP BY 1
    """,
)
def sql_ordinal_refs(spark, sf):
    """Ordinal (positional) references — ``GROUP BY 1``, ``ORDER BY
    2 DESC`` — the interactive-SQL idiom both engines support and
    every BI tool emits. The contract pinned: ordinals bind to the
    SELECT-list POSITION at analysis time (spark.sql.groupByOrdinal
    / orderByOrdinal, default on), so they survive expression
    changes but silently REBIND when columns are reordered — the
    docstring's migration warning; an ordinal referencing an
    aggregate expression is an analysis error, not a group-by-
    aggregate (the classic footgun, kept out of the face). The
    ORDER BY inside the face is presentation-only (the driver's
    hash is order-insensitive) — it exercises the parse path while
    the twin omits it, proving ordering is value-neutral. Lowers to
    the identical plan as named references: syntax only."""
    t(spark, sf, "orders").createOrReplaceTempView("ord_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM ord_orders
        GROUP BY 1
        ORDER BY 2 DESC
        """
    )


# ---------------------------------------------------------------------------
# wave 112: LIMIT ... OFFSET pagination under a total order
# ---------------------------------------------------------------------------
@q(
    "sql_offset_fetch",
    """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    ORDER BY cents DESC, o_orderkey
    LIMIT 20 OFFSET 30
    """,
)
def sql_offset_fetch(spark, sf):
    """Keyless pagination — ``ORDER BY ... LIMIT 20 OFFSET 30``, the
    page-2+ query every API backend emits. Two contracts pinned:
    (1) pagination is only deterministic under a TOTAL order, so the
    sort carries o_orderkey as the tiebreak after the cents measure —
    without it, ties straddling the page boundary make page
    membership run-dependent on BOTH engines (the face would be
    flaky, the production bug would be duplicated/skipped rows across
    pages); (2) Spark executes limit+offset as a single
    TakeOrderedAndProject (limit = offset + fetch pushed to each
    partition, offset applied once at the gather) — a top-50
    per-partition heap, NEVER a global sort, so page depth bounds
    memory, not data size (the test pins TakeOrderedAndProject and
    the absence of a global Sort/Exchange-range). Deep OFFSET is
    still O(offset) work per page — the docstring's production note:
    keyset pagination (WHERE key > last_seen) is the 100-TB answer;
    this face is the standard-SQL surface."""
    t(spark, sf, "orders").createOrReplaceTempView("pg_orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM pg_orders
        ORDER BY cents DESC, o_orderkey
        LIMIT 20 OFFSET 30
        """
    )


# ---------------------------------------------------------------------------
# wave 115: pandas-on-Spark resample('D') — calendar binning through
# the pandas front end
# ---------------------------------------------------------------------------
@q(
    "ps_api_resample",
    """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    GROUP BY 1
    """,
)
def ps_api_resample(spark, sf):
    """pandas-on-Spark ``resample('D').sum()`` — the calendar
    downsampling idiom (ps_api_rolling is the POSITIONAL window;
    this is the CALENDAR bin), typed exactly as a pandas user would
    with ``on=`` a timestamp column, compiled to Catalyst. Bin
    labels come back as midnight timestamps and are emitted as ISO
    DATE STRINGS (the events_gapfill rule — DATE-typed cells hash
    differently across engine/pandas bridges). The density caveat is
    the documented contract: pandas resample EMITS empty bins (sum
    0) while a plain GROUP BY day does not, so the twin is only
    day-for-day equal because the synthetic calendar is DENSE — the
    replay test asserts density, making the assumption explicit
    instead of silent (the granger lesson); a gap-bearing corpus
    needs the events_gapfill spine face, which is exactly why both
    exist. Empty corpus short-circuits to a schema-stable empty
    frame (ps resample raises on an empty DatetimeIndex). Scale
    shape: one shuffle on the day bin, same as the bare groupBy —
    the front end adds zero physical cost (no Python nodes in the
    plan, audit-checked via the ps_api_groupby precedent)."""
    import pyspark.pandas as ps

    e = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    if e.limit(1).count() == 0:
        return spark.createDataFrame([], "day string, cents long")
    pdf = ps.DataFrame(e)
    res = pdf.resample("D", on=pdf["ts"]).sum()
    out = res.to_spark(index_col="day_ts")
    return out.select(
        F.date_format(F.col("day_ts"), "yyyy-MM-dd").alias("day"),
        F.col("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# wave 116: NULLS FIRST / NULLS LAST — explicit null placement under
# a total order, cross-engine
# ---------------------------------------------------------------------------
@q(
    "sql_nulls_ordering",
    """
    WITH v AS (
      SELECT event_id, NULLIF(user_id % 8, 3) AS k
      FROM events),
    r AS (
      SELECT event_id, k,
             ROW_NUMBER() OVER (ORDER BY k ASC NULLS FIRST, event_id)
               AS rn_nf,
             ROW_NUMBER() OVER (ORDER BY k ASC NULLS LAST, event_id)
               AS rn_nl
      FROM v)
    SELECT event_id, k, CAST(rn_nf AS BIGINT) AS rn_nf,
           CAST(rn_nl AS BIGINT) AS rn_nl
    FROM r WHERE rn_nf <= 25 OR rn_nl <= 25
    """,
)
def sql_nulls_ordering(spark, sf):
    """Explicit ``NULLS FIRST`` / ``NULLS LAST`` — the ordering
    clause that MUST be spelled out in any cross-engine SQL, because
    the defaults disagree: Spark places NULLs FIRST on ASC while
    DuckDB (and Postgres) place them LAST, so the same unadorned
    ORDER BY paginates differently on each engine — the classic
    silent-drift bug in a keyset-paginated API backed by two stores.
    The face fabricates a NULL key (the join_null_safe NULLIF
    discipline — the synthetic tables have no NULL keys), ranks the
    corpus under BOTH explicit placements with event_id as the
    total-order tiebreak, and emits the head of each ordering: the
    NULL-keyed rows must occupy the first ranks of rn_nf and be
    absent from the rn_nl head (pinned in tests) — and since both
    engines evaluate the SAME explicit spellings, hash equality
    proves the clause, not the default, decided placement. Scale
    note: the global ROW_NUMBER is the documented single-partition
    window; production pages with keyset predicates instead
    (sql_offset_fetch's docstring), which inherit the same
    explicit-NULLS requirement."""
    t(spark, sf, "events").createOrReplaceTempView("no_events")
    return spark.sql(
        """
        WITH v AS (
          SELECT event_id, NULLIF(user_id % 8, 3) AS k
          FROM no_events),
        r AS (
          SELECT event_id, k,
                 ROW_NUMBER() OVER
                   (ORDER BY k ASC NULLS FIRST, event_id) AS rn_nf,
                 ROW_NUMBER() OVER
                   (ORDER BY k ASC NULLS LAST, event_id) AS rn_nl
          FROM v)
        SELECT event_id, k, CAST(rn_nf AS BIGINT) AS rn_nf,
               CAST(rn_nl AS BIGINT) AS rn_nl
        FROM r WHERE rn_nf <= 25 OR rn_nl <= 25
        """
    )


# ---------------------------------------------------------------------------
# wave 147: DISTINCT ON dialect pair — rank-filter spelling in Spark
# ---------------------------------------------------------------------------
@q(
    "sql_distinct_on",
    """
    SELECT DISTINCT ON (user_id)
           user_id,
           event_type AS last_type,
           CAST(round(value * 100) AS BIGINT) AS last_cents,
           CAST(epoch_us(ts) AS BIGINT) AS last_us
    FROM events
    WHERE user_id IS NOT NULL AND value IS NOT NULL
    ORDER BY user_id, ts DESC, event_id DESC
    """,
)
def sql_distinct_on(spark, sf):
    """The DISTINCT ON dialect pair — latest event per user. DuckDB
    (following Postgres) spells keep-first-per-group as DISTINCT ON
    (key) ... ORDER BY key, ts DESC; Spark has NO DISTINCT ON, and
    the faithful translation is the rank-filter idiom: row_number()
    over (PARTITION BY key ORDER BY ts DESC, event_id DESC) = 1.
    The tiebreak column is NOT optional in the translation: DuckDB's
    DISTINCT ON keeps the first row of the sort, so any ts tie
    resolved differently across engines breaks value equality — the
    (ts, event_id) total order makes the kept row engine-unique.
    Spark 4 compiles the rank filter to WindowGroupLimit (per-
    partition top-1 BEFORE the shuffle, pinned in the plan test) —
    contrast crawl_latest, which spells the SAME semantics as a
    max_by(struct) aggregate and plans as a two-phase
    SortAggregate: rank-filter wins when the full row set per key
    is wide (k columns ride the limit, not the agg buffer), max_by
    wins when ties don't need total-order control. At 100 TB this
    is a single shuffle on user_id with map-side partial limit."""
    e = t(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.round(F.col("value") * 100)
            .cast("long")
            .alias("last_cents"),
            F.expr("unix_micros(cast(ts AS TIMESTAMP))")
            .cast("long")
            .alias("last_us"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# wave 149: pandas-on-Spark pivot_table — the ps reshape quadrant
# ---------------------------------------------------------------------------
@q(
    "ps_api_pivot_table",
    """
    WITH lab AS (
      SELECT event_type,
             CAST((epoch_us(ts) // 1000000 // 86400 + 4) % 7
                  AS BIGINT) AS dow,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
    SELECT event_type,
           CAST(SUM(cents) FILTER (WHERE dow = 0) AS BIGINT) AS d0,
           CAST(SUM(cents) FILTER (WHERE dow = 1) AS BIGINT) AS d1,
           CAST(SUM(cents) FILTER (WHERE dow = 2) AS BIGINT) AS d2,
           CAST(SUM(cents) FILTER (WHERE dow = 3) AS BIGINT) AS d3,
           CAST(SUM(cents) FILTER (WHERE dow = 4) AS BIGINT) AS d4,
           CAST(SUM(cents) FILTER (WHERE dow = 5) AS BIGINT) AS d5,
           CAST(SUM(cents) FILTER (WHERE dow = 6) AS BIGINT) AS d6
    FROM lab GROUP BY event_type
    """,
)
def ps_api_pivot_table(spark, sf):
    """pandas-on-Spark ``pivot_table`` — the RESHAPE quadrant of the
    ps surface (ps_api_groupby covers split-apply-combine,
    ps_api_rolling/resample the window quadrants): type x weekday
    cents, aggfunc='sum', compiled by ps into the same
    pivot-aggregate Catalyst plan the DataFrame API's
    groupBy().pivot() makes. API contracts measured, not assumed:
    `index` MUST be a list (a bare column name throws TypeError,
    unlike pandas), the timestamp column cast .astype('int64')
    yields epoch SECONDS (Spark cast semantics, not pandas' ns —
    dow = secs//86400 + 4 mod 7 accordingly, mirrored in the twin
    as epoch_us//1e6), and the pivoted columns come back NAMED BY
    VALUE with float rendering ('0.0'..'6.0'), so the face
    re-aliases them to d0..d6 positionally-independently and fills
    whole-column absence (a weekday with zero rows pivots to NO
    column, where SQL's conditional SUM FILTER yields NULL — the
    same fact spelled two ways, reconciled to NULL). One scan, one
    pivot shuffle."""
    import pyspark.pandas as ps

    with ps.option_context(
        "compute.default_index_type", "distributed"
    ):
        pdf = ps.read_parquet(f"{sf}/events.parquet")
        pdf = pdf[pdf["ts"].notnull() & pdf["value"].notnull()]
        pdf = pdf.assign(
            cents=(pdf["value"] * 100).round(0).astype("int64"),
            dow=((pdf["ts"].astype("int64") // 86400 + 4) % 7),
        )
        pv = pdf.pivot_table(
            index=["event_type"],
            columns="dow",
            values="cents",
            aggfunc="sum",
        )
        out = pv.reset_index().to_spark()
    have = set(out.columns)
    cols = [F.col("event_type")]
    for k in range(7):
        name = f"{float(k)}"
        if name in have:
            cols.append(F.col(f"`{name}`").cast("long").alias(f"d{k}"))
        else:
            cols.append(F.lit(None).cast("long").alias(f"d{k}"))
    return out.select(*cols)


# ---------------------------------------------------------------------------
# wave 172: QUALIFY dialect pair — window filter without a subquery
# ---------------------------------------------------------------------------
@q(
    "sql_qualify",
    """
    SELECT event_type, event_id,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
    WHERE value IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY round(value * 100) DESC,
                                        event_id) <= 3
    ORDER BY event_type, cents DESC, event_id
    """,
)
def sql_qualify(spark, sf):
    """The QUALIFY dialect pair — top-3 events per type by value.
    DuckDB (following Snowflake/BigQuery/Teradata) filters on a
    window function directly with QUALIFY; Spark 4 does NOT parse
    QUALIFY (measured: PARSE_SYNTAX_ERROR), so the faithful
    translation is the subquery-then-filter spelling — compute the
    row_number in a derived relation, filter rn <= 3 outside (the
    rank-filter idiom sql_distinct_on uses for DISTINCT ON; the
    two dialect gaps share one Spark-side answer). The translation
    preserves the evaluation-order contract QUALIFY encodes: the
    WHERE runs BEFORE the window, the QUALIFY after — inlining the
    rank predicate into the same WHERE would be semantically
    impossible, which is why the keyword exists. Spark compiles
    the subquery spelling to WindowGroupLimit exactly as it does
    for DISTINCT ON (per-partition top-k before the shuffle); the
    (value DESC, event_id) total order makes the kept set
    engine-unique. One scan, one partitioned window."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(
        F.round(F.col("value") * 100).cast("long").desc(),
        F.col("event_id"),
    )
    return (
        e.select(
            "event_type",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("event_type", F.desc("cents"), "event_id")
    )


# ---------------------------------------------------------------------------
# wave 178: global temp views — the cross-session catalog scope
# ---------------------------------------------------------------------------
@q(
    "sql_global_temp_view",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents,
           TRUE AS sibling_sees_global,
           TRUE AS sibling_blind_to_local
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def sql_global_temp_view(spark, sf):
    """GLOBAL temp views — the third catalog scope (a temp view
    dies with its session; a managed table persists in the
    warehouse; a GLOBAL temp view lives in the reserved
    `global_temp` database for the lifetime of the APPLICATION,
    visible to every session sharing the SparkContext — the scope
    notebook platforms use to pass staged relations between
    sessions without a table write). Measured, not assumed: a
    sibling session (newSession() — same context, fresh session
    state) CAN read global_temp.<name> and CANNOT see the plain
    temp view of the same data — both facts ride the hash as the
    agg_hll_native gated-boolean discipline (the twin asserts the
    same aggregate over the base data plus the two expected
    constants; the session semantics are Spark-side facts DuckDB
    has no notion of). Cleanup is in a finally: global views
    outlive the face otherwise (the sql_catalog_table
    lesson applied to the application scope)."""
    base = t(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    name = "gtv_probe"
    base.createOrReplaceGlobalTempView(name)
    base.createOrReplaceTempView("ltv_probe")
    try:
        sib = spark.newSession()
        g = sib.sql(
            f"SELECT count(*) AS n, sum(cast(round(o_totalprice"
            f" * 100) AS BIGINT)) AS c FROM global_temp.{name}"
        ).collect()[0]
        sees_global = g["n"] is not None
        try:
            sib.sql("SELECT count(*) FROM ltv_probe").collect()
            blind_local = False
        except Exception:
            blind_local = True
        return base.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            )
            .cast("long")
            .alias("total_cents"),
        ).select(
            "n_rows",
            "total_cents",
            F.lit(bool(sees_global)).alias("sibling_sees_global"),
            F.lit(bool(blind_local)).alias(
                "sibling_blind_to_local"
            ),
        )
    finally:
        spark.catalog.dropGlobalTempView(name)
        spark.catalog.dropTempView("ltv_probe")


# ---------------------------------------------------------------------------
# wave 182: DISTRIBUTE BY / SORT BY — the physical-layout clauses
# ---------------------------------------------------------------------------
@q(
    "sql_distribute_sort",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           TRUE AS repartitioned,
           TRUE AS locally_sorted
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def sql_distribute_sort(spark, sf):
    """DISTRIBUTE BY / SORT BY — Spark's physical-LAYOUT clauses
    (ORDER BY promises a global order and pays a range-partitioned
    sort; DISTRIBUTE BY hashes rows to partitions and SORT BY
    orders only WITHIN each — the layout every partitioned writer
    and every merge-join-friendly staging step wants, at a
    fraction of the cost). DuckDB has no such clauses (a
    single-node engine has no partitions to lay out), so the
    hashed answer is the layout-INDEPENDENT aggregate — the
    semantic no-op property is the point: distributing and
    locally sorting must change no values — and the two layout
    facts ride the hash as Spark-side plan certificates: the
    executed plan contains a hash RepartitionByExpression /
    Exchange on event_type and a NON-global sort (the sort node
    renders as `Sort [...], false, 0` — the false IS the global
    flag; an ORDER BY spelling would be rangepartitioning — the
    sql_offset_fetch contrast). The
    measured distinction the docstring exists for: CLUSTER BY =
    DISTRIBUTE BY + SORT BY on the same keys."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    laid = e.repartition(F.col("event_type")).sortWithinPartitions(
        "event_type", "event_id"
    )
    plan = laid._jdf.queryExecution().executedPlan().toString()
    repart = (
        "hashpartitioning" in plan and "event_type" in plan
    )
    import re as _re

    # executed-plan rendering: a local sort prints as
    # `Sort [keys], false, 0` (the boolean IS the global flag)
    local_sort = bool(_re.search(r"Sort \[.*\], false, ", plan))
    return (
        laid.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .select(
            "event_type",
            "n",
            "sum_cents",
            F.lit(bool(repart)).alias("repartitioned"),
            F.lit(bool(local_sort)).alias("locally_sorted"),
        )
        .orderBy("event_type")
    )
