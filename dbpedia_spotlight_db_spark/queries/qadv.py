"""Wave-21 faces: the remaining engine-API surfaces (correlated
LATERAL subqueries, bitmap-index aggregation) and the statistics /
featurization operators a training-data pipeline still lacked —
two-sample Kolmogorov-Smirnov drift, running distinct-user counts,
dyadic-decay trailing EWMA, Pareto-frontier (skyline) selection,
PMI collocation mining, and the hashing-trick featurizer.

Same contract as the sibling query modules: every key is a Spark
callable plus a DuckDB twin with IDENTICAL column names and values.
Engine-parity rules inherited from the earlier waves: monetary
doubles become exact integer cents before any aggregation
(common.cents); log-scores quantize each term to integer micros
before comparison (the kg_adamic_adar precedent); any division whose
denominator can be 0 on a degenerate input is CASE-guarded to NULL
on BOTH engines (Spark ANSI throws DIVIDE_BY_ZERO where DuckDB
yields inf — the drift_chi2 precedent); md5 hex is lowercase on both
engines so hex-prefix arithmetic is portable.
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


_EPOCH = "2024-01-01"


# ---------------------------------------------------------------------------
# correlated LATERAL subquery (top-k-per-row via the engine's lateral join)
# ---------------------------------------------------------------------------
@q(
    "join_lateral",
    """
    SELECT c.c_custkey, l.o_orderkey, l.price_cents
    FROM customer c,
    LATERAL (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
      LIMIT 2
    ) l
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def join_lateral(spark, sf):
    """Correlated LATERAL subquery face (Spark >= 3.2 lateral join):
    the two most recent orders per BUILDING-segment customer, where
    the per-customer LIMIT lives INSIDE the lateral subquery instead
    of a window + filter — the SQL-standard top-k-per-row idiom that
    ports directly from Postgres/DuckDB. Catalyst decorrelates the
    lateral into a window-ranked join (same physical family as
    win_topk), so the declarative form costs nothing over the
    hand-written window. Determinism: the ORDER BY carries the unique
    o_orderkey as a tiebreak, so the LIMIT-2 cut is engine-stable;
    customers with no orders drop out on both engines (inner lateral).
    Scale shape: one shuffle on the correlation key (o_custkey) and a
    per-key WindowGroupLimit — never a global sort."""
    t(spark, sf, "customer").createOrReplaceTempView("lat_cust")
    t(spark, sf, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.price_cents
        FROM lat_cust c,
        LATERAL (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
          FROM lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
          LIMIT 2
        ) l
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


# ---------------------------------------------------------------------------
# bitmap-index distinct aggregation (exact COUNT DISTINCT without a
# two-level shuffle of the raw keys)
# ---------------------------------------------------------------------------
@q(
    "agg_bitmap_distinct",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE user_id IS NOT NULL
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark, sf):
    """Exact distinct-user counts per event type computed through
    Spark 3.5's bitmap aggregate family instead of COUNT(DISTINCT):
    each user_id maps to (bitmap_bucket_number, bitmap_bit_position),
    a per-(type, bucket) bitmap_construct_agg ORs the positions into
    a 32768-bit bitmap, and the per-type SUM of bitmap_counts is the
    exact distinct count. Why it matters at 100 TB: COUNT(DISTINCT)
    shuffles every raw (type, user_id) pair; the bitmap form
    map-side-combines into at most |types| x |id-range|/32768 fixed
    4 KB buffers — the classic bitmap-index rollup, and the partial
    bitmaps are mergeable across days/partitions for incremental
    rollups (the same reason warehouses store them). The DuckDB twin
    is the semantic definition (exact COUNT DISTINCT), so a green
    hash proves the bitmap path end to end."""
    e = t(spark, sf, "events").filter(F.col("user_id").isNotNull())
    bm = (
        e.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bk"),
            F.expr("bitmap_bit_position(user_id)").alias("bp"),
        )
        .groupBy("event_type", "bk")
        .agg(F.expr("bitmap_construct_agg(bp)").alias("bm"))
    )
    return bm.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users")
    )


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov drift statistic, exact integer ECDFs
# ---------------------------------------------------------------------------
@q(
    "stat_ks",
    """
    WITH lab AS (
      SELECT event_type, value,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ina
      FROM events WHERE value IS NOT NULL),
    n AS (
      SELECT event_type,
             CAST(SUM(ina) AS BIGINT) AS n_a,
             CAST(SUM(1 - ina) AS BIGINT) AS n_b
      FROM lab GROUP BY event_type),
    pv AS (
      SELECT event_type, value,
             CAST(SUM(ina) AS BIGINT) AS ca,
             CAST(SUM(1 - ina) AS BIGINT) AS cb
      FROM lab GROUP BY event_type, value),
    cum AS (
      SELECT event_type, value,
             SUM(ca) OVER (PARTITION BY event_type ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cca,
             SUM(cb) OVER (PARTITION BY event_type ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS ccb
      FROM pv),
    d AS (
      SELECT c.event_type, MAX(n.n_a) AS n_a, MAX(n.n_b) AS n_b,
             MAX(ABS(c.cca * n.n_b - c.ccb * n.n_a)) AS d_num
      FROM cum c JOIN n ON n.event_type = c.event_type
      GROUP BY c.event_type)
    SELECT event_type, n_a, n_b, CAST(d_num AS BIGINT) AS d_num,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE round(CAST(d_num AS DOUBLE) / (n_a * n_b), 6) + 0
           END AS ks_d
    FROM d
    """,
)
def stat_ks(spark, sf):
    """Two-sample Kolmogorov-Smirnov drift statistic for `value`
    between the same deterministic md5 halves stat_ttest uses — the
    DISTRIBUTION-shape complement of Welch's t (t sees mean shifts;
    KS sees any ECDF divergence, the standard feed-drift alarm).
    Exactness: D = max|F_a - F_b| is computed entirely in integers by
    cross-multiplying the cumulative counts (|cca*n_b - ccb*n_a| over
    the merged support), so the argmax can never depend on float
    rounding; only the final normalization divides, rounded to 6 with
    the +0 -0.0 guard. Degenerate halves (all rows hash to one side)
    short-circuit to NULL instead of ANSI DIVIDE_BY_ZERO. Scale
    shape: one corpus agg to the per-(type, value) support, then a
    window over the support relation — corpus-cardinality rows never
    enter the window; at web scale the support is first quantized to
    fixed-width bins (standard KS-on-histogram), which changes
    resolution, not the machinery."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    ina = F.when(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "8", 1
    ).otherwise(0)
    lab = e.select("event_type", "value", ina.alias("ina"))
    n = lab.groupBy("event_type").agg(
        F.sum("ina").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("ina")).cast("long").alias("n_b"),
    )
    pv = lab.groupBy("event_type", "value").agg(
        F.sum("ina").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("ina")).cast("long").alias("cb"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pv.select(
        "event_type",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
    )
    d = (
        cum.join(n, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(F.col("cca") * F.col("n_b") - F.col("ccb") * F.col("n_a"))
            ).alias("d_num"),
        )
    )
    return d.select(
        "event_type",
        "n_a",
        "n_b",
        F.col("d_num").cast("long").alias("d_num"),
        F.when(
            (F.col("n_a") == 0) | (F.col("n_b") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.col("d_num").cast("double") / (F.col("n_a") * F.col("n_b")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("ks_d"),
    )


# ---------------------------------------------------------------------------
# running COUNT(DISTINCT) over a window — via the first-occurrence flag
# ---------------------------------------------------------------------------
@q(
    "win_distinct_count",
    f"""
    WITH ev AS (
      SELECT event_type, user_id,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS INT)
               AS day_num
      FROM events WHERE user_id IS NOT NULL),
    fd AS (SELECT event_type, user_id, MIN(day_num) AS fday
           FROM ev GROUP BY 1, 2),
    nu AS (SELECT event_type, fday AS day_num, COUNT(*) AS n_new
           FROM fd GROUP BY 1, 2),
    days AS (SELECT DISTINCT event_type, day_num FROM ev),
    j AS (SELECT d.event_type, d.day_num,
                 COALESCE(n.n_new, 0) AS n_new
          FROM days d LEFT JOIN nu n
            ON n.event_type = d.event_type AND n.day_num = d.day_num)
    SELECT event_type, day_num, CAST(n_new AS BIGINT) AS n_new,
           CAST(SUM(n_new) OVER (PARTITION BY event_type ORDER BY day_num
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM j
    """,
)
def win_distinct_count(spark, sf):
    """Running distinct-user count per event type by day — the
    cumulative-audience curve. Neither engine supports
    COUNT(DISTINCT) OVER a running frame, and the naive emulation
    (per-day distinct over an ever-growing frame) is O(n^2); the
    standard reduction is the FIRST-OCCURRENCE flag: a user
    contributes to the running distinct count exactly once, on their
    first active day, so cum_distinct(day) = running SUM of per-day
    first-appearance counts. One agg collapses (type, user) to the
    first day, one agg counts arrivals per day, and a rows-frame
    running sum over the |types x days| relation finishes — the
    corpus is scanned once and the window input is calendar-sized,
    never corpus-sized. Days with activity but no new users appear
    with n_new = 0 so the curve is dense on active days."""
    e = t(spark, sf, "events").filter(F.col("user_id").isNotNull())
    ev = e.select(
        "event_type",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("int").alias(
            "day_num"
        ),
    )
    fd = ev.groupBy("event_type", "user_id").agg(
        F.min("day_num").alias("fday")
    )
    nu = fd.groupBy("event_type", F.col("fday").alias("day_num")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    days = ev.select("event_type", "day_num").distinct()
    j = days.join(nu, ["event_type", "day_num"], "left").select(
        "event_type",
        "day_num",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "day_num",
        F.col("n_new").cast("long").alias("n_new"),
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# trailing dyadic-decay EWMA — exact because the weights are powers of 2
# ---------------------------------------------------------------------------
@q(
    "events_ewma",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS INT)
               AS day_num,
             SUM(CAST(round(value * 100) AS BIGINT)) AS v_cents
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    w AS (
      SELECT a.event_type, a.day_num,
             SUM(b.v_cents *
                 CAST(pow(2, 13 - (a.day_num - b.day_num)) AS BIGINT))
               AS ewma_w
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type
       AND b.day_num BETWEEN a.day_num - 13 AND a.day_num
      GROUP BY 1, 2)
    SELECT event_type, day_num, CAST(ewma_w AS BIGINT) AS ewma_w,
           round(CAST(ewma_w AS DOUBLE) / 819200.0, 6) + 0 AS ewma
    FROM w
    """,
)
def events_ewma(spark, sf):
    """Trailing exponentially-decaying moving average of daily
    revenue per event type (half-life = 1 day, 14-day horizon) — the
    recency-weighted health metric behind alerting and trend lines.
    Exactness trick: with decay 1/2 the weight of the day `lag` steps
    back is 2^(13-lag) / 2^13, so the weighted sum over the trailing
    frame is an exact BIGINT (integer cents x power-of-two weights) —
    no float accumulation order can differ between engines; the
    single final division by 819200 (2^13 weight scale x 100 cents)
    is one exact-integer-to-double op, rounded to 6. A weighted
    window frame doesn't exist in either engine, so the frame is a
    self-join of the DAILY aggregate against a 14-day band — the
    corpus collapses to |types x days| first, and the banded
    self-join fans each row out at most 14x (a calendar-sized
    relation, broadcast-joinable at any corpus scale). True
    infinite-horizon EWMA at scale runs as the sessionize-style
    stateful streaming fold; the bounded-horizon batch form here is
    the backfill/repair path."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("int").alias(
            "day_num"
        ),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v_cents"))
    a, b = daily.alias("a"), daily.alias("b")
    wgt = F.pow(
        F.lit(2.0), F.lit(13) - (F.col("a.day_num") - F.col("b.day_num"))
    ).cast("long")
    w = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day_num") >= F.col("a.day_num") - 13)
            & (F.col("b.day_num") <= F.col("a.day_num")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), F.col("a.day_num").alias("day_num"))
        .agg(F.sum(F.col("b.v_cents") * wgt).alias("ewma_w"))
    )
    return w.select(
        "event_type",
        "day_num",
        F.col("ewma_w").cast("long").alias("ewma_w"),
        (F.round(F.col("ewma_w").cast("double") / 819200.0, 6) + F.lit(0.0)).alias(
            "ewma"
        ),
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) — maximize size, minimize price
# ---------------------------------------------------------------------------
@q(
    "pareto_front",
    """
    WITH pp AS (
      SELECT p_partkey, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part),
    ps AS (SELECT p_size, MIN(price_cents) AS mp FROM pp GROUP BY p_size),
    fr AS (
      SELECT p_size, mp,
             MIN(mp) OVER (ORDER BY p_size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS mlt
      FROM ps)
    SELECT pp.p_partkey, pp.p_size, pp.price_cents
    FROM pp JOIN fr ON fr.p_size = pp.p_size
    WHERE pp.price_cents = fr.mp
      AND (fr.mlt IS NULL OR pp.price_cents < fr.mlt)
    """,
)
def pareto_front(spark, sf):
    """Pareto frontier (skyline) over parts — maximize p_size,
    minimize retail price: the multi-objective selection primitive
    (in an LLM-data pipeline the same query picks quality-vs-cost
    non-dominated corpus slices; here it runs on the catalog table
    the fixture provides). A part survives iff no other part has
    size >= AND price <= with one strict. Instead of the O(n^2)
    dominance self-join, the frontier reduces to per-size marginals:
    a part is non-dominated iff it has the MIN price at its own size
    AND beats the best (MIN) price among all strictly larger sizes —
    computed with one group-by to the |distinct sizes| relation and
    one running-MIN window over it (sizes ordered DESC, frame ends at
    1 PRECEDING = strictly larger). Scale shape: the corpus is
    scanned once into a size-cardinality aggregate; the window runs
    on dozens of rows; the verdict joins back by size (broadcastable
    at any scale). Ties: equally-priced parts at the same frontier
    size don't dominate each other and are all kept — both engines
    agree because membership tests exact integer cents."""
    pp = t(spark, sf, "part").select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias(
            "price_cents"
        ),
    )
    ps = pp.groupBy("p_size").agg(F.min("price_cents").alias("mp"))
    w = (
        Window.orderBy(F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fr = ps.select("p_size", "mp", F.min("mp").over(w).alias("mlt"))
    return (
        pp.join(fr, "p_size")
        .filter(
            (F.col("price_cents") == F.col("mp"))
            & (F.col("mlt").isNull() | (F.col("price_cents") < F.col("mlt")))
        )
        .select("p_partkey", "p_size", "price_cents")
    )


# ---------------------------------------------------------------------------
# PMI collocation mining over the corpus bigrams
# ---------------------------------------------------------------------------
@q(
    "text_collocations",
    """
    WITH tok AS (
      SELECT string_split(text, ' ') AS arr FROM documents),
    g AS (SELECT arr, unnest(generate_series(1, len(arr) - 1)) AS i
          FROM tok WHERE len(arr) >= 2),
    bg AS (SELECT arr[i] AS w1, arr[i + 1] AS w2 FROM g
           WHERE arr[i] <> '' AND arr[i + 1] <> ''),
    cb AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bg GROUP BY 1, 2),
    u AS (SELECT tk, COUNT(*) AS cu
          FROM (SELECT unnest(string_split(text, ' ')) AS tk FROM documents)
          WHERE tk <> '' GROUP BY tk),
    n AS (SELECT COUNT(*) AS nb FROM bg),
    sc AS (
      SELECT cb.w1, cb.w2, cb.c_xy,
             CAST(round(1000000.0 * ln(
                    (CAST(cb.c_xy AS DOUBLE) * n.nb) /
                    (CAST(u1.cu AS DOUBLE) * u2.cu)), 0) AS BIGINT) AS pmi_us
      FROM cb
      JOIN u u1 ON u1.tk = cb.w1
      JOIN u u2 ON u2.tk = cb.w2
      CROSS JOIN n
      WHERE cb.c_xy >= 3)
    SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
           round(CAST(pmi_us AS DOUBLE) / 1000000.0, 6) AS pmi
    FROM sc
    ORDER BY pmi_us DESC, w1, w2 LIMIT 20
    """,
)
def text_collocations(spark, sf):
    """PMI collocation mining: the 20 strongest word bigrams by
    pointwise mutual information, PMI = ln(c_xy * N / (c_x * c_y)),
    with a count floor of 3 — the classic phrase detector used to
    build tokenizer merge lists and multi-word dictionary entries
    (the spotting dictionary's surface forms are exactly such
    collocations). Engine parity: PMI's argument is an exact rational
    of BIGINT counts evaluated in the identical operation order, and
    the single ln is quantized to integer MICROS before ranking (the
    kg_adamic_adar precedent), so the top-20 cut and tiebreak
    (pmi_us, then bigram text) are engine-stable. Scale shape:
    bigrams explode map-side from the token array (zero shuffle until
    the count agg); both count relations are vocab-cardinality
    aggregates; the marginal attach joins the bigram counts to the
    unigram relation twice by token (shuffle-joinable; AQE broadcasts
    the head when a df floor keeps it small); TakeOrderedAndProject
    computes the global top-20 without a full sort."""
    d = t(spark, sf, "documents")
    arr = d.select(F.split("text", " ").alias("arr")).filter(
        F.size("arr") >= 2
    )
    bg = arr.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(arr) - 2),"
                " i -> struct(arr[i] AS w1, arr[i + 1] AS w2))"
            )
        ).alias("s")
    ).select("s.w1", "s.w2").filter((F.col("w1") != "") & (F.col("w2") != ""))
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    u = (
        d.select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    n = bg.agg(F.count(F.lit(1)).alias("nb"))
    pmi_us = F.round(
        F.lit(1000000.0)
        * F.log(
            (F.col("c_xy").cast("double") * F.col("nb"))
            / (F.col("cu1").cast("double") * F.col("cu2"))
        ),
        0,
    ).cast("long")
    sc = (
        cb.filter(F.col("c_xy") >= 3)
        .join(u.select(F.col("tk").alias("w1"), F.col("cu").alias("cu1")), "w1")
        .join(u.select(F.col("tk").alias("w2"), F.col("cu").alias("cu2")), "w2")
        .crossJoin(n)
        .select("w1", "w2", "c_xy", pmi_us.alias("pmi_us"))
    )
    return (
        sc.orderBy(F.desc("pmi_us"), "w1", "w2")
        .limit(20)
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.round(F.col("pmi_us").cast("double") / 1000000.0, 6).alias(
                "pmi"
            ),
        )
    )


# ---------------------------------------------------------------------------
# hashing-trick featurizer: token -> md5-prefix bucket, counted per doc
# ---------------------------------------------------------------------------
_HASH_DIM = 64


@q(
    "feat_hashing",
    f"""
    WITH s AS (SELECT doc_id, text FROM documents WHERE doc_id % 101 = 0),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM s),
    f AS (SELECT doc_id,
                 CAST(('0x' || substr(md5(tk), 1, 8))::UBIGINT % {_HASH_DIM}
                      AS INT) AS bucket
          FROM tok WHERE tk <> '')
    SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM f GROUP BY doc_id, bucket
    """,
)
def feat_hashing(spark, sf):
    """Hashing-trick featurizer (Weinberger et al.): each token maps
    to one of 64 feature buckets via its md5-hex prefix, and
    per-(doc, bucket) counts form the fixed-width sparse feature
    vector — the memory-bounded vectorizer used when the vocabulary
    is unbounded (exactly the 100-TB web-text case: no vocab build,
    no dictionary broadcast, any executor can featurize any shard
    statelessly). The bucket function is md5-based, not the engines'
    native hash(), because md5 is the one hash both engines (and any
    future engine) compute identically — the sample_hash/mix_domains
    portability precedent; Spark turns the 8-hex-digit prefix into an
    integer with conv(,16,10), DuckDB with the 0x-prefix cast, both
    exact at 32 bits. Map-only until the (doc, bucket) count agg —
    zero joins, zero windows. The doc_id % 101 sample keeps the
    oracle-compared output fixture-sized; the transform itself is
    per-row and sample-free at scale."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") % 101 == 0)
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tk")
    ).filter(F.col("tk") != "")
    bucket = (
        F.pmod(
            F.conv(F.substring(F.md5("tk"), 1, 8), 16, 10).cast("long"),
            F.lit(_HASH_DIM),
        )
        .cast("int")
        .alias("bucket")
    )
    return (
        tok.select("doc_id", bucket)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U — rank-sum with tie-averaged ranks, exact integers
# ---------------------------------------------------------------------------
@q(
    "stat_mannwhitney",
    """
    WITH lab AS (
      SELECT event_type, value,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ina
      FROM events WHERE value IS NOT NULL),
    pv AS (
      SELECT event_type, value,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(ina) AS BIGINT) AS ca
      FROM lab GROUP BY event_type, value),
    rk AS (
      SELECT event_type, value, cnt, ca,
             COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS cprev
      FROM pv),
    s AS (
      SELECT event_type,
             SUM(ca) AS n_a, SUM(cnt - ca) AS n_b,
             SUM(ca * (2 * cprev + cnt + 1)) AS r2a
      FROM rk GROUP BY event_type)
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE round(CAST(r2a - n_a * (n_a + 1) AS DOUBLE) /
                           (2.0 * n_a * n_b), 6) + 0
           END AS auc
    FROM s
    """,
)
def stat_mannwhitney(spark, sf):
    """Mann-Whitney U (rank-sum) between the stat_ttest hash halves,
    per event type — the nonparametric location test that completes
    the drift family (t = mean shift, KS = any shape change, U =
    stochastic dominance; U/(n_a*n_b) is also exactly the AUC of
    'value separates the halves'). Exactness: tie-averaged ranks are
    half-integers, so everything is carried as DOUBLED ranks — for a
    tie group of size cnt starting after cprev items, the doubled
    average rank is the exact integer 2*cprev + cnt + 1 — making
    R2a (doubled rank sum of half A) and u2 = 2*U order-independent
    BIGINT aggregates on both engines; only the final AUC
    normalization divides, NULL-guarded against a degenerate
    single-sided split (ANSI DIVIDE_BY_ZERO). Scale shape: identical
    to stat_ks — one corpus agg to the per-(type, value) support,
    one window over the support relation, one vocab-sized agg."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    ina = F.when(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "8", 1
    ).otherwise(0)
    lab = e.select("event_type", "value", ina.alias("ina"))
    pv = lab.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("ina").cast("long").alias("ca"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = pv.select(
        "event_type",
        "cnt",
        "ca",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cprev"),
    )
    s = rk.groupBy("event_type").agg(
        F.sum("ca").alias("n_a"),
        F.sum(F.col("cnt") - F.col("ca")).alias("n_b"),
        F.sum(
            F.col("ca") * (F.lit(2) * F.col("cprev") + F.col("cnt") + 1)
        ).alias("r2a"),
    )
    u2 = F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1)
    return s.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        u2.cast("long").alias("u2"),
        F.when(
            (F.col("n_a") == 0) | (F.col("n_b") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                u2.cast("double") / (F.lit(2.0) * F.col("n_a") * F.col("n_b")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("auc"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit — digits taken from the exact integer cents
# ---------------------------------------------------------------------------
@q(
    "stat_benford",
    """
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND value > 0),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
      FROM v WHERE cents > 0),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    tot AS (SELECT SUM(n) AS total FROM c)
    SELECT c.digit, c.n,
           round(CAST(c.n AS DOUBLE) / tot.total, 6) + 0 AS share,
           round(CAST(CAST(round(1000000 * log10(1.0 + 1.0 / c.digit), 0)
                           AS BIGINT) AS DOUBLE) / 1000000.0, 6)
             AS benford_share
    FROM c CROSS JOIN tot
    """,
)
def stat_benford(spark, sf):
    """Benford first-digit audit of the monetary column — the
    fraud/data-fabrication screen (organically generated amounts
    follow P(d) = log10(1 + 1/d); synthetic or truncated feeds
    don't). The first significant digit comes from the EXACT integer
    cents rendered as a decimal string — never from float log10 of
    the raw double, whose ulp error near decade boundaries could
    classify 999.999... differently per engine. Expected shares are
    the 9 Benford constants quantized to integer micros (the
    kg_adamic_adar log precedent) so both engines emit bit-identical
    doubles. Observed share divides two exact BIGINTs (total > 0
    whenever any row exists — no division guard needed; zero rows in,
    zero rows out). Scale shape: map-only digit extraction, 9-row
    agg, one broadcastable total."""
    e = t(spark, sf, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    v = e.select(F.round(F.col("value") * 100).cast("long").alias("cents"))
    d = v.filter(F.col("cents") > 0).select(
        F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias(
            "digit"
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = c.agg(F.sum("n").alias("total"))
    benford_us = F.round(
        F.lit(1000000) * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 0
    ).cast("long")
    return c.crossJoin(tot).select(
        "digit",
        "n",
        (F.round(F.col("n").cast("double") / F.col("total"), 6) + F.lit(0.0)).alias(
            "share"
        ),
        F.round(benford_us.cast("double") / 1000000.0, 6).alias(
            "benford_share"
        ),
    )


# ---------------------------------------------------------------------------
# bigram-LM document scoring — per-term micros quantization, exact sum
# ---------------------------------------------------------------------------
@q(
    "text_bigram_lm",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    g AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 1)) AS i
          FROM tok WHERE len(arr) >= 2),
    bg AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2 FROM g
           WHERE arr[i] <> '' AND arr[i + 1] <> ''),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM bg GROUP BY 1, 2),
    cu AS (SELECT w1 AS w, CAST(COUNT(*) AS BIGINT) AS c1
           FROM bg GROUP BY 1),
    sc AS (
      SELECT b.doc_id,
             CAST(round(1000000.0 *
                        ln(CAST(cb.c12 AS DOUBLE) / cu.c1), 0) AS BIGINT)
               AS ll_us
      FROM bg b
      JOIN cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
      JOIN cu ON cu.w = b.w1
      WHERE b.doc_id % 101 = 0)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(ll_us) AS BIGINT) AS ll_us,
           round(CAST(SUM(ll_us) AS DOUBLE) / COUNT(*) / 1000000.0, 6) + 0
             AS avg_ll
    FROM sc GROUP BY doc_id
    """,
)
def text_bigram_lm(spark, sf):
    """Bigram-LM document scoring: per (sampled) document, the mean
    log P(w2|w1) under the corpus MLE bigram model — the
    sequence-aware quality signal one rung above text_unigram_lm
    (boilerplate repeats high-probability transitions; shuffled or
    machine-garbled text hits rare ones). P(w2|w1) = c12/c1 where c1
    is the count of w1 AS A BIGRAM HEAD (so probabilities sum to 1
    per head and every scored bigram has c12 >= 1 — no smoothing
    surface, ln argument always in (0, 1]). Each term quantizes to
    integer micros before the per-doc SUM (kg_adamic_adar precedent)
    — exact order-independent BIGINT agg; one division at the end.
    Scale shape: both count relations are vocab-sized aggs; the
    per-doc bigram stream joins them UNHINTED (the
    text_unigram_lm_pruned lesson: a forced broadcast of a
    corpus-cardinality vocabulary OOMs executors — AQE broadcasts
    only if it fits); the doc_id sample bounds the oracle-compared
    output, not the model."""
    d = t(spark, sf, "documents")
    arr = d.select("doc_id", F.split("text", " ").alias("arr")).filter(
        F.size("arr") >= 2
    )
    bg = (
        arr.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(arr) - 2),"
                    " i -> struct(arr[i] AS w1, arr[i + 1] AS w2))"
                )
            ).alias("s"),
        )
        .select("doc_id", "s.w1", "s.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    cb = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    cu = bg.groupBy(F.col("w1").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("c1")
    )
    ll_us = F.round(
        F.lit(1000000.0)
        * F.log(F.col("c12").cast("double") / F.col("c1")),
        0,
    ).cast("long")
    sc = (
        bg.filter(F.col("doc_id") % 101 == 0)
        .join(cb, ["w1", "w2"])
        .join(cu, F.col("w1") == F.col("w"))
        .select("doc_id", ll_us.alias("ll_us"))
    )
    return sc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("ll_us").cast("long").alias("ll_us"),
        (
            F.round(
                F.sum("ll_us").cast("double")
                / F.count(F.lit(1))
                / 1000000.0,
                6,
            )
            + F.lit(0.0)
        ).alias("avg_ll"),
    )


# ---------------------------------------------------------------------------
# k-anonymity report over the release quasi-identifiers
# ---------------------------------------------------------------------------
_KANON_K = 10


@q(
    "privacy_kanon",
    f"""
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) < {_KANON_K} AS at_risk
    FROM documents GROUP BY lang, source
    """,
)
def privacy_kanon(spark, sf):
    """k-anonymity audit of the corpus release: group sizes over the
    quasi-identifier tuple (lang, source) with an at-risk flag for
    equivalence classes smaller than k=10 — the report a privacy
    review runs before publishing a corpus slice (a document that is
    one of three Basque pages from one host is re-identifiable even
    with no direct identifier; the downstream action is suppressing
    or generalizing those classes, cf. pii_redact for the in-text
    scrub). One map-side-combinable agg to a |QI-combinations|-sized
    relation; the boolean derives from the exact count so both
    engines agree by construction."""
    d = t(spark, sf, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.count(F.lit(1)) < _KANON_K).alias("at_risk"),
    )


# ---------------------------------------------------------------------------
# MAD robust outlier screen — the median-based twin of events_outliers
# ---------------------------------------------------------------------------
@q(
    "events_mad",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type),
    dev AS (
      SELECT e.event_type, ABS(e.value - m.med) AS ad, m.med
      FROM events e JOIN med m ON m.event_type = e.event_type
      WHERE e.value IS NOT NULL),
    mad AS (
      SELECT event_type, MAX(med) AS med, quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY event_type),
    j AS (
      SELECT d.event_type, d.med, m.mad,
             CASE WHEN m.mad > 0
                  THEN round(d.ad / m.mad, 6) END AS rscore
      FROM dev d JOIN mad m ON m.event_type = d.event_type)
    SELECT event_type, round(MAX(med), 6) + 0 AS med,
           round(MAX(mad), 6) + 0 AS mad,
           CAST(COUNT(*) FILTER (WHERE rscore > 3.0) AS BIGINT)
             AS n_outliers
    FROM j GROUP BY event_type
    """,
)
def events_mad(spark, sf):
    """Robust (median/MAD) outlier screen per event type — the
    breakdown-resistant twin of events_outliers' mean/stddev z-score
    (one fat-fingered 10^9 amount drags a mean-based threshold past
    every real anomaly; the median absolute deviation barely moves).
    Both medians are the exact type-7 interpolated quantile (Spark
    ``percentile`` == DuckDB ``quantile_cont``, the agg_percentiles
    precedent); outlier membership tests the ROUNDED robust score on
    both engines (the events_outliers rule: row membership must
    never hinge on sub-ulp differences) and a zero-MAD type (over
    half the values identical) yields NULL scores, counting zero
    outliers instead of ANSI-dividing by zero. Scale shape: exact
    medians need a per-type sort of the value column — at corpus
    scale the approx-percentile sketch replaces them (bounded-memory
    mergeable buffers); the screen's join side is the tiny per-type
    stats relation, broadcast to the corpus scan."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(med, "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.expr("percentile(ad, 0.5)").alias("mad"),
    )
    j = dev.select("event_type", "ad").join(
        mad.select("event_type", "mad"), "event_type"
    ).select(
        "event_type",
        F.when(F.col("mad") > 0, F.round(F.col("ad") / F.col("mad"), 6)).alias(
            "rscore"
        ),
    )
    stats = mad.select(
        "event_type",
        (F.round("med", 6) + F.lit(0.0)).alias("med"),
        (F.round("mad", 6) + F.lit(0.0)).alias("mad"),
    )
    cnt = j.groupBy("event_type").agg(
        F.count(F.when(F.col("rscore") > 3.0, 1)).cast("long").alias(
            "n_outliers"
        )
    )
    return stats.join(cnt, "event_type").select(
        "event_type", "med", "mad", "n_outliers"
    )


# ---------------------------------------------------------------------------
# per-dimension embedding statistics — exact integer-micros moments
# ---------------------------------------------------------------------------
@q(
    "embed_dim_stats",
    """
    WITH e0 AS (
      SELECT unnest(range(0, len(embedding))) AS j, embedding
      FROM embeddings),
    qv AS (
      SELECT CAST(j AS INT) AS dim_idx,
             CAST(round(1000000.0 * CAST(embedding[j + 1] AS DOUBLE), 0)
                  AS BIGINT) AS q,
             CAST(embedding[j + 1] AS DOUBLE) AS x
      FROM e0),
    s AS (
      SELECT dim_idx, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(q) AS sq, SUM(q * q) AS sq2,
             MIN(x) AS minx, MAX(x) AS maxx
      FROM qv GROUP BY dim_idx)
    SELECT dim_idx, n,
           round(CAST(sq AS DOUBLE) / n / 1000000.0, 6) + 0 AS mean,
           round(CAST(sq2 AS DOUBLE) / n / 1000000000000.0
                 - (CAST(sq AS DOUBLE) / n / 1000000.0)
                   * (CAST(sq AS DOUBLE) / n / 1000000.0), 6) + 0 AS var,
           round(minx, 6) + 0 AS minv, round(maxx, 6) + 0 AS maxv
    FROM s
    """,
)
def embed_dim_stats(spark, sf):
    """Per-dimension profile of the embedding column (mean / variance
    / range per coordinate) — the drift-and-sanity report for a
    vector feed (a collapsed dimension, a renormalization change, or
    a truncated export all show up here before any ANN quality
    metric moves; the vector-column complement of profile_columns).
    Engine parity: components quantize to integer micros, so the
    count/sum/sum-of-squares moments are exact order-independent
    BIGINT aggregates; mean and variance then derive in the IDENTICAL
    float operation order on both engines (drift_chi2 precedent) and
    round to 6 with the -0.0 guard. Scale shape: posexplode is
    map-side (rows x 64, no shuffle), the moment agg map-side-
    combines to a |dims|-sized relation — one corpus scan, one tiny
    shuffle, bounded memory at any row count."""
    emb = t(spark, sf, "embeddings")
    qv = emb.select(
        F.posexplode("embedding").alias("dim_idx", "xf")
    ).select(
        "dim_idx",
        F.round(F.lit(1000000.0) * F.col("xf").cast("double"), 0)
        .cast("long")
        .alias("q"),
        F.col("xf").cast("double").alias("x"),
    )
    s = qv.groupBy("dim_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
    )
    mean_raw = F.col("sq").cast("double") / F.col("n") / 1000000.0
    return s.select(
        "dim_idx",
        "n",
        (F.round(mean_raw, 6) + F.lit(0.0)).alias("mean"),
        (
            F.round(
                F.col("sq2").cast("double") / F.col("n") / 1e12
                - mean_raw * mean_raw,
                6,
            )
            + F.lit(0.0)
        ).alias("var"),
        (F.round("minx", 6) + F.lit(0.0)).alias("minv"),
        (F.round("maxx", 6) + F.lit(0.0)).alias("maxv"),
    )


# ---------------------------------------------------------------------------
# top principal direction by 2 power-iteration rounds over a
# quantized second-moment matrix — all cross-engine math in BIGINTs
# ---------------------------------------------------------------------------
@q(
    "embed_pca_top",
    """
    WITH e0 AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS j, embedding
      FROM embeddings),
    qv AS (
      SELECT vec_id, CAST(j AS INT) AS j,
             CAST(round(1000000.0 * CAST(embedding[j + 1] AS DOUBLE), 0)
                  AS BIGINT) AS q
      FROM e0),
    nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM qv),
    cm AS (
      SELECT a.j AS j, b.j AS k,
             CAST(round(CAST(SUM(a.q * b.q) AS DOUBLE) / nn.n, 0)
                  AS BIGINT) AS c
      FROM qv a JOIN qv b ON b.vec_id = a.vec_id CROSS JOIN nn
      GROUP BY a.j, b.j, nn.n),
    y1 AS (SELECT j, SUM(c) AS y FROM cm GROUP BY j),
    m1 AS (SELECT MAX(ABS(y)) AS ma FROM y1),
    v1 AS (
      SELECT j, CASE WHEN m1.ma = 0 THEN 0
                     ELSE CAST(round(1000.0 * CAST(y AS DOUBLE) / m1.ma, 0)
                               AS BIGINT) END AS v
      FROM y1 CROSS JOIN m1),
    y2 AS (
      SELECT cm.j, SUM(cm.c * v1.v) AS y
      FROM cm JOIN v1 ON v1.j = cm.k GROUP BY cm.j),
    m2 AS (SELECT MAX(ABS(y)) AS ma FROM y2),
    j0 AS (SELECT MIN(y2.j) AS j0 FROM y2 CROSS JOIN m2
           WHERE ABS(y2.y) = m2.ma),
    sg AS (SELECT CASE WHEN y2.y >= 0 THEN 1 ELSE -1 END AS s
           FROM y2 JOIN j0 ON y2.j = j0.j0)
    SELECT y2.j AS dim_idx,
           CASE WHEN m2.ma = 0 THEN 0.0 + 0
                ELSE round(CAST(sg.s * y2.y AS DOUBLE) / m2.ma, 6) + 0
           END AS v
    FROM y2 CROSS JOIN m2 CROSS JOIN sg
    """,
)
def embed_pca_top(spark, sf):
    """Top principal direction of the embedding cloud via TWO power-
    iteration rounds — the corpus-level structure probe behind
    whitening, anisotropy checks ("is the feed collapsing to one
    direction?") and PCA-based dimensionality reduction. Distributed
    shape: the second-moment matrix is the classic outer-product
    aggregate — posexplode to (vec, j, q), per-vector self-join fans
    each row x64, and one map-side-combinable SUM collapses to the
    |d^2| = 4096-cell relation; every later step runs on d- or
    d^2-sized relations (broadcastable at any corpus size), and the
    iteration count is fixed so the lineage stays flat. Engine
    parity: components quantize to integer micros, the moment matrix
    to per-row-average units (ONE identically-ordered double division
    — scale-invariant, so the BIGINT headroom math is independent of
    corpus size), the round-1 vector to millis; both matrix-vector
    products are then exact order-independent integer aggregates (the
    kg_adamic_adar discipline applied to linear algebra). Sign is
    fixed by making the largest-|component| coordinate (lowest index
    on ties) positive; zero-matrix degenerates to 0 instead of
    dividing by zero. Uncentered (second moment, not covariance) —
    standard for ~zero-mean embedding feeds; centering would subtract
    the embed_dim_stats means map-side."""
    emb = t(spark, sf, "embeddings")
    qv = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "xf")
    ).select(
        "vec_id",
        "j",
        F.round(F.lit(1000000.0) * F.col("xf").cast("double"), 0)
        .cast("long")
        .alias("q"),
    )
    n = qv.agg(F.countDistinct("vec_id").cast("long").alias("n"))
    a = qv.alias("a")
    b = qv.select(
        F.col("vec_id").alias("bvid"),
        F.col("j").alias("k"),
        F.col("q").alias("bq"),
    )
    cm = (
        a.join(b, F.col("a.vec_id") == F.col("bvid"))
        .crossJoin(n)
        .groupBy("j", "k", "n")
        .agg(F.sum(F.col("a.q") * F.col("bq")).alias("sqq"))
        .select(
            "j",
            "k",
            F.round(F.col("sqq").cast("double") / F.col("n"), 0)
            .cast("long")
            .alias("c"),
        )
    )
    from ..operators.dedup import parquet_checkpoint

    cm = parquet_checkpoint(cm, "pca_cm")
    y1 = cm.groupBy("j").agg(F.sum("c").alias("y"))
    m1 = y1.agg(F.max(F.abs("y")).alias("ma"))
    v1 = y1.crossJoin(m1).select(
        "j",
        F.when(F.col("ma") == 0, F.lit(0))
        .otherwise(
            F.round(
                F.lit(1000.0) * F.col("y").cast("double") / F.col("ma"), 0
            ).cast("long")
        )
        .alias("v"),
    )
    y2 = (
        cm.join(v1.select(F.col("j").alias("k"), "v"), "k")
        .groupBy("j")
        .agg(F.sum(F.col("c") * F.col("v")).alias("y"))
    )
    y2 = parquet_checkpoint(y2, "pca_y2")
    m2 = y2.agg(F.max(F.abs("y")).alias("ma"))
    j0 = (
        y2.crossJoin(m2)
        .filter(F.abs("y") == F.col("ma"))
        .agg(F.min("j").alias("j0"))
    )
    sg = y2.join(j0, y2.j == j0.j0).select(
        F.when(F.col("y") >= 0, F.lit(1)).otherwise(F.lit(-1)).alias("s")
    )
    return (
        y2.crossJoin(m2)
        .crossJoin(sg)
        .select(
            F.col("j").alias("dim_idx"),
            F.when(F.col("ma") == 0, F.lit(0.0) + F.lit(0.0))
            .otherwise(
                F.round(
                    (F.col("s") * F.col("y")).cast("double") / F.col("ma"),
                    6,
                )
                + F.lit(0.0)
            )
            .alias("v"),
        )
    )


# ---------------------------------------------------------------------------
# incremental view maintenance: merge(base agg, delta agg) == full agg
# ---------------------------------------------------------------------------
@q(
    "agg_incremental",
    f"""
    SELECT event_type,
           CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS INT)
             AS day_num,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents
    FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def agg_incremental(spark, sf):
    """Incremental view maintenance: the daily rollup is computed as
    MERGE(agg(base), agg(delta)) — base and delta are a deterministic
    split of the log — and the DuckDB twin is the full recompute, so
    a green hash PROVES the rollup is self-mergeable (count and
    integer-cents sum are algebraic aggregates: partial states merge
    by re-aggregation). This is the contract every continuous
    pipeline leans on at 100 TB: yesterday's materialized rollup plus
    today's delta agg, never a full re-scan — the batch-side proof of
    what stream_upsert's foreachBatch compaction does continuously
    (and the same associativity argument as its chunk-split test).
    Scale shape: each leg is one map-side-combinable agg; the merge
    re-aggregates two |days x types|-sized relations — calendar-
    sized, a no-op shuffle."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )

    def leg(df):
        return df.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("int").alias(
                "day_num"
            ),
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "v_cents"
            ),
        )

    base = leg(e.filter(F.col("event_id") % 10 < 8))
    delta = leg(e.filter(F.col("event_id") % 10 >= 8))
    return (
        base.unionByName(delta)
        .groupBy("event_type", "day_num")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("v_cents").cast("long").alias("v_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf-fit of the vocabulary head — OLS on integer-milli log-log points
# ---------------------------------------------------------------------------
@q(
    "text_zipf_fit",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    cnt AS (SELECT tk, COUNT(*) AS c FROM tok WHERE tk <> '' GROUP BY tk),
    top AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tk) AS rnk
      FROM cnt QUALIFY rnk <= 100),
    pts AS (
      SELECT CAST(round(1000.0 * ln(CAST(rnk AS DOUBLE)), 0) AS BIGINT) AS x,
             CAST(round(1000.0 * ln(CAST(c AS DOUBLE)), 0) AS BIGINT) AS y
      FROM top),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts)
    SELECT n,
           CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (n * sxx - sx * sx), 6) + 0
           END AS slope,
           CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN NULL
                ELSE round((CAST(sy AS DOUBLE)
                            - CAST(n * sxy - sx * sy AS DOUBLE)
                              / (n * sxx - sx * sx) * sx)
                           / n / 1000.0, 6) + 0
           END AS intercept
    FROM s
    """,
)
def text_zipf_fit(spark, sf):
    """Zipf-law fit of the vocabulary head: OLS slope of ln(count) on
    ln(rank) over the top-100 tokens — the one-number corpus-health
    probe (natural language sits near slope -1; boilerplate floods
    flatten it, deduplicated spam steepens it; track it per snapshot
    and alert on drift). Engine parity: the log-log points quantize
    to integer MILLIS, so all five regression moments are exact
    BIGINT sums and the slope/intercept are single identically-
    ordered divisions of exact integers, rounded to 6 (the
    kg_assortativity exact-moments construction); a degenerate
    support (< 2 distinct ranks) yields NULL instead of ANSI
    DIVIDE_BY_ZERO. Scale shape: token counting is the token_topk
    vocab-sized agg + TakeOrderedAndProject top-100; the regression
    itself runs on 100 rows."""
    d = t(spark, sf, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), "tk").limit(100)
    w = Window.orderBy(F.desc("c"), "tk")
    pts = top.select(
        F.round(F.lit(1000.0) * F.log(F.row_number().over(w).cast("double")), 0)
        .cast("long")
        .alias("x"),
        F.round(F.lit(1000.0) * F.log(F.col("c").cast("double")), 0)
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope_raw = num.cast("double") / den
    bad = (F.col("n") < 2) | (den == 0)
    return s.select(
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(slope_raw, 6) + F.lit(0.0))
        .alias("slope"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("sy").cast("double") - slope_raw * F.col("sx"))
                / F.col("n")
                / 1000.0,
                6,
            )
            + F.lit(0.0)
        )
        .alias("intercept"),
    )


# ---------------------------------------------------------------------------
# hour-of-week load heatmap — day-of-week from pure epoch arithmetic
# ---------------------------------------------------------------------------
@q(
    "events_heatmap",
    f"""
    SELECT CAST(((CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                       AS BIGINT) % 7) + 7) % 7 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_heatmap(spark, sf):
    """Hour-of-week load heatmap (day-of-week x hour-of-day counts) —
    the capacity-planning / crawl-politeness matrix. Day-of-week is
    PURE INTEGER arithmetic on days since the fixed Monday epoch
    (((day_num % 7) + 7) % 7, so 0 = Monday), NEVER the engines'
    dayofweek() — Spark counts 1 = Sunday while DuckDB counts
    0 = Sunday, and both shift with session locale settings; epoch
    arithmetic is engine- and locale-invariant (the retention_cohorts
    week-bucket lesson). hour() agrees on both engines under the
    UTC-pinned naive-timestamp session. One map-side-combinable agg
    to a 168-cell relation."""
    e = t(spark, sf, "events").filter(F.col("ts").isNotNull())
    day_num = F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("long")
    return e.groupBy(
        (((day_num % 7) + 7) % 7).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


# ---------------------------------------------------------------------------
# CUSUM changepoint over the daily series — all scoring in exact BIGINTs
# ---------------------------------------------------------------------------
@q(
    "events_changepoint",
    f"""
    WITH day_sums AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM({SQL_CENTS.format(x='value')}) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    sc AS (
      SELECT event_type, day_num,
             ABS(COUNT(*) OVER (PARTITION BY event_type)
                 * SUM(v) OVER (PARTITION BY event_type ORDER BY day_num
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
                 - ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY day_num)
                   * SUM(v) OVER (PARTITION BY event_type)) AS score,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_days,
             SUM(v) OVER (PARTITION BY event_type) AS total_cents
      FROM day_sums)
    SELECT event_type, CAST(day_num AS INT) AS cp_day,
           CAST(score AS BIGINT) AS score, n_days,
           CASE WHEN n_days * ABS(total_cents) = 0 THEN NULL
                ELSE round(CAST(score AS DOUBLE) / n_days
                           / ABS(total_cents), 6) + 0
           END AS rel
    FROM sc
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY score DESC, day_num) = 1
    """,
)
def events_changepoint(spark, sf):
    """CUSUM changepoint detection per event type: the day where the
    cumulative deviation of the daily revenue series from its own
    mean peaks — the standard single-changepoint screen for "did this
    event's level shift, and when?" (a crawl source going dark, a
    price change, a bot burst). Exactness: with D days, total T and
    prefix sums P_d, the CUSUM statistic |P_d - d*T/D| is scaled by D
    to |D*P_d - d*T| — a pure-BIGINT score with NO division, so the
    argmax (ties -> earliest day) is engine-exact; the normalized
    `rel` derives from the exact integers afterward (NULL-guarded:
    a zero-total series has no scale). Scale shape: one map-side-
    combinable agg to the calendar-sized day relation, windows
    partitioned BY TYPE (no single-partition window), argmax via a
    rank-1 filter on the same partitioning — one exchange reused by
    all four window functions."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    ds = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("long").alias(
            "day_num"
        ),
    ).agg(F.sum(cents(F.col("value"))).alias("v"))
    wp = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("day_num")
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sc = ds.select(
        "event_type",
        "day_num",
        F.abs(
            F.count(F.lit(1)).over(wp) * F.sum("v").over(wcum)
            - F.row_number().over(wo).cast("long") * F.sum("v").over(wp)
        ).alias("score"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n_days"),
        F.sum("v").over(wp).alias("total_cents"),
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("score"), "day_num")
    )
    return (
        sc.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day_num").cast("int").alias("cp_day"),
            "score",
            "n_days",
            F.when(
                F.col("n_days") * F.abs("total_cents") == 0,
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    F.col("score").cast("double")
                    / F.col("n_days")
                    / F.abs("total_cents"),
                    6,
                )
                + F.lit(0.0)
            )
            .alias("rel"),
        )
    )


# ---------------------------------------------------------------------------
# one-way ANOVA across event types — per-group terms quantized to BIGINT
# ---------------------------------------------------------------------------
@q(
    "stat_anova",
    f"""
    WITH qv AS (
      SELECT event_type, {SQL_CENTS.format(x='value')} AS q
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g, SUM(q) AS s_g,
             SUM(q * q) AS s2_g
      FROM qv GROUP BY event_type),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(n_g) AS n, SUM(s_g) AS s
      FROM g),
    terms AS (
      SELECT CAST(round(n_g
                        * (CAST(s_g AS DOUBLE) / n_g
                           - CAST(tot.s AS DOUBLE) / tot.n)
                        * (CAST(s_g AS DOUBLE) / n_g
                           - CAST(tot.s AS DOUBLE) / tot.n)) AS BIGINT)
               AS ssb_t,
             CAST(round(CAST(s2_g AS DOUBLE)
                        - CAST(s_g AS DOUBLE) * s_g / n_g) AS BIGINT)
               AS ssw_t
      FROM g CROSS JOIN tot),
    ag AS (SELECT SUM(ssb_t) AS ssb, SUM(ssw_t) AS ssw FROM terms)
    SELECT tot.k, tot.n, ag.ssb, ag.ssw,
           CASE WHEN tot.k < 2 OR tot.n <= tot.k OR ag.ssw = 0 THEN NULL
                ELSE round((CAST(ag.ssb AS DOUBLE) / (tot.k - 1))
                           / (CAST(ag.ssw AS DOUBLE) / (tot.n - tot.k)),
                           6) + 0
           END AS f_stat
    FROM tot CROSS JOIN ag
    """,
)
def stat_anova(spark, sf):
    """One-way ANOVA F-test: does mean event value differ across
    event types? — the multi-group generalization of stat_ttest (the
    canonical "is this segmentation real" screen before acting on a
    per-type difference). Exactness: per-group count/sum/sum-of-
    squares are exact BIGINT cents moments; each group's
    between/within sum-of-squares term is computed in ONE identical
    float op order from those integers and rounded to an integer
    cents^2 unit (the kg_adamic_adar per-term quantization, applied
    to squares instead of logs), so the cross-group sums are exact
    order-independent BIGINT aggs and F derives in one identical
    division chain, rounded to 6. Degenerate inputs (k < 2 groups,
    no residual df, zero within-variance) yield NULL instead of ANSI
    DIVIDE_BY_ZERO. Scale shape: one map-side-combinable agg to a
    |types|-sized relation; everything after runs on <= k rows."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(cents(F.col("value"))).alias("s_g"),
        F.sum(cents(F.col("value")) * cents(F.col("value"))).alias("s2_g"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
    )
    dev = F.col("s_g").cast("double") / F.col("n_g") - F.col("s").cast(
        "double"
    ) / F.col("n")
    terms = g.crossJoin(tot).select(
        F.round(F.col("n_g") * dev * dev)
        .cast("long")
        .alias("ssb_t"),
        F.round(
            F.col("s2_g").cast("double")
            - F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
        )
        .cast("long")
        .alias("ssw_t"),
    )
    ag = terms.agg(F.sum("ssb_t").alias("ssb"), F.sum("ssw_t").alias("ssw"))
    bad = (
        (F.col("k") < 2)
        | (F.col("n") <= F.col("k"))
        | (F.col("ssw") == 0)
    )
    return tot.crossJoin(ag).select(
        "k",
        "n",
        "ssb",
        "ssw",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("ssb").cast("double") / (F.col("k") - 1))
                / (F.col("ssw").cast("double") / (F.col("n") - F.col("k"))),
                6,
            )
            + F.lit(0.0)
        )
        .alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Gini concentration of the vocabulary — rank-sum via count-of-counts
# ---------------------------------------------------------------------------
@q(
    "stat_gini",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    cnt AS (
      SELECT tk, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE tk <> '' GROUP BY tk),
    cc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM cnt GROUP BY c),
    blk AS (
      SELECT c, m,
             COALESCE(SUM(m) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND 1 PRECEDING), 0) + 1
               AS start
      FROM cc),
    s AS (
      SELECT SUM(m) AS n_vocab, SUM(c * m) AS total_tokens,
             SUM(c * ((m * (2 * start + m - 1)) // 2)) AS sic
      FROM blk)
    SELECT n_vocab, total_tokens,
           CASE WHEN n_vocab IS NULL OR n_vocab * total_tokens = 0 THEN NULL
                ELSE round(CAST(2 * sic - (n_vocab + 1) * total_tokens
                                AS DOUBLE)
                           / (n_vocab * total_tokens), 6) + 0
           END AS gini
    FROM s
    """,
)
def stat_gini(spark, sf):
    """Gini coefficient of the token-frequency distribution — the
    one-number vocabulary-concentration probe (a deduplicated natural
    corpus sits high ~0.9+; template floods push it toward 1, heavy
    synthetic uniqueness pulls it down; track per snapshot alongside
    text_zipf_fit's slope). Exactness: Gini needs the rank-weighted
    sum over counts sorted ascending, which is tie-invariant — so
    instead of globally ranking the vocab-sized relation (a single-
    partition window at web scale), aggregate to COUNT-OF-COUNTS
    first: each distinct frequency c with multiplicity m occupies a
    consecutive rank block whose rank-sum m*(2*start+m-1)/2 is closed
    -form (exactly even, integer `div`), so the window runs over the
    |distinct frequencies| relation — thousands of rows at any corpus
    size. All moments are BIGINTs; one guarded division at the end.
    Scale shape: vocab agg (map-side combine) -> count-of-counts agg
    -> tiny-relation window; no vocab-sized sort anywhere."""
    d = t(spark, sf, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
        .groupBy("tk")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cc = cnt.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("m"))
    w = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    blk = cc.select(
        "c",
        "m",
        (F.coalesce(F.sum("m").over(w), F.lit(0)) + 1).alias("start"),
    )
    s = blk.agg(
        F.sum("m").alias("n_vocab"),
        F.sum(F.col("c") * F.col("m")).alias("total_tokens"),
        F.sum(
            F.col("c")
            * F.expr("(m * (2 * start + m - 1)) div 2")
        ).alias("sic"),
    )
    bad = F.col("n_vocab").isNull() | (
        F.col("n_vocab") * F.col("total_tokens") == 0
    )
    return s.select(
        "n_vocab",
        "total_tokens",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (
                    2 * F.col("sic")
                    - (F.col("n_vocab") + 1) * F.col("total_tokens")
                ).cast("double")
                / (F.col("n_vocab") * F.col("total_tokens")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("gini"),
    )


# ---------------------------------------------------------------------------
# lag-1..7 autocorrelation of the daily series — bounded explode equi-join
# ---------------------------------------------------------------------------
@q(
    "events_autocorr",
    f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM({SQL_CENTS.format(x='value')}) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    px AS (
      SELECT CAST(t.l AS BIGINT) AS lag, day_num + t.l AS tgt, v AS x
      FROM daily, unnest([1, 2, 3, 4, 5, 6, 7]) AS t(l)),
    pairs AS (
      SELECT px.lag, px.x, b.v AS y
      FROM px JOIN daily b ON b.day_num = px.tgt),
    m AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
             SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx,
             SUM(y * y) AS syy
      FROM pairs GROUP BY lag)
    SELECT CAST(lag AS INT) AS lag, n,
           CASE WHEN n < 2
                     OR (n * sxx - sx * sx) * (n * syy - sy * sy) <= 0
                THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)),
                           6) + 0
           END AS r
    FROM m
    """,
)
def events_autocorr(spark, sf):
    """Lag-1..7 autocorrelation of the daily revenue series — the
    seasonality probe behind events_heatmap (a strong lag-7 spike
    means weekly periodicity; lag-1 near 1 means the series is a
    random walk and day-over-day deltas, not levels, should drive
    alerts). Shape: the lagged pairing is the events_rolling_dau
    bounded-explode pattern — each day fans out x7 to (lag, day+lag)
    and EQUI-joins back to the calendar-sized daily relation (no
    range join, no self-cross-join); Pearson per lag then runs on
    exact BIGINT moments (daily totals floored to whole dollars via
    integer `div` to keep the five moment sums in BIGINT headroom at
    any corpus scale), one identically-ordered division chain,
    round-6, zero-variance and n<2 guarded to NULL."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("long").alias(
                "day_num"
            )
        )
        .agg(F.sum(cents(F.col("value"))).alias("vc"))
        .select("day_num", F.expr("vc div 100").alias("v"))
    )
    px = daily.select(
        "day_num",
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
    ).select(
        F.col("lag").cast("long").alias("lag"),
        (F.col("day_num") + F.col("lag")).alias("tgt"),
        F.col("v").alias("x"),
    )
    b = daily.select(F.col("day_num").alias("tgt"), F.col("v").alias("y"))
    m = (
        px.join(b, "tgt")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    bad = (F.col("n") < 2) | (vx * vy <= 0)
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (
                    F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
                ).cast("double")
                / F.sqrt(vx.cast("double") * vy.cast("double")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("r"),
    )


# ---------------------------------------------------------------------------
# Flesch-style readability — map-only, JVM regex counting, zero UDF
# ---------------------------------------------------------------------------
@q(
    "text_readability",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(COALESCE(text, ''), ' '),
                                  x -> x <> '')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(COALESCE(text, ''), '[.!?]+'))
                  AS BIGINT) AS sentences,
             CAST(len(regexp_extract_all(lower(COALESCE(text, '')),
                                         '[aeiouy]+')) AS BIGINT)
               AS syllables
      FROM documents)
    SELECT doc_id, words, sentences, syllables,
           CASE WHEN words = 0 OR sentences = 0 THEN NULL
                ELSE round(206.835
                           - 1.015 * (CAST(words AS DOUBLE) / sentences)
                           - 84.6 * (CAST(syllables AS DOUBLE) / words),
                           6) + 0
           END AS flesch
    FROM m
    """,
)
def text_readability(spark, sf):
    """Flesch-reading-ease per document with a deterministic
    vowel-group syllable proxy — the grade-level quality signal that
    complements the Gopher-style surface stats in text_quality
    (training-mix recipes bucket web text by readability; the proxy
    is the standard cheap stand-in where a dictionary syllabifier is
    unavailable, and it only needs to be CONSISTENT to rank/bucket).
    Engine parity: all three counts are regex/structural counts with
    identical semantics in Java regex and RE2 (plain character
    classes, no lookaround — the text_token_bpe constraint); NULL
    text coalesces to '' (Spark size(split(NULL)) is -1 where DuckDB
    len(NULL) is NULL — coalescing removes the hazard); the score is
    one identically-ordered float chain, round-6, NULL-guarded on
    wordless/sentenceless docs. Scale shape: map-only, zero Exchange,
    scan pruned to (doc_id, text); regexes compile once per task via
    JVM codegen (the pii_redact precedent) — no Python in the path."""
    d = t(spark, sf, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    m = d.select(
        "doc_id",
        F.size(F.filter(F.split(txt, " "), lambda x: x != F.lit("")))
        .cast("long")
        .alias("words"),
        F.regexp_count(txt, F.lit("[.!?]+")).cast("long").alias("sentences"),
        F.regexp_count(F.lower(txt), F.lit("[aeiouy]+"))
        .cast("long")
        .alias("syllables"),
    )
    bad = (F.col("words") == 0) | (F.col("sentences") == 0)
    return m.select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(206.835)
                - 1.015
                * (F.col("words").cast("double") / F.col("sentences"))
                - 84.6
                * (F.col("syllables").cast("double") / F.col("words")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("flesch"),
    )


# ---------------------------------------------------------------------------
# cross-document boilerplate spans — 8-token shingle doc-frequency mining
# ---------------------------------------------------------------------------
@q(
    "text_boilerplate",
    """
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '),
                                 x -> x <> '') AS ts
      FROM documents),
    sh AS (
      SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS shingle
      FROM tk, unnest(range(1, len(ts) - 6)) AS t(i)
      WHERE len(ts) >= 8),
    df AS (
      SELECT shingle, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(COUNT(*) AS BIGINT) AS occurrences,
             MIN(doc_id) AS example_doc
      FROM sh GROUP BY shingle
      HAVING COUNT(DISTINCT doc_id) >= 2)
    SELECT shingle, df, occurrences, example_doc
    FROM df
    QUALIFY ROW_NUMBER() OVER (ORDER BY df DESC, occurrences DESC,
                               shingle) <= 20
    """,
)
def text_boilerplate(spark, sf):
    """Cross-document boilerplate-span miner: the top 8-token
    shingles by document frequency — the SPAN-level complement of
    dedup_lines (which needs duplicated text to share line breaks)
    and the discovery step before scrubbing navigation chrome /
    cookie banners / license footers that near-dedup won't catch
    (the spans repeat across otherwise-distinct pages). This is the
    n-gram-frequency technique behind C4/Gopher boilerplate analysis.
    Scale shape: shingling is map-side (transform over the token
    array — one corpus scan, rows fan out by ~|tokens|); the
    doc-frequency agg is the single shuffle (count-distinct plans as
    the standard two-phase Expand agg); df >= 2 prunes the vast
    unique-shingle tail BEFORE the top-k, which is
    TakeOrderedAndProject (no global sort materialized). Ties break
    by occurrence count then shingle text, so top-20 is fully
    deterministic."""
    d = t(spark, sf, "documents")
    tk = d.select(
        "doc_id",
        F.filter(
            F.split(F.coalesce(F.col("text"), F.lit("")), " "),
            lambda x: x != F.lit(""),
        ).alias("ts"),
    ).filter(F.size("ts") >= 8)
    sh = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 7),"
                " i -> concat_ws(' ', slice(ts, i, 8)))"
            )
        ).alias("shingle"),
    )
    df = (
        sh.groupBy("shingle")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("occurrences"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("df") >= 2)
    )
    return df.orderBy(
        F.desc("df"), F.desc("occurrences"), "shingle"
    ).limit(20)


# ---------------------------------------------------------------------------
# leave-one-out target encoding — exact rational per row, unhinted join
# ---------------------------------------------------------------------------
@q(
    "feat_target_encode",
    f"""
    WITH qv AS (
      SELECT event_id, event_type, {SQL_CENTS.format(x='value')} AS q
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g, SUM(q) AS s_g
      FROM qv GROUP BY event_type)
    SELECT qv.event_id, qv.event_type,
           CASE WHEN g.n_g < 2 THEN NULL
                ELSE round(CAST(g.s_g - qv.q AS DOUBLE) / (g.n_g - 1)
                           / 100.0, 6) + 0
           END AS loo_mean
    FROM qv JOIN g ON g.event_type = qv.event_type
    """,
)
def feat_target_encode(spark, sf):
    """Leave-one-out target encoding of a categorical feature: each
    row's category is replaced by the mean target over the OTHER
    rows of its category, (sum_g - own)/(n_g - 1) — the standard
    high-cardinality-categorical featurizer, in its leakage-free
    form (including the row's own target in its encoding is the
    classic train-time leak; LOO is the fix, and it needs exactly
    this join shape). Exactness: group sums are BIGINT cents, each
    row's encoding is ONE identically-ordered division of exact
    integers, round-6; singleton categories (n_g = 1) are NULL (no
    peers to encode from) instead of DIVIDE_BY_ZERO. Scale shape:
    one map-side-combinable agg to the |categories| relation, then
    an UNHINTED equi-join back to the fact rows — AQE broadcasts the
    category side when it fits and falls back to shuffle when a web-
    scale cardinality doesn't (the text_unigram_lm lesson: never
    force-broadcast a data-dependent relation)."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    qv = e.select(
        "event_id", "event_type", cents(F.col("value")).alias("q")
    )
    g = qv.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("q").alias("s_g"),
    )
    j = qv.join(g, "event_type")
    return j.select(
        "event_id",
        "event_type",
        F.when(F.col("n_g") < 2, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("s_g") - F.col("q")).cast("double")
                / (F.col("n_g") - 1)
                / 100.0,
                6,
            )
            + F.lit(0.0)
        )
        .alias("loo_mean"),
    )


# ---------------------------------------------------------------------------
# seasonal-naive forecast backtest — exact integer error aggregation
# ---------------------------------------------------------------------------
@q(
    "events_forecast",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM({SQL_CENTS.format(x='value')}) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    j AS (
      SELECT a.event_type, a.v AS actual, b.v AS pred
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day_num = a.day_num - 7)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ABS(actual - pred)) AS BIGINT) AS abs_err_cents,
           round(CAST(SUM(ABS(actual - pred)) AS DOUBLE) / COUNT(*)
                 / 100.0, 6) + 0 AS mae_dollars,
           CASE WHEN SUM(ABS(actual)) = 0 THEN NULL
                ELSE round(CAST(SUM(ABS(actual - pred)) AS DOUBLE)
                           / SUM(ABS(actual)), 6) + 0
           END AS wape
    FROM j GROUP BY event_type
    """,
)
def events_forecast(spark, sf):
    """Seasonal-naive forecast backtest: predict each day's per-type
    total with the value 7 days earlier and report MAE / WAPE — the
    baseline every forecasting pipeline must beat before any model
    ships (if a learned forecaster can't beat "same day last week",
    it's noise), and the standing data-quality alarm when WAPE jumps.
    Exactness: the error aggregation is pure BIGINT (abs diffs of
    cents sums); MAE/WAPE are single identically-ordered divisions
    at the end, round-6, WAPE NULL-guarded on an all-zero
    denominator. Only days with a lag-7 partner score (gaps excluded
    from the backtest window — the join, not a gap-fill, defines the
    overlap). Scale shape: one map-side-combinable agg to the
    calendar-sized daily relation; the lag pairing is a self-equi-
    join on (type, day-7) — calendar-sized, trivially shuffled."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("long").alias(
            "day_num"
        ),
    ).agg(F.sum(cents(F.col("value"))).alias("v"))
    a = daily.select(
        "event_type", (F.col("day_num") - 7).alias("lag_day"),
        F.col("v").alias("actual"),
    )
    b = daily.select(
        "event_type", F.col("day_num").alias("lag_day"),
        F.col("v").alias("pred"),
    )
    j = a.join(b, ["event_type", "lag_day"])
    err = F.abs(F.col("actual") - F.col("pred"))
    g = j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(err).alias("abs_err_cents"),
        F.sum(F.abs("actual")).alias("sum_abs_actual"),
    )
    return g.select(
        "event_type",
        "n",
        "abs_err_cents",
        (
            F.round(
                F.col("abs_err_cents").cast("double") / F.col("n") / 100.0, 6
            )
            + F.lit(0.0)
        ).alias("mae_dollars"),
        F.when(F.col("sum_abs_actual") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("abs_err_cents").cast("double")
                / F.col("sum_abs_actual"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("wape"),
    )


# ---------------------------------------------------------------------------
# first-occurrence shingle novelty — per-doc contribution scoring
# ---------------------------------------------------------------------------
@q(
    "text_novelty",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr
                 FROM documents),
    g AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 2)) AS i
          FROM tok WHERE len(arr) >= 3),
    shp AS (SELECT DISTINCT doc_id,
                   arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
            FROM g),
    fst AS (SELECT sh, MIN(doc_id) AS first_doc FROM shp GROUP BY sh)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0
                          END) AS DOUBLE) / COUNT(*), 6) + 0 AS novelty
    FROM shp s JOIN fst f USING (sh)
    GROUP BY s.doc_id
    """,
)
def text_novelty(spark, sf):
    """Per-document NOVELTY: the fraction of a doc's distinct 3-token
    shingles that first appear in that doc, attributing each shingle
    to MIN(doc_id) — the contribution score used to rank crawl
    snapshots for training value (a doc whose shingles all appeared
    earlier adds nothing; dedup_lines / text_boilerplate remove the
    repeats, this face SCORES the remainder). Exactness: counts are
    BIGINT; novelty is one exact-rational division rounded to 6.
    Docs with < 3 tokens have no shingles and are (deterministically)
    absent. Scale shape: shingles explode map-side and dedup per doc
    into a corpus-scale relation; MIN(doc_id) per shingle is a
    map-side-combinable agg; the attribution attach is an UNHINTED
    shuffle equi-join on the shingle (the survivors-anti-join lesson
    — never force a corpus-cardinality relation into a broadcast);
    the final per-doc agg is document-cardinality. Audit check #40
    asserts the attach stays a shuffle join."""
    d = t(spark, sf, "documents")
    arr = d.select("doc_id", F.split("text", " ").alias("arr")).filter(
        F.size("arr") >= 3
    )
    sh = arr.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(arr) - 3), i -> "
                "concat_ws(' ', arr[i], arr[i + 1], arr[i + 2]))"
            )
        ).alias("sh"),
    ).distinct()
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    j = sh.join(first, "sh")
    agg = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(
            F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_novel"),
    )
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        (
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles"), 6
            )
            + F.lit(0.0)
        ).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# ABC (Pareto 80/95) classification — distributed exclusive prefix sum
# ---------------------------------------------------------------------------
@q(
    "abc_classification",
    f"""
    WITH rev AS (
      SELECT l_partkey, SUM({SQL_CENTS.format(x='l_extendedprice')}) AS rev
      FROM lineitem GROUP BY 1),
    tot AS (SELECT SUM(rev) AS t FROM rev),
    c AS (SELECT rev,
                 SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum
          FROM rev)
    SELECT CASE WHEN cum * 100 <= t * 80 THEN 'A'
                WHEN cum * 100 <= t * 95 THEN 'B'
                ELSE 'C' END AS cls,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev) AS BIGINT) AS revenue_cents,
           round(CAST(SUM(rev) AS DOUBLE) / MAX(t), 6) + 0 AS share
    FROM c CROSS JOIN tot
    GROUP BY 1
    """,
)
def abc_classification(spark, sf):
    """ABC (Pareto) inventory classification: parts covering the first
    80% of cumulative revenue are class A, the next 15% B, the tail C
    — the classic warehouse stratification, and the shape every
    'cumulative share of a totally ordered fact' report takes. The
    interesting part at scale is the GLOBAL running sum: a
    single-partition window over the part dimension would serialize
    billions of rows through one task, so this face implements the
    distributed exclusive-prefix-sum (scan) idiom instead —
    repartitionByRange on the total order (rev DESC, partkey ASC),
    freeze the partition ids with a parquet checkpoint, collect the
    16 per-partition sums (driver-sized by construction), and add
    each partition's exclusive offset literal to a WITHIN-partition
    running sum. Audit check #40 asserts the final plan has NO
    Exchange SinglePartition. Exactness: revenue is exact integer
    cents; class thresholds are integer cross-multiplications
    (cum*100 <= t*80) with a total tie-free order, so the cut is
    engine-stable; shares are one final round-6 division."""
    rev = (
        t(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("rev"))
    )
    from ..operators.dedup import parquet_checkpoint

    ranged = parquet_checkpoint(
        rev.repartitionByRange(16, F.desc("rev"), F.asc("l_partkey"))
        .withColumn("pid", F.spark_partition_id()),
        "abc_ranged",
    )
    sums = {
        int(r["pid"]): int(r["s"])
        for r in ranged.groupBy("pid")
        .agg(F.sum("rev").alias("s"))
        .collect()
    }
    total = sum(sums.values())
    off, acc = {}, 0
    for pid in sorted(sums):
        off[pid] = acc
        acc += sums[pid]
    if off:
        off_expr = F.create_map(
            *[F.lit(x) for kv in off.items() for x in kv]
        )[F.col("pid")].cast("long")
    else:
        off_expr = F.lit(0).cast("long")
    w = (
        Window.partitionBy("pid")
        .orderBy(F.desc("rev"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (off_expr + F.sum("rev").over(w)).alias("cum")
    cls = (
        F.when(F.col("cum") * 100 <= F.lit(total * 80), "A")
        .when(F.col("cum") * 100 <= F.lit(total * 95), "B")
        .otherwise("C")
    )
    return (
        ranged.select("rev", cum)
        .select("rev", cls.alias("cls"))
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
            (
                F.round(
                    F.sum("rev").cast("double") / F.lit(float(total)), 6
                )
                + F.lit(0.0)
            ).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Cramér's V — chi-square effect size from micros-quantized cell terms
# ---------------------------------------------------------------------------
@q(
    "stat_cramers_v",
    """
    WITH obs AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2),
    rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS nr FROM obs GROUP BY r),
    ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS nc FROM obs GROUP BY c),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT r) AS BIGINT) AS nrows,
                 CAST(COUNT(DISTINCT c) AS BIGINT) AS ncols
          FROM obs),
    grid AS (
      SELECT rt.r, ct.c, rt.nr, ct.nc, COALESCE(obs.o, 0) AS o
      FROM rt CROSS JOIN ct
      LEFT JOIN obs ON obs.r = rt.r AND obs.c = ct.c),
    cell AS (
      SELECT CAST(round(1000000.0
               * (o - CAST(nr AS DOUBLE) * nc / n.n)
               * (o - CAST(nr AS DOUBLE) * nc / n.n)
               / (CAST(nr AS DOUBLE) * nc / n.n)) AS BIGINT) AS chi_us
      FROM grid CROSS JOIN n),
    s AS (SELECT SUM(chi_us) AS schi FROM cell)
    SELECT n.n, (n.nrows - 1) * (n.ncols - 1) AS df,
           CASE WHEN n.n = 0 THEN NULL
                ELSE round(CAST(schi AS DOUBLE) / 1000000.0, 6) + 0
           END AS chi2,
           CASE WHEN n.n = 0 OR LEAST(n.nrows, n.ncols) < 2 THEN NULL
                ELSE round(sqrt(CAST(schi AS DOUBLE) / 1000000.0
                                / (n.n * (LEAST(n.nrows, n.ncols) - 1))),
                           6) + 0
           END AS v
    FROM s CROSS JOIN n
    """,
)
def stat_cramers_v(spark, sf):
    """Cramér's V — the normalized effect size of association between
    two categoricals (order priority x status), the number that makes
    chi-square comparable across tables of different size (V in
    [0, 1]; drift monitors alert on V, not on the raw statistic whose
    scale grows with n). The contingency grid is the FULL cross of
    observed row/column categories with zero cells COALESCEd in
    (chi-square needs the empty cells' expected mass); each cell term
    (O-E)^2/E is computed in identical operation order on both
    engines and quantized to integer MICROS before the sum, so the
    global chi2 is an exact order-independent BIGINT agg (the
    float-accumulation trap a naive SUM of doubles would hit under
    Spark's partial aggregation). V then derives from the one exact
    integer; degenerate tables (empty, or a single row/column
    category) yield NULL instead of ANSI errors. Scale shape: one
    map-side-combinable count agg to the bounded category lattice;
    everything after runs on grid-sized relations."""
    obs = (
        t(spark, sf, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("r"),
            F.col("o_orderstatus").alias("c"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rt = obs.groupBy("r").agg(F.sum("o").cast("long").alias("nr"))
    ct = obs.groupBy("c").agg(F.sum("o").cast("long").alias("nc"))
    n = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("r").cast("long").alias("nrows"),
        F.countDistinct("c").cast("long").alias("ncols"),
    )
    grid = (
        rt.crossJoin(ct)
        .join(obs, ["r", "c"], "left")
        .select("r", "c", "nr", "nc", F.coalesce("o", F.lit(0)).alias("o"))
        .crossJoin(F.broadcast(n))
    )
    e = F.col("nr").cast("double") * F.col("nc") / F.col("n")
    cell = grid.select(
        F.round(
            F.lit(1000000.0)
            * (F.col("o") - e)
            * (F.col("o") - e)
            / e
        )
        .cast("long")
        .alias("chi_us")
    )
    s = cell.agg(F.sum("chi_us").alias("schi")).crossJoin(F.broadcast(n))
    mindim = F.least(F.col("nrows"), F.col("ncols"))
    chi2 = F.col("schi").cast("double") / F.lit(1000000.0)
    return s.select(
        "n",
        ((F.col("nrows") - 1) * (F.col("ncols") - 1)).alias("df"),
        F.when(F.col("n") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(chi2, 6) + F.lit(0.0))
        .alias("chi2"),
        F.when(
            (F.col("n") == 0) | (mindim < 2), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                F.sqrt(chi2 / (F.col("n") * (mindim - 1))), 6
            )
            + F.lit(0.0)
        )
        .alias("v"),
    )


# ---------------------------------------------------------------------------
# mutual information between two categorical columns — micros-exact
# ---------------------------------------------------------------------------
@q(
    "stat_mutual_info",
    """
    WITH cell AS (
      SELECT l_returnflag AS x, l_linestatus AS y,
             CAST(COUNT(*) AS BIGINT) AS nxy
      FROM lineitem GROUP BY 1, 2),
    mx AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM cell GROUP BY x),
    my AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM cell GROUP BY y),
    n AS (SELECT CAST(COALESCE(SUM(nxy), 0) AS BIGINT) AS n FROM cell),
    term AS (
      SELECT cell.nxy,
             CAST(round(1000000.0 * ln(
               (CAST(cell.nxy AS DOUBLE) * n.n)
               / (CAST(mx.nx AS DOUBLE) * my.ny)), 0) AS BIGINT) AS t_us
      FROM cell JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n),
    s AS (SELECT CAST(COALESCE(SUM(nxy * t_us), 0) AS BIGINT) AS smi
          FROM term)
    SELECT n.n, (SELECT CAST(COUNT(*) AS BIGINT) FROM cell) AS n_cells,
           CASE WHEN n.n = 0 THEN NULL
                ELSE round(CAST(s.smi AS DOUBLE) / n.n / 1000000.0, 6) + 0
           END AS mi_nats
    FROM s CROSS JOIN n
    """,
)
def stat_mutual_info(spark, sf):
    """Mutual information I(X;Y) between two categorical columns
    (returnflag x linestatus) — the effect-size companion to
    stat_cramers_v that measures dependence in nats: I = sum over
    cells of p_xy * ln(p_xy / (p_x p_y)). The dependence test every
    feature-selection pass runs over candidate training features.
    Exactness: each cell's log-ratio argument is an exact rational of
    BIGINT counts evaluated in one operation order, the single ln is
    quantized to integer MICROS per cell, and the sum is then the
    exact integer agg sum(n_xy * t_us) — order-independent across
    engines and cluster sizes (the kg_adamic_adar sum-of-logs
    precedent) — divided by n only at the end. Scale shape: ONE
    map-side-combinable corpus agg produces the contingency cells
    (bounded by |X|x|Y|, never corpus-sized); marginals and total are
    WINDOWS over that cells relation — not separate re-aggregations,
    which would re-scan the corpus once per marginal — so the corpus
    is scanned exactly once. Empty input yields NULL, not a
    DIVIDE_BY_ZERO."""
    li = t(spark, sf, "lineitem")
    cell = (
        li.groupBy(
            F.col("l_returnflag").alias("x"),
            F.col("l_linestatus").alias("y"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("nxy"))
    )
    # marginals/total as WINDOWS over the cells relation (<= |X|*|Y|
    # rows) — per-branch column pruning would otherwise defeat
    # exchange reuse and re-scan the corpus once per marginal (the
    # events_gapfill lesson); this keeps the plan at ONE corpus scan.
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    g = cell.select(
        "nxy",
        F.sum("nxy").over(wx).cast("long").alias("nx"),
        F.sum("nxy").over(wy).cast("long").alias("ny"),
        F.sum("nxy").over(wall).cast("long").alias("n"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_cells"),
    )
    t_us = F.round(
        F.lit(1000000.0)
        * F.log(
            (F.col("nxy").cast("double") * F.col("n"))
            / (F.col("nx").cast("double") * F.col("ny"))
        ),
        0,
    ).cast("long")
    s = g.select(
        (F.col("nxy") * t_us).alias("prod"), "n", "n_cells"
    ).agg(
        F.coalesce(F.sum("prod"), F.lit(0)).cast("long").alias("smi"),
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.max("n_cells"), F.lit(0))
        .cast("long")
        .alias("n_cells"),
    )
    return s.select(
        "n",
        "n_cells",
        F.when(F.col("n") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("smi").cast("double")
                / F.col("n")
                / F.lit(1000000.0),
                6,
            )
            + F.lit(0.0)
        )
        .alias("mi_nats"),
    )


# ---------------------------------------------------------------------------
# correlated EXISTS / NOT EXISTS — Catalyst decorrelation to semi/anti join
# ---------------------------------------------------------------------------
@q(
    "join_exists_subq",
    """
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(round(SUM(c.c_acctbal) * 100) AS BIGINT) AS acctbal_cents
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def join_exists_subq(spark, sf):
    """Correlated EXISTS + NOT EXISTS subqueries — customers with at
    least one finished order and no urgent one — written as literal
    SQL subqueries and left to Catalyst to DECORRELATE: the EXISTS
    becomes a LeftSemi hash join and the NOT EXISTS a LeftAnti, both
    shuffle-joinable on o_custkey with the status filters pushed
    below the join (audited: no per-row re-execution of the subquery,
    no nested-loop). This is the API face for the subquery surface of
    the engine — the plan-shape guarantee is what makes correlated
    predicates safe at 10^12 fact rows, where a naive correlated
    evaluation would be O(n^2). The oracle is the identical ANSI
    text, so the face also pins that Spark's EXISTS semantics
    (including NULL-key behavior) match the reference SQL engine's."""
    t(spark, sf, "customer").createOrReplaceTempView("exsq_cust")
    t(spark, sf, "orders").createOrReplaceTempView("exsq_orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(round(SUM(c.c_acctbal) * 100) AS BIGINT)
                 AS acctbal_cents
        FROM exsq_cust c
        WHERE EXISTS (SELECT 1 FROM exsq_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM exsq_orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '1-URGENT')
        GROUP BY c.c_mktsegment
        """
    )


# ---------------------------------------------------------------------------
# star-schema join — one fact scan, every dimension broadcast
# ---------------------------------------------------------------------------
@q(
    "join_star",
    """
    SELECT r.r_name, p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(round(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100)
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 25
    GROUP BY r.r_name, p.p_brand
    """,
)
def join_star(spark, sf):
    """Star-schema rollup: revenue by supplier region x part brand —
    the canonical warehouse shape (one huge fact, a snowflake of
    small dimensions). The plan contract, asserted by the explain
    audit, is what survives 10^12 fact rows: ALL four dimension joins
    plan as BroadcastHashJoin (part/supplier/nation/region are
    executor-memory-sized at any realistic scale), so the fact table
    is scanned ONCE, never shuffled for a join, with the p_size
    filter pushed into the part scan BEFORE its broadcast and the
    revenue agg map-side combined — the only Exchange in the plan is
    the final (region, brand)-sized agg shuffle. No join hints: AQE
    picks broadcast from the dimension sizes, so the same query
    degrades gracefully to a shuffle join if a 'dimension' ever grows
    fact-sized. Revenue is summed as double then rounded once to
    cents (the SQL_CENTS convention — sub-cent accumulation error is
    orders of magnitude below the half-cent rounding guard)."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_size") <= 25)
    s = t(spark, sf, "supplier")
    na = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(na, s["s_nationkey"] == na["n_nationkey"])
        .join(r, na["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            cents(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Bollinger bands — rolling mean +/- 2 sigma with an all-integer breach test
# ---------------------------------------------------------------------------
@q(
    "events_bollinger",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM({SQL_CENTS.format(x='value')}) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    w AS (
      SELECT event_type, day_num, v,
             COUNT(*) OVER win AS cnt,
             SUM(v) OVER win AS s1,
             SUM(v * v) OVER win AS s2
      FROM daily
      WINDOW win AS (PARTITION BY event_type ORDER BY day_num
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT event_type, day_num, CAST(v AS BIGINT) AS dollars,
           round(s1 / 7.0, 6) + 0 AS mid,
           round(s1 / 7.0
                 + 2 * sqrt((7 * s2 - s1 * s1) / 42.0), 6) + 0 AS hi_band,
           round(s1 / 7.0
                 - 2 * sqrt((7 * s2 - s1 * s1) / 42.0), 6) + 0 AS lo_band,
           CAST(CASE WHEN 3 * (7 * v - s1) * (7 * v - s1)
                          > 14 * (7 * s2 - s1 * s1)
                     THEN CASE WHEN 7 * v > s1 THEN 1 ELSE -1 END
                     ELSE 0 END AS INT) AS breach
    FROM w WHERE cnt = 7
    """,
)
def events_bollinger(spark, sf):
    """Bollinger bands on the per-type daily revenue series: trailing
    7-observation mean +/- 2 sample standard deviations, and a breach
    flag (+1 above, -1 below) — the rolling-volatility alert the
    static faces can't express (events_outliers z-scores against the
    GLOBAL mean; events_mad against the per-type median; this face
    adapts to the LOCAL regime, so a level shift stops alerting once
    the window absorbs it). The breach decision never touches a
    float: |x - s1/7| > 2*sqrt((7*s2 - s1^2)/42) cross-multiplies to
    the all-integer test 3*(7x - s1)^2 > 14*(7*s2 - s1^2) over the
    BIGINT rolling sums (daily totals floored to whole dollars via
    integer div for BIGINT headroom at any corpus scale, the
    events_autocorr discipline); the displayed band edges are one
    identical float expression rounded to 6 on both engines. ROWS
    frame over observed days (partial windows filtered by cnt = 7;
    calendar gaps are events_gapfill's job). Scale shape: the corpus
    collapses to calendar-sized daily cells in one map-side-
    combinable agg; the window sorts many small per-type runs."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("long").alias(
                "day_num"
            ),
        )
        .agg(F.sum(cents(F.col("value"))).alias("vc"))
        .select("event_type", "day_num", F.expr("vc div 100").alias("v"))
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rowsBetween(-6, Window.currentRow)
    )
    w = daily.select(
        "event_type",
        "day_num",
        "v",
        F.count(F.lit(1)).over(win).alias("cnt"),
        F.sum("v").over(win).alias("s1"),
        F.sum(F.col("v") * F.col("v")).over(win).alias("s2"),
    ).filter(F.col("cnt") == 7)
    s1, s2, v = F.col("s1"), F.col("s2"), F.col("v")
    var_num = 7 * s2 - s1 * s1
    dev = 7 * v - s1
    band = 2 * F.sqrt(var_num / F.lit(42.0))
    return w.select(
        "event_type",
        "day_num",
        v.cast("long").alias("dollars"),
        (F.round(s1 / F.lit(7.0), 6) + F.lit(0.0)).alias("mid"),
        (F.round(s1 / F.lit(7.0) + band, 6) + F.lit(0.0)).alias("hi_band"),
        (F.round(s1 / F.lit(7.0) - band, 6) + F.lit(0.0)).alias("lo_band"),
        F.when(
            3 * dev * dev > 14 * var_num,
            F.when(7 * v > s1, 1).otherwise(-1),
        )
        .otherwise(0)
        .cast("int")
        .alias("breach"),
    )


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram probabilities — continuation counts
# ---------------------------------------------------------------------------
@q(
    "text_kn_bigram",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    g AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 1)) AS i
          FROM tok WHERE len(arr) >= 2),
    bg AS (SELECT arr[i] AS w1, arr[i + 1] AS w2 FROM g
           WHERE arr[i] <> '' AND arr[i + 1] <> ''),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM bg GROUP BY 1, 2),
    w AS (
      SELECT w1, w2, c12,
             SUM(c12) OVER (PARTITION BY w1) AS c1,
             COUNT(*) OVER (PARTITION BY w1) AS n1h,
             COUNT(*) OVER (PARTITION BY w2) AS n1c,
             COUNT(*) OVER () AS tt
      FROM cb)
    SELECT w1, w2, c12,
           CAST(c1 AS BIGINT) AS c1,
           CAST(n1h AS BIGINT) AS n1h,
           CAST(n1c AS BIGINT) AS n1c,
           round((c12 - 0.75) / c1
                 + 0.75 * n1h / c1 * (n1c * 1.0 / tt), 6) + 0 AS p_kn
    FROM w
    ORDER BY c12 DESC, w1, w2
    LIMIT 20
    """,
)
def text_kn_bigram(spark, sf):
    """Kneser-Ney smoothed bigram probabilities (absolute discount
    D = 0.75, the standard interpolated-KN form) for the corpus's
    top-20 bigrams — the smoothing text_bigram_lm deliberately
    avoids: MLE assigns boilerplate bigrams their raw frequency,
    while KN discounts every observed count and backs off to the
    CONTINUATION unigram N1+(.,w)/N1+(..) — "how many distinct
    contexts does w follow?" — the quantity that demotes words that
    are frequent only inside one frozen phrase (the famous
    "Francisco" example). Everything derives from the bigram-type
    support relation cb in one pass: head totals c1 and head
    fan-outs N1+(w1,.) as windows partitioned by w1, continuation
    counts N1+(.,w2) partitioned by w2, the type total as a
    frameless window (the stat_mutual_info marginals-as-windows
    rule — never a rescan of the corpus-sized bigram stream); all
    four are exact BIGINTs, p_kn is ONE identical float expression
    rounded to 6, and c12 >= 1 keeps the discounted term positive
    so no max(.,0) branch can diverge. Top-20 by the total order
    (c12 DESC, w1, w2) plans as TakeOrderedAndProject — the window
    exchanges shuffle only the vocab^2-bounded type relation."""
    d = t(spark, sf, "documents")
    arr = d.select(F.split("text", " ").alias("arr")).filter(
        F.size("arr") >= 2
    )
    bg = (
        arr.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(arr) - 2),"
                    " i -> struct(arr[i] AS w1, arr[i + 1] AS w2))"
                )
            ).alias("s")
        )
        .select("s.w1", "s.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    cb = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    w1w = Window.partitionBy("w1")
    w2w = Window.partitionBy("w2")
    wall = Window.partitionBy()
    w = cb.select(
        "w1",
        "w2",
        "c12",
        F.sum("c12").over(w1w).alias("c1"),
        F.count(F.lit(1)).over(w1w).alias("n1h"),
        F.count(F.lit(1)).over(w2w).alias("n1c"),
        F.count(F.lit(1)).over(wall).alias("tt"),
    )
    p_kn = (F.col("c12") - F.lit(0.75)) / F.col("c1") + F.lit(
        0.75
    ) * F.col("n1h") / F.col("c1") * (
        F.col("n1c") * F.lit(1.0) / F.col("tt")
    )
    return (
        w.select(
            "w1",
            "w2",
            "c12",
            F.col("c1").cast("long").alias("c1"),
            F.col("n1h").cast("long").alias("n1h"),
            F.col("n1c").cast("long").alias("n1c"),
            (F.round(p_kn, 6) + F.lit(0.0)).alias("p_kn"),
        )
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# keyed pseudonymization — joins survive, identities don't
# ---------------------------------------------------------------------------
@q(
    "privacy_pseudonymize",
    """
    WITH j AS (
      SELECT c.c_mktsegment AS seg, c.c_custkey AS k,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey)
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM j GROUP BY seg
    """,
)
def privacy_pseudonymize(spark, sf):
    """Keyed deterministic pseudonymization of the customer key on
    BOTH sides of the customer-orders join — the release transform
    between privacy_kanon's audit and pii_redact's in-text scrub: a
    shared analytics corpus must drop raw identifiers but KEEP
    referential integrity, so both tables map c_custkey through the
    same salted digest (a stand-in for HMAC; the salt is the secret
    that stops dictionary re-identification) and every downstream
    join keys on the pseudonym. The oracle twin runs the SAME
    analysis on the RAW keys — hash equality is the certificate
    that pseudonymization changed nothing an analyst sees: order
    counts, per-segment DISTINCT-customer counts (a digest
    collision would merge two customers and shrink the count), and
    revenue all survive. Map-only transform (one expression per
    side, no extra exchange beyond the join's own shuffle); the
    pseudonym occupies 16 hex chars, so at 100 TB the join key
    stays fixed-width."""
    salt = "pseud-salt-2026:"
    pseud = lambda c: F.substring(  # noqa: E731
        F.md5(F.concat(F.lit(salt), F.col(c).cast("string"))), 1, 16
    )
    c = t(spark, sf, "customer").select(
        pseud("c_custkey").alias("pk"), "c_mktsegment"
    )
    o = t(spark, sf, "orders").select(
        pseud("o_custkey").alias("pk"),
        cents(F.col("o_totalprice")).alias("cents"),
    )
    return (
        c.join(o, "pk")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("pk").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# Poisson dispersion index — is the daily arrival process clumped?
# ---------------------------------------------------------------------------
@q(
    "events_dispersion",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM daily GROUP BY event_type)
    SELECT event_type, n AS n_days,
           CASE WHEN n < 2 THEN NULL
                ELSE round(CAST(s1 AS DOUBLE) / n, 6) + 0 END AS mean_c,
           CASE WHEN n < 2 THEN NULL
                ELSE round((n * s2 - s1 * s1) * 1.0 / (n * (n - 1.0)), 6)
                     + 0 END AS var_c,
           CASE WHEN n < 2 OR s1 = 0 THEN NULL
                ELSE round((n * s2 - s1 * s1) * 1.0 / (n - 1.0) / s1, 6)
                     + 0 END AS dispersion,
           CASE WHEN n < 2 OR s1 = 0 THEN NULL
                ELSE n * s2 - s1 * s1 > s1 * (n - 1) END AS overdispersed
    FROM m
    """,
)
def events_dispersion(spark, sf):
    """Poisson dispersion index of the daily arrival counts per
    event type: variance-to-mean ratio of events-per-observed-day,
    with an overdispersion verdict — the process diagnostic BEFORE
    any rate model (a Poisson arrival stream has D = 1; D >> 1 means
    clumping — campaigns, retries, bot bursts — and every
    Poisson-assuming alert threshold is then wrong; events_autocorr
    asks WHEN the clumps repeat, this asks IF the process is even
    memoryless). One corpus scan to calendar x type cells, exact
    integer moments per type, and the verdict is the ALL-INTEGER
    cross-multiplication var > mean <=> n*s2 - s1^2 > s1*(n-1) —
    the boolean can't float-diverge; the displayed mean/var/D are
    one identical float expression each, round-6, with n < 2 and
    zero-count guards to NULL (ANSI divide hazard)."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("long").alias(
                "day_num"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    vnum = n * s2 - s1 * s1
    small = n < 2
    return m.select(
        "event_type",
        n.alias("n_days"),
        F.when(small, F.lit(None).cast("double"))
        .otherwise(F.round(s1.cast("double") / n, 6) + F.lit(0.0))
        .alias("mean_c"),
        F.when(small, F.lit(None).cast("double"))
        .otherwise(
            F.round(vnum * F.lit(1.0) / (n * (n - F.lit(1.0))), 6)
            + F.lit(0.0)
        )
        .alias("var_c"),
        F.when(small | (s1 == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(vnum * F.lit(1.0) / (n - F.lit(1.0)) / s1, 6)
            + F.lit(0.0)
        )
        .alias("dispersion"),
        F.when(small | (s1 == 0), F.lit(None).cast("boolean"))
        .otherwise(vnum > s1 * (n - 1))
        .alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# local maxima — strict daily peaks with neighbor prominence
# ---------------------------------------------------------------------------
@q(
    "events_peak",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM({SQL_CENTS.format(x='value')}) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    w AS (
      SELECT event_type, day_num, v,
             lag(v) OVER win AS pv, lead(v) OVER win AS nv
      FROM daily
      WINDOW win AS (PARTITION BY event_type ORDER BY day_num))
    SELECT event_type, day_num, CAST(v AS BIGINT) AS dollars,
           CAST(v - GREATEST(pv, nv) AS BIGINT) AS prominence
    FROM w
    WHERE pv IS NOT NULL AND nv IS NOT NULL AND v > pv AND v > nv
    """,
)
def events_peak(spark, sf):
    """Strict local maxima of the per-type daily revenue series with
    a neighbor prominence (how far the peak clears its higher
    shoulder) — the SHAPE detector the threshold family can't
    express: events_outliers flags level (a high plateau alerts
    every day), events_bollinger flags volatility, a PEAK is a
    point that beats BOTH neighbors, which is what campaign-spike
    and cron-burst triage actually looks for. One LAG and one LEAD
    on a shared window spec (single Window operator, one sort of
    the calendar-sized daily relation — the sql_named_window
    discipline), strict > on both sides so plateaus are not peaks
    (deterministic: all-integer dollar comparisons), series
    endpoints excluded (no neighbor = no verdict). Prominence is
    an exact BIGINT difference."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("long").alias(
                "day_num"
            ),
        )
        .agg(F.sum(cents(F.col("value"))).alias("vc"))
        .select("event_type", "day_num", F.expr("vc div 100").alias("v"))
    )
    win = Window.partitionBy("event_type").orderBy("day_num")
    w = daily.select(
        "event_type",
        "day_num",
        "v",
        F.lag("v").over(win).alias("pv"),
        F.lead("v").over(win).alias("nv"),
    )
    return w.filter(
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (F.col("v") > F.col("pv"))
        & (F.col("v") > F.col("nv"))
    ).select(
        "event_type",
        "day_num",
        F.col("v").cast("long").alias("dollars"),
        (F.col("v") - F.greatest("pv", "nv")).cast("long").alias(
            "prominence"
        ),
    )


# ---------------------------------------------------------------------------
# quantified subqueries — ANY / ALL decorrelation
# ---------------------------------------------------------------------------
@q(
    "sql_any_all",
    """
    WITH th AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderstatus = 'F')
    SELECT c.c_mktsegment AS seg,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN 20000000 < ANY (
                  SELECT cents FROM th
                  WHERE th.o_custkey = c.c_custkey) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_any_big,
           CAST(SUM(CASE WHEN 10000000 < ALL (
                  SELECT cents FROM th
                  WHERE th.o_custkey = c.c_custkey)
                  AND EXISTS (SELECT 1 FROM th
                              WHERE th.o_custkey = c.c_custkey)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_all_big
    FROM customer c
    GROUP BY c.c_mktsegment
    """,
)
def sql_any_all(spark, sf):
    """Quantified screens per customer — "has ANY finished order
    above $200k", "are ALL finished orders above $100k" — with the
    engine-parity lesson as the face itself: Spark 4 does NOT parse
    quantified comparison subqueries (`x > ANY (SELECT ...)` is a
    PARSE_SYNTAX_ERROR), so the Spark side runs the CANONICAL
    aggregate rewrite — ANY folds to a per-key MAX, ALL to a
    per-key MIN plus a non-emptiness guard (ALL over an empty set
    is vacuously TRUE; the business reading requires at least one
    order) — while the DuckDB twin keeps the literal ANY/ALL
    spelling, pinning both the divergence and the rewrite's
    correctness in one hash. The rewrite is also the SCALABLE plan:
    one map-side-combinable MAX/MIN per customer and one join,
    where a naive quantifier evaluation re-scans orders per
    customer. LEFT JOIN keeps orderless customers counted with
    both flags false (NULL comparisons fall to the ELSE arm)."""
    th = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    agg = th.groupBy("o_custkey").agg(
        F.max("cents").alias("mx"), F.min("cents").alias("mn")
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    j = c.join(agg, c.c_custkey == agg.o_custkey, "left")
    return j.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("mx") > 20000000, 1).otherwise(0))
        .cast("long")
        .alias("n_any_big"),
        F.sum(F.when(F.col("mn") > 10000000, 1).otherwise(0))
        .cast("long")
        .alias("n_all_big"),
    )


# ---------------------------------------------------------------------------
# burstiness coefficient — gap-based clumping, per event type
# ---------------------------------------------------------------------------
@q(
    "events_burstiness",
    """
    WITH ev AS (
      SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      FROM events WHERE ts IS NOT NULL),
    g AS (
      SELECT event_type,
             (us - lag(us) OVER (PARTITION BY event_type
                                 ORDER BY us, event_id)) // 1000000
               AS gap
      FROM ev),
    m AS (
      SELECT event_type, CAST(COUNT(gap) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS s1,
             CAST(SUM(gap * gap) AS BIGINT) AS s2
      FROM g GROUP BY event_type)
    SELECT event_type, n AS n_gaps,
           CASE WHEN n = 0 THEN NULL
                ELSE CAST(s1 // n AS BIGINT) END AS mean_gap_s,
           CASE WHEN n < 2 OR s1 = 0 THEN NULL
                ELSE round((sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1.0)))
                            - s1 * 1.0 / n)
                           / (sqrt((n * s2 - s1 * s1) * 1.0
                                   / (n * (n - 1.0)))
                              + s1 * 1.0 / n), 6) + 0
           END AS burstiness
    FROM m
    """,
)
def events_burstiness(spark, sf):
    """Goh-Barabási burstiness coefficient B = (σ−μ)/(σ+μ) of the
    inter-arrival gaps per event type — the GAP-based clumping
    measure completing events_dispersion's count-based one (they
    disagree exactly when it matters: hourly batch jobs give
    regular daily counts but pathological gaps; B → −1 is a
    metronome, 0 is Poisson, → +1 is bursts-and-silence, and the
    alerting margin a rate monitor needs depends on B, not just
    the rate). Gaps are exact epoch-us BIGINTs from one LAG over
    the per-type (us, event_id) total order; σ and μ come from
    exact integer moments in one identical float expression.
    Gaps are floored to whole SECONDS (integer div) — a year-long
    fixture gap in microseconds squares past BIGINT (the
    events_autocorr headroom rule, measured: ARITHMETIC_OVERFLOW
    under ANSI), while at real densities gaps only shrink; n < 2
    or an all-zero gap sum guards to NULL. One corpus scan, one window, one
    map-side-combinable fold per type."""
    ev = t(spark, sf, "events").filter(F.col("ts").isNotNull()).select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    g = ev.select(
        "event_type",
        F.expr(
            "(us - lag(us) OVER (PARTITION BY event_type"
            " ORDER BY us, event_id)) div 1000000"
        ).alias("gap"),
    )
    m = g.groupBy("event_type").agg(
        F.count("gap").cast("long").alias("n"),
        F.sum("gap").cast("long").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).cast("long").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    sd = F.sqrt((n * s2 - s1 * s1) * F.lit(1.0) / (n * (n - F.lit(1.0))))
    mu = s1 * F.lit(1.0) / n
    return m.select(
        "event_type",
        n.alias("n_gaps"),
        F.when(n == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("s1 div n"))
        .alias("mean_gap_s"),
        F.when((n < 2) | (s1 == 0), F.lit(None).cast("double"))
        .otherwise(F.round((sd - mu) / (sd + mu), 6) + F.lit(0.0))
        .alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# daily rank movers — who jumped the revenue leaderboard overnight?
# ---------------------------------------------------------------------------
@q(
    "events_top_movers",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM({SQL_CENTS.format(x='value')}) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    rk AS (
      SELECT event_type, day_num, v,
             CAST(ROW_NUMBER() OVER (PARTITION BY day_num
                                     ORDER BY v DESC, event_type)
                  AS INT) AS rnk
      FROM daily),
    mv AS (
      SELECT event_type, day_num, v, rnk,
             lag(rnk) OVER (PARTITION BY event_type ORDER BY day_num)
               AS prev_rnk,
             day_num - lag(day_num) OVER (PARTITION BY event_type
                                          ORDER BY day_num) AS gap
      FROM rk)
    SELECT event_type, day_num, CAST(v AS BIGINT) AS dollars, rnk,
           prev_rnk, CAST(prev_rnk - rnk AS INT) AS moved_up
    FROM mv
    WHERE gap = 1 AND prev_rnk <> rnk
    """,
)
def events_top_movers(spark, sf):
    """Daily leaderboard MOVERS: each event type's revenue rank per
    day (deterministic dollars-DESC, type-ASC tiebreak) joined to
    its OWN rank yesterday, emitting only consecutive-day rank
    changes — the "what changed overnight" report rank snapshots
    can't answer (win_rank gives positions; operations wants
    deltas, and only across ADJACENT days — a gap week makes
    'moved up' meaningless, hence the gap = 1 guard). Two windows
    over the calendar-sized daily relation with DIFFERENT keys —
    rank partitions by day, the movement lag partitions by type —
    so the relation exchanges twice, both calendar-bounded at any
    corpus scale (the corpus itself collapsed in the first agg).
    All-integer output: ranks, the movement delta, and floored
    dollars."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("long").alias(
                "day_num"
            ),
        )
        .agg(F.sum(cents(F.col("value"))).alias("vc"))
        .select("event_type", "day_num", F.expr("vc div 100").alias("v"))
    )
    wd = Window.partitionBy("day_num").orderBy(
        F.desc("v"), F.col("event_type")
    )
    rk = daily.select(
        "event_type",
        "day_num",
        "v",
        F.row_number().over(wd).cast("int").alias("rnk"),
    )
    wt = Window.partitionBy("event_type").orderBy("day_num")
    mv = rk.select(
        "event_type",
        "day_num",
        "v",
        "rnk",
        F.lag("rnk").over(wt).alias("prev_rnk"),
        (F.col("day_num") - F.lag("day_num").over(wt)).alias("gap"),
    )
    return mv.filter(
        (F.col("gap") == 1) & (F.col("prev_rnk") != F.col("rnk"))
    ).select(
        "event_type",
        "day_num",
        F.col("v").cast("long").alias("dollars"),
        "rnk",
        "prev_rnk",
        (F.col("prev_rnk") - F.col("rnk")).cast("int").alias("moved_up"),
    )


# ---------------------------------------------------------------------------
# M4 downsampling — the lossless-rendering envelope per pixel bucket
# ---------------------------------------------------------------------------
@q(
    "events_m4",
    """
    WITH ev AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000)
               AS bucket,
             CAST(round(value * 100) AS BIGINT) AS cents,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) * 1000000000
               + event_id AS tkey
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(us) AS BIGINT) AS min_us,
           CAST(MAX(us) AS BIGINT) AS max_us,
           CAST(min_by(cents, tkey) AS BIGINT) AS first_cents,
           CAST(max_by(cents, tkey) AS BIGINT) AS last_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM ev GROUP BY event_type, bucket
    """,
)
def events_m4(spark, sf):
    """M4 downsampling: per (type, 7-day pixel bucket) the FIRST,
    LAST, MIN and MAX values plus the time extent — the four
    aggregates that make a line chart render pixel-identically to
    the raw series (the M4 result [Jugel14-style]: within one
    x-pixel only the entry, exit, top and bottom of the polyline
    matter), which is how a dashboard draws a 10^12-point series
    without shipping 10^12 points. Everything is ONE map-side-
    combinable aggregation over the corpus — no window, no sort:
    first/last ride min_by/max_by on the composite integer key
    seconds*10^9 + event_id (the agg_first_last idiom — exact,
    deterministic ties), min/max are plain folds, and the bucket
    is epoch-aligned integer division of epoch-us by the week
    width. This is the streaming-friendly shape too: all four
    functions are algebraic, so the same query incrementalizes
    under a watermark (stream_window's machinery)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type",
        us.alias("us"),
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000"
        ).alias("bucket"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) div 1000000)"
            " * 1000000000 + event_id"
        ).alias("tkey"),
    )
    return ev.groupBy("event_type", F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("us").cast("long").alias("min_us"),
        F.max("us").cast("long").alias("max_us"),
        F.expr("min_by(cents, tkey)").cast("long").alias("first_cents"),
        F.expr("max_by(cents, tkey)").cast("long").alias("last_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# heartbeat availability — share of 6-hour buckets with signal
# ---------------------------------------------------------------------------
@q(
    "events_uptime",
    """
    WITH ev AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000 AS bucket
      FROM events WHERE ts IS NOT NULL),
    pres AS (
      SELECT event_type, CAST(COUNT(DISTINCT bucket) AS BIGINT) AS up,
             CAST(MIN(bucket) AS BIGINT) AS b0,
             CAST(MAX(bucket) AS BIGINT) AS b1
      FROM ev GROUP BY event_type)
    SELECT event_type, up AS up_buckets,
           CAST(b1 - b0 + 1 AS BIGINT) AS span_buckets,
           CAST(b1 - b0 + 1 - up AS BIGINT) AS gap_buckets,
           round(up * 1.0 / (b1 - b0 + 1), 6) + 0 AS availability
    FROM pres
    """,
)
def events_uptime(spark, sf):
    """Heartbeat availability SLI: per event type, the share of
    6-hour buckets between its first and last event that contain at
    least one event — the uptime number an SRE review reads
    (events_gapfill enumerates the missing days for inspection;
    this face reduces presence to the SLI: 0.97 availability with
    120 gap buckets is a paging policy decision, not a chart).
    Epoch-aligned integer bucketing (the agg_window_tvf alignment
    contract), presence via COUNT(DISTINCT bucket) — one exchange,
    and the distinct is over the BOUNDED bucket domain, never the
    corpus (the count-of-counts discipline: at 10^12 events the
    distinct set is still calendar-sized). The span denominator is
    the type's OWN first-to-last window, so a late-launched type
    isn't penalized for not existing; span >= 1 by construction
    (no divide guard needed)."""
    ev = t(spark, sf, "events").filter(F.col("ts").isNotNull()).select(
        "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 21600000000"
        ).alias("bucket"),
    )
    pres = ev.groupBy("event_type").agg(
        F.countDistinct("bucket").cast("long").alias("up"),
        F.min("bucket").cast("long").alias("b0"),
        F.max("bucket").cast("long").alias("b1"),
    )
    span = F.col("b1") - F.col("b0") + 1
    return pres.select(
        "event_type",
        F.col("up").alias("up_buckets"),
        span.cast("long").alias("span_buckets"),
        (span - F.col("up")).cast("long").alias("gap_buckets"),
        (F.round(F.col("up") * F.lit(1.0) / span, 6) + F.lit(0.0)).alias(
            "availability"
        ),
    )


# ---------------------------------------------------------------------------
# time-to-convert — first click to first subsequent purchase
# ---------------------------------------------------------------------------
@q(
    "events_time_to_convert",
    """
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    fc AS (
      SELECT user_id, CAST(MIN(us) AS BIGINT) AS c_us
      FROM ev WHERE event_type = 'click' GROUP BY user_id),
    fp AS (
      SELECT fc.user_id,
             CAST(MIN(p.us) AS BIGINT) AS p_us, MAX(fc.c_us) AS c_us
      FROM fc JOIN ev p ON p.user_id = fc.user_id
      WHERE p.event_type = 'purchase' AND p.us >= fc.c_us
      GROUP BY fc.user_id),
    lat AS (SELECT p_us - c_us AS lat_us FROM fp),
    base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clickers FROM fc)
    SELECT base.n_clickers,
           CAST(COUNT(lat_us) AS BIGINT) AS n_converted,
           CASE WHEN COUNT(lat_us) = 0 THEN NULL
                ELSE round(COUNT(lat_us) * 1.0 / base.n_clickers, 6) + 0
           END AS conversion_rate,
           round(quantile_cont(lat_us, 0.5), 6) + 0 AS p50_lat_us,
           round(quantile_cont(lat_us, 0.9), 6) + 0 AS p90_lat_us
    FROM lat CROSS JOIN base
    GROUP BY base.n_clickers
    """,
)
def events_time_to_convert(spark, sf):
    """Time-to-convert: each user's FIRST click to their first
    purchase AT OR AFTER it, folded to the conversion rate and the
    exact p50/p90 latency — the funnel-velocity number
    events_funnel's step counts can't give (two funnels with equal
    conversion but 1-minute vs 3-week latency are different
    businesses) and the aggregate view of what join_asof_nearest
    computes per click. Shape: first-click is one
    map-side-combinable fold; the subsequent-purchase match is an
    equi-join on user filtered by the time predicate before its
    min-fold (never a window over the raw corpus); the percentile
    runs over the USER-sized latency relation (type-7, the
    agg_percentiles parity). Unconverted clickers stay in the
    denominator; zero converters NULL the rate and percentiles.
    Latencies are exact epoch-us BIGINT differences."""
    ev = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("us").cast("long").alias("c_us"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("p_us0")
    )
    fp = (
        fc.join(p, "user_id")
        .filter(F.col("p_us0") >= F.col("c_us"))
        .groupBy("user_id")
        .agg(
            F.min("p_us0").cast("long").alias("p_us"),
            F.max("c_us").alias("c_us2"),
        )
    )
    lat = fp.select((F.col("p_us") - F.col("c_us2")).alias("lat_us"))
    n_clickers = fc.count()
    agg = lat.agg(
        F.count("lat_us").cast("long").alias("n_converted"),
        F.expr("percentile(lat_us, 0.5)").alias("p50"),
        F.expr("percentile(lat_us, 0.9)").alias("p90"),
    )
    return agg.select(
        F.lit(n_clickers).cast("long").alias("n_clickers"),
        "n_converted",
        F.when(F.col("n_converted") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("n_converted") * F.lit(1.0) / F.lit(n_clickers), 6
            )
            + F.lit(0.0)
        )
        .alias("conversion_rate"),
        (F.round(F.col("p50"), 6) + F.lit(0.0)).alias("p50_lat_us"),
        (F.round(F.col("p90"), 6) + F.lit(0.0)).alias("p90_lat_us"),
    )


# ---------------------------------------------------------------------------
# NOT IN with NULLs — the three-valued-logic trap, pinned
# ---------------------------------------------------------------------------
@q(
    "sql_not_in_nulls",
    """
    WITH buyers AS (
      SELECT CASE WHEN event_id % 50 = 0 THEN NULL ELSE user_id END
               AS uid
      FROM events
      WHERE event_type = 'purchase' AND user_id % 7 = 0),
    c AS (SELECT DISTINCT user_id FROM events
          WHERE user_id IS NOT NULL)
    SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_users,
           CAST((SELECT COUNT(*) FROM c
                 WHERE user_id NOT IN (SELECT uid FROM buyers))
                AS BIGINT) AS n_not_in,
           CAST((SELECT COUNT(*) FROM c
                 WHERE NOT EXISTS (SELECT 1 FROM buyers b
                                   WHERE b.uid = c.user_id))
                AS BIGINT) AS n_not_exists,
           CAST((SELECT COUNT(*) FROM c
                 WHERE user_id NOT IN (SELECT uid FROM buyers
                                       WHERE uid IS NOT NULL))
                AS BIGINT) AS n_not_in_filtered
    FROM (SELECT 1)
    """,
)
def sql_not_in_nulls(spark, sf):
    """The NOT IN null trap, pinned as data: the buyer list
    contains NULLs (every 50th purchase row — the dirty-key reality
    of any real feed), and the face emits the SAME anti-query three
    ways. Under SQL's three-valued logic `x NOT IN (..., NULL, ...)`
    can never be TRUE (x <> NULL is UNKNOWN), so n_not_in is 0 —
    silently, on BOTH engines, no warning — while NOT EXISTS
    null-rejects in the correlation and returns the real
    complement, and NOT IN over the null-filtered list agrees with
    it. This is the most expensive semantics bug in SQL migrations
    (an audience query returning zero rows reads as 'no audience',
    not 'your exclusion list has a NULL'), and at the plan level
    the three spell differently too: NOT IN needs a
    null-aware anti join (NAAJ) where NOT EXISTS is a plain
    LeftAnti. One singleton certificate row; the equality
    n_not_exists == n_not_in_filtered is the cross-check."""
    return spark.sql(
        f"""
        WITH buyers AS (
          SELECT CASE WHEN event_id % 50 = 0 THEN NULL ELSE user_id END
                   AS uid
          FROM parquet.`{sf}/events.parquet`
          WHERE event_type = 'purchase' AND user_id % 7 = 0),
        c AS (SELECT DISTINCT user_id
              FROM parquet.`{sf}/events.parquet`
              WHERE user_id IS NOT NULL)
        SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_users,
               CAST((SELECT COUNT(*) FROM c
                     WHERE user_id NOT IN (SELECT uid FROM buyers))
                    AS BIGINT) AS n_not_in,
               CAST((SELECT COUNT(*) FROM c
                     WHERE NOT EXISTS (SELECT 1 FROM buyers b
                                       WHERE b.uid = c.user_id))
                    AS BIGINT) AS n_not_exists,
               CAST((SELECT COUNT(*) FROM c
                     WHERE user_id NOT IN (SELECT uid FROM buyers
                                           WHERE uid IS NOT NULL))
                    AS BIGINT) AS n_not_in_filtered
        FROM (SELECT 1)
        """
    )


# ---------------------------------------------------------------------------
# stickiness — DAU over trailing-28-day MAU
# ---------------------------------------------------------------------------
@q(
    "events_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
      FROM ud GROUP BY day),
    fan AS (
      SELECT DISTINCT user_id, day + CAST(t.o AS INT) AS rday
      FROM ud, unnest(generate_series(0, 27)) AS t(o)),
    mau AS (
      SELECT rday, CAST(COUNT(*) AS BIGINT) AS mau28
      FROM fan GROUP BY rday)
    SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, mau.mau28,
           round(dau.dau * 1.0 / mau.mau28, 6) + 0 AS stickiness
    FROM dau JOIN mau ON mau.rday = dau.day
    """,
)
def events_stickiness(spark, sf):
    """DAU / trailing-28-day MAU per day — the stickiness ratio
    product teams live by (0.1 = monthly visitors, 0.5 = daily
    habit; events_rolling_dau gives the 7-day numerator family,
    this face adds the 28-day denominator and the ratio). Rolling
    COUNT DISTINCT still can't be a window frame, so the same
    scalable identity stretches to 28: each distinct (user, day)
    fans out map-side to the 28 report days it keeps the user
    active for, dedups, and counts — bounded x28 fan-out of the
    (user, day)-distinct relation (NOT the raw corpus: the
    distinct collapses first, which is what survives 10^12
    events), two shuffles, no self-join, no per-day rescan. The
    ratio is one float division of exact counts; report days past
    the corpus end carry MAU but no DAU row and drop at the join
    (the window is only fully defined inside the observed span).
    DATE cells exit as ISO strings (CLAUDE.md)."""
    from ..operators.dedup import parquet_checkpoint

    ud = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    # ud feeds BOTH the DAU fold and the x28 fan-out — without the
    # checkpoint each branch re-runs the corpus distinct (measured:
    # 2 events scans; the stat_mutual_info multi-consumer rule)
    ud = parquet_checkpoint(ud, "stickiness_ud")
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    fan = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(27))).alias("o"),
            "day",
        )
        .select("user_id", F.expr("date_add(day, o)").alias("rday"))
        .distinct()
    )
    mau = fan.groupBy("rday").agg(
        F.count(F.lit(1)).cast("long").alias("mau28")
    )
    return dau.join(mau, dau["day"] == mau["rday"]).select(
        F.date_format(dau["day"], "yyyy-MM-dd").alias("day"),
        "dau",
        "mau28",
        (
            F.round(F.col("dau") * F.lit(1.0) / F.col("mau28"), 6)
            + F.lit(0.0)
        ).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# Durbin-Watson — first-order serial correlation of the daily revenue series
# ---------------------------------------------------------------------------
@q(
    "stat_durbin_watson",
    f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM({SQL_CENTS.format(x='value')}) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    lg AS (
      SELECT v, LAG(v) OVER (ORDER BY day_num) AS vp
      FROM daily),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v) AS s, SUM(v * v) AS q,
             SUM(CASE WHEN vp IS NULL THEN NULL
                      ELSE (v - vp) * (v - vp) END) AS ssd
      FROM lg)
    SELECT n,
           CAST(ssd AS BIGINT) AS sum_sq_diff,
           CAST(n * q - s * s AS BIGINT) AS sxx_scaled,
           CASE WHEN n < 2 OR n * q - s * s <= 0 THEN NULL
                ELSE round(CAST(n AS DOUBLE) * ssd / (n * q - s * s), 6)
                     + 0
           END AS dw
    FROM m
    """,
)
def stat_durbin_watson(spark, sf):
    """Durbin-Watson statistic of the daily revenue series — THE
    regression-residual autocorrelation test (dw ~ 2 means no serial
    correlation, -> 0 positive, -> 4 negative), the one-number
    complement to events_autocorr's per-lag curve and stat_ljung_box's
    joint test. Mean-invariance does the exactness work: the
    numerator sum((x_t - x_{{t-1}})^2) is mean-free so it is an exact
    BIGINT fold over the LAG pairs, and the denominator
    sum((x - xbar)^2) cross-multiplies to (n*sum(x^2) - S^2)/n so
    dw = n*ssd / (n*q - s^2) touches floats only in the final
    identically-ordered round-6 division. Daily totals are floored
    to whole dollars (integer `div`, the events_autocorr headroom
    trick) so the five moment terms stay in BIGINT range at any
    corpus scale. One window (LAG over the calendar-sized daily
    relation — single-partition is fine post-agg, the orders_backlog
    precedent), one aggregate, no joins. n < 2 and the
    zero-variance (constant series) denominator guard to NULL —
    Spark ANSI would otherwise throw where DuckDB yields inf."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit(_EPOCH)).cast("long").alias(
                "day_num"
            )
        )
        .agg(F.sum(cents(F.col("value"))).alias("vc"))
        .select("day_num", F.expr("vc div 100").alias("v"))
    )
    lg = daily.select(
        "v", F.lag("v").over(Window.orderBy("day_num")).alias("vp")
    )
    m = lg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
        F.sum(
            F.when(
                F.col("vp").isNull(), F.lit(None).cast("long")
            ).otherwise(
                (F.col("v") - F.col("vp")) * (F.col("v") - F.col("vp"))
            )
        ).alias("ssd"),
    )
    sxx = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return m.select(
        "n",
        F.col("ssd").cast("long").alias("sum_sq_diff"),
        sxx.cast("long").alias("sxx_scaled"),
        F.when((F.col("n") < 2) | (sxx <= 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("n").cast("double") * F.col("ssd") / sxx, 6
            )
            + F.lit(0.0)
        )
        .alias("dw"),
    )


# ---------------------------------------------------------------------------
# Granger causality (lag-1) — does orders revenue predict events revenue?
# ---------------------------------------------------------------------------
@q(
    "stat_granger",
    f"""
    WITH ey AS (
      SELECT CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN {SQL_CENTS.format(x='value')}
                      ELSE 0 END) // 100 AS y,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    r AS (SELECT day_num, y, x FROM ey),
    lg AS (
      SELECT y,
             LAG(y) OVER (ORDER BY day_num) AS yl,
             LAG(x) OVER (ORDER BY day_num) AS xl
      FROM r),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(y) AS sy, SUM(yl) AS s1, SUM(xl) AS s2,
             SUM(y * y) AS syy, SUM(y * yl) AS sy1,
             SUM(y * xl) AS sy2, SUM(yl * yl) AS s11,
             SUM(yl * xl) AS s12, SUM(xl * xl) AS s22
      FROM lg WHERE yl IS NOT NULL AND xl IS NOT NULL),
    c AS (
      SELECT n,
             n * syy - sy * sy AS cyy,
             n * sy1 - sy * s1 AS a1,
             n * sy2 - sy * s2 AS a2,
             n * s11 - s1 * s1 AS b11,
             n * s12 - s1 * s2 AS b12,
             n * s22 - s2 * s2 AS b22
      FROM m),
    f AS (
      SELECT n, CAST(cyy AS BIGINT) AS cyy_exact,
             CASE WHEN n < 4 OR b11 <= 0 THEN NULL
                  ELSE (CAST(cyy AS DOUBLE)
                        - CAST(a1 AS DOUBLE) * a1 / b11) / n
             END AS rss_r,
             CASE WHEN n < 4 OR b11 <= 0
                       OR CAST(b11 AS DOUBLE) * b22
                          - CAST(b12 AS DOUBLE) * b12 <= 0 THEN NULL
                  ELSE (CAST(cyy AS DOUBLE)
                        - (CAST(a1 AS DOUBLE) * a1 * b22
                           - 2.0 * CAST(a1 AS DOUBLE) * a2 * b12
                           + CAST(a2 AS DOUBLE) * a2 * b11)
                          / (CAST(b11 AS DOUBLE) * b22
                             - CAST(b12 AS DOUBLE) * b12)) / n
             END AS rss_u
      FROM c),
    o AS (
      SELECT n, cyy_exact, rss_r, rss_u,
             CASE WHEN rss_u IS NULL OR rss_u <= 0 THEN NULL
                  ELSE round((rss_r - rss_u) / (rss_u / (n - 3)), 6) + 0
             END AS f_stat
      FROM f)
    SELECT n, cyy_exact,
           round(rss_r, 6) + 0 AS rss_r,
           round(rss_u, 6) + 0 AS rss_u,
           f_stat
    FROM o
    """,
)
def stat_granger(spark, sf):
    """Lag-1 Granger causality: does YESTERDAY'S click volume help
    predict TODAY'S purchase revenue beyond revenue's own lag? The F
    test compares the restricted AR(1) regression y_t ~ y_{{t-1}}
    against the unrestricted y_t ~ y_{{t-1}} + x_{{t-1}} — the
    canonical cross-series leading-indicator test that
    events_crosscorr's raw correlation cannot answer (correlation
    conflates 'x leads y' with 'both follow y's own momentum').
    Both series come from ONE daily aggregate over the SAME table
    (y = purchase dollars, x = click count as conditional sums), so
    one corpus scan feeds the whole test and the day ranges align
    by construction — the first cut of this face joined events days
    to orders days, whose synthetic calendars do not even overlap:
    an empty inner join that both engines happily agreed on. A
    degenerate-but-equal result is the one failure mode the oracle
    gate cannot see; the replay test now pins n > 0.
    Exactness split: the ten raw moments and the six cross-
    multiplied centered moments (n*Sab - Sa*Sb) are exact BIGINTs
    over dollar-floored daily series (the events_autocorr headroom
    trick); only the final quadratic forms — whose BIGINT products
    would overflow at ~1e17 squared — run in DOUBLE, as ONE
    identically-ordered expression chain on both engines, round-6
    (the stat_corr discipline). RSS_r uses the simple-regression
    closed form, RSS_u the 2x2 normal-equation determinant solve.
    Both LAGs share one window spec, so the plan has ONE Window over
    the calendar-sized daily relation. Lag = previous OBSERVED day.
    Guards: n < 4 (no df for the F), zero lag-variance
    b11, singular determinant, and rss_u <= 0 all NULL out — Spark
    ANSI throws on the divisions DuckDB would inf through."""
    ey = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit(_EPOCH))
            .cast("long")
            .alias("day_num")
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    cents(F.col("value")),
                ).otherwise(F.lit(0))
            ).alias("yc"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("long")
            .alias("x"),
        )
        .select("day_num", F.expr("yc div 100").alias("y"), "x")
    )
    w = Window.orderBy("day_num")
    lg = (
        ey.select(
            "y",
            F.lag("y").over(w).alias("yl"),
            F.lag("x").over(w).alias("xl"),
        )
        .filter(F.col("yl").isNotNull() & F.col("xl").isNotNull())
    )
    m = lg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("sy"),
        F.sum("yl").alias("s1"),
        F.sum("xl").alias("s2"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y") * F.col("yl")).alias("sy1"),
        F.sum(F.col("y") * F.col("xl")).alias("sy2"),
        F.sum(F.col("yl") * F.col("yl")).alias("s11"),
        F.sum(F.col("yl") * F.col("xl")).alias("s12"),
        F.sum(F.col("xl") * F.col("xl")).alias("s22"),
    )
    c = m.select(
        "n",
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias(
            "cyy"
        ),
        (F.col("n") * F.col("sy1") - F.col("sy") * F.col("s1")).alias(
            "a1"
        ),
        (F.col("n") * F.col("sy2") - F.col("sy") * F.col("s2")).alias(
            "a2"
        ),
        (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).alias(
            "b11"
        ),
        (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")).alias(
            "b12"
        ),
        (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")).alias(
            "b22"
        ),
    )
    det = F.col("b11").cast("double") * F.col("b22") - F.col(
        "b12"
    ).cast("double") * F.col("b12")
    rss_r = F.when(
        (F.col("n") < 4) | (F.col("b11") <= 0),
        F.lit(None).cast("double"),
    ).otherwise(
        (
            F.col("cyy").cast("double")
            - F.col("a1").cast("double") * F.col("a1") / F.col("b11")
        )
        / F.col("n")
    )
    rss_u = F.when(
        (F.col("n") < 4) | (F.col("b11") <= 0) | (det <= 0),
        F.lit(None).cast("double"),
    ).otherwise(
        (
            F.col("cyy").cast("double")
            - (
                F.col("a1").cast("double")
                * F.col("a1")
                * F.col("b22")
                - F.lit(2.0)
                * F.col("a1").cast("double")
                * F.col("a2")
                * F.col("b12")
                + F.col("a2").cast("double")
                * F.col("a2")
                * F.col("b11")
            )
            / det
        )
        / F.col("n")
    )
    f = c.select(
        "n",
        F.col("cyy").cast("long").alias("cyy_exact"),
        rss_r.alias("rss_r"),
        rss_u.alias("rss_u"),
    )
    return f.select(
        "n",
        "cyy_exact",
        (F.round(F.col("rss_r"), 6) + F.lit(0.0)).alias("rss_r"),
        (F.round(F.col("rss_u"), 6) + F.lit(0.0)).alias("rss_u"),
        F.when(
            F.col("rss_u").isNull() | (F.col("rss_u") <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (F.col("rss_r") - F.col("rss_u"))
                / (F.col("rss_u") / (F.col("n") - 3)),
                6,
            )
            + F.lit(0.0)
        )
        .alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# partial autocorrelation (lag 2) — Durbin-Levinson on integer-mean ACF
# ---------------------------------------------------------------------------
@q(
    "stat_pacf",
    f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM({SQL_CENTS.format(x='value')}) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    base AS (
      SELECT day_num, v,
             SUM(v) OVER () AS s, COUNT(*) OVER () AS n
      FROM daily),
    e AS (
      SELECT day_num,
             v - (CASE WHEN s >= 0 THEN s // n
                       ELSE -((-s) // n) END) AS e
      FROM base),
    lg AS (
      SELECT e,
             LAG(e, 1) OVER (ORDER BY day_num) AS e1,
             LAG(e, 2) OVER (ORDER BY day_num) AS e2
      FROM e),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(e * e) AS BIGINT) AS den,
             CAST(SUM(CASE WHEN e1 IS NULL THEN NULL
                           ELSE e * e1 END) AS BIGINT) AS num1,
             CAST(SUM(CASE WHEN e2 IS NULL THEN NULL
                           ELSE e * e2 END) AS BIGINT) AS num2
      FROM lg),
    r AS (
      SELECT n, den, num1, num2,
             CASE WHEN den <= 0 THEN NULL
                  ELSE CAST(num1 AS DOUBLE) / den END AS rho1,
             CASE WHEN den <= 0 THEN NULL
                  ELSE CAST(num2 AS DOUBLE) / den END AS rho2
      FROM m),
    o AS (
      SELECT n, den, num1, num2, rho1, rho2,
             CASE WHEN rho1 IS NULL OR 1.0 - rho1 * rho1 = 0 THEN NULL
                  ELSE round((rho2 - rho1 * rho1)
                             / (1.0 - rho1 * rho1), 6) + 0
             END AS phi22
      FROM r)
    SELECT n, den, num1, num2,
           round(rho1, 6) + 0 AS rho1,
           round(rho2, 6) + 0 AS rho2,
           phi22
    FROM o
    """,
)
def stat_pacf(spark, sf):
    """Partial autocorrelation at lag 2 (Durbin-Levinson step 2:
    phi22 = (rho2 - rho1^2)/(1 - rho1^2)) of the daily revenue
    series — the model-order diagnostic events_autocorr's raw ACF
    cannot give (an AR(1) process has rho2 = rho1^2 exactly, so
    phi22 ~ 0 says 'one lag suffices'; a real lag-2 effect survives
    the partialling). The ACF here is the global-mean form (the
    stat_ljung_box lesson — per-lag Pearson is a DIFFERENT
    statistic) centered on the INTEGER mean S div N, truncated
    toward zero on both engines (a defined statistic, the DW
    precedent: exactness beats textbook fidelity by a part in n),
    which keeps deviations, their products, and all three moment
    sums exact BIGINTs at any corpus scale — no n^2-scaled
    cross-multiplication anywhere. One corpus scan, one window
    chain (the two LAGs and the centering totals share the
    calendar-sized relation), divisions only in the final round-6
    assembly, zero-variance and unit-rho1 guards NULL."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit(_EPOCH))
            .cast("long")
            .alias("day_num")
        )
        .agg(F.sum(cents(F.col("value"))).alias("vc"))
        .select("day_num", F.expr("vc div 100").alias("v"))
    )
    wall = Window.partitionBy()
    base = daily.select(
        "day_num",
        "v",
        F.sum("v").over(wall).alias("s"),
        F.count(F.lit(1)).over(wall).alias("n0"),
    )
    e = base.select(
        "day_num",
        (F.col("v") - F.expr("s div n0")).alias("e"),
    )
    word = Window.orderBy("day_num")
    lg = e.select(
        "e",
        F.lag("e", 1).over(word).alias("e1"),
        F.lag("e", 2).over(word).alias("e2"),
    )
    m = lg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("e") * F.col("e")).cast("long").alias("den"),
        F.sum(
            F.when(F.col("e1").isNull(), F.lit(None)).otherwise(
                F.col("e") * F.col("e1")
            )
        )
        .cast("long")
        .alias("num1"),
        F.sum(
            F.when(F.col("e2").isNull(), F.lit(None)).otherwise(
                F.col("e") * F.col("e2")
            )
        )
        .cast("long")
        .alias("num2"),
    )
    rho1 = F.when(F.col("den") <= 0, F.lit(None).cast("double")).otherwise(
        F.col("num1").cast("double") / F.col("den")
    )
    rho2 = F.when(F.col("den") <= 0, F.lit(None).cast("double")).otherwise(
        F.col("num2").cast("double") / F.col("den")
    )
    r = m.select("n", "den", "num1", "num2", rho1.alias("rho1"), rho2.alias("rho2"))
    return r.select(
        "n",
        "den",
        "num1",
        "num2",
        (F.round(F.col("rho1"), 6) + F.lit(0.0)).alias("rho1"),
        (F.round(F.col("rho2"), 6) + F.lit(0.0)).alias("rho2"),
        F.when(
            F.col("rho1").isNull()
            | (F.lit(1.0) - F.col("rho1") * F.col("rho1") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (F.col("rho2") - F.col("rho1") * F.col("rho1"))
                / (F.lit(1.0) - F.col("rho1") * F.col("rho1")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("phi22"),
    )


# ---------------------------------------------------------------------------
# wave 99: Cronbach's alpha — internal-consistency reliability from
# exact integer power sums in one scan
# ---------------------------------------------------------------------------
@q(
    "stat_cronbach",
    """
    WITH it AS (
      SELECT CAST(l_quantity AS BIGINT)            AS x1,
             CAST(round(l_discount * 100) AS BIGINT) AS x2,
             CAST(round(l_tax * 100) AS BIGINT)      AS x3
      FROM lineitem),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x1*x1) AS BIGINT) AS q1,
             CAST(SUM(x2) AS BIGINT) AS s2, CAST(SUM(x2*x2) AS BIGINT) AS q2,
             CAST(SUM(x3) AS BIGINT) AS s3, CAST(SUM(x3*x3) AS BIGINT) AS q3,
             CAST(SUM(x1+x2+x3) AS BIGINT) AS st,
             CAST(SUM((x1+x2+x3)*(x1+x2+x3)) AS BIGINT) AS qt
      FROM it)
    SELECT n,
           CASE WHEN n < 2 THEN NULL
                ELSE (n*q1 - s1*s1) + (n*q2 - s2*s2) + (n*q3 - s3*s3)
           END AS item_var_num,
           CASE WHEN n < 2 THEN NULL ELSE n*qt - st*st END AS total_var_num,
           CASE WHEN n < 2 OR n*qt - st*st = 0 THEN NULL
                ELSE round(1.5 * (1.0 - CAST((n*q1 - s1*s1) + (n*q2 - s2*s2)
                                             + (n*q3 - s3*s3) AS DOUBLE)
                                        / (n*qt - st*st)), 6) + 0
           END AS alpha
    FROM m
    """,
)
def stat_cronbach(spark, sf):
    """Cronbach's alpha over k=3 integer "items" per lineitem
    (quantity, discount cents, tax cents) — the internal-consistency
    number a labeling pipeline reports over redundant quality
    raters/scorers before trusting their mean. alpha = k/(k-1) *
    (1 - SUM var_i / var_total); every sample variance shares the
    n(n-1) denominator, so the ratio collapses to exact BIGINT
    numerators n*SUMx^2 - (SUMx)^2 — items AND their row-sum total
    come out of ONE aggregate over ONE scan (no per-item passes, no
    Exchange beyond the single partial->final agg), and the only
    float is the final k/(k-1)-scaled division, rounded to 6
    identically in both engines. Headroom: items <= 5000, so
    n*qt <= 2.1e8 * n^2-ish — exact past 1e8 rows; beyond that the
    power sums move to DECIMAL(38,0), same shape. n<2 or zero total
    variance (constant rows) NULL-guards the ANSI divide. IEEE -0.0
    normalized with `+ 0` (stat_corr precedent)."""
    it = t(spark, sf, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_tax") * 100).cast("long").alias("x3"),
    ).withColumn("xt", F.col("x1") + F.col("x2") + F.col("x3"))
    m = it.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("q1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("q2"),
        F.sum("x3").cast("long").alias("s3"),
        F.sum(F.col("x3") * F.col("x3")).cast("long").alias("q3"),
        F.sum("xt").cast("long").alias("st"),
        F.sum(F.col("xt") * F.col("xt")).cast("long").alias("qt"),
    )
    ivn = (
        (F.col("n") * F.col("q1") - F.col("s1") * F.col("s1"))
        + (F.col("n") * F.col("q2") - F.col("s2") * F.col("s2"))
        + (F.col("n") * F.col("q3") - F.col("s3") * F.col("s3"))
    )
    tvn = F.col("n") * F.col("qt") - F.col("st") * F.col("st")
    small = F.col("n") < 2
    return m.select(
        "n",
        F.when(small, F.lit(None).cast("long")).otherwise(ivn)
        .alias("item_var_num"),
        F.when(small, F.lit(None).cast("long")).otherwise(tvn)
        .alias("total_var_num"),
        (
            F.when(small | (tvn == 0), F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    F.lit(1.5)
                    * (F.lit(1.0) - ivn.cast("double") / tvn),
                    6,
                )
                + F.lit(0.0)
            )
        ).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# wave 101: Fisher's exact test — hypergeometric 2x2, log-factorials
# as exact integer-micros cumulative sums
# ---------------------------------------------------------------------------
@q(
    "stat_fisher_exact",
    """
    WITH cells AS (
      SELECT CAST(SUM(CASE WHEN o_orderkey % 2 = 0
                            AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN o_orderkey % 2 = 0
                            AND o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN o_orderkey % 2 = 1
                            AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN o_orderkey % 2 = 1
                            AND o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM orders),
    m AS (
      SELECT a, b, c, d, a+b AS r1, c+d AS r2, a+c AS c1, b+d AS c2,
             a+b+c+d AS n
      FROM cells),
    s AS (
      SELECT CAST(0 AS BIGINT) AS i
      UNION ALL
      SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) FROM orders),
    lf AS (
      SELECT i, SUM(li) OVER (ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS lf
      FROM (SELECT i,
                   CASE WHEN i <= 1 THEN 0
                        ELSE CAST(round(ln(CAST(i AS DOUBLE)) * 1000000)
                                  AS BIGINT) END AS li
            FROM s) z),
    konst AS (
      SELECT lr1.lf + lr2.lf + lc1.lf + lc2.lf - ln_.lf AS margin_lf,
             m.a, m.b, m.c, m.d, m.r1, m.r2, m.c1, m.c2
      FROM m
      JOIN lf lr1 ON lr1.i = m.r1
      JOIN lf lr2 ON lr2.i = m.r2
      JOIN lf lc1 ON lc1.i = m.c1
      JOIN lf lc2 ON lc2.i = m.c2
      JOIN lf ln_ ON ln_.i = m.n),
    lpa AS (
      SELECT k.margin_lf - la1.lf - la2.lf - la3.lf - la4.lf AS lp_a
      FROM konst k
      JOIN lf la1 ON la1.i = k.a
      JOIN lf la2 ON la2.i = k.r1 - k.a
      JOIN lf la3 ON la3.i = k.c1 - k.a
      JOIN lf la4 ON la4.i = k.r2 - k.c1 + k.a),
    lp AS (
      SELECT ks.a, ks.b, ks.c, ks.d,
             ks.margin_lf - l1.lf - l2.lf - l3.lf - l4.lf AS lpm
      FROM konst ks
      JOIN s ON s.i BETWEEN GREATEST(0, ks.c1 - ks.r2)
                        AND LEAST(ks.r1, ks.c1)
      JOIN lf l1 ON l1.i = s.i
      JOIN lf l2 ON l2.i = ks.r1 - s.i
      JOIN lf l3 ON l3.i = ks.c1 - s.i
      JOIN lf l4 ON l4.i = ks.r2 - ks.c1 + s.i)
    SELECT lp.a, lp.b, lp.c, lp.d,
           CAST(SUM(CASE WHEN lpm <= lp_a THEN 1 ELSE 0 END)
                AS BIGINT) AS k_included,
           CAST(SUM(CASE WHEN lpm <= lp_a THEN
                  CAST(round(exp(CAST(lpm AS DOUBLE) / 1000000.0)
                             * 1000000) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS p_micros
    FROM lp, lpa
    GROUP BY lp.a, lp.b, lp.c, lp.d
    """,
)
def stat_fisher_exact(spark, sf):
    """Fisher's EXACT test on the 2x2 (orderkey parity) x (status =
    'F') table — the small-margin companion to stat_gtest/drift_chi2
    whose asymptotics it does not need. The whole hypergeometric
    machinery stays in exact integers: log-factorials are cumulative
    sums of PER-TERM micros-quantized ln(i) (the kg_adamic_adar
    sum-of-logs trick), so every logpmf is an exact order-independent
    BIGINT, the two-sided inclusion rule pmf(k) <= pmf(a) becomes an
    exact integer comparison (quantized ties included by both
    engines by construction), and the p-value is a sum of per-k
    probabilities each independently quantized to micros
    (stat_circular's per-row discipline) — no float accumulates.
    The index series 0..n is derived FROM the table itself
    (ROW_NUMBER + a union'd 0 — DuckDB's generate_series refuses
    subquery bounds), so the face is vacuously total on the empty
    corpus: all margins 0, support {0}, logpmf 0, p = 1.000000
    exactly. Scale shape: the 4 cells collapse to literals via one
    scan; the log-factorial relation is O(n) rows built once,
    parquet-checkpointed (5 downstream consumers — the
    reuse-defeats-pruning lesson), and its cumulative window is the
    documented single-partition cost: Fisher is a SMALL-n test by
    nature (the support is min-margin-sized); at 100-TB margins you
    switch to stat_gtest's chi-square asymptotics — that boundary is
    this face's real content."""
    from ..operators.dedup import parquet_checkpoint

    cells = (
        t(spark, sf, "orders")
        .agg(
            F.sum(
                F.when(
                    (F.col("o_orderkey") % 2 == 0)
                    & (F.col("o_orderstatus") == "F"),
                    1,
                ).otherwise(0)
            ).alias("a"),
            F.sum(
                F.when(
                    (F.col("o_orderkey") % 2 == 0)
                    & (F.col("o_orderstatus") != "F"),
                    1,
                ).otherwise(0)
            ).alias("b"),
            F.sum(
                F.when(
                    (F.col("o_orderkey") % 2 == 1)
                    & (F.col("o_orderstatus") == "F"),
                    1,
                ).otherwise(0)
            ).alias("c"),
            F.sum(
                F.when(
                    (F.col("o_orderkey") % 2 == 1)
                    & (F.col("o_orderstatus") != "F"),
                    1,
                ).otherwise(0)
            ).alias("d"),
        )
        .collect()[0]
    )
    a = int(cells["a"] or 0)
    b = int(cells["b"] or 0)
    c = int(cells["c"] or 0)
    d = int(cells["d"] or 0)
    r1, r2, c1, c2 = a + b, c + d, a + c, b + d
    n = a + b + c + d
    lf = parquet_checkpoint(
        spark.range(0, n + 1)
        .select(
            F.col("id").alias("i"),
            F.when(F.col("id") <= 1, F.lit(0))
            .otherwise(
                F.round(F.log(F.col("id").cast("double")) * 1000000)
                .cast("long")
            )
            .alias("li"),
        )
        .select(
            "i",
            F.sum("li")
            .over(
                Window.orderBy("i").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("lf"),
        ),
        "fisher_lf",
    )
    need = {r1, r2, c1, c2, n, a, r1 - a, c1 - a, r2 - c1 + a}
    lfv = {
        row["i"]: row["lf"]
        for row in lf.filter(F.col("i").isin(list(need))).collect()
    }
    margin_lf = lfv[r1] + lfv[r2] + lfv[c1] + lfv[c2] - lfv[n]
    lp_a = (
        margin_lf
        - lfv[a]
        - lfv[r1 - a]
        - lfv[c1 - a]
        - lfv[r2 - c1 + a]
    )
    kmin, kmax = max(0, c1 - r2), min(r1, c1)
    supp = spark.range(kmin, kmax + 1).select(F.col("id").alias("k"))
    lp = (
        supp.join(lf.alias("l1"), F.col("k") == F.col("l1.i"))
        .join(lf.alias("l2"), F.lit(r1) - F.col("k") == F.col("l2.i"))
        .join(lf.alias("l3"), F.lit(c1) - F.col("k") == F.col("l3.i"))
        .join(
            lf.alias("l4"),
            F.lit(r2 - c1) + F.col("k") == F.col("l4.i"),
        )
        .select(
            (
                F.lit(margin_lf)
                - F.col("l1.lf")
                - F.col("l2.lf")
                - F.col("l3.lf")
                - F.col("l4.lf")
            ).alias("lpm")
        )
    )
    inc = F.col("lpm") <= F.lit(lp_a)
    return lp.agg(
        F.sum(F.when(inc, 1).otherwise(0)).cast("long")
        .alias("k_included"),
        F.sum(
            F.when(
                inc,
                F.round(
                    F.exp(F.col("lpm").cast("double") / F.lit(1000000.0))
                    * 1000000
                ).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("p_micros"),
    ).select(
        F.lit(a).cast("long").alias("a"),
        F.lit(b).cast("long").alias("b"),
        F.lit(c).cast("long").alias("c"),
        F.lit(d).cast("long").alias("d"),
        "k_included",
        "p_micros",
    )


# ---------------------------------------------------------------------------
# wave 102: Cochran's Q — k correlated binary treatments, exact
# integer numerator/denominator
# ---------------------------------------------------------------------------
@q(
    "stat_cochran_q",
    """
    WITH subj AS (
      SELECT o_custkey,
             MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x1,
             MAX(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS x2,
             MAX(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END)
               AS x3
      FROM orders GROUP BY o_custkey),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_subj,
             CAST(COALESCE(SUM(x1), 0) AS BIGINT) AS s1,
             CAST(COALESCE(SUM(x2), 0) AS BIGINT) AS s2,
             CAST(COALESCE(SUM(x3), 0) AS BIGINT) AS s3,
             CAST(COALESCE(SUM(x1 + x2 + x3), 0) AS BIGINT) AS sr,
             CAST(COALESCE(SUM((x1 + x2 + x3) * (x1 + x2 + x3)), 0)
                  AS BIGINT) AS sr2
      FROM subj)
    SELECT n_subj,
           2 * (3 * (s1*s1 + s2*s2 + s3*s3) - sr*sr) AS q_num,
           3 * sr - sr2 AS q_den,
           CASE WHEN 3 * sr - sr2 = 0 THEN NULL
                ELSE round(CAST(2 * (3 * (s1*s1 + s2*s2 + s3*s3) - sr*sr)
                                AS DOUBLE) / (3 * sr - sr2), 6) + 0
           END AS q
    FROM m
    """,
)
def stat_cochran_q(spark, sf):
    """Cochran's Q over k=3 correlated binary "treatments" per
    customer (ever-finished / ever-urgent / ever-large-order) — the
    repeated-measures extension of stat_mcnemar (k=2) and the
    categorical sibling of stat_friedman, closing the
    matched-samples test family. The statistic is a pure integer
    ratio: Q = (k-1)(k SUM Cj^2 - N^2) / (k SUM Ri - SUM Ri^2) needs
    only the three column totals and the row-sum first/second
    moments, all exact BIGINTs out of a two-level aggregate (per-
    subject flags via MAX-CASE, then one global fold) over ONE scan
    — subjects whose row sums are 0 or k cancel out of the
    denominator by algebra, exactly as the textbook requires, with
    no filtering step. The only float is the final division, rounded
    to 6 with the -0.0 normalizer; an all-agreeing corpus (den = 0)
    NULL-guards the ANSI divide. Headroom: Ri <= 3 so sums are
    O(n) — exact to 10^18 subjects."""
    subj = (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("x1"),
            F.max(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT", 1
                ).otherwise(0)
            ).alias("x2"),
            F.max(
                F.when(F.col("o_totalprice") > 100000.0, 1).otherwise(0)
            ).alias("x3"),
        )
        .withColumn("r", F.col("x1") + F.col("x2") + F.col("x3"))
    )
    m = subj.agg(
        F.count(F.lit(1)).cast("long").alias("n_subj"),
        F.coalesce(F.sum("x1"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum("x2"), F.lit(0)).cast("long").alias("s2"),
        F.coalesce(F.sum("x3"), F.lit(0)).cast("long").alias("s3"),
        F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("sr"),
        F.coalesce(F.sum(F.col("r") * F.col("r")), F.lit(0))
        .cast("long")
        .alias("sr2"),
    )
    num = 2 * (
        3
        * (
            F.col("s1") * F.col("s1")
            + F.col("s2") * F.col("s2")
            + F.col("s3") * F.col("s3")
        )
        - F.col("sr") * F.col("sr")
    )
    den = 3 * F.col("sr") - F.col("sr2")
    return m.select(
        "n_subj",
        num.cast("long").alias("q_num"),
        den.cast("long").alias("q_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(num.cast("double") / den, 6) + F.lit(0.0)
        )
        .alias("q"),
    )


# ---------------------------------------------------------------------------
# wave 104: Mood's median test — k-group location test on the exact
# pooled lower median
# ---------------------------------------------------------------------------
@q(
    "stat_mood_median",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    med AS (
      SELECT c AS m FROM (
        SELECT c,
               SUM(COUNT(*)) OVER (ORDER BY c
                 ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(COUNT(*)) OVER () AS tot
        FROM v GROUP BY c) z
      WHERE 2 * cum >= tot
      ORDER BY c LIMIT 1),
    cellsx AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN c > (SELECT m FROM med)
                           THEN 1 ELSE 0 END) AS BIGINT) AS above,
             CAST(SUM(CASE WHEN c <= (SELECT m FROM med)
                           THEN 1 ELSE 0 END) AS BIGINT) AS below
      FROM v GROUP BY event_type),
    marg AS (
      SELECT event_type, above, below,
             SUM(above) OVER () AS ta,
             SUM(below) OVER () AS tb,
             SUM(above + below) OVER () AS n,
             above + below AS r
      FROM cellsx),
    terms AS (
      SELECT event_type, above, below,
             CASE WHEN ta = 0 THEN NULL
                  ELSE CAST(round(1000000.0 *
                    ((above - CAST(r AS DOUBLE) * ta / n)
                     * (above - CAST(r AS DOUBLE) * ta / n)
                     / (CAST(r AS DOUBLE) * ta / n))) AS BIGINT) END
             + CASE WHEN tb = 0 THEN NULL
                    ELSE CAST(round(1000000.0 *
                      ((below - CAST(r AS DOUBLE) * tb / n)
                       * (below - CAST(r AS DOUBLE) * tb / n)
                       / (CAST(r AS DOUBLE) * tb / n))) AS BIGINT) END
               AS chi2_mic
      FROM marg)
    SELECT event_type, above, below, chi2_mic
    FROM terms
    """,
)
def stat_mood_median(spark, sf):
    """Mood's median test across event types — the k-group LOCATION
    test that needs no rank machinery at all (stat_kruskal's
    nonparametric sibling for coarse, heavily-tied data): split
    every observation at the POOLED median and chi-square the
    resulting 2xk table. The pooled median is the exact integer
    lower median via the 2*cum >= tot count-of-counts rule
    (stat_weighted_median), so the split is an exact integer
    comparison — no quantile float ever decides a row. Cell counts
    and both marginals come as WINDOWS over the k-row cells relation
    (the stat_mutual_info rule: never re-aggregate the corpus per
    marginal), and each group's chi-square contribution is one
    identical-op-order float expression quantized to micros per
    TERM, so the hashed statistic is an exact integer sum. Per-group
    rows (not one folded statistic) so the face doubles as the
    drill-down report. Scale: one corpus scan to count-of-counts,
    one to cells; everything after is |types|-sized. Zero-expected
    cells cannot occur by construction (every group has r >= 1 and
    the median split leaves both sides of the POOLED table nonempty
    whenever two distinct values exist); an all-one-value corpus
    puts everything in `below` with ta = 0 — the face emits NULL
    chi2 rows for that degenerate regime via an ANSI-safe guard."""
    v = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    cc = v.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    med = (
        cc.select(
            "c",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt").over(wall).alias("tot"),
        )
        .filter(2 * F.col("cum") >= F.col("tot"))
        .orderBy("c")
        .limit(1)
        .collect()
    )
    m = med[0]["c"] if med else 0
    cells = v.groupBy("event_type").agg(
        F.sum(F.when(F.col("c") > m, 1).otherwise(0))
        .cast("long")
        .alias("above"),
        F.sum(F.when(F.col("c") <= m, 1).otherwise(0))
        .cast("long")
        .alias("below"),
    )
    marg = cells.select(
        "event_type",
        "above",
        "below",
        F.sum("above").over(wall).alias("ta"),
        F.sum("below").over(wall).alias("tb"),
        F.sum(F.col("above") + F.col("below")).over(wall).alias("n"),
        (F.col("above") + F.col("below")).alias("r"),
    )

    def term(obs, tot):
        e = F.col("r").cast("double") * F.col(tot) / F.col("n")
        return F.when(
            F.col(tot) == 0, F.lit(None).cast("long")
        ).otherwise(
            F.round(
                F.lit(1000000.0)
                * ((F.col(obs) - e) * (F.col(obs) - e) / e)
            ).cast("long")
        )

    return marg.select(
        "event_type",
        "above",
        "below",
        (term("above", "ta") + term("below", "tb")).alias("chi2_mic"),
    )


# ---------------------------------------------------------------------------
# wave 107: Jonckheere–Terpstra — ordered alternatives for
# INDEPENDENT groups, exact integers via the grid-ECDF machinery
# ---------------------------------------------------------------------------
@q(
    "stat_jonckheere",
    """
    WITH v AS (
      SELECT event_type AS ty, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    sup AS (
      SELECT ty, c, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY ty, c),
    grid AS (
      SELECT tt.ty, cc.c, COALESCE(s.cnt, 0) AS cnt
      FROM (SELECT DISTINCT ty FROM sup) tt
      CROSS JOIN (SELECT DISTINCT c FROM sup) cc
      LEFT JOIN sup s ON s.ty = tt.ty AND s.c = cc.c),
    cum AS (
      SELECT ty, c, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY ty ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumlt
      FROM grid),
    pairs AS (
      SELECT gi.ty AS ti, gj.ty AS tj,
             CAST(SUM(gj.cnt * (2 * gi.cumlt + gi.cnt)) AS BIGINT)
               AS u2
      FROM cum gi JOIN cum gj
        ON gi.c = gj.c AND gi.ty < gj.ty
      GROUP BY gi.ty, gj.ty),
    sizes AS (
      SELECT ty, CAST(SUM(cnt) AS BIGINT) AS n FROM sup GROUP BY ty),
    fin AS (
      SELECT (SELECT CAST(COALESCE(SUM(u2), 0) AS BIGINT) FROM pairs)
               AS j2,
             (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM sizes)
               AS nt,
             (SELECT CAST(COALESCE(SUM(n * n), 0) AS BIGINT)
              FROM sizes) AS sn2,
             (SELECT CAST(COALESCE(SUM(n * n * (2 * n + 3)), 0)
                          AS BIGINT) FROM sizes) AS sv,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM sizes) AS k)
    SELECT k, nt AS n_total, j2 AS j_doubled,
           CASE WHEN k < 2 OR nt = 0
                     OR nt * nt * (2 * nt + 3) - sv = 0 THEN NULL
                ELSE round((CAST(j2 AS DOUBLE) / 2
                            - (CAST(nt AS DOUBLE) * nt - sn2) / 4)
                           / sqrt((CAST(nt AS DOUBLE) * nt
                                   * (2 * nt + 3) - sv) / 72.0), 6) + 0
           END AS z
    FROM fin
    """,
)
def stat_jonckheere(spark, sf):
    """Jonckheere–Terpstra trend test — ordered alternatives for
    INDEPENDENT groups (stat_page_trend's unblocked sibling; where
    Kruskal-Wallis asks 'any difference', JT asks 'monotone along
    the a-priori group order', here alphabetical event types). J =
    SUM over ordered pairs of Mann-Whitney counts, and the whole
    computation stays in exact BIGINTs via the grid-ECDF machinery
    (stat_ks/stat_wasserstein family): per-type counts land on the
    SHARED distinct-value grid, exclusive per-type prefix sums give
    count(<v), and 2J accumulates cnt_j(v) * (2*cumlt_i(v) +
    cnt_i(v)) — the doubled form books tie pairs at the standard
    half credit with no fraction. The normal z uses the closed-form
    no-ties moments E[J] = (n^2 - SUM ni^2)/4, Var[J] = (n^2(2n+3) -
    SUM ni^2(2ni+3))/72 in one identical float expression (tie
    correction to the VARIANCE omitted — standard practice,
    documented; the statistic itself is tie-exact). Scale shape: one
    corpus scan to the (type x value) support; the grid is |types| x
    |distinct values| — bounded, never corpus-sized; the pair join
    is grid x types, all post-aggregate."""
    v = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("ty"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    from ..operators.dedup import parquet_checkpoint

    sup = parquet_checkpoint(
        v.groupBy("ty", "c").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        ),
        "jt_sup",
    )
    grid = (
        sup.select("ty")
        .distinct()
        .crossJoin(sup.select("c").distinct())
        .join(sup, ["ty", "c"], "left")
        .select("ty", "c", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("ty")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = parquet_checkpoint(
        grid.select(
            "ty",
            "c",
            "cnt",
            F.coalesce(F.sum("cnt").over(wcum), F.lit(0)).alias(
                "cumlt"
            ),
        ),
        "jt_cum",
    )
    gi = cum.select(
        F.col("ty").alias("ti"),
        F.col("c").alias("ci"),
        F.col("cnt").alias("cnti"),
        F.col("cumlt").alias("cumi"),
    )
    gj = cum.select(
        F.col("ty").alias("tj"),
        F.col("c").alias("cj"),
        F.col("cnt").alias("cntj"),
    )
    pairs = gi.join(
        gj,
        (F.col("ci") == F.col("cj")) & (F.col("ti") < F.col("tj")),
    ).agg(
        F.coalesce(
            F.sum(
                F.col("cntj")
                * (2 * F.col("cumi") + F.col("cnti"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("j2")
    )
    sizes = sup.groupBy("ty").agg(
        F.sum("cnt").cast("long").alias("n")
    )
    m = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("nt"),
        F.coalesce(F.sum(F.col("n") * F.col("n")), F.lit(0))
        .cast("long")
        .alias("sn2"),
        F.coalesce(
            F.sum(F.col("n") * F.col("n") * (2 * F.col("n") + 3)),
            F.lit(0),
        )
        .cast("long")
        .alias("sv"),
    )
    fin = m.crossJoin(pairs)
    ntd = F.col("nt").cast("double")
    bad = (
        (F.col("k") < 2)
        | (F.col("nt") == 0)
        | (F.col("nt") * F.col("nt") * (2 * F.col("nt") + 3)
           - F.col("sv") == 0)
    )
    return fin.select(
        "k",
        F.col("nt").alias("n_total"),
        F.col("j2").alias("j_doubled"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (
                    F.col("j2").cast("double") / 2
                    - (ntd * F.col("nt") - F.col("sn2")) / 4
                )
                / F.sqrt(
                    (
                        ntd * F.col("nt") * (2 * F.col("nt") + 3)
                        - F.col("sv")
                    )
                    / F.lit(72.0)
                ),
                6,
            )
            + F.lit(0.0)
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# wave 110: Cochran-Armitage trend — binary outcome vs ordered doses,
# cross-multiplied to exact integers
# ---------------------------------------------------------------------------
@q(
    "stat_cochran_armitage",
    """
    WITH g AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a
      FROM orders GROUP BY 1),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(a) AS BIGINT) AS at,
             CAST(SUM(s * a) AS BIGINT) AS t,
             CAST(SUM(s * n) AS BIGINT) AS s1,
             CAST(SUM(s * s * n) AS BIGINT) AS s2
      FROM g)
    SELECT k, nt AS n_total, at AS n_pos, t AS t_stat, s1, s2,
           CASE WHEN at = 0 OR at = nt OR nt * s2 - s1 * s1 = 0
                     OR nt = 0 THEN NULL
                ELSE round((CAST(nt AS DOUBLE) * t - CAST(at AS DOUBLE)
                            * s1)
                           / sqrt(CAST(at AS DOUBLE) * (nt - at)
                                  * (CAST(nt AS DOUBLE) * s2
                                     - CAST(s1 AS DOUBLE) * s1) / nt),
                           6) + 0
           END AS z
    FROM m
    """,
)
def stat_cochran_armitage(spark, sf):
    """Cochran-Armitage trend test — BINARY outcome against ORDERED
    doses (the epidemiology classic; here: does the finished-order
    rate trend with priority level), completing the trend family's
    third cell (Page: blocked ranks, Jonckheere: independent ranks,
    CA: binary proportions). Dose scores come from the priority
    prefix digit (1-URGENT..5-LOW — an ORDINAL encoding that already
    lives in the data), and every moment — group sizes, positives,
    T = SUM s*a, S1, S2 — is an exact BIGINT from ONE two-level
    aggregate over ONE scan. The z statistic is the cross-multiplied
    form z = (N*T - A*S1) / sqrt(A(N-A)(N*S2 - S1^2)/N): numerator
    and variance pieces would square past BIGINT at corpus scale
    (the events_burstiness lesson), so the final expression runs in
    DOUBLE over the exact integer columns in identical op order —
    values up to ~1e12 are exact doubles, and both engines round the
    one float once. Degenerate regimes (all-positive, all-negative,
    single dose, empty) NULL-guard."""
    g = (
        t(spark, sf, "orders")
        .groupBy(
            F.substring("o_orderpriority", 1, 1)
            .cast("long")
            .alias("s")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            )
            .cast("long")
            .alias("a"),
        )
    )
    m = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("nt"),
        F.coalesce(F.sum("a"), F.lit(0)).cast("long").alias("at"),
        F.coalesce(F.sum(F.col("s") * F.col("a")), F.lit(0))
        .cast("long")
        .alias("t"),
        F.coalesce(F.sum(F.col("s") * F.col("n")), F.lit(0))
        .cast("long")
        .alias("s1"),
        F.coalesce(
            F.sum(F.col("s") * F.col("s") * F.col("n")), F.lit(0)
        )
        .cast("long")
        .alias("s2"),
    )
    ntd = F.col("nt").cast("double")
    atd = F.col("at").cast("double")
    bad = (
        (F.col("at") == 0)
        | (F.col("at") == F.col("nt"))
        | (F.col("nt") * F.col("s2") - F.col("s1") * F.col("s1") == 0)
        | (F.col("nt") == 0)
    )
    return m.select(
        "k",
        F.col("nt").alias("n_total"),
        F.col("at").alias("n_pos"),
        F.col("t").alias("t_stat"),
        "s1",
        "s2",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (ntd * F.col("t") - atd * F.col("s1"))
                / F.sqrt(
                    atd
                    * (F.col("nt") - F.col("at"))
                    * (
                        ntd * F.col("s2")
                        - F.col("s1").cast("double") * F.col("s1")
                    )
                    / F.col("nt")
                ),
                6,
            )
            + F.lit(0.0)
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# wave 117: exact binomial test — logfact series machinery, integer
# inclusion rule
# ---------------------------------------------------------------------------
@q(
    "stat_binom_test",
    """
    WITH m AS (
      SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS obs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events),
    s AS (
      SELECT CAST(0 AS BIGINT) AS i
      UNION ALL
      SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) FROM events),
    lf AS (
      SELECT i, SUM(li) OVER (ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS lf
      FROM (SELECT i,
                   CASE WHEN i <= 1 THEN 0
                        ELSE CAST(round(ln(CAST(i AS DOUBLE)) * 1000000)
                                  AS BIGINT) END AS li
            FROM s) z),
    lp AS (
      SELECT s.i AS k, m.obs, m.n,
             lfn.lf - lfk.lf - lfnk.lf
             + s.i * CAST(round(ln(0.2) * 1000000) AS BIGINT)
             + (m.n - s.i) * CAST(round(ln(0.8) * 1000000) AS BIGINT)
               AS lpm
      FROM m
      JOIN s ON s.i BETWEEN 0 AND m.n
      JOIN lf lfn ON lfn.i = m.n
      JOIN lf lfk ON lfk.i = s.i
      JOIN lf lfnk ON lfnk.i = m.n - s.i),
    la AS (
      SELECT lpm AS lp_obs FROM lp WHERE k = obs)
    SELECT MAX(lp.n) AS n, MAX(lp.obs) AS obs,
           CAST(SUM(CASE WHEN lpm <= la.lp_obs THEN 1 ELSE 0 END)
                AS BIGINT) AS k_included,
           CAST(SUM(CASE WHEN lpm <= la.lp_obs THEN
                  CAST(round(exp(CAST(lpm AS DOUBLE) / 1000000.0)
                             * 1000000) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS p_micros
    FROM lp, la
    """,
)
def stat_binom_test(spark, sf):
    """EXACT one-sample binomial test — is the purchase share of the
    event stream the uniform 1-in-5 (p0 = 0.2, five event types)?
    The exact counterpart of stat_prop_ztest's normal approximation,
    and the one-sample sibling of stat_fisher_exact, sharing its
    entire machinery: the k = 0..n support is derived FROM the
    corpus via ROW_NUMBER + a zero row (DuckDB generate_series
    refuses subquery bounds — the fisher lesson), log-factorials are
    cumulative sums of per-term micros-quantized ln(i), the binomial
    logpmf adds k*ln(p0) + (n-k)*ln(1-p0) with the log literals
    micros-rounded IDENTICALLY on both engines (k times an integer
    stays an exact BIGINT), the two-sided inclusion rule pmf(k) <=
    pmf(obs) is an integer compare, and each included pmf is
    micros-rounded before the exact integer sum. Scale note: the
    support grid is n+1 rows — one window over a corpus-row-count
    relation; past ~1e7 rows production switches to the normal
    approximation this face exists to check."""
    m = t(spark, sf, "events").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("obs"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    s = (
        spark.range(1)
        .select(F.lit(0).cast("long").alias("i"))
        .union(
            t(spark, sf, "events").select(
                F.row_number()
                .over(Window.orderBy(F.lit(1)))
                .cast("long")
                .alias("i")
            )
        )
    )
    from ..operators.dedup import parquet_checkpoint

    lnm = (
        F.when(F.col("i") <= 1, F.lit(0))
        .otherwise(
            F.round(F.log(F.col("i").cast("double")) * 1000000).cast(
                "long"
            )
        )
        .alias("li")
    )
    lf = parquet_checkpoint(
        s.select("i", lnm).select(
            "i",
            F.sum("li")
            .over(
                Window.orderBy("i").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("lf"),
        ),
        "binom_lf",
    )
    lnp = F.round(F.log(F.lit(0.2)) * 1000000).cast("long")
    lnq = F.round(F.log(F.lit(0.8)) * 1000000).cast("long")
    sk = s.withColumnRenamed("i", "k")
    lp = (
        m.join(sk, sk["k"].between(0, m["n"]))
        .join(lf.alias("lfn"), F.col("lfn.i") == F.col("n"))
        .join(lf.alias("lfk"), F.col("lfk.i") == F.col("k"))
        .join(
            lf.alias("lfnk"),
            F.col("lfnk.i") == F.col("n") - F.col("k"),
        )
        .select(
            "k",
            "obs",
            "n",
            (
                F.col("lfn.lf")
                - F.col("lfk.lf")
                - F.col("lfnk.lf")
                + F.col("k") * lnp
                + (F.col("n") - F.col("k")) * lnq
            ).alias("lpm"),
        )
    )
    lp = parquet_checkpoint(lp, "binom_lp")
    la = lp.filter(F.col("k") == F.col("obs")).select(
        F.col("lpm").alias("lp_obs")
    )
    return lp.crossJoin(la).agg(
        F.max("n").cast("long").alias("n"),
        F.max("obs").cast("long").alias("obs"),
        F.sum(F.when(F.col("lpm") <= F.col("lp_obs"), 1).otherwise(0))
        .cast("long")
        .alias("k_included"),
        F.sum(
            F.when(
                F.col("lpm") <= F.col("lp_obs"),
                F.round(
                    F.exp(F.col("lpm").cast("double") / 1000000.0)
                    * 1000000
                ).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("p_micros"),
    )


# ---------------------------------------------------------------------------
# wave 117: Hodges–Lehmann shift estimator — median of pairwise
# differences over calendar-bounded samples
# ---------------------------------------------------------------------------
@q(
    "stat_hodges_lehmann",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IN ('purchase', 'click')
      GROUP BY 1, 2),
    pairs AS (
      SELECT p.cents - c.cents AS d
      FROM daily p JOIN daily c
        ON p.event_type = 'purchase' AND c.event_type = 'click'),
    w AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM pairs GROUP BY d),
    cum AS (
      SELECT d, SUM(cnt) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             SUM(cnt) OVER () AS tw
      FROM w)
    SELECT CAST(MAX(tw) AS BIGINT) AS n_pairs,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN d END) AS BIGINT)
             AS hl_cents
    FROM cum
    """,
)
def stat_hodges_lehmann(spark, sf):
    """Hodges-Lehmann two-sample shift estimator — the EFFECT SIZE
    that belongs to stat_mannwhitney's test: the median of all
    pairwise differences between daily purchase revenue and daily
    click revenue, 'purchases out-earn clicks by HL cents on a
    typical day-pair', robust where the difference of means is not
    and valid where medians of skewed samples mislead. The pair
    relation is the cross join of two CALENDAR-bounded daily
    rollups (30 x 30 at a month — the corpus is touched once by the
    daily agg; the quadratic blowup lives entirely on the bounded
    calendar, the stat_theilsen rule), differences are exact BIGINT
    cents, and the lower median comes from the count-of-counts
    cumulative 2*cw >= tw rule (stat_weighted_median discipline) —
    no global sort of the pair relation, no float percentile.
    Empty either-sample corpus yields zero pairs and a NULL
    estimate."""
    daily = (
        t(spark, sf, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "hl_daily")
    p = daily.filter(F.col("event_type") == "purchase").select(
        F.col("cents").alias("pc")
    )
    c = daily.filter(F.col("event_type") == "click").select(
        F.col("cents").alias("cc")
    )
    pairs = p.crossJoin(c).select((F.col("pc") - F.col("cc")).alias("d"))
    w = pairs.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cum = w.select(
        "d",
        F.sum("cnt")
        .over(
            Window.orderBy("d").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cw"),
        F.sum("cnt").over(Window.partitionBy()).alias("tw"),
    )
    return cum.agg(
        F.max("tw").cast("long").alias("n_pairs"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw"), F.col("d"))
        )
        .cast("long")
        .alias("hl_cents"),
    )


# ---------------------------------------------------------------------------
# wave 150: skip-bigram PMI — the non-adjacent companion to collocations
# ---------------------------------------------------------------------------
@q(
    "text_skipgrams",
    """
    WITH tok AS (
      SELECT string_split(text, ' ') AS arr FROM documents),
    g AS (SELECT arr, unnest(generate_series(1, len(arr) - 2)) AS i
          FROM tok WHERE len(arr) >= 3),
    sg AS (SELECT arr[i] AS w1, arr[i + 2] AS w2 FROM g
           WHERE arr[i] <> '' AND arr[i + 2] <> ''),
    cb AS (SELECT w1, w2, COUNT(*) AS c_xy FROM sg GROUP BY 1, 2),
    u AS (SELECT tk, COUNT(*) AS cu
          FROM (SELECT unnest(string_split(text, ' ')) AS tk
                FROM documents)
          WHERE tk <> '' GROUP BY tk),
    n AS (SELECT COUNT(*) AS nb FROM sg),
    sc AS (
      SELECT cb.w1, cb.w2, cb.c_xy,
             CAST(round(1000000.0 * ln(
                    (CAST(cb.c_xy AS DOUBLE) * n.nb) /
                    (CAST(u1.cu AS DOUBLE) * u2.cu)), 0) AS BIGINT)
               AS pmi_us
      FROM cb
      JOIN u u1 ON u1.tk = cb.w1
      JOIN u u2 ON u2.tk = cb.w2
      CROSS JOIN n
      WHERE cb.c_xy >= 3)
    SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
           round(CAST(pmi_us AS DOUBLE) / 1000000.0, 6) AS pmi
    FROM sc
    ORDER BY pmi_us DESC, w1, w2 LIMIT 20
    """,
)
def text_skipgrams(spark, sf):
    """Skip-bigram (1-skip) PMI top-20 — text_collocations' machinery
    with a ONE-TOKEN GAP: pairs (arr[i], arr[i+2]). Adjacent-bigram
    PMI finds fixed phrases; the skip pair finds dependencies that
    survive an intervening word ('new ___ york' templates,
    determiner-noun frames, the word pairs a word2vec skip-gram
    window trains on) — the signal used to pick context-window
    widths and to mine templated boilerplate that line-level dedup
    misses because the middle slot varies. Identical engine-parity
    spelling: exact BIGINT counts, the single ln micros-quantized
    before ranking (kg_adamic_adar), (pmi_us, w1, w2) total-order
    tiebreak, count floor 3, TakeOrderedAndProject top-20. The
    replay test pins the gap semantics (a planted 'a X b' template
    battery surfaces (a,b)) and that the skip relation's total
    pair count is sum(len-2) over docs. Scale shape identical to
    collocations: map-side explode, vocab-sized aggregates,
    unhinted marginal joins."""
    d = t(spark, sf, "documents")
    arr = d.select(F.split("text", " ").alias("arr")).filter(
        F.size("arr") >= 3
    )
    sg = (
        arr.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(arr) - 3),"
                    " i -> struct(arr[i] AS w1, arr[i + 2] AS w2))"
                )
            ).alias("s")
        )
        .select("s.w1", "s.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    cb = sg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    u = (
        d.select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    n = sg.agg(F.count(F.lit(1)).alias("nb"))
    pmi_us = F.round(
        F.lit(1000000.0)
        * F.log(
            (F.col("c_xy").cast("double") * F.col("nb"))
            / (F.col("cu1").cast("double") * F.col("cu2"))
        ),
        0,
    ).cast("long")
    sc = (
        cb.filter(F.col("c_xy") >= 3)
        .join(
            u.select(
                F.col("tk").alias("w1k"), F.col("cu").alias("cu1")
            ),
            F.col("w1") == F.col("w1k"),
        )
        .join(
            u.select(
                F.col("tk").alias("w2k"), F.col("cu").alias("cu2")
            ),
            F.col("w2") == F.col("w2k"),
        )
        .crossJoin(n)
        .select("w1", "w2", "c_xy", pmi_us.alias("pmi_us"))
    )
    return (
        sc.orderBy(F.desc("pmi_us"), "w1", "w2")
        .limit(20)
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.round(
                F.col("pmi_us").cast("double") / F.lit(1000000.0), 6
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# wave 152: exact two-sample Poisson rate test (conditional binomial)
# ---------------------------------------------------------------------------
@q(
    "stat_poisson_2sample",
    """
    WITH m AS (
      SELECT CAST(SUM(CASE WHEN substr(md5(CAST(event_id AS VARCHAR)),
                                       1, 1) < '8'
                           THEN 1 ELSE 0 END) AS BIGINT) AS k1,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events),
    s AS (
      SELECT CAST(0 AS BIGINT) AS i
      UNION ALL
      SELECT CAST(ROW_NUMBER() OVER () AS BIGINT) FROM events),
    lf AS (
      SELECT i, SUM(li) OVER (ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS lf
      FROM (SELECT i,
                   CASE WHEN i <= 1 THEN 0
                        ELSE CAST(round(ln(CAST(i AS DOUBLE)) * 1000000)
                                  AS BIGINT) END AS li
            FROM s) z),
    lp AS (
      SELECT s.i AS k, m.k1, m.n,
             lfn.lf - lfk.lf - lfnk.lf AS lbc
      FROM m
      JOIN s ON s.i BETWEEN 0 AND m.n
      JOIN lf lfn ON lfn.i = m.n
      JOIN lf lfk ON lfk.i = s.i
      JOIN lf lfnk ON lfnk.i = m.n - s.i),
    la AS (
      SELECT lbc AS lbc_obs FROM lp WHERE k = k1)
    SELECT MAX(lp.n) AS n, MAX(lp.k1) AS k1,
           CAST(MAX(lp.n) - MAX(lp.k1) AS BIGINT) AS k2,
           CASE WHEN MAX(lp.n) = MAX(lp.k1) OR MAX(lp.k1) = 0
                THEN NULL
                ELSE round(CAST(MAX(lp.k1) AS DOUBLE)
                           / (MAX(lp.n) - MAX(lp.k1)), 6) + 0
           END AS rate_ratio,
           CAST(SUM(CASE WHEN lbc <= la.lbc_obs THEN 1 ELSE 0 END)
                AS BIGINT) AS k_included,
           CAST(SUM(CASE WHEN lbc <= la.lbc_obs THEN
                  CAST(round(exp(CAST(lbc AS DOUBLE) / 1000000.0
                                 + CAST(lp.n AS DOUBLE)
                                   * ln(0.5)) * 1000000) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS p_micros
    FROM lp, la
    """,
)
def stat_poisson_2sample(spark, sf):
    """EXACT two-sample Poisson rate test (the conditional binomial
    / C-test): are events arriving at the same rate in the two md5
    halves? Conditional on the total n = k1 + k2, k1 ~
    Binomial(n, t1/(t1+t2)) with equal exposures -> p = 1/2, which
    collapses stat_binom_test's machinery beautifully: the logpmf's
    p-dependent terms fold to the CONSTANT n*ln(1/2), so the
    two-sided inclusion rule pmf(k) <= pmf(k1) becomes a pure
    log-binomial-coefficient compare lC(n,k) <= lC(n,k1) — exact
    BIGINT micros, no probability literals in the ranking at all —
    and the constant re-enters only inside the final exp. Same
    logfact discipline: support 0..n derived from the corpus via
    ROW_NUMBER + a zero row, cumulative micros-ln sums, per-term
    micros-rounded pmf mass. The md5 halves are a true A/A split,
    so the test is pinned NOT significant (p > 5%) and rate_ratio
    ~ 1 in the replay. Scale note as stat_binom_test: the grid is
    n+1 rows; past ~1e7 events use stat_prop_ztest's normal form."""
    m = t(spark, sf, "events").agg(
        F.sum(
            F.when(
                F.substring(
                    F.md5(F.col("event_id").cast("string")), 1, 1
                )
                < "8",
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("k1"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    s = (
        spark.range(1)
        .select(F.lit(0).cast("long").alias("i"))
        .union(
            t(spark, sf, "events").select(
                F.row_number()
                .over(Window.orderBy(F.lit(1)))
                .cast("long")
                .alias("i")
            )
        )
    )
    from ..operators.dedup import parquet_checkpoint

    lnm = (
        F.when(F.col("i") <= 1, F.lit(0))
        .otherwise(
            F.round(F.log(F.col("i").cast("double")) * 1000000).cast(
                "long"
            )
        )
        .alias("li")
    )
    lf = parquet_checkpoint(
        s.select("i", lnm).select(
            "i",
            F.sum("li")
            .over(
                Window.orderBy("i").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("lf"),
        ),
        "pois2_lf",
    )
    sk = s.withColumnRenamed("i", "k")
    lp = (
        m.join(sk, sk["k"].between(0, m["n"]))
        .join(lf.alias("lfn"), F.col("lfn.i") == F.col("n"))
        .join(lf.alias("lfk"), F.col("lfk.i") == F.col("k"))
        .join(
            lf.alias("lfnk"),
            F.col("lfnk.i") == F.col("n") - F.col("k"),
        )
        .select(
            "k",
            "k1",
            "n",
            (
                F.col("lfn.lf")
                - F.col("lfk.lf")
                - F.col("lfnk.lf")
            ).alias("lbc"),
        )
    )
    la = lp.filter(F.col("k") == F.col("k1")).select(
        F.col("lbc").alias("lbc_obs")
    )
    j = lp.crossJoin(la)
    inc = F.col("lbc") <= F.col("lbc_obs")
    # n rides as a per-row column inside the SUM — F.max("n") here
    # would be NESTED_AGGREGATE_FUNCTION (the stat_ljung_box lesson)
    pmf_mic = F.round(
        F.exp(
            F.col("lbc").cast("double") / F.lit(1000000.0)
            + F.col("n").cast("double") * F.log(F.lit(0.5))
        )
        * 1000000
    ).cast("long")
    n_, k1_ = F.max("n"), F.max("k1")
    return j.agg(
        n_.cast("long").alias("n"),
        k1_.cast("long").alias("k1"),
        (n_ - k1_).cast("long").alias("k2"),
        F.when(
            (n_ == k1_) | (k1_ == 0), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(k1_.cast("double") / (n_ - k1_), 6) + F.lit(0.0)
        )
        .alias("rate_ratio"),
        F.sum(F.when(inc, 1).otherwise(0))
        .cast("long")
        .alias("k_included"),
        F.sum(F.when(inc, pmf_mic).otherwise(0))
        .cast("long")
        .alias("p_micros"),
    )


# ---------------------------------------------------------------------------
# wave 155: word burstiness — Church-Gale cf/df dispersion census
# ---------------------------------------------------------------------------
@q(
    "text_burstiness_words",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tk
      FROM documents),
    perdoc AS (
      SELECT tk, doc_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE tk <> '' GROUP BY tk, doc_id),
    w AS (
      SELECT tk,
             CAST(SUM(c) AS BIGINT) AS cf,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(MAX(c) AS BIGINT) AS max_in_doc
      FROM perdoc GROUP BY tk),
    f AS (
      SELECT tk, cf, df, max_in_doc,
             round(CAST(cf AS DOUBLE) / df, 6) + 0 AS burstiness
      FROM w WHERE df >= 5)
    SELECT tk, cf, df, max_in_doc, burstiness
    FROM f
    ORDER BY burstiness DESC, cf DESC, tk LIMIT 20
    """,
)
def text_burstiness_words(spark, sf):
    """Word burstiness census — Church & Gale's cf/df ratio (mean
    occurrences per CONTAINING document): function words spread
    evenly (cf/df ~ 1), topical/templated words BURST (one doc uses
    them many times), and the top of this ranking is exactly the
    vocabulary a tf-idf or BM25 scorer treats differently from what
    a unigram LM expects — the diagnostic run before picking
    document-frequency floors (text_unigram_lm_pruned's df cut) and
    before trusting bag-of-words independence anywhere. Exact
    integer core: per-(token, doc) counts fold map-side, the
    per-token (cf, df, max-in-doc) aggregate is one shuffle on the
    token key, burstiness is one rounded division, df >= 5 floors
    the ranking to stable tokens, and the (burstiness, cf, tk)
    total-order tiebreak makes the top-20 engine-unique via
    TakeOrderedAndProject. Scale shape: tokens explode map-side;
    both aggregates are vocabulary-sized; no marginal joins at all
    (contrast PMI faces — burstiness needs no pair relation)."""
    d = t(spark, sf, "documents")
    perdoc = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tk")
        )
        .filter(F.col("tk") != "")
        .groupBy("tk", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = perdoc.groupBy("tk").agg(
        F.sum("c").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.max("c").cast("long").alias("max_in_doc"),
    )
    f = w.filter(F.col("df") >= 5).select(
        "tk",
        "cf",
        "df",
        "max_in_doc",
        (
            F.round(F.col("cf").cast("double") / F.col("df"), 6)
            + F.lit(0.0)
        ).alias("burstiness"),
    )
    return f.orderBy(
        F.desc("burstiness"), F.desc("cf"), "tk"
    ).limit(20)


# ---------------------------------------------------------------------------
# wave 155: positional-postings phrase query
# ---------------------------------------------------------------------------
@q(
    "index_phrase_query",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tk,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents),
    p1 AS (SELECT doc_id, pos FROM tok WHERE tk = 'hash'),
    p2 AS (SELECT doc_id, pos FROM tok WHERE tk = 'join'),
    hits AS (
      SELECT p1.doc_id, CAST(COUNT(*) AS BIGINT) AS n_phrase
      FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id
                     AND p2.pos = p1.pos + 1
      GROUP BY p1.doc_id)
    SELECT doc_id, n_phrase
    FROM hits ORDER BY n_phrase DESC, doc_id LIMIT 20
    """,
)
def index_phrase_query(spark, sf):
    """Exact PHRASE query ("hash join") over positional postings —
    the operator that separates a real search index from a bag of
    words (index_postings stores which docs contain a term; a
    phrase needs WHERE, and the standard evaluation is a
    positional-postings intersection: term-1 positions joined to
    term-2 positions on (doc, pos+1)). Positions come from the
    token explode with ordinals (DuckDB generate_subscripts is
    1-based vs posexplode's 0-based — the qdata.py:241 idiom; both
    sides only need CONSISTENT positions, so each engine keeps its
    own base and the +1 adjacency predicate is base-invariant).
    The per-term postings relations are filtered BEFORE the join —
    two selective pushed predicates, then an equi-join on (doc_id,
    position) keys — so at 100 TB this is two slim vocabulary-
    filtered streams co-shuffled by doc, never a full-corpus
    self-join; phrase counts per doc, (count DESC, doc) top-20 via
    TakeOrderedAndProject. The replay test pins the phrase count
    against a Python substring-over-token-list walk, including
    overlapping and repeated matches."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tk"),
    )
    p1 = tok.filter(F.col("tk") == "hash").select(
        "doc_id", F.col("pos").alias("pos1")
    )
    p2 = tok.filter(F.col("tk") == "join").select(
        F.col("doc_id").alias("doc2"), F.col("pos").alias("pos2")
    )
    hits = (
        p1.join(
            p2,
            (F.col("doc2") == F.col("doc_id"))
            & (F.col("pos2") == F.col("pos1") + 1),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_phrase"))
    )
    return hits.orderBy(F.desc("n_phrase"), "doc_id").limit(20)


# ---------------------------------------------------------------------------
# wave 159: sentence-length distribution per source
# ---------------------------------------------------------------------------
@q(
    "text_sentence_stats",
    """
    WITH sent AS (
      SELECT source,
             unnest(string_split_regex(text, '[.!?]+')) AS s
      FROM documents),
    w AS (
      SELECT source,
             CAST(len(list_filter(string_split(trim(s), ' '),
                                  x -> x <> '')) AS BIGINT) AS nw
      FROM sent WHERE trim(s) <> ''),
    cc AS (
      SELECT source, nw, CAST(COUNT(*) AS BIGINT) AS c
      FROM w GROUP BY source, nw),
    cw AS (
      SELECT source, nw, c,
             CAST(SUM(c) OVER (PARTITION BY source ORDER BY nw)
                  AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n,
             CAST(SUM(c * nw) OVER (PARTITION BY source) AS BIGINT)
               AS tot_w
      FROM cc)
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_sentences,
           CAST(MAX(tot_w) AS BIGINT) AS n_words,
           round(CAST(MAX(tot_w) AS DOUBLE) / MAX(n), 6) + 0
             AS mean_len,
           CAST(MIN(CASE WHEN 2 * cum >= n THEN nw END) AS BIGINT)
             AS median_len,
           CAST(MAX(nw) AS BIGINT) AS max_len
    FROM cw GROUP BY source ORDER BY source
    """,
)
def text_sentence_stats(spark, sf):
    """Per-source sentence-length distribution — sentences split on
    [.!?]+ runs, lengths in non-empty whitespace tokens, and the
    (mean, exact lower median, max) profile a readability or
    quality gate consumes (text_readability folds these into one
    Flesch number; this face exposes the DISTRIBUTION, which is
    what catches boilerplate sources whose mean looks fine but
    whose median is 3 because every other 'sentence' is a nav
    crumb). The median is the exact 2*cum >= n count-of-counts
    rule over the length support (stat_weighted_median) — never a
    sort of the sentence relation; the split regex is the same
    class both engines compile identically (Java vs RE2 — no
    lookahead, the text_token_bpe discipline). One scan,
    support-sized windows per source."""
    d = t(spark, sf, "documents")
    sent = d.select(
        "source",
        F.explode(F.split("text", "[.!?]+")).alias("s"),
    ).filter(F.trim(F.col("s")) != "")
    w = sent.select(
        "source",
        F.size(
            F.filter(
                F.split(F.trim(F.col("s")), " "),
                lambda x: x != "",
            )
        )
        .cast("long")
        .alias("nw"),
    )
    cc = w.groupBy("source", "nw").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = Window.partitionBy("source").orderBy("nw")
    wall = Window.partitionBy("source")
    cw = cc.select(
        "source",
        "nw",
        "c",
        F.sum("c").over(wcum).cast("long").alias("cum"),
        F.sum("c").over(wall).cast("long").alias("n"),
        F.sum(F.col("c") * F.col("nw"))
        .over(wall)
        .cast("long")
        .alias("tot_w"),
    )
    return (
        cw.groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_sentences"),
            F.max("tot_w").cast("long").alias("n_words"),
            (
                F.round(
                    F.max("tot_w").cast("double") / F.max("n"), 6
                )
                + F.lit(0.0)
            ).alias("mean_len"),
            F.min(
                F.when(2 * F.col("cum") >= F.col("n"), F.col("nw"))
            )
            .cast("long")
            .alias("median_len"),
            F.max("nw").cast("long").alias("max_len"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# wave 178: exact paired sign test — day vs same weekday last week
# ---------------------------------------------------------------------------
@q(
    "stat_sign_test",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
               AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT a.cents AS cur, b.cents AS prv
      FROM daily a JOIN daily b ON b.day = a.day - 7),
    m AS (
      SELECT CAST(SUM(CASE WHEN cur > prv THEN 1 ELSE 0 END)
                  AS BIGINT) AS k1,
             CAST(SUM(CASE WHEN cur <> prv THEN 1 ELSE 0 END)
                  AS BIGINT) AS n
      FROM pairs),
    s AS (
      SELECT CAST(0 AS BIGINT) AS i
      UNION ALL
      SELECT CAST(ROW_NUMBER() OVER () AS BIGINT)
      FROM (SELECT * FROM daily LIMIT 10000)),
    lf AS (
      SELECT i, SUM(li) OVER (ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS lf
      FROM (SELECT i,
                   CASE WHEN i <= 1 THEN 0
                        ELSE CAST(round(ln(CAST(i AS DOUBLE))
                                        * 1000000) AS BIGINT) END
                     AS li
            FROM s) z),
    lp AS (
      SELECT s.i AS k, m.k1, m.n,
             lfn.lf - lfk.lf - lfnk.lf AS lbc
      FROM m
      JOIN s ON s.i BETWEEN 0 AND m.n
      JOIN lf lfn ON lfn.i = m.n
      JOIN lf lfk ON lfk.i = s.i
      JOIN lf lfnk ON lfnk.i = m.n - s.i),
    la AS (SELECT lbc AS lbc_obs FROM lp WHERE k = k1)
    SELECT MAX(lp.n) AS n_pairs, MAX(lp.k1) AS n_up,
           CAST(SUM(CASE WHEN lbc <= la.lbc_obs THEN 1 ELSE 0 END)
                AS BIGINT) AS k_included,
           CAST(SUM(CASE WHEN lbc <= la.lbc_obs THEN
                  CAST(round(exp(CAST(lbc AS DOUBLE) / 1000000.0
                                 + CAST(lp.n AS DOUBLE) * ln(0.5))
                             * 1000000) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS p_micros
    FROM lp, la
    """,
)
def stat_sign_test(spark, sf):
    """EXACT paired sign test — is revenue today higher than the
    SAME WEEKDAY last week? The weakest-assumption paired test
    there is (Wilcoxon needs symmetric differences, the t-test
    needs moments; the sign test needs only that ties carry no
    information): pair each day with day-7 (same weekday by
    construction — pairing IS the deseasonalization, the
    stat_seasonal_mk idea in two-sample form), drop exact ties,
    and test #(up) ~ Binomial(n, 1/2). p = 1/2 collapses the
    logpmf to the pure log-binomial-coefficient compare (the
    stat_poisson_2sample simplification verbatim — one machinery,
    three faces: binom GOF, rate ratio, paired signs); the
    logfact support derives from a LIMIT-bounded corpus slice
    (pairs <= days <= 10000 rows — the fisher ROW_NUMBER rule
    with an explicit ceiling). Trendless fixture: the test is
    pinned NOT significant and the up-share near 1/2. One scan
    to the daily relation, the self-join is calendar-bounded."""
    daily = (
        t(spark, sf, "orders")
        .groupBy(
            F.expr(
                "unix_micros(cast(o_orderdate AS TIMESTAMP))"
                " div 86400000000"
            ).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "sign_daily")
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b, F.col("b.day") == F.col("a.day") - 7
    ).select(
        F.col("a.cents").alias("cur"), F.col("b.cents").alias("prv")
    )
    m = pairs.agg(
        F.sum(F.when(F.col("cur") > F.col("prv"), 1).otherwise(0))
        .cast("long")
        .alias("k1"),
        F.sum(F.when(F.col("cur") != F.col("prv"), 1).otherwise(0))
        .cast("long")
        .alias("n"),
    )
    s = (
        daily.sparkSession.range(1)
        .select(F.lit(0).cast("long").alias("i"))
        .union(
            daily.limit(10000).select(
                F.row_number()
                .over(Window.orderBy(F.lit(1)))
                .cast("long")
                .alias("i")
            )
        )
    )
    lnm = (
        F.when(F.col("i") <= 1, F.lit(0))
        .otherwise(
            F.round(F.log(F.col("i").cast("double")) * 1000000)
            .cast("long")
        )
        .alias("li")
    )
    lf = parquet_checkpoint(
        s.select("i", lnm).select(
            "i",
            F.sum("li")
            .over(
                Window.orderBy("i").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("lf"),
        ),
        "sign_lf",
    )
    sk = s.withColumnRenamed("i", "k")
    lp = (
        m.join(sk, sk["k"].between(0, m["n"]))
        .join(lf.alias("lfn"), F.col("lfn.i") == F.col("n"))
        .join(lf.alias("lfk"), F.col("lfk.i") == F.col("k"))
        .join(
            lf.alias("lfnk"),
            F.col("lfnk.i") == F.col("n") - F.col("k"),
        )
        .select(
            "k",
            "k1",
            "n",
            (
                F.col("lfn.lf")
                - F.col("lfk.lf")
                - F.col("lfnk.lf")
            ).alias("lbc"),
        )
    )
    la = lp.filter(F.col("k") == F.col("k1")).select(
        F.col("lbc").alias("lbc_obs")
    )
    j = lp.crossJoin(la)
    inc = F.col("lbc") <= F.col("lbc_obs")
    pmf_mic = F.round(
        F.exp(
            F.col("lbc").cast("double") / F.lit(1000000.0)
            + F.col("n").cast("double") * F.log(F.lit(0.5))
        )
        * 1000000
    ).cast("long")
    return j.agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.max("k1").cast("long").alias("n_up"),
        F.sum(F.when(inc, 1).otherwise(0))
        .cast("long")
        .alias("k_included"),
        F.sum(F.when(inc, pmf_mic).otherwise(0))
        .cast("long")
        .alias("p_micros"),
    )


# ---------------------------------------------------------------------------
# wave 179: conditional entropy of the bigram language model
# ---------------------------------------------------------------------------
@q(
    "text_bigram_entropy",
    """
    WITH tok AS (
      SELECT string_split(text, ' ') AS arr FROM documents),
    g AS (SELECT arr, unnest(generate_series(1, len(arr) - 1)) AS i
          FROM tok WHERE len(arr) >= 2),
    bg AS (SELECT arr[i] AS w1, arr[i + 1] AS w2 FROM g
           WHERE arr[i] <> '' AND arr[i + 1] <> ''),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
           FROM bg GROUP BY 1, 2),
    m AS (
      SELECT c,
             CAST(SUM(c) OVER (PARTITION BY w1) AS BIGINT) AS cx,
             CAST(SUM(c) OVER () AS BIGINT) AS n
      FROM cb),
    terms AS (
      SELECT n,
             CAST(round(1000000.0 * c
                        * ln(CAST(cx AS DOUBLE) / c)) AS BIGINT)
               AS t_mic
      FROM m)
    SELECT CAST(MAX(n) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(SUM(t_mic), 0) AS BIGINT) AS h_mic,
           CASE WHEN MAX(n) IS NULL OR MAX(n) = 0 THEN NULL
                ELSE round(CAST(SUM(t_mic) AS DOUBLE)
                           / 1000000.0 / MAX(n)
                           / ln(2.0), 6) + 0
           END AS h_bits
    FROM terms
    """,
)
def text_bigram_entropy(spark, sf):
    """Conditional entropy H(next word | current word) of the
    corpus bigram model, in BITS — the single number that says how
    predictable the text is one token ahead (text_bigram_lm emits
    the per-bigram probabilities; this face integrates them:
    H(Y|X) = sum c_xy/N * ln(c_x/c_xy), the quantity a compressor
    or a perplexity gate actually consumes — 2^H is the effective
    branching factor, and ml_perplexity's unigram number minus
    this is the information one token of context buys): per-bigram
    micros-quantized ln terms (kg_adamic_adar) over exact BIGINT
    counts with the head marginal as a WINDOW over the bigram
    relation (the stat_mutual_info one-scan rule — never a
    re-aggregation branch), final conversion to bits by ln 2 once.
    The replay test pins H >= 0, H <= log2(vocab) and the exact
    integer sum. One scan, map-side bigram explode, one window,
    one fold."""
    d = t(spark, sf, "documents")
    arr = d.select(F.split("text", " ").alias("arr")).filter(
        F.size("arr") >= 2
    )
    bg = (
        arr.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(arr) - 2),"
                    " i -> struct(arr[i] AS w1, arr[i + 1] AS w2))"
                )
            ).alias("s")
        )
        .select("s.w1", "s.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    cb = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    m = cb.select(
        "c",
        F.sum("c").over(Window.partitionBy("w1")).cast("long").alias(
            "cx"
        ),
        F.sum("c").over(Window.partitionBy()).cast("long").alias("n"),
    )
    t_mic = F.round(
        F.lit(1000000.0)
        * F.col("c")
        * F.log(F.col("cx").cast("double") / F.col("c"))
    ).cast("long")
    terms = m.select("n", t_mic.alias("t_mic"))
    n = F.max("n")
    bad = n.isNull() | (n == 0)
    return terms.agg(
        n.cast("long").alias("n_bigrams"),
        F.coalesce(F.sum("t_mic"), F.lit(0))
        .cast("long")
        .alias("h_mic"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sum("t_mic").cast("double")
                / F.lit(1000000.0)
                / n
                / F.log(F.lit(2.0)),
                6,
            )
            + F.lit(0.0)
        )
        .alias("h_bits"),
    )


# ---------------------------------------------------------------------------
# wave 183: Chao1 species-richness estimate of the unseen vocabulary
# ---------------------------------------------------------------------------
@q(
    "text_chao1",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    vc AS (
      SELECT tk, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE tk <> '' GROUP BY tk),
    ff AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS f1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS f2
      FROM vc)
    SELECT s_obs, f1, f2,
           CASE WHEN f2 > 0
                THEN round(s_obs
                           + CAST(f1 AS DOUBLE) * f1 / (2.0 * f2),
                           6) + 0
                ELSE round(s_obs
                           + CAST(f1 AS DOUBLE) * (f1 - 1) / 2.0,
                           6) + 0
           END AS chao1,
           CASE WHEN f2 > 0
                THEN round(CAST(f1 AS DOUBLE) * f1 / (2.0 * f2), 6)
                     + 0
                ELSE round(CAST(f1 AS DOUBLE) * (f1 - 1) / 2.0, 6)
                     + 0
           END AS est_unseen
    FROM ff
    """,
)
def text_chao1(spark, sf):
    """Chao1 species-richness estimate of the vocabulary — how many
    word types exist that the corpus has NOT YET seen (the
    ecology estimator S_obs + f1^2/(2 f2), driven entirely by the
    hapax/dis-legomena counts; the bias-corrected f1(f1-1)/2 form
    when f2 = 0 — the text_good_turing zero-hapax lesson baked
    into the formula choice): the crawl-planning number that says
    whether more data buys more vocabulary (large est_unseen) or
    the lexicon is saturating — the closed-population complement
    to text_heaps' growth-curve extrapolation and the
    capture-recapture idea (stat_capture_recapture) with
    frequency classes instead of two samples. All three inputs
    are exact BIGINTs from one counts-of-counts fold; the
    estimate is one guarded float expression. Pinned: chao1 >=
    s_obs always (the estimator only ADDS), and on the
    closed-vocabulary synthetic corpus the unseen mass is a small
    fraction of s_obs. One scan, vocabulary-sized aggregate."""
    tok = (
        t(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
    )
    vc = tok.groupBy("tk").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ff = vc.agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    f1, f2, s_obs = F.col("f1"), F.col("f2"), F.col("s_obs")
    unseen = F.when(
        f2 > 0,
        F.round(f1.cast("double") * f1 / (F.lit(2.0) * f2), 6),
    ).otherwise(
        F.round(f1.cast("double") * (f1 - 1) / F.lit(2.0), 6)
    )
    return ff.select(
        "s_obs",
        "f1",
        "f2",
        (
            F.when(
                f2 > 0,
                F.round(
                    s_obs
                    + f1.cast("double") * f1 / (F.lit(2.0) * f2),
                    6,
                ),
            ).otherwise(
                F.round(
                    s_obs
                    + f1.cast("double") * (f1 - 1) / F.lit(2.0),
                    6,
                )
            )
            + F.lit(0.0)
        ).alias("chao1"),
        (unseen + F.lit(0.0)).alias("est_unseen"),
    )
