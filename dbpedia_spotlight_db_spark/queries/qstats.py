"""Analytics / data-profiling faces (round-3 fourth breadth wave):
the time-series, statistics, and fuzzy-matching operators an
annotation-pipeline owner runs over the crawl's event and commerce
side tables — gap-filled daily series, trailing RANGE-frame windows,
grouped moments (corr / covariance / stddev), fixed-width histograms,
z-score outlier screens, Markov transition matrices, edit-distance
entity matching, and the cogrouped-applyInPandas API face.

Same contract as the sibling query modules: every key is a Spark
callable plus a DuckDB twin with IDENTICAL column names and values.
Floats are rounded to 6 before any hash-checked comparison; where a
FILTER depends on a float (outlier screen), both engines filter on
the ROUNDED value so row membership can never depend on sub-ulp
accumulation-order differences between engines.
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
# time-series gap filling: date spine + zero-fill
# ---------------------------------------------------------------------------
@q(
    "events_gapfill",
    """
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events),
    spine AS (
      SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT t.event_type, strftime(s.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
    FROM types t CROSS JOIN spine s
    LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day
    """,
)
def events_gapfill(spark, sf_dir):
    """Gap-filled daily event series: one row per (event_type, day)
    for EVERY day between the corpus min and max fetch date, zero
    where nothing happened — the series a crawl-health dashboard or
    anomaly detector needs (a missing day and a zero day are different
    facts; a bare groupBy silently conflates them). The date spine is
    generated from the global (min, max) bound — a 2-value aggregate,
    so the spine relation is days x types = tiny and is broadcast to
    the daily-count side; the corpus is touched exactly once by the
    map-side-combinable daily groupBy. At 10^12 rows the spine stays
    kilobytes (a decade is ~3.7k days), so the left join never
    shuffles the fact side a second time.

    The corpus is scanned ONCE: the date bounds and the type list are
    derived from the |types x days|-sized ``daily`` aggregate, and
    ``daily`` is parquet-checkpointed before fan-out (per-branch
    column pruning makes the three consumer subtrees structurally
    different, so ReuseExchange can NOT collapse them — measured 6
    source scans without the checkpoint; with it, the corpus is read
    once and the three branches re-read only the tiny cell relation —
    asserted in tools/explain_audit.py)."""
    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf_dir, "events")
    daily = parquet_checkpoint(
        e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.count(F.lit(1)).alias("n")
        ),
        "gapfill_daily",
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    types = daily.select("event_type").distinct()
    return (
        types.crossJoin(F.broadcast(spine))
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# RANGE-frame trailing window over a gap-free numeric order key
# ---------------------------------------------------------------------------
_EPOCH = "2024-01-01"


@q(
    "win_trailing_range",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS INT)
               AS day_num,
             COUNT(*) AS n,
             round(SUM(value), 6) AS v
      FROM events GROUP BY 1, 2)
    SELECT event_type, day_num,
           CAST(n AS BIGINT) AS n_events,
           CAST(SUM(n) OVER w AS BIGINT) AS trail_events,
           round(SUM(v) OVER w, 6) AS trail_value
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day_num
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_trailing_range(spark, sf_dir):
    """Trailing 7-day totals per event type via a RANGE frame keyed on
    a day NUMBER — the frame faces win_moving_avg doesn't cover (ROWS
    counts rows; RANGE spans an interval of the order key, so a
    missing day genuinely shrinks the window instead of silently
    pulling an older row in). The corpus is collapsed to per-day rows
    by a map-side-combinable agg FIRST, so the window operator sorts
    |types x days| rows, not events; the window partition key is the
    event type, never a single global partition. The per-day value sum
    is rounded to 6 BEFORE the trailing sum in both engines, so the
    window accumulates identical operands and cross-engine equality
    is exact."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.to_date(F.lit(_EPOCH)))
        .cast("int")
        .alias("day_num"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("v"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day_num",
        F.col("n").cast("long").alias("n_events"),
        F.sum("n").over(w).cast("long").alias("trail_events"),
        F.round(F.sum("v").over(w), 6).alias("trail_value"),
    )


# ---------------------------------------------------------------------------
# grouped statistical moments: corr / covar_samp / stddev_samp
# ---------------------------------------------------------------------------
@q(
    "stat_corr",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(corr(l_quantity, l_extendedprice), 6) + 0 AS corr_qty_price,
           round(covar_samp(l_discount, l_tax), 6) + 0 AS cov_disc_tax,
           round(stddev_samp(l_discount), 6) AS sd_disc,
           round(AVG(l_quantity), 6) AS avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stat_corr(spark, sf_dir):
    """Grouped second-moment statistics — Pearson correlation, sample
    covariance, sample stddev — the column-relationship profile a
    feature-engineering pass computes before model training. All four
    moments are single-pass streaming aggregates (Spark's
    CentralMomentAgg / Corr / Covariance buffers), so the plan is one
    map-side-combinable hash agg with a |groups|-sized exchange — no
    second scan, no window. The reported statistics are dimensionless
    (corr) or small-magnitude (discount/tax moments), so round-6
    equality is robust to the engines' different partial-merge
    orders; large-magnitude moments (e.g. covar of raw prices) would
    need scaling first, which is exactly why the face picks these
    columns."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # + 0.0 normalizes IEEE negative zero (-0.0 formats as
        # "-0.000000" and breaks the cross-engine value hash)
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0)).alias(
            "corr_qty_price"
        ),
        (F.round(F.covar_samp("l_discount", "l_tax"), 6) + F.lit(0.0)).alias(
            "cov_disc_tax"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
    )


# ---------------------------------------------------------------------------
# fixed-width histogram (numeric profiling)
# ---------------------------------------------------------------------------
_HIST_W = 25_000


@q(
    "agg_histogram",
    f"""
    SELECT CAST(FLOOR(o_totalprice / {_HIST_W}) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(MIN(o_totalprice), 6) AS min_price,
           round(MAX(o_totalprice), 6) AS max_price,
           CAST(SUM({SQL_CENTS.format(x="o_totalprice")}) AS BIGINT)
             AS sum_price_cents
    FROM orders GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Fixed-width value histogram over order totals — the numeric-
    distribution profile behind data-quality dashboards and join-skew
    pre-checks. Bucketing is a pure projection (floor of a constant
    division, identical in both engines on identical doubles), so the
    whole face is ONE map-side-combinable agg keyed by ~20 buckets;
    min/max select existing parquet doubles (no accumulation), and the
    sum is carried in exact integer cents so no float sum ever crosses
    the engine boundary. At 10^12 rows the reduce side is |buckets|
    rows — the exchange is a rounding error."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / _HIST_W).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.min("o_totalprice"), 6).alias("min_price"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
        F.sum(cents(F.col("o_totalprice"))).cast("long").alias(
            "sum_price_cents"
        ),
    )


# ---------------------------------------------------------------------------
# z-score outlier screen (broadcast group stats, no global window)
# ---------------------------------------------------------------------------
_Z_CUT = 2.5


@q(
    "events_outliers",
    f"""
    WITH s AS (
      SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           round(e.value, 6) AS value,
           round((e.value - s.mu) / s.sd, 6) AS z
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE abs(round((e.value - s.mu) / s.sd, 6)) > {_Z_CUT}
    """,
)
def events_outliers(spark, sf_dir):
    """Per-group z-score outlier screen — the metric-anomaly face
    (which events are >2.5 sigma from their type's mean?). The group
    stats are a |types|-sized aggregate attached back by BROADCAST
    join, so the corpus is scanned once for stats and once for the
    screen with no wide exchange and no window over a whole group
    partition (the naive avg-OVER-partition formulation would sort
    every event of a type on one reducer). The filter compares the
    ROUNDED z in both engines, so membership at the cut boundary
    cannot flip on sub-ulp mean/stddev accumulation differences."""
    e = t(spark, sf_dir, "events")
    s = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6)
    return (
        e.join(F.broadcast(s), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > _Z_CUT)
    )


# ---------------------------------------------------------------------------
# Markov transition matrix (lead window per user)
# ---------------------------------------------------------------------------
@q(
    "events_transitions",
    """
    WITH nxt AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events)
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM nxt WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def events_transitions(spark, sf_dir):
    """First-order Markov transition counts over per-user event
    sequences (the session-model / next-action signal). One LEAD
    window partitioned by user — a high-cardinality key, so the sort
    is many small per-user runs, never a global sort — then a
    map-side-combinable count keyed by the |types|^2 transition
    matrix. (ts, event_id) is a total order, so the successor of
    every event is deterministic and both engines count identical
    pairs."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        nxt.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# fuzzy (edit-distance) dimension matching
# ---------------------------------------------------------------------------
@q(
    "join_fuzzy",
    """
    WITH qset AS (
      SELECT DISTINCT substr(n_name, 1, 2) || substr(n_name, 4) AS qname
      FROM nation),
    cand AS (
      SELECT q.qname, n.n_name AS matched,
             CAST(levenshtein(q.qname, n.n_name) AS INT) AS dist
      FROM qset q CROSS JOIN nation n),
    best AS (
      SELECT qname, matched, dist FROM cand
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY qname ORDER BY dist, matched) = 1)
    SELECT qname, matched, dist FROM best WHERE dist <= 2
    """,
)
def join_fuzzy(spark, sf_dir):
    """Fuzzy dimension matching: noisy surface strings (each nation
    name with its 3rd character deterministically dropped — a
    synthetic typo) resolved back to the canonical dimension by
    minimum Levenshtein distance, ties broken lexicographically, far
    matches (dist > 2) rejected — the entity-resolution face for
    dirty crawl metadata (publisher names, country strings) against a
    curated dimension. The dimension is CROSS-joined by broadcast
    (dims are small by definition; a fuzzy join against a large right
    side needs blocking first — exactly what dedup_lsh_pairs /
    er-style banding provides), and the per-query argmin is a
    map-side-combinable min_by agg, not a window, so no sort of the
    candidate set survives the plan."""
    n = t(spark, sf_dir, "nation")
    qset = n.select(
        F.concat(
            F.substring("n_name", 1, 2), F.expr("substring(n_name, 4)")
        ).alias("qname")
    ).distinct()
    d = F.levenshtein(F.col("qname"), F.col("n_name")).cast("int")
    cand = qset.crossJoin(F.broadcast(n.select("n_name"))).select(
        "qname", F.col("n_name").alias("matched"), d.alias("dist")
    )
    best = (
        cand.groupBy("qname")
        .agg(
            F.min_by(
                F.struct("matched", "dist"),
                F.struct("dist", "matched"),
            ).alias("b")
        )
        .select("qname", "b.matched", "b.dist")
    )
    return best.filter(F.col("dist") <= 2)


# ---------------------------------------------------------------------------
# cogrouped applyInPandas (two-sided per-key Arrow batches)
# ---------------------------------------------------------------------------
def _clicks_before_purchase(left, right):
    """Per-user cogroup kernel: left = clicks, right = purchases.
    Either side can be empty for a given key (cogroup emits the union
    of keys), so the key is read from whichever side has rows."""
    import pandas as pd

    uid = left["user_id"].iloc[0] if len(left) else right["user_id"].iloc[0]
    has_p = bool(len(right))
    n = int((left["ts"] < right["ts"].min()).sum()) if has_p else 0
    return pd.DataFrame(
        {"user_id": [uid], "n_clicks_before": [n], "has_purchase": [has_p]}
    )


@q(
    "udf_cogrouped",
    """
    WITH fp AS (
      SELECT user_id, MIN(ts) AS first_ts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    ck AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'),
    u AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('click', 'purchase'))
    SELECT u.user_id,
           CAST(COALESCE(SUM(CASE WHEN fp.first_ts IS NOT NULL
                                   AND ck.ts < fp.first_ts
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_clicks_before,
           fp.first_ts IS NOT NULL AS has_purchase
    FROM u
    LEFT JOIN fp ON u.user_id = fp.user_id
    LEFT JOIN ck ON u.user_id = ck.user_id
    GROUP BY u.user_id, fp.first_ts
    """,
)
def udf_cogrouped(spark, sf_dir):
    """Cogrouped applyInPandas — the two-sided Arrow-batch API face
    (`groupBy().cogroup().applyInPandas`): clicks and purchases are
    co-partitioned by user and handed to ONE pandas kernel per key as
    two aligned frames, which computes clicks-before-first-purchase —
    the attribution primitive that is awkward as a join (the naive
    SQL twin re-joins every click against the first-purchase row).
    Scale shape: both sides shuffle ONCE on the cogroup key and the
    kernel sees only one user's rows at a time (bounded memory, Arrow
    batch transfer, no per-row Python); this is the API the as-of /
    interval merges fall back to when their window forms can't
    express the semantics."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    return (
        clicks.groupBy("user_id")
        .cogroup(purch.groupBy("user_id"))
        .applyInPandas(
            _clicks_before_purchase,
            "user_id long, n_clicks_before long, has_purchase boolean",
        )
    )


# ---------------------------------------------------------------------------
# distribution-position window functions (percent_rank / cume_dist / ntile)
# ---------------------------------------------------------------------------
@q(
    "win_rank_fns",
    """
    SELECT event_id, user_id,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_rank_fns(spark, sf_dir):
    """Distribution-position window functions — percent_rank /
    cume_dist / ntile quartiles of each event within its user's
    timeline (the percentile-feature face win_rank's rank/lag pair
    doesn't cover). Partitioned by the HIGH-cardinality user key, so
    the sort is many small per-user runs — the scale-sane shape; a
    corpus-wide percentile would use the pre-aggregated quantile face
    (agg_percentiles), never one global window partition. (ts,
    event_id) is a total order and all three functions are exact
    rationals of small integers, so round-6 parity is exact."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# per-source language mix: mode + Shannon entropy
# ---------------------------------------------------------------------------
@q(
    "source_lang_stats",
    """
    WITH c AS (
      SELECT source, lang, COUNT(*) AS c
      FROM documents GROUP BY source, lang),
    top AS (
      SELECT source, lang AS top_lang FROM c
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY c DESC, lang) = 1),
    agg AS (
      SELECT source, SUM(c) AS n, COUNT(*) AS n_langs,
             SUM(c * ln(c)) AS s
      FROM c GROUP BY source)
    SELECT a.source,
           CAST(a.n AS BIGINT) AS n_docs,
           CAST(a.n_langs AS BIGINT) AS n_langs,
           t.top_lang,
           round(ln(a.n) - a.s / a.n, 6) + 0 AS lang_entropy
    FROM agg a JOIN top t ON t.source = a.source
    """,
)
def source_lang_stats(spark, sf_dir):
    """Per-source language-mix profile: document count, distinct
    languages, modal language (count-desc, lang-asc tiebreak), and the
    Shannon entropy of the language distribution — the corpus-balance
    diagnostic a multilingual pipeline runs before deciding routing
    and sampling temperatures (mix_domains' input signal). The corpus
    collapses to |sources x langs| counted cells FIRST (one map-side-
    combinable agg); mode and entropy are then computed entirely on
    that tiny relation — the mode via a min_by over (−count, lang)
    (no window, no second corpus pass) and the entropy via the
    ln-sum identity H = ln(n) − Σ c·ln(c)/n, which needs only
    per-cell terms (never materializing probabilities). The +0 guard
    normalizes IEEE −0.0 on single-language sources."""
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    return (
        c.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.min_by("lang", F.struct((-F.col("c")).alias("nc"), "lang")).alias(
                "top_lang"
            ),
            F.sum(F.col("c") * F.log("c")).alias("s"),
        )
        .select(
            "source",
            "n_docs",
            "n_langs",
            "top_lang",
            (
                F.round(F.log("n_docs") - F.col("s") / F.col("n_docs"), 6)
                + F.lit(0.0)
            ).alias("lang_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------
@q(
    "basket_rules",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
    item AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_i FROM li GROUP BY pk),
    pair AS (
      SELECT a.pk AS pk_a, b.pk AS pk_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2)
    SELECT pk_a, pk_b, n_ab,
           round(CAST(n_ab AS DOUBLE) / n_orders, 6) AS support,
           round(CAST(n_ab AS DOUBLE) / ia.n_i, 6) AS confidence,
           round(CAST(n_ab AS DOUBLE) * n_orders / (ia.n_i * ib.n_i), 6)
             AS lift
    FROM pair
    JOIN item ia ON ia.pk = pk_a
    JOIN item ib ON ib.pk = pk_b
    CROSS JOIN n
    """,
)
def basket_rules(spark, sf):
    """Association-rule mining over order baskets: pair support,
    confidence and lift for every part pair co-purchased in >= 2
    orders (the co-view/co-buy recommender primitive — and on the
    crawl side, the template-detection signal for co-occurring page
    features). Scale shape: the quadratic step fans out only within
    one basket (baskets are small and bounded — the same per-group
    fan-out argument as kg_cooccurrence's per-doc entity sets); the
    HAVING >= 2 prune runs map-side-combinable BEFORE the dimension
    attach, and both marginals (item counts, the 1-row order total)
    attach by broadcast. Ratios of exact ints, identical op order
    both engines."""
    li = (
        t(spark, sf, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n = li.agg(F.countDistinct("ok").cast("long").alias("n_orders"))
    item = li.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("n_i"))
    pair = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("pk_a"), F.col("b.pk").alias("pk_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    ia = item.select(F.col("pk").alias("pk_a"), F.col("n_i").alias("na"))
    ib = item.select(F.col("pk").alias("pk_b"), F.col("n_i").alias("nb"))
    ab = F.col("n_ab").cast("double")
    return (
        pair.join(F.broadcast(ia), "pk_a")
        .join(F.broadcast(ib), "pk_b")
        .crossJoin(F.broadcast(n))
        .select(
            "pk_a",
            "pk_b",
            "n_ab",
            F.round(ab / F.col("n_orders"), 6).alias("support"),
            F.round(ab / F.col("na"), 6).alias("confidence"),
            F.round(
                ab * F.col("n_orders") / (F.col("na") * F.col("nb")), 6
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# gaps-and-islands: longest consecutive-day activity streak per user
# ---------------------------------------------------------------------------
@q(
    "win_streaks",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    anch AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
      FROM ud),
    runs AS (SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len
             FROM anch GROUP BY user_id, anchor)
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id
    """,
)
def win_streaks(spark, sf):
    """Gaps-and-islands: longest run of CONSECUTIVE active days per
    user (retention/engagement's standard sessionless streak metric).
    The classic trick — day minus its per-user row_number is constant
    exactly within a consecutive run — turns streak detection into
    one window + two map-side-combinable aggs; the window partitions
    by user_id (high cardinality, no skew), never a global sort.
    Dates never leave the plan (the anchor is only a group key), so
    there's no DATE-cell hashing hazard."""
    ud = (
        t(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    anch = ud.withColumn(
        "anchor", F.expr("date_sub(d, CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT))")
    )
    runs = anch.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


# ---------------------------------------------------------------------------
# rolling distinct actives (DAU + trailing-7-day WAU) via bounded fan-out
# ---------------------------------------------------------------------------
@q(
    "events_rolling_dau",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    fan AS (
      SELECT DISTINCT user_id, day + CAST(o AS INTEGER) AS rday
      FROM ud CROSS JOIN (SELECT UNNEST(range(0, 7)) AS o)),
    wau AS (SELECT rday, CAST(COUNT(*) AS BIGINT) AS wau7
            FROM fan GROUP BY rday)
    SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau7
    FROM dau JOIN wau ON wau.rday = dau.day
    """,
)
def events_rolling_dau(spark, sf):
    """DAU and trailing-7-day active users per day. Rolling COUNT
    DISTINCT cannot be a window frame (distinct doesn't decompose);
    the scalable identity is: user u active on day d is IN the
    trailing window of exactly d..d+6 — so explode each distinct
    (user, day) into its 7 report days map-side (bounded x7 fan-out,
    the same quantization trick as the range join), dedup, and count.
    Two shuffles on (user, day)-class keys, no self-join of the fact
    table, no per-day rescan — the shape that survives 10^12 events.
    DATE cells exit as ISO strings (CLAUDE.md)."""
    ud = (
        t(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    fan = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "day",
        )
        .select("user_id", F.expr("date_add(day, o)").alias("rday"))
        .distinct()
    )
    wau = fan.groupBy("rday").agg(
        F.count(F.lit(1)).cast("long").alias("wau7")
    )
    return dau.join(wau, dau["day"] == wau["rday"]).select(
        F.date_format(dau["day"], "yyyy-MM-dd").alias("day"), "dau", "wau7"
    )


# ---------------------------------------------------------------------------
# inter-event time profile (lag gaps + exact percentiles)
# ---------------------------------------------------------------------------
@q(
    "events_intervals",
    """
    WITH g AS (
      SELECT event_type,
             date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id),
                       ts) AS gap
      FROM events)
    SELECT event_type,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           round(CAST(SUM(gap) AS DOUBLE) / COUNT(gap), 6) AS mean_gap_s,
           round(quantile_cont(gap, 0.5), 6) AS p50_gap_s,
           CAST(MAX(gap) AS BIGINT) AS max_gap_s
    FROM g WHERE gap IS NOT NULL GROUP BY event_type
    """,
)
def events_intervals(spark, sf):
    """Inter-arrival-time profile per event type: the LAG gap between
    a user's consecutive events of the same type, rolled up to count
    / mean / exact median / max. This is the telemetry face behind
    session-timeout calibration (events_sessionize's gap threshold)
    and crawler politeness tuning. The window partitions by
    (user_id, event_type) — high cardinality, bounded groups — with
    event_id as the deterministic tiebreak; gap seconds are exact
    BIGINTs, so mean is an exact-int ratio and the median is the same
    type-7 quantile on both engines (agg_percentiles precedent)."""
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap").cast("long").alias("n_gaps"),
        F.round(
            F.sum("gap").cast("double") / F.count("gap"), 6
        ).alias("mean_gap_s"),
        F.round(F.expr("percentile(gap, 0.5)"), 6).alias("p50_gap_s"),
        F.max("gap").cast("long").alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# event-sourced running balance (open-order backlog)
# ---------------------------------------------------------------------------
@q(
    "orders_backlog",
    """
    WITH op AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
                FROM orders GROUP BY 1),
    cp AS (SELECT day, COUNT(*) AS n FROM (
             SELECT l_orderkey, CAST(MAX(l_shipdate) AS DATE) AS day
             FROM lineitem GROUP BY 1) q
           GROUP BY 1),
    days AS (SELECT day FROM op UNION SELECT day FROM cp),
    j AS (SELECT d.day, COALESCE(op.n, 0) AS opened,
                 COALESCE(cp.n, 0) AS completed
          FROM days d
          LEFT JOIN op ON op.day = d.day
          LEFT JOIN cp ON cp.day = d.day)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(opened AS BIGINT) AS n_opened,
           CAST(completed AS BIGINT) AS n_completed,
           CAST(SUM(opened - completed) OVER (
                  ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS backlog
    FROM j
    """,
)
def orders_backlog(spark, sf):
    """Event-sourced running balance: orders opened minus orders
    fully shipped (last lineitem's ship date), cumulated into the
    daily open-order backlog — the materialized-state-from-changelog
    pattern (same math as a crawl frontier depth or queue lag chart).
    The corpus-sized work is the two grouped counts (map-side
    combinable) and the per-order MAX; the cumulative window runs on
    the ~|days| POST-aggregate relation (thousands of rows at any
    corpus size) where a single ordered partition is the right plan,
    not a bottleneck. Days exit as ISO strings (CLAUDE.md)."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    op = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("opened")
    )
    cp = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("mx"))
        .groupBy(F.to_date("mx").alias("day"))
        .agg(F.count(F.lit(1)).alias("completed"))
    )
    days = op.select("day").union(cp.select("day")).distinct()
    j = (
        days.join(op, "day", "left")
        .join(cp, "day", "left")
        .select(
            "day",
            F.coalesce("opened", F.lit(0)).alias("opened"),
            F.coalesce("completed", F.lit(0)).alias("completed"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("opened").cast("long").alias("n_opened"),
        F.col("completed").cast("long").alias("n_completed"),
        F.sum(F.col("opened") - F.col("completed"))
        .over(w)
        .cast("long")
        .alias("backlog"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation via broadcast quantile cutoffs (no global NTILE)
# ---------------------------------------------------------------------------
@q(
    "customer_rfm",
    """
    WITH m AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                  (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
               AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(round(SUM(o_totalprice) * 100) AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey),
    cuts AS (
      SELECT round(quantile_cont(recency_days, 0.2), 6) AS r20,
             round(quantile_cont(recency_days, 0.4), 6) AS r40,
             round(quantile_cont(recency_days, 0.6), 6) AS r60,
             round(quantile_cont(recency_days, 0.8), 6) AS r80,
             round(quantile_cont(frequency, 0.2), 6) AS f20,
             round(quantile_cont(frequency, 0.4), 6) AS f40,
             round(quantile_cont(frequency, 0.6), 6) AS f60,
             round(quantile_cont(frequency, 0.8), 6) AS f80,
             round(quantile_cont(monetary_cents, 0.2), 6) AS m20,
             round(quantile_cont(monetary_cents, 0.4), 6) AS m40,
             round(quantile_cont(monetary_cents, 0.6), 6) AS m60,
             round(quantile_cont(monetary_cents, 0.8), 6) AS m80
      FROM m)
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST(5 - (CAST(recency_days > r20 AS INT)
                     + CAST(recency_days > r40 AS INT)
                     + CAST(recency_days > r60 AS INT)
                     + CAST(recency_days > r80 AS INT)) AS INT) AS r_score,
           CAST(1 + CAST(frequency > f20 AS INT)
                  + CAST(frequency > f40 AS INT)
                  + CAST(frequency > f60 AS INT)
                  + CAST(frequency > f80 AS INT) AS INT) AS f_score,
           CAST(1 + CAST(monetary_cents > m20 AS INT)
                  + CAST(monetary_cents > m40 AS INT)
                  + CAST(monetary_cents > m60 AS INT)
                  + CAST(monetary_cents > m80 AS INT) AS INT) AS m_score
    FROM m CROSS JOIN cuts
    """,
)
def customer_rfm(spark, sf):
    """RFM (recency / frequency / monetary) segmentation — the
    canonical behavioral-scoring rollup. The deliberate scale choice:
    scores come from QUANTILE CUTOFFS broadcast to a map-side CASE
    ladder, NOT a global NTILE window (ntile needs one totally-
    ordered partition of every customer — the single-partition
    anti-pattern the audit bans; cutoff assignment is embarrassingly
    parallel and what production scoring does). Cutoffs are rounded
    to 6 on BOTH engines before comparison; metrics are exact
    integers, and interpolated .2/.4/.6/.8 cutoffs never land within
    1e-6 of an integer, so boundary membership can't flip."""
    o = t(spark, sf, "orders")
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("gmax"))
    m = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("cmax"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            cents(F.sum("o_totalprice")).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff("gmax", "cmax").cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    cuts = m.agg(
        *[
            F.round(F.expr(f"percentile({c}, {p})"), 6).alias(
                f"{c[0]}{int(p * 100)}"
            )
            for c in ("recency_days", "frequency", "monetary_cents")
            for p in (0.2, 0.4, 0.6, 0.8)
        ]
    )

    def ladder(col, prefix, invert):
        s = sum(
            (F.col(col) > F.col(f"{prefix}{k}")).cast("int")
            for k in (20, 40, 60, 80)
        )
        return (F.lit(5) - s if invert else F.lit(1) + s).cast("int")

    return m.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        ladder("recency_days", "r", True).alias("r_score"),
        ladder("frequency", "f", False).alias("f_score"),
        ladder("monetary_cents", "m", False).alias("m_score"),
    )


# ---------------------------------------------------------------------------
# built-in linear regression aggregates (REGR_* family)
# ---------------------------------------------------------------------------
@q(
    "stat_regression",
    """
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 6) + 0 AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) + 0
             AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) + 0 AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stat_regression(spark, sf):
    """Grouped ordinary-least-squares fit with the SQL-standard
    REGR_* aggregate family — price-vs-quantity slope, intercept and
    R² per return flag, the one-pass regression a feature-drift or
    pricing-sanity check runs without ever leaving the aggregation
    layer. Like stat_corr, each aggregate is a single streaming
    moment buffer: one map-side-combinable hash agg, a
    |groups|-sized exchange, no second scan and no window. Both
    engines implement the same moment formulas; results are rounded
    to 6 with the `+ 0` IEEE −0.0 normalization (CLAUDE.md)."""
    li = t(spark, sf, "lineitem")
    z = F.lit(0.0)
    return li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity")
        .cast("long")
        .alias("n"),
        (F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6) + z)
        .alias("slope"),
        (F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6) + z)
        .alias("intercept"),
        (F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6) + z)
        .alias("r2"),
    )


@q(
    "events_attribution",
    """
    WITH o AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_us
      FROM events)
    SELECT user_id, event_id AS purchase_id, us AS purchase_us,
           CASE WHEN last_click_us IS NOT NULL
                     AND us - last_click_us <= 604800000000
                THEN last_click_us END AS click_us,
           COALESCE(last_click_us IS NOT NULL
                    AND us - last_click_us <= 604800000000,
                    FALSE) AS attributed,
           CASE WHEN last_click_us IS NOT NULL
                     AND us - last_click_us <= 604800000000
                THEN CAST((us - last_click_us) // 1000000 AS BIGINT)
           END AS lag_s
    FROM o WHERE event_type = 'purchase'
    """,
)
def events_attribution(spark, sf):
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent PRIOR click within a 7-day lookback, the
    join-free form of the conversion-attribution query every
    behavioral warehouse runs. One window per user — MAX over a
    CASE-gated click timestamp with a ROWS UNBOUNDED PRECEDING..1
    PRECEDING frame — so the plan is a single Exchange on user_id
    plus one running-max Window; no self-join of purchases against
    clicks (which would shuffle the event log twice and skew on hot
    users). Ordering is (ts, event_id) — a total order, so the frame
    is engine-stable. All times exit as exact epoch MICROSECOND
    integers (no timestamp-formatting parity surface); the lag uses
    integer division (`DIV` ≡ DuckDB `//`, the retention_cohorts
    lesson); unix_micros needs the NTZ column cast to TIMESTAMP,
    which is the identity because the session timezone is pinned UTC
    (session.py) — same instant DuckDB's naive epoch_us sees. Scale
    shape: map-only after the one per-user exchange;
    the 7-day gate keeps state bounded in the streaming analogue."""
    e = t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    o = e.select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("us"),
        F.max(
            F.when(F.col("event_type") == "click", us)
        ).over(w).alias("last_click_us"),
    )
    in_win = F.col("last_click_us").isNotNull() & (
        F.col("us") - F.col("last_click_us") <= F.lit(604800000000)
    )
    return o.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("us").alias("purchase_us"),
        F.when(in_win, F.col("last_click_us")).alias("click_us"),
        F.coalesce(in_win, F.lit(False)).alias("attributed"),
        F.when(
            in_win,
            F.expr("(us - last_click_us) DIV 1000000"),
        ).alias("lag_s"),
    )


@q(
    "events_paths",
    """
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events),
    p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path
          FROM s WHERE e3 IS NOT NULL),
    c AS (SELECT path, COUNT(*) AS n FROM p GROUP BY path)
    SELECT path, CAST(n AS BIGINT) AS n
    FROM c ORDER BY n DESC, path LIMIT 20
    """,
)
def events_paths(spark, sf):
    """Path analysis: the 20 most common 3-step behavioral sequences
    across all users — the navigation-mining query behind funnel
    DISCOVERY (events_funnel checks a known sequence; this one finds
    which sequences exist). Per-user LEAD windows build the sliding
    trigram of consecutive event types (one Exchange on user_id, two
    LEADs over the same window spec -> a single Window operator),
    then a map-side-combinable count over the tiny path vocabulary
    (|event_types|^3 keys) and a deterministic top-20
    (TakeOrderedAndProject — per-partition partial top-k, no global
    sort; ties broken by path for engine-stable output). Ordering is
    the total (ts, event_id), so every trigram is engine-identical."""
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    c = (
        s.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return c.orderBy(F.col("n").desc(), "path").limit(20)


@q(
    "stat_ttest",
    """
    WITH lab AS (
      SELECT event_type, value,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'a' ELSE 'b' END AS half
      FROM events),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) FILTER (WHERE half = 'a') AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (WHERE half = 'b') AS BIGINT) AS n_b,
             AVG(value) FILTER (WHERE half = 'a') AS m_a,
             AVG(value) FILTER (WHERE half = 'b') AS m_b,
             var_samp(value) FILTER (WHERE half = 'a') AS v_a,
             var_samp(value) FILTER (WHERE half = 'b') AS v_b
      FROM lab GROUP BY event_type)
    SELECT event_type, n_a, n_b,
           round(m_a, 6) + 0 AS mean_a, round(m_b, 6) + 0 AS mean_b,
           CASE WHEN n_a < 2 OR n_b < 2
                     OR v_a / n_a + v_b / n_b <= 0 THEN NULL
                ELSE round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 6) + 0
           END AS t_welch
    FROM m
    """,
)
def stat_ttest(spark, sf):
    """Numeric-drift detector: Welch's two-sample t statistic for the
    `value` column between two deterministic hash halves of the event
    log, per event type — the NUMERIC complement of drift_chi2's
    categorical test (the same machinery compares yesterday's feed to
    today's; on an A/A split the statistic should be near 0). One
    map-side-combinable conditional-moment agg over the corpus (six
    FILTERed aggregates share one buffer pass), |types|-sized output,
    no second scan. Engine parity: the t expression is written in the
    IDENTICAL operation order on both engines (drift_chi2 precedent);
    degenerate inputs short-circuit to NULL — n<2 (Spark var_samp
    yields NaN where DuckDB yields NULL) and zero pooled variance
    (ANSI DIVIDE_BY_ZERO vs DuckDB inf), the kg_assortativity
    degenerate-guard precedent. Round-6 with the +0 IEEE -0.0
    normalization on means and t."""
    e = t(spark, sf, "events")
    half = F.when(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "8",
        "a",
    ).otherwise("b")
    is_a, is_b = F.col("half") == "a", F.col("half") == "b"
    va = F.var_samp(F.when(is_a, F.col("value")))
    vb = F.var_samp(F.when(is_b, F.col("value")))
    m = (
        e.select("event_type", "value", half.alias("half"))
        .groupBy("event_type")
        .agg(
            F.count(F.when(is_a, 1)).cast("long").alias("n_a"),
            F.count(F.when(is_b, 1)).cast("long").alias("n_b"),
            F.avg(F.when(is_a, F.col("value"))).alias("m_a"),
            F.avg(F.when(is_b, F.col("value"))).alias("m_b"),
            va.alias("v_a"),
            vb.alias("v_b"),
        )
    )
    z = F.lit(0.0)
    pooled = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    return m.select(
        "event_type",
        "n_a",
        "n_b",
        (F.round("m_a", 6) + z).alias("mean_a"),
        (F.round("m_b", 6) + z).alias("mean_b"),
        F.when(
            (F.col("n_a") < 2) | (F.col("n_b") < 2) | (pooled <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (F.col("m_a") - F.col("m_b")) / F.sqrt(pooled), 6
            )
            + z
        )
        .alias("t_welch"),
    )


# ---------------------------------------------------------------------------
# seasonal decomposition (STL-lite): trend + day-of-week + residual
# ---------------------------------------------------------------------------
# Shared CTE chain: the full STL-lite relation (events_seasonal's
# output as CTE `stl`) — events_anomaly_stl builds on it, and sharing
# the text means the two faces can never drift.
_STL_SQL = """
    daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    win AS (
      SELECT day, cents, (day + 3) % 7 AS dow,
             SUM(cents) OVER (ORDER BY day
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS sum7,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS cnt7
      FROM daily),
    detr AS (
      SELECT day, cents, dow, sum7, cnt7,
             CASE WHEN cnt7 = 7 THEN 7 * cents - sum7 END AS d7
      FROM win),
    seas AS (
      SELECT day, cents, dow, sum7, cnt7, d7,
             SUM(CASE WHEN cnt7 = 7 THEN d7 END)
               OVER (PARTITION BY dow) AS sd7,
             SUM(CASE WHEN cnt7 = 7 THEN 1 END)
               OVER (PARTITION BY dow) AS sn
      FROM detr),
    stl AS (
      SELECT CAST(day AS BIGINT) AS day, CAST(dow AS INT) AS dow,
             round(cents / 100.0, 6) AS total,
             CASE WHEN cnt7 = 7 THEN round(sum7 / 700.0, 6) + 0 END AS trend,
             CASE WHEN sn IS NULL THEN NULL
                  ELSE round(CAST(sd7 AS DOUBLE) / (700.0 * sn), 6) + 0
             END AS seasonal,
             CASE WHEN cnt7 = 7 AND sn IS NOT NULL
                  THEN round(d7 / 700.0
                             - CAST(sd7 AS DOUBLE) / (700.0 * sn), 6) + 0
             END AS residual
      FROM seas)
"""


@q(
    "events_seasonal",
    f"""
    WITH {_STL_SQL}
    SELECT day, dow, total, trend, seasonal, residual FROM stl
    """,
)
def events_seasonal(spark, sf):
    """Seasonal decomposition of daily revenue (STL-lite): trend = a
    centered 7-day moving average (full windows only), seasonal = the
    day-of-week mean of the detrended series, residual = the rest —
    the decomposition behind 'is this drop a weekend or an incident',
    feeding the forecast/changepoint faces with a deseasonalized
    series. Exactness discipline: the detrended value is carried as
    the exact BIGINT d7 = 7*cents − sum7 (multiplying through by 7
    instead of dividing keeps every intermediate integral — the
    events_ewma dyadic-weights idea), so the per-dow means are
    exact-integer ratios; the three emitted floats divide those
    integers in identical order, round 6, +0 guard. dow is pure
    epoch-day arithmetic ((day+3) % 7, 0 = Monday) — NEVER
    dayofweek(): Spark counts 1 = Sunday, DuckDB 0 = Sunday, both
    locale-shifting (the events_heatmap hazard). Scale shape: corpus
    → per-day agg (map-side combinable, support = #days), then ONE
    ordered window and ONE dow-partitioned window over that bounded
    support — the seasonal means are windows on the SAME relation,
    never a second aggregation branch re-scanning the corpus (the
    wave-32 lesson); partial windows and empty dow classes
    short-circuit to NULL instead of silently averaging 6 days."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86400000000)
        )
        .cast("long")
        .alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    win = daily.select(
        "day",
        "cents",
        ((F.col("day") + 3) % 7).alias("dow"),
        F.sum("cents").over(w7).alias("sum7"),
        F.count(F.lit(1)).over(w7).alias("cnt7"),
    )
    detr = win.withColumn(
        "d7",
        F.when(F.col("cnt7") == 7, 7 * F.col("cents") - F.col("sum7")),
    )
    wd = Window.partitionBy("dow")
    seas = detr.select(
        "*",
        F.sum(F.when(F.col("cnt7") == 7, F.col("d7"))).over(wd).alias("sd7"),
        F.sum(F.when(F.col("cnt7") == 7, F.lit(1))).over(wd).alias("sn"),
    )
    seasonal = (
        F.round(F.col("sd7").cast("double") / (F.lit(700.0) * F.col("sn")), 6)
        + F.lit(0.0)
    )
    return seas.select(
        F.col("day").cast("long").alias("day"),
        F.col("dow").cast("int").alias("dow"),
        F.round(F.col("cents") / F.lit(100.0), 6).alias("total"),
        F.when(
            F.col("cnt7") == 7,
            F.round(F.col("sum7") / F.lit(700.0), 6) + F.lit(0.0),
        ).alias("trend"),
        F.when(F.col("sn").isNull(), F.lit(None).cast("double"))
        .otherwise(seasonal)
        .alias("seasonal"),
        F.when(
            (F.col("cnt7") == 7) & F.col("sn").isNotNull(),
            F.round(
                F.col("d7") / F.lit(700.0)
                - F.col("sd7").cast("double") / (F.lit(700.0) * F.col("sn")),
                6,
            )
            + F.lit(0.0),
        ).alias("residual"),
    )


# ---------------------------------------------------------------------------
# LOCF imputation over the date spine — last observation carried forward
# ---------------------------------------------------------------------------
@q(
    "events_locf",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    spine AS (
      SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds),
    types AS (SELECT DISTINCT event_type FROM daily),
    grid AS (
      SELECT t.event_type, s.day, d.cents
      FROM types t CROSS JOIN spine s
      LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day),
    f AS (
      SELECT event_type, day, cents,
             last_value(cents IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_cents
      FROM grid)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN cents IS NULL THEN NULL
                ELSE round(cents / 100.0, 6) END AS observed,
           CASE WHEN filled_cents IS NULL THEN NULL
                ELSE round(filled_cents / 100.0, 6) END AS filled
    FROM f
    """,
)
def events_locf(spark, sf):
    """Last-observation-carried-forward imputation over the gap-free
    date spine: per (type, day), the observed daily revenue and the
    LOCF-filled series — the imputation a forecasting or feature
    pipeline applies where a missing day means 'no new reading, carry
    the level' (sensor/price semantics) rather than gapfill's 'zero
    activity' (count semantics); the two faces are deliberate
    complements and share the spine construction. The fill is
    last_value(... IGNORE NULLS) over a per-type cumulative ROWS
    frame — the window feature this face exercises — and leading
    gaps before a type's first observation stay NULL (LOCF has
    nothing to carry; inventing 0 would be silently wrong). Scale
    shape: the events_gapfill discipline verbatim — the corpus
    collapses ONCE to the checkpointed per-(type, day) relation
    (three consumers: bounds, types, the grid join — per-branch
    column pruning defeats ReuseExchange without the checkpoint),
    the spine is a 2-value aggregate exploded to kilobytes and
    broadcast, and the LOCF window is hash-partitioned by type over
    the bounded grid. Cents are exact integers end to end; the two
    emitted doubles divide by 100.0 at the edge, round 6."""
    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = parquet_checkpoint(
        e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        ),
        "locf_daily",
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    types = daily.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine)).join(
        daily, ["event_type", "day"], "left"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = grid.select(
        "event_type",
        "day",
        "cents",
        F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
    )
    return f.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("cents").isNull(), F.lit(None).cast("double"))
        .otherwise(F.round(F.col("cents") / F.lit(100.0), 6))
        .alias("observed"),
        F.when(F.col("filled_cents").isNull(), F.lit(None).cast("double"))
        .otherwise(F.round(F.col("filled_cents") / F.lit(100.0), 6))
        .alias("filled"),
    )


# ---------------------------------------------------------------------------
# anomaly screen on the deseasonalized series — residual MAD score
# ---------------------------------------------------------------------------
@q(
    "events_anomaly_stl",
    f"""
    WITH {_STL_SQL},
    res AS (SELECT day, total, residual FROM stl
            WHERE residual IS NOT NULL),
    med AS (SELECT quantile_cont(residual, 0.5) AS med FROM res),
    dev AS (SELECT r.day, r.total, r.residual,
                   ABS(r.residual - m.med) AS ad
            FROM res r CROSS JOIN med m),
    mad AS (SELECT quantile_cont(ad, 0.5) AS mad FROM dev),
    fl AS (SELECT d.day, d.total, d.residual,
                  CASE WHEN m.mad > 0
                       THEN round(d.ad / m.mad, 6) + 0 END AS rscore
           FROM dev d CROSS JOIN mad m)
    SELECT day, total, residual, rscore FROM fl WHERE rscore > 3.0
    """,
)
def events_anomaly_stl(spark, sf):
    """Incident detection on the DESEASONALIZED series: a day is
    anomalous when its STL residual sits more than 3 robust
    deviations (|residual − median| / MAD) from the residual median —
    the screen that catches a Tuesday incident a raw-total threshold
    would excuse as 'Tuesdays are always low' and vice versa; it
    composes wave-35's decomposition with the events_mad robustness
    discipline (medians are the exact type-7 quantile, Spark
    percentile == DuckDB quantile_cont; membership tests the ROUNDED
    score so a row never flips on sub-ulp noise; zero MAD → NULL
    scores → zero flags, not an ANSI divide). The Spark path CALLS
    events_seasonal's operator and post-processes — one definition of
    the decomposition, shared by both faces. Scale shape: residuals
    live on the per-day support (#days rows), parquet-checkpointed
    before the median/deviation branches fan out (each would re-run
    the corpus-scale daily agg otherwise); both stats attach as
    broadcast one-row relations."""
    from ..operators.dedup import parquet_checkpoint

    stl = events_seasonal(spark, sf)
    res = parquet_checkpoint(
        stl.filter(F.col("residual").isNotNull()).select(
            "day", "total", "residual"
        ),
        "stl_res",
    )
    med = res.agg(F.expr("percentile(residual, 0.5)").alias("med"))
    dev = res.crossJoin(F.broadcast(med)).select(
        "day",
        "total",
        "residual",
        F.abs(F.col("residual") - F.col("med")).alias("ad"),
    )
    mad = dev.agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    fl = dev.crossJoin(F.broadcast(mad)).select(
        "day",
        "total",
        "residual",
        F.when(
            F.col("mad") > 0, F.round(F.col("ad") / F.col("mad"), 6) + F.lit(0.0)
        ).alias("rscore"),
    )
    return fl.filter(F.col("rscore") > 3.0).select(
        "day", "total", "residual", "rscore"
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival — user-lifetime product-limit estimator
# ---------------------------------------------------------------------------
@q(
    "events_survival",
    """
    WITH u AS (
      SELECT user_id, MIN(epoch_us(ts)) AS fus, MAX(epoch_us(ts)) AS lus
      FROM events GROUP BY user_id),
    ud AS (
      SELECT (lus - fus) // 86400000000 AS dur,
             CASE WHEN MAX(lus) OVER () - lus < 604800000000
                  THEN 1 ELSE 0 END AS cen
      FROM u),
    sup AS (
      SELECT dur, CAST(SUM(1 - cen) AS BIGINT) AS d,
             CAST(SUM(cen) AS BIGINT) AS c
      FROM ud GROUP BY dur),
    rk AS (
      SELECT dur, d, c,
             SUM(d + c) OVER (ORDER BY dur DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS n_risk
      FROM sup),
    ev AS (
      SELECT dur, d, c, n_risk,
             CASE WHEN d < n_risk
                  THEN CAST(round(1000000.0
                         * ln(CAST(n_risk - d AS DOUBLE) / n_risk))
                       AS BIGINT) END AS term_micros
      FROM rk WHERE d > 0),
    km AS (
      SELECT dur, d, c, n_risk,
             SUM(term_micros) OVER (ORDER BY dur
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS msum,
             MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS dead
      FROM ev)
    SELECT CAST(dur AS BIGINT) AS dur_day, CAST(n_risk AS BIGINT) AS n_risk,
           d AS n_events, c AS n_censored,
           CASE WHEN dead = 1 THEN 0.0
                ELSE round(exp(msum / 1000000.0), 6) + 0 END AS surv
    FROM km
    """,
)
def events_survival(spark, sf):
    """Kaplan-Meier product-limit estimator of user lifetime (days
    from first to last event), right-censoring users still active in
    the final 7 observed days — churn/survival analysis, and the
    pattern for any duration-with-censoring question (job runtimes,
    session lengths, document freshness). At each distinct lifetime t
    with d_t churn events, S(t) multiplies by (1 − d_t/n_t) where the
    risk set n_t counts users whose lifetime ≥ t — a SUFFIX cumulative
    (ORDER BY dur DESC window) over the per-duration support, never a
    per-user comparison join. The running PRODUCT is the sum-of-logs
    identity under the kg_adamic_adar discipline: each factor's
    ln((n−d)/n) is quantized to integer MICROS per term, the
    cumulative window then sums exact order-independent BIGINTs, and
    one final exp()/round(6) emits the float — bit-equal across
    engines, runs, and partitionings where a naive float product
    would drift with evaluation order. The absorbing zero (a duration
    where everyone at risk churns, ln 0 = −∞) rides a parallel
    cumulative MAX flag: later rows emit exactly 0.0 instead of a
    NULL-poisoned sum. Scale shape: ONE corpus scan → per-user agg
    (map-side combinable) → the global observation horizon as an
    OVER () window on the user relation (never a second corpus
    branch) → per-duration support (#distinct-days rows) → windows
    over that bounded support. All-censored and empty corpora yield
    zero rows — total, not a crash."""
    e = t(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = e.groupBy("user_id").agg(
        F.min(us).alias("fus"), F.max(us).alias("lus")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ud = u.select(
        F.floor((F.col("lus") - F.col("fus")) / F.lit(86400000000))
        .cast("long")
        .alias("dur"),
        F.when(
            F.max("lus").over(wall) - F.col("lus") < 604800000000, 1
        )
        .otherwise(0)
        .alias("cen"),
    )
    sup = ud.groupBy("dur").agg(
        F.sum(F.lit(1) - F.col("cen")).cast("long").alias("d"),
        F.sum("cen").cast("long").alias("c"),
    )
    wdesc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    rk = sup.select(
        "dur",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(wdesc).alias("n_risk"),
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(
            F.lit(1000000.0)
            * F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk")
            )
        ).cast("long"),
    )
    ev = rk.filter(F.col("d") > 0).select(
        "dur", "d", "c", "n_risk", term.alias("term_micros")
    )
    wasc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    km = ev.select(
        "dur",
        "d",
        "c",
        "n_risk",
        F.sum("term_micros").over(wasc).alias("msum"),
        F.max(
            F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
        )
        .over(wasc)
        .alias("dead"),
    )
    return km.select(
        F.col("dur").cast("long").alias("dur_day"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.col("msum") / F.lit(1000000.0)), 6)
            + F.lit(0.0)
        )
        .alias("surv"),
    )


# ---------------------------------------------------------------------------
# Markov stationary screen — 2 power rounds over the transition cells
# ---------------------------------------------------------------------------
@q(
    "events_markov",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    cells AS (
      SELECT prev AS i, event_type AS j, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
    st AS (
      SELECT DISTINCT s FROM (
        SELECT i AS s FROM cells UNION ALL SELECT j AS s FROM cells)),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM st),
    od AS (
      SELECT i, j, c, SUM(c) OVER (PARTITION BY i) AS ci FROM cells),
    v1 AS (
      SELECT j,
             CAST(SUM(CAST(round(1000000.0 * c / (ci * mm.m)) AS BIGINT))
                  AS BIGINT) AS v
      FROM od CROSS JOIN mm GROUP BY j),
    v2 AS (
      SELECT od.j,
             CAST(SUM(CAST(round(1.0 * v1.v * od.c / od.ci) AS BIGINT))
                  AS BIGINT) AS v
      FROM od JOIN v1 ON v1.j = od.i GROUP BY od.j)
    SELECT st.s AS state,
           CAST(COALESCE(v2.v, 0) AS BIGINT) AS p2_micros,
           round(COALESCE(v2.v, 0) / 1000000.0, 6) + 0 AS p2
    FROM st LEFT JOIN v2 ON v2.j = st.s
    """,
)
def events_markov(spark, sf):
    """Two power-iteration rounds toward the stationary distribution
    of the per-user event-type Markov chain — "where does a user's
    session settle?" — the global summary on top of
    events_transitions' raw transition matrix (same LAG-per-user
    derivation, so the chain is deterministic: ts then event_id
    orders each user's history totally). The corpus collapses ONCE
    to the |types|² transition cells (parquet-checkpointed — three
    downstream consumers would each re-run the corpus scan
    otherwise); both rounds are joins/aggregates over that bounded
    relation. Float discipline is kg_adamic_adar's: every
    v·c/c_i term is quantized to integer MICROS individually (one
    deterministic division per term), so each round's mass vector
    is an exact order-independent BIGINT sum — bit-equal across
    engines and partitionings, where naive float accumulation
    would drift with join order. v0 is uniform over observed
    states; states with no outgoing edges leak their mass
    (documented — the dangling-node convention of kg_pagerank's
    bounded-round screens). The one nested-loop join is the 1-row
    state-count broadcast (the kg_negative_sample allowance)."""
    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(wseq).alias("prev")
    )
    cells = parquet_checkpoint(
        seq.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("i"), F.col("event_type").alias("j"))
        .agg(F.count(F.lit(1)).cast("long").alias("c")),
        "markov_cells",
    )
    st = (
        cells.select(F.col("i").alias("s"))
        .unionAll(cells.select(F.col("j").alias("s")))
        .distinct()
    )
    mm = st.agg(F.count(F.lit(1)).cast("long").alias("m"))
    od = cells.select(
        "i",
        "j",
        "c",
        F.sum("c").over(Window.partitionBy("i")).alias("ci"),
    )
    v1 = (
        od.crossJoin(mm)
        .groupBy("j")
        .agg(
            F.sum(
                F.round(
                    F.lit(1000000.0)
                    * F.col("c")
                    / (F.col("ci") * F.col("m"))
                ).cast("long")
            )
            .cast("long")
            .alias("v")
        )
    )
    v2 = (
        od.join(v1.withColumnRenamed("j", "i"), "i")
        .groupBy("j")
        .agg(
            F.sum(
                F.round(
                    F.lit(1.0) * F.col("v") * F.col("c") / F.col("ci")
                ).cast("long")
            )
            .cast("long")
            .alias("v")
        )
    )
    return st.join(v2, st["s"] == v2["j"], "left").select(
        F.col("s").alias("state"),
        F.coalesce(F.col("v"), F.lit(0)).cast("long").alias("p2_micros"),
        (
            F.round(F.coalesce(F.col("v"), F.lit(0)) / F.lit(1000000.0), 6)
            + F.lit(0.0)
        ).alias("p2"),
    )


# ---------------------------------------------------------------------------
# exact grouped mode — windowed argmax with a total tie order
# ---------------------------------------------------------------------------
@q(
    "agg_mode",
    """
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) // 1000 AS bucket
      FROM events WHERE value IS NOT NULL),
    c AS (
      SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY event_type, bucket),
    r AS (
      SELECT event_type, bucket, cnt,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, bucket) AS rn
      FROM c)
    SELECT event_type, bucket AS mode_bucket, cnt AS mode_count
    FROM r WHERE rn = 1
    """,
)
def agg_mode(spark, sf):
    """Exact statistical MODE of the 10-unit price bucket per event
    type — the categorical central tendency the mean/median faces
    can't express, with the tie broken DETERMINISTICALLY (highest
    count, then smallest bucket: a total order, so the winning row
    is engine- and partitioning-stable — an un-tie-broken argmax is
    exactly the kind of "correct on one engine, flaky on two" trap
    the entity_card face documents for collect_list). Shape: one
    corpus scan to the (type, bucket) support (map-side
    combinable), then a row_number window over the bounded support
    partitioned by type — never a global sort, never a second
    corpus branch. Spark 4's native `mode()` aggregate is
    deliberately NOT used: its tie choice is
    implementation-defined, which can never pass a value-hash
    gate."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    v = e.select(
        "event_type",
        F.floor(F.round(F.col("value") * 100).cast("long") / 1000)
        .cast("long")
        .alias("bucket"),
    )
    c = v.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("bucket")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bucket").alias("mode_bucket"),
            F.col("cnt").alias("mode_count"),
        )
    )


# ---------------------------------------------------------------------------
# peak concurrency — interval sweep with an exact tie protocol
# ---------------------------------------------------------------------------
_CONC_WIN_US = 900_000_000  # each event holds a 15-minute window open


@q(
    "events_concurrency",
    f"""
    WITH iv AS (
      SELECT event_type, epoch_us(ts) AS s,
             epoch_us(ts) + {_CONC_WIN_US} AS e
      FROM events),
    pts AS (
      SELECT event_type, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS d FROM iv),
    run AS (
      SELECT event_type,
             SUM(d) OVER (PARTITION BY event_type
                          ORDER BY t, d
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS c
      FROM pts)
    SELECT event_type,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
           CAST(MAX(c) AS BIGINT) AS peak
    FROM run GROUP BY event_type
    """,
)
def events_concurrency(spark, sf):
    """Peak concurrency per event type — each event holds a
    15-minute window open; the answer is the classic +1/−1 interval
    sweep: unpivot every interval into a start(+1) and end(−1)
    point, order by time, and the maximum of the running sum is the
    peak overlap (capacity planning's core number: max simultaneous
    sessions/connections/jobs). Correctness hinges on the TIE
    PROTOCOL: with half-open [s, s+W) windows, an end and a start
    at the same microsecond must net to no change, so the sweep
    orders by (t, d) — the −1 sorts before the +1 at equal t
    (exactly back-to-back windows never double-count), and the
    protocol is identical in both engines because t and d are exact
    integers. The running sum partitions by event type (never a
    single-partition global window); at 100 TB the same sweep runs
    per (type, day) with boundary carry — the partition key just
    widens. unix_micros on the CAST timestamp matches DuckDB's
    naive epoch_us under the UTC-pinned session."""
    e = t(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # map-side ×2 fan-out, NOT a union of two branches — each union
    # arm would re-scan the corpus (column pruning defeats reuse)
    pts = e.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(us.alias("t"), F.lit(1).alias("d")),
                F.struct(
                    (us + _CONC_WIN_US).alias("t"), F.lit(-1).alias("d")
                ),
            )
        ).alias("x"),
    ).select("event_type", F.col("x.t").alias("t"), F.col("x.d").alias("d"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pts.select("event_type", F.sum("d").over(w).alias("c"))
    return run.groupBy("event_type").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        F.max("c").cast("long").alias("peak"),
    )


# ---------------------------------------------------------------------------
# lead-lag cross-correlation — view vs purchase daily revenue
# ---------------------------------------------------------------------------
@q(
    "events_crosscorr",
    """
    WITH cells AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) // 100
                  AS BIGINT) AS dollars
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')
      GROUP BY 1, 2),
    a AS (SELECT day, dollars AS x FROM cells
          WHERE event_type = 'view'),
    b AS (SELECT day, dollars AS y FROM cells
          WHERE event_type = 'purchase'),
    f AS (SELECT a.day, a.x, l.lg
          FROM a CROSS JOIN unnest([-3, -2, -1, 0, 1, 2, 3]) AS l(lg)),
    j AS (SELECT f.lg, f.x, b.y FROM f JOIN b ON b.day = f.day + f.lg),
    m AS (
      SELECT lg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM j GROUP BY lg)
    SELECT CAST(lg AS INT) AS lag_days, n,
           CASE WHEN n < 2 OR n * sxx - sx * sx <= 0
                     OR n * syy - sy * sy <= 0 THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)),
                           6) + 0 END AS r
    FROM m
    """,
)
def events_crosscorr(spark, sf):
    """Lead-lag cross-correlation between the 'view' and 'purchase'
    daily-revenue series at lags −3..+3 days — does purchase volume
    FOLLOW view volume, and by how many days? (events_autocorr
    answers the self-lag question; the cross version is the
    attribution/forecasting probe.) One corpus scan collapses to the
    (type, day) cells (parquet-checkpointed — the two series
    branches would each re-scan); the 7 lags fan map-side out of
    the view series by explode, align by an equi-join on day+lag,
    and each lag's Pearson derives from EXACT integer moments
    (daily DOLLARS via integer division — the events_autocorr
    BIGINT-headroom rule, since Σx²·Σy² products overflow cents²).
    The two variance factors convert to DOUBLE before their product
    (their BIGINT product overflows past ~10⁹-dollar days) in the
    identical op order both engines; degenerate lags (n < 2, zero
    variance) NULL-guard (ANSI DIVIDE_BY_ZERO)."""
    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("view", "purchase")
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cells = parquet_checkpoint(
        e.groupBy(
            "event_type",
            F.floor(us / F.lit(86400000000)).cast("long").alias("day"),
        ).agg(
            F.floor(
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100
            )
            .cast("long")
            .alias("dollars")
        ),
        "xcorr_cells",
    )
    a = cells.filter(F.col("event_type") == "view").select(
        "day", F.col("dollars").alias("x")
    )
    b = cells.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("bday"), F.col("dollars").alias("y")
    )
    f = a.select(
        "day",
        "x",
        F.explode(F.array(*[F.lit(i) for i in range(-3, 4)])).alias("lg"),
    )
    j = f.join(b, F.col("bday") == F.col("day") + F.col("lg"))
    m = j.groupBy("lg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    dx = n * F.col("sxx") - sx * sx
    dy = n * F.col("syy") - sy * sy
    bad = (n < 2) | (dx <= 0) | (dy <= 0)
    return m.select(
        F.col("lg").cast("int").alias("lag_days"),
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (n * F.col("sxy") - sx * sy).cast("double")
                / F.sqrt(dx.cast("double") * dy.cast("double")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("r"),
    )


# ---------------------------------------------------------------------------
# Markov entropy rate — how predictable is the next event?
# ---------------------------------------------------------------------------
@q(
    "events_entropy_rate",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    cells AS (
      SELECT prev AS i, event_type AS j, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
    w AS (
      SELECT i, j, c,
             SUM(c) OVER (PARTITION BY i) AS ci,
             SUM(c) OVER (PARTITION BY j) AS cj,
             SUM(c) OVER () AS tt
      FROM cells),
    m AS (
      SELECT CAST(MAX(tt) AS BIGINT) AS tt,
             CAST(SUM(CAST(round(1000.0 * c * ln(ci * 1.0 / c)) AS BIGINT))
                  AS BIGINT) AS h_millis
      FROM w),
    marg AS (
      SELECT j, CAST(MAX(cj) AS BIGINT) AS cj FROM w GROUP BY j),
    m0 AS (
      SELECT CAST(SUM(CAST(round(1000.0 * cj * ln(cj)) AS BIGINT))
                  AS BIGINT) AS l_millis
      FROM marg)
    SELECT m.tt AS n_transitions,
           CASE WHEN m.tt IS NULL OR m.tt = 0 THEN NULL
                ELSE round(m.h_millis / 1000.0 / m.tt, 6) + 0
           END AS h_rate,
           CASE WHEN m.tt IS NULL OR m.tt = 0 THEN NULL
                ELSE round(ln(m.tt) - m0.l_millis / 1000.0 / m.tt, 6) + 0
           END AS h_marginal,
           CASE WHEN m.tt IS NULL OR m.tt = 0
                     OR ln(m.tt) - m0.l_millis / 1000.0 / m.tt <= 0
                THEN NULL
                ELSE round(1 - (m.h_millis / 1000.0 / m.tt)
                               / (ln(m.tt) - m0.l_millis / 1000.0 / m.tt),
                           6) + 0
           END AS predictability
    FROM m, m0
    """,
)
def events_entropy_rate(spark, sf):
    """Empirical entropy rate of the per-user event-type Markov
    chain, against the marginal entropy of the next-event
    distribution, folded into a predictability score 1 - H|/H0 —
    the single number that says whether knowing the CURRENT event
    helps predict the next one at all (events_markov computes where
    the chain settles; this face scores how deterministic its steps
    are — the upstream go/no-go for any next-event model). Same
    LAG-per-user derivation, corpus collapsed once to |types|^2
    transition cells; row, column, and grand totals are all windows
    over that cell relation (the stat_mutual_info rule), the
    conditional entropy rides the ln-sum identity with per-cell
    terms c*ln(ci/c) quantized to integer millis (exact
    order-independent BIGINT sum), and the marginal entropy is the
    same identity over the |types|-sized column-marginal fold.
    Zero transitions or a zero marginal entropy (single event type)
    guard to NULL."""
    e = t(spark, sf, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(wseq).alias("prev")
    ).filter(F.col("prev").isNotNull())
    cells = seq.groupBy(
        F.col("prev").alias("i"), F.col("event_type").alias("j")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wi = Window.partitionBy("i")
    wj = Window.partitionBy("j")
    wall = Window.partitionBy()
    w = cells.select(
        "i",
        "j",
        "c",
        F.sum("c").over(wi).alias("ci"),
        F.sum("c").over(wj).alias("cj"),
        F.sum("c").over(wall).alias("tt"),
    )
    m = w.agg(
        F.max("tt").cast("long").alias("tt"),
        F.sum(
            F.round(
                F.lit(1000.0)
                * F.col("c")
                * F.log(F.col("ci") * F.lit(1.0) / F.col("c"))
            ).cast("long")
        )
        .cast("long")
        .alias("h_millis"),
    )
    m0 = (
        w.groupBy("j")
        .agg(F.max("cj").cast("long").alias("cj"))
        .agg(
            F.sum(
                F.round(
                    F.lit(1000.0)
                    * F.col("cj")
                    * F.log(F.col("cj").cast("double"))
                ).cast("long")
            )
            .cast("long")
            .alias("l_millis")
        )
    )
    f = m.crossJoin(m0)
    tt, hm, lm = F.col("tt"), F.col("h_millis"), F.col("l_millis")
    hrate = hm / F.lit(1000.0) / tt
    hmarg = F.log(tt.cast("double")) - lm / F.lit(1000.0) / tt
    bad = tt.isNull() | (tt == 0)
    return f.select(
        tt.alias("n_transitions"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(hrate, 6) + F.lit(0.0))
        .alias("h_rate"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(hmarg, 6) + F.lit(0.0))
        .alias("h_marginal"),
        F.when(bad | (hmarg <= 0), F.lit(None).cast("double"))
        .otherwise(F.round(1 - hrate / hmarg, 6) + F.lit(0.0))
        .alias("predictability"),
    )


# ---------------------------------------------------------------------------
# numeric RANGE frame — peers by VALUE distance, not row position
# ---------------------------------------------------------------------------
@q(
    "win_value_range",
    """
    WITH d AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
    SELECT event_id, event_type, cents,
           CAST(COUNT(*) OVER w - 1 AS BIGINT) AS n_near,
           CAST(SUM(cents) OVER w - cents AS BIGINT) AS near_cents
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY cents
                 RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
    """,
)
def win_value_range(spark, sf):
    """Numeric RANGE frame: for every event, how many SAME-TYPE
    events priced within +/- $5, and their total — peers defined by
    VALUE distance, not row position (win_moving_avg's ROWS frame
    counts k neighbors however far their values are;
    win_trailing_range's RANGE is an interval over TIME; this is
    the third frame kind, the price-banding / crowding query, and
    the window spelling of what join_range does with an explicit
    self-join — same semantics, one sort instead of a join). The
    engine maintains a sliding value-window over the per-type sort,
    so ties are handled by the frame definition itself (all peers
    within the band, including equal-cents rows) — subtracting the
    row's own contribution makes the count/sum exclusive.
    All-integer outputs; one window over one exchange."""
    d = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rangeBetween(-500, 500)
    )
    return d.select(
        "event_id",
        "event_type",
        "cents",
        (F.count(F.lit(1)).over(w) - 1).cast("long").alias("n_near"),
        (F.sum("cents").over(w) - F.col("cents"))
        .cast("long")
        .alias("near_cents"),
    )


# ---------------------------------------------------------------------------
# batch time-window TVF — window() outside streaming
# ---------------------------------------------------------------------------
@q(
    "agg_window_tvf",
    """
    WITH ev AS (
      SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
    SELECT (us // 604800000000) * 604800000000 AS win_start_us,
           (us // 604800000000) * 604800000000 + 604800000000
             AS win_end_us,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM ev GROUP BY 1, 2
    """,
)
def agg_window_tvf(spark, sf):
    """The window() time-bucketing function in BATCH mode — tumbling
    7-day windows over the event log via the SAME construct the
    streaming faces use (stream_window), which is the point: a
    pipeline prototyped as a batch rollup becomes a streaming
    rollup by swapping read for readStream, because window() means
    the same thing in both (epoch-aligned tumbling buckets,
    half-open [start, end)). The twin pins that alignment
    explicitly — start = (us div W) * W — which is also the
    correctness contract a migration relies on (a hand-rolled
    date_trunc bucketing would WEEK-align differently and every
    historic rollup would shift). Emitted as exact epoch-us
    BIGINTs (the unix_micros discipline: never formatted
    timestamps in gated output); one map-side-combinable agg."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        F.col("ts").cast("timestamp").alias("tts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = e.groupBy(F.window("tts", "7 days")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )
    return w.select(
        F.unix_micros(F.col("window.start")).alias("win_start_us"),
        F.unix_micros(F.col("window.end")).alias("win_end_us"),
        "n",
        "cents",
    )


# ---------------------------------------------------------------------------
# nth_value — fixed-position picks need an explicit full frame
# ---------------------------------------------------------------------------
@q(
    "win_nth_value",
    """
    WITH w AS (
      SELECT user_id, event_id,
             nth_value(event_type, 3) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS third_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
    SELECT user_id, third_type, CAST(n_events AS BIGINT) AS n_events
    FROM w WHERE rn = 1
    """,
)
def win_nth_value(spark, sf):
    """nth_value(type, 3) per user timeline — the fixed-position
    pick completing the positional window family (first/last via
    agg_first_last, lead/lag everywhere) with its ONE sharp edge
    pinned: under the default cumulative frame nth_value can't see
    row 3 until the window REACHES row 3, so rows 1-2 get NULL and
    row 3+ get the value — almost never what the query means; the
    explicit UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING frame
    makes it a whole-partition pick (the ml_map explicit-frame
    discipline, at its most consequential). Users with fewer than
    3 events keep NULL — the correct semantics, not an error. The
    rn = 1 projection collapses to one row per user without a
    second exchange (all three windows share the user_id
    partitioning); n_events carries the user's full event count
    alongside the pick."""
    e = t(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    wfull = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    word = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = e.select(
        "user_id",
        F.nth_value("event_type", 3).over(wfull).alias("third_type"),
        F.row_number().over(word).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .alias("n_events"),
    )
    return w.filter(F.col("rn") == 1).select(
        "user_id",
        "third_type",
        F.col("n_events").cast("long").alias("n_events"),
    )


def _ab_balance_arrow(left, right):
    """Per-user two-sided balance in pure pyarrow — only integer
    compute kernels cross the Arrow hop (the udf_map_arrow
    discipline); cents were quantized JVM-side before the shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    src = left if left.num_rows else right
    uid = src.column("user_id")[0].as_py()

    def _sum(tbl):
        if tbl.num_rows == 0:
            return 0
        v = pc.sum(tbl.column("cents")).as_py()
        return 0 if v is None else int(v)

    return pa.table(
        {
            "user_id": pa.array([uid], pa.int64()),
            "n_click": pa.array([left.num_rows], pa.int64()),
            "n_purch": pa.array([right.num_rows], pa.int64()),
            "click_cents": pa.array([_sum(left)], pa.int64()),
            "purch_cents": pa.array([_sum(right)], pa.int64()),
        }
    )


@q(
    "udf_cogroup_arrow",
    """
    WITH b AS (
      SELECT user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'purchase'))
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
             AS n_click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purch,
           CAST(COALESCE(SUM(cents) FILTER (WHERE event_type = 'click'),
                         0) AS BIGINT) AS click_cents,
           CAST(COALESCE(SUM(cents) FILTER (WHERE event_type = 'purchase'),
                         0) AS BIGINT) AS purch_cents
    FROM b GROUP BY user_id
    """,
)
def udf_cogroup_arrow(spark, sf_dir):
    """Cogrouped ``applyInArrow`` — the LAST cell of the custom-UDF
    matrix (map/grouped x pandas/Arrow x one-sided/cogrouped):
    clicks and purchases co-partition by user and ONE pyarrow
    kernel per key receives both tables raw, no pandas conversion —
    the zero-copy path for kernels that are themselves Arrow-native
    (C++ codecs, datasketches, tokenizers). Cents are quantized
    JVM-side BEFORE the hop and only integer pyarrow.compute
    kernels run inside (udf_map_arrow's discipline), so the output
    is an exact integer frame and the twin is plain FILTERed
    aggregates. Scale shape: both sides shuffle once on user_id,
    kernel memory is bounded by one user's rows; pc.sum skips
    nulls exactly like SQL SUM."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "cents"
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "cents"
    )
    return (
        clicks.groupBy("user_id")
        .cogroup(purch.groupBy("user_id"))
        .applyInArrow(
            _ab_balance_arrow,
            "user_id long, n_click long, n_purch long, "
            "click_cents long, purch_cents long",
        )
    )


# ---------------------------------------------------------------------------
# SLO burn rate — multi-window error-budget alert (SRE workbook ch. 5)
# ---------------------------------------------------------------------------
@q(
    "events_burn_rate",
    f"""
    WITH h AS (
      SELECT epoch_us(ts) // 3600000000 AS hour_num,
             CAST(COUNT(*) AS BIGINT) AS total,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errors
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1),
    w AS (
      SELECT hour_num, errors, total,
             SUM(errors) OVER (ORDER BY hour_num
                               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
               AS err6,
             SUM(total) OVER (ORDER BY hour_num
                              RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
               AS tot6
      FROM h),
    b AS (
      SELECT hour_num, errors, total,
             round(errors * 1.0 / total / 0.001, 6) + 0 AS burn_1h,
             round(err6 * 1.0 / tot6 / 0.001, 6) + 0 AS burn_6h
      FROM w WHERE total > 0 AND tot6 > 0)
    SELECT CAST(hour_num AS BIGINT) AS hour_num, errors, total,
           burn_1h, burn_6h,
           burn_1h > 14.4 AND burn_6h > 6.0 AS page
    FROM b
    ORDER BY burn_1h DESC, hour_num LIMIT 20
    """,
)
def events_burn_rate(spark, sf):
    """Multi-window error-budget burn rate (the Google SRE workbook's
    paging recipe, public): with a 99.9% SLO the error budget is
    0.1%, burn rate = observed error ratio / budget, and a page
    fires only when BOTH a fast window (1h, burn > 14.4 = budget
    gone in ~2 days) AND a slow window (6h, burn > 6) exceed their
    thresholds — the two-window AND is what kills both
    one-bad-minute false pages and slow-leak false quiets. One
    hourly pre-aggregate over the corpus; the 6-hour window is a
    RANGE frame over hour numbers on the calendar-sized hourly
    relation (win_trailing_range's shape — RANGE not ROWS, so
    missing hours in the calendar correctly shrink the denominator
    window rather than silently reaching further back in time).
    Ratios divide exact BIGINTs in identical order, round-6; hours
    with zero traffic drop out (no burn without a denominator).
    Top-20 worst fast-burn hours, deterministic tiebreak."""
    h = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"
            ).alias("hour_num")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            .cast("long")
            .alias("errors"),
        )
    )
    w6 = (
        Window.orderBy("hour_num").rangeBetween(-5, Window.currentRow)
    )
    w = h.select(
        "hour_num",
        "errors",
        "total",
        F.sum("errors").over(w6).alias("err6"),
        F.sum("total").over(w6).alias("tot6"),
    )
    b = w.filter((F.col("total") > 0) & (F.col("tot6") > 0)).select(
        "hour_num",
        "errors",
        "total",
        (
            F.round(
                F.col("errors") * F.lit(1.0) / F.col("total") / F.lit(0.001),
                6,
            )
            + F.lit(0.0)
        ).alias("burn_1h"),
        (
            F.round(
                F.col("err6") * F.lit(1.0) / F.col("tot6") / F.lit(0.001),
                6,
            )
            + F.lit(0.0)
        ).alias("burn_6h"),
    )
    return (
        b.select(
            F.col("hour_num").cast("long").alias("hour_num"),
            "errors",
            "total",
            "burn_1h",
            "burn_6h",
            ((F.col("burn_1h") > 14.4) & (F.col("burn_6h") > 6.0)).alias(
                "page"
            ),
        )
        .orderBy(F.desc("burn_1h"), "hour_num")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# linear multi-touch attribution — credit split over the prior-hour clicks
# ---------------------------------------------------------------------------
@q(
    "events_attribution_linear",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    j AS (
      SELECT p.event_id AS pid, c.event_id AS click_id
      FROM (SELECT * FROM e WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM e WHERE event_type = 'click') c
        ON c.user_id = p.user_id
       AND c.us >= p.us - 3600000000 AND c.us <= p.us),
    w AS (
      SELECT pid, click_id,
             COUNT(*) OVER (PARTITION BY pid) AS n_touch
      FROM j),
    cr AS (
      SELECT click_id,
             (2000000 + n_touch) // (2 * n_touch) AS credit_us
      FROM w)
    SELECT click_id,
           CAST(COUNT(*) AS BIGINT) AS n_assists,
           CAST(SUM(credit_us) AS BIGINT) AS credit_us
    FROM cr GROUP BY click_id
    ORDER BY credit_us DESC, click_id LIMIT 20
    """,
)
def events_attribution_linear(spark, sf):
    """LINEAR multi-touch attribution — every purchase splits one
    unit of conversion credit EQUALLY over all of the same user's
    clicks in the prior hour, the standard middle ground between
    events_attribution's last-touch (winner-takes-all overcredits
    the final click) and data-driven models (which need a trained
    uplift model this table cannot supply). The per-purchase split
    1/n quantizes half-up to exact integer micros in pure BIGINT
    arithmetic ((2e6 + n) div 2n — the text_rake trick), so each
    click's accumulated credit is an exact order-independent sum and
    the top-20 assist leaderboard hashes. Shape: user-keyed
    equi-join with the hour bound as a residual (per-user touch
    volumes bound the fan-out; a keyless variant would be
    join_range_chunked's problem), touch counts as a window keyed by
    the purchase — no second join against a counts relation.
    Purchases with no prior click drop out (unattributed organic
    conversions — last-touch drops them identically)."""
    e = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("u"),
        F.col("us").alias("pus"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("u"),
        F.col("us").alias("cus"),
    )
    j = p.join(c, "u").filter(
        (F.col("cus") >= F.col("pus") - 3600000000)
        & (F.col("cus") <= F.col("pus"))
    )
    w = j.select(
        "pid",
        "click_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("pid"))
        .alias("n_touch"),
    )
    cr = w.select(
        "click_id",
        F.expr("(2000000 + n_touch) div (2 * n_touch)").alias(
            "credit_us"
        ),
    )
    return (
        cr.groupBy("click_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assists"),
            F.sum("credit_us").cast("long").alias("credit_us"),
        )
        .orderBy(F.desc("credit_us"), "click_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# wave 110: mode(x, deterministic=true) — the native mode made
# gate-able by its lowest-tie contract
# ---------------------------------------------------------------------------
@q(
    "agg_mode_det",
    """
    WITH cc AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
             COUNT(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, c),
    rk AS (
      SELECT event_type, c, n,
             MAX(n) OVER (PARTITION BY event_type) AS mx
      FROM cc)
    SELECT event_type,
           CAST(MIN(c) AS BIGINT) AS mode_cents
    FROM rk WHERE n = mx GROUP BY event_type
    """,
)
def agg_mode_det(spark, sf):
    """``mode(x, true)`` — Spark 4's DETERMINISTIC mode flag, the
    fix for exactly the defect that made agg_mode refuse the native
    function (an implementation-defined tie pick is unhashable and,
    worse, partition-order-dependent): with the flag the contract is
    'lowest value among the tied maxima', measured and here GATED —
    the twin computes min-of-argmax from the count-of-counts support
    with a per-group MAX window, so a regression in the tie contract
    hash-mismatches immediately. Scale shape identical to the plain
    mode: one corpus agg to the (group, value) support, one bounded
    window — the flag costs one ordering comparison in the agg
    buffer, not a plan change. agg_mode (manual spelling) stays as
    the portable form; this face is the Spark-4-native fast path."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    return e.groupBy("event_type").agg(
        F.expr(
            "mode(CAST(round(value * 100) AS BIGINT), true)"
        )
        .cast("long")
        .alias("mode_cents")
    )


# ---------------------------------------------------------------------------
# wave 111: log-rank test — two-group survival comparison on the
# shared duration grid, per-time terms micros-quantized
# ---------------------------------------------------------------------------
@q(
    "stat_log_rank",
    """
    WITH u AS (
      SELECT user_id, user_id % 2 AS grp,
             MIN(epoch_us(ts)) AS fus, MAX(epoch_us(ts)) AS lus
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    ud AS (
      SELECT grp, (lus - fus) // 3600000000 AS dur,
             CASE WHEN MAX(lus) OVER () - lus < 43200000000
                  THEN 1 ELSE 0 END AS cen
      FROM u),
    sup AS (
      SELECT grp, dur, CAST(SUM(1 - cen) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS tot
      FROM ud GROUP BY grp, dur),
    grid AS (
      SELECT gg.grp, dd.dur, COALESCE(s.d, 0) AS d,
             COALESCE(s.tot, 0) AS tot
      FROM (SELECT DISTINCT grp FROM sup) gg
      CROSS JOIN (SELECT DISTINCT dur FROM sup) dd
      LEFT JOIN sup s ON s.grp = gg.grp AND s.dur = dd.dur),
    rk AS (
      SELECT grp, dur, d,
             SUM(tot) OVER (PARTITION BY grp ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_risk
      FROM grid),
    at AS (
      SELECT dur,
             CAST(SUM(d) AS BIGINT) AS dt,
             CAST(SUM(n_risk) AS BIGINT) AS nt,
             CAST(SUM(CASE WHEN grp = 0 THEN d ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN grp = 0 THEN n_risk ELSE 0 END)
                  AS BIGINT) AS n1
      FROM rk GROUP BY dur),
    terms AS (
      SELECT d1,
             CAST(round(1000000.0 * CAST(dt AS DOUBLE) * n1 / nt)
                  AS BIGINT) AS e1_mic,
             CASE WHEN nt > 1
                  THEN CAST(round(1000000.0 * CAST(dt AS DOUBLE)
                        * (nt - dt) * n1 * (nt - n1)
                        / (CAST(nt AS DOUBLE) * nt * (nt - 1)))
                       AS BIGINT)
                  ELSE 0 END AS v_mic
      FROM at WHERE dt > 0 AND nt > 0),
    fin AS (
      SELECT CAST(COALESCE(SUM(d1), 0) AS BIGINT) AS o1,
             CAST(COALESCE(SUM(e1_mic), 0) AS BIGINT) AS e1_mic,
             CAST(COALESCE(SUM(v_mic), 0) AS BIGINT) AS v_mic
      FROM terms)
    SELECT o1, e1_mic, v_mic,
           CASE WHEN v_mic = 0 THEN NULL
                ELSE round((o1 - e1_mic / 1000000.0)
                           * (o1 - e1_mic / 1000000.0)
                           / (v_mic / 1000000.0), 6) + 0
           END AS chi2
    FROM fin
    """,
)
def stat_log_rank(spark, sf):
    """Log-rank test — the inference companion to events_survival's
    Kaplan-Meier curve: do two cohorts (user-id parity) share one
    survival distribution? At each distinct lifetime the observed
    group-0 churn d1, its hypergeometric expectation d_t*n1/n_t and
    variance d_t(n_t-d_t)n1(n_t-n1)/(n_t^2(n_t-1)) accumulate; the
    per-time fractions are the only non-integers, so each quantizes
    to micros in identical op order (stat_circular discipline) and
    the three totals are exact order-independent BIGINTs, with
    chi2 = (O1-E1)^2/V as one final float. Group at-risk counts come
    from per-group SUFFIX cumulatives over the SHARED duration grid
    (the stat_jonckheere zero-filled grid — without the fill a
    duration absent from one group would silently drop that group's
    risk set instead of carrying it). Same censoring rule as the KM
    face family (right-censor users whose last event falls in the
    final 12 observed hours; durations in HOURS because the synthetic
    users all span the whole calendar in days; censored users
    leave the risk set at their censoring time and never count as
    events). Scale shape: one corpus scan to per-user spans,
    everything downstream duration-grid-bounded."""
    e = t(spark, sf, "events").filter(F.col("user_id").isNotNull())
    u = e.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
            "fus"
        ),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
            "lus"
        ),
    ).select(
        (F.col("user_id") % 2).alias("grp"), "fus", "lus"
    )
    wall = Window.partitionBy()
    ud = u.select(
        "grp",
        F.expr("(lus - fus) div 3600000000").alias("dur"),
        F.when(
            F.max("lus").over(wall) - F.col("lus") < 43200000000,
            1,
        )
        .otherwise(0)
        .alias("cen"),
    )
    from ..operators.dedup import parquet_checkpoint

    sup = parquet_checkpoint(
        ud.groupBy("grp", "dur").agg(
            F.sum(1 - F.col("cen")).cast("long").alias("d"),
            F.count(F.lit(1)).cast("long").alias("tot"),
        ),
        "logrank_sup",
    )
    grid = (
        sup.select("grp")
        .distinct()
        .crossJoin(sup.select("dur").distinct())
        .join(sup, ["grp", "dur"], "left")
        .select(
            "grp",
            "dur",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("tot", F.lit(0)).alias("tot"),
        )
    )
    wrk = (
        Window.partitionBy("grp")
        .orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rk = grid.select(
        "grp", "dur", "d", F.sum("tot").over(wrk).alias("n_risk")
    )
    at = rk.groupBy("dur").agg(
        F.sum("d").cast("long").alias("dt"),
        F.sum("n_risk").cast("long").alias("nt"),
        F.sum(F.when(F.col("grp") == 0, F.col("d")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(
            F.when(F.col("grp") == 0, F.col("n_risk")).otherwise(0)
        )
        .cast("long")
        .alias("n1"),
    )
    terms = at.filter((F.col("dt") > 0) & (F.col("nt") > 0)).select(
        "d1",
        F.round(
            F.lit(1000000.0)
            * F.col("dt").cast("double")
            * F.col("n1")
            / F.col("nt")
        )
        .cast("long")
        .alias("e1_mic"),
        F.when(
            F.col("nt") > 1,
            F.round(
                F.lit(1000000.0)
                * F.col("dt").cast("double")
                * (F.col("nt") - F.col("dt"))
                * F.col("n1")
                * (F.col("nt") - F.col("n1"))
                / (
                    F.col("nt").cast("double")
                    * F.col("nt")
                    * (F.col("nt") - 1)
                )
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("v_mic"),
    )
    fin = terms.agg(
        F.coalesce(F.sum("d1"), F.lit(0)).cast("long").alias("o1"),
        F.coalesce(F.sum("e1_mic"), F.lit(0))
        .cast("long")
        .alias("e1_mic"),
        F.coalesce(F.sum("v_mic"), F.lit(0))
        .cast("long")
        .alias("v_mic"),
    )
    dev = F.col("o1") - F.col("e1_mic") / F.lit(1000000.0)
    return fin.select(
        "o1",
        "e1_mic",
        "v_mic",
        F.when(F.col("v_mic") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                dev * dev / (F.col("v_mic") / F.lit(1000000.0)), 6
            )
            + F.lit(0.0)
        )
        .alias("chi2"),
    )


# ---------------------------------------------------------------------------
# wave 111: restricted mean survival time — the area under the KM
# curve up to a horizon, per-interval micros terms
# ---------------------------------------------------------------------------
@q(
    "events_rmst",
    """
    WITH u AS (
      SELECT user_id, MIN(epoch_us(ts)) AS fus, MAX(epoch_us(ts)) AS lus
      FROM events GROUP BY user_id),
    ud AS (
      SELECT (lus - fus) // 3600000000 AS dur,
             CASE WHEN MAX(lus) OVER () - lus < 43200000000
                  THEN 1 ELSE 0 END AS cen
      FROM u),
    sup AS (
      SELECT dur, CAST(SUM(1 - cen) AS BIGINT) AS d,
             CAST(SUM(cen) AS BIGINT) AS c
      FROM ud GROUP BY dur),
    rk AS (
      SELECT dur, d, c,
             SUM(d + c) OVER (ORDER BY dur DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS n_risk
      FROM sup),
    ev AS (
      SELECT dur, d, n_risk,
             CASE WHEN d < n_risk
                  THEN CAST(round(1000000.0
                         * ln(CAST(n_risk - d AS DOUBLE) / n_risk))
                       AS BIGINT) END AS term_micros
      FROM rk WHERE d > 0),
    km AS (
      SELECT dur,
             SUM(term_micros) OVER (ORDER BY dur
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS msum,
             MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS dead,
             LEAD(dur, 1, 1000000) OVER (ORDER BY dur) AS nxt
      FROM ev),
    terms AS (
      SELECT CAST(round(
               CASE WHEN dead = 1 THEN 0.0
                    ELSE 1000000.0 * exp(msum / 1000000.0) END
               * GREATEST(0, LEAST(nxt, 720) - LEAST(dur, 720)))
               AS BIGINT) AS tm
      FROM km),
    init AS (
      SELECT CAST(1000000 * LEAST(COALESCE(MIN(dur), 720), 720)
                  AS BIGINT) AS im,
             CAST(COUNT(*) AS BIGINT) AS n_support
      FROM ev)
    SELECT CAST(720 AS BIGINT) AS tau_hr,
           CAST(CASE WHEN (SELECT SUM(d + c) FROM sup) IS NULL THEN NULL
                ELSE init.im + COALESCE((SELECT SUM(tm) FROM terms), 0)
           END AS BIGINT) AS rmst_micros
    FROM init
    """,
)
def events_rmst(spark, sf):
    """Restricted mean survival time — the area under the KM curve
    up to a 720-hour horizon, the A/B-testing summary that stays
    valid when hazards cross and medians are undefined (the single
    number 'expected active hours within 30 days' a retention test
    reports; stat_log_rank tests the difference, RMST sizes it).
    Pure step-function integration over the SAME support relation as
    events_survival: each inter-event interval contributes
    S(t_i) * (min(t_{i+1}, tau) - min(t_i, tau)), the survival value
    comes from the cumulative micros-ln sum (kg_adamic_adar
    discipline), each interval's area quantizes to micros
    independently (order-independent integer sum), and the initial
    [0, first-event) strip at S = 1 is exact. The absorbing-zero
    regime (risk set dies) contributes nothing after death, and the
    empty corpus NULLs the estimate rather than reporting tau.
    Scale shape identical to the KM face: corpus -> per-user spans
    -> duration support; windows only over the bounded support."""
    e = t(spark, sf, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
            "fus"
        ),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
            "lus"
        ),
    )
    wall = Window.partitionBy()
    ud = u.select(
        F.expr("(lus - fus) div 3600000000").alias("dur"),
        F.when(
            F.max("lus").over(wall) - F.col("lus") < 43200000000, 1
        )
        .otherwise(0)
        .alias("cen"),
    )
    sup = ud.groupBy("dur").agg(
        F.sum(1 - F.col("cen")).cast("long").alias("d"),
        F.sum("cen").cast("long").alias("c"),
    )
    from ..operators.dedup import parquet_checkpoint

    sup = parquet_checkpoint(sup, "rmst_sup")
    wrk = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    rk = sup.select(
        "dur",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(wrk).alias("n_risk"),
    )
    ev = rk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.round(
                F.lit(1000000.0)
                * F.log(
                    (F.col("n_risk") - F.col("d")).cast("double")
                    / F.col("n_risk")
                )
            ).cast("long"),
        ).alias("term_micros"),
    )
    ev = parquet_checkpoint(ev, "rmst_ev")
    wkm = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0
    )
    km = ev.select(
        "dur",
        F.sum("term_micros").over(wkm).alias("msum"),
        F.max(
            F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
        )
        .over(wkm)
        .alias("dead"),
        F.lead("dur", 1, 1000000)
        .over(Window.orderBy("dur"))
        .alias("nxt"),
    )
    terms = km.select(
        F.round(
            F.when(F.col("dead") == 1, F.lit(0.0)).otherwise(
                F.lit(1000000.0)
                * F.exp(F.col("msum") / F.lit(1000000.0))
            )
            * F.greatest(
                F.lit(0),
                F.least(F.col("nxt"), F.lit(720))
                - F.least(F.col("dur"), F.lit(720)),
            )
        )
        .cast("long")
        .alias("tm")
    ).agg(F.coalesce(F.sum("tm"), F.lit(0)).cast("long").alias("ts"))
    init = ev.agg(
        (
            F.lit(1000000)
            * F.least(F.coalesce(F.min("dur"), F.lit(720)), F.lit(720))
        )
        .cast("long")
        .alias("im")
    )
    npop = sup.agg(
        F.sum(F.col("d") + F.col("c")).cast("long").alias("pop")
    )
    fin = init.crossJoin(terms).crossJoin(npop)
    return fin.select(
        F.lit(720).cast("long").alias("tau_hr"),
        F.when(F.col("pop").isNull(), F.lit(None).cast("long"))
        .otherwise(F.col("im") + F.col("ts"))
        .alias("rmst_micros"),
    )


# ---------------------------------------------------------------------------
# wave 112: Cochran–Mantel–Haenszel — stratified 2x2 association,
# per-stratum hypergeometric terms micros-quantized
# ---------------------------------------------------------------------------
@q(
    "stat_cmh",
    """
    WITH lab AS (
      SELECT substr(o_orderpriority, 1, 1) AS stratum,
             CAST(o_custkey % 2 AS BIGINT) AS exposed,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    cells AS (
      SELECT stratum,
             CAST(SUM(CASE WHEN exposed = 1 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN exposed = 1 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN exposed = 0 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN exposed = 0 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM lab GROUP BY stratum),
    terms AS (
      SELECT a,
             CAST(round(1000000.0 * (a + b) * (a + c)
                        / (a + b + c + d)) AS BIGINT) AS e_mic,
             CASE WHEN a + b + c + d > 1
                  THEN CAST(round(1000000.0 * (a + b) * (c + d)
                         * (a + c) * (b + d)
                         / (CAST(a + b + c + d AS DOUBLE)
                            * (a + b + c + d)
                            * (a + b + c + d - 1))) AS BIGINT)
                  ELSE 0 END AS v_mic,
             CAST(round(1000000.0 * a * d / (a + b + c + d))
                  AS BIGINT) AS ad_mic,
             CAST(round(1000000.0 * b * c / (a + b + c + d))
                  AS BIGINT) AS bc_mic
      FROM cells WHERE a + b + c + d > 0),
    fin AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COALESCE(SUM(a), 0) AS BIGINT) AS o_sum,
             CAST(COALESCE(SUM(e_mic), 0) AS BIGINT) AS e_mic,
             CAST(COALESCE(SUM(v_mic), 0) AS BIGINT) AS v_mic,
             CAST(COALESCE(SUM(ad_mic), 0) AS BIGINT) AS ad_mic,
             CAST(COALESCE(SUM(bc_mic), 0) AS BIGINT) AS bc_mic
      FROM terms)
    SELECT k, o_sum, e_mic, v_mic,
           CASE WHEN v_mic = 0 THEN NULL
                ELSE round((o_sum - e_mic / 1000000.0)
                           * (o_sum - e_mic / 1000000.0)
                           / (v_mic / 1000000.0), 6) + 0
           END AS chi2,
           CASE WHEN bc_mic = 0 THEN NULL
                ELSE round(CAST(ad_mic AS DOUBLE) / bc_mic, 6) + 0
           END AS or_mh
    FROM fin
    """,
)
def stat_cmh(spark, sf):
    """Cochran-Mantel-Haenszel test + Mantel-Haenszel common odds
    ratio — the STRATIFIED companion to stat_odds_ratio: does the
    exposure (customer-key parity) associate with order failure
    AFTER controlling for priority stratum? Pooling the five strata
    naively invites Simpson's paradox; CMH accumulates, per stratum,
    the observed exposed-positive count a, its margin-conditional
    expectation (a+b)(a+c)/T and hypergeometric variance
    n1*n0*m1*m0/(T^2(T-1)), plus the ad/T and bc/T terms whose ratio
    is the common OR. Each per-stratum fraction is the only
    non-integer, so each quantizes to micros in identical op order
    (the stat_log_rank discipline) and the five totals are exact
    order-independent BIGINT sums; chi2 (no continuity correction,
    documented) and OR_MH are single final floats with zero-variance
    / zero-denominator NULL guards. Scale shape: one corpus scan to
    a stratum-count relation, everything downstream bounded by the
    number of strata."""
    lab = t(spark, sf, "orders").select(
        F.substring("o_orderpriority", 1, 1).alias("stratum"),
        (F.col("o_custkey") % 2).cast("long").alias("exposed"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = lab.groupBy("stratum").agg(
        *[
            F.sum(
                F.when(
                    (F.col("exposed") == e) & (F.col("y") == y), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(name)
            for name, e, y in (
                ("a", 1, 1),
                ("b", 1, 0),
                ("c", 0, 1),
                ("d", 0, 0),
            )
        ]
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    tt = a + b + c + d
    terms = cells.filter(tt > 0).select(
        "a",
        F.round(F.lit(1000000.0) * (a + b) * (a + c) / tt)
        .cast("long")
        .alias("e_mic"),
        F.when(
            tt > 1,
            F.round(
                F.lit(1000000.0)
                * (a + b)
                * (c + d)
                * (a + c)
                * (b + d)
                / (tt.cast("double") * tt * (tt - F.lit(1)))
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("v_mic"),
        F.round(F.lit(1000000.0) * a * d / tt).cast("long").alias("ad_mic"),
        F.round(F.lit(1000000.0) * b * c / tt).cast("long").alias("bc_mic"),
    )
    fin = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.coalesce(F.sum("a"), F.lit(0)).cast("long").alias("o_sum"),
        F.coalesce(F.sum("e_mic"), F.lit(0)).cast("long").alias("e_mic"),
        F.coalesce(F.sum("v_mic"), F.lit(0)).cast("long").alias("v_mic"),
        F.coalesce(F.sum("ad_mic"), F.lit(0)).cast("long").alias("ad_mic"),
        F.coalesce(F.sum("bc_mic"), F.lit(0)).cast("long").alias("bc_mic"),
    )
    dev = F.col("o_sum") - F.col("e_mic") / F.lit(1000000.0)
    return fin.select(
        "k",
        "o_sum",
        "e_mic",
        "v_mic",
        F.when(F.col("v_mic") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(dev * dev / (F.col("v_mic") / F.lit(1000000.0)), 6)
            + F.lit(0.0)
        )
        .alias("chi2"),
        F.when(F.col("bc_mic") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("ad_mic").cast("double") / F.col("bc_mic"), 6
            )
            + F.lit(0.0)
        )
        .alias("or_mh"),
    )


# ---------------------------------------------------------------------------
# wave 112: Kendall's W — inter-rater concordance over the
# priority x segment revenue panel, doubled tie-ranks
# ---------------------------------------------------------------------------
@q(
    "stat_kendall_w",
    """
    WITH cells0 AS (
      SELECT substr(o.o_orderpriority, 1, 1) AS rater,
             c.c_mktsegment AS item,
             SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) // 100 AS v
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2),
    grid AS (
      SELECT rr.rater, ii.item, COALESCE(c0.v, 0) AS v
      FROM (SELECT DISTINCT rater FROM cells0) rr
      CROSS JOIN (SELECT DISTINCT item FROM cells0) ii
      LEFT JOIN cells0 c0 ON c0.rater = rr.rater AND c0.item = ii.item),
    r AS (
      SELECT item, rater, v,
             2 * RANK() OVER (PARTITION BY rater ORDER BY v)
               + COUNT(*) OVER (PARTITION BY rater, v) - 1 AS dr
      FROM grid),
    tr AS (
      SELECT item, CAST(SUM(dr) AS BIGINT) AS drsum
      FROM r GROUP BY item),
    tg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tc
      FROM r GROUP BY rater, v),
    fin AS (
      SELECT (SELECT CAST(COUNT(DISTINCT rater) AS BIGINT) FROM grid)
               AS m,
             (SELECT CAST(COUNT(DISTINCT item) AS BIGINT) FROM grid)
               AS k,
             (SELECT CAST(COALESCE(SUM(
                (drsum - (SELECT CAST(COUNT(DISTINCT rater) AS BIGINT)
                          FROM grid)
                  * ((SELECT CAST(COUNT(DISTINCT item) AS BIGINT)
                      FROM grid) + 1))
                * (drsum - (SELECT CAST(COUNT(DISTINCT rater) AS BIGINT)
                            FROM grid)
                  * ((SELECT CAST(COUNT(DISTINCT item) AS BIGINT)
                      FROM grid) + 1))), 0) AS BIGINT) FROM tr) AS s_d,
             (SELECT CAST(COALESCE(SUM(tc * tc * tc - tc), 0) AS BIGINT)
              FROM tg) AS tsum)
    SELECT m, k, s_d, tsum,
           CASE WHEN m * m * (k * k * k - k) - m * tsum <= 0 THEN NULL
                ELSE round(3.0 * s_d
                           / (m * m * (k * k * k - k) - m * tsum), 6)
                     + 0
           END AS w
    FROM fin
    """,
)
def stat_kendall_w(spark, sf):
    """Kendall's coefficient of concordance W — do the five order
    priorities (the 'raters') agree on the revenue RANKING of the
    five market segments (the 'items')? The panel is the
    orders-customer join aggregated to (priority, segment) dollars
    (integer div for headroom, the events_autocorr rule), zero-filled
    over the rater x item grid (the stat_log_rank lesson: a segment
    absent from one priority must rank LAST there, not silently drop
    the cell and shrink that rater's k). Ranks within each rater are
    tie-averaged via the doubled-rank identity dr = 2*RANK() + ties
    - 1, so per-item doubled rank sums and the concordance sum
    S_d = SUM_i (DR_i - m(k+1))^2 are exact BIGINTs (the doubled
    scale folds the usual 12S into 3*S_d exactly); the tie masses
    t^3 - t correct the denominator, and W = 3*S_d / (m^2(k^3-k) -
    m*T) is one final float in [0, 1] (identity W = Q/(m(k-1))
    against stat_friedman's machinery, different panel). All-tied
    degenerate panels NULL the denominator guard. Scale shape: one
    join + one agg to a strata x segments relation; everything
    downstream is grid-bounded (25 cells)."""
    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.substring("o_orderpriority", 1, 1).alias("rater"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = t(spark, sf, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("item")
    )
    cells0 = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("rater", "item")
        .agg(F.sum("cents").alias("vc"))
        .select("rater", "item", F.expr("vc div 100").alias("v"))
    )
    from ..operators.dedup import parquet_checkpoint

    cells0 = parquet_checkpoint(cells0, "kendall_w_cells")
    grid = (
        cells0.select("rater")
        .distinct()
        .crossJoin(cells0.select("item").distinct())
        .join(cells0, ["rater", "item"], "left")
        .select(
            "rater", "item", F.coalesce("v", F.lit(0)).alias("v")
        )
    )
    grid = parquet_checkpoint(grid, "kendall_w_grid")
    dr = (
        F.lit(2)
        * F.rank().over(Window.partitionBy("rater").orderBy("v"))
        + F.count(F.lit(1)).over(Window.partitionBy("rater", "v"))
        - F.lit(1)
    )
    r = grid.select("item", "rater", "v", dr.alias("dr"))
    mk = grid.agg(
        F.countDistinct("rater").cast("long").alias("m"),
        F.countDistinct("item").cast("long").alias("k"),
    )
    tr = r.groupBy("item").agg(
        F.sum("dr").cast("long").alias("drsum")
    )
    sd = (
        tr.crossJoin(mk)
        .select(
            (
                (F.col("drsum") - F.col("m") * (F.col("k") + 1))
                * (F.col("drsum") - F.col("m") * (F.col("k") + 1))
            ).alias("dev2")
        )
        .agg(
            F.coalesce(F.sum("dev2"), F.lit(0))
            .cast("long")
            .alias("s_d")
        )
    )
    tsum = (
        r.groupBy("rater", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc") * F.col("tc") * F.col("tc")
                    - F.col("tc")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tsum")
        )
    )
    fin = mk.crossJoin(sd).crossJoin(tsum)
    denom = (
        F.col("m")
        * F.col("m")
        * (F.col("k") * F.col("k") * F.col("k") - F.col("k"))
        - F.col("m") * F.col("tsum")
    )
    return fin.select(
        "m",
        "k",
        "s_d",
        "tsum",
        F.when(denom <= 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.lit(3.0) * F.col("s_d") / denom, 6) + F.lit(0.0)
        )
        .alias("w"),
    )


# ---------------------------------------------------------------------------
# wave 113: Brunner–Munzel — rank-based Behrens–Fisher, exact
# integer pooled/internal doubled-midrank machinery
# ---------------------------------------------------------------------------
@q(
    "stat_brunner_munzel",
    """
    WITH v AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT grp,
             2 * RANK() OVER (ORDER BY v)
               + COUNT(*) OVER (PARTITION BY v) - 1 AS drc,
             2 * RANK() OVER (PARTITION BY grp ORDER BY v)
               + COUNT(*) OVER (PARTITION BY grp, v) - 1 AS dri
      FROM v),
    g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(drc) AS BIGINT) AS sdr,
             CAST(SUM((drc - dri) * (drc - dri)) AS BIGINT) AS sq
      FROM r GROUP BY grp),
    f AS (
      SELECT CAST(COALESCE(MAX(CASE WHEN grp = 0 THEN n END), 0)
                  AS BIGINT) AS n0,
             CAST(COALESCE(MAX(CASE WHEN grp = 1 THEN n END), 0)
                  AS BIGINT) AS n1,
             CAST(COALESCE(MAX(CASE WHEN grp = 0 THEN sdr END), 0)
                  AS BIGINT) AS sdr0,
             CAST(COALESCE(MAX(CASE WHEN grp = 1 THEN sdr END), 0)
                  AS BIGINT) AS sdr1,
             CAST(COALESCE(MAX(CASE WHEN grp = 0 THEN sq END), 0)
                  AS BIGINT) AS sq0,
             CAST(COALESCE(MAX(CASE WHEN grp = 1 THEN sq END), 0)
                  AS BIGINT) AS sq1
      FROM g)
    SELECT n0, n1, sdr0, sdr1, sq0, sq1,
           CASE WHEN n0 = 0 OR n1 = 0 THEN NULL
                ELSE round((sdr1 - n1 * (n1 + 1))
                           / (2.0 * n0 * n1), 6) + 0
           END AS p_hat,
           CASE WHEN n0 < 2 OR n1 < 2
                     OR n0 * (sq0 * 1.0 * n0
                              - (sdr0 - n0 * (n0 + 1.0))
                                * (sdr0 - n0 * (n0 + 1.0)))
                        / (n0 * (n0 - 1.0))
                      + n1 * (sq1 * 1.0 * n1
                              - (sdr1 - n1 * (n1 + 1.0))
                                * (sdr1 - n1 * (n1 + 1.0)))
                        / (n1 * (n1 - 1.0)) <= 0 THEN NULL
                ELSE round(n0 * 1.0 * n1
                           * (sdr1 * 1.0 / n1 - sdr0 * 1.0 / n0)
                           / ((n0 + n1)
                              * sqrt(n0 * (sq0 * 1.0 * n0
                                     - (sdr0 - n0 * (n0 + 1.0))
                                       * (sdr0 - n0 * (n0 + 1.0)))
                                     / (n0 * (n0 - 1.0))
                                   + n1 * (sq1 * 1.0 * n1
                                     - (sdr1 - n1 * (n1 + 1.0))
                                       * (sdr1 - n1 * (n1 + 1.0)))
                                     / (n1 * (n1 - 1.0)))), 6) + 0
           END AS w
    FROM f
    """,
)
def stat_brunner_munzel(spark, sf):
    """Brunner-Munzel test — the rank-based Behrens-Fisher answer:
    is P(purchase value > other value) = 1/2, WITHOUT assuming the
    two event-type populations share a variance (Mann-Whitney's
    hidden assumption that breaks under heteroscedasticity — the
    default recommendation over MW in modern texts). The machinery
    is two doubled-midrank layers over ONE relation: pooled ranks
    drc (the stat_mannwhitney identity 2*RANK() + ties - 1) and
    WITHIN-group ranks dri; the per-observation placement A = drc -
    dri is an exact integer whose group sums obey SUM(A) = SUM(drc)
    - n(n+1) (internal doubled midranks always sum to n(n+1) — ties
    or not — an identity the test pins), so each group folds to
    three exact BIGINTs (n, SUM drc, SUM A^2) and the rank variances
    S_k^2 = (n*SQ - C^2)/(n(n-1)) with C = SUM(drc) - n(n+1), the
    statistic W = n0*n1*(mean1 - mean0) / (N*sqrt(n0*S0 + n1*S1))
    and the effect size p_hat = C1/(2*n0*n1) are single identical
    float expressions over those integers. Degenerate guards: any
    group under 2, or zero pooled rank variance, NULL the statistic.
    Scale note: the pooled rank is a single-partition window over
    the corpus — production shards it by value range with offset
    reconciliation (the abc_classification prefix-sum pattern);
    SUM(A^2) <= 4N^3 bounds the BIGINT headroom (quantize past ~1e6
    rows, the stat_cvm rule)."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("grp"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
    )
    drc = (
        F.lit(2) * F.rank().over(Window.orderBy("v"))
        + F.count(F.lit(1)).over(Window.partitionBy("v"))
        - F.lit(1)
    )
    dri = (
        F.lit(2) * F.rank().over(Window.partitionBy("grp").orderBy("v"))
        + F.count(F.lit(1)).over(Window.partitionBy("grp", "v"))
        - F.lit(1)
    )
    r = v.select("grp", drc.alias("drc"), dri.alias("dri"))
    g = r.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("drc").cast("long").alias("sdr"),
        F.sum(
            (F.col("drc") - F.col("dri"))
            * (F.col("drc") - F.col("dri"))
        )
        .cast("long")
        .alias("sq"),
    )
    f = g.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("grp") == gv, F.col(c))), F.lit(0)
            )
            .cast("long")
            .alias(f"{c}{gv}")
            for c in ("n", "sdr", "sq")
            for gv in (0, 1)
        ]
    ).select("n0", "n1", "sdr0", "sdr1", "sq0", "sq1")
    n0, n1 = F.col("n0"), F.col("n1")
    sdr0, sdr1 = F.col("sdr0"), F.col("sdr1")
    sq0, sq1 = F.col("sq0"), F.col("sq1")
    c0 = sdr0 - n0 * (n0 + F.lit(1.0))
    c1 = sdr1 - n1 * (n1 + F.lit(1.0))
    ds0 = (sq0 * F.lit(1.0) * n0 - c0 * c0) / (n0 * (n0 - F.lit(1.0)))
    ds1 = (sq1 * F.lit(1.0) * n1 - c1 * c1) / (n1 * (n1 - F.lit(1.0)))
    var = n0 * ds0 + n1 * ds1
    return f.select(
        "n0",
        "n1",
        "sdr0",
        "sdr1",
        "sq0",
        "sq1",
        F.when((n0 == 0) | (n1 == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (sdr1 - n1 * (n1 + 1)) / (F.lit(2.0) * n0 * n1), 6
            )
            + F.lit(0.0)
        )
        .alias("p_hat"),
        F.when(
            (n0 < 2) | (n1 < 2) | (var <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                n0
                * F.lit(1.0)
                * n1
                * (sdr1 * F.lit(1.0) / n1 - sdr0 * F.lit(1.0) / n0)
                / ((n0 + n1) * F.sqrt(var)),
                6,
            )
            + F.lit(0.0)
        )
        .alias("w"),
    )


# ---------------------------------------------------------------------------
# wave 113: Ansari–Bradley — rank-based scale test, exact
# permutation moments from the observed score multiset
# ---------------------------------------------------------------------------
@q(
    "stat_ansari_bradley",
    """
    WITH v AS (
      SELECT CAST(o_orderkey % 2 AS BIGINT) AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders),
    r AS (
      SELECT grp,
             2 * RANK() OVER (ORDER BY v)
               + COUNT(*) OVER (PARTITION BY v) - 1 AS drc,
             CAST(COUNT(*) OVER () AS BIGINT) AS nn
      FROM v),
    s AS (
      SELECT grp,
             LEAST(drc, 2 * (nn + 1) - drc) AS da
      FROM r),
    f AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(COALESCE(SUM(CASE WHEN grp = 1 THEN da END), 0)
                  AS BIGINT) AS ab1_d,
             CAST(COALESCE(SUM(da), 0) AS BIGINT) AS sda,
             CAST(COALESCE(SUM(da * da), 0) AS BIGINT) AS sdaq
      FROM s)
    SELECT n0, n1, ab1_d, sda, sdaq,
           CASE WHEN n0 = 0 OR n1 = 0
                     OR (n0 + n1) * sdaq - sda * sda <= 0 THEN NULL
                ELSE round((ab1_d - n1 * 1.0 * sda / (n0 + n1))
                           / sqrt(n1 * 1.0 * n0
                                  * ((n0 + n1) * 1.0 * sdaq
                                     - sda * 1.0 * sda)
                                  / ((n0 + n1) * 1.0 * (n0 + n1)
                                     * (n0 + n1 - 1))), 6) + 0
           END AS z
    FROM f
    """,
)
def stat_ansari_bradley(spark, sf):
    """Ansari-Bradley test — the rank-based SCALE alternative: do the
    odd- and even-orderkey halves of order totals have the same
    dispersion around a common median? Completes the two-sample
    ladder: location (stat_mannwhitney, stat_mood_median),
    location-with-unequal-variance (stat_brunner_munzel), variance
    parametric (stat_levene, stat_bartlett) — this is the variance
    test that needs no moments at all. Scores fold the pooled ranks
    inward, a = min(rank, N+1-rank): extreme values score low, so a
    SMALL group-1 sum means group 1 is more dispersed. In doubled
    space da = min(drc, 2(N+1) - drc) stays an exact integer through
    ties; the null moments come from the OBSERVED score multiset
    (sampling n1 of N scores without replacement): E = n1*sda/N,
    Var = n0*n1*(N*sdaq - sda^2)/(N^2(N-1)) — the tie-exact
    conditional moments, not the textbook no-tie closed form (which
    is wrong under ties) — and z is one final float over five exact
    BIGINTs. Same single-partition pooled-rank scale note as
    stat_brunner_munzel (shard by value range in production)."""
    v = t(spark, sf, "orders").select(
        (F.col("o_orderkey") % 2).cast("long").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    drc = (
        F.lit(2) * F.rank().over(Window.orderBy("v"))
        + F.count(F.lit(1)).over(Window.partitionBy("v"))
        - F.lit(1)
    )
    nn = F.count(F.lit(1)).over(Window.partitionBy())
    r = v.select("grp", drc.alias("drc"), nn.cast("long").alias("nn"))
    s = r.select(
        "grp",
        F.least(
            F.col("drc"), F.lit(2) * (F.col("nn") + 1) - F.col("drc")
        ).alias("da"),
    )
    f = s.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.coalesce(F.sum(F.when(F.col("grp") == 1, F.col("da"))), F.lit(0))
        .cast("long")
        .alias("ab1_d"),
        F.coalesce(F.sum("da"), F.lit(0)).cast("long").alias("sda"),
        F.coalesce(F.sum(F.col("da") * F.col("da")), F.lit(0))
        .cast("long")
        .alias("sdaq"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    sda, sdaq, ab1 = F.col("sda"), F.col("sdaq"), F.col("ab1_d")
    nn_ = n0 + n1
    disc = nn_ * sdaq - sda * sda
    return f.select(
        "n0",
        "n1",
        "ab1_d",
        "sda",
        "sdaq",
        F.when(
            (n0 == 0) | (n1 == 0) | (disc <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (ab1 - n1 * F.lit(1.0) * sda / nn_)
                / F.sqrt(
                    n1
                    * F.lit(1.0)
                    * n0
                    * (nn_ * F.lit(1.0) * sdaq - sda * F.lit(1.0) * sda)
                    / (nn_ * F.lit(1.0) * nn_ * (nn_ - 1))
                ),
                6,
            )
            + F.lit(0.0)
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# wave 114: TOST equivalence — two one-sided Welch tests against a
# relative margin
# ---------------------------------------------------------------------------
@q(
    "stat_tost",
    """
    WITH lab AS (
      SELECT o_totalprice AS x,
             CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                       < '8'
                  THEN 'a' ELSE 'b' END AS half
      FROM orders),
    m AS (
      SELECT CAST(COUNT(*) FILTER (WHERE half = 'a') AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (WHERE half = 'b') AS BIGINT) AS n_b,
             AVG(x) FILTER (WHERE half = 'a') AS m_a,
             AVG(x) FILTER (WHERE half = 'b') AS m_b,
             var_samp(x) FILTER (WHERE half = 'a') AS v_a,
             var_samp(x) FILTER (WHERE half = 'b') AS v_b
      FROM lab)
    SELECT n_a, n_b,
           round(m_a - m_b, 6) + 0 AS diff,
           CASE WHEN n_a < 2 OR n_b < 2
                     OR v_a / n_a + v_b / n_b <= 0 THEN NULL
                ELSE round((m_a - m_b + 0.10 * abs((m_a + m_b) / 2))
                           / sqrt(v_a / n_a + v_b / n_b), 6) + 0
           END AS t_lower,
           CASE WHEN n_a < 2 OR n_b < 2
                     OR v_a / n_a + v_b / n_b <= 0 THEN NULL
                ELSE round((m_a - m_b - 0.10 * abs((m_a + m_b) / 2))
                           / sqrt(v_a / n_a + v_b / n_b), 6) + 0
           END AS t_upper,
           CASE WHEN n_a < 2 OR n_b < 2
                     OR v_a / n_a + v_b / n_b <= 0 THEN NULL
                ELSE round((m_a - m_b + 0.10 * abs((m_a + m_b) / 2))
                           / sqrt(v_a / n_a + v_b / n_b), 6)
                       > 1.6448536269514722
                     AND round((m_a - m_b - 0.10 * abs((m_a + m_b) / 2))
                               / sqrt(v_a / n_a + v_b / n_b), 6)
                       < -1.6448536269514722
           END AS equivalent
    FROM m
    """,
)
def stat_tost(spark, sf):
    """TOST equivalence test — the inference stat_ttest CANNOT give:
    failing to reject 'means differ' is NOT evidence they are the
    same (the absence-of-evidence fallacy every A/A-gated rollout
    report commits); TOST flips the burden by testing two one-sided
    hypotheses against an explicit margin (here +/-10% of the pooled
    mean) and declares equivalence only when BOTH one-sided Welch
    statistics clear the one-sided 5% critical value (z = 1.6448...
    embedded as an import-time literal, the stat_wilson_ci
    discipline). Same conditional-moment machinery as stat_ttest
    (six FILTERed aggregates, one map-side-combinable pass, md5 A/A
    halves of order totals); the equivalence verdict compares the
    ROUNDED statistics on both engines so the boolean can never flip
    on sub-ulp accumulation differences (the events_outliers rounded-
    filter rule). On the A/A split the verdict is TRUE by a wide
    margin — the fixture's non-degeneracy is |t_lower| and |t_upper|
    both far from the critical value, pinned in tests. Scale shape:
    one scan, one 1-row aggregate."""
    zc = 1.6448536269514722
    lab = t(spark, sf, "orders").select(
        F.col("o_totalprice").alias("x"),
        F.when(
            F.substring(
                F.md5(F.col("o_orderkey").cast("string")), 1, 1
            )
            < "8",
            "a",
        )
        .otherwise("b")
        .alias("half"),
    )
    a, b = F.col("half") == "a", F.col("half") == "b"
    m = lab.agg(
        F.count(F.when(a, 1)).cast("long").alias("n_a"),
        F.count(F.when(b, 1)).cast("long").alias("n_b"),
        F.avg(F.when(a, F.col("x"))).alias("m_a"),
        F.avg(F.when(b, F.col("x"))).alias("m_b"),
        F.var_samp(F.when(a, F.col("x"))).alias("v_a"),
        F.var_samp(F.when(b, F.col("x"))).alias("v_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    ma, mb = F.col("m_a"), F.col("m_b")
    se2 = F.col("v_a") / na + F.col("v_b") / nb
    delta = F.lit(0.10) * F.abs((ma + mb) / F.lit(2))
    bad = (na < 2) | (nb < 2) | (se2 <= 0)
    t_lo = F.round((ma - mb + delta) / F.sqrt(se2), 6)
    t_hi = F.round((ma - mb - delta) / F.sqrt(se2), 6)
    return m.select(
        "n_a",
        "n_b",
        (F.round(ma - mb, 6) + F.lit(0.0)).alias("diff"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(t_lo + F.lit(0.0))
        .alias("t_lower"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(t_hi + F.lit(0.0))
        .alias("t_upper"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise((t_lo > F.lit(zc)) & (t_hi < F.lit(-zc)))
        .alias("equivalent"),
    )


# ---------------------------------------------------------------------------
# wave 115: two-sample Anderson–Darling — EDF test with tail weight,
# shared-grid integer machinery
# ---------------------------------------------------------------------------
@q(
    "stat_anderson_darling",
    """
    WITH v AS (
      SELECT CAST(l_linenumber % 2 AS BIGINT) AS grp,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem),
    cells AS (
      SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY grp, v),
    grid AS (
      SELECT gg.grp, vv.v, COALESCE(c0.c, 0) AS c
      FROM (SELECT DISTINCT grp FROM cells) gg
      CROSS JOIN (SELECT DISTINCT v FROM cells) vv
      LEFT JOIN cells c0 ON c0.grp = gg.grp AND c0.v = vv.v),
    cum AS (
      SELECT grp, v, c,
             SUM(c) OVER (PARTITION BY grp ORDER BY v) AS m
      FROM grid),
    att AS (
      SELECT v,
             CAST(MAX(CASE WHEN grp = 0 THEN m END) AS BIGINT) AS m0,
             CAST(MAX(CASE WHEN grp = 1 THEN m END) AS BIGINT) AS m1,
             CAST(SUM(c) AS BIGINT) AS l
      FROM cum GROUP BY v),
    b AS (
      SELECT v, m0, m1, l, m0 + m1 AS bj,
             MAX(m0) OVER () AS n0, MAX(m1) OVER () AS n1
      FROM att),
    terms AS (
      SELECT CAST(round(1000000.0 * l
               * CAST(n0 * bj - (n0 + n1) * m0 AS DOUBLE)
               * (n0 * bj - (n0 + n1) * m0)
               / (bj * 1.0 * ((n0 + n1) - bj) * n0 * (n0 + n1)))
               AS BIGINT) AS t0,
             CAST(round(1000000.0 * l
               * CAST(n1 * bj - (n0 + n1) * m1 AS DOUBLE)
               * (n1 * bj - (n0 + n1) * m1)
               / (bj * 1.0 * ((n0 + n1) - bj) * n1 * (n0 + n1)))
               AS BIGINT) AS t1
      FROM b
      WHERE bj > 0 AND bj < n0 + n1 AND n0 > 0 AND n1 > 0),
    fin AS (
      SELECT CAST(COALESCE(SUM(t0), 0) AS BIGINT) AS s0_mic,
             CAST(COALESCE(SUM(t1), 0) AS BIGINT) AS s1_mic
      FROM terms)
    SELECT (SELECT MAX(m0) FROM att WHERE m0 IS NOT NULL) AS n0,
           (SELECT MAX(m1) FROM att WHERE m1 IS NOT NULL) AS n1,
           s0_mic, s1_mic,
           round((s0_mic + s1_mic) / 1000000.0, 6) + 0 AS a2
    FROM fin
    """,
)
def stat_anderson_darling(spark, sf):
    """Two-sample Anderson-Darling (Scholz-Stephens A2_kN, k = 2,
    right-continuous ECDF version) — completes the EDF-distance trio
    with stat_ks (sup metric, tail-blind) and stat_cvm (integrated
    square, center-weighted): AD divides each squared ECDF gap by
    B(N-B), which blows the weight up in the TAILS — the test that
    catches a contaminated price feed whose bulk matches but whose
    extremes don't. Machinery is the shared zero-filled value grid
    (stat_jonckheere / stat_log_rank discipline): per-group prefix
    cumulatives M_ij on the grid make the pooled cumulative B_j =
    M_0j + M_1j for free (no second window), the per-distinct-value
    deviation N*M_ij - n_i*B_j is an exact BIGINT, and each term
    l_j * dev^2 / (B_j (N-B_j) n_i N) is micros-quantized in
    identical op order (dev^2 crosses 2^53, so the square is taken
    in DOUBLE on both engines — the stat_mahalanobis precedent:
    parity by identical IEEE op order, documented precision trade).
    The last grid point (B = N) is excluded by the weight's zero
    denominator, exactly as the statistic requires. Under H0,
    E[A2] = k - 1 = 1 — the replay test pins the fixture lands near
    it. Scale shape: one scan to (grp, value) cells; windows only
    over the value grid."""
    v = t(spark, sf, "lineitem").select(
        (F.col("l_linenumber") % 2).cast("long").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    cells = v.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    from ..operators.dedup import parquet_checkpoint

    cells = parquet_checkpoint(cells, "ad_cells")
    grid = (
        cells.select("grp")
        .distinct()
        .crossJoin(cells.select("v").distinct())
        .join(cells, ["grp", "v"], "left")
        .select("grp", "v", F.coalesce("c", F.lit(0)).alias("c"))
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "grp", "v", "c", F.sum("c").over(wcum).alias("m")
    )
    att = cum.groupBy("v").agg(
        F.max(F.when(F.col("grp") == 0, F.col("m")))
        .cast("long")
        .alias("m0"),
        F.max(F.when(F.col("grp") == 1, F.col("m")))
        .cast("long")
        .alias("m1"),
        F.sum("c").cast("long").alias("l"),
    )
    att = parquet_checkpoint(att, "ad_att")
    wall = Window.partitionBy()
    b = att.select(
        "v",
        "m0",
        "m1",
        "l",
        (F.col("m0") + F.col("m1")).alias("bj"),
        F.max("m0").over(wall).alias("n0"),
        F.max("m1").over(wall).alias("n1"),
    )
    nn = F.col("n0") + F.col("n1")

    def term(mi, ni):
        dev = ni * F.col("bj") - nn * mi
        return (
            F.round(
                F.lit(1000000.0)
                * F.col("l")
                * dev.cast("double")
                * dev
                / (
                    F.col("bj")
                    * F.lit(1.0)
                    * (nn - F.col("bj"))
                    * ni
                    * nn
                )
            ).cast("long")
        )

    terms = b.filter(
        (F.col("bj") > 0)
        & (F.col("bj") < nn)
        & (F.col("n0") > 0)
        & (F.col("n1") > 0)
    ).select(
        term(F.col("m0"), F.col("n0")).alias("t0"),
        term(F.col("m1"), F.col("n1")).alias("t1"),
    )
    fin = terms.agg(
        F.coalesce(F.sum("t0"), F.lit(0)).cast("long").alias("s0_mic"),
        F.coalesce(F.sum("t1"), F.lit(0)).cast("long").alias("s1_mic"),
    )
    tots = att.agg(
        F.max("m0").cast("long").alias("n0"),
        F.max("m1").cast("long").alias("n1"),
    )
    return fin.crossJoin(tots).select(
        "n0",
        "n1",
        "s0_mic",
        "s1_mic",
        (
            F.round(
                (F.col("s0_mic") + F.col("s1_mic")) / F.lit(1000000.0),
                6,
            )
            + F.lit(0.0)
        ).alias("a2"),
    )


# ---------------------------------------------------------------------------
# wave 116: maximum drawdown — worst drop from a running peak,
# all-integer window machinery
# ---------------------------------------------------------------------------
@q(
    "events_drawdown",
    """
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    dd AS (
      SELECT event_type, day, cents,
             MAX(cents) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cents AS draw
      FROM daily)
    SELECT event_type,
           CAST(MAX(draw) AS BIGINT) AS max_drawdown_cents,
           CAST(MIN(CASE WHEN draw = (SELECT MAX(d2.draw) FROM dd d2
                                      WHERE d2.event_type = dd.event_type)
                         THEN day END) AS BIGINT) AS trough_day
    FROM dd GROUP BY event_type
    """,
)
def events_drawdown(spark, sf):
    """Maximum drawdown per event type — the worst drop of the daily
    revenue level below its historical peak, the risk metric a
    revenue-ops dashboard borrows from finance (events_bollinger
    flags band breaches; drawdown measures the DEPTH of the worst
    slump and when it bottomed). Pure integer window machinery: the
    running peak is a cumulative MAX over the day-ordered daily
    cents, draw = peak - cents is an exact BIGINT, and the trough
    day is the FIRST day attaining the maximum draw (MIN over the
    matching days — a deterministic argmax, the agg_first_last
    tiebreak discipline, spelled as a correlated max in the twin and
    as a window max in Spark so both engines resolve ties
    identically). Scale shape: corpus -> calendar x types cells in
    one agg; the windows run over the bounded daily relation, one
    partition per type."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = e.groupBy(
        "event_type",
        F.expr(
            "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    wpk = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = daily.select(
        "event_type",
        "day",
        (F.max("cents").over(wpk) - F.col("cents")).alias("draw"),
    )
    wmx = Window.partitionBy("event_type")
    dd2 = dd.select(
        "event_type",
        "day",
        "draw",
        F.max("draw").over(wmx).alias("mx"),
    )
    return dd2.groupBy("event_type").agg(
        F.max("draw").cast("long").alias("max_drawdown_cents"),
        F.min(F.when(F.col("draw") == F.col("mx"), F.col("day")))
        .cast("long")
        .alias("trough_day"),
    )


# ---------------------------------------------------------------------------
# wave 119: Mann–Kendall trend test — pairwise signs over the
# bounded calendar, tie-exact variance
# ---------------------------------------------------------------------------
@q(
    "stat_mann_kendall",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    pairs AS (
      SELECT CASE WHEN b.cents > a.cents THEN 1
                  WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sg
      FROM daily a JOIN daily b ON b.day > a.day),
    ties AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tc
      FROM daily GROUP BY cents),
    f AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n,
             (SELECT CAST(COALESCE(SUM(sg), 0) AS BIGINT) FROM pairs)
               AS s,
             (SELECT CAST(COALESCE(SUM(tc * (tc - 1) * (2 * tc + 5)),
                                   0) AS BIGINT) FROM ties) AS tcor)
    SELECT n, s,
           CAST(n * (n - 1) * (2 * n + 5) - tcor AS BIGINT) AS var18,
           CASE WHEN n < 2 OR n * (n - 1) * (2 * n + 5) - tcor <= 0
                THEN NULL
                ELSE round((s - CASE WHEN s > 0 THEN 1
                                     WHEN s < 0 THEN -1 ELSE 0 END)
                           / sqrt((n * (n - 1) * (2 * n + 5) - tcor)
                                  / 18.0), 6) + 0
           END AS z
    FROM f
    """,
)
def stat_mann_kendall(spark, sf):
    """Mann-Kendall trend test on the daily revenue series — the
    significance companion to stat_theilsen's slope (theilsen says
    HOW steep, MK says whether a monotone trend exists at all,
    distribution-free, robust to the spikes that wreck an OLS
    t-test). S = sum of sign(c_j - c_i) over all day pairs i < j is
    an exact integer from the calendar-bounded self-join (the
    quadratic lives on ~30 rows, the stat_theilsen rule — the
    corpus is scanned once by the daily agg); the null variance
    carries the tie correction as 18*Var = n(n-1)(2n+5) - SUM
    t(t-1)(2t+5) over tied daily values, kept as the exact integer
    var18 so the only float is the final continuity-corrected z =
    (S - sign(S)) / sqrt(var18/18). Degenerate calendars (n < 2, or
    all days tied making var18 = 0) NULL the statistic."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "mk_daily")
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(b, F.col("b.day") > F.col("a.day")).select(
        F.when(F.col("b.cents") > F.col("a.cents"), 1)
        .when(F.col("b.cents") < F.col("a.cents"), -1)
        .otherwise(0)
        .alias("sg")
    )
    s_agg = pairs.agg(
        F.coalesce(F.sum("sg"), F.lit(0)).cast("long").alias("s")
    )
    n_agg = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    t_agg = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc")
                    * (F.col("tc") - 1)
                    * (2 * F.col("tc") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tcor")
        )
    )
    f = n_agg.crossJoin(s_agg).crossJoin(t_agg)
    n, s = F.col("n"), F.col("s")
    var18 = n * (n - 1) * (2 * n + 5) - F.col("tcor")
    sgn = F.when(s > 0, 1).when(s < 0, -1).otherwise(0)
    return f.select(
        "n",
        "s",
        var18.cast("long").alias("var18"),
        F.when((n < 2) | (var18 <= 0), F.lit(None).cast("double"))
        .otherwise(
            F.round((s - sgn) / F.sqrt(var18 / F.lit(18.0)), 6)
            + F.lit(0.0)
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# wave 121: one-sample KS vs discrete uniform — hash-uniformity
# certificate in exact cross-multiplied integers
# ---------------------------------------------------------------------------
@q(
    "stat_ks_uniform",
    """
    WITH b AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
               ::UBIGINT AS bk
      FROM documents),
    c AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bk),
    e AS (
      SELECT bk, cnt,
             SUM(cnt) OVER (ORDER BY bk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k,
             SUM(cnt) OVER () AS n
      FROM c),
    d AS (
      SELECT n,
             GREATEST(abs(256 * k - n * (bk + 1)),
                      abs(256 * (k - cnt) - n * bk)) AS dn
      FROM e)
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(dn) AS BIGINT) AS d_num,
           round(CAST(MAX(dn) AS DOUBLE) / (256.0 * MAX(n)), 6) + 0
             AS ks_stat,
           round(CAST(MAX(dn) AS DOUBLE) / (256.0 * MAX(n)), 6)
             < round(1.627 / sqrt(CAST(MAX(n) AS DOUBLE)), 6)
             AS uniform_ok
    FROM d
    """,
)
def stat_ks_uniform(spark, sf):
    """One-sample Kolmogorov-Smirnov against the discrete uniform —
    the hash-uniformity certificate every md5-sharded pipeline in
    this repo implicitly relies on (shard_plan, sample_balanced,
    feat_hashing, the LSH band keys all assume the first hash byte
    is uniform; this face MEASURES it instead of assuming). The
    statistic is fully exact: with 256 hash buckets, the sup over
    the ECDF step function is the max over buckets of the
    cross-multiplied integers |256*k - n*(b+1)| (after-step gap) and
    |256*(k - c_b) - n*b| (before-step gap) — the stat_ks
    discipline extended to a THEORETICAL CDF, no float until the
    final division by 256n. The alpha = 0.01 acceptance compares
    ROUNDED values of identical expressions on both engines
    (1.627/sqrt(n) is the asymptotic critical value, embedded as a
    literal); the replay test pins uniform_ok = TRUE — md5 had
    better be uniform, and if this face ever fails, every sharding
    decision upstream is suspect. Scale shape: one scan to 256
    buckets; windows over the bucket-bounded relation."""
    b = t(spark, sf, "documents").select(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2),
            16,
            10,
        )
        .cast("long")
        .alias("bk")
    )
    c = b.groupBy("bk").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    e = c.select(
        "bk",
        "cnt",
        F.sum("cnt")
        .over(
            Window.orderBy("bk").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("k"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    d = e.select(
        "n",
        F.greatest(
            F.abs(256 * F.col("k") - F.col("n") * (F.col("bk") + 1)),
            F.abs(
                256 * (F.col("k") - F.col("cnt"))
                - F.col("n") * F.col("bk")
            ),
        ).alias("dn"),
    )
    ks = F.round(
        F.max("dn").cast("double") / (F.lit(256.0) * F.max("n")), 6
    )
    return d.agg(
        F.max("n").cast("long").alias("n"),
        F.max("dn").cast("long").alias("d_num"),
        (ks + F.lit(0.0)).alias("ks_stat"),
        (
            ks
            < F.round(
                F.lit(1.627) / F.sqrt(F.max("n").cast("double")), 6
            )
        ).alias("uniform_ok"),
    )


# ---------------------------------------------------------------------------
# wave 122: Quade test — range-weighted blocked ranks, all-integer
# doubled machinery
# ---------------------------------------------------------------------------
@q(
    "stat_quade",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_num,
             event_type,
             SUM(CAST(round(value * 100) AS BIGINT)) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
           FROM daily),
    fb AS (
      SELECT day_num FROM daily GROUP BY day_num
      HAVING COUNT(*) = (SELECT k FROM kk)),
    r AS (
      SELECT d.event_type, d.day_num, d.v,
             2 * RANK() OVER (PARTITION BY d.day_num ORDER BY d.v)
               + COUNT(*) OVER (PARTITION BY d.day_num, d.v) - 1 AS dr
      FROM daily d JOIN fb USING (day_num)),
    rng AS (
      SELECT day_num, MAX(v) - MIN(v) AS rg FROM r GROUP BY day_num),
    wts AS (
      SELECT day_num,
             2 * RANK() OVER (ORDER BY rg)
               + COUNT(*) OVER (PARTITION BY rg) - 1 AS dw
      FROM rng),
    sc AS (
      SELECT r.event_type,
             wts.dw * (r.dr - ((SELECT k FROM kk) + 1)) AS ds
      FROM r JOIN wts USING (day_num)),
    tr AS (
      SELECT event_type, CAST(SUM(ds) AS BIGINT) AS sj
      FROM sc GROUP BY event_type),
    fin AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fb) AS n,
             (SELECT k FROM kk) AS k,
             (SELECT CAST(SUM(ds * ds) AS BIGINT) FROM sc) AS a_q,
             (SELECT CAST(SUM(sj * sj) AS BIGINT) FROM tr) AS sb_q)
    SELECT n, k, a_q, sb_q,
           CASE WHEN n < 2 OR k < 2 OR n * a_q - sb_q <= 0 THEN NULL
                ELSE round((n - 1.0) * sb_q / (n * a_q - sb_q), 6) + 0
           END AS f_stat
    FROM fin
    """,
)
def stat_quade(spark, sf):
    """Quade test — the range-WEIGHTED member of the blocked-rank
    family (stat_friedman treats every day as equally informative;
    Quade up-weights the days where treatments actually SPREAD, the
    right choice at small k where Friedman wastes power): block
    weights are the tie-averaged ranks of each day's value RANGE,
    scores are S_bj = W_b * (r_bj - (k+1)/2), and the statistic is
    F = (n-1)B/(A-B). Everything stays integer in doubled space —
    within-day doubled ranks dr, doubled range-rank weights dw, and
    dS = dw*(dr - (k+1)) carries BOTH doublings, so A and B's
    numerators (SUM dS^2, SUM_j S_j^2) are exact BIGINTs whose
    common x16 scale CANCELS in F = (n-1)*SB / (n*A - SB) — one
    final float from three exact integers. Daily dollars via
    integer div (the events_autocorr headroom rule); complete
    blocks only (the stat_friedman fb discipline); the perfect-
    concordance degenerate case (n*A = SB) NULLs, as does a single
    treatment. Scale shape identical to Friedman: corpus -> calendar
    x types cells once, every later relation calendar-bounded."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day_num"),
            "event_type",
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc"))
        .select("day_num", "event_type", F.expr("vc div 100").alias("v"))
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "quade_daily")
    kk = daily.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    fb = (
        daily.groupBy("day_num")
        .agg(F.count(F.lit(1)).alias("ntypes"))
        .crossJoin(kk)
        .filter(F.col("ntypes") == F.col("k"))
        .select("day_num", "k")
    )
    r = daily.join(fb, "day_num").select(
        "event_type",
        "day_num",
        "v",
        "k",
        (
            F.lit(2)
            * F.rank().over(
                Window.partitionBy("day_num").orderBy("v")
            )
            + F.count(F.lit(1)).over(
                Window.partitionBy("day_num", "v")
            )
            - F.lit(1)
        ).alias("dr"),
    )
    r = parquet_checkpoint(r, "quade_r")
    rng = r.groupBy("day_num").agg(
        (F.max("v") - F.min("v")).alias("rg")
    )
    wts = rng.select(
        "day_num",
        (
            F.lit(2) * F.rank().over(Window.orderBy("rg"))
            + F.count(F.lit(1)).over(Window.partitionBy("rg"))
            - F.lit(1)
        ).alias("dw"),
    )
    sc = r.join(wts, "day_num").select(
        "event_type",
        (F.col("dw") * (F.col("dr") - (F.col("k") + 1))).alias("ds"),
    )
    sc = parquet_checkpoint(sc, "quade_sc")
    tr = sc.groupBy("event_type").agg(
        F.sum("ds").cast("long").alias("sj")
    )
    n_agg = fb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    a_agg = sc.agg(
        F.sum(F.col("ds") * F.col("ds")).cast("long").alias("a_q")
    )
    b_agg = tr.agg(
        F.sum(F.col("sj") * F.col("sj")).cast("long").alias("sb_q")
    )
    fin = n_agg.crossJoin(kk).crossJoin(a_agg).crossJoin(b_agg)
    n, k = F.col("n"), F.col("k")
    a_q, sb_q = F.col("a_q"), F.col("sb_q")
    return fin.select(
        "n",
        "k",
        "a_q",
        "sb_q",
        F.when(
            (n < 2) | (k < 2) | (n * a_q - sb_q <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (n - F.lit(1.0)) * sb_q / (n * a_q - sb_q), 6
            )
            + F.lit(0.0)
        )
        .alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# wave 122: geometric mean aggregate — the ln-sum identity as an
# exact grouped aggregate
# ---------------------------------------------------------------------------
@q(
    "agg_geomean",
    """
    WITH lab AS (
      SELECT o_orderpriority AS g,
             CAST(round(ln(o_totalprice) * 1000000) AS BIGINT) AS lm
      FROM orders WHERE o_totalprice > 0),
    s AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(lm) AS BIGINT) AS sum_ln_mic
      FROM lab GROUP BY g)
    SELECT g, n, sum_ln_mic,
           round(exp(CAST(sum_ln_mic AS DOUBLE) / 1000000.0 / n), 6)
             + 0 AS geomean
    FROM s
    """,
)
def agg_geomean(spark, sf):
    """Geometric mean of order totals per priority — the aggregate
    the arithmetic AVG family can't substitute for multiplicative
    quantities (growth factors, price ratios, latency multipliers:
    AVG of a 2x and a 0.5x change is 1.25x, the geomean is the
    correct 1.0x). Spark has no product/geomean aggregate, and a
    naive product overflows anything; the ln-sum identity
    exp(mean(ln x)) is the standard rewrite — and the repo's
    per-term integer-micros quantization (the kg_adamic_adar
    discipline) makes it an EXACT order-independent BIGINT
    aggregate, map-side combinable like any SUM/COUNT pair, with
    one exp at the end. Non-positive values are excluded by
    contract (domain of ln), documented rather than silently
    absorbed. The micros sums ride the hash, so the gate pins the
    quantization itself, not just the rounded float. Scale shape:
    one scan, one ordinary grouped agg — partial before the
    shuffle."""
    lab = (
        t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.col("o_orderpriority").alias("g"),
            F.round(F.log(F.col("o_totalprice")) * 1000000)
            .cast("long")
            .alias("lm"),
        )
    )
    s = lab.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lm").cast("long").alias("sum_ln_mic"),
    )
    return s.select(
        "g",
        "n",
        "sum_ln_mic",
        (
            F.round(
                F.exp(
                    F.col("sum_ln_mic").cast("double")
                    / F.lit(1000000.0)
                    / F.col("n")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("geomean"),
    )


# ---------------------------------------------------------------------------
# wave 124: power / minimum-detectable-effect — the experiment-
# planning closed form over exact counts
# ---------------------------------------------------------------------------
@q(
    "stat_power_mde",
    """
    WITH lab AS (
      SELECT CASE WHEN substr(md5('pw:' || CAST(event_id AS VARCHAR)),
                              1, 1) < '8' THEN 1 ELSE 0 END AS grp,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    m AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN grp = 1 THEN y ELSE 0 END) AS BIGINT)
               AS x1,
             CAST(SUM(CASE WHEN grp = 0 THEN y ELSE 0 END) AS BIGINT)
               AS x0
      FROM lab)
    SELECT n0, n1, x0, x1,
           round(x0 * 1.0 / n0, 6) + 0 AS p0,
           round(x1 * 1.0 / n1, 6) + 0 AS p1,
           round((1.9599639845400545 + 0.8416212335729143)
                 * sqrt((x0 * 1.0 / n0) * (1 - x0 * 1.0 / n0) / n0
                        + (x1 * 1.0 / n1) * (1 - x1 * 1.0 / n1) / n1),
                 6) + 0 AS mde,
           abs(round(x1 * 1.0 / n1 - x0 * 1.0 / n0, 6))
             > round((1.9599639845400545 + 0.8416212335729143)
                 * sqrt((x0 * 1.0 / n0) * (1 - x0 * 1.0 / n0) / n0
                        + (x1 * 1.0 / n1) * (1 - x1 * 1.0 / n1) / n1),
                 6) AS powered
    FROM m
    """,
)
def stat_power_mde(spark, sf):
    """Minimum detectable effect at 80% power / 5% two-sided alpha —
    the experiment-PLANNING number every A/B platform prints next to
    stat_prop_ztest's verdict: with these arms and these conversion
    rates, how big a lift could this experiment even see? MDE =
    (z_{alpha/2} + z_{power}) * SE with both z's embedded as
    import-grade literals in identical expression order on both
    engines (the stat_wilson_ci discipline), the SE from the
    per-arm observed rates, and the `powered` verdict — is the
    observed |lift| above the MDE? — compared on ROUNDED values so
    the boolean can never flip on sub-ulp differences (the
    stat_tost rule). One conditional-moment scan to four exact
    BIGINTs; everything else is a single-row closed form.
    Production note: the same formula inverted gives required n per
    arm — this face reports the forward direction because the
    synthetic corpus fixes n."""
    lab = t(spark, sf, "events").select(
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("pw:"), F.col("event_id").cast("string")
                    )
                ),
                1,
                1,
            )
            < "8",
            1,
        )
        .otherwise(0)
        .alias("grp"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    m = lab.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("grp") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("grp") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("x0"),
    )
    za, zb = 1.9599639845400545, 0.8416212335729143
    p0 = F.col("x0") * F.lit(1.0) / F.col("n0")
    p1 = F.col("x1") * F.lit(1.0) / F.col("n1")
    mde = F.round(
        F.lit(za + zb)
        * F.sqrt(
            p0 * (1 - p0) / F.col("n0") + p1 * (1 - p1) / F.col("n1")
        ),
        6,
    )
    return m.select(
        "n0",
        "n1",
        "x0",
        "x1",
        (F.round(p0, 6) + F.lit(0.0)).alias("p0"),
        (F.round(p1, 6) + F.lit(0.0)).alias("p1"),
        (mde + F.lit(0.0)).alias("mde"),
        (F.abs(F.round(p1 - p0, 6)) > mde).alias("powered"),
    )


# ---------------------------------------------------------------------------
# wave 126: capture-recapture — Chapman population estimate from two
# md5 crawl samples
# ---------------------------------------------------------------------------
@q(
    "stat_capture_recapture",
    """
    WITH s AS (
      SELECT CASE WHEN substr(md5('cra:' || CAST(doc_id AS VARCHAR)),
                              1, 1) < '4' THEN 1 ELSE 0 END AS in_a,
             CASE WHEN substr(md5('crb:' || CAST(doc_id AS VARCHAR)),
                              1, 1) < '4' THEN 1 ELSE 0 END AS in_b
      FROM documents),
    m AS (
      SELECT CAST(SUM(in_a) AS BIGINT) AS n1,
             CAST(SUM(in_b) AS BIGINT) AS n2,
             CAST(SUM(in_a * in_b) AS BIGINT) AS m12,
             CAST(COUNT(*) AS BIGINT) AS true_n
      FROM s)
    SELECT n1, n2, m12, true_n,
           round((n1 + 1.0) * (n2 + 1.0) / (m12 + 1.0) - 1.0, 6) + 0
             AS n_hat,
           CASE WHEN m12 = 0 THEN NULL
                ELSE round(abs((n1 + 1.0) * (n2 + 1.0) / (m12 + 1.0)
                               - 1.0 - true_n)
                           / true_n, 6) + 0
           END AS rel_err
    FROM m
    """,
)
def stat_capture_recapture(spark, sf):
    """Capture-recapture (Chapman's Lincoln-Petersen) — estimating
    the size of a population you can only SAMPLE, from the overlap
    of two independent samples: the crawl-coverage question ('how
    many pages exist, given what two independent crawl passes each
    found and how much they agreed on?') and the dedup-rate twin
    ('how many uniques in the full corpus, from two cheap looks').
    Two independent md5 quarters (DIFFERENT salts — the same salt
    would make the samples identical, overlap = min, estimate
    garbage; independence of the hash draws is exactly what
    stat_ks_uniform certifies) give exact BIGINT n1, n2, m;
    Chapman's (n1+1)(n2+1)/(m+1) - 1 corrects Lincoln-Petersen's
    small-m bias and never divides by zero. Because the synthetic
    fixture KNOWS the true population, the face also emits the
    relative error — the estimator's own report card rides the
    hash. At 25%/25% sampling m ~ n/16 and SE(n_hat) ~ N/sqrt(m), so
    accuracy is scale-dependent: ~15% at a 100-doc fixture, ~4% at
    1000 docs, sub-1% at crawl scale — the replay test bounds the
    error at 2 SE rather than a fixed percentage. One scan, one
    1-row aggregate."""
    s = t(spark, sf, "documents").select(
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cra:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                1,
            )
            < "4",
            1,
        )
        .otherwise(0)
        .alias("in_a"),
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("crb:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                1,
            )
            < "4",
            1,
        )
        .otherwise(0)
        .alias("in_b"),
    )
    m = s.agg(
        F.sum("in_a").cast("long").alias("n1"),
        F.sum("in_b").cast("long").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m12"),
        F.count(F.lit(1)).cast("long").alias("true_n"),
    )
    n1, n2, m12, tn = (
        F.col("n1"),
        F.col("n2"),
        F.col("m12"),
        F.col("true_n"),
    )
    nhat = (n1 + F.lit(1.0)) * (n2 + F.lit(1.0)) / (
        m12 + F.lit(1.0)
    ) - F.lit(1.0)
    return m.select(
        "n1",
        "n2",
        "m12",
        "true_n",
        (F.round(nhat, 6) + F.lit(0.0)).alias("n_hat"),
        F.when(m12 == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.abs(nhat - tn) / tn, 6) + F.lit(0.0))
        .alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# wave 126: winsorized mean — robust location via exact
# count-of-counts clipping at the P10/P90 cut values
# ---------------------------------------------------------------------------
@q(
    "agg_winsorized_mean",
    """
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY event_type, c),
    cum AS (
      SELECT event_type, c, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM w),
    cuts AS (
      SELECT event_type, MAX(n) AS n,
             MIN(CASE WHEN 10 * cw >= n THEN c END) AS lo,
             MIN(CASE WHEN 10 * cw >= 9 * n THEN c END) AS hi
      FROM cum GROUP BY event_type),
    clip AS (
      SELECT w.event_type, cuts.n, cuts.lo, cuts.hi,
             LEAST(GREATEST(w.c, cuts.lo), cuts.hi) * w.cnt AS s
      FROM w JOIN cuts USING (event_type))
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(lo) AS BIGINT) AS lo_cents,
           CAST(MAX(hi) AS BIGINT) AS hi_cents,
           CAST(SUM(s) AS BIGINT) AS win_sum_cents,
           round(CAST(SUM(s) AS DOUBLE) / 100.0 / MAX(n), 6) + 0
             AS win_mean
    FROM clip GROUP BY event_type
    """,
)
def agg_winsorized_mean(spark, sf):
    """10% winsorized mean per event type — the robust location
    estimate between the mean (outlier-hostage) and the median
    (throws away 98% of the data): values below the P10 cut are
    MOVED to it and values above P90 likewise, then averaged — the
    estimator a revenue dashboard uses when whale transactions are
    real but shouldn't own the headline number. Everything is exact
    integer machinery on the count-of-counts support (the
    stat_weighted_median discipline): the cut values are the
    discrete lower quantiles MIN(c : 10*cw >= n) and MIN(c : 10*cw
    >= 9n) — cross-multiplied, no float percentile — and the
    winsorized sum clips each SUPPORT row once (LEAST/GREATEST
    against the cuts) and weights by its count, so the per-type
    sums are exact BIGINT cents and the mean is one final float.
    The support is re-joined to its own cuts (types x support,
    bounded); the corpus is scanned once. Tests pin the defining
    property: the winsorized mean lies between median and mean on
    the right-skewed fixture."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    w = v.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    from ..operators.dedup import parquet_checkpoint

    w = parquet_checkpoint(w, "winsor_w")
    wc = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = w.select(
        "event_type",
        "c",
        "cnt",
        F.sum("cnt").over(wc).alias("cw"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    cuts = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(10 * F.col("cw") >= F.col("n"), F.col("c"))
        ).alias("lo"),
        F.min(
            F.when(10 * F.col("cw") >= 9 * F.col("n"), F.col("c"))
        ).alias("hi"),
    )
    clip = w.join(cuts, "event_type").select(
        "event_type",
        "n",
        "lo",
        "hi",
        (
            F.least(F.greatest(F.col("c"), F.col("lo")), F.col("hi"))
            * F.col("cnt")
        ).alias("s"),
    )
    return clip.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("lo").cast("long").alias("lo_cents"),
        F.max("hi").cast("long").alias("hi_cents"),
        F.sum("s").cast("long").alias("win_sum_cents"),
        (
            F.round(
                F.sum("s").cast("double") / F.lit(100.0) / F.max("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("win_mean"),
    )


# ---------------------------------------------------------------------------
# wave 128: cohort lifetime value — first-order-year cohorts,
# cumulative revenue per customer by age
# ---------------------------------------------------------------------------
@q(
    "customer_clv",
    """
    WITH o AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    first_yr AS (
      SELECT o_custkey, MIN(yr) AS cohort FROM o GROUP BY o_custkey),
    sz AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM first_yr GROUP BY cohort),
    cell AS (
      SELECT f.cohort, o.yr - f.cohort AS age,
             CAST(SUM(o.cents) AS BIGINT) AS rev
      FROM o JOIN first_yr f USING (o_custkey)
      GROUP BY f.cohort, o.yr - f.cohort),
    cum AS (
      SELECT cohort, age, rev,
             SUM(rev) OVER (PARTITION BY cohort ORDER BY age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev
      FROM cell)
    SELECT c.cohort, CAST(c.age AS BIGINT) AS age, s.cohort_size,
           c.rev AS rev_cents, CAST(c.cum_rev AS BIGINT) AS cum_cents,
           round(CAST(c.cum_rev AS DOUBLE) / 100.0 / s.cohort_size, 6)
             + 0 AS clv
    FROM cum c JOIN sz s USING (cohort)
    """,
)
def customer_clv(spark, sf):
    """Cohort lifetime value — customers grouped by FIRST-order
    year, cumulative revenue per cohort member tracked by age in
    years: the curve a subscription/commerce business reads to
    decide acquisition spend (retention_cohorts reports who COMES
    BACK; CLV reports what they are WORTH, and the multi-year
    TPC-H calendar is exactly the panel it needs). Shape: one scan
    to (custkey, year, cents); the first-year relation is a
    customer-sized groupBy joined back UNHINTED (AQE broadcasts
    iff it fits — the r2 vocabulary-broadcast lesson); revenue
    cells are exact BIGINT cents on the bounded cohort x age grid,
    cumulated by one grid-sized window; CLV divides once per output
    row. The defining identities are pinned in tests: age-0 revenue
    is positive for every cohort (a customer's first order IS at
    age 0), cum_cents is nondecreasing in age, and the total across
    cells equals the corpus revenue exactly."""
    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    first_yr = o.groupBy("o_custkey").agg(
        F.min("yr").alias("cohort")
    )
    from ..operators.dedup import parquet_checkpoint

    first_yr = parquet_checkpoint(first_yr, "clv_first")
    sz = first_yr.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cell = (
        o.join(first_yr, "o_custkey")
        .groupBy("cohort", (F.col("yr") - F.col("cohort")).alias("age"))
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    wc = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cell.select(
        "cohort", "age", "rev", F.sum("rev").over(wc).alias("cum_rev")
    )
    return cum.join(sz, "cohort").select(
        "cohort",
        F.col("age").cast("long").alias("age"),
        "cohort_size",
        F.col("rev").alias("rev_cents"),
        F.col("cum_rev").cast("long").alias("cum_cents"),
        (
            F.round(
                F.col("cum_rev").cast("double")
                / F.lit(100.0)
                / F.col("cohort_size"),
                6,
            )
            + F.lit(0.0)
        ).alias("clv"),
    )


# ---------------------------------------------------------------------------
# wave 129: Benjamini–Hochberg FDR — the multiple-testing layer over
# a per-type test battery, integer step-up mechanics
# ---------------------------------------------------------------------------
@q(
    "stat_bh_fdr",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(CAST(c AS DOUBLE)) AS m,
             var_samp(CAST(c AS DOUBLE)) AS s2
      FROM v GROUP BY event_type),
    tot AS (
      SELECT AVG(CAST(c AS DOUBLE)) AS gm FROM v),
    z AS (
      SELECT g.event_type, g.n,
             abs(g.m - tot.gm) / sqrt(g.s2 / g.n) AS az
      FROM g CROSS JOIN tot WHERE g.n >= 2 AND g.s2 > 0),
    p AS (
      SELECT event_type, n,
             round(az, 6) + 0 AS z_abs,
             CAST(round(1000000.0
               * (0.3480242 / (1.0 + 0.47047 * (az / sqrt(2.0)))
                  - 0.0958798 / ((1.0 + 0.47047 * (az / sqrt(2.0)))
                                 * (1.0 + 0.47047 * (az / sqrt(2.0))))
                  + 0.7478556 / ((1.0 + 0.47047 * (az / sqrt(2.0)))
                                 * (1.0 + 0.47047 * (az / sqrt(2.0)))
                                 * (1.0 + 0.47047 * (az / sqrt(2.0)))))
               * exp(-(az / sqrt(2.0)) * (az / sqrt(2.0))))
               AS BIGINT) AS p_mic
      FROM z),
    rk AS (
      SELECT event_type, z_abs, p_mic,
             ROW_NUMBER() OVER (ORDER BY p_mic, event_type) AS rnk,
             COUNT(*) OVER () AS m_tests
      FROM p),
    thr AS (
      SELECT *, CASE WHEN 20 * p_mic * m_tests <= rnk * 1000000
                     THEN rnk ELSE 0 END AS ok_rnk
      FROM rk),
    mx AS (SELECT MAX(ok_rnk) AS k FROM thr)
    SELECT t.event_type, t.z_abs, t.p_mic, CAST(t.rnk AS BIGINT) AS rnk,
           t.rnk <= mx.k AS rejected
    FROM thr t CROSS JOIN mx
    """,
)
def stat_bh_fdr(spark, sf):
    """Benjamini-Hochberg FDR control at q = 0.05 over the per-type
    'does this event type's mean value differ from the global mean'
    battery — the MULTIPLE-TESTING layer none of the individual stat
    faces carries: run five tests at alpha = 0.05 each and the
    family-wise false-positive rate is ~23%; BH's step-up (reject
    the k smallest p-values where k = max{i : p_(i) <= i*q/m})
    controls the FDR with one sorted pass. The normal tail comes
    from the Abramowitz-Stegun 7.1.25 3-term erf polynomial — a
    FIXED rational approximation evaluated in identical op order on
    both engines (the embedded-literal discipline generalized to an
    embedded FORMULA; |error| < 2.5e-5, far below the q gap) — and
    every BH decision is then INTEGER: p micros-quantized before
    ranking (type tiebreak), the step condition 20*p_mic*m <=
    rnk*1e6 is exact, and the step-up is a MAX over qualifying
    ranks. Scale shape: one scan to per-type moments, battery-sized
    windows. On the null-true synthetic corpus (values iid across
    types) the truthful verdict is ZERO rejections — pinned; the
    step-up property itself (a rank failing its OWN threshold is
    still rejected when a later rank qualifies — rejection is by
    rank <= k, not per-row inequality) is pinned on a fabricated
    battery with the identical integer mechanics."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("c").cast("double")).alias("m"),
        F.var_samp(F.col("c").cast("double")).alias("s2"),
    )
    tot = v.agg(F.avg(F.col("c").cast("double")).alias("gm"))
    z = (
        g.crossJoin(tot)
        .filter((F.col("n") >= 2) & (F.col("s2") > 0))
        .select(
            "event_type",
            "n",
            (
                F.abs(F.col("m") - F.col("gm"))
                / F.sqrt(F.col("s2") / F.col("n"))
            ).alias("az"),
        )
    )
    x = F.col("az") / F.sqrt(F.lit(2.0))
    den = F.lit(1.0) + F.lit(0.47047) * x
    poly = (
        F.lit(0.3480242) / den
        - F.lit(0.0958798) / (den * den)
        + F.lit(0.7478556) / (den * den * den)
    )
    p = z.select(
        "event_type",
        "n",
        (F.round(F.col("az"), 6) + F.lit(0.0)).alias("z_abs"),
        F.round(F.lit(1000000.0) * poly * F.exp(-x * x))
        .cast("long")
        .alias("p_mic"),
    )
    rk = p.select(
        "event_type",
        "z_abs",
        "p_mic",
        F.row_number()
        .over(Window.orderBy("p_mic", "event_type"))
        .alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m_tests"),
    )
    thr = rk.select(
        "event_type",
        "z_abs",
        "p_mic",
        "rnk",
        F.when(
            20 * F.col("p_mic") * F.col("m_tests")
            <= F.col("rnk") * 1000000,
            F.col("rnk"),
        )
        .otherwise(0)
        .alias("ok_rnk"),
    )
    mx = thr.agg(F.max("ok_rnk").alias("k"))
    return thr.crossJoin(mx).select(
        "event_type",
        "z_abs",
        "p_mic",
        F.col("rnk").cast("long").alias("rnk"),
        (F.col("rnk") <= F.col("k")).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# wave 130: van der Waerden normal-scores test — Acklam inverse-
# normal as an embedded piecewise formula on both engines
# ---------------------------------------------------------------------------
def _phi_inv_sql(p: str) -> str:
    """Acklam's rational approximation to the standard normal
    quantile, as a SQL CASE over the three regions, written once and
    instantiated into the twin (the embedded-FORMULA discipline of
    stat_bh_fdr; |error| < 1.15e-9 — far inside the micros grid)."""
    qc = f"({p} - 0.5)"
    rc = f"({qc} * {qc})"
    num_c = (
        f"((((((-39.69683028665376 * {rc} + 220.9460984245205) * {rc} "
        f"- 275.9285104469687) * {rc} + 138.357751867269) * {rc} "
        f"- 30.66479806614716) * {rc} + 2.506628277459239) * {qc})"
    )
    den_c = (
        f"(((((-54.47609879822406 * {rc} + 161.5858368580409) * {rc} "
        f"- 155.6989798598866) * {rc} + 66.80131188771972) * {rc} "
        f"- 13.28068155288572) * {rc} + 1.0)"
    )
    ql = f"sqrt(-2.0 * ln({p}))"
    num_l = (
        f"(((((-0.007784894002430293 * {ql} - 0.3223964580411365) "
        f"* {ql} - 2.400758277161838) * {ql} - 2.549732539343734) "
        f"* {ql} + 4.374664141464968) * {ql} + 2.938163982698783)"
    )
    den_l = (
        f"((((0.007784695709041462 * {ql} + 0.3224671290700398) "
        f"* {ql} + 2.445134137142996) * {ql} + 3.754408661907416) "
        f"* {ql} + 1.0)"
    )
    qu = f"sqrt(-2.0 * ln(1.0 - {p}))"
    num_u = (
        f"(((((-0.007784894002430293 * {qu} - 0.3223964580411365) "
        f"* {qu} - 2.400758277161838) * {qu} - 2.549732539343734) "
        f"* {qu} + 4.374664141464968) * {qu} + 2.938163982698783)"
    )
    den_u = (
        f"((((0.007784695709041462 * {qu} + 0.3224671290700398) "
        f"* {qu} + 2.445134137142996) * {qu} + 3.754408661907416) "
        f"* {qu} + 1.0)"
    )
    return (
        f"CASE WHEN {p} < 0.02425 THEN {num_l} / {den_l} "
        f"WHEN {p} > 0.97575 THEN -({num_u} / {den_u}) "
        f"ELSE {num_c} / {den_c} END"
    )


def _phi_inv_col_shared(p):
    """Column-side instantiation of the SAME Acklam template as
    _phi_inv_sql — one formula, two engines (the drift-proof
    discipline); keep coefficient-for-coefficient in sync with the
    SQL string above."""
    qc = p - F.lit(0.5)
    rc = qc * qc
    num_c = (
        (
            (
                (
                    (
                        F.lit(-39.69683028665376) * rc
                        + F.lit(220.9460984245205)
                    )
                    * rc
                    - F.lit(275.9285104469687)
                )
                * rc
                + F.lit(138.357751867269)
            )
            * rc
            - F.lit(30.66479806614716)
        )
        * rc
        + F.lit(2.506628277459239)
    ) * qc
    den_c = (
        (
            (
                (
                    (
                        F.lit(-54.47609879822406) * rc
                        + F.lit(161.5858368580409)
                    )
                    * rc
                    - F.lit(155.6989798598866)
                )
                * rc
                + F.lit(66.80131188771972)
            )
            * rc
            - F.lit(13.28068155288572)
        )
        * rc
        + F.lit(1.0)
    )

    def tail(q):
        num = (
            (
                (
                    (
                        (
                            F.lit(-0.007784894002430293) * q
                            - F.lit(0.3223964580411365)
                        )
                        * q
                        - F.lit(2.400758277161838)
                    )
                    * q
                    - F.lit(2.549732539343734)
                )
                * q
                + F.lit(4.374664141464968)
            )
            * q
            + F.lit(2.938163982698783)
        )
        den = (
            (
                (
                    (
                        F.lit(0.007784695709041462) * q
                        + F.lit(0.3224671290700398)
                    )
                    * q
                    + F.lit(2.445134137142996)
                )
                * q
                + F.lit(3.754408661907416)
            )
            * q
            + F.lit(1.0)
        )
        return num / den

    ql = F.sqrt(F.lit(-2.0) * F.log(p))
    qu = F.sqrt(F.lit(-2.0) * F.log(F.lit(1.0) - p))
    return (
        F.when(p < 0.02425, tail(ql))
        .when(p > 0.97575, -tail(qu))
        .otherwise(num_c / den_c)
    )


_VDW_P = "(CAST(dr AS DOUBLE) / (2.0 * (n + 1)))"

@q(
    "stat_van_der_waerden",
    f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT event_type,
             2 * RANK() OVER (ORDER BY c)
               + COUNT(*) OVER (PARTITION BY c) - 1 AS dr,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM v),
    a AS (
      SELECT event_type, n,
             CAST(round(1000000.0 * ({_phi_inv_sql(_VDW_P)}))
                  AS BIGINT) AS a_mic
      FROM r),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nj,
             CAST(SUM(a_mic) AS BIGINT) AS sa
      FROM a GROUP BY event_type),
    s2 AS (
      SELECT CAST(SUM(a_mic * a_mic) AS BIGINT) AS ssq,
             CAST(MAX(n) AS BIGINT) AS n
      FROM a),
    num AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(sa AS DOUBLE) * sa / nj) AS wsum
      FROM g)
    SELECT s2.n, num.k, s2.ssq AS ssq_mic2,
           CASE WHEN s2.ssq = 0 OR s2.n < 2 THEN NULL
                ELSE round((s2.n - 1.0) * num.wsum / s2.ssq, 6) + 0
           END AS t_stat
    FROM s2 CROSS JOIN num
    """,
)
def stat_van_der_waerden(spark, sf):
    """Van der Waerden k-sample normal-scores test — the rank test
    that converts tie-averaged ranks to NORMAL QUANTILES A_i =
    Phi^-1(R_i/(N+1)) before comparing groups, buying back the
    asymptotic efficiency Kruskal-Wallis gives up against normal
    alternatives while keeping full rank robustness. The quantile
    function has no closed form; both engines evaluate the SAME
    Acklam piecewise rational approximation (|error| < 1.15e-9),
    instantiated from ONE Python template into the twin SQL and the
    Column expression — the embedded-formula discipline stat_bh_fdr
    introduced, hardened here: a formula written twice WILL drift
    (the bh lesson), a formula written once cannot. Doubled midranks
    make p = dr/(2(N+1)) exact before the only transcendental step;
    each score is micros-quantized so group sums and the pooled
    SUM(A^2) are exact BIGINTs; T = (N-1) * SUM n_j*Abar_j^2 /
    SUM A^2 is one final float. Same single-partition pooled-rank
    scale note as stat_brunner_munzel. The null-true fixture keeps
    T small (~chi2_{k-1}); pinned loosely in tests."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    r = v.select(
        "event_type",
        (
            F.lit(2) * F.rank().over(Window.orderBy("c"))
            + F.count(F.lit(1)).over(Window.partitionBy("c"))
            - F.lit(1)
        ).alias("dr"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    p = F.col("dr").cast("double") / (F.lit(2.0) * (F.col("n") + 1))

    a = r.select(
        "event_type",
        "n",
        F.round(F.lit(1000000.0) * _phi_inv_col_shared(p))
        .cast("long")
        .alias("a_mic"),
    )
    from ..operators.dedup import parquet_checkpoint

    a = parquet_checkpoint(a, "vdw_a")
    g = a.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nj"),
        F.sum("a_mic").cast("long").alias("sa"),
    )
    s2 = a.agg(
        F.sum(F.col("a_mic") * F.col("a_mic"))
        .cast("long")
        .alias("ssq"),
        F.max("n").cast("long").alias("n"),
    )
    num = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.col("sa").cast("double") * F.col("sa") / F.col("nj")
        ).alias("wsum"),
    )
    return s2.crossJoin(num).select(
        "n",
        "k",
        F.col("ssq").alias("ssq_mic2"),
        F.when(
            (F.col("ssq") == 0) | (F.col("n") < 2),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (F.col("n") - F.lit(1.0))
                * F.col("wsum")
                / F.col("ssq"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# wave 131: Fligner–Killeen — robust k-sample scale test on
# normal scores of |x - group median|
# ---------------------------------------------------------------------------
_FK_P = "(0.5 + CAST(dr AS DOUBLE) / (4.0 * (n + 1)))"

@q(
    "stat_fligner_killeen",
    f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY event_type, c),
    cum AS (
      SELECT event_type, c, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             SUM(cnt) OVER (PARTITION BY event_type) AS ng
      FROM w),
    med AS (
      SELECT event_type,
             MIN(CASE WHEN 2 * cw >= ng THEN c END) AS md
      FROM cum GROUP BY event_type),
    z AS (
      SELECT v.event_type, abs(v.c - med.md) AS zz
      FROM v JOIN med USING (event_type)),
    r AS (
      SELECT event_type,
             2 * RANK() OVER (ORDER BY zz)
               + COUNT(*) OVER (PARTITION BY zz) - 1 AS dr,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM z),
    a AS (
      SELECT event_type, n,
             CAST(round(1000000.0 * ({{PHI}}))
                  AS BIGINT) AS a_mic
      FROM r),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nj,
             CAST(SUM(a_mic) AS BIGINT) AS sa
      FROM a GROUP BY event_type),
    tots AS (
      SELECT CAST(SUM(a_mic) AS BIGINT) AS s,
             CAST(SUM(a_mic * a_mic) AS BIGINT) AS ssq,
             CAST(MAX(n) AS BIGINT) AS n
      FROM a),
    num AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(sa AS DOUBLE) * sa / nj) AS wsum
      FROM g)
    SELECT tots.n, num.k,
           CASE WHEN tots.n < 2 OR num.k < 2
                     OR tots.ssq - CAST(tots.s AS DOUBLE) * tots.s
                        / tots.n <= 0 THEN NULL
                ELSE round((tots.n - 1.0)
                     * (num.wsum - CAST(tots.s AS DOUBLE) * tots.s
                        / tots.n)
                     / (tots.ssq - CAST(tots.s AS DOUBLE) * tots.s
                        / tots.n), 6) + 0
           END AS x2
    FROM tots CROSS JOIN num
    """.replace("{PHI}", _phi_inv_sql(_FK_P)),
)
def stat_fligner_killeen(spark, sf):
    """Fligner-Killeen test — the ROBUST k-sample scale test (R's
    default for variance homogeneity, the one that survives the
    heavy tails that wreck stat_bartlett and out-powers
    stat_levene's means-based spelling): center each group by its
    OWN discrete median (the 2*cw >= n count-of-counts rule, exact),
    pool the |x - med| deviations, rank them with doubled midranks,
    map ranks to HALF-normal scores a = Phi^-1(1/2 + r/(2(N+1)))
    via the shared Acklam template (_phi_inv_sql — written once,
    instantiated into both engines, the stat_van_der_waerden
    discipline), and compare group score means: X2 = (N-1) *
    (SUM n_j*Abar_j^2 - S^2/N) / (SSQ - S^2/N), every input an
    exact micros BIGINT, one final float, degenerate (zero score
    variance, single group) NULLed. Scale note: per-group medians
    are group-bounded windows; the pooled rank is the documented
    single-partition window (shard by value range in production)."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    w = v.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = w.select(
        "event_type",
        "c",
        "cnt",
        F.sum("cnt").over(wc).alias("cw"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("ng"),
    )
    med = cum.groupBy("event_type").agg(
        F.min(
            F.when(2 * F.col("cw") >= F.col("ng"), F.col("c"))
        ).alias("md")
    )
    z = v.join(med, "event_type").select(
        "event_type", F.abs(F.col("c") - F.col("md")).alias("zz")
    )
    from ..operators.dedup import parquet_checkpoint

    z = parquet_checkpoint(z, "fk_z")
    r = z.select(
        "event_type",
        (
            F.lit(2) * F.rank().over(Window.orderBy("zz"))
            + F.count(F.lit(1)).over(Window.partitionBy("zz"))
            - F.lit(1)
        ).alias("dr"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    p = F.lit(0.5) + F.col("dr").cast("double") / (
        F.lit(4.0) * (F.col("n") + 1)
    )
    a = r.select(
        "event_type",
        "n",
        F.round(F.lit(1000000.0) * _phi_inv_col_shared(p))
        .cast("long")
        .alias("a_mic"),
    )
    a = parquet_checkpoint(a, "fk_a")
    g = a.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nj"),
        F.sum("a_mic").cast("long").alias("sa"),
    )
    tots = a.agg(
        F.sum("a_mic").cast("long").alias("s"),
        F.sum(F.col("a_mic") * F.col("a_mic"))
        .cast("long")
        .alias("ssq"),
        F.max("n").cast("long").alias("n"),
    )
    num = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.col("sa").cast("double") * F.col("sa") / F.col("nj")
        ).alias("wsum"),
    )
    fin = tots.crossJoin(num)
    n, s, ssq = F.col("n"), F.col("s"), F.col("ssq")
    cb = ssq - s.cast("double") * s / n
    return fin.select(
        "n",
        "k",
        F.when(
            (n < 2) | (F.col("k") < 2) | (cb <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (n - F.lit(1.0))
                * (F.col("wsum") - s.cast("double") * s / n)
                / cb,
                6,
            )
            + F.lit(0.0)
        )
        .alias("x2"),
    )


# ---------------------------------------------------------------------------
# wave 131: Shapiro–Francia — normality via correlation with normal
# order-statistic scores
# ---------------------------------------------------------------------------
_SF_P = "(CAST(i AS DOUBLE) / (n + 1))"

@q(
    "stat_shapiro_francia",
    f"""
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM v),
    a AS (
      SELECT c,
             CAST(round(1000000.0 * ({{PHI}}))
                  AS BIGINT) AS m_mic
      FROM r),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sx,
             CAST(SUM(c * c) AS BIGINT) AS sxx,
             CAST(SUM(m_mic) AS BIGINT) AS sm,
             CAST(SUM(m_mic * m_mic) AS BIGINT) AS smm,
             CAST(SUM(c * m_mic) AS BIGINT) AS sxm
      FROM a)
    SELECT n, sxm,
           CASE WHEN n < 3
                     OR n * 1.0 * sxx - CAST(sx AS DOUBLE) * sx <= 0
                     OR n * 1.0 * smm - CAST(sm AS DOUBLE) * sm <= 0
                THEN NULL
                ELSE round(
                  (n * 1.0 * sxm - CAST(sx AS DOUBLE) * sm)
                  * (n * 1.0 * sxm - CAST(sx AS DOUBLE) * sm)
                  / ((n * 1.0 * sxx - CAST(sx AS DOUBLE) * sx)
                     * (n * 1.0 * smm - CAST(sm AS DOUBLE) * sm)),
                  6) + 0
           END AS w_prime
    FROM s
    """.replace("{{PHI}}", "{PHI}").replace("{PHI}", _phi_inv_sql(_SF_P)),
)
def stat_shapiro_francia(spark, sf):
    """Shapiro-Francia normality test — the squared correlation
    between the sorted sample and the expected normal order-
    statistic scores m_i = Phi^-1(i/(n+1)): W' near 1 says the
    sample could be normal, and it is the normality check the
    battery lacked (stat_jarque_bera sees only two moments; W'
    sees the whole shape — a symmetric-but-uniform sample fools JB's
    skewness and is caught here). The scores use the shared Acklam
    template; positions come from a plain ROW_NUMBER whose
    INTRA-TIE order is arbitrary — sound, because within a tie
    group x is constant, so SUM(x*m), SUM(m), SUM(m^2) depend only
    on the SET of positions a tie group occupies, never their
    assignment (the invariance argument is in the test, which
    shuffles input order and re-runs). All six sufficient sums are
    exact BIGINTs (headroom note: SUM(m^2) ~ n * 1.6e13 — quantize
    coarser past ~5e5 rows, the stat_cvm rule); W' is one final
    float via the cross-multiplied correlation form. The uniform
    synthetic values are decisively NON-normal: W' lands near the
    uniform-distribution plateau ~0.955, far from 1 — pinned in
    tests as the face's discriminative evidence."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(F.round(F.col("value") * 100).cast("long").alias("c"))
    )
    r = v.select(
        "c",
        F.row_number().over(Window.orderBy("c")).alias("i"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    p = F.col("i").cast("double") / (F.col("n") + 1)
    a = r.select(
        "c",
        F.round(F.lit(1000000.0) * _phi_inv_col_shared(p))
        .cast("long")
        .alias("m_mic"),
    )
    s = a.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sxx"),
        F.sum("m_mic").cast("long").alias("sm"),
        F.sum(F.col("m_mic") * F.col("m_mic"))
        .cast("long")
        .alias("smm"),
        F.sum(F.col("c") * F.col("m_mic")).cast("long").alias("sxm"),
    )
    n = F.col("n")
    sx, sxx = F.col("sx"), F.col("sxx")
    sm, smm, sxm = F.col("sm"), F.col("smm"), F.col("sxm")
    vx = n * F.lit(1.0) * sxx - sx.cast("double") * sx
    vm = n * F.lit(1.0) * smm - sm.cast("double") * sm
    cov = n * F.lit(1.0) * sxm - sx.cast("double") * sm
    return s.select(
        "n",
        "sxm",
        F.when(
            (n < 3) | (vx <= 0) | (vm <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(cov * cov / (vx * vm), 6) + F.lit(0.0))
        .alias("w_prime"),
    )


# ---------------------------------------------------------------------------
# wave 132: Welch's ANOVA — k-sample means under unequal variances
# ---------------------------------------------------------------------------
@q(
    "stat_anova_welch",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(CAST(c AS DOUBLE)) AS m,
             var_samp(CAST(c AS DOUBLE)) AS s2
      FROM v GROUP BY event_type),
    w AS (
      SELECT event_type, n, m, s2, n / s2 AS wj
      FROM g WHERE n >= 2 AND s2 > 0),
    t1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(wj) AS sw, SUM(wj * m) AS swm
      FROM w),
    t2 AS (
      SELECT SUM(w.wj * (w.m - t1.swm / t1.sw)
                 * (w.m - t1.swm / t1.sw)) AS num,
             SUM((1.0 - w.wj / t1.sw) * (1.0 - w.wj / t1.sw)
                 / (w.n - 1)) AS lam,
             MAX(t1.k) AS k
      FROM w CROSS JOIN t1)
    SELECT k,
           CASE WHEN k < 2 THEN NULL
                ELSE round(num / (k - 1)
                     / (1.0 + 2.0 * (k - 2) / (k * k - 1.0) * lam),
                     6) + 0
           END AS f_stat,
           CASE WHEN k < 2 OR lam <= 0 THEN NULL
                ELSE round((k * k - 1.0) / (3.0 * lam), 6) + 0
           END AS df2
    FROM t2
    """,
)
def stat_anova_welch(spark, sf):
    """Welch's ANOVA — the k-sample mean comparison that drops
    classical ANOVA's equal-variance assumption, exactly as
    stat_brunner_munzel drops Mann-Whitney's (stat_anova is the
    textbook F; under variance heterogeneity with unequal group
    sizes its size error is unbounded, and Welch's
    inverse-variance-weighted form is the modern default): weights
    w_j = n_j/s_j^2, weighted grand mean, F* = SUM w_j(m_j - mw)^2 /
    (k-1) / (1 + 2(k-2)/(k^2-1) * Lambda) with Lambda = SUM
    (1 - w_j/W)^2/(n_j - 1), and the Welch-Satterthwaite df2 =
    (k^2-1)/(3*Lambda). One conditional-moment scan (the stat_ttest
    discipline: identical expression order both engines, native AVG
    and var_samp rounded only at the end); groups with n < 2 or
    zero variance drop by contract. The null-true fixture keeps F*
    near 1 — pinned loosely in tests."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("c").cast("double")).alias("m"),
        F.var_samp(F.col("c").cast("double")).alias("s2"),
    )
    w = g.filter((F.col("n") >= 2) & (F.col("s2") > 0)).select(
        "event_type",
        "n",
        "m",
        (F.col("n") / F.col("s2")).alias("wj"),
    )
    from ..operators.dedup import parquet_checkpoint

    w = parquet_checkpoint(w, "welch_w")
    t1 = w.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("wj").alias("sw"),
        F.sum(F.col("wj") * F.col("m")).alias("swm"),
    )
    mw = F.col("swm") / F.col("sw")
    t2 = w.crossJoin(t1).agg(
        F.sum(F.col("wj") * (F.col("m") - mw) * (F.col("m") - mw)).alias(
            "num"
        ),
        F.sum(
            (F.lit(1.0) - F.col("wj") / F.col("sw"))
            * (F.lit(1.0) - F.col("wj") / F.col("sw"))
            / (F.col("n") - 1)
        ).alias("lam"),
        F.max("k").alias("k"),
    )
    k, num, lam = F.col("k"), F.col("num"), F.col("lam")
    return t2.select(
        "k",
        F.when(k < 2, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                num
                / (k - 1)
                / (
                    F.lit(1.0)
                    + F.lit(2.0)
                    * (k - 2)
                    / (k * k - F.lit(1.0))
                    * lam
                ),
                6,
            )
            + F.lit(0.0)
        )
        .alias("f_stat"),
        F.when((k < 2) | (lam <= 0), F.lit(None).cast("double"))
        .otherwise(
            F.round((k * k - F.lit(1.0)) / (F.lit(3.0) * lam), 6)
            + F.lit(0.0)
        )
        .alias("df2"),
    )


# ---------------------------------------------------------------------------
# wave 133: Games–Howell post-hoc — pairwise Welch comparisons on
# the bounded type grid
# ---------------------------------------------------------------------------
@q(
    "stat_games_howell",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(CAST(c AS DOUBLE)) AS m,
             var_samp(CAST(c AS DOUBLE)) AS s2
      FROM v GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.n AS na, b.n AS nb,
             a.m - b.m AS diff,
             a.s2 / a.n + b.s2 / b.n AS se2,
             (a.s2 / a.n + b.s2 / b.n) * (a.s2 / a.n + b.s2 / b.n)
             / (a.s2 * a.s2 / (a.n * a.n * (a.n - 1))
                + b.s2 * b.s2 / (b.n * b.n * (b.n - 1))) AS df
      FROM g a JOIN g b ON a.event_type < b.event_type
      WHERE a.n >= 2 AND b.n >= 2 AND a.s2 > 0 AND b.s2 > 0)
    SELECT type_a, type_b, na, nb,
           round(diff / sqrt(se2), 6) + 0 AS t_stat,
           round(df, 6) + 0 AS df
    FROM p WHERE se2 > 0
    """,
)
def stat_games_howell(spark, sf):
    """Games-Howell post-hoc — the pairwise follow-up to
    stat_anova_welch: once the omnibus says SOME mean differs, every
    pair gets its own Welch t and Welch-Satterthwaite df, with no
    pooled-variance assumption anywhere (Tukey's HSD pools; GH is
    its heteroscedastic replacement). The pair relation is the
    moment table self-joined on type_a < type_b — a k(k-1)/2
    bounded grid (10 rows at k = 5), never a corpus self-join (the
    corpus is scanned once into k moment rows); every expression is
    written in identical op order on both engines (the stat_ttest
    discipline) and rounded once at the end. The statistic is
    reported without a verdict column: the studentized-range
    critical values GH gates on are table lookups, documented as
    the consumer's job rather than baked in as pseudo-literals.
    Null-true fixture: every |t| stays small — pinned in tests."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("c").cast("double")).alias("m"),
        F.var_samp(F.col("c").cast("double")).alias("s2"),
    )
    from ..operators.dedup import parquet_checkpoint

    g = parquet_checkpoint(g, "gh_moments")
    a = g.alias("a")
    b = g.alias("b")
    pairs = (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .filter(
            (F.col("a.n") >= 2)
            & (F.col("b.n") >= 2)
            & (F.col("a.s2") > 0)
            & (F.col("b.s2") > 0)
        )
    )
    sa = F.col("a.s2") / F.col("a.n")
    sb = F.col("b.s2") / F.col("b.n")
    se2 = sa + sb
    df = (se2 * se2) / (
        F.col("a.s2")
        * F.col("a.s2")
        / (F.col("a.n") * F.col("a.n") * (F.col("a.n") - 1))
        + F.col("b.s2")
        * F.col("b.s2")
        / (F.col("b.n") * F.col("b.n") * (F.col("b.n") - 1))
    )
    return pairs.filter(se2 > 0).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
        (
            F.round((F.col("a.m") - F.col("b.m")) / F.sqrt(se2), 6)
            + F.lit(0.0)
        ).alias("t_stat"),
        (F.round(df, 6) + F.lit(0.0)).alias("df"),
    )


# ---------------------------------------------------------------------------
# wave 134: Dunn's test — rank-based post-hoc pairs with tie-exact
# pooled variance
# ---------------------------------------------------------------------------
@q(
    "stat_dunn",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT event_type,
             2 * RANK() OVER (ORDER BY c)
               + COUNT(*) OVER (PARTITION BY c) - 1 AS dr,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM v),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nj,
             CAST(SUM(dr) AS BIGINT) AS sdr,
             CAST(MAX(n) AS BIGINT) AS n
      FROM r GROUP BY event_type),
    ties AS (
      SELECT CAST(COALESCE(SUM(tc * tc * tc - tc), 0) AS BIGINT)
               AS tsum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tc
            FROM v GROUP BY c) z),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.nj AS na, b.nj AS nb, a.n AS n, ties.tsum,
             CAST(a.sdr AS DOUBLE) / a.nj
               - CAST(b.sdr AS DOUBLE) / b.nj AS ddiff
      FROM g a JOIN g b ON a.event_type < b.event_type
      CROSS JOIN ties)
    SELECT type_a, type_b, na, nb,
           CASE WHEN n < 2
                     OR (n * 1.0 * (n + 1) / 12.0
                         - CAST(tsum AS DOUBLE) / (12.0 * (n - 1)))
                        * (1.0 / na + 1.0 / nb) <= 0 THEN NULL
                ELSE round((ddiff / 2.0)
                     / sqrt((n * 1.0 * (n + 1) / 12.0
                             - CAST(tsum AS DOUBLE) / (12.0 * (n - 1)))
                            * (1.0 / na + 1.0 / nb)), 6) + 0
           END AS z
    FROM p
    """,
)
def stat_dunn(spark, sf):
    """Dunn's test — the rank-space post-hoc that follows
    stat_kruskal exactly as stat_games_howell follows
    stat_anova_welch: pairwise z on mean POOLED ranks, z_ij =
    (Rbar_i - Rbar_j) / sqrt((N(N+1)/12 - T/(12(N-1)))(1/n_i +
    1/n_j)) with the tie mass T = SUM(t^3 - t) — the tie-exact
    variance, not the textbook no-tie form (the stat_ansari_bradley
    rule). Doubled midranks keep every rank sum an exact BIGINT
    (mean doubled rank / 2 = mean rank, folded into the final
    expression once); the pair grid is k(k-1)/2 over the group-sum
    relation, never a corpus self-join, and the one pooled-rank
    window carries the usual single-partition scale note. Dunn (not
    pairwise Mann-Whitney!) is the correct follow-up because it
    reuses the POOLED ranking the omnibus computed — pairwise MW
    re-ranks each pair and loses the family's common scale. The
    multiple-testing layer is stat_bh_fdr's job, documented
    division of labor. Null-true fixture: all |z| small, pinned."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    r = v.select(
        "event_type",
        (
            F.lit(2) * F.rank().over(Window.orderBy("c"))
            + F.count(F.lit(1)).over(Window.partitionBy("c"))
            - F.lit(1)
        ).alias("dr"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    from ..operators.dedup import parquet_checkpoint

    r = parquet_checkpoint(r, "dunn_r")
    g = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nj"),
        F.sum("dr").cast("long").alias("sdr"),
        F.max("n").cast("long").alias("n"),
    )
    ties = (
        v.groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc") * F.col("tc") * F.col("tc")
                    - F.col("tc")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tsum")
        )
    )
    a = g.alias("a")
    b = g.alias("b")
    p = a.join(
        b, F.col("a.event_type") < F.col("b.event_type")
    ).crossJoin(ties)
    n = F.col("a.n")
    var = (
        n * F.lit(1.0) * (n + 1) / F.lit(12.0)
        - F.col("tsum").cast("double") / (F.lit(12.0) * (n - 1))
    ) * (F.lit(1.0) / F.col("a.nj") + F.lit(1.0) / F.col("b.nj"))
    ddiff = (
        F.col("a.sdr").cast("double") / F.col("a.nj")
        - F.col("b.sdr").cast("double") / F.col("b.nj")
    )
    return p.select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.nj").alias("na"),
        F.col("b.nj").alias("nb"),
        F.when((n < 2) | (var <= 0), F.lit(None).cast("double"))
        .otherwise(
            F.round((ddiff / F.lit(2.0)) / F.sqrt(var), 6)
            + F.lit(0.0)
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# wave 135: Lepage test — joint location-scale omnibus from the
# Wilcoxon and Ansari-Bradley machineries in one pass
# ---------------------------------------------------------------------------
@q(
    "stat_lepage",
    """
    WITH v AS (
      SELECT CAST(o_orderkey % 2 AS BIGINT) AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders),
    r AS (
      SELECT grp,
             2 * RANK() OVER (ORDER BY c)
               + COUNT(*) OVER (PARTITION BY c) - 1 AS drc,
             CAST(COUNT(*) OVER () AS BIGINT) AS nn
      FROM v),
    s AS (
      SELECT grp, drc, nn,
             LEAST(drc, 2 * (nn + 1) - drc) AS da
      FROM r),
    ties AS (
      SELECT CAST(COALESCE(SUM(tc * tc * tc - tc), 0) AS BIGINT)
               AS tsum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tc
            FROM v GROUP BY c) z),
    f AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(COALESCE(SUM(CASE WHEN grp = 1 THEN drc END), 0)
                  AS BIGINT) AS w_d,
             CAST(COALESCE(SUM(CASE WHEN grp = 1 THEN da END), 0)
                  AS BIGINT) AS ab_d,
             CAST(COALESCE(SUM(da), 0) AS BIGINT) AS sda,
             CAST(COALESCE(SUM(da * da), 0) AS BIGINT) AS sdaq
      FROM s),
    fin AS (
      SELECT f.*, ties.tsum, f.n0 + f.n1 AS n FROM f CROSS JOIN ties)
    SELECT n0, n1, w_d, ab_d,
           CASE WHEN n0 = 0 OR n1 = 0 OR n < 2
                     OR n1 * 1.0 * n0 * (n + 1) / 3.0
                        - n1 * 1.0 * n0 * tsum / (3.0 * n * (n - 1))
                        <= 0
                     OR n1 * 1.0 * n0 * (n * 1.0 * sdaq - sda * 1.0 * sda)
                       / (n * 1.0 * n * (n - 1)) <= 0
                THEN NULL
                ELSE round(
                  (w_d - n1 * 1.0 * (n + 1))
                  * (w_d - n1 * 1.0 * (n + 1))
                  / (n1 * 1.0 * n0 * (n + 1) / 3.0
                     - n1 * 1.0 * n0 * tsum / (3.0 * n * (n - 1)))
                  + (ab_d - n1 * 1.0 * sda / n)
                  * (ab_d - n1 * 1.0 * sda / n)
                  / (n1 * 1.0 * n0
                     * (n * 1.0 * sdaq - sda * 1.0 * sda)
                     / (n * 1.0 * n * (n - 1))), 6) + 0
           END AS l_stat
    FROM fin
    """,
)
def stat_lepage(spark, sf):
    """Lepage test — the joint location-scale omnibus: L = Z_W^2 +
    Z_AB^2, the standardized Wilcoxon rank-sum (location) plus the
    standardized Ansari-Bradley (scale), ~chi2_2 under H0 — the
    two-sample 'did ANYTHING change' gate a distribution-drift
    monitor wants when location and scale shifts are both in play
    (KS sees both but weakly; Lepage is the targeted combination).
    Both component machineries already exist in this module and are
    REUSED from ONE pooled doubled-midrank pass: w_d = SUM of
    doubled pooled ranks in group 1 (E = n1(N+1) doubled, tie-exact
    Var folded x4: n1*n0[(N+1)/3 - T/(3N(N-1))]) and ab_d = SUM of
    folded scores (moments from the OBSERVED score multiset, the
    stat_ansari_bradley rule). Every input is an exact BIGINT; L is
    one final float with degenerate guards. The components are
    asymptotically independent (W is antisymmetric about the
    center, AB symmetric) — which is what makes the plain sum of
    squares the right combination; pinned against the component
    faces in tests (identical w/ab integers). Same pooled-rank
    scale note as the siblings."""
    v = t(spark, sf, "orders").select(
        (F.col("o_orderkey") % 2).cast("long").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    r = v.select(
        "grp",
        "c",
        (
            F.lit(2) * F.rank().over(Window.orderBy("c"))
            + F.count(F.lit(1)).over(Window.partitionBy("c"))
            - F.lit(1)
        ).alias("drc"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("nn"),
    )
    s = r.select(
        "grp",
        "drc",
        F.least(
            F.col("drc"), F.lit(2) * (F.col("nn") + 1) - F.col("drc")
        ).alias("da"),
    )
    ties = (
        v.groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc") * F.col("tc") * F.col("tc")
                    - F.col("tc")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tsum")
        )
    )
    f = s.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.coalesce(F.sum(F.when(F.col("grp") == 1, F.col("drc"))), F.lit(0))
        .cast("long")
        .alias("w_d"),
        F.coalesce(F.sum(F.when(F.col("grp") == 1, F.col("da"))), F.lit(0))
        .cast("long")
        .alias("ab_d"),
        F.coalesce(F.sum("da"), F.lit(0)).cast("long").alias("sda"),
        F.coalesce(F.sum(F.col("da") * F.col("da")), F.lit(0))
        .cast("long")
        .alias("sdaq"),
    ).crossJoin(ties)
    n0, n1 = F.col("n0"), F.col("n1")
    n = n0 + n1
    w_d, ab_d = F.col("w_d"), F.col("ab_d")
    sda, sdaq, tsum = F.col("sda"), F.col("sdaq"), F.col("tsum")
    var_w = n1 * F.lit(1.0) * n0 * (n + 1) / F.lit(3.0) - n1 * F.lit(
        1.0
    ) * n0 * tsum / (F.lit(3.0) * n * (n - 1))
    var_ab = (
        n1
        * F.lit(1.0)
        * n0
        * (n * F.lit(1.0) * sdaq - sda * F.lit(1.0) * sda)
        / (n * F.lit(1.0) * n * (n - 1))
    )
    dev_w = w_d - n1 * F.lit(1.0) * (n + 1)
    dev_ab = ab_d - n1 * F.lit(1.0) * sda / n
    return f.select(
        "n0",
        "n1",
        "w_d",
        "ab_d",
        F.when(
            (n0 == 0) | (n1 == 0) | (n < 2) | (var_w <= 0)
            | (var_ab <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                dev_w * dev_w / var_w + dev_ab * dev_ab / var_ab, 6
            )
            + F.lit(0.0)
        )
        .alias("l_stat"),
    )


# ---------------------------------------------------------------------------
# wave 137: interrupted time series — pre/post segmented OLS via
# native REGR_* aggregates
# ---------------------------------------------------------------------------
@q(
    "events_its",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    cut AS (
      SELECT CAST((MIN(day) + MAX(day)) // 2 AS BIGINT) AS c
      FROM daily),
    seg AS (
      SELECT CASE WHEN d.day < cut.c THEN 0 ELSE 1 END AS post,
             CAST(d.day AS DOUBLE) AS x,
             CAST(d.cents AS DOUBLE) / 100.0 AS y,
             cut.c
      FROM daily d CROSS JOIN cut),
    fits AS (
      SELECT post, CAST(COUNT(*) AS BIGINT) AS n,
             regr_slope(y, x) AS slope,
             regr_intercept(y, x) AS icept,
             MAX(c) AS c
      FROM seg GROUP BY post),
    w AS (
      SELECT MAX(CASE WHEN post = 0 THEN n END) AS n_pre,
             MAX(CASE WHEN post = 1 THEN n END) AS n_post,
             MAX(CASE WHEN post = 0 THEN slope END) AS slope_pre,
             MAX(CASE WHEN post = 1 THEN slope END) AS slope_post,
             MAX(CASE WHEN post = 0 THEN icept END) AS i_pre,
             MAX(CASE WHEN post = 1 THEN icept END) AS i_post,
             MAX(c) AS c
      FROM fits)
    SELECT n_pre, n_post, CAST(c AS BIGINT) AS cut_day,
           round(slope_pre, 6) + 0 AS slope_pre,
           round(slope_post, 6) + 0 AS slope_post,
           round(slope_post - slope_pre, 6) + 0 AS slope_change,
           round((i_post + slope_post * c)
                 - (i_pre + slope_pre * c), 6) + 0 AS level_change
    FROM w
    """,
)
def events_its(spark, sf):
    """Interrupted time series — the deploy/policy impact design:
    fit the daily revenue trend SEPARATELY before and after a
    cutpoint (here the calendar midpoint, standing in for a release
    date) and report the slope change and the level change AT the
    cut — the two numbers an ITS reads (did the trend bend, and did
    the series jump). Each segment's OLS comes from the native
    REGR_SLOPE/REGR_INTERCEPT aggregates — exact moment machinery
    inside both engines, evaluated in identical expression order
    and rounded once (the stat_regression precedent); the level
    change evaluates both fits AT the cut day, never extrapolating
    the pre-fit into the post-period beyond the boundary. The
    segmented spelling equals the interaction-term spelling
    (y ~ t + D + t*D) coefficient-for-coefficient — replayed in
    the test via two independent least-squares fits. Scale shape:
    corpus -> calendar cells once, two REGR aggregates over the
    bounded daily relation. On the trendless synthetic calendar
    both changes hover near zero — the test bounds them rather
    than asserting effect."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "its_daily")
    cut = daily.agg(
        F.expr("(min(day) + max(day)) div 2").cast("long").alias("c")
    )
    seg = daily.crossJoin(cut).select(
        F.when(F.col("day") < F.col("c"), 0).otherwise(1).alias("post"),
        F.col("day").cast("double").alias("x"),
        (F.col("cents").cast("double") / F.lit(100.0)).alias("y"),
        "c",
    )
    fits = seg.groupBy("post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("regr_slope(y, x)").alias("slope"),
        F.expr("regr_intercept(y, x)").alias("icept"),
        F.max("c").alias("c"),
    )
    w = fits.agg(
        F.max(F.when(F.col("post") == 0, F.col("n"))).alias("n_pre"),
        F.max(F.when(F.col("post") == 1, F.col("n"))).alias("n_post"),
        F.max(F.when(F.col("post") == 0, F.col("slope"))).alias(
            "slope_pre"
        ),
        F.max(F.when(F.col("post") == 1, F.col("slope"))).alias(
            "slope_post"
        ),
        F.max(F.when(F.col("post") == 0, F.col("icept"))).alias("i_pre"),
        F.max(F.when(F.col("post") == 1, F.col("icept"))).alias(
            "i_post"
        ),
        F.max("c").alias("c"),
    )
    return w.select(
        "n_pre",
        "n_post",
        F.col("c").cast("long").alias("cut_day"),
        (F.round(F.col("slope_pre"), 6) + F.lit(0.0)).alias("slope_pre"),
        (F.round(F.col("slope_post"), 6) + F.lit(0.0)).alias(
            "slope_post"
        ),
        (
            F.round(F.col("slope_post") - F.col("slope_pre"), 6)
            + F.lit(0.0)
        ).alias("slope_change"),
        (
            F.round(
                (F.col("i_post") + F.col("slope_post") * F.col("c"))
                - (F.col("i_pre") + F.col("slope_pre") * F.col("c")),
                6,
            )
            + F.lit(0.0)
        ).alias("level_change"),
    )


# ---------------------------------------------------------------------------
# wave 138: Bowker symmetry test — k x k transition symmetry,
# per-pair micros terms
# ---------------------------------------------------------------------------
@q(
    "stat_bowker",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    tr AS (
      SELECT event_type AS a,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS b
      FROM seq),
    cells AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM tr WHERE b IS NOT NULL GROUP BY a, b),
    pairs AS (
      SELECT LEAST(a, b) AS i, GREATEST(a, b) AS j,
             CAST(SUM(CASE WHEN a < b THEN n ELSE 0 END) AS BIGINT)
               AS nij,
             CAST(SUM(CASE WHEN a > b THEN n ELSE 0 END) AS BIGINT)
               AS nji
      FROM cells WHERE a <> b GROUP BY LEAST(a, b), GREATEST(a, b)),
    terms AS (
      SELECT CAST(round(1000000.0 * (nij - nji) * (nij - nji)
                        / (nij + nji)) AS BIGINT) AS t_mic
      FROM pairs WHERE nij + nji > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS df,
           CAST(COALESCE(SUM(t_mic), 0) AS BIGINT) AS chi2_mic,
           round(COALESCE(SUM(t_mic), 0) / 1000000.0, 6) + 0 AS chi2
    FROM terms
    """,
)
def stat_bowker(spark, sf):
    """Bowker's symmetry test — the k x k generalization of
    stat_mcnemar, applied to the user transition matrix
    events_markov estimates: is traffic between every pair of event
    types BALANCED (n_ij = n_ji), or does the session flow have a
    direction (clicks feed purchases more than purchases feed
    clicks)? Each unordered pair contributes (n_ij - n_ji)^2 /
    (n_ij + n_ji) — an exact-integer numerator over an exact-integer
    denominator, micros-quantized per pair (the stat_cmh
    discipline) and summed exactly; df = the number of pairs with
    any traffic, chi2 the one final float. The pair relation is the
    transition-cell table LEFT-joined to its own transpose on
    a < b — cells are |types|^2-bounded, so everything after the
    one corpus scan (LEAD over per-user sessions — many small
    user-partitioned windows, the scale-sane shape) is constant-
    sized — pairs come from a LEAST/GREATEST symmetrize-groupBy of
    the cell table (NOT a self-join filtered on a < b, whose first
    draft silently DROPPED any pair with traffic only in the
    reverse direction — caught by the replay test on the general
    case before the dense fixture could hide it). The asymmetry
    claim is pinned positively: the synthetic feed IS directional
    (chi2 > 0, df = 10)."""
    seq = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    tr = seq.select(
        F.col("event_type").alias("a"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("b"),
    )
    cells = (
        tr.filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from ..operators.dedup import parquet_checkpoint

    cells = parquet_checkpoint(cells, "bowker_cells")
    pairs = (
        cells.filter(F.col("a") != F.col("b"))
        .groupBy(
            F.least("a", "b").alias("i"),
            F.greatest("a", "b").alias("j"),
        )
        .agg(
            F.sum(
                F.when(F.col("a") < F.col("b"), F.col("n")).otherwise(0)
            )
            .cast("long")
            .alias("nij"),
            F.sum(
                F.when(F.col("a") > F.col("b"), F.col("n")).otherwise(0)
            )
            .cast("long")
            .alias("nji"),
        )
    )
    terms = pairs.filter(F.col("nij") + F.col("nji") > 0).select(
        F.round(
            F.lit(1000000.0)
            * (F.col("nij") - F.col("nji"))
            * (F.col("nij") - F.col("nji"))
            / (F.col("nij") + F.col("nji"))
        )
        .cast("long")
        .alias("t_mic")
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.coalesce(F.sum("t_mic"), F.lit(0))
        .cast("long")
        .alias("chi2_mic"),
        (
            F.round(
                F.coalesce(F.sum("t_mic"), F.lit(0)) / F.lit(1000000.0),
                6,
            )
            + F.lit(0.0)
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# wave 140: seasonal Mann–Kendall — per-weekday trend signs summed
# across seasons
# ---------------------------------------------------------------------------
@q(
    "stat_seasonal_mk",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    lab AS (
      SELECT day, cents, CAST((day + 4) % 7 AS BIGINT) AS season
      FROM daily),
    pairs AS (
      SELECT a.season,
             CASE WHEN b.cents > a.cents THEN 1
                  WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sg
      FROM lab a JOIN lab b
        ON b.season = a.season AND b.day > a.day),
    per AS (
      SELECT l.season,
             CAST(COUNT(DISTINCT l.day) AS BIGINT) AS n,
             (SELECT CAST(COALESCE(SUM(p.sg), 0) AS BIGINT)
              FROM pairs p WHERE p.season = l.season) AS s,
             (SELECT CAST(COALESCE(SUM(tc * (tc - 1) * (2 * tc + 5)),
                                   0) AS BIGINT)
              FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tc
                    FROM lab x WHERE x.season = l.season
                    GROUP BY x.cents) z) AS tcor
      FROM lab l GROUP BY l.season),
    tot AS (
      SELECT CAST(SUM(s) AS BIGINT) AS s_tot,
             CAST(SUM(n * (n - 1) * (2 * n + 5) - tcor) AS BIGINT)
               AS var18,
             CAST(COUNT(*) AS BIGINT) AS n_seasons
      FROM per)
    SELECT n_seasons, s_tot, var18,
           CASE WHEN var18 <= 0 THEN NULL
                ELSE round((s_tot - CASE WHEN s_tot > 0 THEN 1
                                         WHEN s_tot < 0 THEN -1
                                         ELSE 0 END)
                           / sqrt(var18 / 18.0), 6) + 0
           END AS z
    FROM tot
    """,
)
def stat_seasonal_mk(spark, sf):
    """Seasonal Mann-Kendall — stat_mann_kendall computed WITHIN
    each day-of-week stratum and summed (Hirsch-Slack): pairs are
    only formed between same-weekday observations, so the weekly
    cycle the plain MK would read as noise (or worse, as trend when
    the calendar ends mid-week) cancels by construction — the
    standard trend test for any series with a known season. Each
    season's S and tie-corrected 18*Var are the exact integers of
    the parent face (per-season pairwise self-joins on the bounded
    calendar — 7 strata of ~4 days each at a month); under
    independence across seasons they SUM exactly, and the
    continuity-corrected z is the only float. Day-of-week from pure
    epoch arithmetic, (day+4)%7 (epoch day 0 = Thursday -> +4 makes
    Sunday 0), never dayofweek() (the events_heatmap trap). The
    identity pinned in tests: per-season S values summed equal the
    replayed total, and the seasonal z differs from the plain MK z
    (the deseasonalization did something)."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    from ..operators.dedup import parquet_checkpoint

    lab = parquet_checkpoint(
        daily.select(
            "day", "cents", ((F.col("day") + 4) % 7).alias("season")
        ),
        "smk_lab",
    )
    a = lab.alias("a")
    b = lab.alias("b")
    pairs = a.join(
        b,
        (F.col("b.season") == F.col("a.season"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.season").alias("season"),
        F.when(F.col("b.cents") > F.col("a.cents"), 1)
        .when(F.col("b.cents") < F.col("a.cents"), -1)
        .otherwise(0)
        .alias("sg"),
    )
    s_per = pairs.groupBy("season").agg(
        F.coalesce(F.sum("sg"), F.lit(0)).cast("long").alias("s")
    )
    n_per = lab.groupBy("season").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t_per = (
        lab.groupBy("season", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .groupBy("season")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc")
                    * (F.col("tc") - 1)
                    * (2 * F.col("tc") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tcor")
        )
    )
    per = (
        n_per.join(s_per, "season", "left")
        .join(t_per, "season", "left")
        .select(
            "season",
            "n",
            F.coalesce("s", F.lit(0)).alias("s"),
            F.coalesce("tcor", F.lit(0)).alias("tcor"),
        )
    )
    tot = per.agg(
        F.sum("s").cast("long").alias("s_tot"),
        F.sum(
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tcor")
        )
        .cast("long")
        .alias("var18"),
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
    )
    s_tot, var18 = F.col("s_tot"), F.col("var18")
    sgn = F.when(s_tot > 0, 1).when(s_tot < 0, -1).otherwise(0)
    return tot.select(
        "n_seasons",
        "s_tot",
        "var18",
        F.when(var18 <= 0, F.lit(None).cast("double"))
        .otherwise(
            F.round((s_tot - sgn) / F.sqrt(var18 / F.lit(18.0)), 6)
            + F.lit(0.0)
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# wave 141: Cliff's delta — ordinal effect size on the shared value grid
# ---------------------------------------------------------------------------
@q(
    "stat_cliff_delta",
    """
    WITH lab AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ina
      FROM events WHERE value IS NOT NULL),
    cells AS (
      SELECT v, CAST(SUM(ina) AS BIGINT) AS na_v,
             CAST(SUM(1 - ina) AS BIGINT) AS nb_v
      FROM lab GROUP BY v),
    cum AS (
      SELECT v, na_v, nb_v,
             CAST(SUM(nb_v) OVER (ORDER BY v) AS BIGINT) AS cb,
             CAST(SUM(na_v) OVER () AS BIGINT) AS na,
             CAST(SUM(nb_v) OVER () AS BIGINT) AS nb
      FROM cells),
    terms AS (
      SELECT na, nb,
             CAST(na_v * (cb - nb_v) AS BIGINT) AS gt_t,
             CAST(na_v * (nb - cb) AS BIGINT) AS lt_t
      FROM cum)
    SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(COALESCE(SUM(gt_t), 0) AS BIGINT) AS n_gt,
           CAST(COALESCE(SUM(lt_t), 0) AS BIGINT) AS n_lt,
           CASE WHEN MAX(na) = 0 OR MAX(nb) = 0 THEN NULL
                ELSE round(CAST(COALESCE(SUM(gt_t), 0)
                                - COALESCE(SUM(lt_t), 0) AS DOUBLE)
                           / (CAST(MAX(na) AS DOUBLE) * MAX(nb)),
                           6) + 0
           END AS delta
    FROM terms
    """,
)
def stat_cliff_delta(spark, sf):
    """Cliff's delta — the ordinal effect size the Mann-Whitney test
    leaves on the table: delta = (#(x>y) - #(x<y)) / (m*n) over all
    A x B pairs, the probability a random A value exceeds a random B
    value minus the reverse. The naive spelling is a quadratic cross
    join; on the shared value grid (the stat_cvm / stat_wasserstein
    cells->cumulative machinery) each distinct cents value v
    contributes na_v * #(B strictly below v) concordant and
    na_v * #(B strictly above v) discordant pairs, both exact
    BIGINTs from ONE cumulative window over the support-sized cells
    relation — ties contribute to neither side, exactly per the
    definition. Groups are the stat_ttest md5 halves, so on the
    shared-distribution fixture delta sits near 0 (pinned in tests
    against a brute-force pair count). One corpus scan, one window
    chain; at 100 TB the grid is |distinct cents| rows, not |rows|."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("v"),
            F.when(
                F.substring(
                    F.md5(F.col("event_id").cast("string")), 1, 1
                )
                < "8",
                1,
            )
            .otherwise(0)
            .alias("ina"),
        )
    )
    cells = lab.groupBy("v").agg(
        F.sum("ina").cast("long").alias("na_v"),
        F.sum(F.lit(1) - F.col("ina")).cast("long").alias("nb_v"),
    )
    wcum = Window.orderBy("v")
    wall = Window.partitionBy()
    cum = cells.select(
        "na_v",
        "nb_v",
        F.sum("nb_v").over(wcum).cast("long").alias("cb"),
        F.sum("na_v").over(wall).cast("long").alias("na"),
        F.sum("nb_v").over(wall).cast("long").alias("nb"),
    )
    terms = cum.select(
        "na",
        "nb",
        (F.col("na_v") * (F.col("cb") - F.col("nb_v")))
        .cast("long")
        .alias("gt_t"),
        (F.col("na_v") * (F.col("nb") - F.col("cb")))
        .cast("long")
        .alias("lt_t"),
    )
    gt = F.coalesce(F.sum("gt_t"), F.lit(0)).cast("long")
    lt = F.coalesce(F.sum("lt_t"), F.lit(0)).cast("long")
    return terms.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        gt.alias("n_gt"),
        lt.alias("n_lt"),
        F.when(
            (F.max("na") == 0) | (F.max("nb") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (gt - lt).cast("double")
                / (F.max("na").cast("double") * F.max("nb")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("delta"),
    )


# ---------------------------------------------------------------------------
# wave 141: Fleiss' kappa — multi-rater agreement on first-3-events panels
# ---------------------------------------------------------------------------
@q(
    "stat_fleiss_kappa",
    """
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS cnt
      FROM events),
    cells AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM r WHERE rn <= 3 AND cnt >= 3
      GROUP BY 1, 2),
    it AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nn,
             CAST(COALESCE(SUM(n * n), 0) AS BIGINT) AS ssq
      FROM cells),
    cj AS (
      SELECT CAST(COALESCE(SUM(c * c), 0) AS BIGINT) AS s2
      FROM (SELECT CAST(SUM(n) AS BIGINT) AS c
            FROM cells GROUP BY event_type) z)
    SELECT nn AS n_items,
           CAST(ssq - 3 * nn AS BIGINT) AS a_excess,
           s2,
           CASE WHEN nn = 0 THEN NULL
                ELSE round(CAST(ssq - 3 * nn AS DOUBLE)
                           / (6.0 * nn), 6) + 0 END AS p_o,
           CASE WHEN nn = 0 THEN NULL
                ELSE round(CAST(s2 AS DOUBLE)
                           / (9.0 * nn * nn), 6) + 0 END AS p_e,
           CASE WHEN nn = 0 OR 9 * nn * nn - s2 = 0 THEN NULL
                ELSE round(CAST(3 * nn * (ssq - 3 * nn)
                                - 2 * s2 AS DOUBLE)
                           / CAST(2 * (9 * nn * nn - s2)
                                  AS DOUBLE), 6) + 0
           END AS kappa
    FROM it, cj
    """,
)
def stat_fleiss_kappa(spark, sf):
    """Fleiss' kappa — chance-corrected agreement for a FIXED number
    of raters per item (Cohen/ml_cohen_kappa handles exactly 2
    paired raters; Fleiss handles n anonymous ratings per item).
    Items are users, the n=3 ratings are each user's FIRST three
    event types in (ts, event_id) order (a total order — engine-
    identical panel), users with fewer than 3 events dropped so n is
    constant as the statistic requires. With n=3 every per-item
    agreement P_i = (sum_j n_ij^2 - 3)/6 is an exact rational, so
    cross-multiplying clears ALL divisions: kappa =
    (3N*A - 2*S2) / (2*(9N^2 - S2)) with A = sum n_ij^2 - 3N and
    S2 = sum_j c_j^2 — three exact BIGINTs and one final float.
    The per-(item,category) cell relation is computed once and
    checkpointed for its two consumers (item moments + category
    marginals; the per-branch column-pruning double-scan lesson).
    Degenerate guard: all ratings one category makes the chance
    denominator zero -> NULL (ANSI divide). At corpus scale the
    window is per-user (bounded partitions) and everything after
    the first groupBy is |users x types|-sized."""
    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    rated = (
        e.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("cnt"),
        )
        .filter((F.col("rn") <= 3) & (F.col("cnt") >= 3))
    )
    cells = parquet_checkpoint(
        rated.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ),
        "fleiss_cells",
    )
    it = cells.agg(
        F.countDistinct("user_id").cast("long").alias("nn"),
        F.coalesce(F.sum(F.col("n") * F.col("n")), F.lit(0))
        .cast("long")
        .alias("ssq"),
    )
    cj = (
        cells.groupBy("event_type")
        .agg(F.sum("n").cast("long").alias("c"))
        .agg(
            F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0))
            .cast("long")
            .alias("s2")
        )
    )
    j = it.crossJoin(cj)
    nn, ssq, s2 = F.col("nn"), F.col("ssq"), F.col("s2")
    a_exc = (ssq - 3 * nn).cast("long")
    return j.select(
        nn.alias("n_items"),
        a_exc.alias("a_excess"),
        s2.alias("s2"),
        F.when(nn == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(a_exc.cast("double") / (F.lit(6.0) * nn), 6)
            + F.lit(0.0)
        )
        .alias("p_o"),
        F.when(nn == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(s2.cast("double") / (F.lit(9.0) * nn * nn), 6)
            + F.lit(0.0)
        )
        .alias("p_e"),
        F.when(
            (nn == 0) | (9 * nn * nn - s2 == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (3 * nn * a_exc - 2 * s2).cast("double")
                / (2 * (9 * nn * nn - s2)).cast("double"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("kappa"),
    )


# ---------------------------------------------------------------------------
# wave 142: Somers' D / gamma / tau-b — ordinal association in one grid pass
# ---------------------------------------------------------------------------
@q(
    "stat_somers_d",
    """
    WITH o AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS x,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders),
    cells AS (
      SELECT v,
             CAST(COUNT(*) FILTER (WHERE x = 1) AS BIGINT) AS n1,
             CAST(COUNT(*) FILTER (WHERE x = 2) AS BIGINT) AS n2,
             CAST(COUNT(*) FILTER (WHERE x = 3) AS BIGINT) AS n3,
             CAST(COUNT(*) FILTER (WHERE x = 4) AS BIGINT) AS n4,
             CAST(COUNT(*) FILTER (WHERE x = 5) AS BIGINT) AS n5
      FROM o GROUP BY v),
    cum AS (
      SELECT n1, n2, n3, n4, n5,
             CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS ny,
             CAST(SUM(n1) OVER w AS BIGINT) AS c1,
             CAST(SUM(n2) OVER w AS BIGINT) AS c2,
             CAST(SUM(n3) OVER w AS BIGINT) AS c3,
             CAST(SUM(n4) OVER w AS BIGINT) AS c4,
             CAST(SUM(n1) OVER () AS BIGINT) AS t1,
             CAST(SUM(n2) OVER () AS BIGINT) AS t2,
             CAST(SUM(n3) OVER () AS BIGINT) AS t3,
             CAST(SUM(n4) OVER () AS BIGINT) AS t4,
             CAST(SUM(n5) OVER () AS BIGINT) AS t5
      FROM cells
      WINDOW w AS (ORDER BY v)),
    terms AS (
      SELECT ny, n1, n2, n3, n4, n5, t1, t2, t3, t4, t5,
             CAST(n2 * (2 * c1 - n1 - t1)
                + n3 * (2 * c1 - n1 - t1 + 2 * c2 - n2 - t2)
                + n4 * (2 * c1 - n1 - t1 + 2 * c2 - n2 - t2
                        + 2 * c3 - n3 - t3)
                + n5 * (2 * c1 - n1 - t1 + 2 * c2 - n2 - t2
                        + 2 * c3 - n3 - t3 + 2 * c4 - n4 - t4)
               AS BIGINT) AS s_t
      FROM cum),
    agg AS (
      SELECT CAST(MAX(t1 + t2 + t3 + t4 + t5) AS BIGINT) AS n,
             CAST(COALESCE(SUM(s_t), 0) AS BIGINT) AS s,
             CAST(MAX(t1 * (t1 - 1) / 2 + t2 * (t2 - 1) / 2
                      + t3 * (t3 - 1) / 2 + t4 * (t4 - 1) / 2
                      + t5 * (t5 - 1) / 2) AS BIGINT) AS tx,
             CAST(COALESCE(SUM(ny * (ny - 1) / 2), 0) AS BIGINT)
               AS ty,
             CAST(COALESCE(SUM(n1 * (n1 - 1) / 2 + n2 * (n2 - 1) / 2
                               + n3 * (n3 - 1) / 2
                               + n4 * (n4 - 1) / 2
                               + n5 * (n5 - 1) / 2), 0) AS BIGINT)
               AS txy
      FROM terms)
    SELECT n, s, tx, ty, txy,
           CASE WHEN n IS NULL THEN NULL
                WHEN n * (n - 1) / 2 - tx - ty + txy = 0 THEN NULL
                ELSE round(CAST(s AS DOUBLE)
                           / (n * (n - 1) / 2 - tx - ty + txy), 6)
                     + 0 END AS gamma,
           CASE WHEN n IS NULL THEN NULL
                WHEN n * (n - 1) / 2 - tx = 0 THEN NULL
                ELSE round(CAST(s AS DOUBLE)
                           / (n * (n - 1) / 2 - tx), 6) + 0
           END AS d_yx,
           CASE WHEN n IS NULL THEN NULL
                WHEN n * (n - 1) / 2 - tx = 0
                     OR n * (n - 1) / 2 - ty = 0 THEN NULL
                ELSE round(CAST(s AS DOUBLE)
                           / (sqrt(CAST(n * (n - 1) / 2 - tx
                                        AS DOUBLE))
                              * sqrt(CAST(n * (n - 1) / 2 - ty
                                          AS DOUBLE))), 6) + 0
           END AS tau_b
    FROM agg
    """,
)
def stat_somers_d(spark, sf):
    """Somers' D, Goodman-Kruskal gamma, and Kendall tau-b between
    order priority (5 ordinal classes) and order value — the three
    standard ordinal-association coefficients, all from ONE pass
    over the price-support grid. The naive spelling is the n^2 pair
    census; here the Kendall S statistic folds per grid row: a
    class-b order at price v pairs concordantly with every lower-
    class order strictly below v and discordantly with every one
    strictly above, so S = sum over rows of
    n_b * (2*cum_a - n_a - tot_a) summed over the 10 ordered class
    pairs — five cumulative windows over ONE ordering (the
    stat_jonckheere grid-ECDF machinery widened to pairwise
    classes). Tie masses T_X (same class), T_Y (same price), T_XY
    (both) are closed-form from the same relation, giving gamma =
    S/(P-TX-TY+TXY), D(Y|X) = S/(P-TX), tau_b =
    S/sqrt((P-TX)(P-TY)) — every numerator and denominator an exact
    BIGINT except tau_b's sqrt, taken in DOUBLE in identical op
    order on both engines because (P-TX)(P-TY) ~ 1e20 overflows
    BIGINT at sf0.1 (the stat_mahalanobis square-in-double
    precedent). Tested against a brute-force quadratic pair census.
    At 100 TB the grid is |distinct cents| rows and the class count
    is fixed, so the window chain stays support-sized."""
    o = t(spark, sf, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    ns = [
        F.sum(F.when(F.col("x") == k, 1).otherwise(0))
        .cast("long")
        .alias(f"n{k}")
        for k in range(1, 6)
    ]
    cells = o.groupBy("v").agg(*ns)
    wcum = Window.orderBy("v")
    wall = Window.partitionBy()
    cum = cells.select(
        *[F.col(f"n{k}") for k in range(1, 6)],
        sum(F.col(f"n{k}") for k in range(1, 6))
        .cast("long")
        .alias("ny"),
        *[
            F.sum(f"n{k}").over(wcum).cast("long").alias(f"c{k}")
            for k in range(1, 5)
        ],
        *[
            F.sum(f"n{k}").over(wall).cast("long").alias(f"t{k}")
            for k in range(1, 6)
        ],
    )
    run = [
        (
            2 * F.col(f"c{a}") - F.col(f"n{a}") - F.col(f"t{a}")
        )
        for a in range(1, 5)
    ]
    s_t = sum(
        F.col(f"n{b}") * sum(run[: b - 1])
        for b in range(2, 6)
    ).cast("long")
    terms = cum.select(
        "ny",
        *[F.col(f"n{k}") for k in range(1, 6)],
        *[F.col(f"t{k}") for k in range(1, 6)],
        s_t.alias("s_t"),
    )
    tot = sum(F.max(f"t{k}") for k in range(1, 6)).cast("long")
    tx = sum(
        F.max(F.col(f"t{k}") * (F.col(f"t{k}") - 1) / 2)
        for k in range(1, 6)
    ).cast("long")
    txy = F.coalesce(
        F.sum(
            sum(
                F.col(f"n{k}") * (F.col(f"n{k}") - 1) / 2
                for k in range(1, 6)
            )
        ),
        F.lit(0),
    ).cast("long")
    agg = terms.agg(
        tot.alias("n"),
        F.coalesce(F.sum("s_t"), F.lit(0)).cast("long").alias("s"),
        tx.alias("tx"),
        F.coalesce(
            F.sum(F.col("ny") * (F.col("ny") - 1) / 2), F.lit(0)
        )
        .cast("long")
        .alias("ty"),
        txy.alias("txy"),
    )
    n, s = F.col("n"), F.col("s")
    p = (n * (n - 1) / 2).cast("long")
    cd = p - F.col("tx") - F.col("ty") + F.col("txy")
    px = p - F.col("tx")
    py = p - F.col("ty")
    return agg.select(
        "n",
        "s",
        "tx",
        "ty",
        "txy",
        F.when(n.isNull() | (cd == 0), F.lit(None).cast("double"))
        .otherwise(F.round(s.cast("double") / cd, 6) + F.lit(0.0))
        .alias("gamma"),
        F.when(n.isNull() | (px == 0), F.lit(None).cast("double"))
        .otherwise(F.round(s.cast("double") / px, 6) + F.lit(0.0))
        .alias("d_yx"),
        F.when(
            n.isNull() | (px == 0) | (py == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                s.cast("double")
                / (
                    F.sqrt(px.cast("double"))
                    * F.sqrt(py.cast("double"))
                ),
                6,
            )
            + F.lit(0.0)
        )
        .alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# wave 142: Kuiper's V vs the discrete md5-bucket uniform
# ---------------------------------------------------------------------------
@q(
    "stat_kuiper",
    """
    WITH b AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
               ::UBIGINT AS bk
      FROM documents),
    c AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bk),
    e AS (
      SELECT bk, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bk) AS BIGINT) AS k,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM c),
    d AS (
      SELECT n,
             CAST(256 * k - n * (bk + 1) AS BIGINT) AS up_t,
             CAST(n * bk - 256 * (k - cnt) AS BIGINT) AS dn_t
      FROM e),
    agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(GREATEST(COALESCE(MAX(up_t), 0), 0) AS BIGINT)
               AS d_plus_num,
             CAST(GREATEST(COALESCE(MAX(dn_t), 0), 0) AS BIGINT)
               AS d_minus_num
      FROM d)
    SELECT n, d_plus_num, d_minus_num,
           CASE WHEN n IS NULL OR n = 0 THEN NULL
                ELSE round(CAST(d_plus_num + d_minus_num AS DOUBLE)
                           / (256.0 * n), 6) + 0 END AS v_stat,
           CASE WHEN n IS NULL OR n = 0 THEN NULL
                ELSE round(CAST(d_plus_num + d_minus_num AS DOUBLE)
                           / (256.0 * n), 6)
                     < round(2.001 / sqrt(CAST(n AS DOUBLE)), 6)
           END AS uniform_ok
    FROM agg
    """,
)
def stat_kuiper(spark, sf):
    """Kuiper's V against the 256-bucket md5 uniform — the CIRCULAR
    companion to stat_ks_uniform: V = D+ + D- is invariant under
    cyclic rotation of the domain, so it has equal power at every
    bucket offset where KS concentrates power at the median and
    goes blind near the wrap point (the right test when the hash
    byte feeds a ring — consistent-hash sharding, modulo
    partitioning). Both one-sided sups are exact cross-multiplied
    integers on the bucket grid: F_n - U maximizes just AFTER a
    step (256k - n(b+1)) and U - F_n just BEFORE one (nb -
    256(k - cnt)); flat stretches between occupied buckets are
    covered because each gap's endpoints are the adjacent
    evaluation points (U is linear between steps). The alpha=0.01
    acceptance compares ROUNDED identical expressions (2.001/sqrt(n)
    asymptotic critical value as an embedded literal, the
    stat_wilson_ci discipline); uniform_ok is pinned TRUE in the
    replay — if md5's first byte ever drifts, every ring-sharded
    face upstream is suspect. One scan to 256 cells, one window."""
    b = t(spark, sf, "documents").select(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2),
            16,
            10,
        )
        .cast("long")
        .alias("bk")
    )
    c = b.groupBy("bk").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    e = c.select(
        "bk",
        "cnt",
        F.sum("cnt").over(Window.orderBy("bk")).cast("long").alias("k"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    d = e.select(
        "n",
        (256 * F.col("k") - F.col("n") * (F.col("bk") + 1))
        .cast("long")
        .alias("up_t"),
        (F.col("n") * F.col("bk") - 256 * (F.col("k") - F.col("cnt")))
        .cast("long")
        .alias("dn_t"),
    )
    agg = d.agg(
        F.max("n").cast("long").alias("n"),
        F.greatest(F.coalesce(F.max("up_t"), F.lit(0)), F.lit(0))
        .cast("long")
        .alias("d_plus_num"),
        F.greatest(F.coalesce(F.max("dn_t"), F.lit(0)), F.lit(0))
        .cast("long")
        .alias("d_minus_num"),
    )
    n = F.col("n")
    v = (F.col("d_plus_num") + F.col("d_minus_num")).cast("double") / (
        F.lit(256.0) * n
    )
    return agg.select(
        "n",
        "d_plus_num",
        "d_minus_num",
        F.when(n.isNull() | (n == 0), F.lit(None).cast("double"))
        .otherwise(F.round(v, 6) + F.lit(0.0))
        .alias("v_stat"),
        F.when(n.isNull() | (n == 0), F.lit(None).cast("boolean"))
        .otherwise(
            F.round(v, 6)
            < F.round(F.lit(2.001) / F.sqrt(n.cast("double")), 6)
        )
        .alias("uniform_ok"),
    )


# ---------------------------------------------------------------------------
# wave 143: Dickey-Fuller unit-root t on the daily revenue series
# ---------------------------------------------------------------------------
@q(
    "stat_df_unit_root",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
               AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) // 100000 AS kd
      FROM orders GROUP BY 1),
    lagged AS (
      SELECT day, kd,
             LAG(day) OVER (ORDER BY day) AS pday,
             LAG(kd) OVER (ORDER BY day) AS pkd
      FROM daily),
    pairs AS (
      SELECT CAST(pkd AS BIGINT) AS x,
             CAST(kd - pkd AS BIGINT) AS dy
      FROM lagged WHERE pday IS NOT NULL AND day - pday = 1),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n2,
             CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx,
             CAST(COALESCE(SUM(dy), 0) AS BIGINT) AS sy,
             CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS sxx,
             CAST(COALESCE(SUM(x * dy), 0) AS BIGINT) AS sxy,
             CAST(COALESCE(SUM(dy * dy), 0) AS BIGINT) AS syy
      FROM pairs),
    f AS (
      SELECT n2,
             CAST(n2 * sxy - sx * sy AS BIGINT) AS a,
             CAST(n2 * sxx - sx * sx AS BIGINT) AS b,
             CAST(n2 * syy - sy * sy AS BIGINT) AS c
      FROM m)
    SELECT n2 AS n_pairs, a, b,
           CASE WHEN b = 0 THEN NULL
                ELSE round(CAST(a AS DOUBLE) / b, 6) + 0 END AS rho,
           CASE WHEN n2 < 3 OR b = 0
                     OR CAST(c AS DOUBLE) * b - CAST(a AS DOUBLE) * a
                        <= 0 THEN NULL
                ELSE round(CAST(a AS DOUBLE) * sqrt(n2 - 2.0)
                           / sqrt(CAST(c AS DOUBLE) * b
                                  - CAST(a AS DOUBLE) * a), 6) + 0
           END AS t_df,
           CASE WHEN n2 < 3 OR b = 0
                     OR CAST(c AS DOUBLE) * b - CAST(a AS DOUBLE) * a
                        <= 0 THEN NULL
                ELSE round(CAST(a AS DOUBLE) * sqrt(n2 - 2.0)
                           / sqrt(CAST(c AS DOUBLE) * b
                                  - CAST(a AS DOUBLE) * a), 6)
                     < -3.43
           END AS unit_root_rejected
    FROM f
    """,
)
def stat_df_unit_root(spark, sf):
    """Dickey-Fuller unit-root t-test on the daily revenue series —
    the stationarity gate a forecasting pipeline runs before
    differencing decisions: regress day-over-day change on the
    lagged LEVEL; under a unit root the level carries no pull-back
    and t(rho) is near 0, under stationarity rho < 0 with t far
    below the -3.43 (1%, with-constant) Dickey-Fuller critical
    value (embedded literal; plain t criticals do NOT apply to this
    regression — that is the whole point of the DF tables, left to
    the consumer in the games_howell discipline for other alphas).
    The OLS t folds to closed form on cross-multiplied integer
    moments: A = n*Sxy', B = n*Sxx', C = n*Syy' (shift-invariant,
    so NO centering pass is needed), t = A*sqrt(n-2)/sqrt(C*B-A^2).
    Revenue is exact integer KILOdollars (SUM(cents) div 100000) so
    B fits BIGINT at sf1 where dollar-cents moments overflow
    (n^2*dev^2 ~ 1e21); A^2 ~ 1e30 still overflows anything, so the
    final assembly is DOUBLE in ONE identical op order from exact
    integer inputs (the stat_cvm square-in-double discipline).
    Consecutive-day pairs only (day - prev == 1), LAG over the
    |days|-sized relation — one corpus scan, support-sized window.
    The iid-by-day fixture is strongly mean-reverting: rho ~ -1 and
    unit_root_rejected TRUE are pinned in the replay test."""
    daily = (
        t(spark, sf, "orders")
        .groupBy(
            F.expr(
                "unix_micros(cast(o_orderdate AS TIMESTAMP))"
                " div 86400000000"
            ).alias("day")
        )
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) AS BIGINT))"
                " div 100000"
            )
            .cast("long")
            .alias("kd")
        )
    )
    wl = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "kd",
        F.lag("day").over(wl).alias("pday"),
        F.lag("kd").over(wl).alias("pkd"),
    )
    pairs = lagged.filter(
        F.col("pday").isNotNull()
        & (F.col("day") - F.col("pday") == 1)
    ).select(
        F.col("pkd").cast("long").alias("x"),
        (F.col("kd") - F.col("pkd")).cast("long").alias("dy"),
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n2"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("sx"),
        F.coalesce(F.sum("dy"), F.lit(0)).cast("long").alias("sy"),
        F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0))
        .cast("long")
        .alias("sxx"),
        F.coalesce(F.sum(F.col("x") * F.col("dy")), F.lit(0))
        .cast("long")
        .alias("sxy"),
        F.coalesce(F.sum(F.col("dy") * F.col("dy")), F.lit(0))
        .cast("long")
        .alias("syy"),
    )
    n2 = F.col("n2")
    f = m.select(
        n2,
        (n2 * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("a"),
        (n2 * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("b"),
        (n2 * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("long")
        .alias("c"),
    )
    a_d = F.col("a").cast("double")
    b, c = F.col("b"), F.col("c")
    disc = c.cast("double") * b - a_d * F.col("a")
    t_df = F.round(
        a_d * F.sqrt(n2 - F.lit(2.0)) / F.sqrt(disc), 6
    )
    bad = (n2 < 3) | (b == 0) | (disc <= 0)
    return f.select(
        n2.alias("n_pairs"),
        "a",
        "b",
        F.when(b == 0, F.lit(None).cast("double"))
        .otherwise(F.round(a_d / b, 6) + F.lit(0.0))
        .alias("rho"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(t_df + F.lit(0.0))
        .alias("t_df"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise(t_df < F.lit(-3.43))
        .alias("unit_root_rejected"),
    )


# ---------------------------------------------------------------------------
# wave 143: KPSS level-stationarity statistic — exact partial sums
# ---------------------------------------------------------------------------
@q(
    "stat_kpss",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
               AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) // 100000 AS kd
      FROM orders GROUP BY 1),
    sc AS (
      SELECT day, kd,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(kd) OVER () AS BIGINT) AS tot
      FROM daily),
    e AS (
      SELECT n, CAST(n * kd - tot AS BIGINT) AS ep,
             CAST(SUM(n * kd - tot) OVER (ORDER BY day) AS BIGINT)
               AS sp
      FROM sc),
    terms AS (
      SELECT n,
             CAST(round((CAST(ep AS DOUBLE) / 1000.0)
                        * (CAST(ep AS DOUBLE) / 1000.0))
                  AS BIGINT) AS e_q,
             CAST(round((CAST(sp AS DOUBLE) / 1000000.0)
                        * (CAST(sp AS DOUBLE) / 1000000.0))
                  AS BIGINT) AS s_q
      FROM e)
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(COALESCE(SUM(s_q), 0) AS BIGINT) AS q_num,
           CAST(COALESCE(SUM(e_q), 0) AS BIGINT) AS q_den,
           CASE WHEN MAX(n) IS NULL OR COALESCE(SUM(e_q), 0) = 0
                THEN NULL
                ELSE round(CAST(SUM(s_q) AS DOUBLE) * 1000000.0
                           / (CAST(MAX(n) AS DOUBLE) * SUM(e_q)),
                           6) + 0 END AS eta,
           CASE WHEN MAX(n) IS NULL OR COALESCE(SUM(e_q), 0) = 0
                THEN NULL
                ELSE round(CAST(SUM(s_q) AS DOUBLE) * 1000000.0
                           / (CAST(MAX(n) AS DOUBLE) * SUM(e_q)),
                           6) < 0.739
           END AS level_stationary
    FROM terms
    """,
)
def stat_kpss(spark, sf):
    """KPSS level-stationarity statistic (lag-0 long-run variance) —
    the COMPLEMENT of stat_df_unit_root: DF's null is a unit root,
    KPSS's null is stationarity, and running both is the standard
    confirmatory protocol (agree -> confident; disagree -> the
    series is too short or fractionally integrated). eta = sum_t
    S_t^2 / (n^2 sigma^2) with S_t the partial sums of demeaned
    values. Demeaning is EXACT: e'_t = n*y_t - sum(y) (BIGINT, no
    division), and the cumulative window over the day-ordered
    support gives S'_t = n*S_t exactly; the n-powers then cancel to
    eta = sum S'^2 / (n * sum e'^2). The squares cross 2^63 (S' is
    a random walk reaching ~1e11 at sf0.1, squared 1e22), so each
    term squares in DOUBLE in identical op order and quantizes to a
    FIXED grid before the sum — e'^2 to 1e6 units, S'^2 to 1e12
    units — making both aggregates exact order-independent BIGINTs
    (the kg_adamic_adar per-term discipline; the two grids rescale
    to eta = qS*1e6/(n*qE)). Level-stationarity acceptance at the
    1% critical value 0.739 (embedded literal) compares the ROUNDED
    statistic; the iid-by-day fixture is stationary, so
    level_stationary TRUE is pinned — jointly with DF's rejection,
    the two faces bracket the fixture from both nulls. One scan,
    two windows over the |days| relation."""
    daily = (
        t(spark, sf, "orders")
        .groupBy(
            F.expr(
                "unix_micros(cast(o_orderdate AS TIMESTAMP))"
                " div 86400000000"
            ).alias("day")
        )
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) AS BIGINT))"
                " div 100000"
            )
            .cast("long")
            .alias("kd")
        )
    )
    wall = Window.partitionBy()
    sc = daily.select(
        "day",
        "kd",
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        F.sum("kd").over(wall).cast("long").alias("tot"),
    )
    ep = (F.col("n") * F.col("kd") - F.col("tot")).cast("long")
    e = sc.select(
        "n",
        ep.alias("ep"),
        F.sum(ep).over(Window.orderBy("day")).cast("long").alias("sp"),
    )
    terms = e.select(
        "n",
        F.round(
            (F.col("ep").cast("double") / F.lit(1000.0))
            * (F.col("ep").cast("double") / F.lit(1000.0))
        )
        .cast("long")
        .alias("e_q"),
        F.round(
            (F.col("sp").cast("double") / F.lit(1000000.0))
            * (F.col("sp").cast("double") / F.lit(1000000.0))
        )
        .cast("long")
        .alias("s_q"),
    )
    qs = F.coalesce(F.sum("s_q"), F.lit(0)).cast("long")
    qe = F.coalesce(F.sum("e_q"), F.lit(0)).cast("long")
    eta = F.round(
        qs.cast("double")
        * F.lit(1000000.0)
        / (F.max("n").cast("double") * qe),
        6,
    )
    bad = F.max("n").isNull() | (qe == 0)
    return terms.agg(
        F.max("n").cast("long").alias("n_days"),
        qs.alias("q_num"),
        qe.alias("q_den"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(eta + F.lit(0.0))
        .alias("eta"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise(eta < F.lit(0.739))
        .alias("level_stationary"),
    )


# ---------------------------------------------------------------------------
# wave 146: Yuen's trimmed-means t — outlier-robust Welch on md5 halves
# ---------------------------------------------------------------------------
@q(
    "stat_yuen",
    """
    WITH lab AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'a' ELSE 'b' END AS grp
      FROM events WHERE value IS NOT NULL),
    sup AS (
      SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM lab GROUP BY grp, v),
    cw AS (
      SELECT grp, v, c,
             CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v)
                  AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
      FROM sup),
    bounds AS (
      SELECT grp, n, CAST(n // 5 AS BIGINT) AS g,
             CAST(MIN(CASE WHEN cum >= n // 5 + 1 THEN v END)
                  AS BIGINT) AS lo,
             CAST(MIN(CASE WHEN cum >= n - n // 5 THEN v END)
                  AS BIGINT) AS hi
      FROM cw GROUP BY grp, n),
    inc AS (
      SELECT w.grp, b.n, b.g, b.lo, b.hi,
             GREATEST(LEAST(w.cum, b.n - b.g)
                      - GREATEST(w.cum - w.c, b.g), 0) AS k,
             w.v
      FROM cw w JOIN bounds b ON b.grp = w.grp),
    moms AS (
      SELECT grp, MAX(n) AS n, MAX(g) AS g,
             MAX(lo) AS lo, MAX(hi) AS hi,
             CAST(COALESCE(SUM(k), 0) AS BIGINT) AS h,
             CAST(COALESCE(SUM(v * k), 0) AS BIGINT) AS ts,
             CAST(COALESCE(SUM(v * v * k), 0) AS BIGINT) AS ts2
      FROM inc GROUP BY grp),
    wm AS (
      SELECT grp, n, g, h,
             CAST(ts AS DOUBLE) / 100.0 / h AS tmean,
             CAST(ts + lo * g + hi * g AS BIGINT) AS ws,
             CAST(ts2 + lo * lo * g + hi * hi * g AS BIGINT) AS ws2
      FROM moms WHERE h > 1),
    se AS (
      SELECT grp, n, g, h, tmean,
             (CAST(ws2 AS DOUBLE) / 10000.0
              - (CAST(ws AS DOUBLE) / 100.0)
                * (CAST(ws AS DOUBLE) / 100.0) / n)
             / (CAST(h AS DOUBLE) * (h - 1)) AS se2
      FROM wm),
    ab AS (
      SELECT MAX(CASE WHEN grp = 'a' THEN n END) AS n_a,
             MAX(CASE WHEN grp = 'b' THEN n END) AS n_b,
             MAX(CASE WHEN grp = 'a' THEN g END) AS g_a,
             MAX(CASE WHEN grp = 'b' THEN g END) AS g_b,
             MAX(CASE WHEN grp = 'a' THEN h END) AS h_a,
             MAX(CASE WHEN grp = 'b' THEN h END) AS h_b,
             MAX(CASE WHEN grp = 'a' THEN tmean END) AS tm_a,
             MAX(CASE WHEN grp = 'b' THEN tmean END) AS tm_b,
             MAX(CASE WHEN grp = 'a' THEN se2 END) AS se2_a,
             MAX(CASE WHEN grp = 'b' THEN se2 END) AS se2_b
      FROM se)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(g_a AS BIGINT) AS g_a, CAST(g_b AS BIGINT) AS g_b,
           round(tm_a, 6) + 0 AS tmean_a,
           round(tm_b, 6) + 0 AS tmean_b,
           CASE WHEN se2_a IS NULL OR se2_b IS NULL
                     OR se2_a + se2_b <= 0 THEN NULL
                ELSE round((tm_a - tm_b) / sqrt(se2_a + se2_b), 6)
                     + 0 END AS t_yuen,
           CASE WHEN se2_a IS NULL OR se2_b IS NULL
                     OR se2_a + se2_b <= 0
                     OR h_a < 2 OR h_b < 2 THEN NULL
                ELSE round((se2_a + se2_b) * (se2_a + se2_b)
                           / (se2_a * se2_a / (h_a - 1)
                              + se2_b * se2_b / (h_b - 1)), 6) + 0
           END AS df
    FROM ab
    """,
)
def stat_yuen(spark, sf):
    """Yuen's trimmed-means t — the outlier-robust replacement for
    stat_ttest's Welch (a single wild value can swing a raw mean;
    20% symmetric trimming bounds any point's influence): t =
    (xt_a - xt_b)/sqrt(se_a^2 + se_b^2) with trimmed means over the
    middle n-2g order statistics (g = n div 5) and standard errors
    from the WINSORIZED variance, se^2 = SSD_w/(h(h-1)), df by
    Welch-Satterthwaite on the same terms. Everything runs on the
    per-group count-of-counts support: each value's in-trim
    multiplicity is the exact interval overlap min(cw, n-g) -
    max(cw-c, g) clamped at 0 (the agg_winsorized_mean clip-once-
    per-SUPPORT-row discipline), the trim boundary values are
    conditional MINs over the same cumulative, and the winsorized
    sums add the g boundary copies back in closed form — trimmed
    and winsorized moments as exact BIGINT cents with ZERO extra
    scans. Variance assembly is DOUBLE in identical op order (the
    n*sum_sq cross-product overflows BIGINT at sf0.1). The md5
    halves share one distribution, so |t| sits in the null bulk
    (pinned); the replay test checks against a brute-force sorted
    trim. One scan, one support-sized window chain per group."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("v"),
            F.when(
                F.substring(
                    F.md5(F.col("event_id").cast("string")), 1, 1
                )
                < "8",
                "a",
            )
            .otherwise("b")
            .alias("grp"),
        )
    )
    sup = lab.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wg = Window.partitionBy("grp").orderBy("v")
    wa = Window.partitionBy("grp")
    cw = sup.select(
        "grp",
        "v",
        "c",
        F.sum("c").over(wg).cast("long").alias("cum"),
        F.sum("c").over(wa).cast("long").alias("n"),
    )
    g = F.expr("n div 5")
    bounds = cw.groupBy("grp", "n").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("n div 5") + 1, F.col("v"))
        )
        .cast("long")
        .alias("lo"),
        F.min(
            F.when(
                F.col("cum") >= F.col("n") - F.expr("n div 5"),
                F.col("v"),
            )
        )
        .cast("long")
        .alias("hi"),
    ).select(
        "grp",
        "n",
        F.expr("n div 5").cast("long").alias("g"),
        "lo",
        "hi",
    )
    inc = cw.drop("n").join(bounds, "grp").select(
        "grp",
        "n",
        "g",
        "lo",
        "hi",
        "v",
        F.greatest(
            F.least(F.col("cum"), F.col("n") - F.col("g"))
            - F.greatest(F.col("cum") - F.col("c"), F.col("g")),
            F.lit(0),
        ).alias("k"),
    )
    moms = inc.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.max("g").alias("g"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("h"),
        F.coalesce(F.sum(F.col("v") * F.col("k")), F.lit(0))
        .cast("long")
        .alias("ts"),
        F.coalesce(
            F.sum(F.col("v") * F.col("v") * F.col("k")), F.lit(0)
        )
        .cast("long")
        .alias("ts2"),
    )
    wm = moms.filter(F.col("h") > 1).select(
        "grp",
        "n",
        "g",
        "h",
        (F.col("ts").cast("double") / F.lit(100.0) / F.col("h"))
        .alias("tmean"),
        (F.col("ts") + F.col("lo") * F.col("g") + F.col("hi") * F.col("g"))
        .cast("long")
        .alias("ws"),
        (
            F.col("ts2")
            + F.col("lo") * F.col("lo") * F.col("g")
            + F.col("hi") * F.col("hi") * F.col("g")
        )
        .cast("long")
        .alias("ws2"),
    )
    se = wm.select(
        "grp",
        "n",
        "g",
        "h",
        "tmean",
        (
            (
                F.col("ws2").cast("double") / F.lit(10000.0)
                - (F.col("ws").cast("double") / F.lit(100.0))
                * (F.col("ws").cast("double") / F.lit(100.0))
                / F.col("n")
            )
            / (F.col("h").cast("double") * (F.col("h") - 1))
        ).alias("se2"),
    )

    def pick(col, grp):
        return F.max(F.when(F.col("grp") == grp, F.col(col)))

    ab = se.agg(
        pick("n", "a").alias("n_a"),
        pick("n", "b").alias("n_b"),
        pick("g", "a").alias("g_a"),
        pick("g", "b").alias("g_b"),
        pick("h", "a").alias("h_a"),
        pick("h", "b").alias("h_b"),
        pick("tmean", "a").alias("tm_a"),
        pick("tmean", "b").alias("tm_b"),
        pick("se2", "a").alias("se2_a"),
        pick("se2", "b").alias("se2_b"),
    )
    s2a, s2b = F.col("se2_a"), F.col("se2_b")
    bad = s2a.isNull() | s2b.isNull() | (s2a + s2b <= 0)
    return ab.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("g_a").cast("long").alias("g_a"),
        F.col("g_b").cast("long").alias("g_b"),
        (F.round(F.col("tm_a"), 6) + F.lit(0.0)).alias("tmean_a"),
        (F.round(F.col("tm_b"), 6) + F.lit(0.0)).alias("tmean_b"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("tm_a") - F.col("tm_b"))
                / F.sqrt(s2a + s2b),
                6,
            )
            + F.lit(0.0)
        )
        .alias("t_yuen"),
        F.when(
            bad | (F.col("h_a") < 2) | (F.col("h_b") < 2),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (s2a + s2b)
                * (s2a + s2b)
                / (
                    s2a * s2a / (F.col("h_a") - 1)
                    + s2b * s2b / (F.col("h_b") - 1)
                ),
                6,
            )
            + F.lit(0.0)
        )
        .alias("df"),
    )


# ---------------------------------------------------------------------------
# wave 146: Theil's uncertainty coefficient U(Y|X)
# ---------------------------------------------------------------------------
@q(
    "stat_theil_u",
    """
    WITH lab AS (
      SELECT event_type AS x,
             CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT)
               AS y
      FROM events WHERE ts IS NOT NULL),
    cells AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c
      FROM lab GROUP BY x, y),
    m AS (
      SELECT x, y, c,
             CAST(SUM(c) OVER (PARTITION BY x) AS BIGINT) AS rx,
             CAST(SUM(c) OVER (PARTITION BY y) AS BIGINT) AS cy,
             CAST(SUM(c) OVER () AS BIGINT) AS n
      FROM cells),
    mi AS (
      SELECT MAX(n) AS n,
             CAST(COALESCE(SUM(CAST(round(1000000.0 * c
               * ln(CAST(n AS DOUBLE) * c
                    / (CAST(rx AS DOUBLE) * cy))) AS BIGINT)), 0)
               AS BIGINT) AS mi_mic
      FROM m),
    hy AS (
      SELECT CAST(COALESCE(SUM(CAST(round(1000000.0 * cy
               * ln(CAST(cy AS DOUBLE))) AS BIGINT)), 0) AS BIGINT)
               AS sy_mic
      FROM (SELECT y, CAST(SUM(c) AS BIGINT) AS cy
            FROM cells GROUP BY y) z)
    SELECT n, mi_mic,
           CASE WHEN n IS NULL OR n = 0 THEN NULL
                ELSE CAST(round(1000000.0 * n
                          * ln(CAST(n AS DOUBLE))) AS BIGINT)
                     - sy_mic END AS nhy_mic,
           CASE WHEN n IS NULL OR n = 0
                     OR CAST(round(1000000.0 * n
                             * ln(CAST(n AS DOUBLE))) AS BIGINT)
                        - sy_mic <= 0 THEN NULL
                ELSE round(CAST(mi_mic AS DOUBLE)
                           / (CAST(round(1000000.0 * n
                               * ln(CAST(n AS DOUBLE))) AS BIGINT)
                              - sy_mic), 6) + 0
           END AS u_yx
    FROM mi, hy
    """,
)
def stat_theil_u(spark, sf):
    """Theil's uncertainty coefficient U(Y|X) = I(X;Y)/H(Y) — the
    ASYMMETRIC normalized dependence measure (stat_cramers_v is
    symmetric; U answers "what fraction of Y's entropy does knowing
    X remove", which is the feature-selection question): here X =
    event type, Y = day-of-week from pure epoch arithmetic (the
    events_heatmap (day+4)%7 rule, never dayofweek()). Both the
    mutual information and N*H(Y) ride the per-term integer-micros
    ln-sum discipline: each cell contributes round(1e6 * c *
    ln(N*c/(rx*cy))) and each Y marginal round(1e6 * cy * ln cy),
    so the sums are exact order-independent BIGINTs and U is ONE
    guarded division — N*H(Y) = round(1e6*N*lnN) - sum(cy ln cy
    terms), zero when Y is constant -> NULL (ANSI). Marginals are
    WINDOWS over the cells relation, never re-aggregation branches
    (the stat_mutual_info one-scan discipline). Type and weekday
    are independent in the fixture, so U ~ 0 is pinned; the replay
    test also pins 0 <= U <= 1 and the I <= H(Y) information
    inequality on the quantized integers. One corpus scan; cells
    are |types x 7|."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            F.col("event_type").alias("x"),
            (
                (
                    F.expr(
                        "unix_micros(cast(ts AS TIMESTAMP))"
                        " div 86400000000"
                    )
                    + 4
                )
                % 7
            )
            .cast("long")
            .alias("y"),
        )
    )
    cells = lab.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    m = cells.select(
        "c",
        F.sum("c").over(Window.partitionBy("x")).cast("long").alias("rx"),
        F.sum("c").over(Window.partitionBy("y")).cast("long").alias("cy"),
        F.sum("c").over(Window.partitionBy()).cast("long").alias("n"),
    )
    mi_t = F.round(
        F.lit(1000000.0)
        * F.col("c")
        * F.log(
            F.col("n").cast("double")
            * F.col("c")
            / (F.col("rx").cast("double") * F.col("cy"))
        )
    ).cast("long")
    mi = m.agg(
        F.max("n").alias("n"),
        F.coalesce(F.sum(mi_t), F.lit(0)).cast("long").alias("mi_mic"),
    )
    hy = (
        cells.groupBy("y")
        .agg(F.sum("c").cast("long").alias("cy"))
        .agg(
            F.coalesce(
                F.sum(
                    F.round(
                        F.lit(1000000.0)
                        * F.col("cy")
                        * F.log(F.col("cy").cast("double"))
                    ).cast("long")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("sy_mic")
        )
    )
    j = mi.crossJoin(hy)
    n = F.col("n")
    nlogn = F.round(
        F.lit(1000000.0) * n * F.log(n.cast("double"))
    ).cast("long")
    nhy = nlogn - F.col("sy_mic")
    return j.select(
        n.cast("long").alias("n"),
        "mi_mic",
        F.when(n.isNull() | (n == 0), F.lit(None).cast("long"))
        .otherwise(nhy)
        .alias("nhy_mic"),
        F.when(
            n.isNull() | (n == 0) | (nhy <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(F.col("mi_mic").cast("double") / nhy, 6)
            + F.lit(0.0)
        )
        .alias("u_yx"),
    )


# ---------------------------------------------------------------------------
# wave 148: Little's law certificate — sweep-line integral vs closed form
# ---------------------------------------------------------------------------
@q(
    "events_queueing",
    """
    WITH u AS (
      SELECT user_id, MIN(epoch_us(ts)) AS fus, MAX(epoch_us(ts)) AS lus
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    span AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(fus) AS BIGINT) AS t0,
             CAST(MAX(lus) AS BIGINT) AS t1,
             CAST(COALESCE(SUM(lus - fus), 0) AS BIGINT) AS sum_dur
      FROM u),
    b AS (
      SELECT fus AS ts, 1 AS delta FROM u
      UNION ALL
      SELECT lus AS ts, -1 AS delta FROM u),
    sw AS (
      SELECT ts,
             CAST(SUM(delta) OVER (ORDER BY ts, delta DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS conc,
             LEAD(ts) OVER (ORDER BY ts, delta DESC) AS nxt
      FROM b),
    integ AS (
      SELECT CAST(COALESCE(SUM(conc * (nxt - ts)), 0) AS BIGINT)
               AS integral_us
      FROM sw WHERE nxt IS NOT NULL)
    SELECT s.n AS n_users,
           CAST(s.t1 - s.t0 AS BIGINT) AS span_us,
           s.sum_dur AS sum_dur_us,
           i.integral_us,
           i.integral_us = s.sum_dur AS littles_exact,
           CASE WHEN s.t1 - s.t0 <= 0 THEN NULL
                ELSE round(CAST(s.n AS DOUBLE) * 3600000000.0
                           / (s.t1 - s.t0), 6) + 0
           END AS lambda_per_hour,
           CASE WHEN s.n = 0 THEN NULL
                ELSE round(CAST(s.sum_dur AS DOUBLE)
                           / s.n / 3600000000.0, 6) + 0
           END AS w_hours,
           CASE WHEN s.t1 - s.t0 <= 0 THEN NULL
                ELSE round(CAST(i.integral_us AS DOUBLE)
                           / (s.t1 - s.t0), 6) + 0
           END AS l_avg
    FROM span s, integ i
    """,
)
def events_queueing(spark, sf):
    """Little's law (L = lambda * W) as an EXACT integer certificate
    of the sweep-line concurrency machinery: each user is an
    interval [first event, last event), the time-average
    concurrency L comes from the +1/-1 boundary sweep (sorted
    deltas, running sum, each segment weighted by its exact
    microsecond width), and over the full observation span the
    sweep integral MUST equal sum(durations) — the identity behind
    Little's law — as BIGINT equality, not a float tolerance. A
    red `littles_exact` means the sweep (the same machinery
    events_concurrency and capacity planning dashboards rely on)
    dropped or double-counted a boundary. lambda (arrivals/hour),
    W (mean residence hours) and L then report the actual queueing
    numbers. Tie handling: coincident boundaries order (ts, delta
    DESC) so arrivals precede departures at the same instant; the
    segment width there is zero, so the integral — and the
    certificate — is tie-order invariant. One scan to the per-user
    panel; the sweep window runs over 2|users| boundary rows."""
    e = t(spark, sf, "events").filter(F.col("user_id").isNotNull())
    u = e.groupBy("user_id").agg(
        F.min(F.expr("unix_micros(cast(ts AS TIMESTAMP))")).alias(
            "fus"
        ),
        F.max(F.expr("unix_micros(cast(ts AS TIMESTAMP))")).alias(
            "lus"
        ),
    )
    from ..operators.dedup import parquet_checkpoint

    u = parquet_checkpoint(u, "queueing_users")
    span = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("fus").cast("long").alias("t0"),
        F.max("lus").cast("long").alias("t1"),
        F.coalesce(F.sum(F.col("lus") - F.col("fus")), F.lit(0))
        .cast("long")
        .alias("sum_dur"),
    )
    b = u.select(
        F.col("fus").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        u.select(F.col("lus").alias("ts"), F.lit(-1).alias("delta"))
    )
    wsw = Window.orderBy(F.col("ts"), F.desc("delta")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wl = Window.orderBy(F.col("ts"), F.desc("delta"))
    sw = b.select(
        "ts",
        F.sum("delta").over(wsw).cast("long").alias("conc"),
        F.lead("ts").over(wl).alias("nxt"),
    )
    integ = sw.filter(F.col("nxt").isNotNull()).agg(
        F.coalesce(
            F.sum(F.col("conc") * (F.col("nxt") - F.col("ts"))),
            F.lit(0),
        )
        .cast("long")
        .alias("integral_us")
    )
    j = span.crossJoin(integ)
    spn = (F.col("t1") - F.col("t0")).cast("long")
    return j.select(
        F.col("n").alias("n_users"),
        spn.alias("span_us"),
        F.col("sum_dur").alias("sum_dur_us"),
        "integral_us",
        (F.col("integral_us") == F.col("sum_dur")).alias(
            "littles_exact"
        ),
        F.when(spn <= 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("n").cast("double") * F.lit(3600000000.0) / spn,
                6,
            )
            + F.lit(0.0)
        )
        .alias("lambda_per_hour"),
        F.when(F.col("n") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("sum_dur").cast("double")
                / F.col("n")
                / F.lit(3600000000.0),
                6,
            )
            + F.lit(0.0)
        )
        .alias("w_hours"),
        F.when(spn <= 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("integral_us").cast("double") / spn, 6)
            + F.lit(0.0)
        )
        .alias("l_avg"),
    )


# ---------------------------------------------------------------------------
# wave 148: Nelson-Aalen cumulative hazard on the survival panel
# ---------------------------------------------------------------------------
@q(
    "events_hazard",
    """
    WITH u AS (
      SELECT user_id, MIN(epoch_us(ts)) AS fus, MAX(epoch_us(ts)) AS lus
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    ud AS (
      SELECT (lus - fus) // 3600000000 AS dur,
             CASE WHEN MAX(lus) OVER () - lus < 43200000000
                  THEN 0 ELSE 1 END AS ev
      FROM u),
    sup AS (
      SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS tot
      FROM ud GROUP BY dur),
    rk AS (
      SELECT dur, d,
             CAST(SUM(tot) OVER (ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_risk
      FROM sup),
    st AS (
      SELECT dur, d, n_risk,
             CAST(round(1000000.0 * d / n_risk) AS BIGINT) AS h_mic
      FROM rk WHERE d > 0)
    SELECT dur, d, n_risk, h_mic,
           CAST(SUM(h_mic) OVER (ORDER BY dur) AS BIGINT) AS ch_mic
    FROM st ORDER BY dur
    """,
)
def events_hazard(spark, sf):
    """Nelson-Aalen cumulative hazard on the user-survival panel —
    the instantaneous-risk companion to events_survival's
    Kaplan-Meier (KM multiplies survival factors; Nelson-Aalen sums
    hazard increments d_i/n_i, is defined even when a risk set
    empties, and is what proportional-hazards diagnostics plot):
    durations and 12h censoring exactly as stat_log_rank. Each
    step d/n_risk micros-quantizes BEFORE the cumulative sum (the
    kg_adamic_adar per-term discipline), so H(t) is an exact
    running BIGINT; the risk sets come from ONE suffix-cumulative
    window over the duration support (never a per-time re-count).
    The replay test pins the H ~ -ln(S_KM) correspondence (equal
    to first order; H >= -ln S always on the quantized grid up to
    per-term rounding) and that n_risk is non-increasing while H
    is non-decreasing. Scale: everything after the per-user
    aggregate is |distinct durations|-sized."""
    e = t(spark, sf, "events").filter(F.col("user_id").isNotNull())
    u = e.groupBy("user_id").agg(
        F.min(F.expr("unix_micros(cast(ts AS TIMESTAMP))")).alias(
            "fus"
        ),
        F.max(F.expr("unix_micros(cast(ts AS TIMESTAMP))")).alias(
            "lus"
        ),
    )
    wall = Window.partitionBy()
    ud = u.select(
        F.expr("(lus - fus) div 3600000000").alias("dur"),
        F.when(
            F.max("lus").over(wall) - F.col("lus") < 43200000000, 0
        )
        .otherwise(1)
        .alias("ev"),
    )
    sup = ud.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("tot"),
    )
    wdesc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = sup.select(
        "dur",
        "d",
        F.sum("tot").over(wdesc).cast("long").alias("n_risk"),
    )
    st = rk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        "n_risk",
        F.round(
            F.lit(1000000.0) * F.col("d") / F.col("n_risk")
        )
        .cast("long")
        .alias("h_mic"),
    )
    return st.select(
        "dur",
        "d",
        "n_risk",
        "h_mic",
        F.sum("h_mic")
        .over(Window.orderBy("dur"))
        .cast("long")
        .alias("ch_mic"),
    ).orderBy("dur")


# ---------------------------------------------------------------------------
# wave 149: D'Agostino-Pearson K^2 omnibus normality test
# ---------------------------------------------------------------------------
_DAGO_BODY = """
    SELECT n, s1, s2, s3, s4,
           round(G1, 6) + 0 AS g1,
           round(G2, 6) + 0 AS g2,
           round(Z1, 6) + 0 AS z1,
           round(Z2, 6) + 0 AS z2,
           CASE WHEN Z1 IS NULL OR Z2 IS NULL THEN NULL
                ELSE round(Z1 * Z1 + Z2 * Z2, 6) + 0 END AS k2
    FROM fin
"""


@q(
    "stat_dagostino",
    """
    WITH base AS (
      SELECT CAST(round(value * 100) AS BIGINT) // 100 AS x
      FROM events WHERE value IS NOT NULL),
    ps AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s1,
             CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS s2,
             CAST(COALESCE(SUM(x * x * x), 0) AS BIGINT) AS s3,
             CAST(COALESCE(SUM(x * x * x * x), 0) AS BIGINT) AS s4
      FROM base),
    mom AS (
      SELECT n, s1, s2, s3, s4,
             CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n
               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
               AS m2,
             CAST(s3 AS DOUBLE) / n
               - 3.0 * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s2 AS DOUBLE) / n)
               + 2.0 * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n) AS m3,
             CAST(s4 AS DOUBLE) / n
               - 4.0 * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s3 AS DOUBLE) / n)
               + 6.0 * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s2 AS DOUBLE) / n)
               - 3.0 * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n) AS m4
      FROM ps),
    g AS (
      SELECT n, s1, s2, s3, s4,
             CASE WHEN n < 20 OR m2 <= 0 THEN NULL
                  ELSE m3 / (sqrt(m2) * m2) END AS G1,
             CASE WHEN n < 20 OR m2 <= 0 THEN NULL
                  ELSE m4 / (m2 * m2) END AS G2
      FROM mom),
    sk AS (
      SELECT *,
             G1 * sqrt((CAST(n AS DOUBLE) + 1.0) * (n + 3.0)
                       / (6.0 * (n - 2.0))) AS Y,
             3.0 * (CAST(n AS DOUBLE) * n + 27.0 * n - 70.0)
               * (n + 1.0) * (n + 3.0)
               / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
               AS beta2
      FROM g),
    sk2 AS (
      SELECT *, sqrt(2.0 * (beta2 - 1.0)) - 1.0 AS w2 FROM sk),
    sk3 AS (
      SELECT *, 1.0 / sqrt(ln(sqrt(w2))) AS delta,
             sqrt(2.0 / (w2 - 1.0)) AS alpha
      FROM sk2),
    z1c AS (
      SELECT n, s1, s2, s3, s4, G1, G2,
             CASE WHEN G1 IS NULL THEN NULL
                  ELSE delta * ln(Y / alpha
                                  + sqrt((Y / alpha) * (Y / alpha)
                                         + 1.0)) END AS Z1
      FROM sk3),
    ku AS (
      SELECT *,
             3.0 * (CAST(n AS DOUBLE) - 1.0) / (n + 1.0) AS eb2,
             24.0 * n * (n - 2.0) * (n - 3.0)
               / ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))
               AS vb2
      FROM z1c),
    ku2 AS (
      SELECT *,
             (G2 - eb2) / sqrt(vb2) AS xx,
             6.0 * (CAST(n AS DOUBLE) * n - 5.0 * n + 2.0)
               / ((n + 7.0) * (n + 9.0))
               * sqrt(6.0 * (n + 3.0) * (n + 5.0)
                      / (CAST(n AS DOUBLE) * (n - 2.0) * (n - 3.0)))
               AS sb1
      FROM ku),
    ku3 AS (
      SELECT *,
             6.0 + 8.0 / sb1 * (2.0 / sb1
                                + sqrt(1.0 + 4.0 / (sb1 * sb1)))
               AS aa
      FROM ku2),
    fin AS (
      SELECT n, s1, s2, s3, s4, G1, G2, Z1,
             CASE WHEN G2 IS NULL THEN NULL
                  ELSE ((1.0 - 2.0 / (9.0 * aa))
                        - cbrt((1.0 - 2.0 / aa)
                               / (1.0 + xx * sqrt(2.0 / (aa - 4.0)))))
                       / sqrt(2.0 / (9.0 * aa)) END AS Z2
      FROM ku3)
"""
    + _DAGO_BODY,
)
def stat_dagostino(spark, sf):
    """D'Agostino-Pearson K^2 omnibus normality test — the
    skewness-AND-kurtosis companion to stat_jarque_bera (JB is the
    asymptotic form; K^2 applies the finite-n normalizing
    transforms, D'Agostino's Z1(sqrt(b1)) and the Anscombe-Glynn
    Z2(b2), so it holds its size at moderate n where JB is badly
    anticonservative). The input collapses to FOUR exact BIGINT
    power sums of integer dollars (skew/kurtosis are location-scale
    invariant, so the div-100 quantization only changes the sample,
    not the validity; dollar^4 sums stay under 2^63 through sf0.1),
    and every downstream step — central moments via the binomial
    identities, both Z transforms with their ln/sqrt/cbrt chains —
    is an embedded FORMULA evaluated in IDENTICAL op order on both
    engines from those integers (the stat_bh_fdr/Acklam
    discipline: simplify ONCE, spell twice). cbrt, not pow(x,1/3):
    the kurtosis kernel goes negative on platykurtic samples and
    pow would NaN where cbrt is defined. The heavy-tailed synthetic
    values are far from normal, so K^2 is pinned LARGE in the
    replay test (scipy-free replay via the same formulas). Guards:
    n < 20 (the transforms' validity floor) and zero variance ->
    NULL. One scan, one 1-row aggregate."""
    base = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.expr(
                "cast(round(value * 100) AS BIGINT) div 100"
            ).alias("x")
        )
    )
    x = F.col("x")
    ps_ = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(x), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(x * x), F.lit(0)).cast("long").alias("s2"),
        F.coalesce(F.sum(x * x * x), F.lit(0))
        .cast("long")
        .alias("s3"),
        F.coalesce(F.sum(x * x * x * x), F.lit(0))
        .cast("long")
        .alias("s4"),
    )
    # ANSI guard (transform chain): every output is gated on n < 20,
    # but the Z-transform constants divide by n(n-2)(n-3) etc. — pin
    # the double n used in the formulas at >= 20 so the gated path
    # can never raise; values for real n >= 20 are unchanged
    n = F.greatest(F.col("n").cast("double"), F.lit(20.0))
    # ANSI guard: with n = 0 (empty corpus) every output is gated on
    # n < 20 below, but Spark still evaluates the shared moment
    # subexpressions — divide by max(n, 1) so the gated path never
    # raises DIVIDE_BY_ZERO (values for n >= 20 are unchanged)
    ns = F.greatest(F.col("n"), F.lit(1))
    mu = F.col("s1").cast("double") / ns
    m2 = F.col("s2").cast("double") / ns - mu * mu
    m3 = (
        F.col("s3").cast("double") / ns
        - F.lit(3.0) * mu * (F.col("s2").cast("double") / ns)
        + F.lit(2.0) * mu * mu * mu
    )
    m4 = (
        F.col("s4").cast("double") / ns
        - F.lit(4.0) * mu * (F.col("s3").cast("double") / ns)
        + F.lit(6.0)
        * mu
        * mu
        * (F.col("s2").cast("double") / ns)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    bad = (F.col("n") < 20) | (m2 <= 0)
    g1 = F.when(bad, F.lit(None).cast("double")).otherwise(
        m3 / (F.sqrt(m2) * m2)
    )
    g2 = F.when(bad, F.lit(None).cast("double")).otherwise(
        m4 / (m2 * m2)
    )
    yv = g1 * F.sqrt(
        (n + F.lit(1.0)) * (n + F.lit(3.0))
        / (F.lit(6.0) * (n - F.lit(2.0)))
    )
    beta2 = (
        F.lit(3.0)
        * (n * n + F.lit(27.0) * n - F.lit(70.0))
        * (n + F.lit(1.0))
        * (n + F.lit(3.0))
        / (
            (n - F.lit(2.0))
            * (n + F.lit(5.0))
            * (n + F.lit(7.0))
            * (n + F.lit(9.0))
        )
    )
    w2 = F.sqrt(F.lit(2.0) * (beta2 - F.lit(1.0))) - F.lit(1.0)
    delta = F.lit(1.0) / F.sqrt(F.log(F.sqrt(w2)))
    alpha = F.sqrt(F.lit(2.0) / (w2 - F.lit(1.0)))
    z1 = delta * F.log(
        yv / alpha + F.sqrt((yv / alpha) * (yv / alpha) + F.lit(1.0))
    )
    eb2 = F.lit(3.0) * (n - F.lit(1.0)) / (n + F.lit(1.0))
    vb2 = (
        F.lit(24.0)
        * n
        * (n - F.lit(2.0))
        * (n - F.lit(3.0))
        / (
            (n + F.lit(1.0))
            * (n + F.lit(1.0))
            * (n + F.lit(3.0))
            * (n + F.lit(5.0))
        )
    )
    xx = (g2 - eb2) / F.sqrt(vb2)
    sb1 = (
        F.lit(6.0)
        * (n * n - F.lit(5.0) * n + F.lit(2.0))
        / ((n + F.lit(7.0)) * (n + F.lit(9.0)))
        * F.sqrt(
            F.lit(6.0)
            * (n + F.lit(3.0))
            * (n + F.lit(5.0))
            / (n * (n - F.lit(2.0)) * (n - F.lit(3.0)))
        )
    )
    aa = F.lit(6.0) + F.lit(8.0) / sb1 * (
        F.lit(2.0) / sb1
        + F.sqrt(F.lit(1.0) + F.lit(4.0) / (sb1 * sb1))
    )
    z2 = (
        (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * aa))
        - F.cbrt(
            (F.lit(1.0) - F.lit(2.0) / aa)
            / (
                F.lit(1.0)
                + xx * F.sqrt(F.lit(2.0) / (aa - F.lit(4.0)))
            )
        )
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * aa))
    return ps_.select(
        "n",
        "s1",
        "s2",
        "s3",
        "s4",
        (F.round(g1, 6) + F.lit(0.0)).alias("g1"),
        (F.round(g2, 6) + F.lit(0.0)).alias("g2"),
        (F.round(z1, 6) + F.lit(0.0)).alias("z1"),
        (F.round(z2, 6) + F.lit(0.0)).alias("z2"),
        F.when(
            z1.isNull() | z2.isNull(), F.lit(None).cast("double")
        )
        .otherwise(F.round(z1 * z1 + z2 * z2, 6) + F.lit(0.0))
        .alias("k2"),
    )


# ---------------------------------------------------------------------------
# wave 151: Lo-MacKinlay variance ratio VR(5) on daily revenue
# ---------------------------------------------------------------------------
@q(
    "stat_variance_ratio",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
               AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) // 100000 AS kd
      FROM orders GROUP BY 1),
    lagd AS (
      SELECT day, kd,
             CAST(MIN(day) OVER () AS BIGINT) AS base,
             LAG(day, 1) OVER (ORDER BY day) AS pd1,
             LAG(kd, 1) OVER (ORDER BY day) AS pk1,
             LAG(day, 5) OVER (ORDER BY day) AS pd5,
             LAG(kd, 5) OVER (ORDER BY day) AS pk5
      FROM daily),
    d1 AS (
      SELECT CAST(kd - pk1 AS BIGINT) AS x FROM lagd
      WHERE pd1 IS NOT NULL AND day - pd1 = 1),
    d5 AS (
      SELECT CAST(kd - pk5 AS BIGINT) AS x FROM lagd
      WHERE pd5 IS NOT NULL AND day - pd5 = 5
        AND (day - base) % 5 = 0),
    m1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s1,
             CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS ss1
      FROM d1),
    m5 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n5,
             CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s5,
             CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS ss5
      FROM d5)
    SELECT n1, n5,
           CASE WHEN n1 < 2 OR n5 < 2
                     OR n1 * ss1 - s1 * s1 <= 0 THEN NULL
                ELSE round(
                  (CAST(n5 * ss5 - s5 * s5 AS DOUBLE)
                   / (CAST(n5 AS DOUBLE) * (n5 - 1)))
                  / (5.0 * (CAST(n1 * ss1 - s1 * s1 AS DOUBLE)
                            / (CAST(n1 AS DOUBLE) * (n1 - 1)))),
                  6) + 0 END AS vr5,
           CASE WHEN n1 < 2 OR n5 < 2
                     OR n1 * ss1 - s1 * s1 <= 0 THEN NULL
                ELSE round(
                  (CAST(n5 * ss5 - s5 * s5 AS DOUBLE)
                   / (CAST(n5 AS DOUBLE) * (n5 - 1)))
                  / (5.0 * (CAST(n1 * ss1 - s1 * s1 AS DOUBLE)
                            / (CAST(n1 AS DOUBLE) * (n1 - 1)))),
                  6) < 0.5 END AS mean_reverting
    FROM m1, m5
    """,
)
def stat_variance_ratio(spark, sf):
    """Lo-MacKinlay variance ratio VR(5) on the daily revenue
    series — the third leg of the unit-root triad (stat_df_unit_root
    rejects a unit root, stat_kpss accepts stationarity; VR says HOW
    the series deviates from a random walk): VR(q) =
    Var(q-day change)/(q * Var(1-day change)). A random walk gives
    exactly 1; iid LEVELS give 1/q (the 1-day change is an MA(1)
    with variance 2*sigma^2 while the q-day change is still just
    2*sigma^2), so the fixture pins vr5 ~ 0.2 and mean_reverting
    TRUE — a trending series would push VR above 1. Five-day
    changes are NON-overlapping ((day - base) % 5 = 0, endpoints 5
    consecutive calendar days apart via the LAG(…,5) + day-gap
    check), so the two variance estimates are independent-sample
    clean. Both variances assemble from exact BIGINT kilodollar
    moments (n*ss - s^2 cross-products, the stat_df_unit_root
    scaling) with the division chain in identical op order.
    One scan, one |days|-sized window chain."""
    daily = (
        t(spark, sf, "orders")
        .groupBy(
            F.expr(
                "unix_micros(cast(o_orderdate AS TIMESTAMP))"
                " div 86400000000"
            ).alias("day")
        )
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) AS BIGINT))"
                " div 100000"
            )
            .cast("long")
            .alias("kd")
        )
    )
    wl = Window.orderBy("day")
    wall = Window.partitionBy()
    lagd = daily.select(
        "day",
        "kd",
        F.min("day").over(wall).cast("long").alias("base"),
        F.lag("day", 1).over(wl).alias("pd1"),
        F.lag("kd", 1).over(wl).alias("pk1"),
        F.lag("day", 5).over(wl).alias("pd5"),
        F.lag("kd", 5).over(wl).alias("pk5"),
    )
    from ..operators.dedup import parquet_checkpoint

    lagd = parquet_checkpoint(lagd, "vr_lagd")
    d1 = lagd.filter(
        F.col("pd1").isNotNull() & (F.col("day") - F.col("pd1") == 1)
    ).select((F.col("kd") - F.col("pk1")).cast("long").alias("x"))
    d5 = lagd.filter(
        F.col("pd5").isNotNull()
        & (F.col("day") - F.col("pd5") == 5)
        & ((F.col("day") - F.col("base")) % 5 == 0)
    ).select((F.col("kd") - F.col("pk5")).cast("long").alias("x"))

    def moms(df, np_, sp_, ssp_):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias(np_),
            F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias(sp_),
            F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0))
            .cast("long")
            .alias(ssp_),
        )

    j = moms(d1, "n1", "s1", "ss1").crossJoin(
        moms(d5, "n5", "s5", "ss5")
    )
    n1, s1, ss1 = F.col("n1"), F.col("s1"), F.col("ss1")
    n5, s5, ss5 = F.col("n5"), F.col("s5"), F.col("ss5")
    a1 = n1 * ss1 - s1 * s1
    a5 = n5 * ss5 - s5 * s5
    bad = (n1 < 2) | (n5 < 2) | (a1 <= 0)
    vr = F.round(
        (a5.cast("double") / (n5.cast("double") * (n5 - 1)))
        / (
            F.lit(5.0)
            * (a1.cast("double") / (n1.cast("double") * (n1 - 1)))
        ),
        6,
    )
    return j.select(
        "n1",
        "n5",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(vr + F.lit(0.0))
        .alias("vr5"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise(vr < F.lit(0.5))
        .alias("mean_reverting"),
    )


# ---------------------------------------------------------------------------
# wave 154: Bartels rank test — rank von Neumann ratio for randomness
# ---------------------------------------------------------------------------
@q(
    "stat_bartels_rank",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
               AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    rk AS (
      SELECT day,
             CAST(2 * RANK() OVER (ORDER BY cents)
                  + COUNT(*) OVER (PARTITION BY cents) - 1
                  AS BIGINT) AS dr,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily),
    df AS (
      SELECT n, dr,
             LEAD(dr) OVER (ORDER BY day) AS nxt
      FROM rk),
    m AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COALESCE(SUM((dr - nxt) * (dr - nxt)), 0)
                  AS BIGINT) AS num,
             CAST(COALESCE(SUM((dr - n - 1) * (dr - n - 1)), 0)
                  AS BIGINT) AS den
      FROM df)
    SELECT n, num, den,
           CASE WHEN den = 0 THEN NULL
                ELSE round(CAST(num AS DOUBLE) / den, 6) + 0
           END AS rvn,
           CASE WHEN den = 0 OR n < 10 THEN NULL
                ELSE round((CAST(num AS DOUBLE) / den - 2.0)
                           / sqrt(4.0 / n), 6) + 0
           END AS z,
           CASE WHEN den = 0 OR n < 10 THEN NULL
                ELSE abs((CAST(num AS DOUBLE) / den - 2.0)
                         / sqrt(4.0 / n)) < 3.0
           END AS random_ok
    FROM m
    """,
)
def stat_bartels_rank(spark, sf):
    """Bartels' rank test of randomness — the rank von Neumann
    ratio RVN = sum (R_t - R_{t+1})^2 / sum (R_t - Rbar)^2 over the
    day-ordered revenue ranks: serial correlation pushes RVN below
    2 (neighbors rank-close), oscillation above 2, iid sits at
    exactly E[RVN] = 2 — the nonparametric complement to
    stat_runs' median-dichotomized runs (runs discards rank
    magnitude; Bartels keeps it) and to stat_durbin_watson (same
    ratio on raw residuals; ranks immunize it against the heavy
    tail). All-integer core: DOUBLED midranks via the
    2*RANK + ties - 2 identity make every rank an exact integer
    even under revenue ties, the doubled mean is exactly n+1 so
    the centered denominator is a pure BIGINT sum, and the lagged
    numerator is one LEAD over the day order. z uses the simple
    asymptotic Var ~ 4/n (the exact 4(n-2)^2... form is a
    consumer-side refinement, games_howell discipline). The iid
    fixture pins |z| < 3; the replay test checks NUM/DEN exactly.
    One scan, one |days|-sized window chain."""
    daily = (
        t(spark, sf, "orders")
        .groupBy(
            F.expr(
                "unix_micros(cast(o_orderdate AS TIMESTAMP))"
                " div 86400000000"
            ).alias("day")
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    rk = daily.select(
        "day",
        (
            2 * F.rank().over(Window.orderBy("cents"))
            + F.count(F.lit(1)).over(Window.partitionBy("cents"))
            - 1
        )
        .cast("long")
        .alias("dr"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    df_ = rk.select(
        "n",
        "dr",
        F.lead("dr").over(Window.orderBy("day")).alias("nxt"),
    )
    from ..operators.dedup import parquet_checkpoint

    df_ = parquet_checkpoint(df_, "bartels_df")
    num = (
        df_.filter(F.col("nxt").isNotNull())
        .agg(
            F.coalesce(
                F.sum(
                    (F.col("dr") - F.col("nxt"))
                    * (F.col("dr") - F.col("nxt"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("num")
        )
    )
    den = df_.agg(
        F.max("n").cast("long").alias("n"),
        F.coalesce(
            F.sum(
                (F.col("dr") - F.col("n") - 1)
                * (F.col("dr") - F.col("n") - 1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("den"),
    )
    j = den.crossJoin(num)
    n, num_c, den_c = F.col("n"), F.col("num"), F.col("den")
    rvn = num_c.cast("double") / den_c
    z = (rvn - F.lit(2.0)) / F.sqrt(F.lit(4.0) / n)
    return j.select(
        n.alias("n"),
        "num",
        "den",
        F.when(den_c == 0, F.lit(None).cast("double"))
        .otherwise(F.round(rvn, 6) + F.lit(0.0))
        .alias("rvn"),
        F.when((den_c == 0) | (n < 10), F.lit(None).cast("double"))
        .otherwise(F.round(z, 6) + F.lit(0.0))
        .alias("z"),
        F.when((den_c == 0) | (n < 10), F.lit(None).cast("boolean"))
        .otherwise(F.abs(z) < F.lit(3.0))
        .alias("random_ok"),
    )


# ---------------------------------------------------------------------------
# wave 157: one-sample Anderson-Darling vs the md5-bucket uniform
# ---------------------------------------------------------------------------
@q(
    "stat_ad_uniform",
    """
    WITH b AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
               ::UBIGINT AS bk
      FROM documents),
    c AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bk),
    e AS (
      SELECT bk, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bk) AS BIGINT) AS k,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM c),
    terms AS (
      SELECT n,
             CAST(round(1000000.0 * (
               cnt * (2 * (k - cnt) + cnt)
                 * ln((bk + 0.5) / 256.0)
               + cnt * (2 * n - 2 * (k - cnt) - cnt)
                 * ln(1.0 - (bk + 0.5) / 256.0))) AS BIGINT)
               AS t_mic
      FROM e)
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(COALESCE(SUM(t_mic), 0) AS BIGINT) AS s_mic,
           CASE WHEN MAX(n) IS NULL OR MAX(n) = 0 THEN NULL
                ELSE round(-CAST(MAX(n) AS DOUBLE)
                           - CAST(SUM(t_mic) AS DOUBLE)
                             / 1000000.0 / MAX(n), 6) + 0
           END AS a2,
           CASE WHEN MAX(n) IS NULL OR MAX(n) = 0 THEN NULL
                ELSE round(-CAST(MAX(n) AS DOUBLE)
                           - CAST(SUM(t_mic) AS DOUBLE)
                             / 1000000.0 / MAX(n), 6) < 3.857
           END AS uniform_ok
    FROM terms
    """,
)
def stat_ad_uniform(spark, sf):
    """One-sample Anderson-Darling A^2 against the md5-bucket
    uniform — completing the uniformity-certificate trio
    (stat_ks_uniform sees the worst single gap, stat_kuiper the
    ring, AD weights the TAILS by 1/(F(1-F)) — the test that
    catches a hash whose extreme buckets misbehave while the bulk
    looks fine): A^2 = -n - (1/n) sum_i (2i-1)[ln F(x_i) +
    ln(1-F(x_{n+1-i}))]. The per-observation (2i-1) weights FOLD
    over each bucket's tie group in closed form — ascending:
    sum = c(2a+c); order-reversed: c(2n-2a-c), with a = cum - c —
    so the whole statistic is one pass over the 256-cell support,
    never the n rows. F uses the MIDPOINT convention (b+0.5)/256
    (the discrete-data standard; the raw right-CDF puts ln(0) on
    the last bucket). Each bucket term micros-quantizes before the
    exact integer sum (kg_adamic_adar); acceptance compares the
    ROUNDED statistic to the fully-specified-null 1% critical
    3.857 (embedded literal), pinned TRUE. One scan, one window
    chain over 256 cells."""
    b = t(spark, sf, "documents").select(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2),
            16,
            10,
        )
        .cast("long")
        .alias("bk")
    )
    c = b.groupBy("bk").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    e = c.select(
        "bk",
        "cnt",
        F.sum("cnt").over(Window.orderBy("bk")).cast("long").alias("k"),
        F.sum("cnt")
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    a = F.col("k") - F.col("cnt")
    fmid = (F.col("bk") + F.lit(0.5)) / F.lit(256.0)
    t_mic = F.round(
        F.lit(1000000.0)
        * (
            F.col("cnt")
            * (2 * a + F.col("cnt"))
            * F.log(fmid)
            + F.col("cnt")
            * (2 * F.col("n") - 2 * a - F.col("cnt"))
            * F.log(F.lit(1.0) - fmid)
        )
    ).cast("long")
    terms = e.select("n", t_mic.alias("t_mic"))
    n = F.max("n")
    a2 = F.round(
        -n.cast("double")
        - F.sum("t_mic").cast("double") / F.lit(1000000.0) / n,
        6,
    )
    bad = n.isNull() | (n == 0)
    return terms.agg(
        n.cast("long").alias("n"),
        F.coalesce(F.sum("t_mic"), F.lit(0))
        .cast("long")
        .alias("s_mic"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(a2 + F.lit(0.0))
        .alias("a2"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise(a2 < F.lit(3.857))
        .alias("uniform_ok"),
    )


# ---------------------------------------------------------------------------
# wave 157: Cucconi location-scale omnibus — squared ranks from both ends
# ---------------------------------------------------------------------------
@q(
    "stat_cucconi",
    """
    WITH lab AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 0 ELSE 1 END AS inb
      FROM events WHERE value IS NOT NULL),
    rk AS (
      SELECT inb,
             CAST(2 * RANK() OVER (ORDER BY v)
                  + COUNT(*) OVER (PARTITION BY v) - 1
                  AS BIGINT) AS dr,
             CAST(SUM(inb) OVER () AS BIGINT) AS m,
             CAST(COUNT(*) OVER () AS BIGINT) AS nn
      FROM lab),
    s AS (
      SELECT CAST(MAX(nn) AS BIGINT) AS nn,
             CAST(MAX(m) AS BIGINT) AS m,
             CAST(COALESCE(SUM(CASE WHEN inb = 1
                                    THEN dr * dr END), 0)
                  AS BIGINT) AS sd2,
             CAST(COALESCE(SUM(CASE WHEN inb = 1
                  THEN (2 * (nn + 1) - dr) * (2 * (nn + 1) - dr)
                  END), 0) AS BIGINT) AS rd2
      FROM rk)
    SELECT nn AS n, m,
           CASE WHEN m = 0 OR nn = m OR nn < 3 THEN NULL
                ELSE round(
                  ((6.0 * sd2 / 4.0 - m * (nn + 1.0) * (2 * nn + 1.0))
                   / sqrt(CAST(m AS DOUBLE) * (nn - m) * (nn + 1.0)
                          * (2 * nn + 1.0) * (8 * nn + 11.0) / 5.0))
                  , 6) + 0 END AS u_stat,
           CASE WHEN m = 0 OR nn = m OR nn < 3 THEN NULL
                ELSE round(
                  ((6.0 * rd2 / 4.0 - m * (nn + 1.0) * (2 * nn + 1.0))
                   / sqrt(CAST(m AS DOUBLE) * (nn - m) * (nn + 1.0)
                          * (2 * nn + 1.0) * (8 * nn + 11.0) / 5.0))
                  , 6) + 0 END AS v_stat,
           CASE WHEN m = 0 OR nn = m OR nn < 3 THEN NULL
                ELSE round(
                  (pow((6.0 * sd2 / 4.0
                        - m * (nn + 1.0) * (2 * nn + 1.0))
                       / sqrt(CAST(m AS DOUBLE) * (nn - m)
                              * (nn + 1.0) * (2 * nn + 1.0)
                              * (8 * nn + 11.0) / 5.0), 2)
                   + pow((6.0 * rd2 / 4.0
                          - m * (nn + 1.0) * (2 * nn + 1.0))
                         / sqrt(CAST(m AS DOUBLE) * (nn - m)
                                * (nn + 1.0) * (2 * nn + 1.0)
                                * (8 * nn + 11.0) / 5.0), 2)
                   - 2.0 * ((2.0 * (CAST(nn AS DOUBLE) * nn - 4.0))
                            / ((2.0 * nn + 3.0) * (8.0 * nn + 11.0))
                            - 1.0)
                     * ((6.0 * sd2 / 4.0
                         - m * (nn + 1.0) * (2 * nn + 1.0))
                        / sqrt(CAST(m AS DOUBLE) * (nn - m)
                               * (nn + 1.0) * (2 * nn + 1.0)
                               * (8 * nn + 11.0) / 5.0))
                     * ((6.0 * rd2 / 4.0
                         - m * (nn + 1.0) * (2 * nn + 1.0))
                        / sqrt(CAST(m AS DOUBLE) * (nn - m)
                               * (nn + 1.0) * (2 * nn + 1.0)
                               * (8 * nn + 11.0) / 5.0)))
                  / (2.0 * (1.0
                     - pow((2.0 * (CAST(nn AS DOUBLE) * nn - 4.0))
                           / ((2.0 * nn + 3.0) * (8.0 * nn + 11.0))
                           - 1.0, 2))), 6) + 0
           END AS c_stat
    FROM s
    """,
)
def stat_cucconi(spark, sf):
    """Cucconi's location-scale omnibus — the OTHER classical
    combined test (stat_lepage adds independent Wilcoxon +
    Ansari-Bradley Z^2s; Cucconi predates it and uses squared ranks
    from BOTH ENDS of the pooled ordering, explicitly modeling
    their negative correlation rho = 2(N^2-4)/((2N+3)(8N+11)) - 1
    in a bivariate quadratic form C = (U^2 + V^2 - 2 rho U V) /
    (2(1 - rho^2))): U standardizes sum S_j^2 (sample-B pooled
    ranks squared), V the same with reflected ranks (N+1-S_j).
    Doubled midranks keep every squared-rank sum an exact BIGINT
    under ties (4*S^2 = dr^2; the /4 happens once, in the DOUBLE
    standardization, identical op order both engines — note the
    textbook no-tie moments are used for standardization, the
    stat_lepage convention, documented rather than hidden). The
    reflected sum needs NO second window: reflected dr is
    2(N+1) - dr. The md5 halves share one distribution, so U, V
    sit in the null bulk and C ~ order 1 (pinned; C's null is
    approximately Exp(1) — P(C > c) = e^-c — so c < 4.6 is the 1%
    acceptance, left to the consumer). One scan, one doubled-rank
    window pass."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("v"),
            F.when(
                F.substring(
                    F.md5(F.col("event_id").cast("string")), 1, 1
                )
                < "8",
                0,
            )
            .otherwise(1)
            .alias("inb"),
        )
    )
    rk = lab.select(
        "inb",
        (
            2 * F.rank().over(Window.orderBy("v"))
            + F.count(F.lit(1)).over(Window.partitionBy("v"))
            - 1
        )
        .cast("long")
        .alias("dr"),
        F.sum("inb").over(Window.partitionBy()).cast("long").alias("m"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("nn"),
    )
    refl = 2 * (F.col("nn") + 1) - F.col("dr")
    s = rk.agg(
        F.max("nn").cast("long").alias("nn"),
        F.max("m").cast("long").alias("m"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("inb") == 1, F.col("dr") * F.col("dr")
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sd2"),
        F.coalesce(
            F.sum(F.when(F.col("inb") == 1, refl * refl)),
            F.lit(0),
        )
        .cast("long")
        .alias("rd2"),
    )
    nn, m = F.col("nn"), F.col("m")
    nnd = nn.cast("double")
    denom = F.sqrt(
        m.cast("double")
        * (nn - m)
        * (nnd + 1.0)
        * (2 * nnd + 1.0)
        * (8 * nnd + 11.0)
        / F.lit(5.0)
    )
    u = (
        F.lit(6.0) * F.col("sd2") / F.lit(4.0)
        - m * (nnd + 1.0) * (2 * nnd + 1.0)
    ) / denom
    v = (
        F.lit(6.0) * F.col("rd2") / F.lit(4.0)
        - m * (nnd + 1.0) * (2 * nnd + 1.0)
    ) / denom
    rho = (F.lit(2.0) * (nnd * nnd - 4.0)) / (
        (F.lit(2.0) * nnd + 3.0) * (F.lit(8.0) * nnd + 11.0)
    ) - F.lit(1.0)
    cst = (
        F.pow(u, 2)
        + F.pow(v, 2)
        - F.lit(2.0) * rho * u * v
    ) / (F.lit(2.0) * (F.lit(1.0) - F.pow(rho, 2)))
    bad = (m == 0) | (nn == m) | (nn < 3)
    return s.select(
        nn.alias("n"),
        "m",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(u, 6) + F.lit(0.0))
        .alias("u_stat"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(v, 6) + F.lit(0.0))
        .alias("v_stat"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(cst, 6) + F.lit(0.0))
        .alias("c_stat"),
    )


# ---------------------------------------------------------------------------
# wave 158: Page-Hinkley online changepoint statistic
# ---------------------------------------------------------------------------
@q(
    "events_page_hinkley",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    cum AS (
      SELECT day, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS cs,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS tt
      FROM daily
      WINDOW w AS (ORDER BY day)),
    dev AS (
      SELECT day,
             CAST(round(1000000.0 * (cents
                        - CAST(cs AS DOUBLE) / tt
                        - 5000.0)) AS BIGINT) AS d_mic
      FROM cum),
    mt AS (
      SELECT day,
             CAST(SUM(d_mic) OVER (ORDER BY day) AS BIGINT) AS m_mic
      FROM dev),
    ph AS (
      SELECT day, m_mic,
             CAST(MIN(m_mic) OVER (ORDER BY day) AS BIGINT)
               AS min_mic
      FROM mt)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(COALESCE(MAX(m_mic - min_mic), 0) AS BIGINT)
             AS ph_mic,
           round(CAST(COALESCE(MAX(m_mic - min_mic), 0) AS DOUBLE)
                 / 100000000.0, 6) + 0 AS ph_dollars,
           COALESCE(MAX(m_mic - min_mic), 0)
             > 5000000000000 AS alarm
    FROM ph
    """,
)
def events_page_hinkley(spark, sf):
    """Page-Hinkley online UPWARD-changepoint statistic on daily
    revenue — the streaming drift detector (river/MOA's default)
    that events_changepoint's CUSUM cannot replace: PH maintains
    m_t = sum_{s<=t}(x_s - xbar_s - delta) against its RUNNING
    MINIMUM, where xbar_s is the mean of everything seen SO FAR
    (the online property — no lookahead, so the statistic at day t
    is exactly what a deployed monitor would have had on day t,
    unlike the offline CUSUM's global mean). Each deviation term
    divides by a DIFFERENT prefix length, so exact cross-
    multiplication is impossible; instead each term micros-
    quantizes in identical op order (kg_adamic_adar) and the two
    window chains (prefix mean -> running sum -> running min) stay
    exact BIGINT from there. delta = $50 daily tolerance and the
    $50k alarm threshold are embedded literals; the trendless
    fixture pins alarm FALSE, and the replay test walks the
    recursion day by day. One scan, one |days|-sized window
    chain."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("day")
    cum = daily.select(
        "day",
        "cents",
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cs"),
        F.row_number().over(w).cast("long").alias("tt"),
    )
    dev = cum.select(
        "day",
        F.round(
            F.lit(1000000.0)
            * (
                F.col("cents")
                - F.col("cs").cast("double") / F.col("tt")
                - F.lit(5000.0)
            )
        )
        .cast("long")
        .alias("d_mic"),
    )
    mt = dev.select(
        "day",
        F.sum("d_mic").over(Window.orderBy("day")).cast("long").alias(
            "m_mic"
        ),
    )
    ph = mt.select(
        "m_mic",
        F.min("m_mic")
        .over(Window.orderBy("day"))
        .cast("long")
        .alias("min_mic"),
    )
    stat = F.coalesce(
        F.max(F.col("m_mic") - F.col("min_mic")), F.lit(0)
    ).cast("long")
    return ph.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        stat.alias("ph_mic"),
        (
            F.round(stat.cast("double") / F.lit(100000000.0), 6)
            + F.lit(0.0)
        ).alias("ph_dollars"),
        (stat > F.lit(5000000000000)).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# wave 158: Allen interval-algebra census over same-day user intervals
# ---------------------------------------------------------------------------
@q(
    "events_allen_relations",
    """
    WITH iv AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(MIN(epoch_us(ts)) AS BIGINT) AS s,
             CAST(MAX(epoch_us(ts)) AS BIGINT) AS e
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id, 2),
    nb AS (
      SELECT day, s, e,
             LEAD(s) OVER w AS s2, LEAD(e) OVER w AS e2
      FROM iv
      WINDOW w AS (PARTITION BY day ORDER BY s, e, user_id)),
    rel AS (
      SELECT CASE
               WHEN e < s2 THEN 'before'
               WHEN e = s2 THEN 'meets'
               WHEN s = s2 AND e = e2 THEN 'equals'
               WHEN s = s2 AND e < e2 THEN 'starts'
               WHEN s = s2 AND e > e2 THEN 'started_by'
               WHEN e = e2 THEN 'finished_by'
               WHEN e > e2 THEN 'contains'
               ELSE 'overlaps'
             END AS rel
      FROM nb WHERE s2 IS NOT NULL)
    SELECT rel, CAST(COUNT(*) AS BIGINT) AS n
    FROM rel GROUP BY rel ORDER BY rel
    """,
)
def events_allen_relations(spark, sf):
    """Allen interval-algebra census — classify each pair of
    ADJACENT same-day user activity intervals (sorted by start)
    into Allen's relations: before / meets / overlaps / starts /
    started_by / finished_by / contains / equals. The full 13-
    relation matrix over all pairs is quadratic; sorting by start
    and classifying only CONSECUTIVE pairs is the linear census a
    concurrency monitor actually needs (it is exactly the
    information a merge-sweep consumes, and `during`/`finishes`/
    inverse-`overlaps` cannot occur between start-sorted neighbors
    — the absent categories are themselves the sort-order
    certificate, pinned in tests). The start-sort tiebreak (s, e,
    user_id) is total, so the neighbor pairing and therefore the
    census is engine-unique; every comparison is exact epoch-us
    BIGINTs. One scan to per-(user, day) intervals, one
    LEAD window partitioned by day — at 100 TB the window shards
    by day with bounded partitions."""
    iv = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy(
            "user_id",
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
        )
        .agg(
            F.min(
                F.expr("unix_micros(cast(ts AS TIMESTAMP))")
            )
            .cast("long")
            .alias("s"),
            F.max(
                F.expr("unix_micros(cast(ts AS TIMESTAMP))")
            )
            .cast("long")
            .alias("e"),
        )
    )
    w = Window.partitionBy("day").orderBy("s", "e", "user_id")
    nb = iv.select(
        "day",
        "s",
        "e",
        F.lead("s").over(w).alias("s2"),
        F.lead("e").over(w).alias("e2"),
    ).filter(F.col("s2").isNotNull())
    s, e, s2, e2 = (
        F.col("s"),
        F.col("e"),
        F.col("s2"),
        F.col("e2"),
    )
    rel = (
        F.when(e < s2, "before")
        .when(e == s2, "meets")
        .when((s == s2) & (e == e2), "equals")
        .when((s == s2) & (e < e2), "starts")
        .when((s == s2) & (e > e2), "started_by")
        .when(e == e2, "finished_by")
        .when(e > e2, "contains")
        .otherwise("overlaps")
    )
    return (
        nb.select(rel.alias("rel"))
        .groupBy("rel")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("rel")
    )


# ---------------------------------------------------------------------------
# wave 159: Fano factor — daily-count dispersion vs the Poisson null
# ---------------------------------------------------------------------------
@q(
    "events_fano",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(c), 0) AS BIGINT) AS s1,
             CAST(COALESCE(SUM(c * c), 0) AS BIGINT) AS s2
      FROM daily)
    SELECT n, s1, s2,
           CASE WHEN n < 2 OR s1 = 0 THEN NULL
                ELSE round(CAST(n * s2 - s1 * s1 AS DOUBLE)
                           / (CAST(n AS DOUBLE) - 1.0) / s1, 6) + 0
           END AS fano,
           CASE WHEN n < 2 OR s1 = 0 THEN NULL
                ELSE abs(CAST(n * s2 - s1 * s1 AS DOUBLE)
                         / (CAST(n AS DOUBLE) - 1.0) / s1 - 1.0)
                     < 3.0 * sqrt(2.0 / (n - 1.0))
           END AS poisson_ok
    FROM m
    """,
)
def events_fano(spark, sf):
    """Fano factor of the daily event counts — the COUNT-dispersion
    companion to events_burstiness (which measures GAP dispersion):
    F = Var(N)/E(N) over day windows. A Poisson arrival process
    gives exactly 1; clustering/contagion pushes it above
    (overdispersion — the signature of crawl storms, retry loops,
    batch upstream writers), suppressed/regular arrival below. The
    variance assembles from two exact BIGINT power sums
    cross-multiplied ((n*s2 - s1^2)/(n-1), then /mean — note
    Var/mean = (n*s2 - s1^2)/((n-1)*s1) needs ONE double division
    chain in identical op order; the integers are exact through
    sf1 since daily counts are ~1e6). Under the Poisson null
    (n-1)*F ~ chi2(n-1), so sd(F) ~ sqrt(2/(n-1)) and the
    acceptance band is the embedded 3-sigma literal; the
    iid-sampled fixture pins poisson_ok TRUE. One scan to the
    |days| relation, one 1-row fold — the cheapest drift gate in
    the battery, which is the point: run it every day."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    fano = (
        (n * s2 - s1 * s1).cast("double")
        / (n.cast("double") - F.lit(1.0))
        / s1
    )
    bad = (n < 2) | (s1 == 0)
    return m.select(
        "n",
        "s1",
        "s2",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(fano, 6) + F.lit(0.0))
        .alias("fano"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise(
            F.abs(fano - F.lit(1.0))
            < F.lit(3.0) * F.sqrt(F.lit(2.0) / (n - F.lit(1.0)))
        )
        .alias("poisson_ok"),
    )


# ---------------------------------------------------------------------------
# wave 161: one-sample Cramer-von Mises vs the md5-bucket uniform
# ---------------------------------------------------------------------------
@q(
    "stat_cvm_uniform",
    """
    WITH b AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
               ::UBIGINT AS bk
      FROM documents),
    c AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bk),
    e AS (
      SELECT bk, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bk) AS BIGINT) AS k,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM c),
    terms AS (
      SELECT n,
             CAST(round(1000000.0 * (
               cnt * ((bk + 0.5) / 256.0) * ((bk + 0.5) / 256.0)
               - ((bk + 0.5) / 256.0)
                 * (cnt * (2.0 * (k - cnt) + cnt)) / n
               + (CAST(k * (2 * k - 1) AS DOUBLE) * (2 * k + 1)
                  - CAST((k - cnt) * (2 * (k - cnt) - 1) AS DOUBLE)
                    * (2 * (k - cnt) + 1))
                 / 3.0 / (4.0 * n * n))) AS BIGINT) AS t_mic
      FROM e)
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(COALESCE(SUM(t_mic), 0) AS BIGINT) AS s_mic,
           CASE WHEN MAX(n) IS NULL OR MAX(n) = 0 THEN NULL
                ELSE round(1.0 / (12.0 * MAX(n))
                           + CAST(SUM(t_mic) AS DOUBLE) / 1000000.0,
                           6) + 0 END AS w2,
           CASE WHEN MAX(n) IS NULL OR MAX(n) = 0 THEN NULL
                ELSE round(1.0 / (12.0 * MAX(n))
                           + CAST(SUM(t_mic) AS DOUBLE) / 1000000.0,
                           6) < 0.743
           END AS uniform_ok
    FROM terms
    """,
)
def stat_cvm_uniform(spark, sf):
    """One-sample Cramer-von Mises W^2 against the md5-bucket
    uniform — the fourth leg of the uniformity battery (KS = worst
    gap, Kuiper = ring, AD = tails, CvM = mean-square over the
    WHOLE range — the one most sensitive to broad low-amplitude
    drift): W^2 = 1/(12n) + sum_i (F(x_i) - (2i-1)/(2n))^2. The
    per-observation term varies WITHIN a tie group (same F,
    different i), but the group sum folds in closed form:
    expanding the square leaves sum(2i-1) = c(2a+c) and
    sum(2i-1)^2 = S(a+c) - S(a) with S(m) = m(2m-1)(2m+1)/3 — the
    odd-square prefix identity, all exact BIGINTs from the same
    256-cell cumulative the KS/Kuiper/AD faces use, so the n-row
    sum never materializes. Midpoint F (the AD convention); each
    bucket term micros-quantizes in identical op order before the
    exact sum; acceptance at the fully-specified-null 1% critical
    0.743 (embedded literal), pinned TRUE. One scan, one window
    over 256 cells."""
    b = t(spark, sf, "documents").select(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2),
            16,
            10,
        )
        .cast("long")
        .alias("bk")
    )
    c = b.groupBy("bk").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    e = c.select(
        "bk",
        "cnt",
        F.sum("cnt").over(Window.orderBy("bk")).cast("long").alias("k"),
        F.sum("cnt")
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    a = F.col("k") - F.col("cnt")
    fm = (F.col("bk") + F.lit(0.5)) / F.lit(256.0)
    n_col = F.col("n")
    odd_sq_hi = (
        F.col("k").cast("double")
        * (2 * F.col("k") - 1)
        * (2 * F.col("k") + 1)
    )
    odd_sq_lo = a.cast("double") * (2 * a - 1) * (2 * a + 1)
    t_mic = F.round(
        F.lit(1000000.0)
        * (
            F.col("cnt") * fm * fm
            - fm
            * (
                F.col("cnt").cast("double")
                * (F.lit(2.0) * a + F.col("cnt"))
            )
            / n_col
            + (odd_sq_hi - odd_sq_lo)
            / F.lit(3.0)
            / (F.lit(4.0) * n_col * n_col)
        )
    ).cast("long")
    terms = e.select("n", t_mic.alias("t_mic"))
    n = F.max("n")
    w2 = F.round(
        F.lit(1.0) / (F.lit(12.0) * n)
        + F.sum("t_mic").cast("double") / F.lit(1000000.0),
        6,
    )
    bad = n.isNull() | (n == 0)
    return terms.agg(
        n.cast("long").alias("n"),
        F.coalesce(F.sum("t_mic"), F.lit(0))
        .cast("long")
        .alias("s_mic"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(w2 + F.lit(0.0))
        .alias("w2"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise(w2 < F.lit(0.743))
        .alias("uniform_ok"),
    )


# ---------------------------------------------------------------------------
# wave 161: winsorized Pearson correlation — robust daily revenue-vs-count
# ---------------------------------------------------------------------------
@q(
    "stat_winsorized_corr",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    cx AS (
      SELECT day, x, y,
             CAST(ROW_NUMBER() OVER (ORDER BY x, day) AS BIGINT)
               AS rx,
             CAST(ROW_NUMBER() OVER (ORDER BY y, day) AS BIGINT)
               AS ry,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily),
    cuts AS (
      SELECT MAX(CASE WHEN 10 * rx <= n THEN x END) AS lo_x,
             MIN(CASE WHEN 10 * rx >= 9 * n THEN x END) AS hi_x,
             MAX(CASE WHEN 10 * ry <= n THEN y END) AS lo_y,
             MIN(CASE WHEN 10 * ry >= 9 * n THEN y END) AS hi_y
      FROM cx),
    wz AS (
      SELECT LEAST(GREATEST(c.x, COALESCE(u.lo_x, c.x)),
                   COALESCE(u.hi_x, c.x)) AS wx,
             LEAST(GREATEST(c.y, COALESCE(u.lo_y, c.y)),
                   COALESCE(u.hi_y, c.y)) AS wy
      FROM cx c CROSS JOIN cuts u),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(wx), 0) AS BIGINT) AS sx,
             CAST(COALESCE(SUM(wy), 0) AS BIGINT) AS sy,
             CAST(COALESCE(SUM(wx * wy), 0) AS BIGINT) AS sxy,
             CAST(COALESCE(SUM(wx * wx), 0) AS BIGINT) AS sxx,
             CAST(COALESCE(SUM(wy * wy), 0) AS BIGINT) AS syy
      FROM wz)
    SELECT n,
           CASE WHEN n < 2
                     OR CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx <= 0
                     OR CAST(n AS DOUBLE) * syy
                        - CAST(sy AS DOUBLE) * sy <= 0 THEN NULL
                ELSE round(
                  (CAST(n AS DOUBLE) * sxy
                   - CAST(sx AS DOUBLE) * sy)
                  / sqrt(CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                  / sqrt(CAST(n AS DOUBLE) * syy
                         - CAST(sy AS DOUBLE) * sy), 6) + 0
           END AS r_winsorized
    FROM m
    """,
)
def stat_winsorized_corr(spark, sf):
    """Winsorized Pearson correlation between daily revenue and
    daily event count — the robust middle ground between raw
    Pearson (one storm day owns the slope) and Spearman (rank-only
    discards magnitude): both margins clip to their own [P10, P90]
    before the ordinary product-moment formula. The cuts are exact
    ORDER STATISTICS via the 10*rank-vs-n cross-multiplied rule
    over the day-ordered row numbers (total order via the day
    tiebreak; the agg_winsorized_mean discipline on a PAIRED
    relation — clipping must happen per margin but on the SAME
    rows, so the cuts attach as a 1-row cross join, never a
    re-sort). Winsorized values stay exact BIGINTs (cents x
    counts products are ~1e8*1e3 per day — safe through sf1), the
    correlation assembles from five exact cross-multiplied
    moments in one identical double chain. Revenue = value *
    count per day means the two margins are strongly positively
    dependent: r > 0.5 is pinned, and the replay test clips by
    hand. One scan, one |days|-sized window chain, one 1-row
    attach."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("x"),
            F.count(F.lit(1)).cast("long").alias("y"),
        )
    )
    from ..operators.dedup import parquet_checkpoint

    cx = parquet_checkpoint(
        daily.select(
            "day",
            "x",
            "y",
            F.row_number()
            .over(Window.orderBy("x", "day"))
            .cast("long")
            .alias("rx"),
            F.row_number()
            .over(Window.orderBy("y", "day"))
            .cast("long")
            .alias("ry"),
            F.count(F.lit(1))
            .over(Window.partitionBy())
            .cast("long")
            .alias("n"),
        ),
        "wcorr_cx",
    )
    cuts = cx.agg(
        F.max(
            F.when(10 * F.col("rx") <= F.col("n"), F.col("x"))
        ).alias("lo_x"),
        F.min(
            F.when(10 * F.col("rx") >= 9 * F.col("n"), F.col("x"))
        ).alias("hi_x"),
        F.max(
            F.when(10 * F.col("ry") <= F.col("n"), F.col("y"))
        ).alias("lo_y"),
        F.min(
            F.when(10 * F.col("ry") >= 9 * F.col("n"), F.col("y"))
        ).alias("hi_y"),
    )
    wz = cx.crossJoin(cuts).select(
        F.least(
            F.greatest(
                F.col("x"), F.coalesce(F.col("lo_x"), F.col("x"))
            ),
            F.coalesce(F.col("hi_x"), F.col("x")),
        ).alias("wx"),
        F.least(
            F.greatest(
                F.col("y"), F.coalesce(F.col("lo_y"), F.col("y"))
            ),
            F.coalesce(F.col("hi_y"), F.col("y")),
        ).alias("wy"),
    )
    m = wz.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("wx"), F.lit(0)).cast("long").alias("sx"),
        F.coalesce(F.sum("wy"), F.lit(0)).cast("long").alias("sy"),
        F.coalesce(F.sum(F.col("wx") * F.col("wy")), F.lit(0))
        .cast("long")
        .alias("sxy"),
        F.coalesce(F.sum(F.col("wx") * F.col("wx")), F.lit(0))
        .cast("long")
        .alias("sxx"),
        F.coalesce(F.sum(F.col("wy") * F.col("wy")), F.lit(0))
        .cast("long")
        .alias("syy"),
    )
    n = F.col("n")
    vx = n.cast("double") * F.col("sxx") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    vy = n.cast("double") * F.col("syy") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    cov = n.cast("double") * F.col("sxy") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    bad = (n < 2) | (vx <= 0) | (vy <= 0)
    return m.select(
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(cov / F.sqrt(vx) / F.sqrt(vy), 6) + F.lit(0.0)
        )
        .alias("r_winsorized"),
    )


# ---------------------------------------------------------------------------
# wave 162: Cochrane-Orcutt AR(1)-corrected trend regression
# ---------------------------------------------------------------------------
@q(
    "stat_cochrane_orcutt",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
               AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) // 100000 AS kd
      FROM orders GROUP BY 1),
    ix AS (
      SELECT kd,
             CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
               AS x,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily),
    m1 AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx,
             CAST(COALESCE(SUM(kd), 0) AS BIGINT) AS sy,
             CAST(COALESCE(SUM(x * kd), 0) AS BIGINT) AS sxy,
             CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS sxx
      FROM ix),
    ols AS (
      SELECT n,
             round(CAST(n * sxy - sx * sy AS DOUBLE)
                   / (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx), 6) AS b1,
             round((CAST(sy AS DOUBLE)
                    - CAST(n * sxy - sx * sy AS DOUBLE)
                      / (CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx) * sx) / n, 6)
               AS a1
      FROM m1 WHERE n >= 3),
    res AS (
      SELECT i.x,
             CAST(round(1000000.0 * (i.kd - o.a1 - o.b1 * i.x))
                  AS BIGINT) AS e_mic,
             LAG(CAST(round(1000000.0 * (i.kd - o.a1 - o.b1 * i.x))
                      AS BIGINT)) OVER (ORDER BY i.x) AS pe_mic,
             i.kd,
             LAG(i.kd) OVER (ORDER BY i.x) AS pkd,
             LAG(i.x) OVER (ORDER BY i.x) AS px
      FROM ix i CROSS JOIN ols o),
    rh AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN pe_mic IS NOT NULL THEN
               CAST(round(CAST(e_mic AS DOUBLE) * pe_mic
                          / 1000000000000.0) AS BIGINT) END), 0)
               AS BIGINT) AS s01,
             CAST(COALESCE(SUM(CASE WHEN pe_mic IS NOT NULL THEN
               CAST(round(CAST(pe_mic AS DOUBLE) * pe_mic
                          / 1000000000000.0) AS BIGINT) END), 0)
               AS BIGINT) AS s00
      FROM res),
    rho AS (
      SELECT CASE WHEN s00 = 0 THEN 0.0
                  ELSE round(CAST(s01 AS DOUBLE) / s00, 6)
             END AS r
      FROM rh),
    q AS (
      SELECT CAST(round(1000000.0 * (kd - rho.r * pkd)) AS BIGINT)
               AS ys,
             CAST(round(1000000.0 * (x - rho.r * px)) AS BIGINT)
               AS xs
      FROM res CROSS JOIN rho WHERE pkd IS NOT NULL),
    m2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n2,
             CAST(COALESCE(SUM(CAST(round(CAST(xs AS DOUBLE) * ys
                        / 1000000000000.0 * 1000.0) AS BIGINT)), 0)
               AS BIGINT) AS sxy_m,
             CAST(COALESCE(SUM(CAST(round(CAST(xs AS DOUBLE) * xs
                        / 1000000000000.0 * 1000.0) AS BIGINT)), 0)
               AS BIGINT) AS sxx_m,
             CAST(COALESCE(SUM(xs), 0) AS BIGINT) AS sxs,
             CAST(COALESCE(SUM(ys), 0) AS BIGINT) AS sys
      FROM q)
    SELECT o.n, rho.r AS rho, o.b1 AS b_ols,
           CASE WHEN m2.n2 < 3
                     OR CAST(m2.n2 AS DOUBLE) * m2.sxx_m * 1000000000.0
                        - CAST(m2.sxs AS DOUBLE) * m2.sxs <= 0
                THEN NULL
                ELSE round(
                  (CAST(m2.n2 AS DOUBLE) * m2.sxy_m * 1000000000.0
                   - CAST(m2.sxs AS DOUBLE) * m2.sys)
                  / (CAST(m2.n2 AS DOUBLE) * m2.sxx_m * 1000000000.0
                     - CAST(m2.sxs AS DOUBLE) * m2.sxs), 6) + 0
           END AS b_co
    FROM ols o, rho, m2
    """,
)
def stat_cochrane_orcutt(spark, sf):
    """Cochrane-Orcutt AR(1)-corrected trend slope on daily revenue
    — the fix for the serial-correlation problem stat_durbin_watson
    DETECTS (autocorrelated errors leave OLS slopes unbiased but
    their t-tests wildly overconfident; CO re-estimates on quasi-
    differences y_t - rho*y_{t-1}): step 1 OLS from exact integer
    moments (kilodollars, day index), coefficients ROUNDED TO 6 on
    both engines before any residual is formed (the rounding IS the
    cross-engine contract — unrounded a/b differ in the last ulp
    and every residual would inherit it); step 2 residual lag-1
    autocorrelation with per-term quantized products (e_mic *
    pe_mic / 1e12 rounded per ROW, then exact integer sums — sums
    of raw doubles are partition-order-dependent, the recurring
    lesson); rho rounded to 6; step 3 the quasi-differenced
    regression with the same per-term product quantization (xs*ys
    at milli resolution). The trendless fixture pins |b_ols| and
    |b_co| both small and |rho| in the null bulk; the replay test
    walks all three steps. Three window passes over the |days|
    relation, one scan of the corpus."""
    daily = (
        t(spark, sf, "orders")
        .groupBy(
            F.expr(
                "unix_micros(cast(o_orderdate AS TIMESTAMP))"
                " div 86400000000"
            ).alias("day")
        )
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) AS BIGINT))"
                " div 100000"
            )
            .cast("long")
            .alias("kd")
        )
    )
    from ..operators.dedup import parquet_checkpoint

    ix = parquet_checkpoint(
        daily.select(
            "kd",
            (F.row_number().over(Window.orderBy("day")) - 1)
            .cast("long")
            .alias("x"),
            F.count(F.lit(1))
            .over(Window.partitionBy())
            .cast("long")
            .alias("n"),
        ),
        "co_ix",
    )
    m1 = ix.agg(
        F.max("n").cast("long").alias("n"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("sx"),
        F.coalesce(F.sum("kd"), F.lit(0)).cast("long").alias("sy"),
        F.coalesce(F.sum(F.col("x") * F.col("kd")), F.lit(0))
        .cast("long")
        .alias("sxy"),
        F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0))
        .cast("long")
        .alias("sxx"),
    ).filter(F.col("n") >= 3)
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    b1 = F.round(
        (n * sxy - sx * sy).cast("double")
        / (n.cast("double") * sxx - sx.cast("double") * sx),
        6,
    )
    a1 = F.round(
        (
            sy.cast("double")
            - (n * sxy - sx * sy).cast("double")
            / (n.cast("double") * sxx - sx.cast("double") * sx)
            * sx
        )
        / n,
        6,
    )
    ols = m1.select(n.alias("n"), b1.alias("b1"), a1.alias("a1"))
    e_mic = F.round(
        F.lit(1000000.0)
        * (F.col("kd") - F.col("a1") - F.col("b1") * F.col("x"))
    ).cast("long")
    res = parquet_checkpoint(
        ix.select("kd", "x").crossJoin(ols).select(
            "x",
            "kd",
            e_mic.alias("e_mic"),
            F.lag(e_mic).over(Window.orderBy("x")).alias("pe_mic"),
            F.lag("kd").over(Window.orderBy("x")).alias("pkd"),
            F.lag("x").over(Window.orderBy("x")).alias("px"),
        ),
        "co_res",
    )
    rh = res.filter(F.col("pe_mic").isNotNull()).agg(
        F.coalesce(
            F.sum(
                F.round(
                    F.col("e_mic").cast("double")
                    * F.col("pe_mic")
                    / F.lit(1000000000000.0)
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("s01"),
        F.coalesce(
            F.sum(
                F.round(
                    F.col("pe_mic").cast("double")
                    * F.col("pe_mic")
                    / F.lit(1000000000000.0)
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("s00"),
    )
    rho = rh.select(
        F.when(F.col("s00") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.col("s01").cast("double") / F.col("s00"), 6
            )
        )
        .alias("r")
    )
    q_ = res.crossJoin(rho).filter(F.col("pkd").isNotNull()).select(
        F.round(
            F.lit(1000000.0)
            * (F.col("kd") - F.col("r") * F.col("pkd"))
        )
        .cast("long")
        .alias("ys"),
        F.round(
            F.lit(1000000.0)
            * (F.col("x") - F.col("r") * F.col("px"))
        )
        .cast("long")
        .alias("xs"),
    )
    m2 = q_.agg(
        F.count(F.lit(1)).cast("long").alias("n2"),
        F.coalesce(
            F.sum(
                F.round(
                    F.col("xs").cast("double")
                    * F.col("ys")
                    / F.lit(1000000000000.0)
                    * F.lit(1000.0)
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sxy_m"),
        F.coalesce(
            F.sum(
                F.round(
                    F.col("xs").cast("double")
                    * F.col("xs")
                    / F.lit(1000000000000.0)
                    * F.lit(1000.0)
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sxx_m"),
        F.coalesce(F.sum("xs"), F.lit(0)).cast("long").alias("sxs"),
        F.coalesce(F.sum("ys"), F.lit(0)).cast("long").alias("sys"),
    )
    j = ols.crossJoin(rho).crossJoin(m2)
    n2 = F.col("n2")
    vx = (
        n2.cast("double") * F.col("sxx_m") * F.lit(1000000000.0)
        - F.col("sxs").cast("double") * F.col("sxs")
    )
    cov = (
        n2.cast("double") * F.col("sxy_m") * F.lit(1000000000.0)
        - F.col("sxs").cast("double") * F.col("sys")
    )
    return j.select(
        "n",
        F.col("r").alias("rho"),
        F.col("b1").alias("b_ols"),
        F.when((n2 < 3) | (vx <= 0), F.lit(None).cast("double"))
        .otherwise(F.round(cov / vx, 6) + F.lit(0.0))
        .alias("b_co"),
    )


# ---------------------------------------------------------------------------
# wave 165: turning-points (Wallis-Moore) randomness test
# ---------------------------------------------------------------------------
@q(
    "stat_turning_points",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
               AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    w AS (
      SELECT cents,
             LAG(cents) OVER (ORDER BY day) AS prv,
             LEAD(cents) OVER (ORDER BY day) AS nxt,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily),
    tp AS (
      SELECT n,
             CASE WHEN prv IS NOT NULL AND nxt IS NOT NULL
                       AND ((cents > prv AND cents > nxt)
                            OR (cents < prv AND cents < nxt))
                  THEN 1 ELSE 0 END AS is_tp
      FROM w)
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(COALESCE(SUM(is_tp), 0) AS BIGINT) AS n_turning,
           CASE WHEN MAX(n) < 4 THEN NULL
                ELSE round((COALESCE(SUM(is_tp), 0)
                            - 2.0 * (MAX(n) - 2) / 3.0)
                           / sqrt((16.0 * MAX(n) - 29.0) / 90.0),
                           6) + 0 END AS z,
           CASE WHEN MAX(n) < 4 THEN NULL
                ELSE abs((COALESCE(SUM(is_tp), 0)
                          - 2.0 * (MAX(n) - 2) / 3.0)
                         / sqrt((16.0 * MAX(n) - 29.0) / 90.0))
                     < 3.0 END AS random_ok
    FROM tp
    """,
)
def stat_turning_points(spark, sf):
    """Turning-points (Wallis-Moore) randomness test on daily
    revenue — the third member of the randomness battery
    (stat_runs dichotomizes at the median and sees LEVEL
    clustering; stat_bartels_rank sees rank-serial correlation;
    turning points count local extrema and see SMOOTHNESS: a
    slowly-drifting series has too few turns, an oscillating one
    too many). A day is a turning point iff it is a strict local
    max or min among its two neighbors — three exact BIGINT
    comparisons per interior day from one LAG/LEAD window. Under
    iid, E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90 (embedded
    closed forms, identical op order); the iid fixture pins |z| <
    3. Ties between neighbors count as non-turning (strict
    inequalities — spelled identically on both engines, the
    convention documented rather than left to engine default).
    One scan, one |days|-sized window."""
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
    w = Window.orderBy("day")
    lab = daily.select(
        "cents",
        F.lag("cents").over(w).alias("prv"),
        F.lead("cents").over(w).alias("nxt"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    is_tp = F.when(
        F.col("prv").isNotNull()
        & F.col("nxt").isNotNull()
        & (
            (
                (F.col("cents") > F.col("prv"))
                & (F.col("cents") > F.col("nxt"))
            )
            | (
                (F.col("cents") < F.col("prv"))
                & (F.col("cents") < F.col("nxt"))
            )
        ),
        1,
    ).otherwise(0)
    tp = lab.select("n", is_tp.alias("is_tp"))
    n = F.max("n")
    t_cnt = F.coalesce(F.sum("is_tp"), F.lit(0))
    z = (
        t_cnt - F.lit(2.0) * (n - 2) / F.lit(3.0)
    ) / F.sqrt((F.lit(16.0) * n - F.lit(29.0)) / F.lit(90.0))
    return tp.agg(
        n.cast("long").alias("n"),
        t_cnt.cast("long").alias("n_turning"),
        F.when(n < 4, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6) + F.lit(0.0))
        .alias("z"),
        F.when(n < 4, F.lit(None).cast("boolean"))
        .otherwise(F.abs(z) < F.lit(3.0))
        .alias("random_ok"),
    )


# ---------------------------------------------------------------------------
# wave 165: Tukey median polish — two unrolled sweeps on the day x type grid
# ---------------------------------------------------------------------------
@q(
    "stat_median_polish",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             event_type,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
           FROM daily),
    fb AS (
      SELECT day FROM daily GROUP BY day
      HAVING COUNT(*) = (SELECT k FROM kk)),
    g0 AS (SELECT d.day, d.event_type, d.v
           FROM daily d JOIN fb USING (day)),
    rm1 AS (
      SELECT day, MIN(CASE WHEN 2 * rn >= cnt THEN v END) AS m
      FROM (SELECT day, v,
                   ROW_NUMBER() OVER (PARTITION BY day
                     ORDER BY v, event_type) AS rn,
                   COUNT(*) OVER (PARTITION BY day) AS cnt
            FROM g0) z GROUP BY day),
    g1 AS (SELECT g.day, g.event_type, CAST(g.v - r.m AS BIGINT) AS v
           FROM g0 g JOIN rm1 r USING (day)),
    cm1 AS (
      SELECT event_type, MIN(CASE WHEN 2 * rn >= cnt THEN v END) AS m
      FROM (SELECT event_type, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY v, day) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS cnt
            FROM g1) z GROUP BY event_type),
    g2 AS (SELECT g.day, g.event_type, CAST(g.v - c.m AS BIGINT) AS v
           FROM g1 g JOIN cm1 c USING (event_type)),
    rm2 AS (
      SELECT day, MIN(CASE WHEN 2 * rn >= cnt THEN v END) AS m
      FROM (SELECT day, v,
                   ROW_NUMBER() OVER (PARTITION BY day
                     ORDER BY v, event_type) AS rn,
                   COUNT(*) OVER (PARTITION BY day) AS cnt
            FROM g2) z GROUP BY day),
    g3 AS (SELECT g.day, g.event_type, CAST(g.v - r.m AS BIGINT) AS v
           FROM g2 g JOIN rm2 r USING (day)),
    cm2 AS (
      SELECT event_type, MIN(CASE WHEN 2 * rn >= cnt THEN v END) AS m
      FROM (SELECT event_type, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY v, day) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS cnt
            FROM g3) z GROUP BY event_type),
    g4 AS (SELECT g.day, g.event_type, CAST(g.v - c.m AS BIGINT) AS v
           FROM g3 g JOIN cm2 c USING (event_type)),
    res AS (
      SELECT CAST(COALESCE(SUM(abs(v)), 0) AS BIGINT) AS resid_abs,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM g4)
    SELECT c1.event_type,
           CAST(c1.m + c2.m AS BIGINT) AS col_effect,
           r.resid_abs, r.n_cells
    FROM cm1 c1 JOIN cm2 c2 USING (event_type)
    CROSS JOIN res r
    ORDER BY c1.event_type
    """,
)
def stat_median_polish(spark, sf):
    """Tukey MEDIAN POLISH of the day x type revenue grid — the
    robust two-way decomposition (value = overall + row effect +
    column effect + residual, fitted by MEDIANS instead of means,
    so one storm day perturbs its own row effect and nothing
    else — the robust sibling of what stat_anova's mean
    decomposition does): two full sweeps, each sweep subtracting
    row medians then column medians, unrolled exactly like the
    kg_labelprop / embed_kmeans two-round discipline. Every median
    is the exact LOWER median of integers (2*rn >= cnt over a
    (value, tiebreak) total order — no interpolation, no floats
    anywhere in the pipeline), so every intermediate grid is exact
    BIGINT dollars and the final per-type column effects and the
    absolute-residual mass are exact integers. Complete-block days
    only (the stat_friedman panel). The replay test runs the same
    two sweeps in Python and pins the sweep-2 effects being much
    smaller than sweep-1's (convergence evidence). Scale: the grid
    is calendar x types; four median passes are four bounded
    windows + four map-side joins."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = e.groupBy(
        F.expr(
            "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
        "event_type",
    ).agg(
        F.expr("sum(cast(round(value * 100) AS BIGINT)) div 100")
        .cast("long")
        .alias("v")
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "mp_daily")
    kk = daily.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    fb = (
        daily.groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(kk)
        .filter(F.col("cnt") == F.col("k"))
        .select("day")
    )
    g0 = daily.join(fb, "day").select("day", "event_type", "v")

    def med(df, part, order_tb):
        z = df.select(
            part,
            "v",
            F.row_number()
            .over(
                Window.partitionBy(part).orderBy("v", order_tb)
            )
            .alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy(part))
            .alias("cnt"),
        )
        return z.groupBy(part).agg(
            F.min(
                F.when(2 * F.col("rn") >= F.col("cnt"), F.col("v"))
            ).alias("m")
        )

    g0 = parquet_checkpoint(g0, "mp_g0")
    rm1 = med(g0, "day", "event_type")
    g1 = parquet_checkpoint(
        g0.join(rm1, "day").select(
            "day",
            "event_type",
            (F.col("v") - F.col("m")).cast("long").alias("v"),
        ),
        "mp_g1",
    )
    cm1 = med(g1, "event_type", "day")
    g2 = parquet_checkpoint(
        g1.join(cm1, "event_type").select(
            "day",
            "event_type",
            (F.col("v") - F.col("m")).cast("long").alias("v"),
        ),
        "mp_g2",
    )
    rm2 = med(g2, "day", "event_type")
    g3 = parquet_checkpoint(
        g2.join(rm2, "day").select(
            "day",
            "event_type",
            (F.col("v") - F.col("m")).cast("long").alias("v"),
        ),
        "mp_g3",
    )
    cm2 = med(g3, "event_type", "day")
    g4 = g3.join(cm2, "event_type").select(
        (F.col("v") - F.col("m")).cast("long").alias("v")
    )
    res = g4.agg(
        F.coalesce(F.sum(F.abs(F.col("v"))), F.lit(0))
        .cast("long")
        .alias("resid_abs"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    out = (
        cm1.withColumnRenamed("m", "m1")
        .join(cm2.withColumnRenamed("m", "m2"), "event_type")
        .crossJoin(res)
        .select(
            "event_type",
            (F.col("m1") + F.col("m2")).cast("long").alias("col_effect"),
            "resid_abs",
            "n_cells",
        )
        .orderBy("event_type")
    )
    return out


# ---------------------------------------------------------------------------
# wave 166: p-chart — SPC attribute control chart on daily purchase share
# ---------------------------------------------------------------------------
@q(
    "stat_p_chart",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS d
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    pb AS (
      SELECT CAST(SUM(d) AS BIGINT) AS td,
             CAST(SUM(n) AS BIGINT) AS tn
      FROM daily),
    lim AS (
      SELECT day, n, d, td, tn,
             round(CAST(d AS DOUBLE) / n, 6) AS p_i,
             round(CAST(td AS DOUBLE) / tn
                   + 3.0 * sqrt(CAST(td AS DOUBLE) / tn
                                * (1.0 - CAST(td AS DOUBLE) / tn)
                                / n), 6) AS ucl,
             round(GREATEST(CAST(td AS DOUBLE) / tn
                   - 3.0 * sqrt(CAST(td AS DOUBLE) / tn
                                * (1.0 - CAST(td AS DOUBLE) / tn)
                                / n), 0.0), 6) AS lcl
      FROM daily CROSS JOIN pb)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(MAX(td) AS DOUBLE) / MAX(tn), 6) + 0
             AS p_bar,
           CAST(SUM(CASE WHEN p_i > ucl OR p_i < lcl THEN 1
                         ELSE 0 END) AS BIGINT) AS n_violations,
           SUM(CASE WHEN p_i > ucl OR p_i < lcl THEN 1 ELSE 0 END)
             = 0 AS in_control
    FROM lim
    """,
)
def stat_p_chart(spark, sf):
    """Shewhart p-CHART on the daily purchase share — the SPC
    attribute chart (X-bar/R needs fixed subgroup sizes; the
    p-chart's per-day 3-sigma limits p_bar +/- 3*sqrt(p_bar(1-
    p_bar)/n_i) widen on thin days automatically, which is why it
    is THE chart for rate monitoring with uneven traffic): daily
    fraction vs limits computed from the POOLED p_bar, violations
    counted, in_control the one-boolean verdict a dashboard pages
    on. Every count is an exact BIGINT; the daily proportion AND
    both limits round to 6 BEFORE the violation compare so chart
    membership can never straddle an engine ulp (the
    events_outliers rounded-filter rule); the LCL clamps at 0
    (GREATEST spelled on both engines — a negative lower limit on
    a proportion is the textbook's own convention). The uniform
    1-in-5 fixture pins in_control TRUE; the replay test also
    fabricates a shifted day to show a violation would register.
    One scan to |days|, a 1-row pooled attach, one fold."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("d"),
        )
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "pchart_daily")
    pb = daily.agg(
        F.sum("d").cast("long").alias("td"),
        F.sum("n").cast("long").alias("tn"),
    )
    j = daily.crossJoin(pb)
    pbar = F.col("td").cast("double") / F.col("tn")
    se = F.sqrt(pbar * (F.lit(1.0) - pbar) / F.col("n"))
    lim = j.select(
        "td",
        "tn",
        F.round(F.col("d").cast("double") / F.col("n"), 6).alias(
            "p_i"
        ),
        F.round(pbar + F.lit(3.0) * se, 6).alias("ucl"),
        F.round(
            F.greatest(pbar - F.lit(3.0) * se, F.lit(0.0)), 6
        ).alias("lcl"),
    )
    viol = F.when(
        (F.col("p_i") > F.col("ucl")) | (F.col("p_i") < F.col("lcl")),
        1,
    ).otherwise(0)
    return lim.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (
            F.round(
                F.max("td").cast("double") / F.max("tn"), 6
            )
            + F.lit(0.0)
        ).alias("p_bar"),
        F.sum(viol).cast("long").alias("n_violations"),
        (F.sum(viol) == 0).alias("in_control"),
    )


# ---------------------------------------------------------------------------
# wave 175: partial correlation controlling for day-of-week
# ---------------------------------------------------------------------------
@q(
    "stat_partial_corr",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT)
               AS dow,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    ctr AS (
      SELECT day,
             CAST(COUNT(*) OVER (PARTITION BY dow) * x
                  - SUM(x) OVER (PARTITION BY dow) AS BIGINT) AS rx,
             CAST(COUNT(*) OVER (PARTITION BY dow) * y
                  - SUM(y) OVER (PARTITION BY dow) AS BIGINT) AS ry,
             CAST(COUNT(*) OVER (PARTITION BY dow) AS BIGINT) AS m
      FROM daily),
    sc AS (
      SELECT CAST(round(CAST(rx AS DOUBLE) / m) AS BIGINT) AS sx,
             CAST(round(CAST(ry AS DOUBLE) / m) AS BIGINT) AS sy
      FROM ctr),
    mm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(sx * sy), 0) AS BIGINT) AS sxy,
             CAST(COALESCE(SUM(sx * sx), 0) AS BIGINT) AS sxx,
             CAST(COALESCE(SUM(sy * sy), 0) AS BIGINT) AS syy
      FROM sc)
    SELECT n,
           CASE WHEN n < 3 OR sxx = 0 OR syy = 0 THEN NULL
                ELSE round(CAST(sxy AS DOUBLE)
                           / sqrt(CAST(sxx AS DOUBLE))
                           / sqrt(CAST(syy AS DOUBLE)), 6) + 0
           END AS r_partial
    FROM mm
    """,
)
def stat_partial_corr(spark, sf):
    """PARTIAL correlation of daily revenue vs daily event count,
    CONTROLLING for day-of-week — the confound-removal form of
    stat_corr (raw correlation between two daily series is
    inflated by any shared weekly cycle; partialling out the dow
    factor answers 'are busy days rich days beyond the weekday
    effect'): with a CATEGORICAL control, partialling is exactly
    within-group centering, and the centering is EXACT integer
    arithmetic — m*x - sum_dow(x) (the events_seasonal k*v -
    sum detrend, here per dow stratum via two windows). The
    centered values scale by the stratum size m, which differs
    across strata, so each residual normalizes back by m with ONE
    per-row rounded division to integer units (deterministic,
    identical op order) before the exact cross-moment sums —
    the only quantization in the pipeline, documented rather
    than hidden. dow by pure epoch arithmetic, never
    dayofweek(). The replay test computes the same residuals in
    Python; r_partial stays strongly positive (revenue ~ count
    within any stratum) but the test also pins it differing from
    the RAW stat_winsorized_corr-style correlation only modestly
    on this cycle-free fixture. One scan, two dow-partitioned
    windows, one fold."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
            (
                (
                    F.expr(
                        "unix_micros(cast(ts AS TIMESTAMP))"
                        " div 86400000000"
                    )
                    + 4
                )
                % 7
            ).alias("dow"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("x"),
            F.count(F.lit(1)).cast("long").alias("y"),
        )
    )
    wd = Window.partitionBy("dow")
    ctr = daily.select(
        (
            F.count(F.lit(1)).over(wd) * F.col("x")
            - F.sum("x").over(wd)
        )
        .cast("long")
        .alias("rx"),
        (
            F.count(F.lit(1)).over(wd) * F.col("y")
            - F.sum("y").over(wd)
        )
        .cast("long")
        .alias("ry"),
        F.count(F.lit(1)).over(wd).cast("long").alias("m"),
    )
    sc = ctr.select(
        F.round(F.col("rx").cast("double") / F.col("m"))
        .cast("long")
        .alias("sx"),
        F.round(F.col("ry").cast("double") / F.col("m"))
        .cast("long")
        .alias("sy"),
    )
    mm = sc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(F.col("sx") * F.col("sy")), F.lit(0))
        .cast("long")
        .alias("sxy"),
        F.coalesce(F.sum(F.col("sx") * F.col("sx")), F.lit(0))
        .cast("long")
        .alias("sxx"),
        F.coalesce(F.sum(F.col("sy") * F.col("sy")), F.lit(0))
        .cast("long")
        .alias("syy"),
    )
    n = F.col("n")
    bad = (n < 3) | (F.col("sxx") == 0) | (F.col("syy") == 0)
    return mm.select(
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("sxy").cast("double")
                / F.sqrt(F.col("sxx").cast("double"))
                / F.sqrt(F.col("syy").cast("double")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("r_partial"),
    )


# ---------------------------------------------------------------------------
# wave 175: one-way intraclass correlation ICC(1,1)
# ---------------------------------------------------------------------------
@q(
    "stat_icc",
    """
    WITH lab AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    g AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ni,
             CAST(SUM(v) AS BIGINT) AS si,
             CAST(SUM(v * v) AS BIGINT) AS qi
      FROM lab GROUP BY user_id),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ni) AS BIGINT) AS n,
             CAST(SUM(si) AS BIGINT) AS s,
             CAST(SUM(qi) AS BIGINT) AS q,
             CAST(SUM(ni * ni) AS BIGINT) AS sn2,
             SUM(CAST(si AS DOUBLE) * si / ni) AS sb
      FROM g)
    SELECT k AS n_groups, n AS n_obs,
           CASE WHEN k < 2 OR n <= k THEN NULL
                ELSE round(
                  ((sb - CAST(s AS DOUBLE) * s / n) / (k - 1)
                   - (CAST(q AS DOUBLE) - sb) / (n - k))
                  / ((sb - CAST(s AS DOUBLE) * s / n) / (k - 1)
                     + ((CAST(n AS DOUBLE)
                         - CAST(sn2 AS DOUBLE) / n) / (k - 1) - 1.0)
                       * ((CAST(q AS DOUBLE) - sb) / (n - k))),
                  6) + 0
           END AS icc1
    FROM tot
    """,
)
def stat_icc(spark, sf):
    """One-way intraclass correlation ICC(1,1) — what fraction of
    event-value variance lives BETWEEN users rather than within
    them (the reliability/clustering statistic that decides
    whether user is a meaningful random effect, and the design-
    effect input every clustered-sampling variance correction
    needs: deff = 1 + (m-1)*ICC): from the one-way ANOVA mean
    squares, ICC = (MSB - MSW)/(MSB + (n0 - 1) MSW) with the
    unbalanced-groups n0 = (N - sum n_i^2 / N)/(k-1). All inputs
    are exact BIGINT power sums per user (counts, sums, sums of
    squares; sum si^2/ni is the one term that must divide per
    group — it accumulates in DOUBLE from exact integers in
    identical op order, the stat_anova precedent); the assembly
    is a single float expression. The fixture draws every user's
    values from ONE distribution, so ICC pins near 0 — between-
    user variance is pure noise — and the replay test walks the
    ANOVA decomposition by hand. One scan, one per-user
    aggregate, one fold."""
    lab = (
        t(spark, sf, "events")
        .filter(
            F.col("user_id").isNotNull() & F.col("value").isNotNull()
        )
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
    )
    g = lab.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum("v").cast("long").alias("si"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("qi"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("si").cast("long").alias("s"),
        F.sum("qi").cast("long").alias("q"),
        F.sum(F.col("ni") * F.col("ni")).cast("long").alias("sn2"),
        F.sum(
            F.col("si").cast("double") * F.col("si") / F.col("ni")
        ).alias("sb"),
    )
    k, n = F.col("k"), F.col("n")
    s, q_ = F.col("s"), F.col("q")
    sb = F.col("sb")
    msb = (sb - s.cast("double") * s / n) / (k - 1)
    msw = (q_.cast("double") - sb) / (n - k)
    n0 = (
        n.cast("double") - F.col("sn2").cast("double") / n
    ) / (k - 1)
    bad = (k < 2) | (n <= k)
    return tot.select(
        k.alias("n_groups"),
        n.alias("n_obs"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (msb - msw) / (msb + (n0 - F.lit(1.0)) * msw), 6
            )
            + F.lit(0.0)
        )
        .alias("icc1"),
    )


# ---------------------------------------------------------------------------
# wave 176: regression influence census — leverage and Cook's distance
# ---------------------------------------------------------------------------
@q(
    "stat_influence",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
               AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) // 100000 AS kd
      FROM orders GROUP BY 1),
    ix AS (
      SELECT day, kd,
             CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
               AS x,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily),
    m1 AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx,
             CAST(COALESCE(SUM(kd), 0) AS BIGINT) AS sy,
             CAST(COALESCE(SUM(x * kd), 0) AS BIGINT) AS sxy,
             CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS sxx
      FROM ix),
    ols AS (
      SELECT n, sx, sxx,
             round(CAST(n * sxy - sx * sy AS DOUBLE)
                   / (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx), 6) AS b1,
             round((CAST(sy AS DOUBLE)
                    - CAST(n * sxy - sx * sy AS DOUBLE)
                      / (CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx) * sx) / n, 6)
               AS a1
      FROM m1 WHERE n >= 4),
    res AS (
      SELECT i.day, i.x, o.n, o.sx, o.sxx,
             CAST(round(1000000.0 * (i.kd - o.a1 - o.b1 * i.x))
                  AS BIGINT) AS e_mic
      FROM ix i CROSS JOIN ols o),
    sse AS (
      SELECT CAST(COALESCE(SUM(CAST(round(
               CAST(e_mic AS DOUBLE) * e_mic / 1000000.0)
               AS BIGINT)), 0) AS BIGINT) AS sse_mic
      FROM res),
    lev AS (
      SELECT r.day, r.e_mic,
             1.0 / r.n
             + (r.x - CAST(r.sx AS DOUBLE) / r.n)
               * (r.x - CAST(r.sx AS DOUBLE) / r.n)
               / (r.sxx - CAST(r.sx AS DOUBLE) * r.sx / r.n) AS h,
             (CAST(s.sse_mic AS DOUBLE) / 1000000.0)
               / (r.n - 2) AS s2
      FROM res r CROSS JOIN sse s),
    cook AS (
      SELECT day, e_mic, round(h, 6) + 0 AS leverage,
             CAST(round(1000000.0
               * ((CAST(e_mic AS DOUBLE) / 1000000.0)
                  * (CAST(e_mic AS DOUBLE) / 1000000.0)
                  * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))))
               AS BIGINT) AS cookd_mic
      FROM lev)
    SELECT day, e_mic, leverage, cookd_mic,
           round(CAST(cookd_mic AS DOUBLE) / 1000000.0, 6) + 0
             AS cook_d
    FROM cook
    ORDER BY cookd_mic DESC, day LIMIT 5
    """,
)
def stat_influence(spark, sf):
    """Regression influence census — per-day leverage h_t and
    Cook's distance for the daily-revenue trend OLS, top-5 most
    influential days (the diagnostic that tells a forecaster
    WHICH day is dragging the slope — endpoint days carry the
    leverage, storm days carry the residual, Cook's D multiplies
    the two): h_t = 1/n + (x - xbar)^2/Sxx needs only the exact
    integer design moments; the residual takes the ROUNDED OLS
    coefficients (the stat_cochrane_orcutt cross-engine
    contract), SSE accumulates per-term-quantized e^2, and D_t =
    e^2 h / (2 s^2 (1-h)^2) micros-quantizes BEFORE the top-5
    ranking with the day tiebreak — the ranking never compares
    raw doubles. The trendless iid fixture puts maximum leverage
    at the calendar ENDPOINTS (pinned: top days' h exceeds the
    1/n floor) while Cook's D stays below the D > 1 alarm
    convention (pinned). One scan, two window passes, a 1-row
    moment attach."""
    daily = (
        t(spark, sf, "orders")
        .groupBy(
            F.expr(
                "unix_micros(cast(o_orderdate AS TIMESTAMP))"
                " div 86400000000"
            ).alias("day")
        )
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) AS BIGINT))"
                " div 100000"
            )
            .cast("long")
            .alias("kd")
        )
    )
    from ..operators.dedup import parquet_checkpoint

    ix = parquet_checkpoint(
        daily.select(
            "day",
            "kd",
            (F.row_number().over(Window.orderBy("day")) - 1)
            .cast("long")
            .alias("x"),
            F.count(F.lit(1))
            .over(Window.partitionBy())
            .cast("long")
            .alias("n"),
        ),
        "infl_ix",
    )
    m1 = ix.agg(
        F.max("n").cast("long").alias("n"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("sx"),
        F.coalesce(F.sum("kd"), F.lit(0)).cast("long").alias("sy"),
        F.coalesce(F.sum(F.col("x") * F.col("kd")), F.lit(0))
        .cast("long")
        .alias("sxy"),
        F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0))
        .cast("long")
        .alias("sxx"),
    ).filter(F.col("n") >= 4)
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    b1 = F.round(
        (n * sxy - sx * sy).cast("double")
        / (n.cast("double") * sxx - sx.cast("double") * sx),
        6,
    )
    a1 = F.round(
        (
            sy.cast("double")
            - (n * sxy - sx * sy).cast("double")
            / (n.cast("double") * sxx - sx.cast("double") * sx)
            * sx
        )
        / n,
        6,
    )
    ols = m1.select(
        n.alias("n"),
        sx.alias("sx"),
        sxx.alias("sxx"),
        b1.alias("b1"),
        a1.alias("a1"),
    )
    res = parquet_checkpoint(
        ix.select("day", "kd", "x").crossJoin(ols).select(
            "day",
            "x",
            "n",
            "sx",
            "sxx",
            F.round(
                F.lit(1000000.0)
                * (
                    F.col("kd")
                    - F.col("a1")
                    - F.col("b1") * F.col("x")
                )
            )
            .cast("long")
            .alias("e_mic"),
        ),
        "infl_res",
    )
    sse = res.agg(
        F.coalesce(
            F.sum(
                F.round(
                    F.col("e_mic").cast("double")
                    * F.col("e_mic")
                    / F.lit(1000000.0)
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sse_mic")
    )
    lev = res.crossJoin(sse).select(
        "day",
        "e_mic",
        (
            F.lit(1.0) / F.col("n")
            + (F.col("x") - F.col("sx").cast("double") / F.col("n"))
            * (F.col("x") - F.col("sx").cast("double") / F.col("n"))
            / (
                F.col("sxx")
                - F.col("sx").cast("double")
                * F.col("sx")
                / F.col("n")
            )
        ).alias("h"),
        (
            (F.col("sse_mic").cast("double") / F.lit(1000000.0))
            / (F.col("n") - 2)
        ).alias("s2"),
    )
    e_d = F.col("e_mic").cast("double") / F.lit(1000000.0)
    cookd_mic = F.round(
        F.lit(1000000.0)
        * (
            e_d
            * e_d
            * F.col("h")
            / (
                F.lit(2.0)
                * F.col("s2")
                * (F.lit(1.0) - F.col("h"))
                * (F.lit(1.0) - F.col("h"))
            )
        )
    ).cast("long")
    cook = lev.select(
        "day",
        "e_mic",
        (F.round(F.col("h"), 6) + F.lit(0.0)).alias("leverage"),
        cookd_mic.alias("cookd_mic"),
    )
    return (
        cook.orderBy(F.desc("cookd_mic"), "day")
        .limit(5)
        .select(
            "day",
            "e_mic",
            "leverage",
            "cookd_mic",
            (
                F.round(
                    F.col("cookd_mic").cast("double")
                    / F.lit(1000000.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("cook_d"),
        )
    )


# ---------------------------------------------------------------------------
# wave 177: weighted Jaccard (Ruzicka) between per-type value histograms
# ---------------------------------------------------------------------------
@q(
    "stat_weighted_jaccard",
    """
    WITH lab AS (
      SELECT event_type,
             LEAST(CAST(round(value * 100) AS BIGINT) // 5000, 9)
               AS bin
      FROM events WHERE value IS NOT NULL),
    h AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM lab GROUP BY 1, 2),
    grid AS (
      SELECT ta.event_type AS type_a, tb.event_type AS type_b,
             b.bin,
             CAST(COALESCE(ha.c, 0) AS BIGINT) AS ca,
             CAST(COALESCE(hb.c, 0) AS BIGINT) AS cb
      FROM (SELECT DISTINCT event_type FROM h) ta
      JOIN (SELECT DISTINCT event_type FROM h) tb
        ON ta.event_type < tb.event_type
      CROSS JOIN (SELECT DISTINCT bin FROM h) b
      LEFT JOIN h ha ON ha.event_type = ta.event_type
                    AND ha.bin = b.bin
      LEFT JOIN h hb ON hb.event_type = tb.event_type
                    AND hb.bin = b.bin)
    SELECT type_a, type_b,
           CAST(SUM(LEAST(ca, cb)) AS BIGINT) AS inter_mass,
           CAST(SUM(GREATEST(ca, cb)) AS BIGINT) AS union_mass,
           CASE WHEN SUM(GREATEST(ca, cb)) = 0 THEN NULL
                ELSE round(CAST(SUM(LEAST(ca, cb)) AS DOUBLE)
                           / SUM(GREATEST(ca, cb)), 6) + 0
           END AS w_jaccard
    FROM grid GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
)
def stat_weighted_jaccard(spark, sf):
    """Weighted Jaccard (Ruzicka) similarity between per-type value
    HISTOGRAMS — sum(min)/sum(max) over aligned bins, the
    multiset generalization of set Jaccard (dedup_jaccard compares
    shingle SETS; distributions need the mass-aware form, and
    Ruzicka is what histogram-sketch stores compute when deciding
    whether two shards can share a sketch): values bin into 10
    fixed $50-wide buckets (top-coded at bin 9 — fixed edges, not
    data-derived quantiles, so bins align across types BY
    CONSTRUCTION, which is the whole requirement), histograms
    zero-fill onto the shared pair x bin grid (the absent-cell
    LEFT-join lesson — min(c, 0) and max(c, 0) must see the 0),
    and both masses stay exact BIGINTs with one guarded division
    per pair. The fixture's types share one value distribution,
    so every pairwise similarity is HIGH (pinned > 0.5) without
    being 1 (sampling noise, pinned < 1). k(k-1)/2 = 10 rows; one
    corpus scan, everything after is |types x bins|-sized."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.least(
                F.expr(
                    "cast(round(value * 100) AS BIGINT) div 5000"
                ),
                F.lit(9),
            )
            .cast("long")
            .alias("bin"),
        )
    )
    from ..operators.dedup import parquet_checkpoint

    h = parquet_checkpoint(
        lab.groupBy("event_type", "bin").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        "wjac_h",
    )
    types = h.select("event_type").distinct()
    bins = h.select("bin").distinct()
    ta = types.withColumnRenamed("event_type", "type_a")
    tb = types.withColumnRenamed("event_type", "type_b")
    ha = h.select(
        F.col("event_type").alias("ea"),
        F.col("bin").alias("ba"),
        F.col("c").alias("ca"),
    )
    hb = h.select(
        F.col("event_type").alias("eb"),
        F.col("bin").alias("bb"),
        F.col("c").alias("cb"),
    )
    grid = (
        ta.join(tb, F.col("type_a") < F.col("type_b"))
        .crossJoin(bins)
        .join(
            ha,
            (F.col("ea") == F.col("type_a"))
            & (F.col("ba") == F.col("bin")),
            "left",
        )
        .join(
            hb,
            (F.col("eb") == F.col("type_b"))
            & (F.col("bb") == F.col("bin")),
            "left",
        )
        .select(
            "type_a",
            "type_b",
            F.coalesce(F.col("ca"), F.lit(0)).cast("long").alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).cast("long").alias("cb"),
        )
    )
    inter = F.sum(F.least(F.col("ca"), F.col("cb"))).cast("long")
    uni = F.sum(F.greatest(F.col("ca"), F.col("cb"))).cast("long")
    return (
        grid.groupBy("type_a", "type_b")
        .agg(
            inter.alias("inter_mass"),
            uni.alias("union_mass"),
            F.when(uni == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(inter.cast("double") / uni, 6) + F.lit(0.0)
            )
            .alias("w_jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# wave 177: calendar-cell completeness — the gapfill data-quality census
# ---------------------------------------------------------------------------
@q(
    "events_completeness",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2),
    bounds AS (
      SELECT CAST(MIN(day) AS BIGINT) AS d0,
             CAST(MAX(day) AS BIGINT) AS d1,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
      FROM daily),
    pres AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS days_present
      FROM daily GROUP BY event_type)
    SELECT p.event_type,
           p.days_present,
           CAST(b.d1 - b.d0 + 1 AS BIGINT) AS days_expected,
           round(CAST(p.days_present AS DOUBLE)
                 / (b.d1 - b.d0 + 1), 6) + 0 AS completeness
    FROM pres p CROSS JOIN bounds b
    ORDER BY p.event_type
    """,
)
def events_completeness(spark, sf):
    """Calendar-cell completeness per event type — the data-quality
    census events_gapfill's zero-fill implies but never reports:
    of the days between the corpus' first and last event, how many
    did each type actually appear on (a missing (type, day) cell
    is either a real zero or an ingestion gap; this number is the
    alarm that tells you to go find out which — the 'missing day
    and zero day are different facts' doctrine turned into a
    metric). The span comes from ONE 3-value aggregate over the
    deduped (type, day) relation — the corpus is scanned once,
    and the presence counts reuse the same relation (checkpoint-
    free because both consumers fold the same tiny distinct set).
    Exact integer counts, one rounded ratio; the dense synthetic
    fixture pins completeness == 1.0 for every type, and the
    replay test fabricates a gapped panel to show the metric
    drops. |types| rows out."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            )
            .cast("long")
            .alias("day"),
        )
        .distinct()
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "compl_daily")
    bounds = daily.agg(
        F.min("day").cast("long").alias("d0"),
        F.max("day").cast("long").alias("d1"),
        F.countDistinct("event_type").cast("long").alias("k"),
    )
    pres = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("days_present")
    )
    return (
        pres.crossJoin(bounds)
        .select(
            "event_type",
            "days_present",
            (F.col("d1") - F.col("d0") + 1)
            .cast("long")
            .alias("days_expected"),
            (
                F.round(
                    F.col("days_present").cast("double")
                    / (F.col("d1") - F.col("d0") + 1),
                    6,
                )
                + F.lit(0.0)
            ).alias("completeness"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# wave 179: Cochran's C — variance-homogeneity outlier screen
# ---------------------------------------------------------------------------
@q(
    "stat_cochrans_c",
    """
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)),
                           0) AS BIGINT) AS s1,
             CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)
                               * CAST(round(value * 100)
                                      AS BIGINT)), 0) AS BIGINT)
               AS s2
      FROM events WHERE value IS NOT NULL GROUP BY event_type),
    v AS (
      SELECT event_type, n,
             (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
             / (CAST(n AS DOUBLE) * (n - 1)) AS var_i
      FROM g WHERE n >= 2),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(var_i) AS sv, MAX(var_i) AS mv
      FROM v),
    top AS (
      SELECT event_type AS max_var_type
      FROM v ORDER BY var_i DESC, event_type LIMIT 1)
    SELECT t.k AS n_groups, p.max_var_type,
           CASE WHEN t.sv <= 0 THEN NULL
                ELSE round(t.mv / t.sv, 6) + 0 END AS c_stat,
           CASE WHEN t.sv <= 0 OR t.k = 0 THEN NULL
                ELSE round(t.mv / t.sv, 6)
                     < round(3.0 / t.k, 6) END AS homogeneous
    FROM tot t, top p
    """,
)
def stat_cochrans_c(spark, sf):
    """Cochran's C — the variance-OUTLIER screen (stat_bartlett and
    stat_levene test whether variances differ ANYWHERE; C =
    max(s_i^2)/sum(s_i^2) asks the sharper production question:
    is ONE group's variance eating the budget, and WHICH — the
    test a pipeline runs before trusting a pooled variance or
    allocating sampling budget a la sample_neyman): per-type
    variances assemble from exact BIGINT cents moments (the
    n*s2 - s1^2 cross-product in double, identical op order), C
    is one division, and the argmax type is reported with a
    (var DESC, type) total tiebreak. Under homogeneity C ~ 1/k;
    the acceptance compares the ROUNDED statistic against the
    loose 3/k band (an embedded heuristic literal — exact
    Cochran criticals are a consumer table, the games_howell
    discipline; 3/k is >4 sigma at these group sizes). The
    shared-distribution fixture pins homogeneous TRUE and C near
    1/5. One scan, one 5-row fold."""
    g = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("s1"),
            F.sum(
                F.round(F.col("value") * 100).cast("long")
                * F.round(F.col("value") * 100).cast("long")
            )
            .cast("long")
            .alias("s2"),
        )
    )
    v = g.filter(F.col("n") >= 2).select(
        "event_type",
        (
            (
                F.col("n").cast("double") * F.col("s2")
                - F.col("s1").cast("double") * F.col("s1")
            )
            / (F.col("n").cast("double") * (F.col("n") - 1))
        ).alias("var_i"),
    )
    from ..operators.dedup import parquet_checkpoint

    v = parquet_checkpoint(v, "cochc_v")
    tot = v.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("var_i").alias("sv"),
        F.max("var_i").alias("mv"),
    )
    top = (
        v.orderBy(F.desc("var_i"), "event_type")
        .limit(1)
        .select(F.col("event_type").alias("max_var_type"))
    )
    j = tot.crossJoin(top)
    c = F.round(F.col("mv") / F.col("sv"), 6)
    bad = F.col("sv") <= 0
    return j.select(
        F.col("k").alias("n_groups"),
        "max_var_type",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(c + F.lit(0.0))
        .alias("c_stat"),
        F.when(bad | (F.col("k") == 0), F.lit(None).cast("boolean"))
        .otherwise(c < F.round(F.lit(3.0) / F.col("k"), 6))
        .alias("homogeneous"),
    )


# ---------------------------------------------------------------------------
# wave 181: I-MR chart — individuals + moving range control limits
# ---------------------------------------------------------------------------
@q(
    "stat_imr_chart",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
               AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    mr AS (
      SELECT day, cents,
             abs(cents - LAG(cents) OVER (ORDER BY day)) AS mrange
      FROM daily),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             AVG(CAST(cents AS DOUBLE)) AS xbar,
             AVG(CAST(mrange AS DOUBLE)) AS mrbar
      FROM mr),
    lim AS (
      SELECT m.day, m.cents, m.mrange, b.n,
             round(b.xbar + 2.66 * b.mrbar, 6) AS ucl_x,
             round(b.xbar - 2.66 * b.mrbar, 6) AS lcl_x,
             round(3.267 * b.mrbar, 6) AS ucl_mr
      FROM mr m CROSS JOIN base b)
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN cents > ucl_x OR cents < lcl_x
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS x_violations,
           CAST(SUM(CASE WHEN mrange IS NOT NULL
                         AND mrange > ucl_mr
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS mr_violations,
           round((SUM(CASE WHEN cents > ucl_x OR cents < lcl_x
                       THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN mrange IS NOT NULL
                             AND mrange > ucl_mr
                             THEN 1 ELSE 0 END))
                 / CAST(MAX(n) AS DOUBLE), 6) + 0
             AS violation_rate,
           round((SUM(CASE WHEN cents > ucl_x OR cents < lcl_x
                       THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN mrange IS NOT NULL
                             AND mrange > ucl_mr
                             THEN 1 ELSE 0 END))
                 / CAST(MAX(n) AS DOUBLE), 6) < 0.05
             AS rate_ok
    FROM lim
    """,
)
def stat_imr_chart(spark, sf):
    """I-MR (individuals / moving-range) control chart on daily
    revenue — the VARIABLES-chart companion to stat_p_chart's
    attribute chart, and the one that works when there are no
    rational subgroups (each day is a single observation; the
    moving range |x_t - x_{t-1}| estimates short-term sigma
    without any within-day replication): individuals limits
    xbar +/- 2.66 * MRbar and the MR upper limit 3.267 * MRbar —
    the E2/D4 constants for n=2 moving ranges, embedded literals
    (Montgomery's tables, the stat_wilson_ci discipline). Both
    averages compute in double from exact BIGINT cents; limits
    ROUND to 6 before the violation compares (the p-chart rule);
    the MR's first row is NULL and counts nowhere. Verdict
    design lesson (measured): on a 2399-day series a 3-sigma
    chart EXPECTS ~0.3-1% false alarms under NORMALITY — and this
    revenue series is decisively non-normal (stat_dagostino
    measures K^2 ~ 367 on the same values), so 'zero violations'
    is doubly wrong as an in-control criterion; the face reports
    the violation RATE against a 5% band (measured 1.3-2.8%
    across SFs — the excess over the Gaussian 0.3% IS the heavy
    tail, quantified); per-day
    alarms remain the consumer's page, the rate is the chart-
    health gate. The replay test fabricates a level shift to show
    the chart fires. One scan, one LAG window, a 1-row limits
    attach."""
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

    mr = parquet_checkpoint(
        daily.select(
            "day",
            "cents",
            F.abs(
                F.col("cents")
                - F.lag("cents").over(Window.orderBy("day"))
            ).alias("mrange"),
        ),
        "imr_mr",
    )
    base = mr.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("cents").cast("double")).alias("xbar"),
        F.avg(F.col("mrange").cast("double")).alias("mrbar"),
    )
    lim = mr.crossJoin(base).select(
        "cents",
        "mrange",
        "n",
        F.round(
            F.col("xbar") + F.lit(2.66) * F.col("mrbar"), 6
        ).alias("ucl_x"),
        F.round(
            F.col("xbar") - F.lit(2.66) * F.col("mrbar"), 6
        ).alias("lcl_x"),
        F.round(F.lit(3.267) * F.col("mrbar"), 6).alias("ucl_mr"),
    )
    xv = F.sum(
        F.when(
            (F.col("cents") > F.col("ucl_x"))
            | (F.col("cents") < F.col("lcl_x")),
            1,
        ).otherwise(0)
    )
    mv = F.sum(
        F.when(
            F.col("mrange").isNotNull()
            & (F.col("mrange") > F.col("ucl_mr")),
            1,
        ).otherwise(0)
    )
    rate = F.round(
        (xv + mv) / F.max("n").cast("double"), 6
    )
    return lim.agg(
        F.max("n").cast("long").alias("n_days"),
        xv.cast("long").alias("x_violations"),
        mv.cast("long").alias("mr_violations"),
        (rate + F.lit(0.0)).alias("violation_rate"),
        (rate < F.lit(0.05)).alias("rate_ok"),
    )


# ---------------------------------------------------------------------------
# wave 181: weekday effect size — eta^2 of day-of-week on daily revenue
# ---------------------------------------------------------------------------
@q(
    "events_weekday_eta",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT)
               AS dow,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    g AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             SUM(CAST(cents AS DOUBLE) * cents) AS q
      FROM daily GROUP BY dow),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS s,
             SUM(q) AS q,
             SUM(CAST(s AS DOUBLE) * s / n) AS sb
      FROM g)
    SELECT n AS n_days,
           CASE WHEN n < 2
                     OR q - CAST(s AS DOUBLE) * s / n <= 0 THEN NULL
                ELSE round((sb - CAST(s AS DOUBLE) * s / n)
                           / (q - CAST(s AS DOUBLE) * s / n), 6)
                     + 0 END AS eta_sq,
           CASE WHEN n < 2
                     OR q - CAST(s AS DOUBLE) * s / n <= 0 THEN NULL
                ELSE round((sb - CAST(s AS DOUBLE) * s / n)
                           / (q - CAST(s AS DOUBLE) * s / n), 6)
                     < 0.3 END AS weekday_weak
    FROM tot
    """,
)
def events_weekday_eta(spark, sf):
    """Eta-squared of day-of-week on daily revenue — the EFFECT
    SIZE the omnibus tests leave out (stat_anova / stat_friedman
    say whether a weekday effect EXISTS; eta^2 = SSB/SST says how
    much of the daily variance it explains, which is the number
    that decides whether to deseasonalize at all — the companion
    to stat_seasonal_strength's trend decomposition, here in the
    one-way ANOVA frame): between-group mass sb = sum s_i^2/n_i
    accumulates in DOUBLE from exact integer group sums (the
    stat_icc convention; cents^2 crosses 2^63 so q also sums in
    double in identical op order — the stat_anderson_darling
    square-in-double rule), eta^2 is one guarded ratio. dow from
    pure epoch arithmetic. The iid fixture has NO weekly cycle,
    so eta^2 pins small (weekday_weak TRUE — deseasonalization
    would be wasted work, the actionable reading). One scan, a
    7-row group fold."""
    daily = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
            (
                (
                    F.expr(
                        "unix_micros(cast(ts AS TIMESTAMP))"
                        " div 86400000000"
                    )
                    + 4
                )
                % 7
            ).alias("dow"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    g = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("double") * F.col("cents")).alias(
            "q"
        ),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").cast("long").alias("s"),
        F.sum("q").alias("q"),
        F.sum(
            F.col("s").cast("double") * F.col("s") / F.col("n")
        ).alias("sb"),
    )
    n, s, q_, sb = F.col("n"), F.col("s"), F.col("q"), F.col("sb")
    sst = q_ - s.cast("double") * s / n
    ssb = sb - s.cast("double") * s / n
    bad = (n < 2) | (sst <= 0)
    eta = F.round(ssb / sst, 6)
    return tot.select(
        n.alias("n_days"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(eta + F.lit(0.0))
        .alias("eta_sq"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise(eta < F.lit(0.3))
        .alias("weekday_weak"),
    )
