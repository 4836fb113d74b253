"""Model-evaluation and training-diagnostics faces (round-4 wave 33):
the measurement half of a training-data pipeline — once a corpus is
curated and a quality classifier (or ranking score) exists, the
pipeline must EVALUATE it at corpus scale: precision/recall across
score thresholds, decile lift/gains, the best single-feature split
(a decision stump — the unit step of tree training and a feature-
importance probe), rank correlation between two signals (Spearman),
and resampled uncertainty on an aggregate (a deterministic bootstrap).

Everything rides the count-of-counts discipline the stat_* family
established: the corpus collapses ONCE to a per-distinct-value
support relation (map-side-combinable agg), and — the wave-32
stat_mutual_info lesson — every total and marginal is a WINDOW over
that support (``SUM() OVER ()``, RANGE-frame cumulatives), never a
second aggregation branch: a relation consumed by 2+ branches
re-runs its whole subtree per branch (column pruning defeats
ReuseExchange), so the branchy spelling scans the corpus per
marginal. Each face here scans its input exactly once (audit check
#44). Rank arithmetic uses the stat_mannwhitney DOUBLED-rank trick
(tie-averaged ranks are half-integers; 2*rank is the exact integer
2*cprev + cnt + 1). Randomness is md5-derived (the sample_hash /
mix_domains determinism discipline) so every "random" draw is
identical across engines, runs, partitionings, and cluster sizes.
ANSI DIVIDE_BY_ZERO hazards (empty class, zero variance, degenerate
split) short-circuit to NULL on both engines.
"""

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


def _score_support(spark, sf):
    """Shared support relation for the score-vs-purchase faces: one
    corpus agg to per-distinct-cents (cnt, positives)."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    lab = e.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    return lab.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("p"),
    )


_SCORE_SQL = """
    lab AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL),
    pv AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM lab GROUP BY cents),
    rk AS (
      SELECT cents, cnt, p,
             COALESCE(SUM(cnt) OVER (ORDER BY cents DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS cprev,
             COALESCE(SUM(p) OVER (ORDER BY cents DESC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS pprev,
             SUM(cnt) OVER () AS n,
             SUM(p) OVER () AS pos_tot
      FROM pv)
"""


def _score_ranked(spark, sf):
    """Support + inclusive-prefix machinery shared by ml_pr_curve and
    ml_lift: cumulative (count, positives) above each distinct score
    plus the corpus totals — totals as OVER () windows on the SAME
    relation, so the plan keeps one corpus scan (no tot branch)."""
    pv = _score_support(spark, sf)
    w = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return pv.select(
        "cents",
        "cnt",
        "p",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cprev"),
        F.coalesce(F.sum("p").over(w), F.lit(0)).alias("pprev"),
        F.sum("cnt").over(wall).alias("n"),
        F.sum("p").over(wall).alias("pos_tot"),
    )


# ---------------------------------------------------------------------------
# precision/recall curve at quantile thresholds — count-of-counts form
# ---------------------------------------------------------------------------
@q(
    "ml_pr_curve",
    f"""
    WITH {_SCORE_SQL},
    fan AS (
      SELECT k, rk.cents, rk.cprev + rk.cnt AS n_above,
             rk.pprev + rk.p AS pos_above, rk.pos_tot
      FROM rk
      CROSS JOIN (SELECT UNNEST(generate_series(1, 19)) AS k)
      WHERE rk.cprev < (k * rk.n + 19) // 20
        AND rk.cprev + rk.cnt >= (k * rk.n + 19) // 20)
    SELECT CAST(k AS INT) AS k, cents AS threshold_cents,
           CAST(n_above AS BIGINT) AS n_above,
           CAST(pos_above AS BIGINT) AS pos_above,
           round(CAST(pos_above AS DOUBLE) / n_above, 6) + 0 AS precision,
           CASE WHEN pos_tot = 0 THEN NULL
                ELSE round(CAST(pos_above AS DOUBLE) / pos_tot, 6) + 0
           END AS recall
    FROM fan
    """,
)
def ml_pr_curve(spark, sf):
    """Precision/recall curve for 'score predicts the positive class'
    (score = event value, positive = purchase) at the 19 vigintile
    cutoffs — the operating-curve report behind choosing a quality-
    classifier threshold for corpus filtering. Scale shape: ONE
    corpus agg to the per-distinct-score support (map-side
    combinable), inclusive prefix counts via a window over that
    bounded support ordered score-DESC (predict positive ⇔ score ≥
    threshold) with the corpus totals as OVER () windows on the same
    relation — never a second aggregation branch — then the
    threshold rows are located ARITHMETICALLY: row k is the tie-run
    containing global rank ⌈k·n/20⌉, i.e. cprev < ⌈kn/20⌉ ≤
    cprev+cnt, via a bounded ×19 fan-out (the events_rolling_dau
    idiom), never a per-row quantile sort. Precision =
    pos_above/n_above and recall = pos_above/pos_total are
    exact-integer ratios; the only floats are the two final round-6
    divisions (+0 kills IEEE -0.0). Recall NULL-guards the
    zero-positives corpus (ANSI DIVIDE_BY_ZERO)."""
    rk = _score_ranked(spark, sf)
    tgt = F.floor((F.col("k") * F.col("n") + 19) / F.lit(20)).cast("long")
    fan = rk.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(19))).alias("k")
    ).filter(
        (F.col("cprev") < tgt) & (F.col("cprev") + F.col("cnt") >= tgt)
    )
    n_above = F.col("cprev") + F.col("cnt")
    pos_above = F.col("pprev") + F.col("p")
    return fan.select(
        F.col("k").cast("int").alias("k"),
        F.col("cents").alias("threshold_cents"),
        n_above.cast("long").alias("n_above"),
        pos_above.cast("long").alias("pos_above"),
        (F.round(pos_above.cast("double") / n_above, 6) + F.lit(0.0)).alias(
            "precision"
        ),
        F.when(F.col("pos_tot") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(pos_above.cast("double") / F.col("pos_tot"), 6)
            + F.lit(0.0)
        )
        .alias("recall"),
    )


# ---------------------------------------------------------------------------
# decile lift/gains — tie-runs never split across bins
# ---------------------------------------------------------------------------
@q(
    "ml_lift",
    f"""
    WITH {_SCORE_SQL},
    dec AS (
      SELECT CAST(1 + (cprev * 10) // n AS INT) AS decile,
             SUM(cnt) AS n_d, SUM(p) AS pos_d,
             MAX(n) AS n, MAX(pos_tot) AS pos_tot
      FROM rk GROUP BY 1),
    cum AS (
      SELECT decile, n_d, pos_d, n, pos_tot,
             SUM(n_d) OVER (ORDER BY decile) AS cn,
             SUM(pos_d) OVER (ORDER BY decile) AS cp
      FROM dec)
    SELECT decile, CAST(n_d AS BIGINT) AS n_d,
           CAST(pos_d AS BIGINT) AS pos_d,
           round(CAST(pos_d AS DOUBLE) / n_d, 6) + 0 AS rate,
           CASE WHEN pos_tot = 0 THEN NULL
                ELSE round((CAST(pos_d AS DOUBLE) * n)
                           / (CAST(n_d AS DOUBLE) * pos_tot), 6) + 0
           END AS lift,
           CASE WHEN pos_tot = 0 THEN NULL
                ELSE round((CAST(cp AS DOUBLE) * n)
                           / (CAST(cn AS DOUBLE) * pos_tot), 6) + 0
           END AS cum_lift
    FROM cum
    """,
)
def ml_lift(spark, sf):
    """Decile lift/gains table for the same score-vs-purchase signal:
    rank the corpus by score descending, cut into 10 bins, and report
    per-bin response rate, lift over the base rate, and cumulative
    lift — the campaign-targeting / classifier-triage report. Tie
    semantics: a tie-run of equal scores is assigned WHOLE to the
    bin containing its first row (decile = 1 + ⌊10·cprev/n⌋), the
    grouped-lift convention — splitting a tie-run would need a
    global per-row ntile (a single-partition sort at corpus scale)
    and would make bin membership partition-order-dependent. Scale
    shape: corpus → per-distinct-score support → windows over the
    support (totals as OVER (), carried through the decile agg as
    MAX — no second corpus branch) → a ≤10-row report; lift =
    (pos_d·n)/(n_d·pos_tot) is a cross-multiplied exact-integer
    ratio evaluated in identical float order on both engines,
    NULL-guarded for a zero-positive corpus."""
    rk = _score_ranked(spark, sf)
    dec = rk.groupBy(
        (F.lit(1) + F.floor(F.col("cprev") * 10 / F.col("n")))
        .cast("int")
        .alias("decile")
    ).agg(
        F.sum("cnt").alias("n_d"),
        F.sum("p").alias("pos_d"),
        F.max("n").alias("n"),
        F.max("pos_tot").alias("pos_tot"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = dec.select(
        "decile",
        "n_d",
        "pos_d",
        "n",
        "pos_tot",
        F.sum("n_d").over(wc).alias("cn"),
        F.sum("pos_d").over(wc).alias("cp"),
    )
    lift = (
        F.round(
            (F.col("pos_d").cast("double") * F.col("n"))
            / (F.col("n_d").cast("double") * F.col("pos_tot")),
            6,
        )
        + F.lit(0.0)
    )
    cum_lift = (
        F.round(
            (F.col("cp").cast("double") * F.col("n"))
            / (F.col("cn").cast("double") * F.col("pos_tot")),
            6,
        )
        + F.lit(0.0)
    )
    null_d = F.lit(None).cast("double")
    return cum.select(
        "decile",
        F.col("n_d").cast("long").alias("n_d"),
        F.col("pos_d").cast("long").alias("pos_d"),
        (F.round(F.col("pos_d").cast("double") / F.col("n_d"), 6) + F.lit(0.0))
        .alias("rate"),
        F.when(F.col("pos_tot") == 0, null_d).otherwise(lift).alias("lift"),
        F.when(F.col("pos_tot") == 0, null_d)
        .otherwise(cum_lift)
        .alias("cum_lift"),
    )


# ---------------------------------------------------------------------------
# decision stump — best single split by weighted Gini impurity
# ---------------------------------------------------------------------------
@q(
    "ml_stump",
    """
    WITH lab AS (
      SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      FROM orders),
    dv AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM lab GROUP BY day),
    rk AS (
      SELECT day,
             SUM(cnt) OVER (ORDER BY day) AS n_l,
             SUM(p) OVER (ORDER BY day) AS pos_l,
             SUM(cnt) OVER () AS n,
             SUM(p) OVER () AS pos
      FROM dv),
    cand AS (
      SELECT day, n_l, pos_l, n - n_l AS n_r, pos - pos_l AS pos_r, n, pos
      FROM rk WHERE n_l < n),
    sc AS (
      SELECT day, n_l, pos_l, n_r, pos_r, n, pos,
             CAST(round(1000000.0 * (
               (CAST(n_l AS DOUBLE)
                - (CAST(pos_l AS DOUBLE) * pos_l
                   + CAST(n_l - pos_l AS DOUBLE) * (n_l - pos_l)) / n_l
                + CAST(n_r AS DOUBLE)
                - (CAST(pos_r AS DOUBLE) * pos_r
                   + CAST(n_r - pos_r AS DOUBLE) * (n_r - pos_r)) / n_r)
               / n)) AS BIGINT) AS gini_micros
      FROM cand)
    SELECT CAST(day AS BIGINT) AS split_day, gini_micros,
           CAST(n_l AS BIGINT) AS n_left, CAST(pos_l AS BIGINT) AS pos_left,
           CAST(n_r AS BIGINT) AS n_right, CAST(pos_r AS BIGINT) AS pos_right,
           CAST(round(1000000.0 * (
             CAST(n AS DOUBLE)
             - (CAST(pos AS DOUBLE) * pos
                + CAST(n - pos AS DOUBLE) * (n - pos)) / n) / n)
             AS BIGINT) AS base_gini_micros
    FROM sc
    QUALIFY ROW_NUMBER() OVER (ORDER BY gini_micros, day) = 1
    """,
)
def ml_stump(spark, sf):
    """Decision stump: the best single threshold split of order date
    predicting fulfilled status, by weighted Gini impurity — the unit
    step of tree training, and the standard 'is this feature worth
    anything' probe a training pipeline runs per candidate feature.
    Scale shape: the corpus collapses ONCE to the per-distinct-day
    support (algorithm-bounded: days, not rows); inclusive prefix
    counts give every candidate split's left side from one window
    over that support, the totals ride the SAME relation as OVER ()
    windows (no second corpus branch), and the right side is
    subtraction. Each candidate's weighted Gini
    Σ_side n_s·(1 − (pos_s/n_s)² − (neg_s/n_s)²) / n is evaluated as
    DOUBLE in the IDENTICAL operation order on both engines and
    quantized to integer MICROS before the argmin (the kg_adamic_adar
    discipline), so the winning row is engine-stable; ties break on
    the smaller threshold. The n_l < n guard drops the degenerate
    all-left split (its n_r = 0 division is an ANSI hazard); a corpus
    with a single distinct day therefore yields zero candidate rows
    — total, not a crash. The final argmin window runs over the
    bounded day support only."""
    # floor-division parity: epoch_us is positive here, but spell the
    # Spark side as floor() so negative epochs would still match //
    lab = t(spark, sf, "orders").select(
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            / F.lit(86400000000)
        )
        .cast("long")
        .alias("day"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    dv = lab.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("p"),
    )
    wi = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rk = dv.select(
        "day",
        F.sum("cnt").over(wi).alias("n_l"),
        F.sum("p").over(wi).alias("pos_l"),
        F.sum("cnt").over(wall).alias("n"),
        F.sum("p").over(wall).alias("pos"),
    )
    cand = rk.filter(F.col("n_l") < F.col("n")).select(
        "day",
        "n_l",
        "pos_l",
        (F.col("n") - F.col("n_l")).alias("n_r"),
        (F.col("pos") - F.col("pos_l")).alias("pos_r"),
        "n",
        "pos",
    )

    def _side(nc, pc):
        neg = F.col(nc) - F.col(pc)
        return F.col(nc).cast("double") - (
            F.col(pc).cast("double") * F.col(pc) + neg.cast("double") * neg
        ) / F.col(nc)

    gini = F.round(
        F.lit(1000000.0)
        * ((_side("n_l", "pos_l") + _side("n_r", "pos_r")) / F.col("n"))
    ).cast("long")
    base_neg = F.col("n") - F.col("pos")
    base = F.round(
        F.lit(1000000.0)
        * (
            F.col("n").cast("double")
            - (
                F.col("pos").cast("double") * F.col("pos")
                + base_neg.cast("double") * base_neg
            )
            / F.col("n")
        )
        / F.col("n")
    ).cast("long")
    sc = cand.withColumn("gini_micros", gini)
    wmin = Window.orderBy("gini_micros", "day")
    return (
        sc.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select(
            F.col("day").cast("long").alias("split_day"),
            "gini_micros",
            F.col("n_l").cast("long").alias("n_left"),
            F.col("pos_l").cast("long").alias("pos_left"),
            F.col("n_r").cast("long").alias("n_right"),
            F.col("pos_r").cast("long").alias("pos_right"),
            base.alias("base_gini_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation — contingency-cell form, doubled ranks
# ---------------------------------------------------------------------------
@q(
    "stat_spearman",
    """
    WITH v AS (
      SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qx,
             CAST(round(l_discount * 100) AS BIGINT) AS qy
      FROM lineitem),
    cells AS (
      SELECT qx, qy, CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY qx, qy),
    rk AS (
      SELECT c,
             2 * SUM(c) OVER (ORDER BY qx
                              RANGE BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
               - SUM(c) OVER (PARTITION BY qx) + 1 AS rx2,
             2 * SUM(c) OVER (ORDER BY qy
                              RANGE BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
               - SUM(c) OVER (PARTITION BY qy) + 1 AS ry2
      FROM cells),
    m AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * rx2) AS BIGINT) AS sx,
             CAST(SUM(c * ry2) AS BIGINT) AS sy,
             CAST(SUM(c * rx2 * rx2) AS BIGINT) AS sxx,
             CAST(SUM(c * ry2 * ry2) AS BIGINT) AS syy,
             CAST(SUM(c * rx2 * ry2) AS BIGINT) AS sxy
      FROM rk)
    SELECT COALESCE(n, 0) AS n,
           CASE WHEN n IS NULL OR n = 0
                     OR CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx <= 0
                     OR CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy <= 0
                THEN NULL
                ELSE round((CAST(n AS DOUBLE) * sxy
                            - CAST(sx AS DOUBLE) * sy)
                           / sqrt((CAST(n AS DOUBLE) * sxx
                                   - CAST(sx AS DOUBLE) * sx)
                                  * (CAST(n AS DOUBLE) * syy
                                     - CAST(sy AS DOUBLE) * sy)), 6) + 0
           END AS rho
    FROM m
    """,
)
def stat_spearman(spark, sf):
    """Spearman rank correlation between quantity and discount — the
    distribution-free association measure a feature-selection pass
    computes between every candidate signal pair (Pearson answers
    'linear', Spearman answers 'monotone'). Exactness: tie-averaged
    ranks arrive as the stat_mannwhitney DOUBLED-rank integers — for
    the tie group of x-value v, 2·rank = 2·cum(≤v) − cnt(v) + 1,
    computed per CELL as a RANGE-frame cumulative (peers included)
    minus a PARTITION BY total, so BOTH marginal rank columns are
    windows over the one contingency-cell relation (the wave-32
    stat_mutual_info lesson: marginals as re-aggregations would
    re-scan the corpus per branch; this plan scans it exactly once —
    audit #44). All five moment sums are exact order-independent
    BIGINT aggregates; only the final normalization runs in DOUBLE —
    identical operation order both engines, round 6, +0 guard.
    BIGINT headroom: rx2 ≤ 2n so Σc·rx2² ≤ 4n³ — exact through
    n ≈ 1.3e6 rows; beyond that, center the moments first
    (documented upgrade path; exact at this repo's bench scales).
    Degenerate inputs (empty relation, zero rank variance on either
    axis) short-circuit rho to NULL — the kg_assortativity ANSI
    guard."""
    v = t(spark, sf, "lineitem").select(
        F.round(F.col("l_quantity") * 100).cast("long").alias("qx"),
        F.round(F.col("l_discount") * 100).cast("long").alias("qy"),
    )
    cells = v.groupBy("qx", "qy").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wx = Window.orderBy("qx").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wxp = Window.partitionBy("qx")
    wy = Window.orderBy("qy").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wyp = Window.partitionBy("qy")
    rk = cells.select(
        "c",
        (
            F.lit(2) * F.sum("c").over(wx) - F.sum("c").over(wxp) + 1
        ).alias("rx2"),
        (
            F.lit(2) * F.sum("c").over(wy) - F.sum("c").over(wyp) + 1
        ).alias("ry2"),
    )
    m = rk.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("rx2")).cast("long").alias("sx"),
        F.sum(F.col("c") * F.col("ry2")).cast("long").alias("sy"),
        F.sum(F.col("c") * F.col("rx2") * F.col("rx2"))
        .cast("long")
        .alias("sxx"),
        F.sum(F.col("c") * F.col("ry2") * F.col("ry2"))
        .cast("long")
        .alias("syy"),
        F.sum(F.col("c") * F.col("rx2") * F.col("ry2"))
        .cast("long")
        .alias("sxy"),
    )
    vx = F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    vy = F.col("n").cast("double") * F.col("syy") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    num = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    return m.select(
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.when(
            F.col("n").isNull() | (F.col("n") == 0) | (vx <= 0) | (vy <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(num / F.sqrt(vx * vy), 6) + F.lit(0.0))
        .alias("rho"),
    )


# ---------------------------------------------------------------------------
# deterministic bootstrap — md5-derived {0,1,2} multiplier weights
# ---------------------------------------------------------------------------
@q(
    "stat_bootstrap",
    """
    WITH fan AS (
      SELECT b, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                                 || CAST(b AS VARCHAR)), 1, 2))::UBIGINT % 3
               AS w
      FROM orders
      CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS b)),
    agg AS (
      SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
             CAST(SUM(w * cents) AS BIGINT) AS wcents
      FROM fan GROUP BY b)
    SELECT CAST(b AS INT) AS b, n_eff,
           CASE WHEN n_eff = 0 THEN NULL
                ELSE round(CAST(wcents AS DOUBLE) / n_eff / 100.0, 6) + 0
           END AS mean_price
    FROM agg
    """,
)
def stat_bootstrap(spark, sf):
    """Deterministic multiplier bootstrap of mean order value: 16
    resamples, each row entering resample b with weight
    md5(key:b) mod 3 ∈ {0,1,2} (mean 1 — the integer-weight analogue
    of a Poisson bootstrap), so the spread of the 16 means is a
    resampling uncertainty estimate on the aggregate — the error bar
    a pipeline attaches to any corpus statistic before acting on a
    shift. Hash-derived weights make every resample identical across
    engines, runs, partitionings, and cluster sizes (the sample_hash
    discipline — an RNG bootstrap is irreproducible exactly where
    reproducibility matters most, in a drift investigation). Scale
    shape: a bounded ×16 map-side fan-out (the events_rolling_dau
    idiom) into ONE map-side-combinable agg keyed by the 16 resample
    ids; weighted sums are exact integer cents; the one division is
    NULL-guarded (an all-zero-weight resample is possible only for a
    ≲handful-row corpus, but ANSI would crash there). Parity: DuckDB
    hex→int is ('0x'||h)::UBIGINT, Spark is conv(h,16,10) — the
    feat_hashing precedent — and md5 hex is lowercase on both."""
    o = t(spark, sf, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    fan = o.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"),
        "o_orderkey",
    ).select(
        "b",
        "cents",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("o_orderkey").cast("string"),
                            F.lit(":"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("long")
            % 3
        ).alias("w"),
    )
    agg = fan.groupBy("b").agg(
        F.sum("w").cast("long").alias("n_eff"),
        F.sum(F.col("w") * F.col("cents")).cast("long").alias("wcents"),
    )
    return agg.select(
        F.col("b").cast("int").alias("b"),
        "n_eff",
        F.when(F.col("n_eff") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("wcents").cast("double") / F.col("n_eff") / F.lit(100.0),
                6,
            )
            + F.lit(0.0)
        )
        .alias("mean_price"),
    )


# ---------------------------------------------------------------------------
# exact ROC AUC — the rank-sum (Mann-Whitney) identity, doubled ranks
# ---------------------------------------------------------------------------
@q(
    "ml_auc",
    f"""
    WITH {_SCORE_SQL},
    ark AS (
      SELECT cnt, p,
             2 * SUM(cnt) OVER (ORDER BY cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - cnt + 1 AS rx2
      FROM pv),
    m AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(p) AS BIGINT) AS np,
             CAST(SUM(cnt - p) AS BIGINT) AS nn,
             CAST(SUM(p * rx2) AS BIGINT) AS s2
      FROM ark)
    SELECT COALESCE(n, 0) AS n, COALESCE(np, 0) AS n_pos,
           COALESCE(nn, 0) AS n_neg,
           CASE WHEN np IS NULL OR np = 0 OR nn = 0 THEN NULL
                ELSE CAST(s2 - np * (np + 1) AS BIGINT) END AS u2,
           CASE WHEN np IS NULL OR np = 0 OR nn = 0 THEN NULL
                ELSE round(CAST(s2 - np * (np + 1) AS DOUBLE)
                           / (2.0 * np * nn), 6) + 0 END AS auc
    FROM m
    """,
)
def ml_auc(spark, sf):
    """Exact ROC AUC for the score-vs-purchase signal via the
    rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) — the
    threshold-free summary of ml_pr_curve's operating curve and the
    headline number a quality-classifier gate reports. The naive
    spelling pairs every positive with every negative (n⁺·n⁻
    comparisons — quadratic in the corpus); the rank identity needs
    only tie-averaged ranks, which arrive as the stat_mannwhitney
    DOUBLED-rank integers over the per-distinct-score support
    (2·rank = 2·cumprev + cnt + 1, an inclusive ROWS cumulative since
    each support row IS one tie group), so Σ 2·rank⁺ = Σ p·rx2 is an
    exact order-independent BIGINT aggregate and u2 = 2U is exact —
    ties between a positive and a negative contribute the standard
    half credit. Scale shape: ONE corpus scan to the support (shared
    `_score_support`, audit #44's family), one window over the
    bounded support, one final agg; headroom rx2 ≤ 2n so s2 ≤ 2n² —
    exact far past bench scales. The only float is the final round-6
    division; n⁺ = 0 or n⁻ = 0 (single-class corpus) NULL-guards
    both outputs (ANSI DIVIDE_BY_ZERO)."""
    pv = _score_support(spark, sf)
    wi = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ark = pv.select(
        "cnt",
        "p",
        (F.lit(2) * F.sum("cnt").over(wi) - F.col("cnt") + 1).alias("rx2"),
    )
    m = ark.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("p").cast("long").alias("np"),
        F.sum(F.col("cnt") - F.col("p")).cast("long").alias("nn"),
        F.sum(F.col("p") * F.col("rx2")).cast("long").alias("s2"),
    )
    bad = (
        F.col("np").isNull() | (F.col("np") == 0) | (F.col("nn") == 0)
    )
    u2 = F.col("s2") - F.col("np") * (F.col("np") + 1)
    return m.select(
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("np"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.col("nn"), F.lit(0)).alias("n_neg"),
        F.when(bad, F.lit(None).cast("long"))
        .otherwise(u2.cast("long"))
        .alias("u2"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                u2.cast("double")
                / (F.lit(2.0) * F.col("np") * F.col("nn")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("auc"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b — concordance counting on the bounded cell support
# ---------------------------------------------------------------------------
@q(
    "stat_kendall",
    """
    WITH v AS (
      SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qx,
             CAST(round(l_discount * 100) AS BIGINT) AS qy
      FROM lineitem),
    cells AS (
      SELECT qx, qy, CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY qx, qy),
    tt AS (
      SELECT c, SUM(c) OVER (PARTITION BY qx) AS tx,
             SUM(c) OVER (PARTITION BY qy) AS ty,
             SUM(c) OVER () AS n
      FROM cells),
    tm AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(c * (tx - 1)) AS BIGINT) AS tx2,
             CAST(SUM(c * (ty - 1)) AS BIGINT) AS ty2
      FROM tt),
    cd AS (
      SELECT CAST(SUM(CASE WHEN a.qy < b.qy THEN a.c * b.c ELSE 0 END)
                  AS BIGINT) AS conc,
             CAST(SUM(CASE WHEN a.qy > b.qy THEN a.c * b.c ELSE 0 END)
                  AS BIGINT) AS disc
      FROM cells a JOIN cells b ON a.qx < b.qx)
    SELECT COALESCE(tm.n, 0) AS n, COALESCE(conc, 0) AS conc,
           COALESCE(disc, 0) AS disc,
           CASE WHEN tm.n IS NULL OR tm.n < 2
                     OR tm.n * (tm.n - 1) - tx2 <= 0
                     OR tm.n * (tm.n - 1) - ty2 <= 0 THEN NULL
                ELSE round(2.0 * (conc - disc)
                           / sqrt(CAST(tm.n * (tm.n - 1) - tx2 AS DOUBLE)
                                  * CAST(tm.n * (tm.n - 1) - ty2
                                         AS DOUBLE)), 6) + 0
           END AS tau_b
    FROM tm CROSS JOIN cd
    """,
)
def stat_kendall(spark, sf):
    """Kendall tau-b between quantity and discount — the pair-
    concordance complement to stat_spearman (Spearman correlates the
    RANKS, tau counts pairwise order agreements; robustness folklore
    prefers tau under heavy ties, exactly the quantized-signal
    regime). The naive spelling compares all n(n−1)/2 row pairs; over
    quantized/categorical signals the corpus collapses ONCE to the
    contingency-cell support (|domX|·|domY| cells — value-domain-
    bounded, NOT corpus-bounded) and every term is exact integer
    arithmetic on cells: concordant/discordant pairs from the
    |cells|² ordered cell join (a.qx < b.qx, tiny × tiny — NEVER a
    corpus self-join), tie corrections as windows over the SAME cell
    relation (2n1 = Σ c·(tx−1) with tx a PARTITION BY qx window —
    the per-x-group spelling would be a second branch). The cell
    relation feeds 2 consumers, so it is parquet-checkpointed (the
    text_jsd / events_locf discipline: per-branch column pruning
    defeats ReuseExchange and each branch would re-scan the corpus).
    tau_b = 2(C−D)/√(d1·d2) with d1 = n(n−1) − Σtx(tx−1) exact
    BIGINTs; headroom C ≤ n²/2 (exact past 10⁹ rows). Degenerate
    inputs — empty, n<2, all-tied on either axis (d ≤ 0) —
    short-circuit to NULL (the kg_assortativity ANSI guard)."""
    from ..operators.dedup import parquet_checkpoint

    v = t(spark, sf, "lineitem").select(
        F.round(F.col("l_quantity") * 100).cast("long").alias("qx"),
        F.round(F.col("l_discount") * 100).cast("long").alias("qy"),
    )
    cells = parquet_checkpoint(
        v.groupBy("qx", "qy").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        "kendall_cells",
    )
    wx = Window.partitionBy("qx")
    wy = Window.partitionBy("qy")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tt = cells.select(
        "c",
        F.sum("c").over(wx).alias("tx"),
        F.sum("c").over(wy).alias("ty"),
        F.sum("c").over(wall).alias("n"),
    )
    tm = tt.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.col("c") * (F.col("tx") - 1)).cast("long").alias("tx2"),
        F.sum(F.col("c") * (F.col("ty") - 1)).cast("long").alias("ty2"),
    )
    a = cells.select(
        F.col("qx").alias("ax"), F.col("qy").alias("ay"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("qx").alias("bx"), F.col("qy").alias("by"), F.col("c").alias("cb")
    )
    pair = F.col("ca") * F.col("cb")
    cd = a.join(b, F.col("ax") < F.col("bx")).agg(
        F.sum(F.when(F.col("ay") < F.col("by"), pair).otherwise(0))
        .cast("long")
        .alias("conc"),
        F.sum(F.when(F.col("ay") > F.col("by"), pair).otherwise(0))
        .cast("long")
        .alias("disc"),
    )
    d1 = F.col("n") * (F.col("n") - 1) - F.col("tx2")
    d2 = F.col("n") * (F.col("n") - 1) - F.col("ty2")
    bad = F.col("n").isNull() | (F.col("n") < 2) | (d1 <= 0) | (d2 <= 0)
    return tm.crossJoin(cd).select(
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("conc"), F.lit(0)).alias("conc"),
        F.coalesce(F.col("disc"), F.lit(0)).alias("disc"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(2.0) * (F.col("conc") - F.col("disc"))
                / F.sqrt(d1.cast("double") * d2.cast("double")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# confusion matrix + derived metrics at a fixed operating threshold
# ---------------------------------------------------------------------------
_CONF_T = 3500  # predict positive when cents >= 3500 (value >= 35)


@q(
    "ml_confusion",
    f"""
    WITH {_SCORE_SQL},
    m AS (
      SELECT CAST(SUM(CASE WHEN cents >= {_CONF_T} THEN p ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN cents >= {_CONF_T} THEN cnt - p ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN cents < {_CONF_T} THEN p ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN cents < {_CONF_T} THEN cnt - p ELSE 0 END)
                  AS BIGINT) AS tn
      FROM pv)
    SELECT COALESCE(tp, 0) AS tp, COALESCE(fp, 0) AS fp,
           COALESCE(fn, 0) AS fn, COALESCE(tn, 0) AS tn,
           CASE WHEN tp IS NULL OR tp + fp + fn + tn = 0 THEN NULL
                ELSE round((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE),
                           6) + 0 END AS accuracy,
           CASE WHEN tp IS NULL OR tp + fp = 0 THEN NULL
                ELSE round(tp / CAST(tp + fp AS DOUBLE), 6) + 0
           END AS precision_,
           CASE WHEN tp IS NULL OR tp + fn = 0 THEN NULL
                ELSE round(tp / CAST(tp + fn AS DOUBLE), 6) + 0
           END AS recall_,
           CASE WHEN tp IS NULL OR 2 * tp + fp + fn = 0 THEN NULL
                ELSE round(2 * tp / CAST(2 * tp + fp + fn AS DOUBLE), 6)
                     + 0 END AS f1
    FROM m
    """,
)
def ml_confusion(spark, sf):
    """Confusion matrix and the derived operating-point metrics
    (accuracy / precision / recall / F1) for the score-vs-purchase
    signal at a FIXED deployment threshold — ml_pr_curve sweeps the
    curve and ml_auc integrates it; this face is the number a
    shipped gate actually runs at. All four cells are conditional
    integer sums over the shared one-scan `_score_support` relation
    (never four filtered corpus branches); F1 uses the closed form
    2tp/(2tp+fp+fn) so each metric is ONE guarded division over
    exact BIGINTs (ANSI DIVIDE_BY_ZERO short-circuits each metric
    independently: an all-negative corpus still reports accuracy).
    Empty corpus emits the zero matrix with NULL metrics — total."""
    pv = _score_support(spark, sf)
    hit = F.col("cents") >= _CONF_T
    m = pv.agg(
        F.sum(F.when(hit, F.col("p")).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(hit, F.col("cnt") - F.col("p")).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~hit, F.col("p")).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~hit, F.col("cnt") - F.col("p")).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))

    def _ratio(num, den):
        return F.when(
            tp.isNull() | (den == 0), F.lit(None).cast("double")
        ).otherwise(F.round(num / den.cast("double"), 6) + F.lit(0.0))

    return m.select(
        F.coalesce(tp, F.lit(0)).alias("tp"),
        F.coalesce(fp, F.lit(0)).alias("fp"),
        F.coalesce(fn, F.lit(0)).alias("fn"),
        F.coalesce(tn, F.lit(0)).alias("tn"),
        _ratio(tp + tn, tp + fp + fn + tn).alias("accuracy"),
        _ratio(tp, tp + fp).alias("precision_"),
        _ratio(tp, tp + fn).alias("recall_"),
        _ratio(F.lit(2) * tp, F.lit(2) * tp + fp + fn).alias("f1"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H — k-group rank test on the doubled-rank support
# ---------------------------------------------------------------------------
@q(
    "stat_kruskal",
    """
    WITH lab AS (
      SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    pv AS (
      SELECT g, cents, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lab GROUP BY g, cents),
    rk AS (
      SELECT g, cents, cnt,
             SUM(cnt) OVER (PARTITION BY cents) AS tc,
             SUM(cnt) OVER (ORDER BY cents
                            RANGE BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM pv),
    cell AS (
      SELECT g, cnt, cnt * (2 * (cum - tc) + tc + 1) AS r2c,
             cnt * (tc * tc - 1) AS tie
      FROM rk),
    grp AS (
      SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_g,
             CAST(SUM(r2c) AS BIGINT) AS r2g,
             CAST(SUM(tie) AS BIGINT) AS tie_g
      FROM cell GROUP BY g),
    hs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(CAST(round(3.0 * r2g * r2g / n_g) AS BIGINT))
                  AS BIGINT) AS hsum,
             CAST(SUM(tie_g) AS BIGINT) AS tsum
      FROM grp)
    SELECT COALESCE(k, 0) AS k, COALESCE(n, 0) AS n,
           CASE WHEN n IS NULL OR n < 2 OR k < 2
                     OR 1.0 * n * n * n - n <= tsum THEN NULL
                ELSE round((hsum / (1.0 * n * (n + 1)) - 3.0 * (n + 1))
                           / (1.0 - tsum / (1.0 * n * n * n - n)), 6)
                     + 0 END AS h_adj
    FROM hs
    """,
)
def stat_kruskal(spark, sf):
    """Kruskal-Wallis H across the k event types — the k-group
    generalization of stat_mannwhitney (does ANY group's value
    distribution dominate?) and the nonparametric twin of
    stat_anova. Rides the doubled-rank support: one corpus agg to
    (group, cents, cnt) cells; the GLOBAL tie-rank arrives as the
    audit-#44 window pair (per-cents PARTITION total tc + RANGE
    cumulative, doubled rank = 2*(cum - tc) + tc + 1) so every
    per-cell rank mass r2c and tie term cnt*(tc^2 - 1) (which sums
    to exactly t^3 - t per tied value) is an order-independent
    BIGINT. Per-group H contributions 3*r2g^2/n_g are quantized
    round-to-integer (r2g^2 exceeds BIGINT past ~2^31 rows, so the
    square runs in DOUBLE — identical multiply/divide/round op
    order on both engines; sub-unit quantization noise is 1e-15 of
    H's magnitude); the k-term sum is then again an exact integer
    agg. NULL guards: n < 2, a single group, or all values tied
    (the tie-corrected denominator hits zero — ANSI
    DIVIDE_BY_ZERO). One scan, windows over the support, one tiny
    final agg."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    lab = e.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    pv = lab.groupBy("g", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wtc = Window.partitionBy("cents")
    wcum = Window.orderBy("cents").rangeBetween(
        Window.unboundedPreceding, 0
    )
    rk = pv.select(
        "g",
        "cnt",
        F.sum("cnt").over(wtc).alias("tc"),
        F.sum("cnt").over(wcum).alias("cum"),
    )
    cell = rk.select(
        "g",
        "cnt",
        (
            F.col("cnt")
            * (
                F.lit(2) * (F.col("cum") - F.col("tc"))
                + F.col("tc")
                + 1
            )
        ).alias("r2c"),
        (F.col("cnt") * (F.col("tc") * F.col("tc") - 1)).alias("tie"),
    )
    grp = cell.groupBy("g").agg(
        F.sum("cnt").cast("long").alias("n_g"),
        F.sum("r2c").cast("long").alias("r2g"),
        F.sum("tie").cast("long").alias("tie_g"),
    )
    hs = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(
            F.round(
                F.lit(3.0) * F.col("r2g") * F.col("r2g") / F.col("n_g")
            ).cast("long")
        )
        .cast("long")
        .alias("hsum"),
        F.sum("tie_g").cast("long").alias("tsum"),
    )
    n, k = F.col("n"), F.col("k")
    bad = (
        n.isNull()
        | (n < 2)
        | (k < 2)
        | (F.lit(1.0) * n * n * n - n <= F.col("tsum"))
    )
    h = F.col("hsum") / (F.lit(1.0) * n * (n + 1)) - F.lit(3.0) * (n + 1)
    c = F.lit(1.0) - F.col("tsum") / (F.lit(1.0) * n * n * n - n)
    return hs.select(
        F.coalesce(k, F.lit(0)).alias("k"),
        F.coalesce(n, F.lit(0)).alias("n"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(h / c, 6) + F.lit(0.0))
        .alias("h_adj"),
    )


# ---------------------------------------------------------------------------
# calibration / reliability bins + Brier score — milli-quantized probs
# ---------------------------------------------------------------------------
@q(
    "ml_calibration",
    f"""
    WITH {_SCORE_SQL},
    w AS (
      SELECT cents, cnt, p,
             MIN(cents) OVER () AS mn, MAX(cents) OVER () AS mx
      FROM pv),
    ph AS (
      SELECT cnt, p,
             CASE WHEN mx = mn THEN 500
                  ELSE CAST(round(1000.0 * (cents - mn) / (mx - mn))
                       AS BIGINT) END AS ph
      FROM w),
    b AS (
      SELECT LEAST(ph // 100, 9) AS bin,
             CAST(SUM(cnt) AS BIGINT) AS n_b,
             CAST(SUM(p) AS BIGINT) AS pos_b,
             CAST(SUM(cnt * ph) AS BIGINT) AS sph,
             CAST(SUM(cnt * ph * ph - 2000 * ph * p + 1000000 * p)
                  AS BIGINT) AS bterm
      FROM ph GROUP BY 1)
    SELECT CAST(bin AS BIGINT) AS bin, n_b, pos_b,
           round(sph / (1000.0 * n_b), 6) + 0 AS mean_pred,
           round(pos_b / CAST(n_b AS DOUBLE), 6) + 0 AS frac_pos,
           round(SUM(bterm) OVER ()
                 / (1000000.0 * SUM(n_b) OVER ()), 6) + 0 AS brier
    FROM b
    """,
)
def ml_calibration(spark, sf):
    """Reliability diagram + Brier score for the score-vs-purchase
    signal: min-max-map the score to a pseudo-probability, bucket
    into 10 equal-width bins, and report per-bin (count, mean
    predicted, empirical positive rate) with the overall Brier score
    in every gated row — the calibration complement to ml_auc
    (discrimination) and ml_confusion (one operating point). The
    pseudo-probability is quantized to integer MILLI units (one
    round() of one division whose operands are exact integers —
    identical op order both engines), after which EVERYTHING is
    exact BIGINT arithmetic: the per-cell Brier mass expands
    (ph−1000y)² over binary y to cnt·ph² − 2000·ph·p + 10⁶·p, so the
    corpus Brier is an order-independent integer sum divided once at
    the end. Corpus min/max arrive as OVER () windows on the
    one-scan `_score_support` relation (never a stats branch); the
    bin totals for Brier are OVER () windows on the ≤10-row bin
    relation. Degenerate single-score corpus pins ph=500; empty
    corpus emits zero rows — total."""
    pv = _score_support(spark, sf)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = pv.select(
        "cents",
        "cnt",
        "p",
        F.min("cents").over(wall).alias("mn"),
        F.max("cents").over(wall).alias("mx"),
    )
    ph = w.select(
        "cnt",
        "p",
        F.when(F.col("mx") == F.col("mn"), F.lit(500).cast("long"))
        .otherwise(
            F.round(
                F.lit(1000.0)
                * (F.col("cents") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
            ).cast("long")
        )
        .alias("ph"),
    )
    b = ph.groupBy(
        F.least(F.floor(F.col("ph") / 100), F.lit(9))
        .cast("long")
        .alias("bin")
    ).agg(
        F.sum("cnt").cast("long").alias("n_b"),
        F.sum("p").cast("long").alias("pos_b"),
        F.sum(F.col("cnt") * F.col("ph")).cast("long").alias("sph"),
        F.sum(
            F.col("cnt") * F.col("ph") * F.col("ph")
            - F.lit(2000) * F.col("ph") * F.col("p")
            + F.lit(1000000) * F.col("p")
        )
        .cast("long")
        .alias("bterm"),
    )
    return b.select(
        "bin",
        "n_b",
        "pos_b",
        (
            F.round(F.col("sph") / (F.lit(1000.0) * F.col("n_b")), 6)
            + F.lit(0.0)
        ).alias("mean_pred"),
        (
            F.round(F.col("pos_b") / F.col("n_b").cast("double"), 6)
            + F.lit(0.0)
        ).alias("frac_pos"),
        (
            F.round(
                F.sum("bterm").over(wall)
                / (F.lit(1000000.0) * F.sum("n_b").over(wall)),
                6,
            )
            + F.lit(0.0)
        ).alias("brier"),
    )


# ---------------------------------------------------------------------------
# NDCG@10 — per-user ranking quality with literal micro-discounts
# ---------------------------------------------------------------------------
import math as _math

_NDCG_K = 10
# 1/log2(i+1) discounts quantized to integer micros ONCE at import —
# embedded as literals in BOTH engines' plans, so no runtime ln/log2
# (whose libm bits could differ) ever executes.
_NDCG_D = [
    round(1_000_000 / _math.log2(i + 1)) for i in range(1, _NDCG_K + 1)
]
_NDCG_C = [0]
for _d in _NDCG_D:
    _NDCG_C.append(_NDCG_C[-1] + _d)
del _d


@q(
    "ml_ndcg",
    f"""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT user_id, rel,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY cents DESC, event_id) AS rn,
             SUM(rel) OVER (PARTITION BY user_id) AS rtot
      FROM e),
    u AS (
      SELECT user_id,
             CAST(SUM(rel * list_extract({_NDCG_D!r}, rn)) AS BIGINT)
               AS dcg,
             CAST(MAX(list_extract({_NDCG_C!r},
                      CAST(LEAST(rtot, {_NDCG_K}) AS INT) + 1))
                  AS BIGINT) AS idcg
      FROM r WHERE rn <= {_NDCG_K} GROUP BY user_id),
    v AS (
      SELECT CASE WHEN idcg > 0
                  THEN CAST(round(1000000.0 * dcg / idcg) AS BIGINT)
             END AS nd
      FROM u)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(nd) AS BIGINT) AS n_eval,
           CASE WHEN COUNT(nd) = 0 THEN NULL
                ELSE round(SUM(nd) / (1000000.0 * COUNT(nd)), 6) + 0
           END AS mean_ndcg
    FROM v
    """,
)
def ml_ndcg(spark, sf):
    """Mean NDCG@{k} treating each user as a retrieval query: their
    events ranked by score (cents DESC, event_id tiebreak — total
    order, so the ranking is deterministic across engines and
    partitionings), relevance = purchase. The position discounts
    1/log2(i+1) and their ideal prefix sums are quantized to integer
    MICROS once at Python import and embedded as ARRAY LITERALS in
    both plans (element_at / list_extract by rank) — no runtime
    logarithm, no 10-row join: the discount attach is map-side
    expression work. Per-user DCG and IDCG (ideal = first
    min(R,{k}) discounts, R the user's total relevant count,
    arriving as a window over the SAME user partition as the
    row_number — one Exchange total) are exact integers; per-user
    NDCG is one division quantized to micros; the corpus mean is an
    exact integer sum divided once. Users with zero relevant events
    have IDCG 0 and are excluded from the mean (reported via
    n_users vs n_eval), the standard convention — and the ANSI
    divide guard. Empty corpus: (0, 0, NULL)."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    lab = e.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("rel"),
    )
    wu = Window.partitionBy("user_id")
    wrn = wu.orderBy(F.desc("cents"), "event_id")
    r = lab.select(
        "user_id",
        "rel",
        F.row_number().over(wrn).alias("rn"),
        F.sum("rel").over(wu).alias("rtot"),
    ).filter(F.col("rn") <= _NDCG_K)
    d_arr = F.array(*[F.lit(x) for x in _NDCG_D])
    c_arr = F.array(*[F.lit(x) for x in _NDCG_C])
    u = r.groupBy("user_id").agg(
        F.sum(F.col("rel") * F.element_at(d_arr, F.col("rn")))
        .cast("long")
        .alias("dcg"),
        F.max(
            F.element_at(
                c_arr,
                (F.least(F.col("rtot"), F.lit(_NDCG_K)) + 1).cast("int"),
            )
        )
        .cast("long")
        .alias("idcg"),
    )
    v = u.select(
        F.when(
            F.col("idcg") > 0,
            F.round(
                F.lit(1000000.0) * F.col("dcg") / F.col("idcg")
            ).cast("long"),
        ).alias("nd")
    )
    return v.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("nd").cast("long").alias("n_eval"),
        F.when(F.count("nd") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sum("nd") / (F.lit(1000000.0) * F.count("nd")), 6
            )
            + F.lit(0.0)
        )
        .alias("mean_ndcg"),
    )


ml_ndcg.__doc__ = ml_ndcg.__doc__.format(k=_NDCG_K)


# ---------------------------------------------------------------------------
# Cohen's kappa — chance-corrected agreement, exact integer form
# ---------------------------------------------------------------------------
@q(
    "ml_cohen_kappa",
    f"""
    WITH {_SCORE_SQL},
    m AS (
      SELECT CAST(SUM(CASE WHEN cents >= {_CONF_T} THEN p ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN cents >= {_CONF_T} THEN cnt - p ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN cents < {_CONF_T} THEN p ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN cents < {_CONF_T} THEN cnt - p ELSE 0 END)
                  AS BIGINT) AS tn
      FROM pv),
    x AS (
      SELECT tp, fp, fn, tn, tp + fp + fn + tn AS n,
             (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn) AS pe_num
      FROM m)
    SELECT COALESCE(n, 0) AS n,
           CASE WHEN tp IS NULL OR n = 0 THEN NULL
                ELSE round((tp + tn) / CAST(n AS DOUBLE), 6) + 0
           END AS po,
           CASE WHEN tp IS NULL OR n = 0 THEN NULL
                ELSE round(pe_num / (1.0 * n * n), 6) + 0 END AS pe,
           CASE WHEN tp IS NULL OR n = 0 OR n * n = pe_num THEN NULL
                ELSE round(CAST(n * (tp + tn) - pe_num AS DOUBLE)
                           / (n * n - pe_num), 6) + 0 END AS kappa
    FROM x
    """,
)
def ml_cohen_kappa(spark, sf):
    """Cohen's kappa between the thresholded score (ml_confusion's
    operating point) and the purchase label — chance-corrected
    agreement, the number that deflates ml_confusion's accuracy when
    the classes are imbalanced (a constant predictor on a 95/5 split
    scores 0.95 accuracy but kappa 0). Clearing denominators turns
    kappa = (po − pe)/(1 − pe) into the all-integer form
    (n·(tp+tn) − pe_num)/(n² − pe_num) with pe_num =
    (tp+fp)(tp+fn) + (fn+tn)(fp+tn) — one guarded division over
    exact BIGINTs from the same one-scan `_score_support`
    conditional sums. NULL guards: empty corpus, and the degenerate
    pe = 1 corpus (all four cells in one margin pair — ANSI
    DIVIDE_BY_ZERO). Headroom: pe_num ≤ n², exact to ~3·10⁹ rows."""
    pv = _score_support(spark, sf)
    hit = F.col("cents") >= _CONF_T
    m = pv.agg(
        F.sum(F.when(hit, F.col("p")).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(hit, F.col("cnt") - F.col("p")).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~hit, F.col("p")).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~hit, F.col("cnt") - F.col("p")).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    x = m.select(
        tp,
        fp,
        fn,
        tn,
        (tp + fp + fn + tn).alias("n"),
        ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)).alias("pe_num"),
    )
    n, pe_num = F.col("n"), F.col("pe_num")
    return x.select(
        F.coalesce(n, F.lit(0)).alias("n"),
        F.when(tp.isNull() | (n == 0), F.lit(None).cast("double"))
        .otherwise(F.round((tp + tn) / n.cast("double"), 6) + F.lit(0.0))
        .alias("po"),
        F.when(tp.isNull() | (n == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(pe_num / (F.lit(1.0) * n * n), 6) + F.lit(0.0)
        )
        .alias("pe"),
        F.when(
            tp.isNull() | (n == 0) | (n * n == pe_num),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (n * (tp + tn) - pe_num).cast("double")
                / (n * n - pe_num),
                6,
            )
            + F.lit(0.0)
        )
        .alias("kappa"),
    )


# ---------------------------------------------------------------------------
# held-out unigram perplexity — the canonical LM corpus-quality metric
# ---------------------------------------------------------------------------
@q(
    "ml_perplexity",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tk
      FROM documents),
    lab AS (
      SELECT tk,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS tr
      FROM tok WHERE tk <> ''),
    ta AS (
      SELECT tk, CAST(COUNT(*) AS BIGINT) AS ca
      FROM lab WHERE tr = 1 GROUP BY tk),
    taw AS (
      SELECT tk, ca, SUM(ca) OVER () AS na, COUNT(*) OVER () AS v
      FROM ta),
    lp AS (
      SELECT tk,
             CAST(round(1000000.0
                  * ln((ca + 1) / (CAST(na AS DOUBLE) + v + 1)))
                  AS BIGINT) AS lpm
      FROM taw),
    oov AS (
      SELECT CAST(round(1000000.0
                  * ln(1.0 / (CAST(MAX(na) AS DOUBLE) + MAX(v) + 1)))
                  AS BIGINT) AS lpm
      FROM taw),
    tb AS (
      SELECT tk, CAST(COUNT(*) AS BIGINT) AS cb
      FROM lab WHERE tr = 0 GROUP BY tk),
    j AS (
      SELECT tb.cb,
             COALESCE(lp.lpm, oov.lpm) AS lpm,
             CASE WHEN lp.tk IS NULL THEN tb.cb ELSE 0 END AS ov
      FROM tb LEFT JOIN lp ON lp.tk = tb.tk CROSS JOIN oov),
    s AS (
      SELECT CAST(SUM(cb) AS BIGINT) AS n_eval,
             CAST(SUM(cb * lpm) AS BIGINT) AS ll,
             CAST(SUM(ov) AS BIGINT) AS n_oov
      FROM j)
    SELECT COALESCE(n_eval, 0) AS n_eval, COALESCE(n_oov, 0) AS n_oov,
           CASE WHEN n_eval IS NULL OR n_eval = 0 THEN NULL
                ELSE round(n_oov / CAST(n_eval AS DOUBLE), 6) + 0
           END AS oov_rate,
           CASE WHEN n_eval IS NULL OR n_eval = 0 OR ll IS NULL THEN NULL
                ELSE round(exp(-(ll / 1000000.0) / n_eval), 6) + 0
           END AS ppl
    FROM s
    """,
)
def ml_perplexity(spark, sf):
    """Held-out unigram perplexity — THE corpus-quality number an LM
    data pipeline tracks per source/snapshot (rising PPL under a
    frozen reference model flags drift or contamination; falling
    PPL on boilerplate flags duplication). Documents split
    train/eval by the md5(doc_id) coin (the stat_ttest halves —
    deterministic, no RNG); the train half fits a Laplace-smoothed
    unigram LM, p(tk) = (c_tk + 1)/(N + V + 1) with one shared
    OOV bucket, and the eval half scores
    PPL = exp(−Σ ln p / N_eval). Exactness: each distinct eval
    token's ln p is ONE log of ONE division quantized to integer
    micros, multiplied by the exact eval count and summed — an
    order-independent BIGINT (kg_adamic_adar discipline); N and V
    ride the train support as OVER () windows (never a stats
    branch). The eval→train attach is a vocabulary-sized LEFT join
    left UNHINTED — the r3 text_unigram_lm lesson: never force a
    corpus-cardinality broadcast; AQE broadcasts when it truly
    fits. The OOV log-prob is a 1-row cross join (the allowed
    scalar broadcast). Empty eval half → (0, 0, NULL, NULL);
    empty train half → NULL ppl via the NULL-propagating OOV row —
    total either way."""
    from ..operators.dedup import parquet_checkpoint

    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tk")
    ).filter(F.col("tk") != "")
    lab = tok.select(
        "tk",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8",
            1,
        )
        .otherwise(0)
        .alias("tr"),
    )
    lab = parquet_checkpoint(lab, "ppl_lab")
    ta = (
        lab.filter(F.col("tr") == 1)
        .groupBy("tk")
        .agg(F.count(F.lit(1)).cast("long").alias("ca"))
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    taw = parquet_checkpoint(
        ta.select(
            "tk",
            "ca",
            F.sum("ca").over(wall).alias("na"),
            F.count(F.lit(1)).over(wall).alias("v"),
        ),
        "ppl_taw",
    )
    lp = taw.select(
        "tk",
        F.round(
            F.lit(1000000.0)
            * F.log(
                (F.col("ca") + 1)
                / (F.col("na").cast("double") + F.col("v") + 1)
            )
        )
        .cast("long")
        .alias("lpm"),
    )
    oov = taw.agg(
        F.round(
            F.lit(1000000.0)
            * F.log(
                F.lit(1.0)
                / (F.max("na").cast("double") + F.max("v") + 1)
            )
        )
        .cast("long")
        .alias("lpm")
    )
    tb = (
        lab.filter(F.col("tr") == 0)
        .groupBy("tk")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    j = (
        tb.join(lp.withColumnRenamed("lpm", "lp_tk"), "tk", "left")
        .crossJoin(oov)
        .select(
            "cb",
            F.coalesce(F.col("lp_tk"), F.col("lpm")).alias("lpm"),
            F.when(F.col("lp_tk").isNull(), F.col("cb"))
            .otherwise(0)
            .alias("ov"),
        )
    )
    s = j.agg(
        F.sum("cb").cast("long").alias("n_eval"),
        F.sum(F.col("cb") * F.col("lpm")).cast("long").alias("ll"),
        F.sum("ov").cast("long").alias("n_oov"),
    )
    ne = F.col("n_eval")
    return s.select(
        F.coalesce(ne, F.lit(0)).alias("n_eval"),
        F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
        F.when(ne.isNull() | (ne == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("n_oov") / ne.cast("double"), 6) + F.lit(0.0)
        )
        .alias("oov_rate"),
        F.when(
            ne.isNull() | (ne == 0) | F.col("ll").isNull(),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.exp(-(F.col("ll") / F.lit(1000000.0)) / ne), 6
            )
            + F.lit(0.0)
        )
        .alias("ppl"),
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe (Levene) variance-homogeneity test — quarter-cent units
# ---------------------------------------------------------------------------
@q(
    "stat_levene",
    """
    WITH v AS (
      SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    med AS (
      SELECT g, CAST(round(4 * quantile_cont(cents, 0.5)) AS BIGINT)
               AS med4
      FROM v GROUP BY g),
    z AS (
      SELECT v.g, abs(4 * v.cents - med.med4) AS z
      FROM v JOIN med ON med.g = v.g),
    grp AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(z) AS BIGINT) AS s_g,
             CAST(SUM(z * z) AS BIGINT) AS q_g
      FROM z GROUP BY g),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s,
             CAST(SUM(q_g) AS BIGINT) AS q,
             CAST(SUM(CAST(round(1.0 * s_g * s_g / n_g) AS BIGINT))
                  AS BIGINT) AS bsum
      FROM grp)
    SELECT k, n,
           CASE WHEN k < 2 OR n <= k
                     OR q - bsum <= 0 THEN NULL
                ELSE round(((n - k) * (bsum - round(1.0 * s * s / n)))
                           / ((k - 1.0) * (q - bsum)), 6) + 0
           END AS w_stat
    FROM agg
    """,
)
def stat_levene(spark, sf):
    """Brown–Forsythe W (Levene's test with the median center) for
    variance homogeneity across event types — the gate in front of
    stat_anova (ANOVA assumes equal variances; when W is large,
    stat_ttest's Welch form is the honest comparison). The statistic
    is a one-way ANOVA on the absolute deviations z = |x − med_g|,
    carried here in exact QUARTER-CENT integers: the group medians
    are type-7 quantiles of integer cents (4·median is an exact
    BIGINT — the feat_robust_scale construction), so every z, Σz,
    and Σz² is exact; the per-group between-term s_g²/n_g is
    quantized round-to-integer (stat_anova's discipline — the
    square runs in DOUBLE with identical op order both engines) and
    the k-term sums are again exact BIGINTs. One guarded division
    at the end; NULL when k < 2, n ≤ k, or the within-variance is
    zero (ANSI DIVIDE_BY_ZERO). Scale shape: fit-then-apply — the
    per-group median relation broadcasts back onto the corpus scan
    (the events_mad layout); both aggregations are map-side
    combinable."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    v = e.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    med = v.groupBy("g").agg(
        F.round(F.lit(4) * F.expr("percentile(cents, 0.5)"))
        .cast("long")
        .alias("med4")
    )
    z = v.join(med, "g").select(
        "g", F.abs(F.lit(4) * F.col("cents") - F.col("med4")).alias("z")
    )
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("s_g"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("q_g"),
    )
    agg = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("q_g").cast("long").alias("q"),
        F.sum(
            F.round(
                F.lit(1.0) * F.col("s_g") * F.col("s_g") / F.col("n_g")
            ).cast("long")
        )
        .cast("long")
        .alias("bsum"),
    )
    k, n, s, qq, bsum = (
        F.col("k"),
        F.col("n"),
        F.col("s"),
        F.col("q"),
        F.col("bsum"),
    )
    bad = (k < 2) | (n <= k) | (qq - bsum <= 0)
    w = ((n - k) * (bsum - F.round(F.lit(1.0) * s * s / n))) / (
        (k - F.lit(1.0)) * (qq - bsum)
    )
    return agg.select(
        "k",
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(w, 6) + F.lit(0.0))
        .alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank — paired first-vs-last, doubled tie ranks
# ---------------------------------------------------------------------------
@q(
    "stat_wilcoxon",
    """
    WITH e AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
             (epoch_us(ts) // 1000000) * 1000000000 + event_id AS k
      FROM events WHERE value IS NOT NULL),
    fl AS (
      SELECT user_id,
             CAST(max_by(cents, k) - min_by(cents, k) AS BIGINT) AS d
      FROM e GROUP BY user_id),
    dnz AS (
      SELECT abs(d) AS ad, CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
      FROM fl WHERE d <> 0),
    sup AS (
      SELECT ad, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS cp
      FROM dnz GROUP BY ad),
    rk AS (
      SELECT cnt, cp,
             2 * COALESCE(SUM(cnt) OVER (ORDER BY ad
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) + cnt + 1 AS rx2
      FROM sup),
    s AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cp * rx2) AS BIGINT) AS w2p
      FROM rk)
    SELECT COALESCE(n, 0) AS n,
           CASE WHEN n IS NULL THEN NULL ELSE w2p END AS w2_plus,
           CASE WHEN n IS NULL OR n = 0 THEN NULL
                ELSE round(w2p / (1.0 * n * (n + 1)), 6) + 0
           END AS r_plus
    FROM s
    """,
)
def stat_wilcoxon(spark, sf):
    """Wilcoxon signed-rank on the PAIRED question "did a user's
    value grow between their first and last event?" — the paired
    complement to stat_mannwhitney (independent halves) and
    stat_ttest (mean shift): rank the nonzero |last − first|
    differences, W⁺ = rank mass of the positive ones; r⁺ =
    W⁺ / (n(n+1)/2) is the effect size in [0,1] (0.5 = symmetric).
    Pairing uses agg_first_last's composite integer key
    (whole-second epoch · 10⁹ + event_id — min_by/max_by, ONE
    map-side-combinable agg, never a per-user sort window);
    zero differences drop per the standard Wilcoxon convention.
    Ranks are the stat_mannwhitney DOUBLED tie-averaged integers
    over the per-|d| support (2·cumprev + cnt + 1), so W2⁺ = 2W⁺
    is an exact order-independent BIGINT and the only float is the
    final round-6 normalization (n = 0 — every user flat —
    NULL-guards it). One corpus scan → per-user agg → bounded
    support → one window."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    key = "unix_timestamp(ts) * 1000000000 + event_id"
    fl = e.selectExpr(
        "user_id",
        "CAST(round(value * 100) AS BIGINT) AS cents",
        f"{key} AS k",
    ).groupBy("user_id").agg(
        (F.expr("max_by(cents, k)") - F.expr("min_by(cents, k)"))
        .cast("long")
        .alias("d")
    )
    dnz = fl.filter(F.col("d") != 0).select(
        F.abs("d").alias("ad"),
        F.when(F.col("d") > 0, 1).otherwise(0).alias("pos"),
    )
    sup = dnz.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("cp"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    rk = sup.select(
        "cnt",
        "cp",
        (
            F.lit(2) * F.coalesce(F.sum("cnt").over(w), F.lit(0))
            + F.col("cnt")
            + 1
        ).alias("rx2"),
    )
    s = rk.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cp") * F.col("rx2")).cast("long").alias("w2p"),
    )
    n = F.col("n")
    return s.select(
        F.coalesce(n, F.lit(0)).alias("n"),
        F.when(n.isNull(), F.lit(None).cast("long"))
        .otherwise(F.col("w2p"))
        .alias("w2_plus"),
        F.when(n.isNull() | (n == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("w2p") / (F.lit(1.0) * n * (n + 1)), 6)
            + F.lit(0.0)
        )
        .alias("r_plus"),
    )


# ---------------------------------------------------------------------------
# log loss (cross-entropy) — clipped milli-probs, micros-quantized logs
# ---------------------------------------------------------------------------
@q(
    "ml_log_loss",
    f"""
    WITH {_SCORE_SQL},
    w AS (
      SELECT cents, cnt, p,
             MIN(cents) OVER () AS mn, MAX(cents) OVER () AS mx
      FROM pv),
    ph AS (
      SELECT cnt, p,
             LEAST(GREATEST(CASE WHEN mx = mn THEN 500
                   ELSE CAST(round(1000.0 * (cents - mn) / (mx - mn))
                        AS BIGINT) END, 1), 999) AS ph
      FROM w),
    lt AS (
      SELECT cnt, p,
             p * CAST(round(1000000.0 * ln(ph / 1000.0)) AS BIGINT)
             + (cnt - p)
               * CAST(round(1000000.0 * ln((1000 - ph) / 1000.0))
                      AS BIGINT) AS term
      FROM ph),
    s AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(term) AS BIGINT) AS ll
      FROM lt)
    SELECT COALESCE(n, 0) AS n,
           CASE WHEN n IS NULL OR n = 0 THEN NULL
                ELSE round(-(ll / 1000000.0) / n, 6) + 0
           END AS log_loss
    FROM s
    """,
)
def ml_log_loss(spark, sf):
    """Cross-entropy (log loss) of the min-max pseudo-probability
    against the purchase label — completes the proper-scoring-rule
    pair with ml_calibration's Brier (Brier is the quadratic rule,
    log loss the logarithmic one; log loss punishes CONFIDENT
    wrong predictions unboundedly, which is why it needs the
    clip). Probabilities are the ml_calibration milli-quantized
    min-max map, clipped to [0.001, 0.999] (the sklearn log_loss
    eps convention — an exact 0/1 prob with a wrong label is
    −ln 0); each distinct prob's two logs are micros-quantized
    individually and weighted by the EXACT (positive, negative)
    counts from the one-scan support, so the corpus log-likelihood
    is an order-independent BIGINT sum with one final division.
    Empty corpus → (0, NULL)."""
    pv = _score_support(spark, sf)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = pv.select(
        "cents",
        "cnt",
        "p",
        F.min("cents").over(wall).alias("mn"),
        F.max("cents").over(wall).alias("mx"),
    )
    ph_raw = F.when(
        F.col("mx") == F.col("mn"), F.lit(500).cast("long")
    ).otherwise(
        F.round(
            F.lit(1000.0)
            * (F.col("cents") - F.col("mn"))
            / (F.col("mx") - F.col("mn"))
        ).cast("long")
    )
    ph = w.select(
        "cnt",
        "p",
        F.least(F.greatest(ph_raw, F.lit(1)), F.lit(999)).alias("ph"),
    )
    lt = ph.select(
        "cnt",
        "p",
        (
            F.col("p")
            * F.round(
                F.lit(1000000.0) * F.log(F.col("ph") / F.lit(1000.0))
            ).cast("long")
            + (F.col("cnt") - F.col("p"))
            * F.round(
                F.lit(1000000.0)
                * F.log((F.lit(1000) - F.col("ph")) / F.lit(1000.0))
            ).cast("long")
        ).alias("term"),
    )
    s = lt.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("term").cast("long").alias("ll"),
    )
    n = F.col("n")
    return s.select(
        F.coalesce(n, F.lit(0)).alias("n"),
        F.when(n.isNull() | (n == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(-(F.col("ll") / F.lit(1000000.0)) / n, 6)
            + F.lit(0.0)
        )
        .alias("log_loss"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test — randomness of the daily revenue series
# ---------------------------------------------------------------------------
@q(
    "stat_runs",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    med AS (
      SELECT CAST(round(4 * quantile_cont(cents, 0.5)) AS BIGINT) AS med4
      FROM daily),
    sgn AS (
      SELECT day, CASE WHEN 4 * cents > med4 THEN 1 ELSE 0 END AS up
      FROM daily CROSS JOIN med WHERE 4 * cents <> med4),
    fl AS (
      SELECT up,
             CASE WHEN lag(up) OVER (ORDER BY day) IS DISTINCT FROM up
                  THEN 1 ELSE 0 END AS brk
      FROM sgn),
    s AS (
      SELECT CAST(SUM(up) AS BIGINT) AS n1,
             CAST(SUM(1 - up) AS BIGINT) AS n2,
             CAST(COALESCE(SUM(brk), 0) AS BIGINT) AS r
      FROM fl)
    SELECT COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2,
           CASE WHEN n1 IS NULL THEN NULL ELSE r END AS n_runs,
           CASE WHEN n1 IS NULL OR n1 = 0 OR n2 = 0
                     OR (n1 + n2 - 1.0)
                       * ((n1 + n2) * (n1 + n2))
                       * (2.0 * n1 * n2)
                       * (2.0 * n1 * n2 - n1 - n2) <= 0 THEN NULL
                ELSE round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                           / sqrt(2.0 * n1 * n2
                                  * (2.0 * n1 * n2 - n1 - n2)
                                  / (((n1 + n2) * 1.0) * (n1 + n2)
                                     * (n1 + n2 - 1))), 6) + 0
           END AS z
    FROM s
    """,
)
def stat_runs(spark, sf):
    """Wald–Wolfowitz runs test on the daily-revenue series: is the
    above/below-median pattern RANDOM, or does it streak
    (autocorrelation, regime shifts) / alternate (over-dispersion)?
    The day-level sequencing complement to events_autocorr's lag
    correlation — a distribution-free yes/no on serial dependence.
    Exactness: daily cents are exact BIGINT sums, the series median
    is the ×4 type-7 integer (feat_robust_scale construction),
    membership (above/below, exact-median days dropped per the
    standard convention) compares integers, and the run count is a
    LAG break-flag sum over the DAY-BOUNDED series (the
    events_gapfill date-spine precedent: an unpartitioned window is
    acceptable only on a |days|-sized relation, never corpus rows).
    The normal-approximation z runs in identical float op order on
    both engines with round-6; one-sided classes (all days above,
    all below) NULL-guard it."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    from ..operators.dedup import parquet_checkpoint

    # 2 consumers (median fit + sign pass) — checkpoint the bounded
    # daily relation or each branch re-scans the corpus
    daily = parquet_checkpoint(
        e.groupBy(
            F.floor(us / F.lit(86400000000)).cast("long").alias("day")
        ).agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        ),
        "runs_daily",
    )
    med = daily.agg(
        F.round(F.lit(4) * F.expr("percentile(cents, 0.5)"))
        .cast("long")
        .alias("med4")
    )
    sgn = (
        daily.crossJoin(med)
        .filter(F.lit(4) * F.col("cents") != F.col("med4"))
        .select(
            "day",
            F.when(F.lit(4) * F.col("cents") > F.col("med4"), 1)
            .otherwise(0)
            .alias("up"),
        )
    )
    w = Window.orderBy("day")
    fl = sgn.select(
        "up",
        F.when(
            F.lag("up").over(w).isNull()
            | (F.lag("up").over(w) != F.col("up")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    s = fl.agg(
        F.sum("up").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("up")).cast("long").alias("n2"),
        F.coalesce(F.sum("brk"), F.lit(0)).cast("long").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    nt = n1 + n2
    var_num = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
    )
    var_den = (nt * F.lit(1.0)) * nt * (nt - 1)
    bad = (
        n1.isNull()
        | (n1 == 0)
        | (n2 == 0)
        | (
            (nt - F.lit(1.0))
            * (nt * nt)
            * (F.lit(2.0) * n1 * n2)
            * (F.lit(2.0) * n1 * n2 - n1 - n2)
            <= 0
        )
    )
    z = (r - (F.lit(2.0) * n1 * n2 / nt + 1)) / F.sqrt(var_num / var_den)
    return s.select(
        F.coalesce(n1, F.lit(0)).alias("n1"),
        F.coalesce(n2, F.lit(0)).alias("n2"),
        F.when(n1.isNull(), F.lit(None).cast("long"))
        .otherwise(r)
        .alias("n_runs"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6) + F.lit(0.0))
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# population stability index — the deployed-model drift monitor
# ---------------------------------------------------------------------------
@q(
    "ml_psi",
    """
    WITH lab AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ina
      FROM events WHERE value IS NOT NULL),
    cuts AS (
      SELECT [CAST(round(10 * quantile_cont(cents, 0.1)) AS BIGINT),
              CAST(round(10 * quantile_cont(cents, 0.2)) AS BIGINT),
              CAST(round(10 * quantile_cont(cents, 0.3)) AS BIGINT),
              CAST(round(10 * quantile_cont(cents, 0.4)) AS BIGINT),
              CAST(round(10 * quantile_cont(cents, 0.5)) AS BIGINT),
              CAST(round(10 * quantile_cont(cents, 0.6)) AS BIGINT),
              CAST(round(10 * quantile_cont(cents, 0.7)) AS BIGINT),
              CAST(round(10 * quantile_cont(cents, 0.8)) AS BIGINT),
              CAST(round(10 * quantile_cont(cents, 0.9)) AS BIGINT)] AS c10
      FROM lab WHERE ina = 1),
    binned AS (
      SELECT ina,
             (SELECT COUNT(*) FROM unnest(cuts.c10) AS u(cv)
              WHERE 10 * lab.cents > cv) AS bin
      FROM lab CROSS JOIN cuts),
    cells AS (
      SELECT bin, CAST(SUM(ina) AS BIGINT) AS ca,
             CAST(SUM(1 - ina) AS BIGINT) AS cb
      FROM binned GROUP BY bin),
    w AS (
      SELECT bin, GREATEST(ca, 1) AS ca1, GREATEST(cb, 1) AS cb1,
             SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
      FROM cells),
    terms AS (
      SELECT CAST(round(1000000.0
               * ((CAST(ca1 AS DOUBLE) / na - CAST(cb1 AS DOUBLE) / nb)
                  * ln(1.0 * ca1 * nb / (1.0 * cb1 * na))))
               AS BIGINT) AS tm,
             na, nb
      FROM w)
    SELECT CAST(MAX(na) AS BIGINT) AS n_ref,
           CAST(MAX(nb) AS BIGINT) AS n_cur,
           CASE WHEN MAX(na) IS NULL OR MAX(na) = 0 OR MAX(nb) = 0
                THEN NULL
                ELSE round(SUM(tm) / 1000000.0, 6) + 0 END AS psi
    FROM terms
    """,
)
def ml_psi(spark, sf):
    """Population Stability Index between the md5 halves of the
    score distribution — THE deployed-model drift monitor (PSI < 0.1
    stable, > 0.25 retrain; the binned complement to drift_chi2's
    significance test: PSI measures MAGNITUDE of shift, chi² its
    detectability). Bins are the REFERENCE half's deciles — type-7
    cut points of integer cents, ×10-quantized to exact BIGINTs
    (decile fractions are tenths, the feat_robust_scale
    construction) and attached as a 1-row cross join (the allowed
    scalar broadcast); membership compares integers. Per-bin terms
    (pa−pb)·ln(pa/pb) use Laplace-clipped counts (GREATEST(c,1),
    the standard empty-bin convention), each quantized to micros in
    ONE identical float expression per bin — the 10-term sum is then
    an exact integer. Fit-then-apply: one pass fits the cuts on the
    reference half, one pass bins the corpus; marginals are OVER ()
    windows on the 10-row cell relation."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    lab = e.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
            < "8",
            1,
        )
        .otherwise(0)
        .alias("ina"),
    )
    cuts = lab.filter(F.col("ina") == 1).agg(
        F.array(
            *[
                F.round(
                    F.lit(10) * F.expr(f"percentile(cents, {0.1 * k})")
                ).cast("long")
                for k in range(1, 10)
            ]
        ).alias("c10")
    )
    binned = lab.crossJoin(cuts).select(
        "ina",
        F.aggregate(
            "c10",
            F.lit(0),
            lambda acc, cv: acc
            + F.when(F.lit(10) * F.col("cents") > cv, 1).otherwise(0),
        ).alias("bin"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum("ina").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("ina")).cast("long").alias("cb"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = cells.select(
        F.greatest(F.col("ca"), F.lit(1)).alias("ca1"),
        F.greatest(F.col("cb"), F.lit(1)).alias("cb1"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    terms = w.select(
        F.round(
            F.lit(1000000.0)
            * (
                (
                    F.col("ca1").cast("double") / F.col("na")
                    - F.col("cb1").cast("double") / F.col("nb")
                )
                * F.log(
                    F.lit(1.0)
                    * F.col("ca1")
                    * F.col("nb")
                    / (F.lit(1.0) * F.col("cb1") * F.col("na"))
                )
            )
        )
        .cast("long")
        .alias("tm"),
        "na",
        "nb",
    )
    return terms.agg(
        F.max("na").cast("long").alias("n_ref"),
        F.max("nb").cast("long").alias("n_cur"),
        F.when(
            F.max("na").isNull()
            | (F.max("na") == 0)
            | (F.max("nb") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(F.sum("tm") / F.lit(1000000.0), 6) + F.lit(0.0)
        )
        .alias("psi"),
    )


# ---------------------------------------------------------------------------
# Matthews correlation coefficient — the skew-robust operating metric
# ---------------------------------------------------------------------------
@q(
    "ml_mcc",
    f"""
    WITH {_SCORE_SQL},
    m AS (
      SELECT CAST(SUM(CASE WHEN cents >= {_CONF_T} THEN p ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN cents >= {_CONF_T} THEN cnt - p ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN cents < {_CONF_T} THEN p ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN cents < {_CONF_T} THEN cnt - p ELSE 0 END)
                  AS BIGINT) AS tn
      FROM pv)
    SELECT CAST(COALESCE(tp + fp + fn + tn, 0) AS BIGINT) AS n,
           CASE WHEN tp IS NULL
                     OR tp + fp = 0 OR tp + fn = 0
                     OR tn + fp = 0 OR tn + fn = 0 THEN NULL
                ELSE round((tp * tn - fp * fn)
                           / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                                  * (tn + fp) * (tn + fn)), 6) + 0
           END AS mcc
    FROM m
    """,
)
def ml_mcc(spark, sf):
    """Matthews correlation coefficient at the ml_confusion operating
    threshold — the single-number metric that stays honest under
    class skew (accuracy and F1 both saturate when negatives dominate,
    the normal regime for a quality classifier over web text; MCC is
    the Pearson phi of the 2x2 table and needs all four cells to be
    good). Same one-scan count-of-counts support as ml_confusion;
    the numerator tp*tn - fp*fn is an exact BIGINT product of counts,
    the denominator multiplies the four marginals in ONE fixed
    left-to-right DOUBLE expression under sqrt (identical op order on
    both engines), and any zero marginal — a degenerate all-one-class
    corpus, where MCC is undefined — short-circuits to NULL before
    ANSI division can throw."""
    pv = _score_support(spark, sf)
    hit = F.col("cents") >= _CONF_T
    m = pv.agg(
        F.sum(F.when(hit, F.col("p")).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(hit, F.col("cnt") - F.col("p")).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~hit, F.col("p")).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~hit, F.col("cnt") - F.col("p")).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    bad = (
        tp.isNull()
        | (tp + fp == 0)
        | (tp + fn == 0)
        | (tn + fp == 0)
        | (tn + fn == 0)
    )
    return m.select(
        F.coalesce(tp + fp + fn + tn, F.lit(0)).cast("long").alias("n"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (tp * tn - fp * fn)
                / F.sqrt(
                    (tp + fp).cast("double")
                    * (tp + fn)
                    * (tn + fp)
                    * (tn + fn)
                ),
                6,
            )
            + F.lit(0.0)
        )
        .alias("mcc"),
    )


# ---------------------------------------------------------------------------
# mean reciprocal rank — first-relevant ranking metric
# ---------------------------------------------------------------------------
@q(
    "ml_mrr",
    """
    WITH lab AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
    rk AS (
      SELECT user_id, pos,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY cents DESC, event_id) AS rn
      FROM lab),
    per_u AS (
      SELECT user_id,
             MIN(CASE WHEN pos = 1 THEN rn END) AS r
      FROM rk GROUP BY user_id),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(COUNT(r) AS BIGINT) AS n_hit,
             CAST(SUM(CASE WHEN r IS NOT NULL
                           THEN CAST(round(1000000.0 / r) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS rr_micros
      FROM per_u)
    SELECT n_users, n_hit,
           CASE WHEN n_users = 0 THEN NULL
                ELSE round(rr_micros / 1000000.0 / n_users, 6) + 0
           END AS mrr
    FROM tot
    """,
)
def ml_mrr(spark, sf):
    """Mean reciprocal rank of the first purchase in each user's
    score-ranked event list — the ranking-eval complement to ml_ndcg
    (nDCG grades the whole list; MRR grades time-to-first-hit, the
    retrieval/suggestion metric). Per-user ranking is a ROW_NUMBER
    window ordered by (cents DESC, event_id) — the unique tiebreak
    makes the permutation deterministic across engines and
    partitionings — and the groupBy that follows keys on the SAME
    user_id the window partitioned by, so the hash partitioning is
    reused: corpus scan -> ONE exchange -> window + per-user agg ->
    singleton rollup. Users with no purchase contribute 0 (the
    standard MRR convention for unanswered queries) but stay in the
    denominator. Each reciprocal 1/r is micros-quantized in the same
    float expression on both engines, so the sum is an exact BIGINT
    and MRR one guarded division."""
    e = t(spark, sf, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    lab = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cents").desc(), F.col("event_id")
    )
    rk = lab.select("user_id", "pos", F.row_number().over(w).alias("rn"))
    per_u = rk.groupBy("user_id").agg(
        F.min(F.when(F.col("pos") == 1, F.col("rn"))).alias("r")
    )
    tot = per_u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("r").cast("long").alias("n_hit"),
        F.sum(
            F.when(
                F.col("r").isNotNull(),
                F.round(F.lit(1000000.0) / F.col("r")).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("rr_micros"),
    )
    return tot.select(
        "n_users",
        "n_hit",
        F.when(F.col("n_users") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("rr_micros") / F.lit(1000000.0) / F.col("n_users"), 6
            )
            + F.lit(0.0)
        )
        .alias("mrr"),
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality test — skewness/kurtosis of the daily series
# ---------------------------------------------------------------------------
@q(
    "stat_jarque_bera",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             SUM(CAST(round(value * 100) AS BIGINT)) // 10000 AS h
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(h) AS BIGINT) AS s1
      FROM daily),
    ctr AS (
      SELECT n, s1,
             CAST(round(1000000.0 * (h - CAST(s1 AS DOUBLE) / n)
                                  * (h - CAST(s1 AS DOUBLE) / n))
                  AS BIGINT) AS t2,
             CAST(round(1000.0 * (h - CAST(s1 AS DOUBLE) / n)
                                * (h - CAST(s1 AS DOUBLE) / n)
                                * (h - CAST(s1 AS DOUBLE) / n))
                  AS BIGINT) AS t3,
             CAST(round((h - CAST(s1 AS DOUBLE) / n)
                        * (h - CAST(s1 AS DOUBLE) / n)
                        * (h - CAST(s1 AS DOUBLE) / n)
                        * (h - CAST(s1 AS DOUBLE) / n))
                  AS BIGINT) AS t4
      FROM daily CROSS JOIN fit),
    s AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(t2) AS BIGINT) AS s2q,
             CAST(SUM(t3) AS BIGINT) AS s3q,
             CAST(SUM(t4) AS BIGINT) AS s4q
      FROM ctr)
    SELECT COALESCE(n, 0) AS n_days,
           CASE WHEN n IS NULL OR n < 2 OR s2q <= 0 THEN NULL
                ELSE round((s3q / 1000.0 / n)
                           / pow(s2q / 1000000.0 / n, 1.5), 6) + 0
           END AS skewness,
           CASE WHEN n IS NULL OR n < 2 OR s2q <= 0 THEN NULL
                ELSE round((s4q * 1.0 / n)
                           / ((s2q / 1000000.0 / n)
                              * (s2q / 1000000.0 / n)) - 3.0, 6) + 0
           END AS ex_kurtosis,
           CASE WHEN n IS NULL OR n < 2 OR s2q <= 0 THEN NULL
                ELSE round(n / 6.0
                           * (pow((s3q / 1000.0 / n)
                                  / pow(s2q / 1000000.0 / n, 1.5), 2)
                              + pow((s4q * 1.0 / n)
                                    / ((s2q / 1000000.0 / n)
                                       * (s2q / 1000000.0 / n))
                                    - 3.0, 2) / 4.0), 6) + 0
           END AS jb
    FROM s
    """,
)
def stat_jarque_bera(spark, sf):
    """Jarque-Bera normality test on the daily-revenue series — the
    moment-based complement to stat_runs (runs asks "independent?",
    JB asks "Gaussian?": skewness and excess kurtosis jointly chi2-
    distributed under H0). Exactness discipline: daily revenue in
    HUNDRED-DOLLAR units via integer division (the events_autocorr
    BIGINT-headroom rule — at 100x data the deviations^4 must still
    fit a BIGINT; h-units keep t4 < 1e12 per day at sf1), the mean
    enters as the exact rational s1/n inside ONE identical float
    expression per central power, each power quantized at its own
    scale (micros for d^2, milli for d^3, unit for d^4 — matched to
    its magnitude) so the three moment sums are exact
    order-independent integer aggs. The daily relation is
    parquet_checkpointed (two consumers: moment fit + central pass —
    the audit-#59 discipline); fit attaches as a 1-row cross join.
    Degenerate series (n<2, zero variance) NULL the statistics."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    from ..operators.dedup import parquet_checkpoint

    # 2 consumers (moment fit + central pass) — checkpoint the bounded
    # daily relation or each branch re-scans the corpus (audit #59)
    daily = parquet_checkpoint(
        e.groupBy(
            F.floor(us / F.lit(86400000000)).cast("long").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .select("day", F.expr("cents DIV 10000").cast("long").alias("h")),
        "jb_daily",
    )
    fit = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("h").cast("long").alias("s1"),
    )
    d = F.col("h") - F.col("s1").cast("double") / F.col("n")
    ctr = daily.crossJoin(fit).select(
        "n",
        F.round(F.lit(1000000.0) * d * d).cast("long").alias("t2"),
        F.round(F.lit(1000.0) * d * d * d).cast("long").alias("t3"),
        F.round(d * d * d * d).cast("long").alias("t4"),
    )
    s = ctr.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("t2").cast("long").alias("s2q"),
        F.sum("t3").cast("long").alias("s3q"),
        F.sum("t4").cast("long").alias("s4q"),
    )
    n, s2q, s3q, s4q = (F.col(c) for c in ("n", "s2q", "s3q", "s4q"))
    bad = n.isNull() | (n < 2) | (s2q <= 0)
    m2 = s2q / F.lit(1000000.0) / n
    skew = (s3q / F.lit(1000.0) / n) / F.pow(m2, F.lit(1.5))
    exk = (s4q * F.lit(1.0) / n) / (m2 * m2) - F.lit(3.0)
    jb = n / F.lit(6.0) * (
        F.pow(skew, F.lit(2)) + F.pow(exk, F.lit(2)) / F.lit(4.0)
    )

    def _gated(expr):
        return F.when(bad, F.lit(None).cast("double")).otherwise(
            F.round(expr, 6) + F.lit(0.0)
        )

    return s.select(
        F.coalesce(n, F.lit(0)).alias("n_days"),
        _gated(skew).alias("skewness"),
        _gated(exk).alias("ex_kurtosis"),
        _gated(jb).alias("jb"),
    )


# ---------------------------------------------------------------------------
# Cohen's d — standardized effect size between the A/B halves
# ---------------------------------------------------------------------------
@q(
    "stat_cohens_d",
    """
    WITH lab AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ina
      FROM events WHERE value IS NOT NULL),
    h AS (
      SELECT ina, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s1,
             CAST(SUM(cents * cents) AS BIGINT) AS s2
      FROM lab GROUP BY ina),
    m AS (
      SELECT CAST(MAX(CASE WHEN ina = 1 THEN n END) AS BIGINT) AS na,
             CAST(MAX(CASE WHEN ina = 1 THEN s1 END) AS BIGINT) AS sa1,
             CAST(MAX(CASE WHEN ina = 1 THEN s2 END) AS BIGINT) AS sa2,
             CAST(MAX(CASE WHEN ina = 0 THEN n END) AS BIGINT) AS nb,
             CAST(MAX(CASE WHEN ina = 0 THEN s1 END) AS BIGINT) AS sb1,
             CAST(MAX(CASE WHEN ina = 0 THEN s2 END) AS BIGINT) AS sb2
      FROM h)
    SELECT COALESCE(na, 0) AS n_a, COALESCE(nb, 0) AS n_b,
           CASE WHEN na IS NULL OR nb IS NULL OR na < 2 OR nb < 2
                     OR (na * sa2 - sa1 * sa1) * 1.0 / (na * (na - 1.0))
                          * (na - 1)
                        + (nb * sb2 - sb1 * sb1) * 1.0 / (nb * (nb - 1.0))
                          * (nb - 1) <= 0 THEN NULL
                ELSE round(((CAST(sa1 AS DOUBLE) / na
                             - CAST(sb1 AS DOUBLE) / nb) / 100.0)
                           / sqrt(((na * sa2 - sa1 * sa1) * 1.0
                                     / (na * (na - 1.0)) * (na - 1)
                                   + (nb * sb2 - sb1 * sb1) * 1.0
                                     / (nb * (nb - 1.0)) * (nb - 1))
                                  / (na + nb - 2.0)) * 100.0, 6) + 0
           END AS cohens_d
    FROM m
    """,
)
def stat_cohens_d(spark, sf):
    """Cohen's d between the md5 halves of the value distribution —
    the EFFECT-SIZE companion to stat_ttest (the t test answers "is
    the difference detectable?", which any difference is at 100-TB n;
    d answers "is it MEANINGFUL?" in pooled-SD units, the number an
    experiment review actually reads). One corpus scan to per-half
    exact integer moments (n, sum-cents, sum-cents^2); the two halves
    pivot into one row via grouped MAX-CASE flags (the kg_delta
    reconciliation idiom — never a self-join of two filtered
    branches). The pooled variance and d run in ONE identical float
    expression on both engines (per-half var_samp as the exact
    integer ratio (n*s2 - s1^2)/(n(n-1)), recombined with (n-1)
    weights; the /100 and *100 pair keeps the mean difference in
    cents exact before the unit fold); n<2 on either side or a
    zero pooled variance NULLs the statistic (the stat_ttest Spark
    var_samp n=1 NaN hazard, guarded the same way)."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    lab = e.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "8",
            1,
        )
        .otherwise(0)
        .alias("ina"),
    )
    h = lab.groupBy("ina").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("s2"),
    )
    m = h.agg(
        *[
            F.max(F.when(F.col("ina") == flag, F.col(c)))
            .cast("long")
            .alias(alias)
            for flag, pre in ((1, "a"), (0, "b"))
            for c, alias in (
                ("n", f"n{pre}"),
                ("s1", f"s{pre}1"),
                ("s2", f"s{pre}2"),
            )
        ]
    )
    na, sa1, sa2 = F.col("na"), F.col("sa1"), F.col("sa2")
    nb, sb1, sb2 = F.col("nb"), F.col("sb1"), F.col("sb2")
    va_num = (na * sa2 - sa1 * sa1) * F.lit(1.0) / (na * (na - F.lit(1.0)))
    vb_num = (nb * sb2 - sb1 * sb1) * F.lit(1.0) / (nb * (nb - F.lit(1.0)))
    pooled_num = va_num * (na - 1) + vb_num * (nb - 1)
    bad = (
        na.isNull() | nb.isNull() | (na < 2) | (nb < 2) | (pooled_num <= 0)
    )
    d = (
        (
            (sa1.cast("double") / na - sb1.cast("double") / nb)
            / F.lit(100.0)
        )
        / F.sqrt(pooled_num / (na + nb - F.lit(2.0)))
        * F.lit(100.0)
    )
    return m.select(
        F.coalesce(na, F.lit(0)).alias("n_a"),
        F.coalesce(nb, F.lit(0)).alias("n_b"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(d, 6) + F.lit(0.0))
        .alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# mean average precision — whole-list ranking quality per user
# ---------------------------------------------------------------------------
@q(
    "ml_map",
    """
    WITH lab AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
    rk AS (
      SELECT user_id, pos,
             ROW_NUMBER() OVER w AS rn,
             SUM(pos) OVER (PARTITION BY user_id
                            ORDER BY cents DESC, event_id
                            ROWS UNBOUNDED PRECEDING) AS cp
      FROM lab
      WINDOW w AS (PARTITION BY user_id ORDER BY cents DESC, event_id)),
    per_u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN pos = 1
                           THEN CAST(round(1000000.0 * cp / rn) AS BIGINT)
                      END) AS BIGINT) AS t_micros,
             CAST(SUM(pos) AS BIGINT) AS np
      FROM rk GROUP BY user_id),
    ap AS (
      SELECT CAST(round(CAST(t_micros AS DOUBLE) / np) AS BIGINT)
               AS ap_micros
      FROM per_u WHERE np > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CASE WHEN COUNT(*) = 0 THEN NULL
                ELSE round(SUM(ap_micros) / 1000000.0 / COUNT(*), 6) + 0
           END AS mean_ap
    FROM ap
    """,
)
def ml_map(spark, sf):
    """Mean average precision of the purchase hits in each user's
    score-ranked event list — the whole-list companion to ml_mrr
    (MRR grades time-to-FIRST-hit; AP averages precision@k at EVERY
    hit, so burying the second and third purchases costs rank
    quality MRR never sees). Shape is the ml_mrr single-exchange
    discipline: ROW_NUMBER and the running positive count ride ONE
    window spec (same partition, same total (cents DESC, event_id)
    order, explicit ROWS frame so RANGE-vs-ROWS defaults can't
    diverge), and the per-user groupBy keys on the window's own
    partition key, so the plan is corpus scan -> one exchange ->
    window + agg -> singleton rollup. Each precision@k = cp/rn is
    micros-quantized per row in the identical float expression on
    both engines (exact BIGINT per-user sum), AP re-quantizes the
    /np fold once per user, and users with zero purchases drop from
    the mean per the standard AP convention (a query with no
    relevant documents has no defined AP)."""
    e = t(spark, sf, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    lab = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cents").desc(), F.col("event_id")
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rk = lab.select(
        "user_id",
        "pos",
        F.row_number().over(w).alias("rn"),
        F.sum("pos").over(wsum).alias("cp"),
    )
    per_u = rk.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("pos") == 1,
                F.round(
                    F.lit(1000000.0) * F.col("cp") / F.col("rn")
                ).cast("long"),
            )
        )
        .cast("long")
        .alias("t_micros"),
        F.sum("pos").cast("long").alias("np"),
    )
    ap = per_u.filter(F.col("np") > 0).select(
        F.round(F.col("t_micros").cast("double") / F.col("np"))
        .cast("long")
        .alias("ap_micros")
    )
    return ap.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.when(F.count(F.lit(1)) == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sum("ap_micros") / F.lit(1000000.0) / F.count(F.lit(1)), 6
            )
            + F.lit(0.0)
        )
        .alias("mean_ap"),
    )


# ---------------------------------------------------------------------------
# Brier score + Murphy decomposition — probability-forecast quality
# ---------------------------------------------------------------------------
@q(
    "ml_brier",
    """
    WITH lab AS (
      SELECT ((CAST(round(value * 100) AS BIGINT) % 1000) + 1000) % 1000
               AS m,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL),
    cells AS (
      SELECT m // 100 AS b,
             CAST(COUNT(*) AS BIGINT) AS nk,
             CAST(SUM(m) AS BIGINT) AS sm,
             CAST(SUM(y) AS BIGINT) AS pk,
             CAST(SUM((m - 1000 * y) * (m - 1000 * y)) AS BIGINT) AS sek
      FROM lab GROUP BY 1),
    win AS (
      SELECT b, nk, sm, pk, sek,
             SUM(nk) OVER () AS n, SUM(pk) OVER () AS p,
             SUM(sek) OVER () AS se
      FROM cells),
    terms AS (
      SELECT n, p, se,
             CAST(round(1000000.0 * nk
                        * (sm / (1000.0 * nk) - pk * 1.0 / nk)
                        * (sm / (1000.0 * nk) - pk * 1.0 / nk) / n)
                  AS BIGINT) AS rel_t,
             CAST(round(1000000.0 * nk
                        * (pk * 1.0 / nk - p * 1.0 / n)
                        * (pk * 1.0 / nk - p * 1.0 / n) / n)
                  AS BIGINT) AS res_t
      FROM win)
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           round(CAST(MAX(se) AS DOUBLE) / 1000000.0 / MAX(n), 6) + 0
             AS brier,
           round(SUM(rel_t) / 1000000.0, 6) + 0 AS reliability,
           round(SUM(res_t) / 1000000.0, 6) + 0 AS resolution,
           round(MAX(p) * 1.0 / MAX(n)
                 * (1 - MAX(p) * 1.0 / MAX(n)), 6) + 0 AS uncertainty
    FROM terms
    """,
)
def ml_brier(spark, sf):
    """Brier score of the pseudo-probability forecast p = (cents mod
    1000)/1000 against the purchase label, plus the Murphy
    reliability / resolution / uncertainty decomposition over
    probability deciles — the PROPER scoring rule the calibration
    family needs (ml_calibration shows WHERE the forecast is off;
    Brier says HOW MUCH it costs, and the decomposition says whether
    the cure is recalibration (reliability) or a better model
    (resolution)). The squared error is the exact integer
    (m - 1000y)^2 with denominator 10^6 — the corpus-scale Brier sum
    is an exact BIGINT agg with NO quantization step at all; the
    corpus collapses once to 10 decile cells, the grand totals are
    windows over that cell relation (the stat_mutual_info
    marginals-as-windows rule), and the two decomposition terms are
    micros-quantized per cell so their 10-term sums stay
    order-independent. pmod (not %) keeps negative cents in [0,1000)
    on both engines."""
    lab = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        F.pmod(F.round(F.col("value") * 100).cast("long"), F.lit(1000)).alias(
            "m"
        ),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    d = F.col("m") - 1000 * F.col("y")
    cells = lab.groupBy(F.expr("m div 100").alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum("m").cast("long").alias("sm"),
        F.sum("y").cast("long").alias("pk"),
        F.sum(d * d).cast("long").alias("sek"),
    )
    w = Window.partitionBy()
    win = cells.select(
        "b",
        "nk",
        "sm",
        "pk",
        "sek",
        F.sum("nk").over(w).alias("n"),
        F.sum("pk").over(w).alias("p"),
        F.sum("sek").over(w).alias("se"),
    )
    pbar_k = F.col("sm") / (F.lit(1000.0) * F.col("nk"))
    ybar_k = F.col("pk") * F.lit(1.0) / F.col("nk")
    ybar = F.col("p") * F.lit(1.0) / F.col("n")
    terms = win.select(
        "n",
        "p",
        "se",
        F.round(
            F.lit(1000000.0)
            * F.col("nk")
            * (pbar_k - ybar_k)
            * (pbar_k - ybar_k)
            / F.col("n")
        )
        .cast("long")
        .alias("rel_t"),
        F.round(
            F.lit(1000000.0)
            * F.col("nk")
            * (ybar_k - ybar)
            * (ybar_k - ybar)
            / F.col("n")
        )
        .cast("long")
        .alias("res_t"),
    )
    mp, mn = F.max("p"), F.max("n")
    return terms.agg(
        mn.cast("long").alias("n_rows"),
        (
            F.round(F.max("se").cast("double") / F.lit(1000000.0) / mn, 6)
            + F.lit(0.0)
        ).alias("brier"),
        (F.round(F.sum("rel_t") / F.lit(1000000.0), 6) + F.lit(0.0)).alias(
            "reliability"
        ),
        (F.round(F.sum("res_t") / F.lit(1000000.0), 6) + F.lit(0.0)).alias(
            "resolution"
        ),
        (
            F.round(
                mp * F.lit(1.0) / mn * (1 - mp * F.lit(1.0) / mn), 6
            )
            + F.lit(0.0)
        ).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# Theil inequality index — decomposable between/within event types
# ---------------------------------------------------------------------------
@q(
    "stat_theil",
    """
    WITH lab AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL AND value > 0),
    sup AS (
      SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS k
      FROM lab GROUP BY 1, 2),
    g AS (
      SELECT event_type,
             CAST(SUM(k) AS BIGINT) AS ng,
             CAST(SUM(k * c) AS BIGINT) AS sg,
             CAST(SUM(CAST(round(1000.0 * k * c * ln(c)) AS BIGINT))
                  AS BIGINT) AS lg_millis
      FROM sup GROUP BY 1),
    w AS (
      SELECT ng, sg, lg_millis,
             SUM(ng) OVER () AS n, SUM(sg) OVER () AS s,
             SUM(lg_millis) OVER () AS l
      FROM g),
    terms AS (
      SELECT n, s, l,
             CAST(round(1000000.0 * (sg * 1.0 / s)
                        * (lg_millis / 1000.0 / sg
                           - ln(sg * 1.0 / ng))) AS BIGINT) AS within_t,
             CAST(round(1000000.0 * (sg * 1.0 / s)
                        * ln((sg * 1.0 / s) / (ng * 1.0 / n)))
                  AS BIGINT) AS between_t
      FROM w)
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           round(MAX(l) / 1000.0 / MAX(s)
                 - ln(MAX(s) * 1.0 / MAX(n)), 6) + 0 AS theil_total,
           round(SUM(between_t) / 1000000.0, 6) + 0 AS theil_between,
           round(SUM(within_t) / 1000000.0, 6) + 0 AS theil_within
    FROM terms
    """,
)
def stat_theil(spark, sf):
    """Theil-T inequality index of the positive value distribution,
    with the between/within decomposition over event types — the
    inequality measure stat_gini CAN'T give you a decomposition for
    (Gini's between/within split has a messy overlap term; Theil's
    is exact: T = T_between + sum_g (S_g/S)*T_g), which is the
    question a curation review actually asks: is revenue inequality
    driven by differences BETWEEN event types or concentration
    WITHIN one. Shape is the stat_gini count-of-counts discipline:
    one corpus scan to the per-(type, cents) support, per-row terms
    k*c*ln(c) quantized to integer MILLIS inside the group agg (the
    kg_adamic_adar sum-of-logs trick; millis not micros for BIGINT
    headroom — the term is corpus-proportional), grand totals as
    frameless windows over the tiny per-group relation (the
    stat_mutual_info rule), and the three indices as identical float
    expressions rounded to 6. The ln-sum identity T = L/S - ln(S/n)
    with L = sum k*c*ln(c) avoids ever materializing shares."""
    lab = t(spark, sf, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    ).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    sup = lab.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    g = sup.groupBy("event_type").agg(
        F.sum("k").cast("long").alias("ng"),
        F.sum(F.col("k") * F.col("c")).cast("long").alias("sg"),
        F.sum(
            F.round(
                F.lit(1000.0)
                * F.col("k")
                * F.col("c")
                * F.log(F.col("c").cast("double"))
            ).cast("long")
        )
        .cast("long")
        .alias("lg_millis"),
    )
    wall = Window.partitionBy()
    w = g.select(
        "ng",
        "sg",
        "lg_millis",
        F.sum("ng").over(wall).alias("n"),
        F.sum("sg").over(wall).alias("s"),
        F.sum("lg_millis").over(wall).alias("l"),
    )
    ng, sg, lg = F.col("ng"), F.col("sg"), F.col("lg_millis")
    n, s = F.col("n"), F.col("s")
    share = sg * F.lit(1.0) / s
    tg = lg / F.lit(1000.0) / sg - F.log(sg * F.lit(1.0) / ng)
    terms = w.select(
        "n",
        "s",
        "l",
        F.round(F.lit(1000000.0) * share * tg).cast("long").alias("within_t"),
        F.round(
            F.lit(1000000.0) * share * F.log(share / (ng * F.lit(1.0) / n))
        )
        .cast("long")
        .alias("between_t"),
    )
    return terms.agg(
        F.max("n").cast("long").alias("n_rows"),
        (
            F.round(
                F.max("l") / F.lit(1000.0) / F.max("s")
                - F.log(F.max("s") * F.lit(1.0) / F.max("n")),
                6,
            )
            + F.lit(0.0)
        ).alias("theil_total"),
        (F.round(F.sum("between_t") / F.lit(1000000.0), 6) + F.lit(0.0)).alias(
            "theil_between"
        ),
        (F.round(F.sum("within_t") / F.lit(1000000.0), 6) + F.lit(0.0)).alias(
            "theil_within"
        ),
    )


# ---------------------------------------------------------------------------
# KS separation of the score distributions — classifier discriminancy
# ---------------------------------------------------------------------------
@q(
    "ml_ks",
    """
    WITH lab AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL),
    sup AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM lab GROUP BY cents),
    w AS (
      SELECT cents,
             SUM(p) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cp,
             SUM(cnt - p) OVER (ORDER BY cents
                                ROWS UNBOUNDED PRECEDING) AS cn,
             SUM(p) OVER () AS pt, SUM(cnt - p) OVER () AS nt
      FROM sup)
    SELECT CAST(cents AS BIGINT) AS ks_cents,
           CAST(pt AS BIGINT) AS n_pos, CAST(nt AS BIGINT) AS n_neg,
           CASE WHEN pt = 0 OR nt = 0 THEN NULL
                ELSE round(ABS(cp * nt - cn * pt) * 1.0 / (pt * nt), 6) + 0
           END AS ks
    FROM w
    ORDER BY ABS(cp * nt - cn * pt) DESC, cents
    LIMIT 1
    """,
)
def ml_ks(spark, sf):
    """Kolmogorov-Smirnov separation between the score distributions
    of positives and negatives, with the argmax threshold — the
    credit-scoring discriminancy number (max vertical gap between
    the two class ECDFs; ml_auc integrates the gap, KS reports its
    peak AND the cutoff where it happens, which is what a threshold
    review deploys). Same one-scan count-of-counts shape as ml_auc:
    the corpus collapses to the per-distinct-cents support, both
    class ECDFs are RANGE-free cumulative windows over that support
    (totals as frameless windows — the stat_mutual_info rule), and
    the gap is the exact cross-multiplied integer |cp*N - cn*P|
    (the stat_ks discipline: no float until the final division),
    so the argmax and its (gap DESC, cents) tiebreak are
    integer-deterministic; LIMIT 1 plans as TakeOrderedAndProject.
    One class empty guards to NULL (ANSI divide hazard)."""
    sup = _score_support(spark, sf)
    wc = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    w = sup.select(
        "cents",
        F.sum("p").over(wc).alias("cp"),
        F.sum(F.col("cnt") - F.col("p")).over(wc).alias("cn"),
        F.sum("p").over(wall).alias("pt"),
        F.sum(F.col("cnt") - F.col("p")).over(wall).alias("nt"),
    )
    gap = F.abs(F.col("cp") * F.col("nt") - F.col("cn") * F.col("pt"))
    return (
        w.select(
            F.col("cents").cast("long").alias("ks_cents"),
            F.col("pt").cast("long").alias("n_pos"),
            F.col("nt").cast("long").alias("n_neg"),
            F.when(
                (F.col("pt") == 0) | (F.col("nt") == 0),
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    gap * F.lit(1.0) / (F.col("pt") * F.col("nt")), 6
                )
                + F.lit(0.0)
            )
            .alias("ks"),
            gap.alias("_gap"),
        )
        .orderBy(F.desc("_gap"), "ks_cents")
        .limit(1)
        .drop("_gap")
    )


# ---------------------------------------------------------------------------
# Friedman test — repeated-measures rank ANOVA over complete day blocks
# ---------------------------------------------------------------------------
@q(
    "stat_friedman",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
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
    tr AS (
      SELECT event_type, CAST(SUM(dr) AS BIGINT) AS rd
      FROM r GROUP BY event_type),
    tg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tc
      FROM r GROUP BY day_num, v),
    fin AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fb) AS n,
             (SELECT k FROM kk) AS k,
             (SELECT CAST(SUM(rd * rd) AS BIGINT) FROM tr) AS sr2d,
             (SELECT CAST(COALESCE(SUM(tc * tc * tc - tc), 0) AS BIGINT)
              FROM tg) AS tsum)
    SELECT n AS n_blocks, k AS n_treatments,
           CASE WHEN n = 0 OR k < 2 THEN NULL
                ELSE round(3.0 * sr2d / (n * k * (k + 1))
                           - 3.0 * n * (k + 1), 6) + 0
           END AS q,
           CASE WHEN n = 0 OR k < 2
                     OR 1 - tsum * 1.0 / (n * k * (k * k - 1)) <= 0
                THEN NULL
                ELSE round((3.0 * sr2d / (n * k * (k + 1))
                            - 3.0 * n * (k + 1))
                           / (1 - tsum * 1.0 / (n * k * (k * k - 1))),
                           6) + 0
           END AS q_tie_adj
    FROM fin
    """,
)
def stat_friedman(spark, sf):
    """Friedman test on the daily-revenue-by-type panel: blocks are
    COMPLETE days (every event type present), treatments are event
    types, and the statistic ranks treatments WITHIN each block — the
    repeated-measures companion to stat_kruskal (Kruskal-Wallis
    pools all observations, so day-level level-shifts masquerade as
    treatment effects; Friedman blocks them out, the right test for
    "does type A consistently out-earn type B day after day").
    Ranks are tie-averaged via the stat_mannwhitney doubled-rank
    identity dr = 2*RANK() + ties - 1 (exact integers; rank sums and
    their squares are exact BIGINTs), the tie-correction masses
    t^3 - t come from the per-(day, value) tie groups, and Q plus
    its tie-adjusted form are single identical float expressions
    over five exact integers. Daily dollars via integer div (the
    events_autocorr headroom rule). n = 0 (no complete block), a
    single treatment, or an all-tied panel (zero correction
    denominator) guard to NULL. Scale shape: corpus -> calendar x
    types cells in one agg; every later relation is
    calendar-bounded."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day_num"),
            "event_type",
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc"))
        .select("day_num", "event_type", F.expr("vc div 100").alias("v"))
    )
    kk = daily.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    fb = (
        daily.groupBy("day_num")
        .agg(F.count(F.lit(1)).alias("ntypes"))
        .crossJoin(kk)
        .filter(F.col("ntypes") == F.col("k"))
        .select("day_num")
    )
    wrk = Window.partitionBy("day_num").orderBy("v")
    wtie = Window.partitionBy("day_num", "v")
    r = daily.join(fb, "day_num").select(
        "event_type",
        "day_num",
        "v",
        (
            2 * F.rank().over(wrk) + F.count(F.lit(1)).over(wtie) - 1
        ).alias("dr"),
    )
    tr = r.groupBy("event_type").agg(F.sum("dr").cast("long").alias("rd"))
    tg = r.groupBy("day_num", "v").agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )
    fin = (
        fb.agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(kk)
        .crossJoin(
            tr.agg(F.sum(F.col("rd") * F.col("rd")).cast("long").alias("sr2d"))
        )
        .crossJoin(
            tg.agg(
                F.coalesce(
                    F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc")),
                    F.lit(0),
                )
                .cast("long")
                .alias("tsum")
            )
        )
    )
    n, k, sr2d, tsum = (
        F.col("n"),
        F.col("k"),
        F.col("sr2d"),
        F.col("tsum"),
    )
    qv = F.lit(3.0) * sr2d / (n * k * (k + 1)) - F.lit(3.0) * n * (k + 1)
    corr = 1 - tsum * F.lit(1.0) / (n * k * (k * k - 1))
    bad = (n == 0) | (k < 2)
    return fin.select(
        n.alias("n_blocks"),
        k.alias("n_treatments"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(qv, 6) + F.lit(0.0))
        .alias("q"),
        F.when(bad | (corr <= 0), F.lit(None).cast("double"))
        .otherwise(F.round(qv / corr, 6) + F.lit(0.0))
        .alias("q_tie_adj"),
    )


# ---------------------------------------------------------------------------
# weighted median — quantity-weighted price, count-of-counts exact
# ---------------------------------------------------------------------------
@q(
    "stat_weighted_median",
    """
    WITH sup AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wt
      FROM lineitem GROUP BY 1, 2),
    w AS (
      SELECT flag, cents, wt,
             SUM(wt) OVER (PARTITION BY flag ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wt) OVER (PARTITION BY flag) AS tw
      FROM sup)
    SELECT flag,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT)
             AS wmedian_cents,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM w GROUP BY flag
    """,
)
def stat_weighted_median(spark, sf):
    """Quantity-WEIGHTED median price per return flag — the
    percentile where each row counts proportionally to its weight
    (the unweighted agg_percentiles answers "the median line item";
    procurement wants "the median UNIT", and a 50-unit line must
    pull 50x) — the estimator every weighted-survey and
    inventory-valuation pipeline needs and no engine ships as a
    one-call exact aggregate at scale. Count-of-counts discipline:
    one corpus scan collapses to the per-(flag, distinct-cents)
    weight support; the weighted CDF is a cumulative window over
    that support with the flag total as its companion window (the
    stat_gini closed-form shape — the corpus is never sorted, only
    the support is); the lower weighted median is the first support
    point where 2*cumweight >= total — an ALL-INTEGER test, so
    there is no interpolation branch to diverge between engines.
    The final min-fold keys on the window's own partition key, so
    the hash partitioning is reused (one exchange end to end)."""
    sup = (
        t(spark, sf, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long"))
            .cast("long")
            .alias("wt")
        )
    )
    wc = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("flag")
    w = sup.select(
        "flag",
        "cents",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wt).alias("tw"),
    )
    return w.groupBy("flag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents")))
        .cast("long")
        .alias("wmedian_cents"),
        F.max("tw").cast("long").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled range — long-memory in the daily series
# ---------------------------------------------------------------------------
@q(
    "stat_hurst",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM(CAST(round(value * 100) AS BIGINT)) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    idx AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY day_num) AS rn FROM daily),
    fan AS (
      SELECT s.size, (rn - 1) // s.size AS wid,
             (rn - 1) % s.size + 1 AS pos, v
      FROM idx, (SELECT unnest([8, 16, 32]) AS size) s),
    w AS (
      SELECT size, wid, pos, v,
             COUNT(*) OVER (PARTITION BY size, wid) AS cnt,
             SUM(v) OVER (PARTITION BY size, wid) AS s1,
             SUM(v * v) OVER (PARTITION BY size, wid) AS s2,
             SUM(v) OVER (PARTITION BY size, wid ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM fan),
    per_w AS (
      SELECT size, wid,
             MAX(size * cum - pos * s1) - MIN(size * cum - pos * s1)
               AS rr,
             MAX(size * s2 - s1 * s1) AS varn
      FROM w WHERE cnt = size
      GROUP BY size, wid),
    ys AS (
      SELECT size,
             CAST(round(1000000.0
                        * ln(rr / sqrt(CAST(varn AS DOUBLE))))
                  AS BIGINT) AS y_us
      FROM per_w WHERE varn > 0),
    per_s AS (
      SELECT size, CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(y_us) AS BIGINT) AS sy
      FROM ys GROUP BY size),
    p AS (
      SELECT CAST(MAX(CASE WHEN size = 8 THEN nw END) AS BIGINT) AS n8,
             CAST(MAX(CASE WHEN size = 16 THEN nw END) AS BIGINT) AS n16,
             CAST(MAX(CASE WHEN size = 32 THEN nw END) AS BIGINT) AS n32,
             MAX(CASE WHEN size = 8 THEN sy * 1.0 / nw END) AS y8,
             MAX(CASE WHEN size = 32 THEN sy * 1.0 / nw END) AS y32
      FROM per_s)
    SELECT COALESCE(n8, 0) AS n8, COALESCE(n16, 0) AS n16,
           COALESCE(n32, 0) AS n32,
           CASE WHEN y8 IS NULL OR y32 IS NULL THEN NULL
                ELSE round((y32 - y8) / 1000000.0 / (2 * ln(2.0)), 6) + 0
           END AS hurst
    FROM p
    """,
)
def stat_hurst(spark, sf):
    """Hurst exponent of the daily revenue series by rescaled-range
    (R/S) analysis over window sizes 8/16/32 observed days — the
    long-memory diagnostic (H ~ 0.5 memoryless, H > 0.5 trending/
    persistent, H < 0.5 mean-reverting) that says whether
    events_forecast's seasonal-naive horizon is even extendable, a
    different question from events_autocorr's fixed-lag linear
    correlation. Everything reduces to exact integers until the last
    step: within each window the cumulative deviation is the exact
    rational size*cum - pos*s1 (so R*size = max - min is a BIGINT),
    the std denominator is sqrt(size*s2 - s1^2) (R/S = R_scaled /
    sqrt(varn) after the size folds cancel), each window's ln(R/S)
    is micros-quantized (exact per-size sums), and with the three
    sizes geometrically spaced the OLS slope collapses to the
    closed form (ybar32 - ybar8) / (2 ln 2). Zero-variance windows
    and partial tail windows drop; a size with no surviving window
    NULLs the estimate. Scale shape: one corpus scan to the
    calendar-sized daily relation; the x3 fan-out and every window
    ride that bounded relation."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day_num")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc"))
        .select("day_num", F.expr("vc div 100").alias("v"))
    )
    idx = daily.select(
        "v", F.row_number().over(Window.orderBy("day_num")).alias("rn")
    )
    fan = idx.select(
        F.explode(F.array(F.lit(8), F.lit(16), F.lit(32))).alias("size"),
        "rn",
        "v",
    ).select(
        "size",
        F.expr("(rn - 1) div size").alias("wid"),
        ((F.col("rn") - 1) % F.col("size") + 1).alias("pos"),
        "v",
    )
    ww = Window.partitionBy("size", "wid")
    wcum = ww.orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = fan.select(
        "size",
        "wid",
        "pos",
        "v",
        F.count(F.lit(1)).over(ww).alias("cnt"),
        F.sum("v").over(ww).alias("s1"),
        F.sum(F.col("v") * F.col("v")).over(ww).alias("s2"),
        F.sum("v").over(wcum).alias("cum"),
    )
    ydev = F.col("size") * F.col("cum") - F.col("pos") * F.col("s1")
    per_w = (
        w.filter(F.col("cnt") == F.col("size"))
        .groupBy("size", "wid")
        .agg(
            (F.max(ydev) - F.min(ydev)).alias("rr"),
            F.max(
                F.col("size") * F.col("s2") - F.col("s1") * F.col("s1")
            ).alias("varn"),
        )
    )
    ys = per_w.filter(F.col("varn") > 0).select(
        "size",
        F.round(
            F.lit(1000000.0)
            * F.log(F.col("rr") / F.sqrt(F.col("varn").cast("double")))
        )
        .cast("long")
        .alias("y_us"),
    )
    per_s = ys.groupBy("size").agg(
        F.count(F.lit(1)).cast("long").alias("nw"),
        F.sum("y_us").cast("long").alias("sy"),
    )
    p = per_s.agg(
        *[
            F.max(F.when(F.col("size") == s, F.col("nw")))
            .cast("long")
            .alias(f"n{s}")
            for s in (8, 16, 32)
        ],
        F.max(
            F.when(F.col("size") == 8, F.col("sy") * F.lit(1.0) / F.col("nw"))
        ).alias("y8"),
        F.max(
            F.when(
                F.col("size") == 32, F.col("sy") * F.lit(1.0) / F.col("nw")
            )
        ).alias("y32"),
    )
    return p.select(
        F.coalesce(F.col("n8"), F.lit(0)).alias("n8"),
        F.coalesce(F.col("n16"), F.lit(0)).alias("n16"),
        F.coalesce(F.col("n32"), F.lit(0)).alias("n32"),
        F.when(
            F.col("y8").isNull() | F.col("y32").isNull(),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (F.col("y32") - F.col("y8"))
                / F.lit(1000000.0)
                / (2 * F.log(F.lit(2.0))),
                6,
            )
            + F.lit(0.0)
        )
        .alias("hurst"),
    )


# ---------------------------------------------------------------------------
# McNemar paired test — did the model change actually change errors?
# ---------------------------------------------------------------------------
@q(
    "stat_mcnemar",
    """
    WITH lab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CASE WHEN CAST(round(value * 100) AS BIGINT) % 7 < 3
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '7'
                  THEN 1 ELSE 0 END AS b
      FROM events WHERE value IS NOT NULL),
    cls AS (
      SELECT CASE WHEN a = y THEN 1 ELSE 0 END AS a_ok,
             CASE WHEN b = y THEN 1 ELSE 0 END AS b_ok
      FROM lab),
    m AS (
      SELECT CAST(SUM(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b10,
             CAST(SUM(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c01,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cls)
    SELECT n, b10, c01,
           CASE WHEN b10 + c01 = 0 THEN NULL
                ELSE round((b10 - c01) * 1.0 * (b10 - c01)
                           / (b10 + c01), 6) + 0
           END AS chi2,
           CASE WHEN b10 + c01 = 0 THEN NULL
                ELSE round((abs(b10 - c01) - 1.0)
                           * (abs(b10 - c01) - 1.0)
                           / (b10 + c01), 6) + 0
           END AS chi2_cc
    FROM m
    """,
)
def stat_mcnemar(spark, sf):
    """McNemar's test on two classifiers over the SAME rows — the
    paired accuracy comparison (ml_confusion grades one model;
    shipping decisions compare two, and the unpaired two-proportion
    test wastes the pairing: only the DISCORDANT cells b and c
    carry information, concordant rows cancel). Classifier A is a
    value-derived rule, classifier B an md5-coin rule (both
    deterministic — the sample_hash discipline — so the 2x2
    discordance table is engine/partitioning-invariant); the
    statistic (b-c)^2/(b+c) and its continuity-corrected form are
    single float expressions over three exact BIGINTs, NULL-guarded
    when there are no discordant pairs (the ANSI divide hazard and
    also the correct answer: identical error patterns = no
    evidence). One corpus scan, one map-side-combinable fold to a
    single row — the cheapest possible A/B shape at 100 TB."""
    lab = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(
            F.pmod(F.round(F.col("value") * 100).cast("long"), F.lit(7)) < 3,
            1,
        )
        .otherwise(0)
        .alias("a"),
        F.when(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "7",
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    cls = lab.select(
        F.when(F.col("a") == F.col("y"), 1).otherwise(0).alias("a_ok"),
        F.when(F.col("b") == F.col("y"), 1).otherwise(0).alias("b_ok"),
    )
    m = cls.agg(
        F.sum(F.when((F.col("a_ok") == 1) & (F.col("b_ok") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b10"),
        F.sum(F.when((F.col("a_ok") == 0) & (F.col("b_ok") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c01"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    b10, c01 = F.col("b10"), F.col("c01")
    zero = b10 + c01 == 0
    return m.select(
        "n",
        "b10",
        "c01",
        F.when(zero, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (b10 - c01) * F.lit(1.0) * (b10 - c01) / (b10 + c01), 6
            )
            + F.lit(0.0)
        )
        .alias("chi2"),
        F.when(zero, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.abs(b10 - c01) - F.lit(1.0))
                * (F.abs(b10 - c01) - F.lit(1.0))
                / (b10 + c01),
                6,
            )
            + F.lit(0.0)
        )
        .alias("chi2_cc"),
    )


# ---------------------------------------------------------------------------
# group-fairness report — demographic parity and equalized odds gaps
# ---------------------------------------------------------------------------
@q(
    "ml_fairness",
    """
    WITH lab AS (
      SELECT CASE WHEN substr(md5('grp:' || CAST(event_id AS VARCHAR)),
                              1, 1) < '8' THEN 'g0' ELSE 'g1' END AS grp,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CASE WHEN CAST(round(value * 100) AS BIGINT) % 5 < 2
                  THEN 1 ELSE 0 END AS yhat
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yhat) AS BIGINT) AS n_pred_pos,
             CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nn,
             CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp
      FROM lab GROUP BY grp)
    SELECT grp, n,
           CASE WHEN n = 0 THEN NULL
                ELSE round(n_pred_pos * 1.0 / n, 6) + 0 END AS pos_rate,
           CASE WHEN np = 0 THEN NULL
                ELSE round(tp * 1.0 / np, 6) + 0 END AS tpr,
           CASE WHEN nn = 0 THEN NULL
                ELSE round(fp * 1.0 / nn, 6) + 0 END AS fpr,
           round(ABS(n_pred_pos * 1.0 / n
                     - MAX(n_pred_pos * 1.0 / n) OVER ()), 6) + 0
             AS parity_gap_vs_max
    FROM g
    """,
)
def ml_fairness(spark, sf):
    """Group-fairness report over a protected attribute: per group
    the selection rate (demographic parity), TPR and FPR (the
    equalized-odds pair), and each group's parity gap against the
    most-selected group — the audit table a model review reads
    before shipping any classifier that gates people or content
    (ml_confusion grades accuracy; fairness asks WHO pays for the
    errors — a classifier can be 95% accurate with all its false
    negatives in one group). Group and prediction are md5/value
    deterministic rules (the stat_mcnemar discipline) so the 2x2x2
    table is engine-invariant; one corpus scan folds to per-group
    exact counts, each rate is a guarded division (an empty class
    NULLs its rate rather than crashing under ANSI), and the
    cross-group reference is a frameless window over the
    |groups|-sized relation — never a second scan."""
    lab = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        F.when(
            F.substring(
                F.md5(
                    F.concat(F.lit("grp:"), F.col("event_id").cast("string"))
                ),
                1,
                1,
            )
            < "8",
            "g0",
        )
        .otherwise("g1")
        .alias("grp"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(
            F.pmod(F.round(F.col("value") * 100).cast("long"), F.lit(5)) < 2,
            1,
        )
        .otherwise(0)
        .alias("yhat"),
    )
    g = lab.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yhat").cast("long").alias("n_pred_pos"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
        .cast("long")
        .alias("np"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
        .cast("long")
        .alias("nn"),
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
    )
    wall = Window.partitionBy()
    pos_rate = F.col("n_pred_pos") * F.lit(1.0) / F.col("n")
    return g.select(
        "grp",
        "n",
        F.when(F.col("n") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(pos_rate, 6) + F.lit(0.0))
        .alias("pos_rate"),
        F.when(F.col("np") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("tp") * F.lit(1.0) / F.col("np"), 6) + F.lit(0.0)
        )
        .alias("tpr"),
        F.when(F.col("nn") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("fp") * F.lit(1.0) / F.col("nn"), 6) + F.lit(0.0)
        )
        .alias("fpr"),
        (
            F.round(F.abs(pos_rate - F.max(pos_rate).over(wall)), 6)
            + F.lit(0.0)
        ).alias("parity_gap_vs_max"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen estimator — the median slope, robust to outlier days
# ---------------------------------------------------------------------------
@q(
    "stat_theilsen",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             SUM(CAST(round(value * 100) AS BIGINT)) // 100 AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    pairs AS (
      SELECT (b.y - a.y) * 1.0 / (b.x - a.x) AS s
      FROM daily a JOIN daily b ON b.x > a.x),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             round(quantile_cont(s, 0.5), 6) + 0 AS sen_slope
      FROM pairs)
    SELECT n_pairs,
           CASE WHEN n_pairs = 0 THEN NULL ELSE sen_slope END
             AS sen_slope_dollars_per_day
    FROM m
    """,
)
def stat_theilsen(spark, sf):
    """Theil-Sen trend of the daily revenue series: the MEDIAN of
    all pairwise slopes — the robust companion to the OLS trends
    (stat_regression / feat_trend): one campaign-spike day drags an
    OLS slope arbitrarily far, while the median slope has a 29%
    breakdown point, which is why monitoring pipelines fit
    Theil-Sen before alerting on "revenue is trending down". The
    pairwise fan-out is quadratic IN THE CALENDAR, not the corpus —
    the events collapse to one row per observed day first (one
    map-side agg), so 365 days is ~66k pair rows at ANY corpus
    scale (the kg_squares cap philosophy: bound the blow-up before
    producing it). Each slope is one identical float division of
    exact integers (dollars via integer div, the autocorr headroom
    rule); the median is the exact type-7 quantile both engines
    share (agg_percentiles precedent). Empty series guards to
    NULL."""
    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("x")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc"))
        .select("x", F.expr("vc div 100").alias("y"))
    )
    # both sides of the pair join consume daily — without the
    # checkpoint each branch re-runs the corpus agg (measured: 2
    # events scans; the stat_mutual_info multi-consumer rule)
    daily = parquet_checkpoint(daily, "theilsen_daily")
    a = daily.select(F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = daily.select(F.col("x").alias("bx"), F.col("y").alias("by"))
    pairs = a.join(b, F.col("bx") > F.col("ax")).select(
        (
            (F.col("by") - F.col("ay"))
            * F.lit(1.0)
            / (F.col("bx") - F.col("ax"))
        ).alias("s")
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (F.round(F.expr("percentile(s, 0.5)"), 6) + F.lit(0.0)).alias(
            "sen"
        ),
    )
    return m.select(
        "n_pairs",
        F.when(F.col("n_pairs") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("sen"))
        .alias("sen_slope_dollars_per_day"),
    )


# ---------------------------------------------------------------------------
# Wilson score interval — rate CIs that behave near 0 and 1
# ---------------------------------------------------------------------------
@q(
    "stat_wilson_ci",
    """
    WITH m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type2 = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM (SELECT event_type,
                   CASE WHEN value IS NOT NULL AND value > 450
                        THEN 'purchase' ELSE 'other' END AS event_type2
            FROM events) GROUP BY event_type)
    SELECT event_type, n, k,
           round(k * 1.0 / n, 6) + 0 AS rate,
           round((k + 1.92072941034706) / (n + 3.84145882069412)
                 - 1.95996398454005 / (n + 3.84145882069412)
                   * sqrt(k * 1.0 * (n - k) / n + 0.960364705173765),
                 6) + 0 AS wilson_lo,
           round((k + 1.92072941034706) / (n + 3.84145882069412)
                 + 1.95996398454005 / (n + 3.84145882069412)
                   * sqrt(k * 1.0 * (n - k) / n + 0.960364705173765),
                 6) + 0 AS wilson_hi
    FROM m
    """,
)
def stat_wilson_ci(spark, sf):
    """95% Wilson score interval for a per-type success rate (here:
    share of events with value above $4.50) — the rate CI that
    stays inside [0,1] and behaves at the extremes, where the
    naive Wald interval p ± z√(p(1−p)/n) collapses to a point at
    k = 0 or k = n (exactly the regimes corpus-quality rates live
    in: violation rates near 0, pass rates near 1 — a Wald CI of
    [0,0] on a zero-violation sample is a lie). z = 1.95996... and
    its square are PYTHON-IMPORT-TIME literals embedded identically
    in both plans (the ml_ndcg discount discipline — never runtime
    erf), the algebra is arranged as the standard centre ± half
    width over exact BIGINT (k, n), and n >= 1 by construction
    (groups exist only with rows) so no division guard is needed.
    One corpus scan, one fold."""
    m = t(spark, sf, "events").select(
        "event_type",
        F.when(
            F.col("value").isNotNull() & (F.col("value") > 450), 1
        )
        .otherwise(0)
        .alias("hit"),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("hit").cast("long").alias("k"),
    )
    z = 1.95996398454005
    z2 = z * z  # 3.84145882069412
    n, k = F.col("n"), F.col("k")
    centre = (k + F.lit(z2 / 2)) / (n + F.lit(z2))
    half = (
        F.lit(z)
        / (n + F.lit(z2))
        * F.sqrt(k * F.lit(1.0) * (n - k) / n + F.lit(z2 / 4))
    )
    return m.select(
        "event_type",
        "n",
        "k",
        (F.round(k * F.lit(1.0) / n, 6) + F.lit(0.0)).alias("rate"),
        (F.round(centre - half, 6) + F.lit(0.0)).alias("wilson_lo"),
        (F.round(centre + half, 6) + F.lit(0.0)).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# Ljung-Box statistic — joint whiteness over lags 1..7
# ---------------------------------------------------------------------------
@q(
    "stat_ljung_box",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM(CAST(round(value * 100) AS BIGINT)) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(v) AS BIGINT) AS sv,
                  CAST(SUM(v * v) AS BIGINT) AS svv
           FROM daily),
    px AS (
      SELECT CAST(t.l AS BIGINT) AS lag, day_num + t.l AS tgt, v AS x
      FROM daily, unnest([1, 2, 3, 4, 5, 6, 7]) AS t(l)),
    pr AS (
      SELECT px.lag,
             CAST(SUM(px.x * b.v) AS BIGINT) AS sxy,
             CAST(SUM(px.x) AS BIGINT) AS sx,
             CAST(SUM(b.v) AS BIGINT) AS sy,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM px JOIN daily b ON b.day_num = px.tgt
      GROUP BY px.lag),
    rk AS (
      SELECT pr.lag,
             CAST(round(1000000000.0
                  * (pr.sxy - pr.sx * 1.0 * pr.sy / pr.np)
                  / (nn.svv - nn.sv * 1.0 * nn.sv / nn.n)) AS BIGINT)
               AS r_nanos,
             nn.n AS n
      FROM pr CROSS JOIN nn
      WHERE nn.svv - nn.sv * 1.0 * nn.sv / nn.n > 0 AND pr.np > 0)
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_lags,
           CASE WHEN COUNT(*) = 0 THEN NULL
                ELSE round(MAX(n) * (MAX(n) + 2.0)
                     * SUM((r_nanos / 1000000000.0)
                           * (r_nanos / 1000000000.0)
                           / (n - lag)), 6) + 0
           END AS q_lb
    FROM rk
    """,
)
def stat_ljung_box(spark, sf):
    """Ljung-Box Q over lags 1..7 of the daily revenue series — the
    JOINT whiteness test (events_autocorr reports each lag's r
    separately; a model-residual review needs one number saying
    "is there autocorrelation at ANY lag", and summing n(n+2)
    r_k^2/(n-k) weights the short-sample lags correctly where the
    naive sum of r^2 doesn't). Estimator discipline: the standard
    time-series autocorrelation (global-mean, global-variance
    denominator — NOT per-lag Pearson, which events_autocorr uses;
    the two disagree and Ljung-Box is defined over this one) from
    exact BIGINT moments, each r_k quantized to integer NANOS
    (r is in [-1,1], so nanos keep 9 digits and the squared terms
    lose nothing the round-6 output would see), the Q fold running
    over the 7-row lag relation in one identical expression.
    Degenerate series (zero variance, no pairs) guard to NULL.
    Same bounded x7 fan-out join shape as events_autocorr."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day_num")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc"))
        .select("day_num", F.expr("vc div 100").alias("v"))
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "ljungbox_daily")
    nn = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
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
    pr = (
        px.join(b, "tgt")
        .groupBy("lag")
        .agg(
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.count(F.lit(1)).cast("long").alias("np"),
        )
    )
    den = F.col("svv") - F.col("sv") * F.lit(1.0) * F.col("sv") / F.col("n")
    rk = (
        pr.crossJoin(nn)
        .filter((den > 0) & (F.col("np") > 0))
        .select(
            "lag",
            "n",
            F.round(
                F.lit(1000000000.0)
                * (
                    F.col("sxy")
                    - F.col("sx") * F.lit(1.0) * F.col("sy") / F.col("np")
                )
                / den
            )
            .cast("long")
            .alias("r_nanos"),
        )
    )
    r = F.col("r_nanos") / F.lit(1000000000.0)
    return rk.agg(
        F.max("n").cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_lags"),
        F.when(F.count(F.lit(1)) == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.max("n")
                * (F.max("n") + F.lit(2.0))
                * F.sum(r * r / (F.col("n") - F.col("lag"))),
                6,
            )
            + F.lit(0.0)
        )
        .alias("q_lb"),
    )


# ---------------------------------------------------------------------------
# group-aware split — the leakage-hygiene certificate
# ---------------------------------------------------------------------------
@q(
    "ml_group_split",
    """
    WITH lab AS (
      SELECT user_id, event_id,
             CASE WHEN substr(md5('split:' || CAST(user_id AS VARCHAR)),
                              1, 1) < 'c' THEN 'train' ELSE 'test' END
               AS split
      FROM events WHERE user_id IS NOT NULL),
    per_u AS (
      SELECT user_id, CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits
      FROM lab GROUP BY user_id),
    sizes AS (
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM lab GROUP BY split)
    SELECT s.split, s.n_events, s.n_users,
           (SELECT CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) FROM per_u) AS n_straddlers,
           round(s.n_events * 1.0 / SUM(s.n_events) OVER (), 6) + 0
             AS frac
    FROM sizes s
    """,
)
def ml_group_split(spark, sf):
    """GROUP-aware train/test split with a leakage certificate: the
    split key is the md5 of the USER, not the event, so every row
    of a user lands on one side — and the face OUTPUTS the
    straddler count (users appearing in both splits), which must be
    zero and is the single number that catches the classic eval
    bug (row-level random splits put a user's Monday in train and
    their Tuesday in test; any user-level memorization then grades
    as skill). Splitting by group hash is also the only split that
    SCALES: it's a map-side expression, needs no global shuffle or
    stored assignment table, and is stable under corpus growth —
    a user keeps their side forever, so yesterday's eval set stays
    clean after today's ingest (the sample_hash determinism
    discipline). The certificate is a corpus-collapsed per-user
    COUNT(DISTINCT split) folded to one scalar; split sizes and
    fractions ride the same scan."""
    lab = t(spark, sf, "events").filter(F.col("user_id").isNotNull()).select(
        "user_id",
        F.when(
            F.substring(
                F.md5(
                    F.concat(F.lit("split:"), F.col("user_id").cast("string"))
                ),
                1,
                1,
            )
            < "c",
            "train",
        )
        .otherwise("test")
        .alias("split"),
    )
    from ..operators.dedup import parquet_checkpoint

    lab = parquet_checkpoint(lab, "group_split_lab")
    straddle = (
        lab.groupBy("user_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_straddlers")
        )
    )
    sizes = lab.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    wall = Window.partitionBy()
    return sizes.crossJoin(straddle).select(
        "split",
        "n_events",
        "n_users",
        "n_straddlers",
        (
            F.round(
                F.col("n_events")
                * F.lit(1.0)
                / F.sum("n_events").over(wall),
                6,
            )
            + F.lit(0.0)
        ).alias("frac"),
    )


# ---------------------------------------------------------------------------
# one-pass correlation matrix — k measures, k(k-1)/2 corrs, one scan
# ---------------------------------------------------------------------------
@q(
    "stat_corr_matrix",
    """
    WITH m AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS a,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 % 24 AS b,
             event_id % 97 AS c
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           round(corr(a, b), 6) + 0 AS corr_ab,
           round(corr(a, c), 6) + 0 AS corr_ac,
           round(corr(b, c), 6) + 0 AS corr_bc
    FROM m
    """,
)
def stat_corr_matrix(spark, sf):
    """The pairwise correlation matrix of k derived measures in ONE
    corpus scan — stat_corr's single pair generalized the way a
    feature-screening pass actually runs it: all k(k-1)/2 corr()
    aggregates share the same Aggregate operator, so the cost is
    one pass + k^2 running moments, NOT k^2 passes (the
    single-scan discipline as an aggregate-fusion fact: Spark
    computes each corr with its own Corr imperative aggregate, all
    fed by the same scan — .explain shows one Scan, one
    Aggregate). Measures are exact integers (cents, hour-of-day,
    an id residue) so both engines' two-pass-free Pearson
    accumulators see identical inputs; round-6 + the -0 guard is
    the stat_corr float-parity discipline. The expected signal:
    corr_ac and corr_bc are ~0 by construction (id residue is
    independent), making this also a null-baseline sanity face."""
    m = t(spark, sf, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        F.round(F.col("value") * 100).cast("long").alias("a"),
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000 % 24"
        ).alias("b"),
        (F.col("event_id") % 97).alias("c"),
    )
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.round(F.corr("a", "b"), 6) + F.lit(0.0)).alias("corr_ab"),
        (F.round(F.corr("a", "c"), 6) + F.lit(0.0)).alias("corr_ac"),
        (F.round(F.corr("b", "c"), 6) + F.lit(0.0)).alias("corr_bc"),
    )


# ---------------------------------------------------------------------------
# circular statistics — when in the day does each type happen?
# ---------------------------------------------------------------------------
@q(
    "stat_circular",
    """
    WITH ev AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000)
               * (2 * pi() / 86400000000.0) AS theta
      FROM events WHERE ts IS NOT NULL),
    qz AS (
      SELECT event_type,
             CAST(round(1000000.0 * cos(theta)) AS BIGINT) AS cq,
             CAST(round(1000000.0 * sin(theta)) AS BIGINT) AS sq
      FROM ev),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cq) AS BIGINT) AS sc,
             CAST(SUM(sq) AS BIGINT) AS ss
      FROM qz GROUP BY event_type)
    SELECT event_type, n,
           round(sqrt(sc * 1.0 * sc + ss * 1.0 * ss) / 1000000.0 / n, 6)
             + 0 AS resultant,
           round((atan2(ss * 1.0, sc * 1.0) / (2 * pi()) * 24 + 24)
                 % 24, 6) + 0 AS mean_hour
    FROM m
    """,
)
def stat_circular(spark, sf):
    """Circular statistics of event time-of-day per type: the mean
    resultant length R (concentration: 1 = everything at the same
    instant, 0 = uniform around the clock) and the circular mean
    hour — the CORRECT way to average times of day, where the
    arithmetic mean is garbage (events at 23:00 and 01:00 average
    to midnight on the circle, to NOON in arithmetic — the exact
    bug events_heatmap's histogram sidesteps by never averaging;
    this face gives the two-parameter summary a scheduler wants).
    Each row's unit vector (cos θ, sin θ) quantizes to integer
    micros BEFORE the sum (the kg_adamic_adar rule — trig outputs
    are floats, and only quantization makes the per-type vector
    sum an exact order-independent BIGINT pair); R and the mean
    angle are then single identical float expressions (atan2's
    quadrant logic is IEEE-pinned on both engines; the +24 %% 24
    fold normalizes the negative branch). θ comes from pure epoch
    arithmetic — never hour()/minute(), which are zone-shifting."""
    ev = t(spark, sf, "events").filter(F.col("ts").isNotNull()).select(
        "event_type",
        (
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) % 86400000000")
            * F.lit(2 * 3.141592653589793 / 86400000000.0)
        ).alias("theta"),
    )
    qz = ev.select(
        "event_type",
        F.round(F.lit(1000000.0) * F.cos("theta")).cast("long").alias("cq"),
        F.round(F.lit(1000000.0) * F.sin("theta")).cast("long").alias("sq"),
    )
    m = qz.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cq").cast("long").alias("sc"),
        F.sum("sq").cast("long").alias("ss"),
    )
    sc, ss, n = F.col("sc"), F.col("ss"), F.col("n")
    return m.select(
        "event_type",
        "n",
        (
            F.round(
                F.sqrt(sc * F.lit(1.0) * sc + ss * F.lit(1.0) * ss)
                / F.lit(1000000.0)
                / n,
                6,
            )
            + F.lit(0.0)
        ).alias("resultant"),
        (
            F.round(
                (
                    F.atan2(ss * F.lit(1.0), sc * F.lit(1.0))
                    / (2 * F.lit(3.141592653589793))
                    * 24
                    + 24
                )
                % 24,
                6,
            )
            + F.lit(0.0)
        ).alias("mean_hour"),
    )


# ---------------------------------------------------------------------------
# seasonal strength — how much of the detrended variance is weekly?
# ---------------------------------------------------------------------------
@q(
    "stat_seasonal_strength",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM(CAST(round(value * 100) AS BIGINT)) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    w AS (
      SELECT day_num, v,
             COUNT(*) OVER win AS cnt, SUM(v) OVER win AS s7
      FROM daily
      WINDOW win AS (ORDER BY day_num
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
    d7 AS (
      SELECT day_num, 7 * v - s7 AS d, (day_num + 3) % 7 AS dow
      FROM w WHERE cnt = 7),
    dm AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(d) AS BIGINT) AS sd
      FROM d7 GROUP BY dow),
    r AS (
      SELECT d7.d,
             CAST(round(1000.0 * (d7.d - dm.sd * 1.0 / dm.nd))
                  AS BIGINT) AS r_millis
      FROM d7 JOIN dm ON dm.dow = d7.dow),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS s1,
             CAST(SUM(d * d) AS BIGINT) AS s2,
             CAST(SUM(r_millis) AS BIGINT) AS rs1,
             CAST(SUM(r_millis * r_millis) AS BIGINT) AS rs2
      FROM r)
    SELECT n,
           CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN NULL
                ELSE round(GREATEST(0.0,
                     1 - (n * rs2 - rs1 * 1.0 * rs1) / 1000000.0
                         / (n * s2 - s1 * 1.0 * s1)), 6) + 0
           END AS seasonal_strength
    FROM m
    """,
)
def stat_seasonal_strength(spark, sf):
    """Hyndman-style seasonal strength of the weekly cycle:
    1 - Var(remainder)/Var(detrended), where the detrended series
    is events_seasonal's exact-BIGINT d7 = 7*v - sum7 (rolling full
    weeks only) and the seasonal component is the per-day-of-week
    mean of d7 — the single number that says whether the weekly
    pattern events_heatmap displays is LOAD-BEARING (strength near
    1: schedule capacity by weekday; near 0: the heatmap is noise;
    events_autocorr's lag-7 r is the correlation cousin, this is
    the variance-decomposition form forecasting literature uses).
    dow from pure epoch arithmetic ((day+3) % 7 — NEVER
    dayofweek(), the events_heatmap locale lesson); residuals
    quantize to millis against the rational dow means before the
    moment fold (exact order-independent sums; the variance ratio
    then divides the millis^2 scale back out); degenerate variance
    guards to NULL and the GREATEST clamps the estimator's
    negative tail (remainder can out-vary the input when n_dow is
    tiny). The d7 relation feeds two consumers (dow means and
    residuals) — parquet_checkpointed per the multi-consumer
    rule."""
    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day_num")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc"))
        .select("day_num", F.expr("vc div 100").alias("v"))
    )
    win = Window.orderBy("day_num").rowsBetween(-6, Window.currentRow)
    w = daily.select(
        "day_num",
        "v",
        F.count(F.lit(1)).over(win).alias("cnt"),
        F.sum("v").over(win).alias("s7"),
    )
    d7 = (
        w.filter(F.col("cnt") == 7)
        .select(
            "day_num",
            (7 * F.col("v") - F.col("s7")).alias("d"),
            ((F.col("day_num") + 3) % 7).alias("dow"),
        )
    )
    d7 = parquet_checkpoint(d7, "seasonal_strength_d7")
    dm = d7.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("d").cast("long").alias("sd"),
    )
    r = d7.join(dm, "dow").select(
        "d",
        F.round(
            F.lit(1000.0)
            * (F.col("d") - F.col("sd") * F.lit(1.0) / F.col("nd"))
        )
        .cast("long")
        .alias("r_millis"),
    )
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("s1"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
        F.sum("r_millis").cast("long").alias("rs1"),
        F.sum(F.col("r_millis") * F.col("r_millis"))
        .cast("long")
        .alias("rs2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    rs1, rs2 = F.col("rs1"), F.col("rs2")
    bad = (n < 2) | (n * s2 - s1 * s1 <= 0)
    return m.select(
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.greatest(
                    F.lit(0.0),
                    1
                    - (n * rs2 - rs1 * F.lit(1.0) * rs1)
                    / F.lit(1000000.0)
                    / (n * s2 - s1 * F.lit(1.0) * s1),
                ),
                6,
            )
            + F.lit(0.0)
        )
        .alias("seasonal_strength"),
    )


# ---------------------------------------------------------------------------
# Gumbel block-maxima fit — what does the worst week look like?
# ---------------------------------------------------------------------------
@q(
    "stat_gumbel",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             SUM(CAST(round(value * 100) AS BIGINT)) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    blocks AS (
      SELECT day_num // 7 AS wk, CAST(MAX(v) AS BIGINT) AS mx,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM daily GROUP BY 1),
    full_b AS (SELECT mx FROM blocks WHERE nd = 7),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(mx) AS BIGINT) AS s1,
             CAST(SUM(mx * mx) AS BIGINT) AS s2
      FROM full_b)
    SELECT n,
           CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN NULL
                ELSE round(sqrt(6.0 * ((n * s2 - s1 * 1.0 * s1)
                                       / (n * (n - 1.0))))
                           / 3.14159265358979312, 6) + 0
           END AS beta,
           CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN NULL
                ELSE round(s1 * 1.0 / n
                           - 0.57721566490153287
                             * (sqrt(6.0 * ((n * s2 - s1 * 1.0 * s1)
                                            / (n * (n - 1.0))))
                                / 3.14159265358979312), 6) + 0
           END AS mu,
           CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN NULL
                ELSE round(s1 * 1.0 / n
                           - 0.57721566490153287
                             * (sqrt(6.0 * ((n * s2 - s1 * 1.0 * s1)
                                            / (n * (n - 1.0))))
                                / 3.14159265358979312)
                           - (sqrt(6.0 * ((n * s2 - s1 * 1.0 * s1)
                                          / (n * (n - 1.0))))
                              / 3.14159265358979312)
                             * ln(-ln(1.0 - 1.0 / 52.0)), 6) + 0
           END AS level_52wk
    FROM m
    """,
)
def stat_gumbel(spark, sf):
    """Gumbel fit to the WEEKLY MAXIMA of daily revenue
    (method-of-moments: beta = sqrt(6)*sd/pi, mu = mean - gamma*beta)
    and the 52-week return level mu - beta*ln(-ln(1 - 1/52)) — the
    extreme-value answer to "what daily peak should capacity absorb
    once a year?", which no mean/variance face can give (the
    Fisher-Tippett result: block maxima converge to a GEV, Gumbel
    for light tails, and planning from the ALL-DATA variance
    systematically under-provisions peaks; events_peak finds the
    historical spikes, this face extrapolates the next one).
    Partial weeks drop (a 3-day block maximum is biased low); the
    maxima relation is calendar-bounded; the fit is one identical
    float expression over two exact BIGINT moments with the
    Euler-Mascheroni and pi constants embedded as IMPORT-TIME
    literals on both plans (the ml_ndcg discipline); degenerate
    variance guards to NULL."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day_num")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc"))
        .select("day_num", F.expr("vc div 100").alias("v"))
    )
    blocks = daily.groupBy(F.expr("day_num div 7").alias("wk")).agg(
        F.max("v").cast("long").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    )
    m = blocks.filter(F.col("nd") == 7).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("s2"),
    )
    pi = 3.14159265358979312
    gamma = 0.57721566490153287
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    var = (n * s2 - s1 * F.lit(1.0) * s1) / (n * (n - F.lit(1.0)))
    beta = F.sqrt(F.lit(6.0) * var) / F.lit(pi)
    mu = s1 * F.lit(1.0) / n - F.lit(gamma) * beta
    lvl = mu - beta * F.log(-F.log(F.lit(1.0) - F.lit(1.0) / F.lit(52.0)))
    bad = (n < 2) | (n * s2 - s1 * s1 <= 0)
    return m.select(
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(beta, 6) + F.lit(0.0))
        .alias("beta"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(mu, 6) + F.lit(0.0))
        .alias("mu"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(lvl, 6) + F.lit(0.0))
        .alias("level_52wk"),
    )


# ---------------------------------------------------------------------------
# process capability — Cp / Cpk against literal spec limits
# ---------------------------------------------------------------------------
@q(
    "stat_cpk",
    """
    WITH m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS s1,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS s2
      FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT event_type, n,
           CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN NULL
                ELSE round((50000 - 1000) / 6.0
                     / sqrt((n * s2 - s1 * 1.0 * s1)
                            / (n * (n - 1.0))), 6) + 0
           END AS cp,
           CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN NULL
                ELSE round(LEAST(50000 - s1 * 1.0 / n,
                                 s1 * 1.0 / n - 1000) / 3.0
                     / sqrt((n * s2 - s1 * 1.0 * s1)
                            / (n * (n - 1.0))), 6) + 0
           END AS cpk
    FROM m
    """,
)
def stat_cpk(spark, sf):
    """Process capability Cp / Cpk of the per-type value
    distribution against literal spec limits ($10 .. $500) — the
    quality-engineering pair the z-score family doesn't give: Cp
    asks whether the SPREAD fits the tolerance band at all
    ((USL-LSL)/6 sigma), Cpk additionally penalizes OFF-CENTER
    processes (min distance to either limit over 3 sigma), and the
    gap between them is pure centering error — the triage that
    says 'tighten variance' vs 'shift the mean', which a
    violation-rate alone can't distinguish. In a data pipeline the
    same arithmetic grades any SLO'd metric (latency against its
    band, document lengths against chunker limits). Exact integer
    cents moments, one identical float expression, degenerate
    variance to NULL; spec limits are literals by design — they're
    the CONTRACT, not a statistic."""
    cents = F.round(F.col("value") * 100).cast("long")
    m = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "event_type", cents.alias("c")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    sd = F.sqrt((n * s2 - s1 * F.lit(1.0) * s1) / (n * (n - F.lit(1.0))))
    mean = s1 * F.lit(1.0) / n
    bad = (n < 2) | (n * s2 - s1 * s1 <= 0)
    return m.select(
        "event_type",
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round((F.lit(50000) - F.lit(1000)) / F.lit(6.0) / sd, 6)
            + F.lit(0.0)
        )
        .alias("cp"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.least(F.lit(50000) - mean, mean - F.lit(1000))
                / F.lit(3.0)
                / sd,
                6,
            )
            + F.lit(0.0)
        )
        .alias("cpk"),
    )


# ---------------------------------------------------------------------------
# two-proportion z-test — pooled-variance rate comparison
# ---------------------------------------------------------------------------
@q(
    "stat_prop_ztest",
    """
    WITH lab AS (
      SELECT CASE WHEN substr(md5('pz:' || CAST(event_id AS VARCHAR)),
                              1, 1) < '8' THEN 1 ELSE 0 END AS ina,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    g AS (
      SELECT ina, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS k
      FROM lab GROUP BY ina),
    p AS (
      SELECT CAST(MAX(CASE WHEN ina = 1 THEN n END) AS BIGINT) AS n1,
             CAST(MAX(CASE WHEN ina = 1 THEN k END) AS BIGINT) AS k1,
             CAST(MAX(CASE WHEN ina = 0 THEN n END) AS BIGINT) AS n2,
             CAST(MAX(CASE WHEN ina = 0 THEN k END) AS BIGINT) AS k2
      FROM g)
    SELECT COALESCE(n1, 0) AS n1, COALESCE(k1, 0) AS k1,
           COALESCE(n2, 0) AS n2, COALESCE(k2, 0) AS k2,
           CASE WHEN n1 IS NULL OR n2 IS NULL
                     OR (k1 + k2) * ((n1 + n2) - (k1 + k2)) = 0
                THEN NULL
                ELSE round((k1 * 1.0 / n1 - k2 * 1.0 / n2)
                     / sqrt((k1 + k2) * 1.0 / (n1 + n2)
                            * (1 - (k1 + k2) * 1.0 / (n1 + n2))
                            * (1.0 / n1 + 1.0 / n2)), 6) + 0
           END AS z
    FROM p
    """,
)
def stat_prop_ztest(spark, sf):
    """Two-proportion z-test on the purchase RATE between the md5
    halves — the rate companion to stat_ttest (means) and
    stat_mcnemar (paired classifiers): conversion-rate A/B tests
    are proportion tests, and the pooled-variance z is their
    standard form (the pooling is the null hypothesis itself: if
    the rates are equal, the best variance estimate uses the
    combined rate). One corpus scan to two (n, k) pairs, the
    grouped MAX-CASE pivot (kg_delta idiom), and z as one
    identical float expression over four exact BIGINTs; a missing
    half or a degenerate pooled rate (all successes / all
    failures — zero variance under the null) guards to NULL.
    stat_wilson_ci gives each rate its interval; this face gives
    the DIFFERENCE its test."""
    lab = t(spark, sf, "events").select(
        F.when(
            F.substring(
                F.md5(
                    F.concat(F.lit("pz:"), F.col("event_id").cast("string"))
                ),
                1,
                1,
            )
            < "8",
            1,
        )
        .otherwise(0)
        .alias("ina"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = lab.groupBy("ina").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("k"),
    )
    p = g.agg(
        *[
            F.max(F.when(F.col("ina") == flag, F.col(c)))
            .cast("long")
            .alias(f"{c}{i}")
            for flag, i in ((1, 1), (0, 2))
            for c in ("n", "k")
        ]
    )
    n1, k1, n2, k2 = F.col("n1"), F.col("k1"), F.col("n2"), F.col("k2")
    pool = (k1 + k2) * F.lit(1.0) / (n1 + n2)
    z = (k1 * F.lit(1.0) / n1 - k2 * F.lit(1.0) / n2) / F.sqrt(
        pool * (1 - pool) * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    )
    bad = (
        n1.isNull()
        | n2.isNull()
        | ((k1 + k2) * ((n1 + n2) - (k1 + k2)) == 0)
    )
    return p.select(
        F.coalesce(n1, F.lit(0)).alias("n1"),
        F.coalesce(k1, F.lit(0)).alias("k1"),
        F.coalesce(n2, F.lit(0)).alias("n2"),
        F.coalesce(k2, F.lit(0)).alias("k2"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6) + F.lit(0.0))
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# odds ratio with Wald CI — the 2x2 effect size
# ---------------------------------------------------------------------------
@q(
    "stat_odds_ratio",
    """
    WITH lab AS (
      SELECT CASE WHEN substr(md5('or:' || CAST(event_id AS VARCHAR)),
                              1, 1) < '8' THEN 1 ELSE 0 END AS exposed,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    m AS (
      SELECT CAST(SUM(CASE WHEN exposed = 1 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN exposed = 1 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN exposed = 0 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN exposed = 0 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM lab)
    SELECT a, b, c, d,
           CASE WHEN a * b * c * d = 0 THEN NULL
                ELSE round(a * 1.0 * d / (b * 1.0 * c), 6) + 0
           END AS odds_ratio,
           CASE WHEN a * b * c * d = 0 THEN NULL
                ELSE round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                     - 1.95996398454005
                       * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)),
                     6) + 0
           END AS or_lo,
           CASE WHEN a * b * c * d = 0 THEN NULL
                ELSE round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                     + 1.95996398454005
                       * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)),
                     6) + 0
           END AS or_hi
    FROM m
    """,
)
def stat_odds_ratio(spark, sf):
    """Odds ratio of purchase between the md5-exposed halves with
    the 95% Wald interval on the log scale — the 2x2 effect size
    epidemiology and churn analysis report (stat_prop_ztest answers
    'is there a difference?'; the OR answers 'how many-fold', is
    invariant to which margin was sampled — the property risk
    ratios lack — and its CI is the shipping criterion: an interval
    covering 1.0 is a no-go). One corpus scan to the exact 2x2
    (a, b, c, d); OR and the exp(logOR +/- z*SE) bounds are single
    identical float expressions with z embedded as the import-time
    literal (the stat_wilson_ci discipline); ANY empty cell NULLs
    all three (the classic zero-cell pathology — production adds
    the Haldane 0.5 correction, documented rather than silently
    applied). Sanity identity pinned in tests: OR lies inside its
    own CI."""
    lab = t(spark, sf, "events").select(
        F.when(
            F.substring(
                F.md5(
                    F.concat(F.lit("or:"), F.col("event_id").cast("string"))
                ),
                1,
                1,
            )
            < "8",
            1,
        )
        .otherwise(0)
        .alias("exposed"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    m = lab.agg(
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
    orx = a * F.lit(1.0) * d / (b * F.lit(1.0) * c)
    se = F.sqrt(
        F.lit(1.0) / a + F.lit(1.0) / b + F.lit(1.0) / c + F.lit(1.0) / d
    )
    z = 1.95996398454005
    bad = a * b * c * d == 0
    return m.select(
        "a",
        "b",
        "c",
        "d",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(orx, 6) + F.lit(0.0))
        .alias("odds_ratio"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.exp(F.log(orx) - F.lit(z) * se), 6) + F.lit(0.0)
        )
        .alias("or_lo"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.exp(F.log(orx) + F.lit(z) * se), 6) + F.lit(0.0)
        )
        .alias("or_hi"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve — cumulative revenue share at population deciles
# ---------------------------------------------------------------------------
@q(
    "stat_lorenz",
    """
    WITH sup AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM events WHERE value IS NOT NULL AND value >= 0
      GROUP BY 1),
    w AS (
      SELECT c, k,
             SUM(k) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS ck,
             SUM(k * c) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cs,
             SUM(k) OVER () AS n, SUM(k * c) OVER () AS s
      FROM sup),
    ds AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS d)
    SELECT CAST(ds.d AS INT) AS decile,
           round(MAX(CASE WHEN w.ck * 10 <= w.n * ds.d
                          THEN w.cs * 1.0 / w.s END), 6) + 0
             AS lorenz_share
    FROM ds CROSS JOIN w
    GROUP BY ds.d
    """,
)
def stat_lorenz(spark, sf):
    """Lorenz curve points at population deciles: the revenue share
    held by the bottom d/10 of events — the CURVE under stat_gini's
    scalar (Gini is twice the area between this curve and the
    diagonal; the curve says WHERE the inequality lives — a 0.4
    Gini from a missing middle and one from a super-heavy top decile
    are different businesses). Count-of-counts discipline: the
    corpus collapses to the per-distinct-cents support, cumulative
    population and cumulative mass are windows over it (the
    stat_gini closed-form family — the corpus is never sorted), and
    each decile point takes the LAST support row whose cumulative
    population fraction is still <= d/10 — the all-integer test
    ck*10 <= n*d, so the point selection can't float-diverge; the
    share itself is one float division. Step-function convention
    (no interpolation — the curve of the actual multiset); a decile
    below the smallest support point yields NULL rather than an
    interpolated fiction."""
    sup = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull() & (F.col("value") >= 0))
        .groupBy(F.round(F.col("value") * 100).cast("long").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    wc = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    w = sup.select(
        "c",
        F.sum("k").over(wc).alias("ck"),
        F.sum(F.col("k") * F.col("c")).over(wc).alias("cs"),
        F.sum("k").over(wall).alias("n"),
        F.sum(F.col("k") * F.col("c")).over(wall).alias("s"),
    )
    ds = t(spark, sf, "events").sparkSession.createDataFrame(
        [(d,) for d in range(1, 10)], "d int"
    )
    j = ds.crossJoin(w)
    return j.groupBy(F.col("d").cast("int").alias("decile")).agg(
        (
            F.round(
                F.max(
                    F.when(
                        F.col("ck") * 10 <= F.col("n") * F.col("d"),
                        F.col("cs") * F.lit(1.0) / F.col("s"),
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("lorenz_share")
    )


# ---------------------------------------------------------------------------
# recall@k — the retrieval-coverage metric next to MAP/MRR/NDCG
# ---------------------------------------------------------------------------
@q(
    "ml_recall_at_k",
    """
    WITH r AS (
      SELECT user_id, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    rk AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY cents DESC, event_id) AS rn
      FROM r),
    agg AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_rel,
             SUM(CASE WHEN event_type = 'purchase' AND rn <= 5
                      THEN 1 ELSE 0 END) AS hits
      FROM rk GROUP BY user_id)
    SELECT user_id, CAST(n_rel AS BIGINT) AS n_rel,
           CAST(hits AS BIGINT) AS hits_at_5,
           round(hits / CAST(n_rel AS DOUBLE), 6) + 0 AS recall_at_5
    FROM agg WHERE n_rel > 0
    """,
)
def ml_recall_at_k(spark, sf_dir):
    """Recall@5 per user — the retrieval-COVERAGE metric completing
    the ranking-eval suite (ml_map averages precision over ranks,
    ml_mrr scores the first hit, ml_ndcg discounts by position;
    recall@k asks the deployment question: of everything relevant,
    what fraction did the k-item page surface?). Events rank by
    exact cents DESC with event_id as the deterministic tie-break
    (every ranking window carries one — registry rule), relevance =
    purchase events, and users with zero relevant rows are excluded
    (0/0 is undefined, and under ANSI the unguarded division is a
    crash, not just a parity bug — the drift_chi2 lesson). Ratio of
    small exact integers -> round-6 is exact on both engines. Scale
    shape: one window + one agg sharing the user_id exchange, same
    shape audit #65 pins for ml_mrr."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.round(F.col("value") * 100).cast("long").desc(), F.col("event_id")
    )
    rk = e.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    )
    agg = rk.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_rel"),
        F.sum(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("rn") <= 5), 1
            ).otherwise(0)
        ).alias("hits"),
    )
    return agg.filter(F.col("n_rel") > 0).select(
        "user_id",
        F.col("n_rel").cast("long").alias("n_rel"),
        F.col("hits").cast("long").alias("hits_at_5"),
        (F.round(F.col("hits") / F.col("n_rel"), 6) + F.lit(0.0)).alias(
            "recall_at_5"
        ),
    )


# ---------------------------------------------------------------------------
# Bartlett's test — equal variances via pooled/per-group log-variance
# ---------------------------------------------------------------------------
@q(
    "stat_bartlett",
    """
    WITH v AS (
      SELECT event_type AS g,
             CAST(round(value * 100) AS BIGINT) // 100 AS x
      FROM events WHERE value IS NOT NULL),
    grp AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(x) AS BIGINT) AS s_g,
             CAST(SUM(x * x) AS BIGINT) AS q_g
      FROM v GROUP BY g),
    ok AS (
      SELECT g, n_g, n_g * q_g - s_g * s_g AS ss_g
      FROM grp WHERE n_g >= 2 AND n_g * q_g - s_g * s_g > 0),
    terms AS (
      SELECT n_g,
             CAST(round(1000000.0 * (n_g - 1)
                        * ln(CAST(ss_g AS DOUBLE)
                             / (n_g * (n_g - 1.0)))) AS BIGINT) AS t_us,
             CAST(round(1000000.0 * CAST(ss_g AS DOUBLE) / n_g)
                  AS BIGINT) AS w_us,
             CAST(round(1000000000000.0 / (n_g - 1.0)) AS BIGINT) AS h_ps
      FROM ok),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(t_us) AS BIGINT) AS sum_t_us,
             CAST(SUM(w_us) AS BIGINT) AS sum_w_us,
             CAST(SUM(h_ps) AS BIGINT) AS sum_h_ps
      FROM terms)
    SELECT k, n, sum_w_us, sum_t_us,
           CASE WHEN k < 2 THEN NULL
                ELSE round(((n - k) * ln((sum_w_us / 1000000.0)
                                         / (n - k))
                            - sum_t_us / 1000000.0)
                           / (1.0 + (sum_h_ps / 1000000000000.0
                                     - 1.0 / (n - k))
                                    / (3.0 * (k - 1))), 6) + 0
           END AS chi2
    FROM agg
    """,
)
def stat_bartlett(spark, sf):
    """Bartlett's test for variance homogeneity across event types —
    the parametric sibling of stat_levene (Bartlett is the more
    powerful test when the data is near-normal and the more fragile
    one when it is not; run both, and when they disagree the
    DISTRIBUTION is the story, not the variances). The statistic
    needs three corpus-independent folds of per-group quantities —
    (n_g-1)ln(s_g^2), the pooled-variance mass (n_g-1)s_g^2, and the
    correction's harmonic sum 1/(n_g-1) — and a naive double SUM of
    any of them is partition-order-dependent; each is quantized ONCE
    per group (micros for the two variance terms, PICOS for the tiny
    harmonic reciprocals — the sample_weighted precision precedent)
    so all three aggregates are exact order-independent BIGINT sums,
    and only the final assembly of chi2 runs in doubles, in ONE
    identically-ordered expression, round-6. Values are floored to
    whole dollars for BIGINT headroom in n_g*q_g at any sf
    (events_autocorr trick). Groups with n_g < 2 (variance
    undefined) or zero variance (ln 0 = -inf; Bartlett assumes
    positive s^2) are excluded BEFORE the fold, mirrored in the
    twin; k < 2 NULLs the statistic. ss_g = n_g*q_g - s_g^2 is the
    cross-multiplied variance numerator — exact, no mean
    subtraction, the stat_anova discipline."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.expr(
                "CAST(round(value * 100) AS BIGINT) div 100"
            ).alias("x"),
        )
    )
    grp = v.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("s_g"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q_g"),
    )
    ss = F.col("n_g") * F.col("q_g") - F.col("s_g") * F.col("s_g")
    ok = grp.select("g", "n_g", ss.alias("ss_g")).filter(
        (F.col("n_g") >= 2) & (F.col("ss_g") > 0)
    )
    terms = ok.select(
        "n_g",
        F.round(
            F.lit(1000000.0)
            * (F.col("n_g") - 1)
            * F.log(
                F.col("ss_g").cast("double")
                / (F.col("n_g") * (F.col("n_g") - F.lit(1.0)))
            )
        )
        .cast("long")
        .alias("t_us"),
        F.round(
            F.lit(1000000.0) * F.col("ss_g").cast("double") / F.col("n_g")
        )
        .cast("long")
        .alias("w_us"),
        F.round(
            F.lit(1000000000000.0) / (F.col("n_g") - F.lit(1.0))
        )
        .cast("long")
        .alias("h_ps"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("t_us").cast("long").alias("sum_t_us"),
        F.sum("w_us").cast("long").alias("sum_w_us"),
        F.sum("h_ps").cast("long").alias("sum_h_ps"),
    )
    chi2 = (
        (F.col("n") - F.col("k"))
        * F.log(
            (F.col("sum_w_us") / F.lit(1000000.0))
            / (F.col("n") - F.col("k"))
        )
        - F.col("sum_t_us") / F.lit(1000000.0)
    ) / (
        F.lit(1.0)
        + (
            F.col("sum_h_ps") / F.lit(1000000000000.0)
            - F.lit(1.0) / (F.col("n") - F.col("k"))
        )
        / (F.lit(3.0) * (F.col("k") - 1))
    )
    return agg.select(
        "k",
        "n",
        "sum_w_us",
        "sum_t_us",
        F.when(F.col("k") < 2, F.lit(None).cast("double"))
        .otherwise(F.round(chi2, 6) + F.lit(0.0))
        .alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Wasserstein-1 distance between the A/B halves — exact integer transport
# ---------------------------------------------------------------------------
@q(
    "stat_wasserstein",
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
             SUM(na_v) OVER (ORDER BY v) AS ca,
             SUM(nb_v) OVER (ORDER BY v) AS cb,
             SUM(na_v) OVER () AS na, SUM(nb_v) OVER () AS nb,
             LEAD(v) OVER (ORDER BY v) AS nxt
      FROM cells),
    seg AS (
      SELECT na, nb,
             abs(ca * nb - cb * na) * (nxt - v) AS w_term
      FROM cum WHERE nxt IS NOT NULL)
    SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(COALESCE(SUM(w_term), 0) AS BIGINT) AS w1_scaled,
           CASE WHEN MAX(na) = 0 OR MAX(nb) = 0 THEN NULL
                ELSE round(CAST(SUM(w_term) AS DOUBLE)
                           / MAX(na) / MAX(nb) / 100.0, 6) + 0
           END AS w1_dollars
    FROM seg
    """,
)
def stat_wasserstein(spark, sf):
    """Wasserstein-1 (earth mover's) distance between the value
    distributions of the two md5 halves — THE drift metric with
    units (dollars of probability mass moved), where stat_ks gives a
    unitless sup-norm and drift_chi2 a significance: W1 is what you
    threshold when the question is 'does the drift MATTER'. For 1-D
    discrete distributions W1 = integral |F_a - F_b| dx, which over
    the support grid is a SUM of |cumA*NB - cumB*NA| * gap terms —
    cross-multiplied ECDFs (the stat_ks trick) times the integer
    cents gap to the next support point: every term is an exact
    BIGINT, the whole integral is an exact order-independent integer
    (w1_scaled), and only the final unit conversion divides. One
    corpus scan -> support-sized cells relation -> one window chain
    ordered by value (support-sized, the count-of-counts
    discipline); the last support point carries no segment (both
    CDFs are 1 beyond it). A/A split at fixture scale, so W1 is
    small but nonzero — the replay test pins the exact integer."""
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
        "v",
        F.sum("na_v").over(wcum).alias("ca"),
        F.sum("nb_v").over(wcum).alias("cb"),
        F.sum("na_v").over(wall).alias("na"),
        F.sum("nb_v").over(wall).alias("nb"),
        F.lead("v").over(wcum).alias("nxt"),
    )
    seg = cum.filter(F.col("nxt").isNotNull()).select(
        "na",
        "nb",
        (
            F.abs(
                F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")
            )
            * (F.col("nxt") - F.col("v"))
        ).alias("w_term"),
    )
    return seg.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.coalesce(F.sum("w_term"), F.lit(0))
        .cast("long")
        .alias("w1_scaled"),
        F.when(
            (F.max("na") == 0) | (F.max("nb") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.sum("w_term").cast("double")
                / F.max("na")
                / F.max("nb")
                / F.lit(100.0),
                6,
            )
            + F.lit(0.0)
        )
        .alias("w1_dollars"),
    )


# ---------------------------------------------------------------------------
# Cramér-von Mises two-sample statistic — the L2 companion to stat_ks
# ---------------------------------------------------------------------------
@q(
    "stat_cvm",
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
             SUM(na_v) OVER (ORDER BY v) AS ca,
             SUM(nb_v) OVER (ORDER BY v) AS cb,
             SUM(na_v) OVER () AS na, SUM(nb_v) OVER () AS nb
      FROM cells),
    terms AS (
      SELECT na, nb,
             CAST(round(1000000.0 * (na_v + nb_v)
                        * (CAST(ca * nb - cb * na AS DOUBLE)
                           / (CAST(na AS DOUBLE) * nb))
                        * (CAST(ca * nb - cb * na AS DOUBLE)
                           / (CAST(na AS DOUBLE) * nb)))
                  AS BIGINT) AS t_us
      FROM cum)
    SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(COALESCE(SUM(t_us), 0) AS BIGINT) AS sum_t_us,
           CASE WHEN MAX(na) = 0 OR MAX(nb) = 0 THEN NULL
                ELSE round(CAST(MAX(na) AS DOUBLE) * MAX(nb)
                           / ((MAX(na) + MAX(nb))
                              * (MAX(na) + MAX(nb)) * 1.0)
                           * (SUM(t_us) / 1000000.0), 6) + 0
           END AS t_stat
    FROM terms
    """,
)
def stat_cvm(spark, sf):
    """Two-sample Cramér-von Mises T — the L2 companion to stat_ks'
    sup-norm (KS sees the single worst CDF gap; CvM integrates ALL
    of them, so it catches broad small drifts KS dilutes): T =
    nm/(n+m)^2 * sum over pooled observations of (F_a - F_b)^2.
    Shares stat_wasserstein's exact cells->cumulative machinery;
    each pooled-point term weights the squared cross-multiplied CDF
    gap by that value's pooled count, but the SQUARE of
    (ca*nb - cb*na) overflows BIGINT (~1e8 squared times 1e4-row
    support), so each term computes in DOUBLE — in ONE identical
    operation order — and micros-quantizes BEFORE the sum, making
    the aggregate an exact order-independent integer again (the
    kg_adamic_adar sum-of-logs discipline applied to squares). One
    scan, one window chain over the support-sized relation."""
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
        F.sum("na_v").over(wcum).alias("ca"),
        F.sum("nb_v").over(wcum).alias("cb"),
        F.sum("na_v").over(wall).alias("na"),
        F.sum("nb_v").over(wall).alias("nb"),
    )
    d = (
        F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")
    ).cast("double") / (F.col("na").cast("double") * F.col("nb"))
    terms = cum.select(
        "na",
        "nb",
        F.round(
            F.lit(1000000.0) * (F.col("na_v") + F.col("nb_v")) * d * d
        )
        .cast("long")
        .alias("t_us"),
    )
    return terms.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.coalesce(F.sum("t_us"), F.lit(0))
        .cast("long")
        .alias("sum_t_us"),
        F.when(
            (F.max("na") == 0) | (F.max("nb") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.max("na").cast("double")
                * F.max("nb")
                / (
                    (F.max("na") + F.max("nb"))
                    * (F.max("na") + F.max("nb"))
                    * F.lit(1.0)
                )
                * (F.sum("t_us") / F.lit(1000000.0)),
                6,
            )
            + F.lit(0.0)
        )
        .alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# sign-flip permutation test — md5-derived replicates, exact integers
# ---------------------------------------------------------------------------
_PERM_K = 64


@q(
    "stat_perm_test",
    f"""
    WITH lab AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ina
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    daily AS (
      SELECT day_num,
             (SUM(ina * cents) - SUM((1 - ina) * cents)) // 100 AS d
      FROM lab GROUP BY day_num),
    fan AS (
      SELECT day_num, d, k.k AS k
      FROM daily, (SELECT unnest(range(0, {_PERM_K})) AS k) k),
    signed AS (
      SELECT k, d,
             CASE WHEN substr(md5(CAST(day_num AS VARCHAR) || ':'
                                  || CAST(k AS VARCHAR)), 1, 1) < '8'
                  THEN d ELSE -d END AS sd
      FROM fan),
    reps AS (
      SELECT k, CAST(SUM(sd) AS BIGINT) AS t_k,
             CAST(SUM(d) AS BIGINT) AS t_obs,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM signed GROUP BY k)
    SELECT MAX(n_days) AS n_days,
           CAST(MAX(t_obs) AS BIGINT) AS t_obs,
           CAST(SUM(CASE WHEN abs(t_k) >= abs(t_obs) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_extreme,
           round((1.0 + SUM(CASE WHEN abs(t_k) >= abs(t_obs)
                                 THEN 1 ELSE 0 END))
                 / (1.0 + {_PERM_K}), 6) + 0 AS p_value
    FROM reps
    """,
)
def stat_perm_test(spark, sf):
    """Paired sign-flip permutation test — the distribution-free
    answer to 'is the A/B daily revenue gap real?' that needs NO
    normal approximation (stat_ttest's assumption) and no rank
    transform (stat_wilcoxon's information loss): under H0 the
    per-day difference d_i is symmetric around 0, so each replicate
    flips every day's sign by a deterministic md5 coin (the
    kg_walks/text_collation coin discipline — both engines derive
    the SAME 64 sign patterns from day_num:k, no RNG anywhere) and
    the p-value is the add-one-smoothed fraction of replicates at
    least as extreme as the observed sum. Everything is an exact
    BIGINT fold: daily diffs floor to dollars (headroom), T_obs
    rides every replicate group as the unsigned sum. Scale shape:
    corpus -> calendar-sized daily agg -> x64 fan-out of the TINY
    relation (never the corpus — the events_rolling_dau bounded
    explode) -> 64-row replicate agg -> one row. With K = 64 the
    resolution floor is p = 1/65; production raises K, the shape is
    K-linear in the calendar only."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day_num"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
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
    daily = lab.groupBy("day_num").agg(
        F.expr(
            "(SUM(ina * cents) - SUM((1 - ina) * cents)) div 100"
        ).alias("d")
    )
    fan = daily.select(
        "day_num",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_K - 1))).alias("k"),
    )
    coin = (
        F.substring(
            F.md5(
                F.concat(
                    F.col("day_num").cast("string"),
                    F.lit(":"),
                    F.col("k").cast("string"),
                )
            ),
            1,
            1,
        )
        < "8"
    )
    signed = fan.select(
        "k",
        "d",
        F.when(coin, F.col("d")).otherwise(-F.col("d")).alias("sd"),
    )
    reps = signed.groupBy("k").agg(
        F.sum("sd").cast("long").alias("t_k"),
        F.sum("d").cast("long").alias("t_obs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    extreme = F.when(
        F.abs(F.col("t_k")) >= F.abs(F.col("t_obs")), 1
    ).otherwise(0)
    return reps.agg(
        F.max("n_days").cast("long").alias("n_days"),
        F.max("t_obs").cast("long").alias("t_obs"),
        F.sum(extreme).cast("long").alias("n_extreme"),
        (
            F.round(
                (F.lit(1.0) + F.sum(extreme)) / F.lit(1.0 + _PERM_K), 6
            )
            + F.lit(0.0)
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# native moment aggregates certified against exact power-sum assembly
# ---------------------------------------------------------------------------
@q(
    "agg_native_moments",
    """
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) // 100 AS x
      FROM events WHERE value IS NOT NULL),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(x * x) AS BIGINT) AS s2,
             CAST(SUM(x * x * x) AS BIGINT) AS s3,
             CAST(SUM(x * x * x * x) AS BIGINT) AS s4
      FROM v),
    m AS (
      SELECT n, s1, s2, s3, s4,
             (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
               / (CAST(n AS DOUBLE) * n) AS m2,
             (CAST(n AS DOUBLE) * n * s3
              - 3.0 * n * CAST(s1 AS DOUBLE) * s2
              + 2.0 * CAST(s1 AS DOUBLE) * s1 * s1)
               / (CAST(n AS DOUBLE) * n * n) AS m3,
             (CAST(n AS DOUBLE) * n * n * s4
              - 4.0 * CAST(n AS DOUBLE) * n * s1 * s3
              + 6.0 * CAST(n AS DOUBLE) * s1 * s1 * s2
              - 3.0 * CAST(s1 AS DOUBLE) * s1 * s1 * s1)
               / (CAST(n AS DOUBLE) * n * n * n) AS m4
      FROM s)
    SELECT n, s1,
           CASE WHEN n = 0 THEN NULL
                ELSE round(CAST(s1 AS DOUBLE) / n, 6) + 0 END AS mean,
           CASE WHEN n < 2 THEN NULL
                ELSE round(m2 * n / (n - 1.0), 6) + 0 END AS var_samp,
           CASE WHEN n = 0 OR m2 <= 0 THEN NULL
                ELSE round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 6)
                     + 0 END AS skew,
           CASE WHEN n = 0 OR m2 <= 0 THEN NULL
                ELSE round(m4 / (m2 * m2) - 3.0, 6) + 0 END AS kurt,
           TRUE AS ok_var, TRUE AS ok_skew, TRUE AS ok_kurt
    FROM m
    """,
)
def agg_native_moments(spark, sf):
    """Spark's NATIVE moment aggregates (var_samp / skewness /
    kurtosis — single-pass streaming central-moment updates whose
    float accumulation order is engine- and partitioning-specific,
    so they can never be hashed directly) CERTIFIED against the
    exact power-sum assembly: four exact BIGINT sums S1..S4 over
    dollar-floored values feed the closed-form central moments in
    one identically-ordered double chain (the hashable answer, twin
    says the same), and three ride-along booleans attest
    |native - exact| <= 1e-6 — a regression in either Spark's
    Welford-style merge or the closed-form algebra flips a
    certificate and fails the gate (the agg_lincount gating
    discipline applied to the engine's own exact aggregates).
    Spark's skewness/kurtosis are the POPULATION forms (g1 =
    m3/m2^1.5, excess g2 = m4/m2^2 - 3); var_samp is the n-1 sample
    form — the certificate documents the exact contract. Dollars
    floor keeps S4 ~ x^4 in BIGINT headroom to ~sf1 (x <= ~500).
    Empty/degenerate inputs NULL the moments and leave certificates
    vacuously TRUE."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.expr(
                "CAST(round(value * 100) AS BIGINT) div 100"
            ).alias("x")
        )
    )
    s = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x"))
        .cast("long")
        .alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x"))
        .cast("long")
        .alias("s4"),
        F.var_samp(F.col("x").cast("double")).alias("nv"),
        F.skewness(F.col("x").cast("double")).alias("nsk"),
        F.kurtosis(F.col("x").cast("double")).alias("nku"),
    )
    nD = F.col("n").cast("double")
    s1D = F.col("s1").cast("double")
    m2 = (nD * F.col("s2") - s1D * F.col("s1")) / (nD * F.col("n"))
    m3 = (
        nD * F.col("n") * F.col("s3")
        - F.lit(3.0) * F.col("n") * s1D * F.col("s2")
        + F.lit(2.0) * s1D * F.col("s1") * F.col("s1")
    ) / (nD * F.col("n") * F.col("n"))
    m4 = (
        nD * F.col("n") * F.col("n") * F.col("s4")
        - F.lit(4.0) * nD * F.col("n") * F.col("s1") * F.col("s3")
        + F.lit(6.0) * nD * F.col("s1") * F.col("s1") * F.col("s2")
        - F.lit(3.0) * s1D * F.col("s1") * F.col("s1") * F.col("s1")
    ) / (nD * F.col("n") * F.col("n") * F.col("n"))
    var_s = F.when(F.col("n") < 2, F.lit(None).cast("double")).otherwise(
        m2 * F.col("n") / (F.col("n") - F.lit(1.0))
    )
    skew = F.when(
        (F.col("n") == 0) | (m2 <= 0), F.lit(None).cast("double")
    ).otherwise(m3 / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2)))
    kurt = F.when(
        (F.col("n") == 0) | (m2 <= 0), F.lit(None).cast("double")
    ).otherwise(m4 / (m2 * m2) - F.lit(3.0))

    def cert(native, exact):
        return F.when(
            native.isNull() | exact.isNull(), F.lit(True)
        ).otherwise(F.abs(native - exact) <= 1e-6)

    return s.select(
        "n",
        "s1",
        F.when(F.col("n") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(s1D / F.col("n"), 6) + F.lit(0.0))
        .alias("mean"),
        (F.round(var_s, 6) + F.lit(0.0)).alias("var_samp"),
        (F.round(skew, 6) + F.lit(0.0)).alias("skew"),
        (F.round(kurt, 6) + F.lit(0.0)).alias("kurt"),
        cert(F.col("nv"), var_s).alias("ok_var"),
        cert(F.col("nsk"), skew).alias("ok_skew"),
        cert(F.col("nku"), kurt).alias("ok_kurt"),
    )


# ---------------------------------------------------------------------------
# Mahalanobis outliers — 2-D covariance-aware distance, top-20
# ---------------------------------------------------------------------------
@q(
    "stat_mahalanobis",
    """
    WITH v AS (
      SELECT event_id,
             CAST(round(value * 100) AS BIGINT) // 100 AS x,
             CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS BIGINT)
               AS y
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM v),
    c AS (
      SELECT n, sx, sy,
             n * sxx - sx * sx AS cxx,
             n * syy - sy * sy AS cyy,
             n * sxy - sx * sy AS cxy
      FROM s),
    d AS (
      SELECT v.event_id,
             CAST(round(1000000.0 *
               ((CAST(n * v.x - sx AS DOUBLE) * (n * v.x - sx) * cyy
                 - 2.0 * CAST(n * v.x - sx AS DOUBLE) * (n * v.y - sy)
                   * cxy
                 + CAST(n * v.y - sy AS DOUBLE) * (n * v.y - sy) * cxx)
                / (CAST(cxx AS DOUBLE) * cyy
                   - CAST(cxy AS DOUBLE) * cxy)))
               AS BIGINT) AS d2_us
      FROM v CROSS JOIN c
      WHERE n >= 3
        AND CAST(cxx AS DOUBLE) * cyy - CAST(cxy AS DOUBLE) * cxy > 0)
    SELECT event_id, d2_us, round(d2_us / 1000000.0, 6) + 0 AS d2
    FROM d ORDER BY d2_us DESC, event_id LIMIT 20
    """,
)
def stat_mahalanobis(spark, sf):
    """Mahalanobis outliers over (value, hour-of-day) — the
    covariance-AWARE anomaly score events_outliers' per-column z
    cannot give: a $300 purchase is normal at noon and anomalous at
    4am only if value and hour CORRELATE, and d^2 = e' adj(C') e /
    det(C') prices exactly that. Cross-multiplied algebra keeps the
    per-point deviations exact (e_x = n*x - Sx, the stat_anova
    discipline) and the five moment sums exact BIGINTs; the
    quadratic form itself runs in DOUBLE in ONE identical operation
    order (its integer version tops 1e23 — the stat_cvm overflow
    lesson) and micros-quantizes per point, so the top-20 ranking
    compares exact integers with a deterministic event_id tiebreak.
    The 1-row moment relation broadcasts onto the corpus
    (events_outliers' broadcast-stats shape; the cross join IS the
    1-row attach). Degenerate covariance (det <= 0: constant column
    or perfect correlation) yields no rows rather than NaNs; under
    a true 2-D normal d^2 ~ chi^2_2, so the top-20 doubling as a
    'scores > 13.8 are p < .001' readout is the production use."""
    v = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_id",
            F.expr("CAST(round(value * 100) AS BIGINT) div 100").alias(
                "x"
            ),
            F.hour(F.col("ts").cast("timestamp"))
            .cast("long")
            .alias("y"),
        )
    )
    s = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    c = s.select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "cxx"
        ),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias(
            "cyy"
        ),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "cxy"
        ),
    )
    ex = (F.col("n") * F.col("x") - F.col("sx")).cast("double")
    exl = F.col("n") * F.col("x") - F.col("sx")
    ey = (F.col("n") * F.col("y") - F.col("sy")).cast("double")
    eyl = F.col("n") * F.col("y") - F.col("sy")
    det = F.col("cxx").cast("double") * F.col("cyy") - F.col(
        "cxy"
    ).cast("double") * F.col("cxy")
    d2_us = F.round(
        F.lit(1000000.0)
        * (
            (ex * exl * F.col("cyy")
             - F.lit(2.0) * ex * eyl * F.col("cxy")
             + ey * eyl * F.col("cxx"))
            / det
        )
    ).cast("long")
    d = (
        v.crossJoin(c)
        .filter((F.col("n") >= 3) & (det > 0))
        .select("event_id", d2_us.alias("d2_us"))
    )
    return (
        d.orderBy(F.desc("d2_us"), "event_id")
        .limit(20)
        .select(
            "event_id",
            "d2_us",
            (F.round(F.col("d2_us") / F.lit(1000000.0), 6) + F.lit(0.0))
            .alias("d2"),
        )
    )


# ---------------------------------------------------------------------------
# empirical-Bayes rate shrinkage — Beta prior by method of moments
# ---------------------------------------------------------------------------
@q(
    "stat_eb_shrinkage",
    """
    WITH g AS (
      SELECT user_id % 20 AS seg,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1),
    mm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(x AS DOUBLE) / n) / COUNT(*) AS mu,
             SUM((CAST(x AS DOUBLE) / n) * (CAST(x AS DOUBLE) / n))
               / COUNT(*) AS m2
      FROM g),
    pr AS (
      SELECT k, mu, m2 - mu * mu AS v,
             CASE WHEN m2 - mu * mu <= 0
                       OR mu * (1.0 - mu) <= m2 - mu * mu THEN NULL
                  ELSE mu * (mu * (1.0 - mu) / (m2 - mu * mu) - 1.0)
             END AS alpha,
             CASE WHEN m2 - mu * mu <= 0
                       OR mu * (1.0 - mu) <= m2 - mu * mu THEN NULL
                  ELSE (1.0 - mu)
                       * (mu * (1.0 - mu) / (m2 - mu * mu) - 1.0)
             END AS beta
      FROM mm)
    SELECT CAST(g.seg AS BIGINT) AS seg, g.n, g.x,
           round(CAST(g.x AS DOUBLE) / g.n, 6) + 0 AS raw_rate,
           round(pr.alpha, 6) + 0 AS alpha,
           round(pr.beta, 6) + 0 AS beta,
           CASE WHEN pr.alpha IS NULL THEN NULL
                ELSE round((g.x + pr.alpha)
                           / (g.n + pr.alpha + pr.beta), 6) + 0
           END AS shrunk_rate
    FROM g CROSS JOIN pr
    """,
)
def stat_eb_shrinkage(spark, sf):
    """Empirical-Bayes shrinkage of per-segment purchase rates — the
    CTR-smoothing workhorse (Robbins via the Beta-Binomial): fit a
    Beta(alpha, beta) prior to the OBSERVED segment rates by method
    of moments (alpha+beta = mu(1-mu)/var - 1), then shrink each
    segment toward the prior mean with strength ~ prior sample size:
    shrunk = (x + alpha)/(n + alpha + beta). Small segments move a
    lot, big segments barely — exactly the estimator a
    feat_target_encode consumer should use instead of raw rates
    (LOO handles leakage; EB handles VARIANCE). The moment fit runs
    over the tiny segment relation (k rows), each rate a double from
    exact BIGINT counts in identical order; the prior attaches to
    every segment via the 1-row cross join (broadcast-stats shape)
    and round-6 closes the parity. Degenerate fits (zero variance,
    or observed variance >= Bernoulli bound, where MoM gives a
    nonsensical negative prior) NULL the shrinkage and keep the raw
    rates — report honesty over fabricated smoothing. One corpus
    scan; everything after is k-sized — the segment relation feeds
    TWO consumers (the prior fit and the attach), so it is
    parquet-checkpointed: the uncheckpointed form re-scanned the
    corpus per branch (audit #81 caught it live)."""
    from ..operators.dedup import parquet_checkpoint

    g = parquet_checkpoint(
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy((F.col("user_id") % 20).alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("x"),
        ),
        "eb_seg",
    )
    rate = F.col("x").cast("double") / F.col("n")
    mm = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        (F.sum(rate) / F.count(F.lit(1))).alias("mu"),
        (F.sum(rate * rate) / F.count(F.lit(1))).alias("m2"),
    )
    v = F.col("m2") - F.col("mu") * F.col("mu")
    bad = (v <= 0) | (F.col("mu") * (F.lit(1.0) - F.col("mu")) <= v)
    scale = (
        F.col("mu") * (F.lit(1.0) - F.col("mu")) / v - F.lit(1.0)
    )
    pr = mm.select(
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.col("mu") * scale)
        .alias("alpha"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise((F.lit(1.0) - F.col("mu")) * scale)
        .alias("beta"),
    )
    out = g.crossJoin(pr)
    return out.select(
        F.col("seg").cast("long").alias("seg"),
        "n",
        "x",
        (F.round(F.col("x").cast("double") / F.col("n"), 6) + F.lit(0.0))
        .alias("raw_rate"),
        (F.round(F.col("alpha"), 6) + F.lit(0.0)).alias("alpha"),
        (F.round(F.col("beta"), 6) + F.lit(0.0)).alias("beta"),
        F.when(F.col("alpha").isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("x") + F.col("alpha"))
                / (F.col("n") + F.col("alpha") + F.col("beta")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("shrunk_rate"),
    )


# ---------------------------------------------------------------------------
# G-test (log-likelihood ratio) — the information-theoretic chi-square
# ---------------------------------------------------------------------------
@q(
    "stat_gtest",
    """
    WITH lab AS (
      SELECT lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ina
      FROM documents),
    ct AS (
      SELECT lang, CAST(SUM(ina) AS BIGINT) AS n_a,
             CAST(SUM(1 - ina) AS BIGINT) AS n_b
      FROM lab GROUP BY lang),
    tot AS (
      SELECT lang, n_a, n_b,
             SUM(n_a) OVER () AS ta, SUM(n_b) OVER () AS tb
      FROM ct),
    terms AS (
      SELECT lang, n_a, n_b,
             CAST(round(1000000.0 * 2.0 *
               (CASE WHEN n_a = 0 THEN 0.0
                     ELSE n_a * ln(CAST(n_a AS DOUBLE)
                          / (CAST(n_a + n_b AS DOUBLE) * ta
                             / (ta + tb))) END
                + CASE WHEN n_b = 0 THEN 0.0
                       ELSE n_b * ln(CAST(n_b AS DOUBLE)
                            / (CAST(n_a + n_b AS DOUBLE) * tb
                               / (ta + tb))) END))
               AS BIGINT) AS g_us
      FROM tot)
    SELECT lang, n_a, n_b,
           CAST(g_us AS BIGINT) AS g_term_us,
           round(SUM(g_us) OVER () / 1000000.0, 6) + 0 AS g_total
    FROM terms
    """,
)
def stat_gtest(spark, sf):
    """G-test of homogeneity (the log-likelihood-ratio chi-square,
    G = 2 sum O ln(O/E)) over the language distribution of the two
    md5 halves — drift_chi2's information-theoretic twin, and the
    one to prefer when any cell is small or the statistic will be
    ADDED across strata (G is exactly additive over partitions of
    the table; Pearson's X^2 is not — the property that matters when
    a 100-TB drift monitor sums per-shard statistics into a global
    one). Same shape as mix_kl_target: per-cell terms micros-
    quantized in identical operation order (expected counts written
    as the same division chain on both engines), total as a
    frameless window over the |langs| relation; empty cells
    contribute 0 by the 0*ln(0) convention. In fact G = 2N * MI in
    nats — this face and stat_mutual_info agree up to that constant,
    a cross-check the test pins."""
    lab = t(spark, sf, "documents").select(
        "lang",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            < "8",
            1,
        )
        .otherwise(0)
        .alias("ina"),
    )
    ct = lab.groupBy("lang").agg(
        F.sum("ina").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("ina")).cast("long").alias("n_b"),
    )
    wall = Window.partitionBy()
    tot = ct.select(
        "lang",
        "n_a",
        "n_b",
        F.sum("n_a").over(wall).alias("ta"),
        F.sum("n_b").over(wall).alias("tb"),
    )
    ea = (
        (F.col("n_a") + F.col("n_b")).cast("double")
        * F.col("ta")
        / (F.col("ta") + F.col("tb"))
    )
    eb = (
        (F.col("n_a") + F.col("n_b")).cast("double")
        * F.col("tb")
        / (F.col("ta") + F.col("tb"))
    )
    g_us = F.round(
        F.lit(1000000.0)
        * F.lit(2.0)
        * (
            F.when(F.col("n_a") == 0, F.lit(0.0)).otherwise(
                F.col("n_a")
                * F.log(F.col("n_a").cast("double") / ea)
            )
            + F.when(F.col("n_b") == 0, F.lit(0.0)).otherwise(
                F.col("n_b")
                * F.log(F.col("n_b").cast("double") / eb)
            )
        )
    ).cast("long")
    terms = tot.select("lang", "n_a", "n_b", g_us.alias("g_us"))
    return terms.select(
        "lang",
        "n_a",
        "n_b",
        F.col("g_us").cast("long").alias("g_term_us"),
        (
            F.round(F.sum("g_us").over(wall) / F.lit(1000000.0), 6)
            + F.lit(0.0)
        ).alias("g_total"),
    )


# ---------------------------------------------------------------------------
# DataFrameStatFunctions — crosstab exact, freqItems superset certificate
# ---------------------------------------------------------------------------
@q(
    "stat_api_crosstab",
    """
    WITH e AS (
      SELECT event_type,
             CAST(user_id % 3 AS VARCHAR) AS seg
      FROM events WHERE user_id IS NOT NULL)
    SELECT event_type, seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS freq_superset_ok
    FROM e GROUP BY event_type, seg
    """,
)
def stat_api_crosstab(spark, sf):
    """``DataFrame.stat`` — the fourth public query surface
    (DataFrame API / SQL / pyspark.pandas / df.stat): ``crosstab``
    builds the contingency table in one pass (exact — the twin is
    the plain two-key GROUP BY after the face UNPIVOTs the wide
    crosstab back to long form, proving the reshape is lossless),
    and ``freqItems`` rides along as a CERTIFICATE: the
    Karp-Papadimitriou-Shenker sketch guarantees a SUPERSET of the
    truly-frequent items (possible false positives, never false
    negatives), and since the returned set varies with partition
    order only the guaranteed direction is hashable — every
    event_type with frequency >= the 0.15 support must appear in
    the sketch's answer (array_except of exact-frequent minus
    sketch == empty). The agg_lincount one-sided-gating discipline
    applied to an API whose output LOOKS like a plain list but is
    contractually a superset — the trap this face documents."""
    e = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .withColumn("seg", (F.col("user_id") % 3).cast("string"))
    )
    ct = e.stat.crosstab("event_type", "seg")
    seg_cols = sorted(c for c in ct.columns if c != "event_type_seg")
    if not seg_cols:
        # empty corpus: the crosstab has no value columns and
        # stack(0) is a PARSE error — return the empty long form
        return spark.createDataFrame(
            [],
            "event_type string, seg string, n long, "
            "freq_superset_ok boolean",
        )
    long = ct.select(
        F.col("event_type_seg").alias("event_type"),
        F.expr(
            "stack({n}, {args}) AS (seg, n)".format(
                n=len(seg_cols),
                args=", ".join(f"'{c}', `{c}`" for c in seg_cols),
            )
        ),
    ).filter(F.col("n") > 0)
    fi = [
        r
        for r in e.stat.freqItems(["event_type"], 0.15).collect()[0][0]
    ]
    n_total = e.count()
    exact_frequent = [
        r["event_type"]
        for r in e.groupBy("event_type")
        .count()
        .filter(F.col("count") >= 0.15 * n_total)
        .collect()
    ]
    superset_ok = set(exact_frequent) <= set(fi)
    return long.select(
        "event_type",
        "seg",
        F.col("n").cast("long").alias("n"),
        F.lit(bool(superset_ok)).alias("freq_superset_ok"),
    )


# ---------------------------------------------------------------------------
# wave 99: exact F1 threshold sweep — the operating-point selector
# ---------------------------------------------------------------------------
@q(
    "ml_f1_sweep",
    """
    WITH """ + _SCORE_SQL + """,
    sw AS (
      SELECT cents AS thr_cents,
             pprev + p AS tp,
             (cprev + cnt) - (pprev + p) AS fp,
             pos_tot - (pprev + p) AS fn,
             CAST((2000000 * (pprev + p))
                  // ((cprev + cnt) + pos_tot) AS BIGINT) AS f1_micros
      FROM rk)
    SELECT thr_cents, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, f1_micros,
           f1_micros = MAX(f1_micros) OVER () AS is_best
    FROM sw
    """,
)
def ml_f1_sweep(spark, sf):
    """Exact F1 operating-point sweep: one row per DISTINCT score
    threshold (predict positive iff score >= thr) with its exact
    TP/FP/FN and F1, plus an is_best flag at the argmax — the curve a
    quality-classifier gate reads to pick its production cutoff,
    where ml_auc summarizes threshold-free and ml_pr_curve stops at
    P/R. The algebra stays in BIGINT end-to-end: with inclusive
    top-down cumulatives TP and PP (predicted positives), the F1
    denominator 2TP+FP+FN collapses to PP + pos_tot, so f1_micros =
    (2e6*TP) div (PP + pos_tot) is exact integer floor-division
    (text_rake's micros discipline) — no float enters, so the argmax
    flag is an exact integer comparison, never an epsilon. Scale
    shape: ONE corpus scan to the bounded per-distinct-score support
    (shared _score_support, audit #44 family), windows over the
    support only; denominator >= cnt >= 1 on every support row so the
    div never sees zero; empty corpus -> empty curve (vacuously
    total)."""
    pv = _score_support(spark, sf)
    wi = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    sw = pv.select(
        F.col("cents").alias("thr_cents"),
        F.sum("p").over(wi).cast("long").alias("tp"),
        (F.sum("cnt").over(wi) - F.sum("p").over(wi))
        .cast("long")
        .alias("fp"),
        (F.sum("p").over(wall) - F.sum("p").over(wi))
        .cast("long")
        .alias("fn"),
        (F.sum("cnt").over(wi) + F.sum("p").over(wall))
        .cast("long")
        .alias("den"),
    ).select(
        "thr_cents",
        "tp",
        "fp",
        "fn",
        F.expr("(2000000 * tp) div den").cast("long").alias("f1_micros"),
    )
    return sw.select(
        "thr_cents",
        "tp",
        "fp",
        "fn",
        "f1_micros",
        (
            F.col("f1_micros")
            == F.max("f1_micros").over(Window.partitionBy())
        ).alias("is_best"),
    )


# ---------------------------------------------------------------------------
# wave 100: pyspark.ml feature pipeline — the MLlib API surface
# compiled down to the same Catalyst answers
# ---------------------------------------------------------------------------
@q(
    "mllib_feature_pipeline",
    """
    WITH freq AS (
      SELECT o_orderpriority AS lab, COUNT(*) AS c
      FROM orders GROUP BY 1),
    idx AS (
      SELECT lab,
             ROW_NUMBER() OVER (ORDER BY c DESC, lab ASC) - 1 AS pi
      FROM freq)
    SELECT o.o_orderkey,
           CAST(i.pi AS BIGINT) AS prio_idx,
           CAST(CASE WHEN o.o_totalprice < 50000.0 THEN 0
                     WHEN o.o_totalprice < 150000.0 THEN 1
                     ELSE 2 END AS BIGINT) AS bucket
    FROM orders o JOIN idx i ON o.o_orderpriority = i.lab
    """,
)
def mllib_feature_pipeline(spark, sf):
    """The fifth public query surface — ``pyspark.ml`` — driven
    through a fitted feature Pipeline (StringIndexer +
    Bucketizer) and gated by the same DuckDB oracle as everything
    else, because both transformers are DETERMINISTIC relational
    operators wearing estimator clothing: StringIndexer's
    frequencyDesc ordering is contractually tie-broken by label
    ascending (the twin is ROW_NUMBER over (count DESC, label ASC)
    minus one), and Bucketizer is a right-open CASE ladder over the
    splits. fit() runs one distributed countByValue job and bakes
    the labels into the transformer as LITERALS — exactly the
    collected-literals pattern the sketch faces use — so transform()
    is map-only (a broadcast-free lookup against a 5-entry map
    inside codegen, no join at 100 TB). The face pins that routing
    a query through the MLlib API costs nothing semantically; the
    supported path for actual model TRAINING at scale remains
    pyspark.ml on top of these same DataFrames."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import Bucketizer, StringIndexer

    d = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    pipe = Pipeline(
        stages=[
            StringIndexer(
                inputCol="o_orderpriority",
                outputCol="prio_idx_d",
                stringOrderType="frequencyDesc",
            ),
            Bucketizer(
                splits=[0.0, 50000.0, 150000.0, float("inf")],
                inputCol="o_totalprice",
                outputCol="bucket_d",
            ),
        ]
    )
    out = pipe.fit(d).transform(d)
    return out.select(
        "o_orderkey",
        F.col("prio_idx_d").cast("long").alias("prio_idx"),
        F.col("bucket_d").cast("long").alias("bucket"),
    )


# ---------------------------------------------------------------------------
# wave 103: Page's trend test — Friedman machinery + linear weights
# ---------------------------------------------------------------------------
@q(
    "stat_page_trend",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             event_type,
             SUM(CAST(round(value * 100) AS BIGINT)) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
           FROM daily),
    tj AS (
      SELECT event_type,
             CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS j
      FROM (SELECT DISTINCT event_type FROM daily)),
    fb AS (
      SELECT day_num FROM daily GROUP BY day_num
      HAVING COUNT(*) = (SELECT k FROM kk)),
    r AS (
      SELECT d.event_type, d.day_num,
             2 * RANK() OVER (PARTITION BY d.day_num ORDER BY d.v)
               + COUNT(*) OVER (PARTITION BY d.day_num, d.v) - 1 AS dr
      FROM daily d JOIN fb USING (day_num)),
    tr AS (
      SELECT r.event_type, CAST(SUM(r.dr) AS BIGINT) AS rd
      FROM r GROUP BY r.event_type),
    fin AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fb) AS n,
             (SELECT k FROM kk) AS k,
             (SELECT CAST(COALESCE(SUM(tj.j * tr.rd), 0) AS BIGINT)
              FROM tr JOIN tj USING (event_type)) AS l2
      FROM kk)
    SELECT n AS n_blocks, k AS n_treatments, l2 AS l_doubled,
           CASE WHEN n = 0 OR k < 2 THEN NULL
                ELSE round((CAST(l2 AS DOUBLE)
                            - n * k * (k + 1) * (k + 1) / 2.0)
                           / sqrt(n * CAST(k AS DOUBLE) * k * (k + 1)
                                  * (k * k - 1) / 36.0), 6) + 0
           END AS z
    FROM fin
    """,
)
def stat_page_trend(spark, sf):
    """Page's trend test (ordered alternatives) on the
    daily-revenue-by-type panel — stat_friedman's machinery with
    LINEAR treatment weights: where Friedman asks "do treatments
    differ at all", Page asks "do they increase along a hypothesized
    ORDER" (here the deterministic alphabetical event-type order —
    the ordering is a modelling input, the docstring's point), which
    has far more power against monotone drift. L = SUM_j j * R_j
    arrives exactly as l_doubled = SUM j * rd_j over the
    doubled tie-averaged rank sums (the mannwhitney/friedman
    integers — order-independent BIGINT end to end), and the normal
    approximation z uses the closed-form doubled moments E[2L] =
    nk(k+1)^2/2, Var[2L] = nk^2(k+1)(k^2-1)/36 in ONE identical
    float expression both engines round once (standard Page ignores
    tie corrections — documented). Complete blocks only, exactly as
    Friedman; n = 0 or k < 2 NULL-guards. Scale shape identical to
    stat_friedman: one corpus agg to calendar x types cells,
    everything downstream calendar-bounded."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day_num"),
            "event_type",
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc")
        )
        .select("day_num", "event_type", F.expr("vc div 100").alias("v"))
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "page_daily")
    kk = daily.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    tj = (
        daily.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.row_number()
            .over(Window.orderBy("event_type"))
            .cast("long")
            .alias("j"),
        )
    )
    fb = (
        daily.groupBy("day_num")
        .agg(F.count(F.lit(1)).alias("ntypes"))
        .crossJoin(kk)
        .filter(F.col("ntypes") == F.col("k"))
        .select("day_num")
    )
    wrank = Window.partitionBy("day_num").orderBy("v")
    wtie = Window.partitionBy("day_num", "v")
    r = daily.join(fb, "day_num").select(
        "event_type",
        (
            2 * F.rank().over(wrank)
            + F.count(F.lit(1)).over(wtie)
            - 1
        ).alias("dr"),
    )
    tr = r.groupBy("event_type").agg(
        F.sum("dr").cast("long").alias("rd")
    )
    l2 = (
        tr.join(tj, "event_type")
        .agg(
            F.coalesce(F.sum(F.col("j") * F.col("rd")), F.lit(0))
            .cast("long")
            .alias("l2")
        )
    )
    nb = fb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    fin = nb.crossJoin(kk).crossJoin(l2)
    bad = (F.col("n") == 0) | (F.col("k") < 2)
    kd = F.col("k").cast("double")
    mean2 = (
        F.col("n") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1)
        / F.lit(2.0)
    )
    var2 = (
        F.col("n")
        * kd
        * F.col("k")
        * (F.col("k") + 1)
        * (F.col("k") * F.col("k") - 1)
        / F.lit(36.0)
    )
    return fin.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        F.col("l2").alias("l_doubled"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("l2").cast("double") - mean2) / F.sqrt(var2), 6
            )
            + F.lit(0.0)
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# wave 109: Krippendorff's alpha — label reliability with variable
# raters per unit, exact coincidence algebra
# ---------------------------------------------------------------------------
@q(
    "ml_krippendorff",
    """
    WITH r AS (
      SELECT user_id AS u,
             CAST(round(value * 100) AS BIGINT) // 2000 AS v
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    uv AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n
      FROM r GROUP BY u, v),
    um AS (
      SELECT u, CAST(SUM(n) AS BIGINT) AS m,
             CAST(SUM(n * n) AS BIGINT) AS sn2
      FROM uv GROUP BY u),
    keep AS (SELECT u, m, sn2 FROM um WHERE m >= 2),
    douter AS (
      SELECT CAST(COALESCE(SUM(CAST(round(1000000.0 *
               CAST(m * m - sn2 AS DOUBLE) / (m - 1)) AS BIGINT)), 0)
               AS BIGINT) AS do_mic,
             CAST(COALESCE(SUM(m), 0) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS n_units
      FROM keep),
    vt AS (
      SELECT CAST(COALESCE(SUM(nv * nv), 0) AS BIGINT) AS sv2
      FROM (SELECT CAST(SUM(uv.n) AS BIGINT) AS nv
            FROM uv JOIN keep ON keep.u = uv.u
            GROUP BY uv.v) z)
    SELECT d.n_units, d.nn AS n_ratings, d.do_mic,
           d.nn * d.nn - vt.sv2 AS de_num,
           CASE WHEN d.nn < 2 OR d.nn * d.nn - vt.sv2 = 0 THEN NULL
                ELSE round(1.0 - (d.nn - 1)
                           * (CAST(d.do_mic AS DOUBLE) / 1000000.0)
                           / (d.nn * d.nn - vt.sv2), 6) + 0
           END AS alpha
    FROM douter d CROSS JOIN vt
    """,
)
def ml_krippendorff(spark, sf):
    """Krippendorff's alpha (nominal) — THE reliability coefficient
    for label pipelines with VARIABLE raters per unit and missing
    ratings, where ml_cohen_kappa demands exactly two fixed raters
    and stat_cronbach demands numeric items: units are users, each
    event is one nominal 'rating' (a coarse value bucket), and alpha
    = 1 - D_o/D_e over coincidence counts. The algebra stays exact:
    per-unit observed-disagreement numerators m^2 - SUM n_v^2 are
    BIGINTs, the single fractional step /(m-1) quantizes to micros
    PER UNIT in identical op order (the stat_circular discipline —
    order-independent integer sum across units), the expected-
    disagreement numerator N^2 - SUM n_v^2 is a BIGINT over pooled
    value totals (computed over KEPT units only — single-rating
    units are excluded from BOTH sides, the standard treatment), and
    alpha is one final float rounded to 6. Scale shape: corpus ->
    (unit x value) cells in one agg, everything downstream is
    cell-bounded; no unit-pair or rater-pair join ever forms (the
    naive pairwise-agreement spelling is quadratic in raters).
    All-agreeing-or-degenerate corpora (de_num = 0) NULL-guard."""
    r = (
        t(spark, sf, "events")
        .filter(
            F.col("user_id").isNotNull() & F.col("value").isNotNull()
        )
        .select(
            F.col("user_id").alias("u"),
            F.expr(
                "CAST(round(value * 100) AS BIGINT) div 2000"
            ).alias("v"),
        )
    )
    from ..operators.dedup import parquet_checkpoint

    uv = parquet_checkpoint(
        r.groupBy("u", "v").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ),
        "kripp_uv",
    )
    um = uv.groupBy("u").agg(
        F.sum("n").cast("long").alias("m"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sn2"),
    )
    keep = parquet_checkpoint(
        um.filter(F.col("m") >= 2), "kripp_keep"
    )
    unit_mic = F.round(
        F.lit(1000000.0)
        * (F.col("m") * F.col("m") - F.col("sn2")).cast("double")
        / (F.col("m") - 1)
    ).cast("long")
    douter = keep.agg(
        F.coalesce(F.sum(unit_mic), F.lit(0))
        .cast("long")
        .alias("do_mic"),
        F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("n_units"),
    )
    vt = (
        uv.join(keep.select("u"), "u")
        .groupBy("v")
        .agg(F.sum("n").cast("long").alias("nv"))
        .agg(
            F.coalesce(F.sum(F.col("nv") * F.col("nv")), F.lit(0))
            .cast("long")
            .alias("sv2")
        )
    )
    fin = douter.crossJoin(vt)
    de = F.col("nn") * F.col("nn") - F.col("sv2")
    bad = (F.col("nn") < 2) | (de == 0)
    return fin.select(
        "n_units",
        F.col("nn").alias("n_ratings"),
        "do_mic",
        de.cast("long").alias("de_num"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(1.0)
                - (F.col("nn") - 1)
                * (F.col("do_mic").cast("double") / F.lit(1000000.0))
                / de,
                6,
            )
            + F.lit(0.0)
        )
        .alias("alpha"),
    )


# ---------------------------------------------------------------------------
# wave 113: regression metrics — MAE / RMSE / R^2 / pinball(0.9)
# against the per-stratum group-mean model, per-row micros terms
# ---------------------------------------------------------------------------
@q(
    "ml_regression_metrics",
    """
    WITH lab AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             o_orderpriority AS g
      FROM orders),
    e AS (
      SELECT CAST(round((COUNT(*) OVER (PARTITION BY g) * c
                         - SUM(c) OVER (PARTITION BY g))
                        * 1.0 / COUNT(*) OVER (PARTITION BY g))
                  AS BIGINT) AS ec,
             CAST(round((COUNT(*) OVER () * c - SUM(c) OVER ())
                        * 1.0 / COUNT(*) OVER ())
                  AS BIGINT) AS tc,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM lab),
    terms AS (
      SELECT n,
             CAST(abs(ec) AS BIGINT) AS mae_c,
             CAST(round(1000000.0 * ec * ec / (10000.0 * n))
                  AS BIGINT) AS sse_t,
             CAST(round(1000000.0 * tc * tc / (10000.0 * n))
                  AS BIGINT) AS sst_t,
             CAST(round(1000000.0
                        * (0.9 * GREATEST(ec / 100.0, 0)
                           + 0.1 * GREATEST(-ec / 100.0, 0)))
                  AS BIGINT) AS pin_t
      FROM e)
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           round(CAST(SUM(mae_c) AS DOUBLE) / 100.0 / MAX(n), 6) + 0
             AS mae,
           round(sqrt(SUM(sse_t) / 1000000.0), 6) + 0 AS rmse,
           CASE WHEN SUM(sst_t) = 0 THEN NULL
                ELSE round(1.0 - CAST(SUM(sse_t) AS DOUBLE)
                           / SUM(sst_t), 6) + 0
           END AS r2,
           round(CAST(SUM(pin_t) AS DOUBLE) / 1000000.0 / MAX(n), 6)
             + 0 AS pinball90
    FROM terms
    """,
)
def ml_regression_metrics(spark, sf):
    """The regression-evaluation block the otherwise classification/
    ranking-only ml_* family lacks: MAE, RMSE, R^2, and the pinball
    (quantile) loss at tau = 0.9 — the quantile-forecast score an
    over-provisioning SLA model is graded on (pinball is THE proper
    scoring rule for quantile regression; RMSE alone rewards median
    forecasts). The 'model' is the deterministic per-priority
    group-mean predictor computed IN the same scan via windows (no
    join, no second pass — mean_g = SUM over g / COUNT over g), so
    residuals are rationals with denominator n_g: each rounds to
    exact cents in identical op order on both engines, |e| sums are
    exact BIGINTs, and the square/pinball contributions are per-row
    micros-quantized with the row count folded into the term (the
    ml_brier denominator discipline) so RMSE/R^2/pinball are single
    final floats over exact integer sums. R^2 compares against the
    global-mean baseline (SST from the same machinery); zero-variance
    corpus NULLs it. Scale shape: one scan, two window specs (one
    partitioned by stratum, one global — production replaces the
    global window with the twice-computed-constant literal trick if
    the corpus is too big for a single reducer)."""
    lab = t(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        F.col("o_orderpriority").alias("g"),
    )
    wg = Window.partitionBy("g")
    wa = Window.partitionBy()
    e = lab.select(
        F.round(
            (
                F.count(F.lit(1)).over(wg) * F.col("c")
                - F.sum("c").over(wg)
            )
            * F.lit(1.0)
            / F.count(F.lit(1)).over(wg)
        )
        .cast("long")
        .alias("ec"),
        F.round(
            (
                F.count(F.lit(1)).over(wa) * F.col("c")
                - F.sum("c").over(wa)
            )
            * F.lit(1.0)
            / F.count(F.lit(1)).over(wa)
        )
        .cast("long")
        .alias("tc"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n"),
    )
    terms = e.select(
        "n",
        F.abs(F.col("ec")).cast("long").alias("mae_c"),
        F.round(
            F.lit(1000000.0)
            * F.col("ec")
            * F.col("ec")
            / (F.lit(10000.0) * F.col("n"))
        )
        .cast("long")
        .alias("sse_t"),
        F.round(
            F.lit(1000000.0)
            * F.col("tc")
            * F.col("tc")
            / (F.lit(10000.0) * F.col("n"))
        )
        .cast("long")
        .alias("sst_t"),
        F.round(
            F.lit(1000000.0)
            * (
                F.lit(0.9)
                * F.greatest(F.col("ec") / F.lit(100.0), F.lit(0.0))
                + F.lit(0.1)
                * F.greatest(-F.col("ec") / F.lit(100.0), F.lit(0.0))
            )
        )
        .cast("long")
        .alias("pin_t"),
    )
    return terms.agg(
        F.max("n").cast("long").alias("n_rows"),
        (
            F.round(
                F.sum("mae_c").cast("double")
                / F.lit(100.0)
                / F.max("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("mae"),
        (
            F.round(F.sqrt(F.sum("sse_t") / F.lit(1000000.0)), 6)
            + F.lit(0.0)
        ).alias("rmse"),
        F.when(F.sum("sst_t") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(1.0)
                - F.sum("sse_t").cast("double") / F.sum("sst_t"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("r2"),
        (
            F.round(
                F.sum("pin_t").cast("double")
                / F.lit(1000000.0)
                / F.max("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("pinball90"),
    )


# ---------------------------------------------------------------------------
# wave 115: pyspark.ml StandardScaler — fitted moments as literals,
# map-only transform, micros-certified aggregate
# ---------------------------------------------------------------------------
@q(
    "mllib_scaler",
    """
    WITH m AS (
      SELECT AVG(value) AS mu, stddev_samp(value) AS sd
      FROM events WHERE value IS NOT NULL),
    z AS (
      SELECT e.event_type,
             CAST(round(1000000.0 * (e.value - m.mu) / m.sd)
                  AS BIGINT) AS zmic
      FROM events e CROSS JOIN m
      WHERE e.value IS NOT NULL AND m.sd > 0)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(zmic) AS BIGINT) AS sum_zmic
    FROM z GROUP BY event_type
    """,
)
def mllib_scaler(spark, sf):
    """``pyspark.ml`` StandardScaler (withMean + withStd) — the
    second MLlib-surface face after mllib_feature_pipeline, covering
    the ESTIMATOR-with-continuous-state half: fit() runs one
    distributed moments job (Summarizer mean + SAMPLE std — the
    N-1 form, pinned by the twin's stddev_samp) and bakes mu/sigma
    into the transformer, so transform() is a map-only affine op on
    the assembled vector — zero joins, zero shuffles at 100 TB, the
    exact 'fold the fitted constants into codegen' shape
    production feature serving uses. The gate aggregates per-row
    standardized values quantized to micros BIGINTs (per-row
    rounding is partition-order-invariant; a float SUM would not
    be) grouped by event type — pinning vector assembly, the fit
    moments, AND the transform arithmetic against DuckDB computing
    the same standardization relationally. The z's group sums also
    certify the global constraint SUM over all groups ~ 0 (mean
    centering), asserted in tests. Engine-parity note: MLlib's
    treeAggregate accumulates moments in a different order than
    DuckDB's streaming aggregate — parity holds through the micros
    rounding exactly like events_outliers' rounded-z rule."""
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    e = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    if e.limit(1).count() == 0:
        return spark.createDataFrame(
            [], "event_type string, n long, sum_zmic long"
        )
    va = VectorAssembler(inputCols=["value"], outputCol="v")
    sc = StandardScaler(
        inputCol="v", outputCol="z", withMean=True, withStd=True
    )
    model = sc.fit(va.transform(e))
    if model.std[0] <= 0:
        return spark.createDataFrame(
            [], "event_type string, n long, sum_zmic long"
        )
    out = model.transform(va.transform(e)).select(
        "event_type",
        F.round(
            F.lit(1000000.0) * vector_to_array(F.col("z"))[0]
        )
        .cast("long")
        .alias("zmic"),
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("zmic").cast("long").alias("sum_zmic"),
    )


# ---------------------------------------------------------------------------
# wave 123: learning curve — exact AUC at nested md5 data fractions
# ---------------------------------------------------------------------------
@q(
    "ml_learning_curve",
    """
    WITH lab AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
             CASE WHEN substr(md5('lc:' || CAST(event_id AS VARCHAR)),
                              1, 1) < '4' THEN 25
                  WHEN substr(md5('lc:' || CAST(event_id AS VARCHAR)),
                              1, 1) < '8' THEN 50
                  ELSE 100 END AS tier
      FROM events WHERE value IS NOT NULL),
    fr AS (SELECT unnest([25, 50, 100]) AS frac),
    pv AS (
      SELECT fr.frac, lab.cents,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(lab.pos) AS BIGINT) AS p
      FROM lab JOIN fr ON lab.tier <= fr.frac
      GROUP BY fr.frac, lab.cents),
    ark AS (
      SELECT frac, cnt, p,
             2 * SUM(cnt) OVER (PARTITION BY frac ORDER BY cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - cnt + 1 AS rx2
      FROM pv),
    m AS (
      SELECT frac,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(p) AS BIGINT) AS np,
             CAST(SUM(cnt - p) AS BIGINT) AS nn,
             CAST(SUM(p * rx2) AS BIGINT) AS s2
      FROM ark GROUP BY frac)
    SELECT CAST(frac AS BIGINT) AS frac, n, np AS n_pos, nn AS n_neg,
           CASE WHEN np = 0 OR nn = 0 THEN NULL
                ELSE round(CAST(s2 - np * (np + 1) AS DOUBLE)
                           / (2.0 * np * nn), 6) + 0 END AS auc
    FROM m
    """,
)
def ml_learning_curve(spark, sf):
    """Learning curve — the exact ROC AUC of the score signal at
    NESTED 25% / 50% / 100% md5 fractions of the corpus, the
    'does more data still help?' diagnostic that decides whether
    the next 10^12 tokens are worth crawling (a flat curve says
    spend on quality, a rising one says spend on scale). The
    fractions are NESTED by construction (tier thresholds on one
    hash digit: the 25% subset is inside the 50% inside the 100%) —
    independent random subsets would confound sampling noise with
    the scaling signal. Machinery is ml_auc's doubled-rank identity
    verbatim, with the fraction fan-out done relationally (each
    support row joins to the fractions that CONTAIN its tier, a x3
    bounded multiply on the pre-aggregated support, never on the
    corpus) and one window per fraction partition. All rank sums are
    exact BIGINTs; the three AUCs are final floats. Scale shape: one
    corpus scan to the (tier, score) support, bounded fan-out,
    support-sized windows."""
    lab = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("pos"),
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lc:"),
                            F.col("event_id").cast("string"),
                        )
                    ),
                    1,
                    1,
                )
                < "4",
                25,
            )
            .when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lc:"),
                            F.col("event_id").cast("string"),
                        )
                    ),
                    1,
                    1,
                )
                < "8",
                50,
            )
            .otherwise(100)
            .alias("tier"),
        )
    )
    fr = spark.createDataFrame([(25,), (50,), (100,)], "frac int")
    pv = (
        lab.join(fr, lab["tier"] <= fr["frac"])
        .groupBy("frac", "cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("p"),
        )
    )
    w = (
        Window.partitionBy("frac")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ark = pv.select(
        "frac",
        "cnt",
        "p",
        (2 * F.sum("cnt").over(w) - F.col("cnt") + 1).alias("rx2"),
    )
    m = ark.groupBy("frac").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("p").cast("long").alias("np"),
        F.sum(F.col("cnt") - F.col("p")).cast("long").alias("nn"),
        F.sum(F.col("p") * F.col("rx2")).cast("long").alias("s2"),
    )
    return m.select(
        F.col("frac").cast("long").alias("frac"),
        "n",
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.when(
            (F.col("np") == 0) | (F.col("nn") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (F.col("s2") - F.col("np") * (F.col("np") + 1)).cast(
                    "double"
                )
                / (F.lit(2.0) * F.col("np") * F.col("nn")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("auc"),
    )


# ---------------------------------------------------------------------------
# wave 144: weighted Cohen's kappa — linear + quadratic weights, one grid
# ---------------------------------------------------------------------------
@q(
    "ml_weighted_kappa",
    """
    WITH o AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x,
             CASE WHEN o_totalprice < 50000 THEN 1
                  WHEN o_totalprice < 100000 THEN 2
                  WHEN o_totalprice < 200000 THEN 3
                  WHEN o_totalprice < 300000 THEN 4
                  ELSE 5 END AS y
      FROM orders),
    cells AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c
      FROM o GROUP BY 1, 2),
    rx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS r
           FROM cells GROUP BY x),
    cy AS (SELECT y, CAST(SUM(c) AS BIGINT) AS s
           FROM cells GROUP BY y),
    grid AS (
      SELECT rx.x, cy.y, rx.r, cy.s,
             CAST(COALESCE(cl.c, 0) AS BIGINT) AS o_c,
             CAST(abs(rx.x - cy.y) AS BIGINT) AS wl,
             CAST((rx.x - cy.y) * (rx.x - cy.y) AS BIGINT) AS wq
      FROM rx CROSS JOIN cy
      LEFT JOIN cells cl ON cl.x = rx.x AND cl.y = cy.y),
    agg AS (
      SELECT CAST((SELECT COALESCE(SUM(c), 0) FROM cells) AS BIGINT)
               AS n,
             CAST(COALESCE(SUM(wl * o_c), 0) AS BIGINT) AS ol,
             CAST(COALESCE(SUM(wq * o_c), 0) AS BIGINT) AS oq,
             CAST(COALESCE(SUM(wl * r * s), 0) AS BIGINT) AS el,
             CAST(COALESCE(SUM(wq * r * s), 0) AS BIGINT) AS eq
      FROM grid)
    SELECT n, ol, oq, el, eq,
           CASE WHEN n = 0 OR el = 0 THEN NULL
                ELSE round(1.0 - CAST(n AS DOUBLE) * ol / el, 6) + 0
           END AS kappa_linear,
           CASE WHEN n = 0 OR eq = 0 THEN NULL
                ELSE round(1.0 - CAST(n AS DOUBLE) * oq / eq, 6) + 0
           END AS kappa_quadratic
    FROM agg
    """,
)
def ml_weighted_kappa(spark, sf):
    """Weighted Cohen's kappa (linear AND quadratic weights) between
    two ordinal raters — order priority (1..5) vs fixed price band
    (1..5) — the agreement statistic when disagreeing by one class
    should cost less than disagreeing by four (plain ml_cohen_kappa
    treats both as identical failures; quadratic-weighted kappa is
    the ICC-equivalent the ordinal-rating literature reports).
    kappa_w = 1 - n*sum(w_ij o_ij) / sum(w_ij r_i c_j) — clearing
    the chance normalization leaves FIVE exact BIGINTs (observed and
    expected weighted disagreement masses under both weight
    schemes) and two guarded divisions. The expected mass needs the
    FULL k x k grid including empty cells (r_i*c_j > 0 where o_ij =
    0), so the 5x5 grid is the cross join of the two 5-row marginal
    relations left-joined back to occupied cells — all three
    derived from one 25-cell checkpointed support, corpus scanned
    ONCE. The fixture's raters are independent, so both kappas sit
    in the null bulk near 0 (pinned); the replay test also pins the
    weighted-vs-unweighted ordering identity on a fabricated
    near-diagonal battery. Scale shape: everything after the first
    groupBy is O(k^2) = 25 rows."""
    from ..operators.dedup import parquet_checkpoint

    o = t(spark, sf, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("x"),
        F.when(F.col("o_totalprice") < 50000, 1)
        .when(F.col("o_totalprice") < 100000, 2)
        .when(F.col("o_totalprice") < 200000, 3)
        .when(F.col("o_totalprice") < 300000, 4)
        .otherwise(5)
        .cast("long")
        .alias("y"),
    )
    cells = parquet_checkpoint(
        o.groupBy("x", "y").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        "wkappa_cells",
    )
    rx = cells.groupBy("x").agg(F.sum("c").cast("long").alias("r"))
    cy = cells.groupBy("y").agg(F.sum("c").cast("long").alias("s"))
    grid = (
        rx.crossJoin(cy)
        .join(cells, ["x", "y"], "left")
        .select(
            "r",
            "s",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("o_c"),
            F.abs(F.col("x") - F.col("y")).cast("long").alias("wl"),
            ((F.col("x") - F.col("y")) * (F.col("x") - F.col("y")))
            .cast("long")
            .alias("wq"),
        )
    )
    n_tot = cells.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n")
    )
    agg = grid.agg(
        F.coalesce(F.sum(F.col("wl") * F.col("o_c")), F.lit(0))
        .cast("long")
        .alias("ol"),
        F.coalesce(F.sum(F.col("wq") * F.col("o_c")), F.lit(0))
        .cast("long")
        .alias("oq"),
        F.coalesce(F.sum(F.col("wl") * F.col("r") * F.col("s")), F.lit(0))
        .cast("long")
        .alias("el"),
        F.coalesce(F.sum(F.col("wq") * F.col("r") * F.col("s")), F.lit(0))
        .cast("long")
        .alias("eq"),
    ).crossJoin(n_tot)
    n = F.col("n")
    return agg.select(
        "n",
        "ol",
        "oq",
        "el",
        "eq",
        F.when(
            (n == 0) | (F.col("el") == 0), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                F.lit(1.0)
                - n.cast("double") * F.col("ol") / F.col("el"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("kappa_linear"),
        F.when(
            (n == 0) | (F.col("eq") == 0), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                F.lit(1.0)
                - n.cast("double") * F.col("oq") / F.col("eq"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("kappa_quadratic"),
    )


# ---------------------------------------------------------------------------
# wave 144: Harrell's concordance index on the user-survival panel
# ---------------------------------------------------------------------------
@q(
    "ml_concordance_index",
    """
    WITH u AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
             (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 3600000000
               AS dur,
             CASE WHEN (SELECT MAX(epoch_us(ts)) FROM events)
                       - MAX(epoch_us(ts)) < 43200000000
                  THEN 0 ELSE 1 END AS ev
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    cc AS (
      SELECT cnt, CAST(COUNT(*) AS BIGINT) AS m FROM u GROUP BY cnt),
    cw AS (
      SELECT cnt,
             CAST(SUM(m) OVER (ORDER BY cnt) AS BIGINT) AS cum,
             CAST(SUM(m) OVER () AS BIGINT) AS nu
      FROM cc),
    cuts AS (
      SELECT CAST(MIN(CASE WHEN 4 * cum >= nu THEN cnt END)
                  AS BIGINT) AS q1,
             CAST(MIN(CASE WHEN 2 * cum >= nu THEN cnt END)
                  AS BIGINT) AS q2,
             CAST(MIN(CASE WHEN 4 * cum >= 3 * nu THEN cnt END)
                  AS BIGINT) AS q3
      FROM cw),
    ub AS (
      SELECT dur, ev,
             1 + CASE WHEN cnt > q1 THEN 1 ELSE 0 END
               + CASE WHEN cnt > q2 THEN 1 ELSE 0 END
               + CASE WHEN cnt > q3 THEN 1 ELSE 0 END AS b
      FROM u CROSS JOIN cuts),
    cells AS (
      SELECT dur,
             CAST(COUNT(*) FILTER (WHERE b = 1) AS BIGINT) AS n1,
             CAST(COUNT(*) FILTER (WHERE b = 2) AS BIGINT) AS n2,
             CAST(COUNT(*) FILTER (WHERE b = 3) AS BIGINT) AS n3,
             CAST(COUNT(*) FILTER (WHERE b = 4) AS BIGINT) AS n4,
             CAST(COUNT(*) FILTER (WHERE b = 1 AND ev = 1)
                  AS BIGINT) AS d1,
             CAST(COUNT(*) FILTER (WHERE b = 2 AND ev = 1)
                  AS BIGINT) AS d2,
             CAST(COUNT(*) FILTER (WHERE b = 3 AND ev = 1)
                  AS BIGINT) AS d3,
             CAST(COUNT(*) FILTER (WHERE b = 4 AND ev = 1)
                  AS BIGINT) AS d4
      FROM ub GROUP BY dur),
    cum AS (
      SELECT d1, d2, d3, d4,
             CAST(SUM(n1) OVER () - SUM(n1) OVER w AS BIGINT) AS l1,
             CAST(SUM(n2) OVER () - SUM(n2) OVER w AS BIGINT) AS l2,
             CAST(SUM(n3) OVER () - SUM(n3) OVER w AS BIGINT) AS l3,
             CAST(SUM(n4) OVER () - SUM(n4) OVER w AS BIGINT) AS l4
      FROM cells
      WINDOW w AS (ORDER BY dur)),
    terms AS (
      SELECT CAST(d1 * (l2 + l3 + l4) + d2 * (l3 + l4) + d3 * l4
                  AS BIGINT) AS conc,
             CAST(d2 * l1 + d3 * (l1 + l2) + d4 * (l1 + l2 + l3)
                  AS BIGINT) AS disc,
             CAST(d1 * l1 + d2 * l2 + d3 * l3 + d4 * l4
                  AS BIGINT) AS tie
      FROM cum)
    SELECT CAST(COALESCE(SUM(conc), 0) AS BIGINT) AS n_conc,
           CAST(COALESCE(SUM(disc), 0) AS BIGINT) AS n_disc,
           CAST(COALESCE(SUM(tie), 0) AS BIGINT) AS n_tie,
           CASE WHEN COALESCE(SUM(conc) + SUM(disc) + SUM(tie), 0)
                     = 0 THEN NULL
                ELSE round(CAST(2 * SUM(conc) + SUM(tie) AS DOUBLE)
                           / (2.0 * (SUM(conc) + SUM(disc)
                                     + SUM(tie))), 6) + 0
           END AS c_index
    FROM terms
    """,
)
def ml_concordance_index(spark, sf):
    """Harrell's concordance index on the user-survival panel — THE
    discrimination metric for survival models (the AUC
    generalization that respects censoring): over comparable pairs
    (T_i < T_j and subject i's event observed), the fraction where
    the predictor ranks them correctly, prediction ties scoring
    half. Durations and 12h-window censoring are exactly
    stat_log_rank's (hours; users last seen within 12h of the
    corpus max are censored); the predictor is the user's event
    count banded into data-derived QUARTILE classes via the exact
    2*cw >= p*n count-of-counts rule (customer_rfm's cutoff ladder
    — fixed count thresholds would collapse to one band because the
    count distribution shifts with corpus size). The pair census
    never materializes pairs: on the duration-support grid with 4
    band columns, each death cell pairs with the strictly-later
    survivors per band (l_k = tot_k - cum_k), so conc/disc/tie fold
    to exact BIGINTs from ONE window chain (the stat_somers_d
    machinery with time as the ordering axis), and C =
    (2*conc + tie)/(2*(conc+disc+tie)) is one guarded division.
    Convention pinned in tests against a brute-force quadratic pair
    census: comparable = strict T_i < T_j with delta_i = 1. Scale:
    the grid is |distinct durations| rows regardless of user count."""
    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events").filter(F.col("user_id").isNotNull())
    mx = e.agg(
        F.max(F.expr("unix_micros(cast(ts AS TIMESTAMP))")).alias(
            "gmax"
        )
    )
    u = parquet_checkpoint(
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min(
                F.expr("unix_micros(cast(ts AS TIMESTAMP))")
            ).alias("fus"),
            F.max(
                F.expr("unix_micros(cast(ts AS TIMESTAMP))")
            ).alias("lus"),
        )
        .crossJoin(mx)
        .select(
            "cnt",
            F.expr("(lus - fus) div 3600000000")
            .cast("long")
            .alias("dur"),
            F.when(
                F.col("gmax") - F.col("lus") < 43200000000, 0
            )
            .otherwise(1)
            .alias("ev"),
        ),
        "cidx_users",
    )
    cc = u.groupBy("cnt").agg(F.count(F.lit(1)).cast("long").alias("m"))
    cw = cc.select(
        "cnt",
        F.sum("m").over(Window.orderBy("cnt")).cast("long").alias("cum"),
        F.sum("m").over(Window.partitionBy()).cast("long").alias("nu"),
    )
    cuts = cw.agg(
        F.min(F.when(4 * F.col("cum") >= F.col("nu"), F.col("cnt")))
        .cast("long")
        .alias("q1"),
        F.min(F.when(2 * F.col("cum") >= F.col("nu"), F.col("cnt")))
        .cast("long")
        .alias("q2"),
        F.min(
            F.when(4 * F.col("cum") >= 3 * F.col("nu"), F.col("cnt"))
        )
        .cast("long")
        .alias("q3"),
    )
    ub = u.crossJoin(cuts).select(
        "dur",
        "ev",
        (
            F.lit(1)
            + (F.col("cnt") > F.col("q1")).cast("int")
            + (F.col("cnt") > F.col("q2")).cast("int")
            + (F.col("cnt") > F.col("q3")).cast("int")
        ).alias("b"),
    )
    aggs = []
    for k in range(1, 5):
        aggs.append(
            F.sum(F.when(F.col("b") == k, 1).otherwise(0))
            .cast("long")
            .alias(f"n{k}")
        )
        aggs.append(
            F.sum(
                F.when((F.col("b") == k) & (F.col("ev") == 1), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias(f"d{k}")
        )
    cells = ub.groupBy("dur").agg(*aggs)
    w = Window.orderBy("dur")
    wall = Window.partitionBy()
    cum = cells.select(
        *[F.col(f"d{k}") for k in range(1, 5)],
        *[
            (
                F.sum(f"n{k}").over(wall) - F.sum(f"n{k}").over(w)
            )
            .cast("long")
            .alias(f"l{k}")
            for k in range(1, 5)
        ],
    )
    terms = cum.select(
        (
            F.col("d1") * (F.col("l2") + F.col("l3") + F.col("l4"))
            + F.col("d2") * (F.col("l3") + F.col("l4"))
            + F.col("d3") * F.col("l4")
        )
        .cast("long")
        .alias("conc"),
        (
            F.col("d2") * F.col("l1")
            + F.col("d3") * (F.col("l1") + F.col("l2"))
            + F.col("d4")
            * (F.col("l1") + F.col("l2") + F.col("l3"))
        )
        .cast("long")
        .alias("disc"),
        (
            F.col("d1") * F.col("l1")
            + F.col("d2") * F.col("l2")
            + F.col("d3") * F.col("l3")
            + F.col("d4") * F.col("l4")
        )
        .cast("long")
        .alias("tie"),
    )
    sc = F.coalesce(F.sum("conc"), F.lit(0)).cast("long")
    sd = F.coalesce(F.sum("disc"), F.lit(0)).cast("long")
    st = F.coalesce(F.sum("tie"), F.lit(0)).cast("long")
    tot = sc + sd + st
    return terms.agg(
        sc.alias("n_conc"),
        sd.alias("n_disc"),
        st.alias("n_tie"),
        F.when(tot == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (2 * sc + st).cast("double") / (F.lit(2.0) * tot), 6
            )
            + F.lit(0.0)
        )
        .alias("c_index"),
    )


# ---------------------------------------------------------------------------
# wave 153: MLlib Bucketizer — explicit-splits binning, map-only transform
# ---------------------------------------------------------------------------
@q(
    "mllib_bucketizer",
    """
    WITH b AS (
      SELECT CASE WHEN value < 10.0 THEN 0
                  WHEN value < 50.0 THEN 1
                  WHEN value < 100.0 THEN 2
                  WHEN value < 500.0 THEN 3
                  ELSE 4 END AS bucket,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def mllib_bucketizer(spark, sf):
    """``pyspark.ml.feature.Bucketizer`` with EXPLICIT splits — the
    third pyspark.ml face (mllib_feature_pipeline fits indexers,
    mllib_scaler fits moments; Bucketizer is the no-fit transformer:
    splits are constructor literals, transform is a pure map — the
    shape a feature store ships to serving, where a fitted
    QuantileDiscretizer would drift between training and serving
    runs). Split semantics measured and mirrored in the twin's CASE
    ladder: buckets are LEFT-CLOSED [a, b) (a value equal to an
    interior split lands in the UPPER bucket), -inf/+inf sentinels
    make the ladder total, and the bucket id comes back as a
    DOUBLE column that the face casts to BIGINT for the grid. Per-
    bucket count/sum/min/max over exact cents certify that the JVM
    transformer binned every row exactly as the SQL ladder — one
    scan, map-only transform ahead of one small aggregate. At 100
    TB Bucketizer stays a narrow map stage fused into the scan."""
    from pyspark.ml.feature import Bucketizer

    e = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("value").cast("double").alias("value"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    buck = Bucketizer(
        splits=[
            float("-inf"), 10.0, 50.0, 100.0, 500.0, float("inf"),
        ],
        inputCol="value",
        outputCol="bucket",
    )
    out = buck.transform(e)
    return (
        out.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# wave 160: Nemenyi post-hoc critical-distance report after Friedman
# ---------------------------------------------------------------------------
@q(
    "stat_nemenyi",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
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
      SELECT d.event_type, d.day_num,
             2 * RANK() OVER (PARTITION BY d.day_num ORDER BY d.v)
               + COUNT(*) OVER (PARTITION BY d.day_num, d.v) - 1 AS dr
      FROM daily d JOIN fb USING (day_num)),
    tr AS (
      SELECT event_type,
             CAST(SUM(dr) AS BIGINT) AS rd,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM r GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.rd AS rd_a, b.rd AS rd_b, a.n AS n,
             (SELECT k FROM kk) AS k
      FROM tr a JOIN tr b ON a.event_type < b.event_type)
    SELECT type_a, type_b,
           round(rd_a / 2.0 / n, 6) + 0 AS mean_rank_a,
           round(rd_b / 2.0 / n, 6) + 0 AS mean_rank_b,
           round(abs(rd_a - rd_b) / 2.0 / n, 6) + 0 AS abs_diff,
           CASE WHEN k <> 5 OR n = 0 THEN NULL
                ELSE round(2.728 * sqrt(k * (k + 1.0) / (6.0 * n)),
                           6) + 0 END AS cd_05,
           CASE WHEN k <> 5 OR n = 0 THEN NULL
                ELSE round(abs(rd_a - rd_b) / 2.0 / n, 6)
                     > round(2.728 * sqrt(k * (k + 1.0) / (6.0 * n)),
                             6) END AS significant
    FROM pairs ORDER BY type_a, type_b
    """,
)
def stat_nemenyi(spark, sf):
    """Nemenyi post-hoc critical-distance report — the pairwise
    follow-up stat_friedman licenses (an omnibus Q only says SOME
    treatment differs; Nemenyi says WHICH, controlling the
    familywise rate over all k(k-1)/2 comparisons — the standard
    figure in ML benchmark papers, Demsar 2006's CD diagram): two
    treatments differ at alpha if their mean-rank gap exceeds CD =
    q_alpha/sqrt(2) * sqrt(k(k+1)/(6n)). Mean ranks come from the
    SAME complete-block doubled-rank panel as stat_friedman (exact
    BIGINT rank sums; the /2 de-doubling and /n happen once, in
    the final float), q_{0.05, k=5}/sqrt(2) = 2.728 is an embedded
    literal valid ONLY for k = 5 — the face NULLs the verdict
    columns if the panel's treatment count ever differs, rather
    than silently using a wrong table row (the games_howell
    consumer-table discipline made explicit). The significance
    compare runs on ROUNDED values (engine-stable). The fixture's
    types share one revenue distribution, so no pair separates
    (pinned). Scale: calendar x types cells; the pair grid is
    k(k-1)/2 rows."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = e.groupBy(
        F.expr(
            "datediff(cast(ts AS DATE), DATE '2024-01-01')"
        )
        .cast("long")
        .alias("day_num"),
        "event_type",
    ).agg(
        F.expr(
            "sum(cast(round(value * 100) AS BIGINT)) div 100"
        )
        .cast("long")
        .alias("v")
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "nemenyi_daily")
    kk = daily.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    fb = (
        daily.groupBy("day_num")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(kk)
        .filter(F.col("cnt") == F.col("k"))
        .select("day_num")
    )
    r = daily.join(fb, "day_num").select(
        "event_type",
        (
            2
            * F.rank().over(
                Window.partitionBy("day_num").orderBy("v")
            )
            + F.count(F.lit(1)).over(
                Window.partitionBy("day_num", "v")
            )
            - 1
        )
        .cast("long")
        .alias("dr"),
    )
    tr = r.groupBy("event_type").agg(
        F.sum("dr").cast("long").alias("rd"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = tr.alias("a")
    b = tr.alias("b")
    pairs = (
        a.join(
            b, F.col("a.event_type") < F.col("b.event_type")
        )
        .crossJoin(kk)
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.rd").alias("rd_a"),
            F.col("b.rd").alias("rd_b"),
            F.col("a.n").alias("n"),
            "k",
        )
    )
    n, k = F.col("n"), F.col("k")
    diff = F.round(
        F.abs(F.col("rd_a") - F.col("rd_b")) / F.lit(2.0) / n, 6
    )
    cd = F.round(
        F.lit(2.728)
        * F.sqrt(k * (k + F.lit(1.0)) / (F.lit(6.0) * n)),
        6,
    )
    bad = (k != 5) | (n == 0)
    return pairs.select(
        "type_a",
        "type_b",
        (F.round(F.col("rd_a") / F.lit(2.0) / n, 6) + F.lit(0.0))
        .alias("mean_rank_a"),
        (F.round(F.col("rd_b") / F.lit(2.0) / n, 6) + F.lit(0.0))
        .alias("mean_rank_b"),
        (diff + F.lit(0.0)).alias("abs_diff"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(cd + F.lit(0.0))
        .alias("cd_05"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise(diff > cd)
        .alias("significant"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# wave 162: multiclass confusion metrics — macro/micro F1 over the k x k grid
# ---------------------------------------------------------------------------
@q(
    "ml_multiclass_f1",
    """
    WITH o AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS y,
             CASE WHEN o_totalprice < 50000 THEN 1
                  WHEN o_totalprice < 100000 THEN 2
                  WHEN o_totalprice < 200000 THEN 3
                  WHEN o_totalprice < 300000 THEN 4
                  ELSE 5 END AS p
      FROM orders),
    cells AS (
      SELECT y, p, CAST(COUNT(*) AS BIGINT) AS c
      FROM o GROUP BY 1, 2),
    m AS (
      SELECT k AS cls,
             CAST(COALESCE((SELECT SUM(c) FROM cells
                            WHERE y = k AND p = k), 0) AS BIGINT)
               AS tp,
             CAST(COALESCE((SELECT SUM(c) FROM cells WHERE p = k), 0)
                  AS BIGINT) AS pred,
             CAST(COALESCE((SELECT SUM(c) FROM cells WHERE y = k), 0)
                  AS BIGINT) AS act
      FROM (SELECT UNNEST([1, 2, 3, 4, 5]) AS k) ks),
    f AS (
      SELECT cls, tp, pred, act,
             CASE WHEN pred + act = 0 THEN NULL
                  ELSE round(2.0 * tp / (pred + act), 6) + 0
             END AS f1
      FROM m)
    SELECT cls, tp, pred, act, f1,
           round((SELECT AVG(COALESCE(f1, 0.0)) FROM f), 6) + 0
             AS macro_f1,
           CASE WHEN (SELECT SUM(pred) FROM f) = 0 THEN NULL
                ELSE round(CAST((SELECT SUM(tp) FROM f) AS DOUBLE)
                           / (SELECT SUM(pred) FROM f), 6) + 0
           END AS micro_f1
    FROM f ORDER BY cls
    """,
)
def ml_multiclass_f1(spark, sf):
    """MULTICLASS confusion metrics — per-class F1 plus macro and
    micro averages over the 5x5 priority-vs-price-band grid
    (ml_confusion / ml_f1_sweep are binary; multiclass is where
    the two averages tell different stories: macro weights every
    class equally and punishes a model that ignores rare classes,
    micro = overall accuracy in the single-label setting — the
    identity micro_f1 == accuracy == sum(tp)/n is pinned in the
    replay). Per-class F1 folds to 2*tp/(pred+act) (the 2TP+FP+FN
    denominator identity from ml_f1_sweep), every count an exact
    BIGINT from one corpus scan; absent classes guard to NULL and
    contribute 0 to the macro mean (the documented sklearn
    zero_division=0 convention, spelled explicitly). The class
    axis is the FIXED literal 1..5 domain, not a data-derived
    distinct — a class with zero support still gets its row (the
    full-grid lesson from ml_weighted_kappa). Independent raters
    in the fixture put both averages near 1/k. One scan to 25
    cells; everything after is constant-sized."""
    o = t(spark, sf, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("y"),
        F.when(F.col("o_totalprice") < 50000, 1)
        .when(F.col("o_totalprice") < 100000, 2)
        .when(F.col("o_totalprice") < 200000, 3)
        .when(F.col("o_totalprice") < 300000, 4)
        .otherwise(5)
        .cast("long")
        .alias("p"),
    )
    from ..operators.dedup import parquet_checkpoint

    cells = parquet_checkpoint(
        o.groupBy("y", "p").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        "mcf1_cells",
    )
    ks = spark.range(1, 6).select(F.col("id").alias("cls"))
    tp = cells.filter(F.col("y") == F.col("p")).select(
        F.col("y").alias("cls"), F.col("c").alias("tp_c")
    )
    pred = cells.groupBy(F.col("p").alias("cls")).agg(
        F.sum("c").cast("long").alias("pred")
    )
    act = cells.groupBy(F.col("y").alias("cls")).agg(
        F.sum("c").cast("long").alias("act")
    )
    m = (
        ks.join(tp, "cls", "left")
        .join(pred, "cls", "left")
        .join(act, "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("tp_c"), F.lit(0))
            .cast("long")
            .alias("tp"),
            F.coalesce(F.col("pred"), F.lit(0))
            .cast("long")
            .alias("pred"),
            F.coalesce(F.col("act"), F.lit(0))
            .cast("long")
            .alias("act"),
        )
    )
    f = m.select(
        "cls",
        "tp",
        "pred",
        "act",
        F.when(
            F.col("pred") + F.col("act") == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.lit(2.0) * F.col("tp")
                / (F.col("pred") + F.col("act")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("f1"),
    )
    tot = f.agg(
        (F.round(F.avg(F.coalesce(F.col("f1"), F.lit(0.0))), 6)
         + F.lit(0.0)).alias("macro_f1"),
        F.sum("tp").cast("long").alias("stp"),
        F.sum("pred").cast("long").alias("spred"),
    )
    return (
        f.crossJoin(tot)
        .select(
            "cls",
            "tp",
            "pred",
            "act",
            "f1",
            "macro_f1",
            F.when(
                F.col("spred") == 0, F.lit(None).cast("double")
            )
            .otherwise(
                F.round(
                    F.col("stp").cast("double") / F.col("spred"), 6
                )
                + F.lit(0.0)
            )
            .alias("micro_f1"),
        )
        .orderBy("cls")
    )


# ---------------------------------------------------------------------------
# wave 163: aligned-ranks Friedman (Hodges-Lehmann alignment)
# ---------------------------------------------------------------------------
@q(
    "stat_friedman_aligned",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             event_type,
             SUM(CAST(round(value * 100) AS BIGINT)) // 100 AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2),
    kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
           FROM daily),
    fb AS (
      SELECT day_num FROM daily GROUP BY day_num
      HAVING COUNT(*) = (SELECT k FROM kk)),
    al AS (
      SELECT d.event_type, d.day_num,
             CAST((SELECT k FROM kk) * d.v
                  - SUM(d.v) OVER (PARTITION BY d.day_num)
                  AS BIGINT) AS a
      FROM daily d JOIN fb USING (day_num)),
    r AS (
      SELECT event_type, day_num,
             CAST(2 * RANK() OVER (ORDER BY a)
                  + COUNT(*) OVER (PARTITION BY a) - 1
                  AS BIGINT) AS dr
      FROM al),
    tj AS (
      SELECT CAST(COALESCE(SUM(rd * rd), 0) AS BIGINT) AS srj2
      FROM (SELECT event_type, CAST(SUM(dr) AS BIGINT) AS rd
            FROM r GROUP BY event_type) z),
    ti AS (
      SELECT CAST(COALESCE(SUM(rd * rd), 0) AS BIGINT) AS sri2
      FROM (SELECT day_num, CAST(SUM(dr) AS BIGINT) AS rd
            FROM r GROUP BY day_num) z),
    fin AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fb) AS n,
             (SELECT k FROM kk) AS k,
             (SELECT srj2 FROM tj) AS srj2,
             (SELECT sri2 FROM ti) AS sri2)
    SELECT n AS n_blocks, k, srj2, sri2,
           CASE WHEN n = 0 OR k < 2
                     OR 2 * k * (k * n) * (k * n + 1)
                        * (2 * k * n + 1) - 3 * sri2 <= 0 THEN NULL
                ELSE round(
                  CAST(3 * k * (k - 1)
                       * (srj2 - k * n * n * (k * n + 1)
                                 * (k * n + 1)) AS DOUBLE)
                  / (2 * k * (k * n) * (k * n + 1.0)
                     * (2 * k * n + 1) - 3.0 * sri2), 6) + 0
           END AS t_aligned
    FROM fin
    """,
)
def stat_friedman_aligned(spark, sf):
    """ALIGNED-ranks Friedman (Hodges-Lehmann alignment) — the
    higher-power variant for small treatment counts: plain Friedman
    ranks WITHIN each block (only k levels of information per day);
    aligning first — subtracting the block effect — and then
    ranking GLOBALLY lets magnitudes compare across days, which is
    where the power comes back when k is small. The alignment is
    EXACT integer arithmetic: a = k*v - sum_block(v) (scaling by k
    instead of dividing by it — the events_seasonal detrend trick),
    global tie-averaged ranks via doubled midranks, and the
    statistic folds to one division of exact BIGINTs after
    clearing the de-doubling: T = 3k(k-1)[sum R_j^2 -
    k n^2 (kn+1)^2] / (2k*kn(kn+1)(2kn+1) - 3 sum R_i.^2) with
    DOUBLED rank sums throughout (x4 cancels between numerator
    and denominator terms after the x12k clearing — derived once,
    spelled twice, the bh_fdr discipline). Complete blocks only
    (the stat_friedman panel); treatment-effect-free fixture pins
    T in the chi2(k-1) null bulk and the replay test walks the
    alignment + global ranking by hand. One scan to the calendar
    x types cells; two support-sized window passes."""
    e = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = e.groupBy(
        F.expr("datediff(cast(ts AS DATE), DATE '2024-01-01')")
        .cast("long")
        .alias("day_num"),
        "event_type",
    ).agg(
        F.expr("sum(cast(round(value * 100) AS BIGINT)) div 100")
        .cast("long")
        .alias("v")
    )
    from ..operators.dedup import parquet_checkpoint

    daily = parquet_checkpoint(daily, "fal_daily")
    kk = daily.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    fb = (
        daily.groupBy("day_num")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(kk)
        .filter(F.col("cnt") == F.col("k"))
        .select("day_num")
    )
    al = (
        daily.join(fb, "day_num")
        .crossJoin(kk)
        .select(
            "event_type",
            "day_num",
            (
                F.col("k") * F.col("v")
                - F.sum("v").over(Window.partitionBy("day_num"))
            )
            .cast("long")
            .alias("a"),
        )
    )
    r = parquet_checkpoint(
        al.select(
            "event_type",
            "day_num",
            (
                2 * F.rank().over(Window.orderBy("a"))
                + F.count(F.lit(1)).over(Window.partitionBy("a"))
                - 1
            )
            .cast("long")
            .alias("dr"),
        ),
        "fal_r",
    )
    tj = (
        r.groupBy("event_type")
        .agg(F.sum("dr").cast("long").alias("rd"))
        .agg(
            F.coalesce(F.sum(F.col("rd") * F.col("rd")), F.lit(0))
            .cast("long")
            .alias("srj2")
        )
    )
    ti = (
        r.groupBy("day_num")
        .agg(F.sum("dr").cast("long").alias("rd"))
        .agg(
            F.coalesce(F.sum(F.col("rd") * F.col("rd")), F.lit(0))
            .cast("long")
            .alias("sri2")
        )
    )
    nfb = fb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    fin = nfb.crossJoin(kk).crossJoin(tj).crossJoin(ti)
    n, k = F.col("n"), F.col("k")
    srj2, sri2 = F.col("srj2"), F.col("sri2")
    kn = k * n
    den = (
        2 * k * kn * (kn + F.lit(1.0)) * (2 * kn + 1)
        - F.lit(3.0) * sri2
    )
    num = (
        3 * k * (k - 1) * (srj2 - k * n * n * (kn + 1) * (kn + 1))
    ).cast("double")
    den_int = (
        2 * k * kn * (kn + 1) * (2 * kn + 1) - 3 * sri2
    )
    bad = (n == 0) | (k < 2) | (den_int <= 0)
    return fin.select(
        n.alias("n_blocks"),
        "k",
        "srj2",
        "sri2",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(num / den, 6) + F.lit(0.0))
        .alias("t_aligned"),
    )


# ---------------------------------------------------------------------------
# wave 176: Youden's J optimal threshold — the ROC-based operating point
# ---------------------------------------------------------------------------
@q(
    "ml_youden_j",
    f"""
    WITH {{SCORE}},
    sweep AS (
      SELECT cents AS threshold,
             CAST(pprev + p AS BIGINT) AS tp,
             CAST((cprev + cnt) - (pprev + p) AS BIGINT) AS fp,
             CAST(pos_tot AS BIGINT) AS np,
             CAST(n - pos_tot AS BIGINT) AS nn
      FROM rk),
    scored AS (
      SELECT threshold, tp, fp, np, nn,
             CAST(tp * nn - fp * np AS BIGINT) AS j_num
      FROM sweep WHERE np > 0 AND nn > 0),
    best AS (
      SELECT threshold, tp, fp, np, nn, j_num,
             ROW_NUMBER() OVER (ORDER BY j_num DESC, threshold)
               AS rnk
      FROM scored)
    SELECT threshold, tp, fp, j_num,
           round(CAST(j_num AS DOUBLE) / (CAST(np AS DOUBLE) * nn),
                 6) + 0 AS youden_j
    FROM best WHERE rnk = 1
    """.replace("{SCORE}", _SCORE_SQL),
)
def ml_youden_j(spark, sf):
    """Youden's J optimal threshold — the ROC-based operating point
    (ml_f1_sweep maximizes F1, which moves with prevalence;
    J = TPR - FPR = sensitivity + specificity - 1 is
    prevalence-free, the epidemiology standard for cutting a
    continuous score): sweep every distinct-cents threshold on the
    shared _score_support relation, rank by the EXACT
    cross-multiplied integer j_num = tp*nn - fp*np (dividing by
    the constant np*nn cannot change the argmax, so the ranking
    never touches a float — the ml_f1_sweep exact-argmax
    discipline with the denominators cleared differently), break
    ties toward the LOWER threshold, and report the winner with
    its J. Cumulative-from-top tp/fp come from the same
    descending windows every score face shares — one corpus scan,
    one support-sized window chain, one argmax. The replay test
    sweeps in Python and pins J in [0, 1] with the degenerate
    all-one-class guard (np or nn zero -> empty sweep -> no
    row)."""
    sup = _score_support(spark, sf)
    wdesc = (
        Window.orderBy(F.desc("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy()
    rk = sup.select(
        F.col("cents").alias("threshold"),
        (
            F.coalesce(F.sum("p").over(wdesc), F.lit(0)) + F.col("p")
        )
        .cast("long")
        .alias("tp"),
        (
            F.coalesce(F.sum("cnt").over(wdesc), F.lit(0))
            + F.col("cnt")
            - (
                F.coalesce(F.sum("p").over(wdesc), F.lit(0))
                + F.col("p")
            )
        )
        .cast("long")
        .alias("fp"),
        F.sum("p").over(wall).cast("long").alias("np"),
        (F.sum("cnt").over(wall) - F.sum("p").over(wall))
        .cast("long")
        .alias("nn"),
    )
    scored = rk.filter((F.col("np") > 0) & (F.col("nn") > 0)).select(
        "threshold",
        "tp",
        "fp",
        "np",
        "nn",
        (F.col("tp") * F.col("nn") - F.col("fp") * F.col("np"))
        .cast("long")
        .alias("j_num"),
    )
    w = Window.orderBy(F.desc("j_num"), F.col("threshold"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "threshold",
            "tp",
            "fp",
            "j_num",
            (
                F.round(
                    F.col("j_num").cast("double")
                    / (F.col("np").cast("double") * F.col("nn")),
                    6,
                )
                + F.lit(0.0)
            ).alias("youden_j"),
        )
    )
