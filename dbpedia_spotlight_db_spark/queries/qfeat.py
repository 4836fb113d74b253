"""Feature-engineering and data-governance faces (round-4 wave 29):
the dataset-shaping operators between raw curation and model
training — exact deterministic class-balanced downsampling (the
two-pass rank selection, never a per-class global sort),
weight-of-evidence categorical encoding with information-value
terms, an l-diversity privacy audit that goes beyond k-anonymity,
and a dictionary-encoding size plan computed entirely from
count-of-counts arithmetic (the columnar-layout decision at corpus
scale without ever ranking the vocabulary).

Conventions are the sibling modules': md5-based hashing wherever both
engines must agree bit-for-bit (lowercase hex on both — the
mix_domains precedent), ln() on exact-integer ratios quantized to
micros (the text_collocations construction), float chains in the
SAME operation order on both sides, final floats rounded to 6 with
the ``+ 0`` IEEE -0.0 guard, integer division spelled ``DIV`` /
``//``, and ANSI DIVIDE_BY_ZERO / ln(0) hazards short-circuited to
NULL on both engines.
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


# ---------------------------------------------------------------------------
# exact class-balanced downsample — two-pass md5-rank selection
# ---------------------------------------------------------------------------
@q(
    "sample_balanced",
    """
    WITH k AS (
      SELECT MIN(cnt) AS k FROM (
        SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang) c),
    r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
      FROM documents)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM r CROSS JOIN k WHERE r.rn <= k.k
    GROUP BY lang
    """,
)
def sample_balanced(spark, sf):
    """Exact class-balanced downsample: every language keeps exactly
    k = min(class size) documents, chosen as the k smallest
    md5(doc_id) per class — deterministic across engines, runs, and
    cluster sizes (no RNG, no partition-order dependence). The Spark
    path is the TWO-PASS RANK SELECTION, never a per-class global
    sort: pass 1 histograms each class over 256 md5-prefix buckets (a
    map-side-combinable agg; the cumulative window runs over <=256
    bucket rows per class), the bucket containing rank k is located
    arithmetically, and only THAT bucket's rows (~1/256 of a class)
    are ranked in pass 2 — everything in lower buckets is kept
    outright, the quantile_2pass idiom applied to selection. Because
    buckets partition the md5-string domain lexicographically, keep =
    (bucket < target) OR (bucket = target AND within-bucket rank <=
    k - below), exactly the global top-k. The oracle is the naive
    full-sort ROW_NUMBER form. Output pins the exact selected SET per
    class via the doc_id checksum, not just the count."""
    d = t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    d = d.withColumn(
        "bkt",
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int"),
    )
    h = d.groupBy("lang", "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    totals = h.groupBy("lang").agg(F.sum("cnt").alias("class_n"))
    k = totals.agg(F.min("class_n").alias("k"))
    wcum = (
        Window.partitionBy("lang")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    h2 = h.withColumn(
        "cb", F.coalesce(F.sum("cnt").over(wcum), F.lit(0))
    ).crossJoin(F.broadcast(k))
    target = h2.filter(
        (F.col("cb") < F.col("k")) & (F.col("cb") + F.col("cnt") >= F.col("k"))
    ).select("lang", "bkt", (F.col("k") - F.col("cb")).alias("r"))
    # strictly below the boundary bucket: a bucket ending EXACTLY at
    # rank k is the target (kept whole via r = cnt), not a below-row —
    # <= here would double-count it
    below = h2.filter(F.col("cb") + F.col("cnt") < F.col("k")).select(
        "lang", "bkt"
    )
    keep_low = d.join(F.broadcast(below), ["lang", "bkt"]).select(
        "doc_id", "lang"
    )
    wrn = Window.partitionBy("lang", "bkt").orderBy("h")
    keep_edge = (
        d.join(F.broadcast(target), ["lang", "bkt"])
        .withColumn("rn", F.row_number().over(wrn))
        .filter(F.col("rn") <= F.col("r"))
        .select("doc_id", "lang")
    )
    return (
        keep_low.unionByName(keep_edge)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic weighted sampling — Efraimidis–Spirakis top-k
# ---------------------------------------------------------------------------
@q(
    "sample_weighted",
    """
    WITH w AS (
      SELECT doc_id, lang, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               AS h
      FROM documents WHERE n_chars > 0),
    k AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(round((1000000000000.0
                         * ln((CAST(h AS DOUBLE) + 1) / 4294967296.0))
                        / CAST(n_chars AS DOUBLE)) AS BIGINT) AS key_ps
      FROM w)
    SELECT doc_id, lang, n_chars, key_ps,
           CAST(ROW_NUMBER() OVER (ORDER BY key_ps DESC, doc_id) AS INT)
             AS rnk
    FROM k QUALIFY rnk <= 20
    """,
)
def sample_weighted(spark, sf):
    """Weighted sampling WITHOUT replacement, 20 documents with
    probability proportional to length — the Efraimidis–Spirakis
    one-pass scheme (rank by u^(1/w), equivalently ln(u)/w, take the
    top-k), with the uniform u derived from md5(doc_id) instead of an
    RNG so the drawn set is identical across engines, runs,
    partitionings, and cluster sizes — the property a reproducible
    training-data pipeline needs from its sampler (the sample_hash /
    mix_domains determinism discipline, upgraded from Bernoulli to
    weighted-without-replacement). The key ln(u)/w is quantized to
    integer PICOS before ranking (ln(u) in [-22, 0] over weights up
    to ~10^4 needs the finer unit than the usual micros; exact-BIGINT
    comparisons, doc_id tie-break) so the cutoff row is engine-
    stable. Scale shape: map-only scoring then top-20 via
    TakeOrderedAndProject — per-partition heaps, a 20-row driver
    merge, NO global sort; the row_number window then ranks 20
    rows."""
    d = (
        t(spark, sf, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        + 1
    ).cast("double") / F.lit(4294967296.0)
    key = F.round(
        (F.lit(1000000000000.0) * F.log(u))
        / F.col("n_chars").cast("double")
    ).cast("long")
    scored = d.withColumn("key_ps", key)
    top = scored.orderBy(F.desc("key_ps"), "doc_id").limit(20)
    win = Window.orderBy(F.desc("key_ps"), "doc_id")
    return top.select(
        "doc_id",
        "lang",
        "n_chars",
        "key_ps",
        F.row_number().over(win).cast("int").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# weight-of-evidence categorical encoding + information value
# ---------------------------------------------------------------------------
@q(
    "feat_woe",
    """
    WITH s AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    g AS (SELECT cat, CAST(SUM(y) AS BIGINT) AS pos,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
          FROM s GROUP BY cat),
    tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS pt,
                   CAST(SUM(neg) AS BIGINT) AS nt FROM g)
    SELECT cat, pos, neg,
           CASE WHEN pos = 0 OR neg = 0 OR pt = 0 OR nt = 0 THEN NULL
                ELSE round(round(1000000.0 * ln(
                       CAST(pos * nt AS DOUBLE) / CAST(neg * pt AS DOUBLE)))
                     / 1000000.0, 6) + 0
           END AS woe,
           CASE WHEN pos = 0 OR neg = 0 OR pt = 0 OR nt = 0 THEN NULL
                ELSE round((CAST(pos AS DOUBLE) / pt
                            - CAST(neg AS DOUBLE) / nt)
                     * (round(1000000.0 * ln(
                          CAST(pos * nt AS DOUBLE) / CAST(neg * pt AS DOUBLE)))
                        / 1000000.0), 6) + 0
           END AS iv_term
    FROM g CROSS JOIN tot
    """,
)
def feat_woe(spark, sf):
    """Weight-of-evidence encoding of a categorical feature against a
    binary target (order priority vs 'F' status) with per-category
    information-value terms — the standard supervised categorical
    encoder for scorecard-style models, and the IV sum is the
    feature-selection screen. WOE = ln((pos_c/pos_t)/(neg_c/neg_t)),
    computed as ln of ONE exact-integer cross-ratio (pos_c*neg_t)/
    (neg_c*pos_t) and quantized to integer micros before any further
    float math (the text_collocations construction), so both engines
    agree bit-for-bit; the IV term then multiplies the micros-rounded
    WOE by an identically-ordered rate difference and rounds to 6.
    Zero cells (a category with no positives or no negatives) yield
    NULL instead of ANSI ln/division errors — the standard smoothing
    seam. Scale shape: one map-side-combinable agg to a
    category-sized relation, one 1-row cross join; the fact table is
    scanned once, nothing corpus-sized is ever broadcast."""
    s = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("cat").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )
    tot = g.agg(
        F.sum("pos").cast("long").alias("pt"),
        F.sum("neg").cast("long").alias("nt"),
    )
    j = g.crossJoin(F.broadcast(tot))
    bad = (
        (F.col("pos") == 0)
        | (F.col("neg") == 0)
        | (F.col("pt") == 0)
        | (F.col("nt") == 0)
    )
    ratio = (F.col("pos") * F.col("nt")).cast("double") / (
        F.col("neg") * F.col("pt")
    ).cast("double")
    woe_us = F.round(F.lit(1000000.0) * F.log(ratio))
    woe = woe_us / F.lit(1000000.0)
    rate_diff = F.col("pos").cast("double") / F.col("pt") - F.col(
        "neg"
    ).cast("double") / F.col("nt")
    return j.select(
        "cat",
        "pos",
        "neg",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(woe, 6) + F.lit(0.0))
        .alias("woe"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(rate_diff * woe, 6) + F.lit(0.0))
        .alias("iv_term"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit — distinct-sensitive-value floor per QI group
# ---------------------------------------------------------------------------
_LDIV_K = 5
_LDIV_L = 2


@q(
    "privacy_ldiversity",
    f"""
    SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS l,
           COUNT(*) >= {_LDIV_K} AS k_anonymous,
           COUNT(DISTINCT o_orderstatus) >= {_LDIV_L} AS l_diverse
    FROM orders
    GROUP BY 1, 2
    """,
)
def privacy_ldiversity(spark, sf):
    """l-diversity audit over the quasi-identifier grouping
    (priority, order year) with order status as the sensitive
    attribute: per QI group, the group size k AND the number of
    DISTINCT sensitive values l — the release gate that k-anonymity
    alone misses (a k=50 group whose members all share one status
    still leaks the attribute; privacy_kanon checks only k). Groups
    failing k >= 5 or l >= 2 are flagged in-row so the release job
    can suppress or generalize exactly those cells. Scale shape: one
    partial-aggregating distinct-count per QI cell (Spark plans the
    two-phase distinct expansion with map-side partials); the QI
    lattice is bounded (priorities x years), so the report relation
    is tiny no matter the fact-table size. year() agrees on both
    engines under the UTC-pinned session."""
    o = t(spark, sf, "orders")
    return o.groupBy(
        "o_orderpriority",
        F.year("o_orderdate").cast("int").alias("yr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct("o_orderstatus").cast("long").alias("l"),
        (F.count(F.lit(1)) >= _LDIV_K).alias("k_anonymous"),
        (F.countDistinct("o_orderstatus") >= _LDIV_L).alias("l_diverse"),
    )


# ---------------------------------------------------------------------------
# dictionary-encoding size plan — pure count-of-counts arithmetic
# ---------------------------------------------------------------------------
_DICT_B1 = 128  # ranks encodable in 1 byte (varint)
_DICT_B2 = 16384  # ranks encodable in 2 bytes


@q(
    "encode_dict",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    cnt AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok WHERE tk <> '' GROUP BY tk),
    raw AS (SELECT CAST(SUM(c * (len(tk) + 1)) AS BIGINT) AS bytes_raw,
                   CAST(SUM(len(tk) + 1) AS BIGINT) AS dict_strings,
                   CAST(SUM(c) AS BIGINT) AS n_occ,
                   CAST(COUNT(*) AS BIGINT) AS vocab
            FROM cnt),
    cc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM cnt GROUP BY c),
    cum AS (
      SELECT c, n,
             COALESCE(SUM(n) OVER (
               ORDER BY c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb
      FROM cc),
    bands AS (
      SELECT c, n, tb,
             LEAST(GREATEST({_DICT_B1} - tb, 0), n) AS n1,
             LEAST(GREATEST({_DICT_B2} - tb
                            - LEAST(GREATEST({_DICT_B1} - tb, 0), n), 0),
                   n - LEAST(GREATEST({_DICT_B1} - tb, 0), n)) AS n2
      FROM cum),
    enc AS (
      SELECT CAST(SUM(c * (n1 * 1 + n2 * 2 + (n - n1 - n2) * 3))
                  AS BIGINT) AS stream_bytes,
             CAST(SUM(n1 * 1 + n2 * 2 + (n - n1 - n2) * 3)
                  AS BIGINT) AS id_bytes
      FROM bands)
    SELECT raw.n_occ, raw.vocab, raw.bytes_raw,
           CAST(COALESCE(enc.stream_bytes, 0) + COALESCE(raw.dict_strings, 0)
                + COALESCE(enc.id_bytes, 0) AS BIGINT) AS bytes_encoded,
           CASE WHEN raw.bytes_raw IS NULL OR raw.bytes_raw = 0 THEN NULL
                ELSE round(CAST(COALESCE(enc.stream_bytes, 0)
                                + COALESCE(raw.dict_strings, 0)
                                + COALESCE(enc.id_bytes, 0) AS DOUBLE)
                           / raw.bytes_raw, 6) + 0
           END AS ratio
    FROM raw CROSS JOIN enc
    """,
)
def encode_dict(spark, sf):
    """Dictionary-encoding size plan for the token column — the
    columnar-layout decision (would a rank-ordered varint dictionary
    beat raw strings?) computed WITHOUT ever ranking the vocabulary.
    Ids are assigned by frequency rank with varint widths (ranks
    1-128 -> 1 byte, 129-16384 -> 2, rest -> 3); the trick is that
    tokens inside one frequency tie-run are interchangeable for
    sizing (same count, same per-occurrence cost), so band membership
    needs only the COUNT-OF-COUNTS relation: tokens_before(c) =
    cumulative n over higher counts, and each run splits into bands
    by pure LEAST/GREATEST arithmetic — the stat_gini closed-form
    precedent. The only window runs over DISTINCT FREQUENCIES
    (O(sqrt(occurrences)) rows, e.g. a 10^12-token corpus has ~10^6
    distinct counts), never over the vocabulary, never over the
    corpus. Encoded size = varint stream + dictionary strings +
    dictionary ids; ratio < 1 means encode. Empty corpus yields the
    single all-NULL/0 planning row on both engines."""
    d = t(spark, sf, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
        .groupBy("tk")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    raw = cnt.agg(
        F.sum(F.col("c") * (F.length("tk") + 1)).cast("long").alias(
            "bytes_raw"
        ),
        F.sum(F.length("tk") + 1).cast("long").alias("dict_strings"),
        F.sum("c").cast("long").alias("n_occ"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    cc = cnt.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wcum = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = cc.withColumn(
        "tb", F.coalesce(F.sum("n").over(wcum), F.lit(0))
    )
    n1 = F.least(F.greatest(F.lit(_DICT_B1) - F.col("tb"), F.lit(0)), F.col("n"))
    cum = cum.withColumn("n1", n1)
    n2 = F.least(
        F.greatest(
            F.lit(_DICT_B2) - F.col("tb") - F.col("n1"), F.lit(0)
        ),
        F.col("n") - F.col("n1"),
    )
    bands = cum.withColumn("n2", n2)
    per_tok = (
        F.col("n1") * 1 + F.col("n2") * 2 + (F.col("n") - F.col("n1") - F.col("n2")) * 3
    )
    enc = bands.agg(
        F.sum(F.col("c") * per_tok).cast("long").alias("stream_bytes"),
        F.sum(per_tok).cast("long").alias("id_bytes"),
    )
    j = raw.crossJoin(enc)
    total = (
        F.coalesce(F.col("stream_bytes"), F.lit(0))
        + F.coalesce(F.col("dict_strings"), F.lit(0))
        + F.coalesce(F.col("id_bytes"), F.lit(0))
    )
    bad = F.col("bytes_raw").isNull() | (F.col("bytes_raw") == 0)
    return j.select(
        "n_occ",
        "vocab",
        "bytes_raw",
        total.cast("long").alias("bytes_encoded"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(total.cast("double") / F.col("bytes_raw"), 6)
            + F.lit(0.0)
        )
        .alias("ratio"),
    )


# ---------------------------------------------------------------------------
# quantile binning — fit-a-binner report, tie-runs unsplit
# ---------------------------------------------------------------------------
@q(
    "feat_quantile_bins",
    """
    WITH v AS (
      SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
    pv AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM v GROUP BY cents),
    rk AS (
      SELECT cents, cnt,
             COALESCE(SUM(cnt) OVER (ORDER BY cents
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS cprev,
             SUM(cnt) OVER () AS n
      FROM pv)
    SELECT CAST(1 + (cprev * 4) // n AS INT) AS bin,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           MIN(cents) AS lo_cents, MAX(cents) AS hi_cents,
           round(CAST(SUM(cents * cnt) AS DOUBLE) / SUM(cnt) / 100.0, 6) + 0
             AS mean_bal
    FROM rk GROUP BY 1
    """,
)
def feat_quantile_bins(spark, sf):
    """Quartile binning of account balance — the fit-the-binner step
    of feature engineering (the emitted lo/hi boundaries ARE the
    binning model a serving path applies). Bin assignment is
    1 + ⌊4·cprev/n⌋ over the per-distinct-value support, so a tie-run
    of equal values lands WHOLE in one bin (the ml_lift convention —
    splitting a run needs a global per-row sort and makes membership
    partition-order-dependent; equal feature values mapping to
    different bins would also be a serving-skew bug). Scale shape:
    corpus → distinct-value support (map-side combinable), one
    cumulative window with the total as OVER () on the same relation
    (one corpus scan — the wave-33 discipline), then a ≤4-row
    rollup. The weighted mean divides exact integers, round 6."""
    v = t(spark, sf, "customer").select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents")
    )
    pv = v.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rk = pv.select(
        "cents",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cprev"),
        F.sum("cnt").over(wall).alias("n"),
    )
    return rk.groupBy(
        (F.lit(1) + F.floor(F.col("cprev") * 4 / F.col("n")))
        .cast("int")
        .alias("bin")
    ).agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
        (
            F.round(
                F.sum(F.col("cents") * F.col("cnt")).cast("double")
                / F.sum("cnt")
                / F.lit(100.0),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_bal"),
    )


# ---------------------------------------------------------------------------
# t-closeness audit — cross-multiplied TVD with the absent-cell fold
# ---------------------------------------------------------------------------
_TCLOSE_T_PCT = 20  # release gate: TVD <= 0.20


@q(
    "privacy_tcloseness",
    f"""
    WITH cells AS (
      SELECT o_orderpriority AS qi1, CAST(year(o_orderdate) AS INT) AS yr,
             o_orderstatus AS s, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2, 3),
    w AS (
      SELECT qi1, yr, c,
             SUM(c) OVER (PARTITION BY qi1, yr) AS n_g,
             SUM(c) OVER (PARTITION BY s) AS c_s,
             SUM(c) OVER () AS n
      FROM cells),
    g AS (
      SELECT qi1, yr,
             CAST(MAX(n_g) AS BIGINT) AS k,
             CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(abs(c * n - c_s * n_g) - c_s * n_g)
                  + MAX(n_g) * MAX(n) AS BIGINT) AS tvd_num
      FROM w GROUP BY qi1, yr)
    SELECT qi1 AS o_orderpriority, yr, k,
           CASE WHEN k = 0 OR n = 0 THEN NULL
                ELSE round(tvd_num / (2.0 * k * n), 6) + 0
           END AS t_dist,
           CASE WHEN k = 0 OR n = 0 THEN NULL
                ELSE tvd_num * 100 <= {_TCLOSE_T_PCT} * 2 * k * n
           END AS t_close
    FROM g
    """,
)
def privacy_tcloseness(spark, sf):
    """t-closeness audit (Li et al.) over the privacy_kanon /
    privacy_ldiversity QI lattice (priority, order year) with order
    status as the sensitive attribute: per QI group, the variational
    distance between the group's sensitive distribution and the
    GLOBAL one must not exceed t — the release gate l-diversity
    misses (a group can be diverse yet skewed far from the corpus,
    leaking membership). Exactness is the host_blocklist
    cross-multiplication: TVD = ½ Σ_s |c_gs/n_g − c_s/n| clears both
    denominators to ½ Σ_s |c_gs·n − c_s·n_g| / (n_g·n), all BIGINT.
    Statuses ABSENT from a group contribute c_s·n_g each; since
    Σ_all c_s·n_g = n·n_g, the absent mass folds to the closed form
    Σ_present (|c·n − c_s·n_g| − c_s·n_g) + n·n_g — the text_jsd
    absent-cell discipline, no dense (group × status) cross join
    ever materializes. Every marginal (n_g, per-status c_s, n) is a
    WINDOW over the one bounded cells relation (stat_mutual_info
    lesson: a second aggregation branch re-scans the corpus). The
    gate itself compares integers (tvd_num·100 ≤ t%·2·k·n) — no
    float in the pass/fail decision. Headroom: c·n ≤ n² caps the
    exact path at ~3·10⁹ rows per the BIGINT budget; past that the
    same plan runs in DECIMAL(38,0). One corpus scan; the QI×status
    lattice is value-domain-bounded."""
    o = t(spark, sf, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("qi1"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderstatus").alias("s"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = cells.select(
        "qi1",
        "yr",
        "c",
        F.sum("c").over(Window.partitionBy("qi1", "yr")).alias("n_g"),
        F.sum("c").over(Window.partitionBy("s")).alias("c_s"),
        F.sum("c")
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    g = w.groupBy("qi1", "yr").agg(
        F.max("n_g").cast("long").alias("k"),
        F.max("n").cast("long").alias("n"),
        (
            F.sum(
                F.abs(F.col("c") * F.col("n") - F.col("c_s") * F.col("n_g"))
                - F.col("c_s") * F.col("n_g")
            )
            + F.max("n_g") * F.max("n")
        )
        .cast("long")
        .alias("tvd_num"),
    )
    bad = (F.col("k") == 0) | (F.col("n") == 0)
    return g.select(
        F.col("qi1").alias("o_orderpriority"),
        "yr",
        "k",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("tvd_num") / (F.lit(2.0) * F.col("k") * F.col("n")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("t_dist"),
        F.when(bad, F.lit(None).cast("boolean"))
        .otherwise(
            F.col("tvd_num") * 100
            <= F.lit(_TCLOSE_T_PCT) * 2 * F.col("k") * F.col("n")
        )
        .alias("t_close"),
    )


# ---------------------------------------------------------------------------
# RLE sizing plan — distributed run counting, no single-partition window
# ---------------------------------------------------------------------------
@q(
    "encode_rle",
    """
    WITH o AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             row_number() OVER (ORDER BY l_shipdate, l_orderkey,
                                l_linenumber) AS rn
      FROM lineitem),
    b AS (
      SELECT CASE WHEN lag(rf) OVER (ORDER BY rn) IS DISTINCT FROM rf
                  THEN 1 ELSE 0 END AS brf,
             CASE WHEN lag(ls) OVER (ORDER BY rn) IS DISTINCT FROM ls
                  THEN 1 ELSE 0 END AS bls
      FROM o),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COALESCE(SUM(brf), 0) AS BIGINT) AS r_rf,
             CAST(COALESCE(SUM(bls), 0) AS BIGINT) AS r_ls
      FROM b)
    SELECT col, n_rows, n_runs,
           CASE WHEN n_runs = 0 THEN NULL
                ELSE round(n_rows / CAST(n_runs AS DOUBLE), 6) + 0
           END AS rle_ratio
    FROM (
      SELECT 'l_returnflag' AS col, n_rows, r_rf AS n_runs FROM s
      UNION ALL
      SELECT 'l_linestatus' AS col, n_rows, r_ls AS n_runs FROM s)
    """,
)
def encode_rle(spark, sf):
    """Run-length-encoding sizing for the low-cardinality lineitem
    columns under the table's natural (shipdate, orderkey,
    linenumber) sort order — the layout question behind "should the
    writer sort before encoding?" (runs ≈ pages after RLE; pairs
    with encode_dict and zorder_plan as the third layout planner).
    Run counting needs adjacent-row comparison in a GLOBAL total
    order, which a naive window serializes through one task — so
    this face uses the abc_classification distributed-scan idiom:
    repartitionByRange on the total order, freeze partition ids
    with a parquet checkpoint, count run boundaries WITHIN each
    partition (per-pid LAG windows, parallel), and repair the ≤16
    cross-partition seams from the collected per-partition edge
    rows (driver-sized by construction: 2 rows per partition). The
    run total is partitioning-INVARIANT: every seam where the
    neighbor values match subtracts exactly one boundary, so local
    counts + seam repair equals the serial count — the oracle runs
    the serial spelling. Empty corpus: both report rows with
    n_runs=0 and NULL ratio (totality)."""
    from ..operators.dedup import parquet_checkpoint

    li = t(spark, sf, "lineitem").select(
        "l_shipdate", "l_orderkey", "l_linenumber",
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
    )
    ranged = parquet_checkpoint(
        li.repartitionByRange(
            16, "l_shipdate", "l_orderkey", "l_linenumber"
        ).withColumn("pid", F.spark_partition_id()),
        "rle_ranged",
    )
    wp = Window.partitionBy("pid").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    flg = ranged.select(
        "pid",
        F.when(
            F.lag("rf").over(wp).isNull()
            | (F.lag("rf").over(wp) != F.col("rf")),
            1,
        )
        .otherwise(0)
        .alias("brf"),
        F.when(
            F.lag("ls").over(wp).isNull()
            | (F.lag("ls").over(wp) != F.col("ls")),
            1,
        )
        .otherwise(0)
        .alias("bls"),
    )
    # seam repair: per-partition first/last edge values (2 rows per
    # pid — driver-sized), matched across adjacent non-empty pids
    key = F.struct("l_shipdate", "l_orderkey", "l_linenumber")
    edges = (
        ranged.groupBy("pid")
        .agg(
            F.min_by(F.struct("rf", "ls"), key).alias("first"),
            F.max_by(F.struct("rf", "ls"), key).alias("last"),
        )
        .collect()
    )
    edges.sort(key=lambda r: r["pid"])
    fix_rf = fix_ls = 0
    for prev, cur in zip(edges, edges[1:]):
        if prev["last"]["rf"] == cur["first"]["rf"]:
            fix_rf += 1
        if prev["last"]["ls"] == cur["first"]["ls"]:
            fix_ls += 1
    s = flg.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.coalesce(F.sum("brf"), F.lit(0)) - F.lit(fix_rf))
        .cast("long")
        .alias("r_rf"),
        (F.coalesce(F.sum("bls"), F.lit(0)) - F.lit(fix_ls))
        .cast("long")
        .alias("r_ls"),
    )
    out = s.selectExpr(
        "stack(2, 'l_returnflag', n_rows, r_rf, "
        "'l_linestatus', n_rows, r_ls) AS (col, n_rows, n_runs)"
    )
    return out.select(
        "col",
        "n_rows",
        "n_runs",
        F.when(F.col("n_runs") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("n_rows") / F.col("n_runs").cast("double"), 6
            )
            + F.lit(0.0)
        )
        .alias("rle_ratio"),
    )


# ---------------------------------------------------------------------------
# robust scaling parameters — median/IQR fit with integer Tukey fences
# ---------------------------------------------------------------------------
@q(
    "feat_robust_scale",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(round(4 * quantile_cont(cents, 0.25)) AS BIGINT) AS q14,
             CAST(round(4 * quantile_cont(cents, 0.5)) AS BIGINT) AS med4,
             CAST(round(4 * quantile_cont(cents, 0.75)) AS BIGINT) AS q34
      FROM v GROUP BY event_type),
    j AS (
      SELECT v.event_type, v.cents, s.n, s.q14, s.med4, s.q34,
             s.q34 - s.q14 AS iqr4
      FROM v JOIN s USING (event_type))
    SELECT event_type, MAX(n) AS n,
           round(MAX(med4) / 400.0, 6) + 0 AS median_val,
           round(MAX(q14) / 400.0, 6) + 0 AS q1,
           round(MAX(q34) / 400.0, 6) + 0 AS q3,
           round(MAX(iqr4) / 400.0, 6) + 0 AS iqr,
           CAST(COUNT(*) FILTER (WHERE 8 * cents < 2 * q14 - 3 * iqr4
                                    OR 8 * cents > 2 * q34 + 3 * iqr4)
                AS BIGINT) AS n_outliers
    FROM j GROUP BY event_type
    """,
)
def feat_robust_scale(spark, sf):
    """The fitted ROBUST-SCALER parameter table per event type —
    median and IQR (the sklearn RobustScaler contract: subtract the
    median, divide by IQR, so one fat-fingered amount can't crush
    the scale the way mean/std scaling does) plus the Tukey-fence
    outlier census 1.5·IQR beyond the quartiles. Exactness: type-7
    quantiles of integer cents interpolate on quarter fractions
    only (h = (n−1)p + 1 with p ∈ {.25,.5,.75}), so 4·quantile is
    an exact integer on both engines (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, the agg_percentiles precedent) and
    the fence test clears all denominators: x < q1 − 1.5·IQR ⟺
    8·cents < 2·q14 − 3·iqr4 — pure BIGINT membership, no float in
    the row decision (the events_outliers rule). Scale shape:
    per-type stats agg, then the tiny stats relation joins back by
    broadcast for the census — the standard fit-then-apply layout
    where the "apply" side never shuffles the corpus."""
    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    v = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.lit(4) * F.expr("percentile(cents, 0.25)"))
        .cast("long")
        .alias("q14"),
        F.round(F.lit(4) * F.expr("percentile(cents, 0.5)"))
        .cast("long")
        .alias("med4"),
        F.round(F.lit(4) * F.expr("percentile(cents, 0.75)"))
        .cast("long")
        .alias("q34"),
    )
    j = v.join(s, "event_type").select(
        "event_type",
        "cents",
        "n",
        "q14",
        "med4",
        "q34",
        (F.col("q34") - F.col("q14")).alias("iqr4"),
    )
    out = (
        (F.lit(8) * F.col("cents") < 2 * F.col("q14") - 3 * F.col("iqr4"))
        | (F.lit(8) * F.col("cents") > 2 * F.col("q34") + 3 * F.col("iqr4"))
    ).cast("long")
    return j.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (F.round(F.max("med4") / 400.0, 6) + F.lit(0.0)).alias("median_val"),
        (F.round(F.max("q14") / 400.0, 6) + F.lit(0.0)).alias("q1"),
        (F.round(F.max("q34") / 400.0, 6) + F.lit(0.0)).alias("q3"),
        (F.round(F.max("iqr4") / 400.0, 6) + F.lit(0.0)).alias("iqr"),
        F.sum(out).cast("long").alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# differentially-private count release — deterministic Laplace mechanism
# ---------------------------------------------------------------------------
@q(
    "privacy_dp_count",
    """
    WITH cnt AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type),
    u AS (
      SELECT event_type, n,
             ('0x' || substr(md5(event_type), 1, 8))::UBIGINT
               / 4294967296.0 - 0.5 AS v
      FROM cnt),
    nz AS (
      SELECT event_type, n,
             CAST(round(-10.0 * sign(v)
                        * ln(GREATEST(1.0 - 2.0 * abs(v), 1e-12)))
                  AS BIGINT) AS noise
      FROM u)
    SELECT event_type, n, noise,
           GREATEST(n + noise, 0) AS noisy_n
    FROM nz
    """,
)
def privacy_dp_count(spark, sf):
    """Laplace-mechanism count release — the DIFFERENTIAL-privacy
    face completing the privacy ladder (privacy_kanon / ldiversity /
    tcloseness are syntactic group-privacy models; DP perturbs the
    release itself). Per event_type the true count gets Laplace noise
    with scale b = 1/eps = 10 via the inverse CDF
    -b*sign(v)*ln(1-2|v|) of a uniform draw — the draw is md5-derived
    from the GROUP KEY (the sample_hash determinism discipline), so
    the release is identical across engines, runs, partitionings,
    and cluster sizes, which is what makes it hash-gateable; a
    production release would use a real CSPRNG seed and project the
    true n away (kept here so the gate pins the mechanism
    arithmetic). The ln argument is clamped at 1e-12 in the SAME
    expression order on both engines (a u of exactly 0 or 1 would hit
    ln(0)); the noisy count clips at 0 (counts are non-negative —
    standard post-processing, DP survives it). Map-side-combinable
    group-by -> per-group scalar arithmetic: one exchange, no
    windows, no second scan."""
    cnt = t(spark, sf, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    v = (
        F.conv(F.substring(F.md5(F.col("event_type")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
        - F.lit(0.5)
    )
    noise = F.round(
        F.lit(-10.0)
        * F.signum(v)
        * F.log(
            F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(v), F.lit(1e-12))
        )
    ).cast("long")
    nz = cnt.select("event_type", "n", noise.alias("noise"))
    return nz.select(
        "event_type",
        "n",
        "noise",
        F.greatest(F.col("n") + F.col("noise"), F.lit(0)).alias("noisy_n"),
    )


# ---------------------------------------------------------------------------
# differentially-private histogram release — parallel composition
# ---------------------------------------------------------------------------
@q(
    "privacy_dp_histogram",
    """
    WITH lab AS (
      SELECT event_type,
             LEAST(GREATEST(CAST(round(value * 100) AS BIGINT)
                            // 10000, 0), 9) AS bucket
      FROM events WHERE value IS NOT NULL),
    cnt AS (
      SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM lab GROUP BY event_type, bucket),
    u AS (
      SELECT event_type, bucket, n,
             ('0x' || substr(md5(event_type || ':'
                                 || CAST(bucket AS VARCHAR)), 1, 8))::UBIGINT
               / 4294967296.0 - 0.5 AS v
      FROM cnt),
    nz AS (
      SELECT event_type, bucket, n,
             CAST(round(-10.0 * sign(v)
                        * ln(GREATEST(1.0 - 2.0 * abs(v), 1e-12)))
                  AS BIGINT) AS noise
      FROM u)
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket, n, noise,
           GREATEST(n + noise, 0) AS noisy_n
    FROM nz
    """,
)
def privacy_dp_histogram(spark, sf):
    """Laplace-mechanism HISTOGRAM release — value deciles ($0-100
    bands, clamped) per event type, each cell's count perturbed
    independently — the release shape privacy_dp_count's scalar
    can't cover, and the one where DP's PARALLEL COMPOSITION
    theorem earns its keep: the cells partition the rows, so every
    cell can spend the full epsilon (b = 1/eps = 10) instead of
    splitting it — the whole histogram costs the same privacy
    budget as one count. The noise draw is md5-derived from the
    CELL key (engine/run/partitioning-invariant, the dp_count
    discipline), the inverse-CDF ln is clamped in identical
    expression order, and the release clips at 0. The bucket edges
    are data-independent literals — a data-dependent binning (e.g.
    quantile edges) would itself leak and need its own budget.
    One map-side-combinable agg; noise is per-group scalar
    arithmetic behind it."""
    lab = t(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "event_type",
        F.least(
            F.greatest(
                F.expr(
                    "CAST(round(value * 100) AS BIGINT) div 10000"
                ),
                F.lit(0),
            ),
            F.lit(9),
        ).alias("bucket"),
    )
    cnt = lab.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    v = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_type"),
                        F.lit(":"),
                        F.col("bucket").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
        - F.lit(0.5)
    )
    noise = F.round(
        F.lit(-10.0)
        * F.signum(v)
        * F.log(
            F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(v), F.lit(1e-12))
        )
    ).cast("long")
    return cnt.select(
        "event_type",
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        noise.alias("noise"),
    ).select(
        "event_type",
        "bucket",
        "n",
        "noise",
        F.greatest(F.col("n") + F.col("noise"), F.lit(0)).alias("noisy_n"),
    )


# ---------------------------------------------------------------------------
# delta + zigzag varint encoding census — timeline compressibility
# ---------------------------------------------------------------------------
@q(
    "encode_delta",
    """
    WITH ev AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    d AS (
      SELECT us - LAG(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS delta
      FROM ev),
    z AS (SELECT COALESCE(2 * delta, 0) AS zz,
                 delta IS NULL AS is_first
          FROM d),
    b AS (
      SELECT is_first,
             CASE WHEN is_first THEN 9
                  WHEN zz < 128 THEN 1
                  WHEN zz < 16384 THEN 2
                  WHEN zz < 2097152 THEN 3
                  WHEN zz < 268435456 THEN 4
                  WHEN zz < 34359738368 THEN 5
                  WHEN zz < 4398046511104 THEN 6
                  WHEN zz < 562949953421312 THEN 7
                  WHEN zz < 72057594037927936 THEN 8
                  ELSE 9 END AS nb
      FROM z)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(8 * COUNT(*) AS BIGINT) AS raw_bytes,
           CAST(SUM(nb) AS BIGINT) AS delta_bytes,
           CASE WHEN COUNT(*) = 0 THEN NULL
                ELSE round(SUM(nb) * 1.0 / (8 * COUNT(*)), 6) + 0
           END AS ratio
    FROM b
    """,
)
def encode_delta(spark, sf):
    """Delta + zigzag-varint encoding census of the per-user event
    timelines — the sizing study behind every time-series columnar
    layout (timestamps sorted within a stream delta down to
    inter-arrival gaps; varint spends bytes proportional to
    log(gap), so the census says what a stream-ordered rewrite of
    the 100-TB event log would actually save — the encode_rle /
    encode_dict companion for the TIME column). Per-user deltas via
    one LAG window over the (us, event_id) total order; each
    stream's first event is charged the full 9-byte varint of an
    epoch-us; zigzag halves to 2*delta because within-stream deltas
    are non-negative by construction. The byte cost is a pure
    integer CASE ladder on 128^k literals — no float touches the
    size accounting, so the census is an exact BIGINT agg; the
    ratio is one guarded division. Scale shape: the window sorts
    many small per-user runs (high-cardinality key), then ONE
    map-side-combinable singleton rollup."""
    ev = t(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = ev.select((F.col("us") - F.lag("us").over(w)).alias("delta"))
    z = d.select(
        F.coalesce(2 * F.col("delta"), F.lit(0)).alias("zz"),
        F.col("delta").isNull().alias("is_first"),
    )
    zz = F.col("zz")
    nb = (
        F.when(F.col("is_first"), 9)
        .when(zz < 128, 1)
        .when(zz < 16384, 2)
        .when(zz < 2097152, 3)
        .when(zz < 268435456, 4)
        .when(zz < 34359738368, 5)
        .when(zz < 4398046511104, 6)
        .when(zz < 562949953421312, 7)
        .when(zz < 72057594037927936, 8)
        .otherwise(9)
    )
    b = z.select(nb.alias("nb"))
    return b.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (8 * F.count(F.lit(1))).cast("long").alias("raw_bytes"),
        F.sum("nb").cast("long").alias("delta_bytes"),
        F.when(F.count(F.lit(1)) == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sum("nb") * F.lit(1.0) / (8 * F.count(F.lit(1))), 6
            )
            + F.lit(0.0)
        )
        .alias("ratio"),
    )


# ---------------------------------------------------------------------------
# per-entity trend — grouped OLS slope as a feature column
# ---------------------------------------------------------------------------
@q(
    "feat_trend",
    """
    WITH pts AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
            AND user_id IS NOT NULL),
    m AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY user_id)
    SELECT user_id, n,
           CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN NULL
                ELSE round((n * sxy - sx * sy) * 1.0
                           / (n * sxx - sx * sx), 6) + 0
           END AS slope_cents_per_day,
           CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN NULL
                ELSE round((sy * 1.0 - (n * sxy - sx * sy) * 1.0
                                       / (n * sxx - sx * sx) * sx)
                           / n, 6) + 0
           END AS intercept_cents
    FROM m
    """,
)
def feat_trend(spark, sf):
    """Per-entity OLS trend: each user's spend regressed on the
    calendar day, emitted as (slope, intercept) feature columns —
    the GROUPED regression the global stat_regression can't give
    you (one REGR_SLOPE over the corpus says the fleet trend; churn
    and LTV models need the trend PER USER, a classic
    feature-engineering op and the textbook case for map-side
    moment aggregation: five exact BIGINT moments per user, one
    exchange on the grouping key, then pure per-row arithmetic —
    never a per-user sort, never a window). Slope and intercept are
    single identical float expressions over the exact moments
    (cross-multiplied, the events_autocorr discipline), with the
    degenerate cases (singleton user, all events one day) guarded
    to NULL on both engines."""
    pts = t(spark, sf, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        .cast("long")
        .alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    m = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (
        F.col("n"),
        F.col("sx"),
        F.col("sy"),
        F.col("sxy"),
        F.col("sxx"),
    )
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) * F.lit(1.0) / den
    bad = (n < 2) | (den == 0)
    return m.select(
        "user_id",
        "n",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(slope, 6) + F.lit(0.0))
        .alias("slope_cents_per_day"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round((sy * F.lit(1.0) - slope * sx) / n, 6) + F.lit(0.0)
        )
        .alias("intercept_cents"),
    )


# ---------------------------------------------------------------------------
# randomized response — LOCAL differential privacy with debiasing
# ---------------------------------------------------------------------------
@q(
    "privacy_randomized_response",
    """
    WITH lab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             substr(md5('rr:' || CAST(event_id AS VARCHAR)), 1, 2) AS coin
      FROM events),
    resp AS (
      SELECT CASE WHEN coin < '40' THEN 1 - y
                  ELSE y END AS r,
             y
      FROM lab),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r) AS BIGINT) AS n_yes,
             CAST(SUM(y) AS BIGINT) AS n_true
      FROM resp)
    SELECT n, n_yes,
           CASE WHEN n = 0 THEN NULL
                ELSE round((n_yes * 1.0 / n - 0.25) / 0.5, 6) + 0
           END AS p_debiased,
           CASE WHEN n = 0 THEN NULL
                ELSE round(n_true * 1.0 / n, 6) + 0
           END AS p_true
    FROM m
    """,
)
def privacy_randomized_response(spark, sf):
    """Randomized response — LOCAL differential privacy, the
    opposite trust model from privacy_dp_count/histogram (central
    DP: a trusted aggregator adds noise to the RELEASE; local DP:
    each ROW lies before it ever leaves the client, so no honest
    aggregator is required): with probability q = 0.25 the label is
    flipped (md5 two-hex coin: '00'..'3f' is exactly 64/256), so a
    reported yes proves nothing about any individual, yet the
    population rate debiases exactly as (p_obs - q)/(1 - 2q). The
    flip coin is md5-derived PER ROW (engine/partitioning-invariant,
    hash-gateable — a production deployment uses client-side
    CSPRNGs and drops p_true, kept here so the gate pins both the
    mechanism and the debias arithmetic against the ground truth).
    Map-only transform, one singleton fold — the survey-scale shape
    at any corpus size."""
    lab = t(spark, sf, "events").select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.substring(
            F.md5(F.concat(F.lit("rr:"), F.col("event_id").cast("string"))),
            1,
            2,
        ).alias("coin"),
    )
    resp = lab.select(
        F.when(F.col("coin") < "40", 1 - F.col("y"))
        .otherwise(F.col("y"))
        .alias("r"),
        "y",
    )
    m = resp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("n_yes"),
        F.sum("y").cast("long").alias("n_true"),
    )
    n = F.col("n")
    return m.select(
        "n",
        "n_yes",
        F.when(n == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("n_yes") * F.lit(1.0) / n - F.lit(0.25)) / F.lit(0.5),
                6,
            )
            + F.lit(0.0)
        )
        .alias("p_debiased"),
        F.when(n == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("n_true") * F.lit(1.0) / n, 6) + F.lit(0.0)
        )
        .alias("p_true"),
    )


# ---------------------------------------------------------------------------
# small-cell suppression with complementary suppression
# ---------------------------------------------------------------------------
_SUPPRESS_K = 10


@q(
    "privacy_suppress",
    f"""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source),
    w AS (
      SELECT lang, source, n,
             n < {_SUPPRESS_K} AS primary_sup,
             SUM(CASE WHEN n < {_SUPPRESS_K} THEN 1 ELSE 0 END)
               OVER (PARTITION BY lang) AS n_primary,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CASE WHEN n < {_SUPPRESS_K} THEN 1 ELSE 0 END,
                        n, source) AS rnk
      FROM cells)
    SELECT lang, source,
           CASE WHEN primary_sup OR (n_primary = 1 AND rnk = 1)
                THEN NULL ELSE n END AS released,
           CASE WHEN primary_sup THEN 'primary'
                WHEN n_primary = 1 AND rnk = 1 THEN 'complementary'
           END AS suppressed
    FROM w
    """,
)
def privacy_suppress(spark, sf):
    """Small-cell suppression with COMPLEMENTARY suppression — the
    disclosure-control release privacy_kanon only audits: cells
    under k = 10 are primarily suppressed, and — the part naive
    implementations skip — when a language row has EXACTLY ONE
    suppressed cell, publishing every other cell alongside the row
    total lets anyone reconstruct it by subtraction, so the
    smallest surviving cell is suppressed too (deterministic pick:
    (n, source) order — statistical agencies' standard secondary
    suppression, here one round for the one-total case; full
    multi-marginal suppression is an optimization problem out of
    scope and documented as such). Both suppression decisions ride
    windows over the |cells|-sized relation (the marginals-as-
    windows rule); the release column NULLs rather than drops
    suppressed cells, so the output schema is stable and the
    suppression PATTERN is itself published — as the method
    requires (the pattern is safe; the values are not)."""
    cells = t(spark, sf, "documents").groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    k = _SUPPRESS_K
    primary = F.col("n") < k
    wl = Window.partitionBy("lang")
    wr = Window.partitionBy("lang").orderBy(
        F.when(F.col("n") < k, 1).otherwise(0), "n", "source"
    )
    w = cells.select(
        "lang",
        "source",
        "n",
        primary.alias("primary_sup"),
        F.sum(F.when(primary, 1).otherwise(0)).over(wl).alias("n_primary"),
        F.row_number().over(wr).alias("rnk"),
    )
    comp = (F.col("n_primary") == 1) & (F.col("rnk") == 1)
    return w.select(
        "lang",
        "source",
        F.when(F.col("primary_sup") | comp, F.lit(None).cast("long"))
        .otherwise(F.col("n"))
        .alias("released"),
        F.when(F.col("primary_sup"), "primary")
        .when(comp, "complementary")
        .alias("suppressed"),
    )


# ---------------------------------------------------------------------------
# wave 114: exponential-mechanism top-k — Gumbel-noise argmax release
# ---------------------------------------------------------------------------
@q(
    "privacy_dp_topk",
    """
    WITH cnt AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type),
    u AS (
      SELECT event_type, n,
             (('0x' || substr(md5('dptopk:' || event_type), 1, 8))
                ::UBIGINT + 1) / 4294967298.0 AS v
      FROM cnt),
    nz AS (
      SELECT event_type, n,
             CAST(round(1000000.0
                        * (n + 2.0 * (-ln(-ln(v))))) AS BIGINT)
               AS noisy_mic
      FROM u),
    rk AS (
      SELECT event_type, noisy_mic,
             ROW_NUMBER() OVER (ORDER BY noisy_mic DESC, event_type)
               AS rnk
      FROM nz)
    SELECT CAST(rnk AS BIGINT) AS rnk, event_type, noisy_mic
    FROM rk WHERE rnk <= 3
    """,
)
def privacy_dp_topk(spark, sf):
    """Differentially private TOP-K — the exponential mechanism via
    the Gumbel-max trick: adding Gumbel(2*Delta/eps) noise to each
    candidate's utility (its count; Delta = 1, eps split across the
    k peeled maxima -> scale 2/eps_total with eps_total = 1) and
    taking the argmax IS an exponential-mechanism draw, and taking
    the top-k in one shot equals k sequential peeled draws — the
    'which categories dominate' release privacy_dp_histogram's
    per-cell Laplace can't answer without paying for EVERY cell.
    True counts are NOT in the output (the selection, not the
    measure, is the release — add a Laplace count face per selected
    key if magnitudes are needed). The Gumbel draw is md5-derived
    from the candidate key (engine/run/partitioning-invariant, the
    dp_histogram discipline), u is shifted off {0,1} by (h+1)/(2^32
    + 2) so neither ln can hit its pole, and the noisy score is
    micros-quantized BEFORE ranking with the key as tiebreak, so
    the released ranking is bit-identical across engines. Scale
    shape: one corpus scan to the per-category counts; the window
    ranks a category-bounded relation."""
    cnt = t(spark, sf, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    u = cnt.select(
        "event_type",
        "n",
        (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("dptopk:"), F.col("event_type")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                + F.lit(1)
            )
            / F.lit(4294967298.0)
        ).alias("v"),
    )
    nz = u.select(
        "event_type",
        F.round(
            F.lit(1000000.0)
            * (F.col("n") + F.lit(2.0) * (-F.log(-F.log(F.col("v")))))
        )
        .cast("long")
        .alias("noisy_mic"),
    )
    w = Window.orderBy(F.desc("noisy_mic"), F.col("event_type"))
    rk = nz.select(
        "event_type",
        "noisy_mic",
        F.row_number().over(w).alias("rnk"),
    )
    return rk.filter(F.col("rnk") <= 3).select(
        F.col("rnk").cast("long").alias("rnk"),
        "event_type",
        "noisy_mic",
    )


# ---------------------------------------------------------------------------
# wave 124: systematic sampling — every k-th row of the md5 order
# ---------------------------------------------------------------------------
@q(
    "sample_systematic",
    """
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (ORDER BY md5('sys:'
               || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM r WHERE rn % 10 = 1 GROUP BY lang
    """,
)
def sample_systematic(spark, sf):
    """Systematic 1-in-10 sampling — every 10th row of the
    md5-shuffled order, the third deterministic sampling face
    (sample_balanced draws per-class quotas, sample_weighted draws
    by weight; systematic is the 'thin the corpus to exactly 10%,
    reproducibly, with zero RNG state' tool a dataset-ablation run
    wants): hashing the key gives a pseudo-random permutation, the
    stride guarantees the EXACT sample fraction (rank-threshold
    sampling only hits it in expectation), and the id-sum pins set
    membership, not just counts. The md5 order carries doc_id as
    tiebreak so the permutation is total (hash collisions would
    otherwise make rank engine-dependent). Scale note: the global
    ROW_NUMBER is the documented single-partition cost — production
    runs the stride per shard with collected offset literals (the
    abc_classification exclusive-prefix-sum pattern), which
    preserves exactness; the per-lang kept counts converge to 10%
    of each class only in expectation — systematic is NOT
    stratified, which is exactly why sample_balanced also exists."""
    r = t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.row_number()
        .over(
            Window.orderBy(
                F.md5(
                    F.concat(
                        F.lit("sys:"), F.col("doc_id").cast("string")
                    )
                ),
                "doc_id",
            )
        )
        .alias("rn"),
    )
    return (
        r.filter(F.col("rn") % 10 == 1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# wave 145: differentially private clamped mean (Laplace, noisy sum/count)
# ---------------------------------------------------------------------------
@q(
    "privacy_dp_mean",
    """
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(LEAST(GREATEST(
               CAST(round(value * 100) AS BIGINT), 0), 10000)), 0)
               AS BIGINT) AS s_c
      FROM events WHERE value IS NOT NULL),
    u AS (
      SELECT n, s_c,
             (('0x' || substr(md5('dpmean:sum'), 1, 8))
                ::UBIGINT + 1) / 4294967298.0 AS u1,
             (('0x' || substr(md5('dpmean:cnt'), 1, 8))
                ::UBIGINT + 1) / 4294967298.0 AS u2
      FROM base),
    nz AS (
      SELECT n, s_c,
             CAST(round(1000000.0 * (s_c / 100.0
               + 200.0 * (-(CASE WHEN u1 >= 0.5 THEN 1.0
                                 ELSE -1.0 END)
                          * ln(1.0 - 2.0 * abs(u1 - 0.5)))))
               AS BIGINT) AS noisy_sum_mic,
             CAST(round(1000000.0 * (n
               + 2.0 * (-(CASE WHEN u2 >= 0.5 THEN 1.0
                          ELSE -1.0 END)
                        * ln(1.0 - 2.0 * abs(u2 - 0.5)))))
               AS BIGINT) AS noisy_cnt_mic
      FROM u)
    SELECT noisy_sum_mic, noisy_cnt_mic,
           CASE WHEN noisy_cnt_mic <= 0 THEN NULL
                ELSE round(CAST(noisy_sum_mic AS DOUBLE)
                           / noisy_cnt_mic, 6) + 0
           END AS dp_mean
    FROM nz
    """,
)
def privacy_dp_mean(spark, sf):
    """Differentially private mean event value — the noisy-sum /
    noisy-count Laplace estimator (eps = 1 split 0.5 + 0.5):
    values clamp to [0, 100] dollars so the sum's sensitivity is
    the clamp bound C (b_sum = C/eps_1 = 200), the count's is 1
    (b_cnt = 2), and the release is their ratio — the composition
    pattern every DP aggregate library (SmartNoise, PipelineDP)
    ships as its mean primitive, and the one privacy_dp_count and
    privacy_dp_histogram cannot express because the denominator
    itself must be noisy. The Laplace draws are md5-derived from
    fixed release seeds via the inverse CDF
    -b*sign(u-1/2)*ln(1-2|u-1/2|), u shifted off the pole by
    (h+1)/(2^32+2) (the privacy_dp_topk discipline; a per-release
    seed is the deterministic replay of 'fresh noise per release'
    — rerunning the SAME release must NOT spend fresh budget).
    Both noisy terms micros-quantize BEFORE the division so the
    released ratio is bit-identical across engines; the true n and
    sum do NOT appear in the output. The clamped sum is an exact
    integer-cents aggregate — one corpus scan, map-side
    combinable, no shuffle beyond the 1-row agg."""
    base = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(
                F.sum(
                    F.least(
                        F.greatest(
                            F.round(F.col("value") * 100).cast(
                                "long"
                            ),
                            F.lit(0),
                        ),
                        F.lit(10000),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("s_c"),
        )
    )

    def _u(seed):
        return (
            F.conv(F.substring(F.md5(F.lit(seed)), 1, 8), 16, 10)
            .cast("long")
            + F.lit(1)
        ) / F.lit(4294967298.0)

    u1, u2 = _u("dpmean:sum"), _u("dpmean:cnt")
    lap1 = -(
        F.when(u1 >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    ) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u1 - F.lit(0.5)))
    lap2 = -(
        F.when(u2 >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    ) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u2 - F.lit(0.5)))
    nz = base.select(
        F.round(
            F.lit(1000000.0)
            * (F.col("s_c") / F.lit(100.0) + F.lit(200.0) * lap1)
        )
        .cast("long")
        .alias("noisy_sum_mic"),
        F.round(
            F.lit(1000000.0) * (F.col("n") + F.lit(2.0) * lap2)
        )
        .cast("long")
        .alias("noisy_cnt_mic"),
    )
    return nz.select(
        "noisy_sum_mic",
        "noisy_cnt_mic",
        F.when(
            F.col("noisy_cnt_mic") <= 0, F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                F.col("noisy_sum_mic").cast("double")
                / F.col("noisy_cnt_mic"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("dp_mean"),
    )


# ---------------------------------------------------------------------------
# wave 153: DP median via the exponential mechanism on the value support
# ---------------------------------------------------------------------------
@q(
    "privacy_dp_quantile",
    """
    WITH sup AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    cw AS (
      SELECT v, c,
             CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
             CAST(SUM(c) OVER () AS BIGINT) AS n
      FROM sup),
    sc AS (
      SELECT v, n,
             -abs(2 * cum - c - n) AS util,
             (('0x' || substr(md5('dpq:' || CAST(v AS VARCHAR)), 1, 8))
                ::UBIGINT + 1) / 4294967298.0 AS u
      FROM cw),
    nz AS (
      SELECT v, n,
             CAST(round(1000000.0
                        * (util / 2.0 + 2.0 * (-ln(-ln(u)))))
               AS BIGINT) AS noisy_mic
      FROM sc),
    rk AS (
      SELECT v, n, noisy_mic,
             ROW_NUMBER() OVER (ORDER BY noisy_mic DESC, v) AS rnk
      FROM nz)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(v AS BIGINT) AS released_median_cents,
           noisy_mic
    FROM rk WHERE rnk = 1
    """,
)
def privacy_dp_quantile(spark, sf):
    """Differentially private MEDIAN via the exponential mechanism —
    the selection-typed release privacy_dp_mean's Laplace sum/count
    cannot provide (a noisy mean is dragged arbitrarily far by one
    outlier; the exponential-mechanism median has sensitivity-1
    utility and needs NO clamping bound): each candidate value v in
    the support scores util(v) = -|#less(v) - #greater(v)| =
    -|2*cum - c - n| (0 at the exact median, falling by at most 2
    per neighboring record -> Delta_u = 2... spelled with the
    utility HALVED into util/2, scale 2/eps with eps = 1), and the
    Gumbel-max trick turns the draw into an argmax over
    noisy = util/2 + 2*Gumbel — privacy_dp_topk's machinery with a
    QUANTILE utility instead of a count. Noise is md5-derived per
    candidate value, u shifted off the poles, the noisy score
    micros-quantized BEFORE the argmax with v as tiebreak, so the
    release is bit-identical across engines. True counts never
    appear in the output (n is public corpus size). The replay test
    pins the release within the central mass of the distribution
    (the mechanism concentrates exponentially around the true
    median). One scan to the support, one window chain, one
    argmax."""
    sup = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.round(F.col("value") * 100).cast("long").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cw = sup.select(
        "v",
        "c",
        F.sum("c").over(Window.orderBy("v")).cast("long").alias("cum"),
        F.sum("c").over(Window.partitionBy()).cast("long").alias("n"),
    )
    util = -F.abs(2 * F.col("cum") - F.col("c") - F.col("n"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dpq:"), F.col("v").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ) / F.lit(4294967298.0)
    nz = cw.select(
        "v",
        "n",
        F.round(
            F.lit(1000000.0)
            * (
                util.cast("double") / F.lit(2.0)
                + F.lit(2.0) * (-F.log(-F.log(u)))
            )
        )
        .cast("long")
        .alias("noisy_mic"),
    )
    w = Window.orderBy(F.desc("noisy_mic"), F.col("v"))
    return (
        nz.select(
            "v",
            "n",
            "noisy_mic",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") == 1)
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("v").cast("long").alias("released_median_cents"),
            "noisy_mic",
        )
    )


# ---------------------------------------------------------------------------
# wave 163: Neyman optimal stratified allocation
# ---------------------------------------------------------------------------
@q(
    "sample_neyman",
    """
    WITH h AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS s1,
             CAST(COALESCE(SUM(n_chars * n_chars), 0) AS BIGINT)
               AS s2
      FROM documents GROUP BY lang),
    w AS (
      SELECT lang, n,
             CASE WHEN n < 2
                       OR CAST(n AS DOUBLE) * s2
                          - CAST(s1 AS DOUBLE) * s1 <= 0 THEN 0
                  ELSE CAST(round(1000000.0 * n
                         * sqrt((CAST(n AS DOUBLE) * s2
                                 - CAST(s1 AS DOUBLE) * s1)
                                / (CAST(n AS DOUBLE) * (n - 1))))
                       AS BIGINT)
             END AS w_mic
      FROM h),
    t AS (
      SELECT lang, n, w_mic,
             CAST(SUM(w_mic) OVER () AS BIGINT) AS tot_w
      FROM w),
    q AS (
      SELECT lang, n, w_mic,
             CASE WHEN tot_w = 0 THEN 0
                  ELSE CAST((200 * w_mic) // tot_w AS BIGINT)
             END AS base,
             CASE WHEN tot_w = 0 THEN 0
                  ELSE CAST((200 * w_mic) % tot_w AS BIGINT)
             END AS rem,
             tot_w
      FROM t),
    rk AS (
      SELECT lang, n, w_mic, base, tot_w,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rnk,
             CAST(200 - SUM(base) OVER () AS BIGINT) AS leftover
      FROM q)
    SELECT lang, n, w_mic,
           CAST(base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM rk ORDER BY lang
    """,
)
def sample_neyman(spark, sf):
    """Neyman OPTIMAL stratified allocation of a 200-document
    budget — sample_allocate's Hamilton machinery with the optimal
    weight N_h * S_h instead of plain N_h (proportional allocation
    minimizes nothing; Neyman minimizes the stratified-mean
    variance by oversampling strata that are BOTH big and
    internally heterogeneous — a high-variance language shard
    deserves more eval labels than an equally large homogeneous
    one). S_h is the exact-sample-variance sqrt from cross-
    multiplied BIGINT character moments, and the weight
    micros-quantizes (round(1e6 * n * S)) BEFORE apportionment so
    the largest-remainder arithmetic — integer div/mod on the
    quantized weights, leftover to the biggest remainders,
    (rem DESC, lang) tiebreak — is exact and engine-identical all
    the way down (float weights would make the quota boundary a
    ulp lottery). Degenerate strata (n < 2 or zero variance) get
    weight 0 rather than NULL so the budget still sums. Pinned:
    sum(quota) == 200 exactly; a fabricated two-strata battery in
    the test shows Neyman and Hamilton genuinely disagree. One
    scan, strata-sized everything."""
    h = t(spark, sf, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("n_chars"), F.lit(0))
        .cast("long")
        .alias("s1"),
        F.coalesce(
            F.sum(F.col("n_chars") * F.col("n_chars")), F.lit(0)
        )
        .cast("long")
        .alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    var_num = n.cast("double") * s2 - s1.cast("double") * s1
    w = h.select(
        "lang",
        "n",
        F.when((n < 2) | (var_num <= 0), F.lit(0))
        .otherwise(
            F.round(
                F.lit(1000000.0)
                * n
                * F.sqrt(var_num / (n.cast("double") * (n - 1)))
            ).cast("long")
        )
        .cast("long")
        .alias("w_mic"),
    )
    wall = Window.partitionBy()
    tq = w.select(
        "lang",
        "n",
        "w_mic",
        F.sum("w_mic").over(wall).cast("long").alias("tot_w"),
    )
    q = tq.select(
        "lang",
        "n",
        "w_mic",
        F.when(F.col("tot_w") == 0, F.lit(0))
        .otherwise(F.expr("(200 * w_mic) div tot_w"))
        .cast("long")
        .alias("base"),
        F.when(F.col("tot_w") == 0, F.lit(0))
        .otherwise((200 * F.col("w_mic")) % F.col("tot_w"))
        .cast("long")
        .alias("rem"),
    )
    rk = q.select(
        "lang",
        "n",
        "w_mic",
        "base",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), "lang"))
        .alias("rnk"),
        (F.lit(200) - F.sum("base").over(wall))
        .cast("long")
        .alias("leftover"),
    )
    return rk.select(
        "lang",
        "n",
        "w_mic",
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    ).orderBy("lang")
