"""Sketch- and selection-algorithm faces (round-4 wave 28): the
bounded-memory summary structures and multi-pass selection algorithms
a 100-TB engine runs INSTEAD of exact global sorts and unbounded
hash tables — a count-min sketch whose cells are deterministic enough
to carry an exact SQL twin, a bloom-bitmap runtime pre-filter in
front of an exact semi-join, the classic two-pass histogram selection
for exact grouped medians without a global sort, bounded-degree
4-cycle counting on the co-occurrence graph, and a Heaps'-law
vocabulary-growth fit built from first-occurrence reductions instead
of running distincts.

Conventions are the sibling modules': md5-based hashing wherever both
engines must agree bit-for-bit (the feat_hashing / sample_hash
portability precedent — Spark ``conv(hex,16,10)``, DuckDB
``('0x'||hex)::UBIGINT``), float math in the SAME operation order on
both sides, final floats rounded to 6 with the ``+ 0`` IEEE -0.0
guard, integer division spelled ``DIV`` / ``//``, and every unbounded
relation aggregated map-side before it ever reaches a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

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
# count-min sketch — deterministic md5 rows, exact SQL twin
# ---------------------------------------------------------------------------
_CM_D = 4  # hash rows
_CM_W = 1024  # counters per row


def _cm_bucket_spark(tk_col, j_col):
    """Row-j counter index for a token: md5 32-bit prefix of
    ``tk#j`` mod the row width — the one hash family both engines
    (and any future engine) evaluate identically."""
    return (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", tk_col, j_col.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(_CM_W),
        )
        .cast("long")
        .alias("bucket")
    )


_CM_BUCKET_SQL = (
    "CAST(('0x' || substr(md5({tk} || '#' || CAST({j} AS VARCHAR)), 1, 8))"
    f"::UBIGINT % {_CM_W} AS BIGINT)"
)


@q(
    "agg_countmin",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    cnt AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok WHERE tk <> '' GROUP BY tk),
    js AS (SELECT unnest(generate_series(0, {_CM_D - 1})) AS j),
    cells AS (
      SELECT js.j, {_CM_BUCKET_SQL.format(tk='cnt.tk', j='js.j')} AS bucket,
             CAST(SUM(cnt.c) AS BIGINT) AS cell
      FROM cnt CROSS JOIN js
      GROUP BY 1, 2),
    tp AS (
      SELECT tk, c, ROW_NUMBER() OVER (ORDER BY c DESC, tk) AS rnk
      FROM cnt QUALIFY rnk <= 20),
    est AS (
      SELECT tp.tk, tp.c, MIN(cells.cell) AS est
      FROM tp CROSS JOIN js
      JOIN cells
        ON cells.j = js.j
       AND cells.bucket = {_CM_BUCKET_SQL.format(tk='tp.tk', j='js.j')}
      GROUP BY tp.tk, tp.c)
    SELECT tk, c AS true_cnt, CAST(est AS BIGINT) AS cm_est,
           CAST(est - c AS BIGINT) AS overcount
    FROM est
    """,
)
def agg_countmin(spark, sf):
    """Count-min sketch (Cormode & Muthukrishnan) over the corpus
    vocabulary, validated against true counts for the top-20 heavy
    hitters: each token hashes into one counter per row (d=4 rows,
    w=1024 counters) and the estimate is the MIN over its cells — an
    overestimate by construction, so ``overcount >= 0`` always. This
    is THE bounded-memory frequency structure at 100 TB: the sketch
    is d*w = 4096 cells regardless of vocabulary size, cell merges
    are associative sums (map-side combinable, stream-mergeable
    across executors), and point queries never touch the corpus.
    Engine parity: the hash family is md5-prefix mod w (deterministic
    in both engines — the feat_hashing precedent), so the sketch
    cells — and therefore the estimates — are EXACTLY reproducible in
    SQL; no other engine pair could gate a sketch this way. Scale
    shape: cells are built from the per-token count relation (vocab-
    sized, already map-side combined), fanned out x4 — never from the
    corpus-sized token stream — and the estimate join touches only
    20 x 4 cells."""
    d = t(spark, sf, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
        .groupBy("tk")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    js = F.array(*[F.lit(j) for j in range(_CM_D)])
    cells = (
        cnt.select("tk", "c", F.explode(js).alias("j"))
        .select("j", _cm_bucket_spark(F.col("tk"), F.col("j")), "c")
        .groupBy("j", "bucket")
        .agg(F.sum("c").cast("long").alias("cell"))
    )
    top = cnt.orderBy(F.desc("c"), "tk").limit(20)
    probes = top.select("tk", "c", F.explode(js).alias("j")).select(
        "tk", "c", "j", _cm_bucket_spark(F.col("tk"), F.col("j"))
    )
    return (
        probes.join(cells, ["j", "bucket"])
        .groupBy("tk", "c")
        .agg(F.min("cell").alias("est"))
        .select(
            "tk",
            F.col("c").alias("true_cnt"),
            F.col("est").cast("long").alias("cm_est"),
            (F.col("est") - F.col("c")).cast("long").alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# linear counting — deterministic cardinality sketch with an exact twin
# ---------------------------------------------------------------------------
_LC_M = 1024


@q(
    "agg_lincount",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    s AS (
      SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS true_distinct,
             CAST(COUNT(DISTINCT
               ('0x' || substr(md5(tk), 1, 8))::UBIGINT % {_LC_M})
               AS BIGINT) AS occupied
      FROM tok WHERE tk <> '')
    SELECT true_distinct, occupied,
           CASE WHEN occupied >= {_LC_M} THEN NULL
                ELSE round(-{_LC_M}.0
                           * ln(({_LC_M}.0 - occupied) / {_LC_M}.0), 6) + 0
           END AS lc_est,
           CASE WHEN occupied >= {_LC_M} OR true_distinct = 0 THEN NULL
                ELSE round((round(-{_LC_M}.0
                             * ln(({_LC_M}.0 - occupied) / {_LC_M}.0), 6)
                            - true_distinct)
                           / true_distinct, 6) + 0
           END AS rel_err
    FROM s
    """,
)
def agg_lincount(spark, sf):
    """Linear-counting cardinality sketch (Whang et al.) over the
    corpus vocabulary, reported NEXT TO the exact distinct count so
    the estimate's error is part of the gated answer: every token
    hashes into one of m=1024 bits, the estimate is
    -m * ln(empty/m), and occupancy is ONE map-side-combinable
    distinct-agg over a <=1024-value domain — the bounded-memory
    distinct counter for the billions-of-distinct-tokens regime
    where an exact COUNT(DISTINCT) shuffles the vocabulary. Unlike
    agg_approx_cd (Spark's HLL, rows-only gate by design), the hash
    here is md5 — deterministic in BOTH engines — so the sketch AND
    its estimate carry a full exact DuckDB twin. A saturated sketch
    (0 empty bits) yields NULL rather than ln(0); the IEEE -0.0 of
    an empty corpus (ln(1)) is normalized by the round+0 guard."""
    d = t(spark, sf, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("tk")).filter(
        F.col("tk") != ""
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("tk"), 1, 8), 16, 10).cast("long"),
        F.lit(_LC_M),
    )
    s = tok.agg(
        F.countDistinct("tk").cast("long").alias("true_distinct"),
        F.countDistinct(bucket).cast("long").alias("occupied"),
    )
    m = float(_LC_M)
    est_raw = -F.lit(m) * F.log(
        (F.lit(m) - F.col("occupied")) / F.lit(m)
    )
    est_r = F.round(est_raw, 6)
    sat = F.col("occupied") >= _LC_M
    return s.select(
        "true_distinct",
        "occupied",
        F.when(sat, F.lit(None).cast("double"))
        .otherwise(est_r + F.lit(0.0))
        .alias("lc_est"),
        F.when(
            sat | (F.col("true_distinct") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (est_r - F.col("true_distinct"))
                / F.col("true_distinct"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# bloom-bitmap runtime pre-filter in front of an exact semi-join
# ---------------------------------------------------------------------------
_BLOOM_M = 4096  # bits
_BLOOM_K = 2  # hash functions


def _bloom_pos_sql(key_sql: str, i: int) -> str:
    """Bit position i for a key — Spark-SQL expression string."""
    return (
        f"pmod(cast(conv(substring(md5(concat_ws('#', "
        f"cast({key_sql} as string), '{i}')), 1, 8), 16, 10) as bigint), "
        f"{_BLOOM_M})"
    )


@q(
    "join_bloom",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(round(SUM(o_totalprice) * 100) AS BIGINT) AS total_cents
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
)
def join_bloom(spark, sf):
    """Runtime bloom-filter join: the dimension side (BUILDING-segment
    customers) is compressed into a 4096-bit bloom bitmap (k=2 md5
    hashes), the bitmap ships to every fact task as a 64-word array
    LITERAL, and a map-side bit-test pre-filter drops the vast
    majority of non-matching fact rows BEFORE the exact left-semi
    join removes the residual false positives — so the final answer
    is exactly the plain semi-join (the oracle), bloom-transparent.
    This is the runtime-filter pattern every warehouse engine applies
    at scale: at 10^12 fact rows the pre-filter cuts shuffle/probe
    volume by the dim selectivity at the cost of 64 longs per task,
    and because FPs are removed by the exact join the bitmap can stay
    tiny. The bitmap build collects at most 64 (word, mask) rows to
    the driver — bounded by m, never by data (the kmeans
    centroid-literal precedent). Scale shape: Filter sits directly on
    the fact scan (below the join), the semi-join side is the
    filtered dim, and the final agg is map-side combinable."""
    c = t(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    dim = c.select("c_custkey")
    pos_cols = [
        F.expr(_bloom_pos_sql("c_custkey", i)) for i in range(_BLOOM_K)
    ]
    words = (
        dim.select(F.explode(F.array(*pos_cols)).alias("p"))
        .select(
            F.expr("cast(p div 64 as int)").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("m"))
        .collect()
    )
    mask = [0] * (_BLOOM_M // 64)
    for r in words:
        mask[r["w"]] = r["m"]
    mask_sql = "array(" + ",".join(f"{v}L" for v in mask) + ")"

    def hit(i: int):
        p = _bloom_pos_sql("o_custkey", i)
        return F.expr(
            f"(shiftrightunsigned(element_at({mask_sql}, "
            f"cast(({p}) div 64 as int) + 1), "
            f"cast(({p}) % 64 as int)) & 1) = 1"
        )

    o = t(spark, sf, "orders")
    pref = o
    for i in range(_BLOOM_K):
        pref = pref.filter(hit(i))
    exact = pref.join(
        dim, pref["o_custkey"] == dim["c_custkey"], "left_semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        cents(F.sum("o_totalprice")).alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# exact grouped median via two-pass histogram selection — no global sort
# ---------------------------------------------------------------------------
_Q2_BUCKET = 100_000  # cents per histogram bucket (~$1000)


@q(
    "quantile_2pass",
    """
    WITH v AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem),
    r AS (
      SELECT g, c, ROW_NUMBER() OVER (PARTITION BY g ORDER BY c) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM v)
    SELECT g AS l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN c ELSE 0 END)
              + SUM(CASE WHEN rn = n // 2 + 1 THEN c ELSE 0 END)
              AS BIGINT) AS median_cents_x2
    FROM r GROUP BY g
    """,
)
def quantile_2pass(spark, sf):
    """Exact grouped median WITHOUT a global sort — the classic
    two-pass histogram selection every distributed engine uses when
    an exact quantile is required at scale. Pass 1 histograms the
    cents values into ~$1000 buckets (a bounded, map-side-combinable
    agg; the cumulative window runs over <=~120 bucket rows per
    group, never over data). The bucket containing each target rank
    (lower and upper middle) is located arithmetically; pass 2
    re-scans ONLY the rows of those target buckets (a broadcast
    semi-filter on (group, bucket)) and ranks within them — each
    bucket holds ~1/B of a group, and production recurses if a
    bucket is still large. Because buckets partition the VALUE
    domain, the r-th smallest within the target bucket IS the global
    k-th order statistic, and ties cannot straddle a bucket edge.
    The oracle is the naive full-sort ROW_NUMBER form — same multiset
    order statistic, so tie order is irrelevant. Output is the exact
    integer ``lower_middle + upper_middle`` (x2 median) so even-n
    groups stay in BIGINT — no float averaging to drift."""
    li = t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        cents(F.col("l_extendedprice")).alias("c"),
    )
    b = li.withColumn(
        "bkt", F.expr(f"c div {_Q2_BUCKET}").cast("long")
    )
    h = b.groupBy("g", "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("g")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = h.groupBy("g").agg(F.sum("cnt").alias("n"))
    h2 = h.withColumn(
        "cb", F.coalesce(F.sum("cnt").over(wcum), F.lit(0))
    ).join(n, "g")
    k_lo = F.expr("(n + 1) div 2")
    k_hi = F.expr("n div 2 + 1")
    targets = None
    for k in (k_lo, k_hi):
        part = h2.filter((F.col("cb") < k) & (F.col("cb") + F.col("cnt") >= k)).select(
            "g", "bkt", (k - F.col("cb")).alias("r")
        )
        targets = part if targets is None else targets.unionAll(part)
    # odd-n groups emit the SAME (g, bkt, r) twice — the duplicate is
    # deliberate: the matched row sums twice, giving 2 * median.
    wanted = targets.select("g", "bkt").distinct()
    pass2 = b.join(F.broadcast(wanted), ["g", "bkt"])
    wrn = Window.partitionBy("g", "bkt").orderBy("c")
    ranked = pass2.withColumn("rn", F.row_number().over(wrn))
    picked = ranked.join(
        F.broadcast(targets),
        ["g", "bkt"],
    ).filter(F.col("rn") == F.col("r"))
    med = picked.groupBy("g").agg(
        F.sum("c").cast("long").alias("median_cents_x2")
    )
    return (
        n.join(med, "g")
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("n").cast("long").alias("n_rows"),
            "median_cents_x2",
        )
    )


# ---------------------------------------------------------------------------
# 4-cycle (square) counting on the bounded-degree co-occurrence subgraph
# ---------------------------------------------------------------------------
_SQ_DEG_CAP = 64


def _kg_squares_sql() -> str:
    from .qpipe import _DOCENT_SQL, _GRAMS_SQL, _PAIRS_SQL

    return f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    e AS (SELECT uri_a AS src, uri_b AS dst FROM p
          UNION ALL SELECT uri_b, uri_a FROM p),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    e2 AS (SELECT e.src, e.dst FROM e
           JOIN deg d1 ON d1.src = e.src
           JOIN deg d2 ON d2.src = e.dst
           WHERE d1.d <= {_SQ_DEG_CAP} AND d2.d <= {_SQ_DEG_CAP}),
    w AS (SELECT a.dst AS u, b.dst AS v, COUNT(*) AS c
          FROM e2 a JOIN e2 b ON b.src = a.src AND a.dst < b.dst
          GROUP BY a.dst, b.dst)
    SELECT CAST(COALESCE(SUM(c * (c - 1)), 0) // 4 AS BIGINT) AS n_squares,
           CAST(COALESCE(SUM(c * (c - 1)), 0) // 2 AS BIGINT)
             AS n_wedge_pairs
    FROM w
    """


@q("kg_squares", _kg_squares_sql())
def kg_squares(spark, sf_dir):
    """Global 4-cycle (square) count on the co-occurrence graph — the
    bipartite-cohesion signal complementing kg_triangles (squares
    dominate triangle-free near-bipartite link structure, e.g.
    page<->template graphs in web corpora). Counted via the wedge-
    endpoint identity: for endpoints u < v with c common neighbors,
    C(c,2) unordered middle pairs each close a distinct 4-cycle, and
    every 4-cycle is seen from exactly its 2 diagonals — so
    n_squares = sum(c*(c-1))/4, all exact integers. Scale guard: the
    wedge fan-out is deg(middle)^2, so the count is restricted to the
    subgraph induced on nodes of degree <= 64 — BOTH engines apply
    the identical cap (the lsh max_bucket / jaccard df-cap
    precedent), keeping the face exact while pinning the hub-safe
    semantics (the fixture graph is hub-free, so the cap does not
    bind at test scale); per-square counting stays well-defined under
    the induced-subgraph cap because both diagonals survive or the
    square is excluded entirely."""
    from .qpipe import _entity_pairs

    p = _entity_pairs(spark, sf_dir)
    e = p.select(
        F.col("uri_a").alias("src"), F.col("uri_b").alias("dst")
    ).unionByName(
        p.select(F.col("uri_b").alias("src"), F.col("uri_a").alias("dst"))
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ok = deg.filter(F.col("d") <= _SQ_DEG_CAP).select("src")
    e2 = (
        e.join(ok, "src")
        .join(ok.select(F.col("src").alias("dst")), "dst")
        .select("src", "dst")
    )
    a, bb = e2.alias("a"), e2.alias("b")
    wedges = (
        a.join(
            bb,
            (F.col("b.src") == F.col("a.src"))
            & (F.col("a.dst") < F.col("b.dst")),
        )
        .groupBy(F.col("a.dst").alias("u"), F.col("b.dst").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return wedges.agg(
        F.expr("cast(coalesce(sum(c * (c - 1)), 0) div 4 as bigint)").alias(
            "n_squares"
        ),
        F.expr("cast(coalesce(sum(c * (c - 1)), 0) div 2 as bigint)").alias(
            "n_wedge_pairs"
        ),
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth — first-occurrence reduction, no running
# distinct
# ---------------------------------------------------------------------------
@q(
    "text_heaps",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tk
      FROM documents),
    firsts AS (SELECT tk, MIN(doc_id) AS first_doc
               FROM tok WHERE tk <> '' GROUP BY tk),
    nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ntok
           FROM tok WHERE tk <> '' GROUP BY doc_id),
    m AS (SELECT MAX(doc_id) AS maxid FROM documents),
    th AS (SELECT g.i, (m.maxid * g.i) // 10 AS thr
           FROM m CROSS JOIN (
             SELECT unnest(generate_series(1, 10)) AS i) g),
    xs AS (SELECT th.i, CAST(SUM(nd.ntok) AS BIGINT) AS x
           FROM th JOIN nd ON nd.doc_id <= th.thr GROUP BY th.i),
    ys AS (SELECT th.i, CAST(COUNT(*) AS BIGINT) AS y
           FROM th JOIN firsts ON firsts.first_doc <= th.thr
           GROUP BY th.i),
    pts AS (
      SELECT CAST(round(1000.0 * ln(CAST(x AS DOUBLE)), 0) AS BIGINT) AS x,
             CAST(round(1000.0 * ln(CAST(y AS DOUBLE)), 0) AS BIGINT) AS y
      FROM xs JOIN ys USING (i) WHERE x > 0 AND y > 0),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts)
    SELECT n,
           CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (n * sxx - sx * sx), 6) + 0
           END AS beta,
           CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN NULL
                ELSE round((CAST(sy AS DOUBLE)
                            - CAST(n * sxy - sx * sy AS DOUBLE)
                              / (n * sxx - sx * sx) * sx)
                           / n / 1000.0, 6) + 0
           END AS ln_k
    FROM s
    """,
)
def text_heaps(spark, sf):
    """Heaps'-law fit of vocabulary growth, V(N) ~ K * N^beta: vocab
    size vs cumulative token count sampled at 10 corpus prefixes
    (doc_id thresholds at i/10 of max), OLS on the milli-quantized
    log-log points (the text_zipf_fit exact-moments construction) —
    the sub-linear-vocabulary sanity check for a growing crawl
    (natural text sits near beta ~ 0.5; duplicate floods push beta
    toward 0, spam/hash floods toward 1). The scale trick is the
    FIRST-OCCURRENCE REDUCTION: vocab-at-threshold is a count over
    per-token MIN(doc_id) — one vocab-sized agg reused by all 10
    checkpoints — never a running COUNT(DISTINCT) over doc prefixes
    (which would be a corpus-sized window). Cumulative token counts
    come from the per-doc token-count relation joined to the 10-row
    threshold table (a broadcast nested-loop on a 10-row side, 10x
    fan-out of an ALREADY-AGGREGATED relation, never of the corpus).
    Degenerate supports (empty corpus, < 2 usable points) yield NULL
    instead of ANSI errors."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tk")
    ).filter(F.col("tk") != "")
    firsts = tok.groupBy("tk").agg(F.min("doc_id").alias("first_doc"))
    nd = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("ntok")
    )
    th = (
        d.agg(F.max("doc_id").alias("maxid"))
        .select(
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("i"), "maxid"
        )
        .select("i", F.expr("(maxid * i) div 10").alias("thr"))
    )
    xs = (
        nd.join(F.broadcast(th), nd["doc_id"] <= th["thr"])
        .groupBy("i")
        .agg(F.sum("ntok").cast("long").alias("x"))
    )
    ys = (
        firsts.join(F.broadcast(th), firsts["first_doc"] <= th["thr"])
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    pts = (
        xs.join(ys, "i")
        .filter((F.col("x") > 0) & (F.col("y") > 0))
        .select(
            F.round(F.lit(1000.0) * F.log(F.col("x").cast("double")), 0)
            .cast("long")
            .alias("x"),
            F.round(F.lit(1000.0) * F.log(F.col("y").cast("double")), 0)
            .cast("long")
            .alias("y"),
        )
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
        .alias("beta"),
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
        .alias("ln_k"),
    )


# ---------------------------------------------------------------------------
# exact phi-heavy hitters via a Misra-Gries candidate pass + exact verify
# ---------------------------------------------------------------------------
_HH_K = 32  # phi = 1/32: report tokens with share > n/32
_HH_CAP = 64  # Misra-Gries counters per partition (>= _HH_K)


def _mg_candidates(batches):
    """Per-partition Misra-Gries summary over Arrow batches: at most
    ``_HH_CAP`` counters, batched decrement (subtract the (cap+1)-th
    largest count from all, keep positives — the standard batch MG
    reduction, undercount <= n_p / cap). Emits the surviving
    candidate tokens plus one tk=NULL row carrying the partition's
    total token count, so the exact pass needs no extra corpus scan
    for n."""
    import pandas as pd

    counts: dict[str, int] = {}
    n_p = 0
    for pdf in batches:
        s = pdf["text"].str.split(" ").explode()
        s = s[s.notna() & (s != "")]
        vc = s.value_counts()
        n_p += int(vc.sum())
        for tk, v in vc.items():
            counts[tk] = counts.get(tk, 0) + int(v)
        if len(counts) > _HH_CAP:
            dec = sorted(counts.values(), reverse=True)[_HH_CAP]
            counts = {k: v - dec for k, v in counts.items() if v > dec}
    out = {"tk": list(counts) + [None], "c": list(counts.values()) + [n_p]}
    yield pd.DataFrame(out)


@q(
    "agg_heavy_hitters",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    cnt AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok WHERE tk <> '' GROUP BY tk),
    n AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n FROM cnt)
    SELECT cnt.tk, cnt.c, n.n,
           CAST((cnt.c * 1000000) // n.n AS BIGINT) AS share_ppm
    FROM cnt CROSS JOIN n
    WHERE cnt.c * {_HH_K} > n.n
    """,
)
def agg_heavy_hitters(spark, sf):
    """Exact phi-heavy hitters (phi = 1/{k}) over the corpus token
    stream via the classic two-pass scheme every streaming engine
    uses when the vocabulary doesn't fit anywhere: pass 1 runs a
    bounded Misra-Gries summary PER PARTITION inside ``mapInPandas``
    (<= {cap} counters, zero shuffle — only the <= {cap} surviving
    candidates plus one total-count row leave each partition), pass 2
    exactly counts ONLY the candidate tokens (semi-join on the tiny
    candidate set — AQE broadcasts it unhinted) and filters by the
    true threshold c * {k} > n. Correctness is partitioning-
    independent: if c(x) > n/{k} then by pigeonhole some partition
    has c_p(x) > n_p/{k} >= n_p/{cap}, and MG with {cap} counters
    undercounts by at most n_p/{cap}, so every true heavy hitter
    survives pass 1 — the exact pass then removes false candidates,
    making the summary transparent (the join_bloom pattern: a lossy
    prefilter in front of an exact verify). The pass-1 summary is
    collect()ed to the driver and re-shipped as literals: it is
    bounded by the ALGORITHM (<= cap+1 rows per partition), never by
    data — the join_bloom 64-word / kmeans centroid-literal
    precedent — and collecting it once keeps the plan at exactly two
    corpus scans (a second DataFrame branch over the pass-1 relation
    would re-run the whole MG pass per branch). The oracle is the
    naive full-vocabulary GROUP BY ... HAVING — infeasible at 10^12
    docs, identical in answer. Share is exact ppm (c*10^6 div n)."""
    d = t(spark, sf, "documents")
    p1 = d.select("text").mapInPandas(
        _mg_candidates, schema="tk string, c long"
    ).collect()
    n = sum(r["c"] for r in p1 if r["tk"] is None)
    cands = sorted({r["tk"] for r in p1 if r["tk"] is not None})
    tok = d.select(F.explode(F.split("text", " ")).alias("tk")).filter(
        F.col("tk") != ""
    )
    if not cands:
        tok = tok.filter(F.lit(False))  # empty corpus: stay total
    else:
        tok = tok.filter(F.col("tk").isin(cands))
    return (
        tok.groupBy("tk")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") * _HH_K > F.lit(n))
        .select(
            "tk",
            "c",
            F.lit(n).cast("long").alias("n"),
            F.expr(f"cast((c * 1000000) div {max(n, 1)}L as bigint)").alias(
                "share_ppm"
            ),
        )
    )


agg_heavy_hitters.__doc__ = agg_heavy_hitters.__doc__.format(
    k=_HH_K, cap=_HH_CAP
)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) cardinality sketch — deterministic, exact twin
# ---------------------------------------------------------------------------
_KMV_K = 256
_KMV_SPACE = float(1 << 40)  # 40-bit hash domain — exact in DOUBLE


@q(
    "agg_kmv",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    hs AS (
      SELECT DISTINCT ('0x' || substr(md5(tk), 1, 10))::UBIGINT AS h
      FROM tok WHERE tk <> ''),
    km AS (SELECT h FROM hs ORDER BY h LIMIT {_KMV_K}),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct FROM hs),
    kk AS (SELECT CAST(MAX(h) AS BIGINT) AS hk FROM km),
    est AS (
      SELECT n_distinct, hk,
             CASE WHEN n_distinct = 0 THEN 0
                  WHEN n_distinct < {_KMV_K} THEN n_distinct
                  WHEN hk <= 0 THEN NULL
                  ELSE CAST(round({_KMV_K - 1}.0 * {_KMV_SPACE!r} / hk)
                            AS BIGINT) END AS kmv_est
      FROM s CROSS JOIN kk)
    SELECT CAST({_KMV_K} AS INT) AS k, n_distinct,
           CASE WHEN n_distinct >= {_KMV_K} THEN hk END AS h_k, kmv_est,
           CASE WHEN n_distinct < {_KMV_K} OR kmv_est IS NULL THEN NULL
                ELSE round((kmv_est - n_distinct)
                           / CAST(n_distinct AS DOUBLE), 6) + 0
           END AS rel_err
    FROM est
    """,
)
def agg_kmv(spark, sf):
    """KMV (k-minimum-values / bottom-k) cardinality sketch over the
    corpus vocabulary, reported NEXT TO the exact distinct count so
    the estimator's error is part of the gated answer (the
    agg_lincount convention): hash every token into a 40-bit md5
    prefix, keep the k=256 smallest DISTINCT hash values, and
    estimate |V| ≈ (k−1)·2⁴⁰ / h₍ₖ₎ — the order-statistics estimator
    (Bar-Yossef et al.) that, unlike linear counting's fixed 1024-bit
    table, scales its range with the data and is MERGEABLE by
    unioning bottom-k sets (the distributed-sketch property that
    matters at 1000 executors). Scale shape: the k smallest values
    are TakeOrderedAndProject — per-partition heaps of size k merged
    on the driver, never a global sort of the vocabulary; the hash
    relation feeds 2 consumers (bottom-k, exact count) so it is
    parquet-checkpointed (text_jsd discipline). Engine parity: md5 is
    identical in both engines (feat_hashing precedent), the hash
    domain is 40 bits so every value is EXACTLY representable in
    DOUBLE and the one estimate division runs in the same operation
    order both sides; sub-k vocabularies return the exact count (the
    bottom-k set IS the value set), an empty corpus returns 0 — the
    sketch is total."""
    from ..operators.dedup import parquet_checkpoint

    d = t(spark, sf, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("tk")).filter(
        F.col("tk") != ""
    )
    hs = parquet_checkpoint(
        tok.select(
            F.conv(F.substring(F.md5("tk"), 1, 10), 16, 10)
            .cast("long")
            .alias("h")
        ).distinct(),
        "kmv_hs",
    )
    km = hs.orderBy("h").limit(_KMV_K)
    s = hs.agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    kk = km.agg(F.max("h").cast("long").alias("hk"))
    est_val = F.round(
        F.lit(float(_KMV_K - 1)) * F.lit(_KMV_SPACE) / F.col("hk")
    ).cast("long")
    est = s.crossJoin(kk).select(
        "n_distinct",
        "hk",
        F.when(F.col("n_distinct") == 0, F.lit(0).cast("long"))
        .when(F.col("n_distinct") < _KMV_K, F.col("n_distinct"))
        .when(F.col("hk") <= 0, F.lit(None).cast("long"))
        .otherwise(est_val)
        .alias("kmv_est"),
    )
    return est.select(
        F.lit(_KMV_K).cast("int").alias("k"),
        "n_distinct",
        F.when(F.col("n_distinct") >= _KMV_K, F.col("hk")).alias("h_k"),
        "kmv_est",
        F.when(
            (F.col("n_distinct") < _KMV_K) | F.col("kmv_est").isNull(),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (F.col("kmv_est") - F.col("n_distinct"))
                / F.col("n_distinct").cast("double"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# approx_percentile with a PROVEN rank-error certificate
# ---------------------------------------------------------------------------
_AQ_ACC = 1000  # approx_percentile accuracy: rank error <= n/accuracy


@q(
    "agg_approx_quantile",
    """
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(round(4 * quantile_cont(cents, 0.25)) AS BIGINT) AS q14,
             CAST(round(4 * quantile_cont(cents, 0.50)) AS BIGINT) AS q24,
             CAST(round(4 * quantile_cont(cents, 0.75)) AS BIGINT) AS q34
      FROM v)
    SELECT p, exact4,
           CASE WHEN n = 0 THEN NULL ELSE TRUE END AS rank_ok
    FROM (
      SELECT n, 0.25 AS p, q14 AS exact4 FROM s
      UNION ALL SELECT n, 0.50, q24 FROM s
      UNION ALL SELECT n, 0.75, q34 FROM s)
    """,
)
def agg_approx_quantile(spark, sf):
    """``approx_percentile`` (the Greenwald–Khanna-style mergeable
    quantile sketch — the ONLY quantile that exists at 100 TB, where
    exact percentiles would global-sort the corpus) reported
    agg_kmv-style NEXT TO the exact type-7 quantiles, with the
    sketch's guarantee turned into a GATED CERTIFICATE: the
    algorithm promises the returned value's RANK is within
    n/accuracy of the target, so the face recomputes the approx
    value's true rank relationally and emits the bound check as a
    boolean. The boolean is deterministically TRUE by theorem —
    hash-safe even though the sketch's exact VALUE may vary with
    partitioning (which is why the approx value itself is NOT an
    output column: the first partition-order-dependent float in a
    gated row would flake the hash; the certificate is the
    invariant). Exact side: 4× type-7 quantiles of integer cents
    are exact BIGINTs (feat_robust_scale construction)."""
    v = t(spark, sf, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    from ..operators.dedup import parquet_checkpoint

    vc = parquet_checkpoint(v, "aq_cents")
    s = vc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.lit(4) * F.expr("percentile(cents, 0.25)"))
        .cast("long")
        .alias("q14"),
        F.round(F.lit(4) * F.expr("percentile(cents, 0.50)"))
        .cast("long")
        .alias("q24"),
        F.round(F.lit(4) * F.expr("percentile(cents, 0.75)"))
        .cast("long")
        .alias("q34"),
        F.expr(
            f"approx_percentile(cents, array(0.25, 0.5, 0.75), {_AQ_ACC})"
        ).alias("apx"),
    ).collect()[0]
    n = int(s["n"]) if s["n"] is not None else 0
    rows = []
    for p, e4 in ((0.25, s["q14"]), (0.50, s["q24"]), (0.75, s["q34"])):
        rows.append((p, e4, None))
    out = spark.createDataFrame(
        rows, "p double, exact4 long, rank_ok boolean"
    )
    if n == 0:
        return out.select("p", "exact4", "rank_ok")
    # certificate: the approx value's true rank is within n/ACC + 1
    # of the target rank — recomputed against the data, not assumed
    apx = [int(x) for x in s["apx"]]
    ranks = vc.agg(
        *[
            F.sum((F.col("cents") <= a).cast("long")).alias(f"r{i}")
            for i, a in enumerate(apx)
        ]
    ).collect()[0]
    ok = []
    for i, p in enumerate((0.25, 0.50, 0.75)):
        target = p * n
        ok.append(abs(int(ranks[f"r{i}"]) - target) <= n / _AQ_ACC + 1)
    certified = all(ok)
    return out.select(
        "p",
        "exact4",
        F.lit(bool(certified)).cast("boolean").alias("rank_ok"),
    )


# ---------------------------------------------------------------------------
# native Datasketches HLL — estimate + mergeability certificate, gated
# ---------------------------------------------------------------------------
@q(
    "agg_hll_native",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents)
    SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS true_distinct,
           TRUE AS within_5pct,
           TRUE AS merge_consistent
    FROM tok WHERE tk <> ''
    """,
)
def agg_hll_native(spark, sf):
    """Spark 4's NATIVE Datasketches HLL aggregates
    (hll_sketch_agg / hll_union_agg / hll_sketch_estimate) over the
    corpus vocabulary — the JVM-side production path where
    agg_lincount / agg_kmv build the sketch by hand for exactness.
    The estimate itself is engine-specific (DuckDB's HLL is a
    different implementation), so the face rides the agg_lincount
    GATED-ROW discipline: the hashed answer is the EXACT distinct
    count plus two deterministic certificates — (a) the native
    estimate lands within 5% of truth (lgK=12 => ~1.6% standard
    error, 5% is >3 sigma), and (b) MERGEABILITY: the estimate from
    hll_union_agg over per-lang sketches equals the single global
    sketch's estimate exactly, because HLL union is register-wise
    max — the property that makes the sketch shardable across 1000
    executors and re-aggregable across partial results, which is
    the entire reason to use it at 100 TB. Empty corpus: both
    estimates are NULL and the null-safe <=> keeps the certificate
    TRUE."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "lang", F.explode(F.split("text", " ")).alias("tk")
    ).filter(F.col("tk") != "")
    glob = tok.agg(
        F.countDistinct("tk").cast("long").alias("true_distinct"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(tk))").alias("est"),
    )
    per = tok.groupBy("lang").agg(F.expr("hll_sketch_agg(tk)").alias("sk"))
    uni = per.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_u")
    )
    return glob.crossJoin(uni).select(
        "true_distinct",
        F.when(F.col("true_distinct") == 0, F.lit(True))
        .otherwise(
            F.abs(F.col("est") - F.col("true_distinct"))
            <= 0.05 * F.col("true_distinct")
        )
        .alias("within_5pct"),
        F.col("est").eqNullSafe(F.col("est_u")).alias("merge_consistent"),
    )


# ---------------------------------------------------------------------------
# approx_percentile with a deterministic rank-error certificate
# ---------------------------------------------------------------------------
_APCT_ACC = 100  # Greenwald-Khanna accuracy: rank error <= n / accuracy


@q(
    "agg_approx_pctl_cert",
    """
    WITH b AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(quantile_disc(cents, 0.5) AS BIGINT) AS exact_median,
           TRUE AS rank_ok
    FROM b
    """,
)
def agg_approx_pctl_cert(spark, sf):
    """Spark's native ``approx_percentile`` (Greenwald-Khanna) with
    its accuracy contract turned into a GATED certificate: the
    hashed answer is n + the EXACT lower median (quantile_2pass's
    trick is overkill here — one column, so a plain quantile_disc
    twin suffices), and the certificate pins |rank(approx) - n/2|
    <= n/accuracy + 1 — the deterministic worst-case bound GK
    guarantees REGARDLESS of partitioning, which is what makes the
    sketch usable as a 100-TB first pass (the estimate itself varies
    with partition merge order, so it can never be hashed — the
    agg_lincount/agg_hll_native gating discipline, third variation).
    rank(approx) is measured against the data in the same pass
    (count of rows <= approx attaches by a 1-row cross join). The
    cents relation feeds TWO consumers (the GK agg and the rank
    count), so it is parquet-checkpointed — column pruning defeats
    ReuseExchange and an uncheckpointed twin subtree re-scans the
    corpus per branch (the checkpoint-consumers rule audit #44+
    enforces everywhere). Empty corpus: approx and median are NULL,
    certificate stays TRUE."""
    from ..operators.dedup import parquet_checkpoint

    b = parquet_checkpoint(
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(F.round(F.col("value") * 100).cast("long").alias("cents")),
        "apct_cents",
    )
    ap = b.agg(
        F.expr(f"approx_percentile(cents, 0.5, {_APCT_ACC})").alias("apx")
    )
    j = b.crossJoin(ap)
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("exact_median"),
        F.when(F.count(F.lit(1)) == 0, F.lit(True))
        .otherwise(
            F.abs(
                F.sum(
                    F.when(F.col("cents") <= F.col("apx"), 1).otherwise(0)
                )
                - (F.count(F.lit(1)) + 1) / 2
            )
            <= F.count(F.lit(1)) / _APCT_ACC + 1
        )
        .alias("rank_ok"),
    )


# ---------------------------------------------------------------------------
# approx_top_k in its exactness regime — tracked capacity >= distinct keys
# ---------------------------------------------------------------------------
_ATK_K = 64
_ATK_TRACKED = 1024


@q(
    "agg_approx_topk",
    """
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS est
    FROM events WHERE event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def agg_approx_topk(spark, sf):
    """Spark 4.1's native ``approx_top_k`` run deliberately in its
    EXACTNESS regime: the sketch evicts nothing while the number of
    distinct keys stays <= maxItemsTracked, so with 1024 tracked
    slots over the single-digit event_type domain the "approximate"
    counts are provably exact and the plain GROUP BY twin gates them
    to the hash — the agg_lincount/agg_hll_native discipline, but
    here the certificate is full value equality rather than an error
    band, because the exactness condition (|keys| <= capacity) is a
    design-time fact about the column, not a runtime accident. That
    is also exactly how the sketch is used on 100-TB category
    columns: one map-side-combinable agg (the sketch buffer merges
    associatively, no shuffle of raw rows) replaces groupBy+count
    +top-k whenever the key domain is bounded, and degrades
    gracefully (bounded rank error) when it is not. k = 64 >= the
    domain size makes the returned SET total, so the face explodes
    the sketch rows and compares them all — no top-k tie ambiguity
    can enter the hash. Empty corpus: the sketch returns an empty
    item array, explode drops the row, twin is empty."""
    sk = (
        t(spark, sf, "events")
        .filter(F.col("event_type").isNotNull())
        .agg(
            F.expr(
                f"approx_top_k(event_type, {_ATK_K}, {_ATK_TRACKED})"
            ).alias("arr")
        )
    )
    return sk.select(F.explode("arr").alias("tk")).select(
        F.col("tk.item").alias("item"),
        F.col("tk.count").cast("long").alias("est"),
    )


# ---------------------------------------------------------------------------
# approx_top_k sketch STATE — accumulate per shard, combine, estimate
# ---------------------------------------------------------------------------
@q(
    "agg_topk_state",
    """
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS est
    FROM events WHERE event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def agg_topk_state(spark, sf):
    """The approx_top_k SKETCH-STATE triple (Spark 4.1:
    ``approx_top_k_accumulate`` / ``_combine`` / ``_estimate``) —
    the engine-native version of dedup_minhash_merge's mergeability
    algebra, and the API that turns the sketch into INFRASTRUCTURE:
    accumulate per shard/day/tenant, persist the opaque state,
    combine states across jobs, estimate once at read time — no
    re-scan of yesterday, same contract as any production sketch
    store. The face accumulates the two event_id-parity halves in
    one pass each, combines, estimates, and — because tracked
    capacity (1024) exceeds the event_type domain — the estimates
    are provably exact, so the plain GROUP BY twin gates the whole
    accumulate->combine->estimate chain by full value equality
    (agg_approx_topk's exactness-regime discipline, extended through
    the state algebra). k = 64 >= |domain| keeps the estimated set
    total: no top-k tie ambiguity reaches the hash."""
    halves = spark.sql(
        f"""
        WITH src AS (
          SELECT event_id, event_type
          FROM parquet.`{sf}/events.parquet`
          WHERE event_type IS NOT NULL),
        halves AS (
          SELECT approx_top_k_accumulate(event_type, {_ATK_TRACKED})
                   AS st
          FROM src WHERE event_id % 2 = 0
          UNION ALL
          SELECT approx_top_k_accumulate(event_type, {_ATK_TRACKED})
          FROM src WHERE event_id % 2 = 1),
        comb AS (
          SELECT approx_top_k_combine(st, {_ATK_TRACKED}) AS cst
          FROM halves)
        SELECT approx_top_k_estimate(cst, {_ATK_K}) AS arr FROM comb
        """
    )
    return halves.select(F.explode("arr").alias("tk")).select(
        F.col("tk.item").alias("item"),
        F.col("tk.count").cast("long").alias("est"),
    )


# ---------------------------------------------------------------------------
# approx_count_distinct with its rsd error bound turned into a certificate
# ---------------------------------------------------------------------------
_ACD_RSD = 0.02


@q(
    "agg_approx_cd_cert",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_cd_cert(spark, sf):
    """``approx_count_distinct`` GATED — the certificate upgrade of
    agg_approx_cd, the registry's one rows-only key (HLL estimates
    vary with partition merge order, so the estimate itself can
    never be hashed): per group the hashable answer is the EXACT
    distinct count, and the ride-along boolean attests the HLL++
    estimate at rsd = 0.02 lands within 5 standard errors of it
    (P(miss) ~ 3e-7 per group under the estimator's own Gaussian
    error model — a deterministic-in-practice certificate over this
    fixed input, and the honest form: a HARD analytic bound does not
    exist for HLL++, unlike the GK rank bound agg_approx_pctl_cert
    pins). Both aggregates fuse into ONE two-phase pass, which is
    also the production pattern inverted: at 100 TB you run ONLY the
    sketch and this face is the offline calibration that justifies
    trusting it. The agg_lincount / agg_hll_native gating
    discipline, closing the family."""
    g = (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").cast("long").alias(
                "exact_parts"
            ),
            F.expr(
                f"approx_count_distinct(l_partkey, {_ACD_RSD})"
            ).alias("est"),
        )
    )
    bound = F.lit(5.0 * _ACD_RSD) * F.col("exact_parts")
    return g.select(
        "l_returnflag",
        "exact_parts",
        F.when(F.col("exact_parts") == 0, F.lit(True))
        .otherwise(
            F.abs(F.col("est") - F.col("exact_parts")) <= bound
        )
        .alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# wave 145: Bloom-filter false-positive-rate certificate
# ---------------------------------------------------------------------------
@q(
    "agg_bloom_fpp_cert",
    """
    WITH ins AS (
      SELECT DISTINCT doc_id AS k FROM documents
      WHERE doc_id % 4 = 0),
    ipos AS (
      SELECT DISTINCT
             ('0x' || substr(md5('b' || i || ':' || CAST(k AS VARCHAR)),
                             1, 8))::UBIGINT % 65536 AS pos
      FROM ins CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS i) hs),
    probes AS (
      SELECT doc_id + 1000000000000 AS k FROM documents),
    ppos AS (
      SELECT k,
             CAST(('0x' || substr(md5('b' || i || ':'
                                      || CAST(k AS VARCHAR)), 1, 8))
                  ::UBIGINT % 65536 AS BIGINT) AS pos
      FROM probes CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS i) hs),
    pp AS (
      SELECT k, pos, CAST(COUNT(*) AS BIGINT) AS dummy
      FROM ppos GROUP BY k, pos),
    hit AS (
      SELECT pp.k,
             CAST(COUNT(*) AS BIGINT) AS npos,
             CAST(SUM(CASE WHEN ip.pos IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nhit
      FROM pp LEFT JOIN ipos ip ON ip.pos = pp.pos
      GROUP BY pp.k),
    agg AS (
      SELECT CAST((SELECT COUNT(*) FROM ins) AS BIGINT) AS n_keys,
             CAST((SELECT COUNT(*) FROM ipos) AS BIGINT) AS bits_set,
             CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(COALESCE(SUM(CASE WHEN nhit = npos THEN 1 ELSE 0
                                    END), 0) AS BIGINT) AS n_fp
      FROM hit)
    SELECT n_keys, bits_set, n_probes, n_fp,
           CASE WHEN n_probes = 0 THEN NULL
                ELSE round(CAST(n_fp AS DOUBLE) / n_probes, 6) + 0
           END AS fpp_observed,
           round((CAST(bits_set AS DOUBLE) / 65536.0)
                 * (CAST(bits_set AS DOUBLE) / 65536.0)
                 * (CAST(bits_set AS DOUBLE) / 65536.0), 6) + 0
             AS fpp_theory,
           CASE WHEN n_probes = 0 THEN NULL
                ELSE CAST(n_fp AS DOUBLE) / n_probes
                     <= 3.0 * ((CAST(bits_set AS DOUBLE) / 65536.0)
                               * (CAST(bits_set AS DOUBLE) / 65536.0)
                               * (CAST(bits_set AS DOUBLE) / 65536.0))
                        + 0.01
           END AS calibrated
    FROM agg
    """,
)
def agg_bloom_fpp_cert(spark, sf):
    """Bloom-filter FALSE-POSITIVE-RATE certificate — the
    measurement that justifies join_bloom's bitmap prefilter before
    a 100-TB run: build the m=65536-bit / k=3 filter over a quarter
    of the doc-id space, probe with keys GUARANTEED absent (doc_id
    + 1e12), and compare the observed FP rate to the theoretical
    rho^k computed from the REALIZED fill ratio rho = bits_set/m —
    an exact rational assembled by explicit multiplication, never
    pow()/exp() (whose cross-engine ulp behavior is the one
    transcendental class the embedded-formula discipline cannot
    pin). Membership is evaluated by SET semantics — the distinct
    occupied-position relation (<= m rows, broadcast) left-joined
    to each probe's <= k distinct positions, FP iff every one hits
    — which is bit-for-bit the semantics of join_bloom's literal
    bitmap with zero driver collect, so the certificate path
    itself scales (positions relation is bounded by m regardless
    of corpus size). Hash positions are md5-derived per (hash
    index, key) — engine/partitioning-invariant. `calibrated`
    pins observed <= 3x theory + 1% on the fixture; if this face
    ever goes red the md5 position-uniformity assumption behind
    every sketch face is suspect (see stat_ks_uniform)."""
    docs = t(spark, sf, "documents")
    ins = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.col("doc_id").alias("k")
    ).distinct()
    hs = spark.range(1, 4).select(F.col("id").alias("i"))

    def pos_expr(kcol):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("b"),
                            F.col("i").cast("string"),
                            F.lit(":"),
                            kcol.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 65536
        )

    ipos = (
        ins.crossJoin(F.broadcast(hs))
        .select(pos_expr(F.col("k")).alias("pos"))
        .distinct()
    )
    probes = docs.select(
        (F.col("doc_id") + F.lit(1000000000000)).alias("k")
    )
    pp = (
        probes.crossJoin(F.broadcast(hs))
        .select("k", pos_expr(F.col("k")).alias("pos"))
        .distinct()
    )
    hit = (
        pp.join(ipos.withColumnRenamed("pos", "ip"),
                pp["pos"] == F.col("ip"), "left")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("npos"),
            F.sum(
                F.when(F.col("ip").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("nhit"),
        )
    )
    nk = ins.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    nb = ipos.agg(F.count(F.lit(1)).cast("long").alias("bits_set"))
    agg = (
        hit.agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.coalesce(
                F.sum(
                    F.when(F.col("nhit") == F.col("npos"), 1)
                    .otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_fp"),
        )
        .crossJoin(nk)
        .crossJoin(nb)
    )
    rho = F.col("bits_set").cast("double") / F.lit(65536.0)
    theory = rho * rho * rho
    return agg.select(
        "n_keys",
        "bits_set",
        "n_probes",
        "n_fp",
        F.when(F.col("n_probes") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("n_fp").cast("double") / F.col("n_probes"), 6
            )
            + F.lit(0.0)
        )
        .alias("fpp_observed"),
        (F.round(theory, 6) + F.lit(0.0)).alias("fpp_theory"),
        F.when(F.col("n_probes") == 0, F.lit(None).cast("boolean"))
        .otherwise(
            F.col("n_fp").cast("double") / F.col("n_probes")
            <= F.lit(3.0) * theory + F.lit(0.01)
        )
        .alias("calibrated"),
    )
