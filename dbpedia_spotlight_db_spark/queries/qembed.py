"""Embedding-clustering query faces: SemDeDup (cluster-then-dedup)
and unrolled Lloyd k-means — the iterative-algorithm surface of the
training-data pipeline. Both reuse the deterministic IVF quantizer
(lowest-id vectors as initial centroids) so the DuckDB twin can
replicate assignment exactly; every cosine is rounded to 6 with a
centroid-id tie-break, and updated centroid components round to 6 on
both engines before re-assignment (operators/clustering.py docstring
has the float-parity argument).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..operators import clustering
from .common import t
from .qdata import _EMB_DIM, _IVF_COS, _NORM

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


_SEM_K = 8
_SEM_THRESH = 0.35

_ASSIGN_SQL = f"""
    cents AS (
      SELECT vec_id AS cid, embedding AS cv, {_NORM.format(v='embedding')} AS cn
      FROM embeddings ORDER BY vec_id LIMIT {_SEM_K}),
    vecs AS (
      SELECT vec_id, embedding, {_NORM.format(v='embedding')} AS vn
      FROM embeddings),
    assign AS (
      SELECT v.vec_id, v.embedding, v.vn, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_IVF_COS.format(a='v.embedding', b='c.cv',
                                         an='v.vn', bn='c.cn')} DESC, c.cid
             ) AS rn
      FROM vecs v, cents c),
    cell AS (SELECT vec_id, embedding, vn, cid FROM assign WHERE rn = 1)
"""


@q(
    "dedup_semantic",
    f"""
    WITH {_ASSIGN_SQL},
    losers AS (
      SELECT DISTINCT b.vec_id
      FROM cell a JOIN cell b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {_IVF_COS.format(a='a.embedding', b='b.embedding',
                             an='a.vn', bn='b.vn')} >= {_SEM_THRESH})
    SELECT c.vec_id, c.cid FROM cell c
    LEFT JOIN losers l ON c.vec_id = l.vec_id WHERE l.vec_id IS NULL
    """,
)
def dedup_semantic(spark, sf):
    """SemDeDup (Abbas et al. 2023): nearest-centroid cell assignment
    (map-only, centroids as array literal), near-dup pairs ONLY
    within a cell, keep the lowest vec_id. The pairwise stage is
    bounded per cell — at 10^12 vectors the centroid count grows to
    keep cells task-sized, the corpus shuffles once by cid, and the
    loser set anti-joins back without a forced broadcast. Delegates
    to operators/clustering.py::cluster_dedup."""
    return clustering.cluster_dedup(
        t(spark, sf, "embeddings"),
        n_centroids=_SEM_K,
        threshold=_SEM_THRESH,
    )


@q(
    "embed_kmeans",
    f"""
    WITH {_ASSIGN_SQL},
    upd AS (
      SELECT cid, i, round(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS x
      FROM cell CROSS JOIN
           (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) dims
      GROUP BY cid, i),
    cents1 AS (
      SELECT cid, cv, {_NORM.format(v='cv')} AS cn
      FROM (SELECT cid, array_agg(x ORDER BY i) AS cv FROM upd GROUP BY cid)),
    a2 AS (
      SELECT v.vec_id, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_IVF_COS.format(a='v.embedding', b='c.cv',
                                         an='v.vn', bn='c.cn')} DESC, c.cid
             ) AS rn
      FROM vecs v, cents1 c)
    SELECT a2.cid, CAST(COUNT(*) AS BIGINT) AS n_members,
           round(any_value(c1.cn), 6) AS cnorm
    FROM a2 JOIN cents1 c1 ON a2.cid = c1.cid
    WHERE a2.rn = 1 GROUP BY a2.cid
    """,
)
def embed_kmeans(spark, sf):
    """Two unrolled Lloyd iterations over the embedding column — the
    canonical ITERATIVE algorithm on Spark: map-only assignment
    against a broadcast-literal centroid table, one k*d-sized agg to
    re-estimate the model, collect the tiny model to the driver,
    repeat; the corpus is scanned per iteration but never shuffled by
    vector. The DuckDB twin unrolls the identical two rounds. Output:
    final cluster sizes + centroid norms."""
    emb = t(spark, sf, "embeddings")
    assigned, cents = clustering.lloyd_kmeans(emb, k=_SEM_K, iters=2)
    counts = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    cent_df = spark.createDataFrame(
        [(int(c["cid"]), float(c["cn"])) for c in cents],
        "cid long, cn double",
    ).select("cid", F.round("cn", 6).alias("cnorm"))
    return counts.join(F.broadcast(cent_df), "cid").select(
        "cid", "n_members", "cnorm"
    )


# ---------------------------------------------------------------------------
# embedding-norm profile — the curation fence on vector magnitude
# ---------------------------------------------------------------------------
@q(
    "embed_norms",
    """
    WITH e0 AS (
      SELECT vec_id, label,
             unnest(range(0, len(embedding))) AS j, embedding
      FROM embeddings),
    q0 AS (
      SELECT vec_id, label,
             CAST(round(1000000.0 * (CAST(embedding[j + 1] AS DOUBLE)
                  * CAST(embedding[j + 1] AS DOUBLE))) AS BIGINT) AS q
      FROM e0),
    nv AS (
      SELECT vec_id, label, CAST(SUM(q) AS BIGINT) AS n2
      FROM q0 GROUP BY vec_id, label),
    s AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n2) AS BIGINT) AS sn2,
             CAST(round(4 * quantile_cont(n2, 0.25)) AS BIGINT) AS q14,
             CAST(round(4 * quantile_cont(n2, 0.75)) AS BIGINT) AS q34
      FROM nv GROUP BY label),
    j AS (
      SELECT nv.label, nv.n2, s.n, s.sn2, s.q14, s.q34,
             s.q34 - s.q14 AS iqr4
      FROM nv JOIN s USING (label))
    SELECT label, MAX(n) AS n,
           round(MAX(sn2) / (1000000.0 * MAX(n)), 6) + 0 AS mean_norm2,
           CAST(COUNT(*) FILTER (WHERE 8 * n2 < 2 * q14 - 3 * iqr4
                                    OR 8 * n2 > 2 * q34 + 3 * iqr4)
                AS BIGINT) AS n_outliers
    FROM j GROUP BY label
    """,
)
def embed_norms(spark, sf):
    """Per-label profile of embedding L2 norm² with a Tukey-fence
    outlier census — the vector-curation gate embed_dim_stats can't
    express (a per-DIM profile misses whole-vector anomalies: a
    zero vector, an un-normalized batch, a fp16 overflow all move
    the NORM first; SemDeDup-style pipelines drop or renormalize
    exactly these before cosine math). Exactness: each squared
    component quantizes to integer micros individually, so every
    vector's norm² is an exact BIGINT (order-independent over
    dims), the per-label 4× type-7 quartiles of those integers are
    exact BIGINTs (feat_robust_scale construction), and fence
    membership is the all-integer 8·n2 vs 2·q14±3·iqr4 test — no
    float row decisions. Shape: posexplode map-side, per-vector agg
    (map-side combinable), per-label stats, broadcast fit-then-
    apply census on the VECTOR-count-sized relation (never the
    dims-exploded one)."""
    emb = t(spark, sf, "embeddings")
    q0 = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("j", "xf"),
    ).select(
        "vec_id",
        "label",
        F.round(
            F.lit(1000000.0)
            * (F.col("xf").cast("double") * F.col("xf").cast("double"))
        )
        .cast("long")
        .alias("q"),
    )
    from ..operators.dedup import parquet_checkpoint

    # 2 consumers (stats fit + census apply) — without the checkpoint
    # each branch re-runs the dims-exploded corpus scan
    nv = parquet_checkpoint(
        q0.groupBy("vec_id", "label").agg(
            F.sum("q").cast("long").alias("n2")
        ),
        "embed_norms_nv",
    )
    s = nv.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n2").cast("long").alias("sn2"),
        F.round(F.lit(4) * F.expr("percentile(n2, 0.25)"))
        .cast("long")
        .alias("q14"),
        F.round(F.lit(4) * F.expr("percentile(n2, 0.75)"))
        .cast("long")
        .alias("q34"),
    )
    j = nv.join(s, "label").select(
        "label",
        "n2",
        "n",
        "sn2",
        "q14",
        "q34",
        (F.col("q34") - F.col("q14")).alias("iqr4"),
    )
    out = (
        (F.lit(8) * F.col("n2") < 2 * F.col("q14") - 3 * F.col("iqr4"))
        | (F.lit(8) * F.col("n2") > 2 * F.col("q34") + 3 * F.col("iqr4"))
    ).cast("long")
    return j.groupBy("label").agg(
        F.max("n").alias("n"),
        (
            F.round(
                F.max("sn2") / (F.lit(1000000.0) * F.max("n")), 6
            )
            + F.lit(0.0)
        ).alias("mean_norm2"),
        F.sum(out).cast("long").alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# Fisher separability per embedding dimension — supervised scatter ratio
# ---------------------------------------------------------------------------
@q(
    "embed_fisher",
    """
    WITH e AS (
      SELECT label, embedding FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL),
    x AS (
      SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding) AS v
      FROM e),
    qx AS (
      SELECT label, dim,
             CAST(round(1000.0 * CAST(v AS DOUBLE)) AS BIGINT) AS q
      FROM x),
    cells AS (
      SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s1,
             CAST(SUM(q * q) AS BIGINT) AS s2
      FROM qx GROUP BY 1, 2),
    w AS (
      SELECT dim, label, n, s1, s2,
             SUM(n) OVER (PARTITION BY dim) AS nn,
             SUM(s1) OVER (PARTITION BY dim) AS t1,
             COUNT(*) OVER (PARTITION BY dim) AS k
      FROM cells),
    terms AS (
      SELECT dim, nn, k, t1,
             CAST(round(s1 * 1.0 * s1 / n) AS BIGINT) AS sb_t,
             CAST(round(s2 - s1 * 1.0 * s1 / n) AS BIGINT) AS sw_t
      FROM w)
    SELECT CAST(dim AS INT) AS dim_idx,
           CAST(MAX(k) AS BIGINT) AS n_labels,
           CASE WHEN MAX(k) < 2 OR MAX(nn) <= MAX(k) OR SUM(sw_t) <= 0
                THEN NULL
                ELSE round(((SUM(sb_t)
                             - MAX(t1) * 1.0 * MAX(t1) / MAX(nn))
                            / (MAX(k) - 1.0))
                           / (SUM(sw_t) * 1.0 / (MAX(nn) - MAX(k))),
                           6) + 0
           END AS f_ratio
    FROM terms GROUP BY dim
    """,
)
def embed_fisher(spark, sf):
    """Per-dimension Fisher separability of the labeled embeddings:
    the one-way-ANOVA F ratio (between-class scatter over
    within-class scatter) computed for every embedding coordinate —
    the SUPERVISED complement to embed_dim_stats (which dims carry
    the label signal vs. which are noise — the feature-selection /
    probe-quality question asked before training any classifier on
    frozen embeddings; embed_kmeans asks the unsupervised version).
    Components quantize to integer MILLIS at the row (exact
    order-independent moment sums; millis not micros because
    s1^2 must stay in BIGINT headroom at corpus scale — the
    stat_theil rule), the corpus collapses once to |labels| x d
    moment cells, per-dim totals are windows over that bounded
    relation (the stat_mutual_info rule), each label's scatter
    terms quantize before the cross-label sum, and F is one
    identical float expression with k < 2 / degenerate-scatter
    guards to NULL. DuckDB's generate_subscripts is 1-based — the
    twin aligns to posexplode's 0-based dim (the qdata.py:241
    ordinality idiom)."""
    e = t(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    x = e.select("label", F.posexplode("embedding").alias("dim", "v"))
    qx = x.select(
        "label",
        "dim",
        F.round(F.lit(1000.0) * F.col("v").cast("double"))
        .cast("long")
        .alias("q"),
    )
    cells = qx.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("s2"),
    )
    wd = Window.partitionBy("dim")
    w = cells.select(
        "dim",
        "label",
        "n",
        "s1",
        "s2",
        F.sum("n").over(wd).alias("nn"),
        F.sum("s1").over(wd).alias("t1"),
        F.count(F.lit(1)).over(wd).alias("k"),
    )
    s1, n = F.col("s1"), F.col("n")
    terms = w.select(
        "dim",
        "nn",
        "k",
        "t1",
        F.round(s1 * F.lit(1.0) * s1 / n).cast("long").alias("sb_t"),
        F.round(F.col("s2") - s1 * F.lit(1.0) * s1 / n)
        .cast("long")
        .alias("sw_t"),
    )
    mk, mnn, mt1 = F.max("k"), F.max("nn"), F.max("t1")
    bad = (mk < 2) | (mnn <= mk) | (F.sum("sw_t") <= 0)
    fr = (
        (F.sum("sb_t") - mt1 * F.lit(1.0) * mt1 / mnn) / (mk - F.lit(1.0))
    ) / (F.sum("sw_t") * F.lit(1.0) / (mnn - mk))
    return terms.groupBy("dim").agg(
        mk.cast("long").alias("n_labels"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(fr, 6) + F.lit(0.0))
        .alias("f_ratio"),
    ).select(
        F.col("dim").cast("int").alias("dim_idx"), "n_labels", "f_ratio"
    )


# ---------------------------------------------------------------------------
# embedding drift — centroid shift between md5 halves
# ---------------------------------------------------------------------------
@q(
    "embed_drift",
    """
    WITH e AS (
      SELECT vec_id, embedding,
             substr(md5('drift:' || CAST(vec_id AS VARCHAR)), 1, 1) < '8'
               AS in_a
      FROM embeddings WHERE embedding IS NOT NULL),
    x AS (
      SELECT in_a, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(round(1000000.0 * CAST(unnest(embedding) AS DOUBLE))
                  AS BIGINT) AS q
      FROM e),
    c AS (
      SELECT in_a, dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s
      FROM x GROUP BY in_a, dim),
    p AS (
      SELECT dim,
             MAX(CASE WHEN in_a THEN s * 1.0 / n END) AS ma,
             MAX(CASE WHEN NOT in_a THEN s * 1.0 / n END) AS mb
      FROM c GROUP BY dim),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS d,
             SUM((ma - mb) * (ma - mb)) AS d2,
             SUM(ma * mb) AS dot, SUM(ma * ma) AS na2,
             SUM(mb * mb) AS nb2
      FROM p WHERE ma IS NOT NULL AND mb IS NOT NULL)
    SELECT d,
           round(sqrt(d2) / 1000000.0, 6) + 0 AS centroid_l2,
           CASE WHEN na2 <= 0 OR nb2 <= 0 THEN NULL
                ELSE round(dot / sqrt(na2 * nb2), 6) + 0
           END AS centroid_cos
    FROM agg
    """,
)
def embed_drift(spark, sf):
    """Embedding drift between the two md5 halves of the corpus:
    L2 distance and cosine between the half-centroids — the
    embedding-space counterpart to ml_psi's scalar drift monitor
    (an upgraded encoder or a shifted input mix moves the centroid
    long before any per-dimension histogram looks alarming; the
    cosine says whether it moved DIRECTIONALLY or just scaled).
    Components quantize to integer micros at the row (exact
    order-independent per-half, per-dim sums — the embed_fisher
    discipline), the per-dim half-means pivot via grouped MAX-CASE
    (the kg_delta reconciliation idiom, never a self-join of two
    filtered branches), and the d-dimensional folds (d2, dot,
    norms) run over the d-row relation — float sums over ~64 rows
    in deterministic single-partition order after the micros
    quantization pins every input. Degenerate (zero-norm) halves
    NULL the cosine. Monitor reading: under no drift the L2 shrinks
    toward 0 as n grows — but for ZERO-CENTERED embeddings the
    half-centroids are noise vectors, so the cosine between them is
    arbitrary (informative only when centroids sit away from the
    origin); alert on L2 against a bootstrap baseline, never on cos
    alone — the fixture (cos ~ -0.12 on iid halves) pins that
    lesson in tests/test_wave71.py."""
    e = t(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select(
        F.posexplode("embedding").alias("dim", "v"),
        (
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("drift:"), F.col("vec_id").cast("string")
                    )
                ),
                1,
                1,
            )
            < "8"
        ).alias("in_a"),
    )
    x = e.select(
        "in_a",
        "dim",
        F.round(F.lit(1000000.0) * F.col("v").cast("double"))
        .cast("long")
        .alias("q"),
    )
    c = x.groupBy("in_a", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("s"),
    )
    p = c.groupBy("dim").agg(
        F.max(
            F.when(F.col("in_a"), F.col("s") * F.lit(1.0) / F.col("n"))
        ).alias("ma"),
        F.max(
            F.when(~F.col("in_a"), F.col("s") * F.lit(1.0) / F.col("n"))
        ).alias("mb"),
    )
    ma, mb = F.col("ma"), F.col("mb")
    agg = p.filter(ma.isNotNull() & mb.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum((ma - mb) * (ma - mb)).alias("d2"),
        F.sum(ma * mb).alias("dot"),
        F.sum(ma * ma).alias("na2"),
        F.sum(mb * mb).alias("nb2"),
    )
    return agg.select(
        "d",
        (
            F.round(F.sqrt(F.col("d2")) / F.lit(1000000.0), 6) + F.lit(0.0)
        ).alias("centroid_l2"),
        F.when(
            (F.col("na2") <= 0) | (F.col("nb2") <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.col("dot") / F.sqrt(F.col("na2") * F.col("nb2")), 6
            )
            + F.lit(0.0)
        )
        .alias("centroid_cos"),
    )


# ---------------------------------------------------------------------------
# wave 104: product quantization — the PQ codebook over subspace
# k-means, the vector-store compression path IVF leaves out
# ---------------------------------------------------------------------------
def _pq_half_sql(tag: int, lo: int, hi: int) -> str:
    """Unrolled 2-round Lloyd CTE chain over list_slice(embedding,
    lo, hi) — the embed_kmeans twin structure parameterized by
    subspace."""
    sub = f"list_slice(embedding, {lo}, {hi})"
    cos = _IVF_COS.format(a="v.emb", b="c.cv", an="v.vn", bn="c.cn")
    return f"""
    vecs{tag} AS (
      SELECT vec_id, {sub} AS emb,
             {_NORM.format(v=sub)} AS vn
      FROM embeddings),
    icents{tag} AS (
      SELECT vec_id AS cid, emb AS cv, vn AS cn
      FROM vecs{tag} ORDER BY vec_id LIMIT {_SEM_K}),
    a{tag}0 AS (
      SELECT v.vec_id, v.emb, v.vn, c.cid,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY {cos} DESC, c.cid) AS rn
      FROM vecs{tag} v, icents{tag} c),
    cell{tag}0 AS (SELECT vec_id, emb, vn, cid FROM a{tag}0 WHERE rn = 1),
    upd{tag} AS (
      SELECT cid, i, round(AVG(CAST(emb[i] AS DOUBLE)), 6) AS x
      FROM cell{tag}0 CROSS JOIN
           (SELECT unnest(generate_series(1, {hi - lo + 1})) AS i) dims
      GROUP BY cid, i),
    cents{tag}1 AS (
      SELECT cid, cv, {_NORM.format(v='cv')} AS cn
      FROM (SELECT cid, array_agg(x ORDER BY i) AS cv
            FROM upd{tag} GROUP BY cid)),
    a{tag}1 AS (
      SELECT v.vec_id, c.cid,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY {cos} DESC, c.cid) AS rn
      FROM vecs{tag} v, cents{tag}1 c),
    code{tag} AS (SELECT vec_id, cid AS c{tag} FROM a{tag}1 WHERE rn = 1)
    """


@q(
    "embed_pq_codebook",
    f"""
    WITH {_pq_half_sql(0, 1, _EMB_DIM // 2)},
    {_pq_half_sql(1, _EMB_DIM // 2 + 1, _EMB_DIM)}
    SELECT code0.c0, code1.c1,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(code0.vec_id) AS BIGINT) AS id_sum
    FROM code0 JOIN code1 USING (vec_id)
    GROUP BY code0.c0, code1.c1
    """,
)
def embed_pq_codebook(spark, sf):
    """Product quantization — the vector-COMPRESSION half of the ANN
    stack (ann_ivf_topk prunes the SEARCH; PQ is how a 100-TB vector
    store fits RAM at all: d-dim float32 -> m subspace code bytes,
    a 128x shrink at m=8/d=256). The embedding splits into two
    halves, each clustered by the SAME deterministic 2-round Lloyd
    machinery as embed_kmeans (lowest-id init, round-6 cosine with
    cid tie-break, round-6 centroid components — the float-parity
    contract operators/clustering.py documents), and each vector's
    PQ code is its (c0, c1) centroid pair; the face emits the code
    HISTOGRAM with per-code id-sums pinning the exact assignment.
    Scale shape: per half, assignment is map-only against broadcast-
    literal centroids and re-estimation is one k x (d/2) agg — the
    corpus is scanned per round but NEVER shuffled by vector; the
    final code join is vec_id-keyed (in production the two halves
    are computed in ONE pass — here they share the parquet scan and
    AQE dedups nothing more because each half prunes to its slice).
    Real PQ trains on residuals after coarse IVF and uses 8-256
    centroids per subspace; the 2x8 layout is the same algebra at
    test scale."""
    emb = t(spark, sf, "embeddings")
    half_dim = _EMB_DIM // 2
    codes = []
    for h, lo in enumerate((1, half_dim + 1)):
        sub = emb.select(
            "vec_id",
            F.slice("embedding", lo, half_dim).alias("embedding"),
        )
        assigned, _ = clustering.lloyd_kmeans(sub, k=_SEM_K, iters=2)
        codes.append(
            assigned.select("vec_id", F.col("cid").alias(f"c{h}"))
        )
    code = codes[0].join(codes[1], "vec_id")
    return code.groupBy("c0", "c1").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("vec_id").cast("long").alias("id_sum"),
    )


# ---------------------------------------------------------------------------
# wave 119: truncation-energy profile — Matryoshka-style retained
# energy per dimension prefix
# ---------------------------------------------------------------------------
@q(
    "embed_truncation",
    """
    WITH e0 AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS j, embedding
      FROM embeddings),
    q0 AS (
      SELECT j,
             CAST(round(1000000.0 * (CAST(embedding[j + 1] AS DOUBLE)
                  * CAST(embedding[j + 1] AS DOUBLE))) AS BIGINT) AS q
      FROM e0),
    dimsum AS (
      SELECT j, CAST(SUM(q) AS BIGINT) AS e FROM q0 GROUP BY j),
    cum AS (
      SELECT j, SUM(e) OVER (ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ce,
             SUM(e) OVER () AS te
      FROM dimsum)
    SELECT CAST(j + 1 AS BIGINT) AS k,
           CAST(ce AS BIGINT) AS energy_mic,
           CASE WHEN te = 0 THEN NULL
                ELSE round(CAST(ce AS DOUBLE) / te, 6) + 0
           END AS retained
    FROM cum WHERE j + 1 IN (8, 16, 32, 64)
    """,
)
def embed_truncation(spark, sf):
    """Dimension-truncation energy profile — what fraction of the
    corpus's total embedding energy the first k dimensions retain
    (k = 8, 16, 32, 64), the measurement behind every
    Matryoshka-style 'can we serve the 16-dim prefix?' decision:
    retained energy bounds the cosine error a truncated index
    introduces, so this one report prices the ANN memory/recall
    trade BEFORE re-indexing 10^11 vectors. Per-component squared
    energies are micros-quantized (the embed_norms discipline —
    exact order-independent BIGINT sums), the 64 per-dimension
    totals cumulate in one window over the DIMENSION-bounded
    relation, and the retained fractions are final floats with a
    zero-corpus NULL guard. Index parity: Spark posexplode is
    0-based, DuckDB arrays are 1-based — range(0, len) + [j + 1]
    on the twin (the embed_fisher lesson). Scale shape: one scan,
    one explode bounded by d = 64, everything downstream is
    64 rows."""
    e = t(spark, sf, "embeddings").select(
        F.posexplode("embedding").alias("j", "x")
    )
    q0 = e.select(
        "j",
        F.round(
            F.lit(1000000.0)
            * F.col("x").cast("double")
            * F.col("x").cast("double")
        )
        .cast("long")
        .alias("q"),
    )
    dimsum = q0.groupBy("j").agg(F.sum("q").cast("long").alias("e"))
    cum = dimsum.select(
        "j",
        F.sum("e")
        .over(
            Window.orderBy("j").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("ce"),
        F.sum("e").over(Window.partitionBy()).alias("te"),
    )
    return cum.filter((F.col("j") + 1).isin(8, 16, 32, 64)).select(
        (F.col("j") + 1).cast("long").alias("k"),
        F.col("ce").cast("long").alias("energy_mic"),
        F.when(F.col("te") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("ce").cast("double") / F.col("te"), 6)
            + F.lit(0.0)
        )
        .alias("retained"),
    )


# ---------------------------------------------------------------------------
# wave 120: hard-negative margin report — per-label centroid margins
# with exact per-component micros sums
# ---------------------------------------------------------------------------
@q(
    "embed_margin",
    """
    WITH e0 AS (
      SELECT vec_id, label, unnest(range(0, len(embedding))) AS j,
             embedding
      FROM embeddings),
    comp AS (
      SELECT vec_id, label, j,
             CAST(embedding[j + 1] AS DOUBLE) AS x
      FROM e0),
    cents AS (
      SELECT label AS clab, j, round(AVG(x), 6) AS c
      FROM comp GROUP BY label, j),
    q AS (
      SELECT v.vec_id, v.label, c.clab,
             CAST(round(1000000.0 * (v.x - c.c) * (v.x - c.c))
                  AS BIGINT) AS qm
      FROM comp v JOIN cents c ON c.j = v.j),
    d2 AS (
      SELECT vec_id, label, clab, CAST(SUM(qm) AS BIGINT) AS d2mic
      FROM q GROUP BY vec_id, label, clab),
    m AS (
      SELECT vec_id, label,
             MAX(CASE WHEN clab = label THEN d2mic END) AS own,
             MIN(CASE WHEN clab <> label THEN d2mic END) AS other
      FROM d2 GROUP BY vec_id, label)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN other - own < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations,
           CAST(SUM(other - own) AS BIGINT) AS sum_margin_mic
    FROM m GROUP BY label
    """,
)
def embed_margin(spark, sf):
    """Hard-negative margin report — for every labeled vector, the
    gap between its squared distance to the NEAREST FOREIGN label
    centroid and to its OWN: negative margins are the hard examples
    a contrastive trainer should mine and a labeler should re-check,
    and the per-label violation counts are the 'which classes bleed
    into each other' report that prices a classifier before training
    one. Centroid components are rounded to 6 on BOTH engines before
    any distance (the embed_kmeans assignment-parity rule), each
    per-component squared gap is micros-quantized and the 64-term
    distance is an exact integer SUM (the embed_norms discipline —
    never a float accumulation whose order could differ), so own,
    min-other, margins, and the per-label sums are all exact
    BIGINTs. Scale shape: one explode of the corpus, a
    labels x dims (bounded) centroid relation joined on the dim key
    — the corpus never self-joins; the x|labels| fan-out is the
    explicit, bounded cost (10 here; production prunes candidates
    with an IVF-style shortlist first, the dedup_semantic route)."""
    comp = t(spark, sf, "embeddings").select(
        "vec_id", "label", F.posexplode("embedding").alias("j", "xf")
    ).select("vec_id", "label", "j", F.col("xf").cast("double").alias("x"))
    from ..operators.dedup import parquet_checkpoint

    comp = parquet_checkpoint(comp, "margin_comp")
    cents = comp.groupBy(
        F.col("label").alias("clab"), "j"
    ).agg(F.round(F.avg("x"), 6).alias("c"))
    q = comp.join(cents, "j").select(
        "vec_id",
        "label",
        "clab",
        F.round(
            F.lit(1000000.0)
            * (F.col("x") - F.col("c"))
            * (F.col("x") - F.col("c"))
        )
        .cast("long")
        .alias("qm"),
    )
    d2 = q.groupBy("vec_id", "label", "clab").agg(
        F.sum("qm").cast("long").alias("d2mic")
    )
    m = d2.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clab") == F.col("label"), F.col("d2mic"))
        ).alias("own"),
        F.min(
            F.when(F.col("clab") != F.col("label"), F.col("d2mic"))
        ).alias("other"),
    )
    return m.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("other") - F.col("own") < 0, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
        F.sum(F.col("other") - F.col("own"))
        .cast("long")
        .alias("sum_margin_mic"),
    )
