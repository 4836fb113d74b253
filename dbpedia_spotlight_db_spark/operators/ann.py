"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force baseline — broadcast the (small) query
  set against the corpus; dot products via array higher-order
  functions entirely JVM-side (zip_with + aggregate in double).
- ``lsh_bucketed_topk``: the scale path — hyperplane LSH assigns each
  vector a sign-bit bucket (md5-derived ±1 planes embedded as array
  literals, dot products via JVM higher-order functions — zero
  Python, zero shuffle); top-k search runs only within the query's
  bucket (optionally with multi-probe neighbors). At 10^12 rows the
  bucket column becomes the partition key, so a query probes one
  partition instead of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _dot_expr(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " 0.0d, (acc, v) -> acc + v)"
    )


def _norm_expr(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate({a}, 0.0d, (acc, x) -> acc + cast(x as double) * cast(x as double))"
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).
    Cosine rounded to ``round_dp`` with vec_id tie-break so rankings
    are engine-deterministic. Output: qid, nid, cos, nn_rank."""
    # norms once per vector BEFORE the join (not O(|Q|*|C|) times
    # after), and zero-norm vectors score 0 instead of tripping ANSI
    # DIVIDE_BY_ZERO
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm_expr("qv"))
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")
    ).withColumn("nn", _norm_expr("nv"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .withColumn(
            "cos",
            F.round(
                F.when(
                    (F.col("qn") > 0) & (F.col("nn") > 0),
                    _dot_expr("qv", "nv") / (F.col("qn") * F.col("nn")),
                ).otherwise(F.lit(0.0)),
                round_dp,
            ),
        )
        .select("qid", "nid", "cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )


def ivf_centroid_rows(
    corpus: DataFrame, n_centroids: int, id_col: str, vec_col: str
) -> list:
    """The deterministic coarse quantizer: the ``n_centroids``
    lowest-id corpus vectors with precomputed norms, collected on the
    driver (model metadata — tiny). Shared by ``ivf_topk`` and
    tools/explain_audit.py so the audited assignment plan is built
    from EXACTLY the production quantizer."""
    return (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .withColumn("cn", _norm_expr("cv"))
        .collect()
    )


def _assign_cells(
    df: DataFrame, cent_rows: list, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid (max-cosine) cell per vector, MAP-ONLY. The
    coarse quantizer is model metadata — ``cent_rows`` is the tiny
    centroid table collected once on the driver (like the broadcast
    AC dictionary) and embedded as an array-of-structs literal; the
    argmax runs INSIDE the row via array HOFs (array_max over
    (cos, -cid) structs), so assignment adds ZERO Exchange. The
    previous join+window form shuffled corpus × n_centroids rows
    through a per-vector sort. Deterministic tie-break on lowest cid
    (lexicographic struct max: cos desc, then -cid max = cid asc)."""
    if not cent_rows:
        # empty corpus -> empty quantizer: F.array() with no elements
        # is VOID-typed and the HOF lambda fails at ANALYSIS time even
        # though zero rows would flow. No cells exist, so no vector
        # can be assigned — null cid keeps the schema and totality
        # (tests/test_empty_corpus.py)
        return df.select(F.col(id_col), F.col(vec_col)).withColumn(
            "cid", F.lit(None).cast("long")
        )
    cents = F.array(
        *[
            F.struct(
                F.lit(int(r["cid"])).cast("long").alias("cid"),
                F.array(*[F.lit(float(x)) for x in r["cv"]]).alias("cv"),
                F.lit(float(r["cn"])).alias("cn"),
            )
            for r in cent_rows
        ]
    )
    v = df.select(
        F.col(id_col), F.col(vec_col)
    ).withColumn("_vn", _norm_expr(vec_col))

    def _cos(c):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), c["cv"], lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        return F.round(
            F.when(
                (F.col("_vn") > 0) & (c["cn"] > 0),
                dot / (F.col("_vn") * c["cn"]),
            ).otherwise(F.lit(0.0)),
            6,
        )

    best = F.array_max(
        F.transform(
            cents,
            lambda c: F.struct(_cos(c).alias("cc"), (-c["cid"]).alias("ncid")),
        )
    )
    return v.withColumn("cid", -best["ncid"]).select(
        id_col, vec_col, "cid"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k: a coarse quantizer assigns every
    vector to its nearest centroid's cell; a query searches only its
    own cell (nprobe=1), with exact cosine ranking inside.

    The quantizer here is deterministic — the ``n_centroids``
    lowest-id corpus vectors stand in for offline k-means centroids
    (the quantizer is a pluggable input at scale; determinism makes
    the operator DuckDB-oracle checkable). At corpus scale the cell id
    becomes the partition/bucket key, so a query probes one partition
    instead of the corpus — same plan shape as lsh_bucketed_topk with
    a learned instead of random partitioner."""
    cent_rows = ivf_centroid_rows(corpus, n_centroids, id_col, vec_col)
    c_cells = _assign_cells(corpus, cent_rows, id_col, vec_col)
    q_cells = _assign_cells(queries, cent_rows, id_col, vec_col)
    q = q_cells.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), "cid"
    ).withColumn("qn", _norm_expr("qv"))
    c = c_cells.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"), "cid"
    ).withColumn("nn", _norm_expr("nv"))
    scored = (
        c.join(F.broadcast(q), ["cid"])
        .filter(F.col("qid") != F.col("nid"))
        .withColumn(
            "cos",
            F.round(
                F.when(
                    (F.col("qn") > 0) & (F.col("nn") > 0),
                    _dot_expr("qv", "nv") / (F.col("qn") * F.col("nn")),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .select("qid", "nid", "cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )


def sign_planes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic Rademacher (±1) hyperplanes: sign(p, i) = +1 iff
    the first hex nibble of md5(f"{p}:{i}") is odd. Sign-only random
    projections are standard LSH (E[sgn agreement] still tracks the
    angle); deriving them from md5 instead of an RNG makes the bucket
    assignment reproducible in ANY engine with md5 — the DuckDB
    oracle twin inlines the same signs bit-for-bit."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0], 16) % 2
            else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hyperplane-LSH bucket per vector, fully JVM-side: the (tiny)
    plane matrix is built on the driver (model metadata, like the
    broadcast AC dictionary) and embedded as array literals; each bit
    is a zip_with/aggregate dot product inside whole-stage codegen —
    no Python boundary, no shuffle."""
    planes = sign_planes(dim, n_planes)
    bits = []
    for p in range(n_planes):
        lit = F.array(*[F.lit(s) for s in planes[p]])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), lit, lambda x, c: x.cast("double") * c
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn("bucket", F.concat(*bits))


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine within. ``multiprobe=True`` also probes
    every bucket at Hamming distance 1 (flip each sign bit once) —
    the standard recall lever when buckets are sparse: the QUERY side
    fans out n_planes+1 ways (tiny), the corpus is still touched only
    at its own buckets, so at scale a query reads 1+n_planes
    partitions instead of the corpus."""
    qb = hyperplane_buckets(queries, dim, n_planes, id_col=id_col, vec_col=vec_col)
    cb = hyperplane_buckets(corpus, dim, n_planes, id_col=id_col, vec_col=vec_col)
    if multiprobe:
        probes = [F.col("bucket")] + [
            F.concat(
                F.substring("bucket", 1, i),
                F.when(
                    F.substring("bucket", i + 1, 1) == "1", F.lit("0")
                ).otherwise(F.lit("1")),
                F.expr(f"substring(bucket, {i + 2})"),
            )
            for i in range(n_planes)
        ]
        qb = qb.withColumn("bucket", F.explode(F.array(*probes)))
    q = qb.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), "bucket"
    ).withColumn("qn", _norm_expr("qv"))
    c = cb.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"), "bucket"
    ).withColumn("nn", _norm_expr("nv"))
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("qid") != F.col("nid"))
        .withColumn(
            "cos",
            F.round(
                F.when(
                    (F.col("qn") > 0) & (F.col("nn") > 0),
                    _dot_expr("qv", "nv") / (F.col("qn") * F.col("nn")),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .select("qid", "nid", "cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )
