"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force baseline — broadcast the (small) query
  set against the corpus; dot products via array higher-order
  functions entirely JVM-side (zip_with + aggregate in double).
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH
  assigns each vector a sign-bit bucket (vectorized NumPy matmul in a
  pandas UDF over Arrow batches); top-k search runs only within the
  query's bucket (optionally with multi-probe neighbors). At 10^12
  rows the bucket column becomes the partition key, so a query probes
  one partition instead of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf
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


def _assign_cells(
    df: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid (max-cosine) cell per vector; deterministic
    tie-break on centroid id. Centroids broadcast."""
    v = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_vn", _norm_expr("_v"))
    scored = v.join(F.broadcast(cents)).withColumn(
        "_cc",
        F.round(
            F.when(
                (F.col("_vn") > 0) & (F.col("cn") > 0),
                _dot_expr("_v", "cv") / (F.col("_vn") * F.col("cn")),
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )
    w = Window.partitionBy("_id").orderBy(F.desc("_cc"), F.asc("cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("_v").alias(vec_col),
            "cid",
        )
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
    cents = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .withColumn("cn", _norm_expr("cv"))
    )
    c_cells = _assign_cells(corpus, cents, id_col, vec_col)
    q_cells = _assign_cells(queries, cents, id_col, vec_col)
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


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector. The plane matrix is
    seeded on the driver and broadcast implicitly via UDF closure; the
    UDF is a single NumPy matmul per Arrow batch (no per-row Python)."""
    planes = np.random.RandomState(seed).randn(dim, n_planes)

    @pandas_udf(T.StringType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        signs = (m @ planes) > 0
        return pd.Series(
            ["".join("1" if b else "0" for b in row) for row in signs]
        )

    return df.withColumn("bucket", _bucket(F.col(vec_col)))


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine within. Recall grows with fewer planes /
    multi-probe; partition corpus by bucket at scale."""
    qb = hyperplane_buckets(queries, dim, n_planes, id_col=id_col, vec_col=vec_col)
    cb = hyperplane_buckets(corpus, dim, n_planes, id_col=id_col, vec_col=vec_col)
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
