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

from pyspark.sql import functions as F

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
