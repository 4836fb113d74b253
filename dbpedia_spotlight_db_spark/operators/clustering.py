"""Embedding-space clustering operators: Lloyd k-means iterations and
SemDeDup-style cluster-then-dedup (Abbas et al. 2023: semantic
deduplication = cluster the embedding space, then drop near-identical
pairs WITHIN a cluster, never across the corpus).

Both reuse the ANN module's deterministic primitives: the coarse
quantizer (lowest-id vectors as initial centroids) and the MAP-ONLY
cell assignment (centroids embedded as an array literal, argmax inside
the row — zero Exchange; see operators/ann.py::_assign_cells and the
EXPLAIN_AUDIT "IVF assignment is map-only" check).

Cross-engine float discipline: every cosine is rounded to 6 with a
deterministic centroid-id tie-break before any comparison, and updated
centroid components are rounded to 6 on BOTH engines before the next
assignment — so cluster membership can never hinge on a sub-ulp
difference in summation order between Spark's partial aggregates and
DuckDB's AVG.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .ann import _assign_cells, _dot_expr, _norm_expr, ivf_centroid_rows


def update_centroids(assigned: DataFrame, vec_col: str) -> list:
    """Elementwise mean per cell -> driver-side centroid rows (the
    k x d model update Lloyd re-broadcasts each iteration; k*d values
    — tiny, like the AC dictionary). Components round to 6 so the
    next assignment is engine-deterministic."""
    rows = (
        assigned.select("cid", F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("x"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "x"))),
                lambda s: s["x"],
            ).alias("cv")
        )
        .collect()
    )
    return [
        {
            "cid": r["cid"],
            "cv": list(r["cv"]),
            "cn": math.sqrt(sum(x * x for x in r["cv"])),
        }
        for r in rows
    ]


def lloyd_kmeans(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list]:
    """``iters`` rounds of Lloyd's algorithm over an embedding column
    (cosine assignment): the canonical ITERATIVE pattern on Spark —
    per-iteration map-only assignment against a broadcast-literal
    centroid table, one vocabulary-sized agg to re-estimate the k x d
    model, collect the tiny model to the driver, repeat. The corpus
    is scanned ``iters`` times but never shuffled by vector; the only
    exchanges carry k*d partial means.

    Initialization is the deterministic coarse quantizer (the k
    lowest-id vectors), so runs are reproducible and the DuckDB twin
    can unroll the same iterations exactly. Returns (assignment
    DataFrame (id, vec, cid), final centroid rows)."""
    cents = ivf_centroid_rows(corpus, k, id_col, vec_col)
    for _ in range(iters - 1):
        assigned = _assign_cells(corpus, cents, id_col, vec_col)
        cents = update_centroids(assigned, vec_col)
    return _assign_cells(corpus, cents, id_col, vec_col), cents


def cluster_dedup(
    corpus: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: assign every vector to its nearest-centroid cell
    (map-only), find near-duplicate pairs ONLY within a cell (cosine
    >= ``threshold``, rounded to 6), and keep the lowest id of each
    near-dup relation. Returns survivors as (id, cid).

    Scale shape: the pairwise stage is the IVF-cell self-join — at
    10^12 vectors n_centroids grows to O(corpus / target-cell-size)
    (real SemDeDup uses ~100k k-means cells) so each cell's quadratic
    stays bounded; the join key is the cell id, the corpus shuffles
    once by cid, and the loser set joins back as a plain left_anti
    (no forced broadcast — dup fractions at web scale are
    corpus-proportional; cf. the dedup_survivors lesson)."""
    cents = ivf_centroid_rows(corpus, n_centroids, id_col, vec_col)
    cell = _assign_cells(corpus, cents, id_col, vec_col).withColumn(
        "_vn", _norm_expr(vec_col)
    )
    a = cell.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("_vn").alias("na"),
        "cid",
    )
    b = cell.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("_vn").alias("nb"),
        "cid",
    )
    cos = F.round(
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            _dot_expr("va", "vb") / (F.col("na") * F.col("nb")),
        ).otherwise(F.lit(0.0)),
        6,
    )
    losers = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return cell.join(losers, id_col, "left_anti").select(id_col, "cid")
