"""P2+P3 — canonicalize annotations and materialize (subj, pred, obj)
triples (SURVEY.md §3.2; north_rule output contract).

Triple shape (FIXTURES.md §5):
    (url,            dbo:mentions, canonical_entity_uri)
    (canonical_uri,  rdf:type,     t)   for typed entities
Set-semantics, order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.closure import canonicalize, redirect_closure

PRED_MENTIONS = "dbo:mentions"
PRED_TYPE = "rdf:type"


def canonical_annotations(
    annotations: DataFrame,
    redirects: DataFrame,
    disambiguations: DataFrame,
) -> DataFrame:
    closure = redirect_closure(redirects)
    return canonicalize(annotations, closure, disambiguations)


def materialize_triples(
    canon: DataFrame, entities: DataFrame
) -> DataFrame:
    mention_triples = canon.select(
        F.col("url").alias("subj"),
        F.lit(PRED_MENTIONS).alias("pred"),
        F.col("uri").alias("obj"),
    ).distinct()
    used = canon.select(F.col("uri")).distinct()
    type_triples = (
        used.join(entities.select("uri", "types"), "uri", "inner")
        .select(
            F.col("uri").alias("subj"),
            F.lit(PRED_TYPE).alias("pred"),
            F.explode("types").alias("obj"),
        )
        .distinct()
    )
    return mention_triples.unionByName(type_triples)


def materialize_triples_from_annotations(
    annotations: DataFrame, entities: DataFrame, eager: bool = True
) -> DataFrame:
    """Triples straight from already-canonical annotations (the fused
    path bakes P2 into the map pass).

    Shuffle shape: ONE wide exchange — the (url, uri) distinct. Its
    result is persisted (and with ``eager=True`` materialized now):
    both triple branches read it, so the upstream map-only annotate
    pass over the corpus executes exactly once. At cluster scale this
    materialization is the P1/P2→P3 stage boundary that the
    lineage/resume layer checkpoints to the warehouse."""
    ment = annotations.select(
        F.col("url").alias("subj"), F.col("uri").alias("obj")
    ).distinct().persist()
    if eager:
        ment.count()
    mention_triples = ment.select(
        "subj", F.lit(PRED_MENTIONS).alias("pred"), "obj"
    )
    used = ment.select(F.col("obj").alias("uri")).distinct()
    type_triples = (
        used.join(F.broadcast(entities.select("uri", "types")), "uri", "inner")
        .select(
            F.col("uri").alias("subj"),
            F.lit(PRED_TYPE).alias("pred"),
            F.explode("types").alias("obj"),
        )
        .distinct()
    )
    return mention_triples.unionByName(type_triples)
