"""End-to-end P0-P3 (SURVEY.md §3.2): annotate -> canonicalize ->
triples, plus determinism (golden P/R == 1.0 across runs/partitionings)
and scorer-path equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark import fixtures, schemas
from dbpedia_spotlight_db_spark.plans.annotate import (
    AnnotateConfig,
    annotate,
)
from dbpedia_spotlight_db_spark.plans.materialize import (
    canonical_annotations,
    materialize_triples,
)


@pytest.fixture(scope="module")
def small_pages(spark, pages_df):
    return pages_df.limit(60).cache()


def _ann_set(df):
    return {
        (r.url, r.start, r.end, r.surface_form, r.uri) for r in df.collect()
    }


def test_annotate_end_to_end(spark, small_pages, stores):
    ann = annotate(spark, small_pages, stores, AnnotateConfig())
    rows = ann.collect()
    assert len(rows) > 0
    # every annotation is a real dictionary hit with sane span
    for r in rows[:50]:
        assert r.end > r.start >= 0
        assert r.uri.startswith("dbr:")
        assert r.score > 0


def test_annotate_deterministic_across_partitionings(spark, small_pages, stores):
    a = _ann_set(
        annotate(spark, small_pages.repartition(1), stores, AnnotateConfig())
    )
    b = _ann_set(
        annotate(spark, small_pages.repartition(13), stores, AnnotateConfig())
    )
    assert a == b


def test_scorer_paths_agree(spark, small_pages, stores):
    """Vectorized-UDF cosine ≡ relational cosine (argmax level)."""
    a = _ann_set(
        annotate(
            spark, small_pages, stores, AnnotateConfig(scorer="pandas")
        )
    )
    b = _ann_set(
        annotate(
            spark, small_pages, stores, AnnotateConfig(scorer="relational")
        )
    )
    assert a == b


def test_triples_materialize(spark, small_pages, stores):
    ann = annotate(spark, small_pages, stores, AnnotateConfig())
    red = spark.createDataFrame(fixtures.gen_redirects(), schema=schemas.REDIRECTS)
    dis = spark.createDataFrame(
        fixtures.gen_disambiguations(), schema=schemas.DISAMBIGUATIONS
    )
    canon = canonical_annotations(ann, red, dis)
    triples = materialize_triples(canon, stores["entities"])
    rows = triples.collect()
    assert rows
    preds = {r.pred for r in rows}
    assert "dbo:mentions" in preds
    # canonicalization: no triple may point at a redirect source
    red_srcs = {r.src_uri for r in fixtures.gen_redirects().itertuples(index=False)}
    # cycle members legitimately stay
    red_srcs -= {"dbr:Entity_198", "dbr:Entity_199"}
    objs = {r.obj for r in rows if r.pred == "dbo:mentions"}
    assert not (objs & red_srcs)
    # no disambiguation targets
    dis_set = set(fixtures.gen_disambiguations()["uri"])
    assert not (objs & dis_set)
