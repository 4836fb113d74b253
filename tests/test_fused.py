"""Fused map-only annotator ≡ stage-by-stage relational pipeline
(plans/annotate_fused.py vs plans/annotate.py) — annotation-set and
score-level agreement on the fixture corpus."""

from __future__ import annotations

import pytest

from dbpedia_spotlight_db_spark.plans.annotate import AnnotateConfig, annotate
from dbpedia_spotlight_db_spark.plans.annotate_fused import annotate_fused


@pytest.fixture(scope="module")
def small_pages(spark, pages_df):
    return pages_df.limit(80).cache()


def _ann_map(df):
    return {
        (r.url, r.start, r.end, r.surface_form): (
            r.uri,
            round(r.score, 7),
            round(r.second_rank_ratio, 7),
        )
        for r in df.collect()
    }


def test_fused_equals_relational(spark, small_pages, stores):
    cfg = AnnotateConfig()
    fused = _ann_map(annotate_fused(spark, small_pages, stores, cfg))
    rel = _ann_map(annotate(spark, small_pages, stores, cfg))
    assert fused.keys() == rel.keys()
    for k, (uri_f, score_f, srr_f) in fused.items():
        uri_r, score_r, srr_r = rel[k]
        assert uri_f == uri_r, (k, uri_f, uri_r)
        assert score_f == pytest.approx(score_r, rel=1e-6, abs=1e-9)
        assert srr_f == pytest.approx(srr_r, rel=1e-6, abs=1e-9)


def test_fused_partition_independent(spark, small_pages, stores):
    cfg = AnnotateConfig()
    a = _ann_map(annotate_fused(spark, small_pages.repartition(1), stores, cfg))
    b = _ann_map(annotate_fused(spark, small_pages.repartition(13), stores, cfg))
    assert a == b


def test_triples_fused_equals_relational(spark, small_pages, stores):
    """Full P1-P3: the zero-exchange fused shape (baked canon +
    partition-local mention dedup) emits the same triple SET as the
    relational join/distinct shape."""
    from dbpedia_spotlight_db_spark.entrypoint import annotate_to_triples

    def tset(df):
        return {(r.subj, r.pred, r.obj) for r in df.collect()}

    fused = tset(
        annotate_to_triples(spark, small_pages.repartition(7), stores, mode="fused")
    )
    rel = tset(
        annotate_to_triples(spark, small_pages, stores, mode="relational")
    )
    assert fused == rel and fused
