"""Golden P/R gate (north_rule: linking P/R >= 0.95 vs reference
annotations; frozen goldens stand in per SURVEY.md §0.4). Both
pipeline paths must reproduce the frozen golden annotation set at
P/R == 1.0, and the triples at set equality."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from dbpedia_spotlight_db_spark import fixtures, schemas
from dbpedia_spotlight_db_spark.operators.evaluate import precision_recall
from dbpedia_spotlight_db_spark.plans.annotate import AnnotateConfig, annotate
from dbpedia_spotlight_db_spark.plans.annotate_fused import annotate_fused, build_model
from dbpedia_spotlight_db_spark.plans.materialize import (
    canonical_annotations,
    materialize_triples,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def gold_ann(spark):
    return spark.createDataFrame(
        pd.read_parquet(os.path.join(GOLDEN, "annotations.parquet"))
    )


@pytest.fixture(scope="module")
def closure_inputs(spark):
    red = spark.createDataFrame(fixtures.gen_redirects(), schema=schemas.REDIRECTS)
    dis = spark.createDataFrame(
        fixtures.gen_disambiguations(), schema=schemas.DISAMBIGUATIONS
    )
    return red, dis


def test_relational_path_matches_golden(spark, pages_df, stores, gold_ann, closure_inputs):
    red, dis = closure_inputs
    ann = annotate(spark, pages_df, stores, AnnotateConfig())
    canon = canonical_annotations(ann, red, dis)
    pr = precision_recall(canon, gold_ann)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, pr


def test_fused_path_matches_golden(spark, pages_df, stores, gold_ann, closure_inputs):
    red, dis = closure_inputs
    model_bc = spark.sparkContext.broadcast(build_model(stores, red, dis))
    ann = annotate_fused(spark, pages_df, stores, AnnotateConfig(), model_bc)
    pr = precision_recall(ann, gold_ann)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, pr


def test_triples_match_golden(spark, pages_df, stores, closure_inputs):
    red, dis = closure_inputs
    ann = annotate(spark, pages_df, stores, AnnotateConfig())
    canon = canonical_annotations(ann, red, dis)
    triples = materialize_triples(canon, stores["entities"])
    got = {(r.subj, r.pred, r.obj) for r in triples.collect()}
    gold = {
        tuple(r)
        for r in pd.read_parquet(os.path.join(GOLDEN, "triples.parquet")).itertuples(
            index=False
        )
    }
    assert got == gold
