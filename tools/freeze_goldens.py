"""Freeze golden annotation/triple outputs for the fixture corpus
(SURVEY.md §5.2: frozen goldens stand in for the reference annotator's
outputs while /root/reference is empty — §0.4).

Deterministic end to end: seed-fixed fixtures, deterministic stores,
deterministic scoring tie-breaks. Regenerate ONLY on an intentional
semantic change (then review the diff like any golden update):

    python tools/freeze_goldens.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "golden"


def main() -> None:
    from dbpedia_spotlight_db_spark import fixtures, schemas
    from dbpedia_spotlight_db_spark.plans.annotate import AnnotateConfig, annotate
    from dbpedia_spotlight_db_spark.plans.build_stores import build_stores
    from dbpedia_spotlight_db_spark.plans.materialize import (
        canonical_annotations,
        materialize_triples,
    )
    from dbpedia_spotlight_db_spark.session import get_spark

    spark = get_spark("freeze-goldens", cores=8, shuffle_partitions=8)
    pages = spark.createDataFrame(fixtures.gen_pages(n_pages=200), schema=schemas.PAGES)
    wiki = spark.createDataFrame(
        fixtures.gen_wiki_corpus(n_wiki=400), schema=schemas.WIKI_CORPUS
    )
    stores = build_stores(spark, wiki)
    ann = annotate(spark, pages, stores, AnnotateConfig())
    red = spark.createDataFrame(fixtures.gen_redirects(), schema=schemas.REDIRECTS)
    dis = spark.createDataFrame(
        fixtures.gen_disambiguations(), schema=schemas.DISAMBIGUATIONS
    )
    canon = canonical_annotations(ann, red, dis).persist()
    triples = materialize_triples(canon, stores["entities"])

    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    canon.select(
        "url", "start", "end", "surface_form", "uri", "score"
    ).toPandas().sort_values(["url", "start", "end"]).to_parquet(
        GOLDEN_DIR / "annotations.parquet", index=False
    )
    triples.toPandas().sort_values(["subj", "pred", "obj"]).to_parquet(
        GOLDEN_DIR / "triples.parquet", index=False
    )
    print("frozen:", GOLDEN_DIR, "annotations:", canon.count(), "triples:", triples.count())


if __name__ == "__main__":
    main()
