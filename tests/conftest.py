from __future__ import annotations

import pytest

from dbpedia_spotlight_db_spark import fixtures
from dbpedia_spotlight_db_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_pdf():
    return fixtures.gen_pages(n_pages=200)


@pytest.fixture(scope="session")
def wiki_pdf():
    return fixtures.gen_wiki_corpus(n_wiki=400)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    from dbpedia_spotlight_db_spark import schemas

    return spark.createDataFrame(pages_pdf, schema=schemas.PAGES).cache()


@pytest.fixture(scope="session")
def wiki_df(spark, wiki_pdf):
    from dbpedia_spotlight_db_spark import schemas

    return spark.createDataFrame(wiki_pdf, schema=schemas.WIKI_CORPUS).cache()


@pytest.fixture(scope="session")
def stores(spark, wiki_df):
    from dbpedia_spotlight_db_spark.plans.build_stores import build_stores

    return build_stores(spark, wiki_df)
