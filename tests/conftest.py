from __future__ import annotations

import pytest

from watermark_remove_spark.session import build_session
from watermark_remove_spark.fixtures import PagesConfig, generate_corpus


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="wrs-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(PagesConfig(n_pages=600, n_domains=8, seed=42))


@pytest.fixture(scope="session")
def pages_sdf(spark, corpus):
    df = spark.createDataFrame(corpus.pages)
    df.cache().count()
    return df
