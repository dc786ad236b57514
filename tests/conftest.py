from __future__ import annotations

import pandas as pd
import pytest

from jvector_spark.corpus import generate_corpus, generate_queries
from jvector_spark.oracle import BM25Oracle
from jvector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("jvector_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf() -> pd.DataFrame:
    return generate_corpus(n_docs=300, seed=42)


@pytest.fixture(scope="session")
def queries_pdf(corpus_pdf) -> pd.DataFrame:
    return generate_queries(corpus_pdf, n_queries=40, seed=42)


@pytest.fixture(scope="session")
def oracle(corpus_pdf) -> BM25Oracle:
    return BM25Oracle(corpus_pdf)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf).repartition(8)
