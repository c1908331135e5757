import pytest

from search_engine_spark.operators.index_build import IndexConfig, build_index
from search_engine_spark.session import get_spark
from search_engine_spark.sources.synth import (DOCS_FIELDS, gen_docs_rows,
                                               synth_docs)
from oracle.pyref import OracleEngine, OracleIndex

N_DOCS = 120


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def docs_df(spark):
    return synth_docs(spark, N_DOCS).cache()


@pytest.fixture(scope="session")
def docs_index(docs_df):
    cfg = IndexConfig(id_col="id", fields=DOCS_FIELDS)
    ix = build_index(docs_df, cfg)
    ix.postings = ix.postings.cache()
    ix.doc_stats = ix.doc_stats.cache()
    ix.term_stats = ix.term_stats.cache()
    return ix


@pytest.fixture(scope="session")
def spark_engine(docs_index, docs_df):
    from search_engine_spark.plans.dsl import SparkSearchEngine
    return SparkSearchEngine(docs_index, docs_df)


@pytest.fixture(scope="session")
def oracle_engine():
    oix = OracleIndex(DOCS_FIELDS, id_col="id")
    for r in gen_docs_rows(N_DOCS):
        oix.add(r)
    return OracleEngine(oix)
