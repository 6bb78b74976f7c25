import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from spidey_search_engine_spark.session import get_spark
    s = get_spark(app="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    from spidey_search_engine_spark.sources.corpus import generate_corpus_pdf
    return generate_corpus_pdf(400, seed=42)


@pytest.fixture(scope="session")
def index_dir(spark, corpus_pdf, tmp_path_factory):
    """Path of the built index over the 400-doc synthetic corpus."""
    from spidey_search_engine_spark.operators.build import build_index
    out = str(tmp_path_factory.mktemp("idx"))
    corpus = spark.createDataFrame(corpus_pdf).repartition(8)
    build_index(spark, corpus, out, profile="code", seg_bits=8, n_buckets=8)
    return out


@pytest.fixture(scope="session")
def index(spark, index_dir):
    """Built index over the 400-doc synthetic corpus (code profile)."""
    from spidey_search_engine_spark.operators.build import load_index
    return load_index(spark, index_dir)
