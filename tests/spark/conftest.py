import pytest

from deduce_spark.spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="deduce_spark_tests",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_path(tmp_path_factory):
    from deduce_spark.fixtures import write_pages_parquet

    out = tmp_path_factory.mktemp("pages")
    return str(write_pages_parquet(out, n_pages=80))


@pytest.fixture(scope="session")
def pipeline(spark, engine):
    from deduce_spark.spark.stages import AnnotatePipeline

    return AnnotatePipeline(spark, engine)
