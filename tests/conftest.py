import pytest

from tstore_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tstore_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    from tstore_spark.datagen import pages_pandas

    return pages_pandas(rows=3000)


@pytest.fixture(scope="session")
def pages_sdf(spark, pages_pdf):
    return spark.createDataFrame(pages_pdf).cache()
