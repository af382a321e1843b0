import pytest

from usgs_geomag_algorithms_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=4)
    yield s


def long_rows(spark, rows, schema="url string, channel string, t_us long, value double"):
    return spark.createDataFrame(rows, schema=schema)
