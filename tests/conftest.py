import pytest


@pytest.fixture(scope="session")
def spark():
    from gregor_spark.session import get_spark

    s = get_spark(app="gregor-tests", master="local[4]", shuffle_partitions=8)
    yield s
