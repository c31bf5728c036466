import pytest


@pytest.fixture(scope="session")
def spark():
    from xutil_spark.session import get_session

    s = get_session(master="local[4]", app_name="xutil_spark_tests",
                    shuffle_partitions=8)
    yield s
