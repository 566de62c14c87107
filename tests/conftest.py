import pytest


@pytest.fixture(scope="session")
def spark():
    from name_matching_spark.session import get_spark

    s = get_spark(app_name="nm-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()
