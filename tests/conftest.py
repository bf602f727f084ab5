import pytest


@pytest.fixture(scope="session")
def spark():
    from igtdetect_spark.session import build_session

    s = build_session(
        app_name="igtdetect_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()
