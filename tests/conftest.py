import pytest


@pytest.fixture(scope="session")
def spark():
    from company_name_matching_spark.session import get_spark

    s = get_spark(app_name="pytest", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
