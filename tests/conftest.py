import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "real_models: end-to-end with REAL dense/cross-encoder/decoder "
        "models — runs only when SPARK_GRAFT_REAL_MODELS=1 and the model "
        "libraries (torch / sentence-transformers / PIL) are importable; "
        "skipped (documented env-limit) in this sandbox",
    )


@pytest.fixture(scope="session")
def spark():
    from company_name_matching_spark.session import get_spark

    s = get_spark(app_name="pytest", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
