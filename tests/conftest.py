import pytest


@pytest.fixture(scope="session")
def spark():
    from dataframes_spark import get_spark

    return get_spark(app_name="dataframes_spark_tests", cpus="8")


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
