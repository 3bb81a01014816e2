import pytest


@pytest.fixture(scope="session")
def spark():
    from optbinning_spark import get_spark

    s = get_spark("optbinning_spark_tests", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
