import pytest


@pytest.fixture(scope="session")
def spark():
    from lsh_project_spark.session import get_spark

    s = get_spark(app="tests", cores=8, shuffle_partitions=16)
    yield s
    s.stop()
