import pytest

from solr_indexer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[4]", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "4g"})
    yield s
