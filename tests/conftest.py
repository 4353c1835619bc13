import pytest

from tika_xapian_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tika-xapian-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
