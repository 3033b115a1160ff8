import pytest

from tika_wrap_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(master="local[8]", app_name="tika_wrap_spark-tests",
                      driver_memory="8g")
    yield spark
    spark.stop()
