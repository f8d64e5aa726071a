import pytest


@pytest.fixture(scope="session")
def spark():
    from aida_spark.session import get_spark

    spark = get_spark(
        "aida-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    yield spark
    spark.stop()
