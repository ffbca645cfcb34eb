import pytest


@pytest.fixture(scope="session")
def spark():
    from cdk_dynamodb_cdc_spark.session import get_spark

    spark = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
