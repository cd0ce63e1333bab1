import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: bench-scale (sf0.1) tests, seconds-to-minutes each"
    )


@pytest.fixture(scope="session")
def spark():
    wh = tempfile.mkdtemp(prefix="spark-wh-")
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.warehouse.dir", wh)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .appName("omop-etl-spark-tests")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)


@pytest.fixture()
def engine(spark):
    """Fresh Engine per test: drops every non-default database so
    catalog state never leaks between tests."""
    from omop_etl_spark import Engine

    for db in spark.sql("SHOW DATABASES").collect():
        name = db[0]
        if name != "default":
            spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")
    spark.sql("USE default")
    for (view,) in spark.sql("SHOW VIEWS IN default").select("viewName").collect():
        spark.catalog.dropTempView(view)
    return Engine(spark)
