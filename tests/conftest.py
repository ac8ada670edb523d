import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("nested-pandas-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # session contract (see nested_pandas_spark.session): nano-timestamp
        # parquet reads as int64 instead of erroring
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def objects(spark):
    """F1: base table (id, a, b)."""
    return spark.createDataFrame(
        [(0, 0.1, 1.0), (1, 0.5, 0.2), (2, 0.9, 1.8)], "id long, a double, b double"
    )


@pytest.fixture(scope="session")
def sources(spark):
    """F2: flat child table, 3 rows per object, keyed by id."""
    rows = []
    for i in range(3):
        for j in range(3):
            rows.append((i, float(j), 10.0 * i + j, 1.0, "r" if j % 2 == 0 else "g"))
    return spark.createDataFrame(
        rows, "id long, t double, flux double, flux_error double, band string"
    )


@pytest.fixture(scope="session")
def packed(objects, sources):
    """F3: objects with a 'nested' column packed from sources."""
    from nested_pandas_spark import NestedFrame

    return NestedFrame(objects).join_nested(sources, "nested", on="id", sort_within=["t"])
