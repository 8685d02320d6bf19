import os

import pytest
from pyspark.sql import SparkSession

# test data is tiny: fewer shuffle partitions = fewer tasks per stage =
# less scheduler latency across the suite's thousands of micro-jobs.
# Results are partitioning-independent (the property/oracle suites assert
# exactly that); override to taste with PQ_TEST_SHUFFLE_PARTITIONS.
_SHUFFLE = os.environ.get("PQ_TEST_SHUFFLE_PARTITIONS", "4")


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("pq_spark-tests")
        .config("spark.sql.shuffle.partitions", _SHUFFLE)
        .config("spark.default.parallelism", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
