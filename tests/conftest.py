import os

import pytest
from pyspark.sql import SparkSession

# test data is tiny: fewer shuffle partitions = fewer tasks per stage =
# less scheduler latency across the suite's thousands of micro-jobs.
# Results are partitioning-independent (the property/oracle suites assert
# exactly that); override to taste with PQ_TEST_SHUFFLE_PARTITIONS.
# Executor threads are 16 (not 4): the thread-pooled batteries run up to
# 12 queries concurrently, and 4 task slots serialize them (measured:
# the 110-query oracle battery is 220 s on local[4], 69 s on local[16];
# single micro-jobs are unaffected since stages still have 4 tasks).
_SHUFFLE = os.environ.get("PQ_TEST_SHUFFLE_PARTITIONS", "4")
_MASTER = os.environ.get("PQ_TEST_MASTER", "local[16]")


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master(_MASTER)
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
