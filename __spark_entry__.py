"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
training-data ops); each takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — equivalent DuckDB SQL per query; every query has one
except ``ann_ivf_kmeans_topk`` (iterative distributed k-means means are
not bit-reproducible in SQL — it is registered past the driver's sampled
window and pinned by recall/balance tests instead). The approximate ANN
paths state their semantics exactly: top-k restricted to the probed
buckets / inverted lists, with deterministic quantizers.

All real logic lives in ``pq_spark.driver_queries`` (registry) backed by
``pq_spark.engine`` (the query engine), ``pq_spark.rollup`` (tier cascade)
and ``pq_spark.textops`` (dedup / similarity / text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PromQL-grid aggregation over the events stream at sf0.001
    (sum by (event_type) of the gap-filled instant vector)."""
    from pq_spark.driver_queries import QUERIES

    return QUERIES["pq_sum_by_et"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pq_spark.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pq_spark.driver_queries import ORACLES

    return dict(ORACLES)
