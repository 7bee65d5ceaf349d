"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
curw_mike_data_handler_spark.catalog (one entry per implemented
operator from SURVEY.md §2 + the training-data extensions), each paired
with DuckDB oracle SQL for the sf0.01 correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from curw_mike_data_handler_spark import catalog

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary / weighted-agg analog) on sf0.001."""
    return catalog.QUERIES["q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
