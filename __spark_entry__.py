"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``weather_data_pipeline_spark.registry`` — every operator
from SURVEY.md §2 registers a named query callable and (when expressible)
a DuckDB oracle SQL twin there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weather_data_pipeline_spark import registry
from weather_data_pipeline_spark.session import tune

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (O15 latest-per-key, reference weather_etl.py:145)
    on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return registry.queries()["o15_latest_per_key"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins for every SQL-expressible query."""
    return registry.oracle_sql()
