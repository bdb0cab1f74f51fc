"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CIND discovery on the triple-ized sf0.001
star schema.  ``queries()`` / ``oracle_sql()`` — one entry per
implemented operator (SURVEY.md §2), each checked against DuckDB at
sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rdfind_spark import queries as q

MIN_SUPPORT = 10


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pertinent minimal CINDs over the triple-ized sf0.001
    tables (support ≥ 10)."""
    return q.SPARK_QUERIES["cind_minimal"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(q.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLE_SQL)
