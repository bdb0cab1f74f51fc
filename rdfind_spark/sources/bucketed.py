"""Bucketed-table layout for co-located joins.

At the 100 TB tier the dominant CIND cost is shuffling the capture
table onto its join keys for every discovery run.  Hive-style
bucketing amortizes that: write the table once, bucketed (and
sorted) by the join key, and every subsequent equi-join or
aggregation on that key runs with NO exchange — Spark's scan
reports the bucket partitioning and Catalyst elides the shuffle
(asserted by tests/test_bucketed.py on the physical plan).

The same discipline applies to any repeatedly-joined pipeline table
(posting lists by token, embeddings by centroid, events by user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``bucket_cols``.  Buckets must be sized so one bucket
    fits an executor's scan budget — at 100 TB that means thousands of
    buckets, chosen once per table, matched across tables that join."""
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the scan carries the bucket
    partitioning (visible as the absence of Exchange under joins and
    aggregations keyed on the bucket columns)."""
    return spark.table(table)
