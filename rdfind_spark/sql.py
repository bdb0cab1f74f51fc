"""Ad-hoc SQL surface: register the engine's tables as temp views and
run arbitrary Spark SQL over them.

A user of the reference drives everything through its CLI programs; a
Spark user expects ``spark.sql`` too.  ``register_views`` exposes the
ten driver tables, the melted ``triples`` view, and the distinct
``captures`` relation, after which any query the DuckDB oracle can run
(modulo dialect) runs natively under Catalyst — predicate pushdown and
column pruning reach the parquet scans because the views are plain
DataFrame definitions, not materializations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rdfind_spark.sources.triples import TABLES, load_table, triple_view


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create (replace) temp views for every base table plus
    ``triples`` and ``captures``; returns the view names."""
    names = []
    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
            names.append(t)
        except Exception:
            # a missing optional table (e.g. events at a tiny SF) should
            # not take down the rest of the surface
            continue
    triple_view(spark, sf_dir).createOrReplaceTempView("triples")
    names.append("triples")
    from rdfind_spark.operators.captures import capture_candidates

    capture_candidates(triple_view(spark, sf_dir)).distinct().createOrReplaceTempView(
        "captures"
    )
    names.append("captures")
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call convenience: register views, run the query."""
    register_views(spark, sf_dir)
    return spark.sql(query)
