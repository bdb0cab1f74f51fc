"""The query registry backing ``__spark_entry__.queries()`` /
``oracle_sql()``.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DF``
with the equivalent DuckDB SQL (generated from the same specs, see
``rdfind_spark.oracle``).  Names map to SURVEY.md §2 operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rdfind_spark import oracle
from rdfind_spark.operators import census, rules
from rdfind_spark.operators.captures import capture_candidates
from rdfind_spark.operators.cind import (
    capture_overlaps,
    capture_supports,
    discover_cinds,
    distinct_captures,
    frequent_captures,
    pruned_captures,
)
from rdfind_spark.sources.triples import triple_view

MIN_SUPPORT = 10

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(
    name: str, sql: str | None
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _dcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_captures(capture_candidates(triple_view(spark, sf_dir)))


# ----------------------------------------------------------- CIND core


@register("cind_minimal", oracle.cind_sql(MIN_SUPPORT, minimal=True))
def cind_minimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: pertinent minimal CINDs (SURVEY §3.3; G1+A5+J6)."""
    return discover_cinds(triple_view(spark, sf_dir), MIN_SUPPORT, minimal=True)


@register("cind_all", oracle.cind_sql(MIN_SUPPORT, minimal=False))
def cind_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pertinent CINDs incl. non-minimal (AllAtOnce semantics)."""
    return discover_cinds(triple_view(spark, sf_dir), MIN_SUPPORT, minimal=False)


@register("capture_supports", oracle.capture_supports_sql(MIN_SUPPORT))
def capture_supports_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-capture support counts (A10)."""
    return frequent_captures(capture_supports(_dcap(spark, sf_dir)), MIN_SUPPORT)


@register("capture_overlaps", oracle.capture_overlaps_sql(MIN_SUPPORT))
def capture_overlaps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise overlap counts of frequent captures (G2/A6)."""
    dcap = _dcap(spark, sf_dir)
    freq = frequent_captures(capture_supports(dcap), MIN_SUPPORT)
    return capture_overlaps(
        pruned_captures(dcap, freq), freq, min_overlap=MIN_SUPPORT
    )


# ------------------------------------------------------------- census


@register("condition_counts_frequent", oracle.condition_counts_sql(MIN_SUPPORT))
def condition_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent unary+binary condition counts (A1+A2)."""
    return census.condition_counts(triple_view(spark, sf_dir), MIN_SUPPORT)


@register("condition_histogram", oracle.condition_histogram_sql())
def condition_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per condition-type census (A14)."""
    return census.condition_histogram(triple_view(spark, sf_dir))


@register("count_distinct_values", oracle.count_distinct_values_sql())
def count_distinct_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-value census, entity vs literal (A15)."""
    return census.count_distinct_values(triple_view(spark, sf_dir))


@register("count_triples", oracle.count_triples_sql())
def count_triples_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple + distinct-triple counts (A17/T4)."""
    return census.count_triples(triple_view(spark, sf_dir))


@register("join_line_histogram", oracle.join_line_histogram_sql())
def join_line_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-line size → frequency (A11)."""
    return census.join_line_histogram(_dcap(spark, sf_dir))


@register("association_rules", oracle.association_rules_sql(MIN_SUPPORT, 1.0))
def association_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confidence-1.0 association rules (J2/J3 + AR mining)."""
    return rules.association_rules(triple_view(spark, sf_dir), MIN_SUPPORT, 1.0)
