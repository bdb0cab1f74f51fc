"""Census / statistics programs (reference §2.4 A11, A14-A17:
``CountConditions``, ``CountDistinctValues``, ``CountTriples``,
join-line histogram) re-expressed as single DataFrame plans.

Condition *types* here are primary-field codes only (s=1, p=2, o=4 and
their pairwise merges 3, 5, 6) — these census programs count raw
conditions, not captures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfind_spark import condition_codes as cc

# (primary code, v1 col, v2 col-or-None) for the 6 condition types
CONDITION_TYPES = [
    (cc.SUBJECT, "subj", None),
    (cc.PREDICATE, "pred", None),
    (cc.OBJECT, "obj", None),
    (cc.SUBJECT | cc.PREDICATE, "subj", "pred"),
    (cc.SUBJECT | cc.OBJECT, "subj", "obj"),
    (cc.PREDICATE | cc.OBJECT, "pred", "obj"),
]


def condition_instances(triples: DataFrame) -> DataFrame:
    """Explode each triple into its 6 condition instances
    (``programs/CountConditions.scala:192-199`` analogue)."""
    structs = [
        F.struct(
            F.lit(code).alias("code"),
            F.col(v1).alias("v1"),
            (F.col(v2) if v2 else F.lit("")).alias("v2"),
        )
        for code, v1, v2 in CONDITION_TYPES
    ]
    return triples.select(F.inline(F.array(*structs)))


def condition_counts(triples: DataFrame, min_count: int = 1) -> DataFrame:
    """Per-condition occurrence counts (A1 unary + A2 binary in one
    plan); ``min_count`` is the frequent-condition threshold."""
    out = (
        condition_instances(triples)
        .groupBy("code", "v1", "v2")
        .agg(F.count("*").alias("count"))
    )
    if min_count > 1:
        out = out.filter(F.col("count") >= min_count)
    return out


def condition_histogram(triples: DataFrame) -> DataFrame:
    """Per condition type: distinct conditions and total instances
    (``programs/CountConditions.scala:200-214`` analogue)."""
    return (
        condition_counts(triples)
        .groupBy("code")
        .agg(
            F.count("*").alias("n_conditions"),
            F.sum("count").alias("n_instances"),
        )
    )


def count_distinct_values(triples: DataFrame) -> DataFrame:
    """Distinct value census: total distinct values across all three
    fields, split entity-reference vs literal
    (``programs/CountDistinctValues.scala:112-119`` analogue; in the
    triple-ized star schema an entity value is ``prefix:id``)."""
    values = (
        triples.select(F.col("subj").alias("value"))
        .unionByName(triples.select(F.col("pred").alias("value")))
        .unionByName(triples.select(F.col("obj").alias("value")))
        .distinct()
    )
    is_entity = F.col("value").contains(":")
    return values.agg(
        F.count("*").alias("n_distinct"),
        F.sum(is_entity.cast("long")).alias("n_entity"),
        F.sum((~is_entity).cast("long")).alias("n_literal"),
    )


def count_triples(triples: DataFrame) -> DataFrame:
    """Triple count + distinct-triple count (A17 + T4)."""
    return triples.agg(
        F.count("*").alias("n_triples"),
        F.count_distinct("subj", "pred", "obj").alias("n_distinct_triples"),
    )


def join_line_histogram(dcap: DataFrame) -> DataFrame:
    """(join-line size → frequency): how many join values have k
    co-occurring captures (``programs/RDFind.scala:449-452``)."""
    return (
        dcap.groupBy("join_value")
        .agg(F.count("*").alias("line_size"))
        .groupBy("line_size")
        .agg(F.count("*").alias("frequency"))
    )
