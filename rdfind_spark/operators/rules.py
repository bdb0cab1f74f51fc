"""Association-rule mining over unary conditions (reference
``plan/FrequentConditionPlanner.scala:130-194`` — the two AR joins J2/J3
and the confidence filter — expressed as one relational plan).

A rule ``(ante_code, ante_value) ⇒ (cons_code, cons_value)`` states that
every triple satisfying the antecedent condition also satisfies the
consequent; support = co-occurrence count, confidence = support /
antecedent count.  The reference keeps only confidence-1.0 rules for
CIND pruning (``FrequentConditionPlanner.scala:190-191``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfind_spark import condition_codes as cc
from rdfind_spark.operators.census import condition_counts

_UNARY = (cc.SUBJECT, cc.PREDICATE, cc.OBJECT)
# binary primary code -> (low-bit field code, high-bit field code)
_BINARY_SPLIT = {
    cc.SUBJECT | cc.PREDICATE: (cc.SUBJECT, cc.PREDICATE),
    cc.SUBJECT | cc.OBJECT: (cc.SUBJECT, cc.OBJECT),
    cc.PREDICATE | cc.OBJECT: (cc.PREDICATE, cc.OBJECT),
}


def association_rules(
    triples: DataFrame, min_support: int = 10, min_confidence: float = 1.0
) -> DataFrame:
    """Mine unary⇒unary association rules with support ≥ min_support and
    confidence ≥ min_confidence.  Output: (ante_code, cons_code,
    antecedent, consequent, support, confidence)."""
    counts = condition_counts(triples)
    unary = counts.filter(F.col("code").isin(list(_UNARY))).select(
        F.col("code").alias("ante_code"),
        F.col("v1").alias("antecedent"),
        F.col("count").alias("ante_count"),
    )
    binary = counts.filter(F.col("code").isin(list(_BINARY_SPLIT)))

    directed = []
    for bcode, (low, high) in _BINARY_SPLIT.items():
        base = binary.filter(F.col("code") == bcode)
        directed.append(
            base.select(
                F.lit(low).alias("ante_code"),
                F.lit(high).alias("cons_code"),
                F.col("v1").alias("antecedent"),
                F.col("v2").alias("consequent"),
                F.col("count").alias("support"),
            )
        )
        directed.append(
            base.select(
                F.lit(high).alias("ante_code"),
                F.lit(low).alias("cons_code"),
                F.col("v2").alias("antecedent"),
                F.col("v1").alias("consequent"),
                F.col("count").alias("support"),
            )
        )
    rules = reduce(lambda a, b: a.unionByName(b), directed)
    rules = rules.filter(F.col("support") >= min_support)
    return (
        rules.join(unary, on=["ante_code", "antecedent"])
        .withColumn("confidence", F.col("support") / F.col("ante_count"))
        .filter(F.col("confidence") >= min_confidence)
        .select(
            "ante_code", "cons_code", "antecedent", "consequent", "support", "confidence"
        )
    )
