"""Classic warehouse star-join analytics over the TPC-H-shaped tables
(lineitem/orders/customer/nation/region) — the relational surface the
ad-hoc SQL layer exposes, registered as first-class oracle-checked
queries.

Plan discipline:

* The dimension chain (region → nation) broadcasts; the fact join
  (lineitem ⋈ orders ⋈ customer) shuffles on its keys and AQE picks
  the build sides at runtime.
* Date filters are plain column predicates on the scan so they PUSH
  DOWN to parquet (visible as PushedFilters in .explain).
* Money is converted to exact integer cents at the scan
  (floor(x·100 + 0.5) — both engines evaluate the identical double
  expression, so the cents are bit-identical), and every aggregate is
  an integer sum: no float-summation-order exposure anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REVENUE_SINCE = "1995-01-01"
LATE_DAYS = 90


def _cents(col) -> F.Column:
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    since: str = REVENUE_SINCE,
) -> DataFrame:
    """Revenue per (region, nation) for orders placed since ``since``:
    Σ extendedprice·(1−discount), computed in exact integer
    cent-percent units then floored to cents."""
    li = lineitem.select(
        "l_orderkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "rev_cpct"
        ),
    )
    # NB: l_discount is a fraction (0.05), so its "cents" are percent
    od = orders.filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
    joined = (
        li.join(od.select("o_orderkey", "o_custkey"),
                li.l_orderkey == od.o_orderkey)
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.expr("sum(rev_cpct) div 100").alias("revenue_cents"),
        )
    )


def revenue_by_nation_sql(since: str = REVENUE_SINCE) -> str:
    return f"""SELECT r_name, n_name, COUNT(*) AS n_items,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) // 100
            AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '{since} 00:00:00'
GROUP BY r_name, n_name"""


def late_shipment_priority(
    orders: DataFrame, lineitem: DataFrame, late_days: int = LATE_DAYS
) -> DataFrame:
    """Order counts by priority among orders with at least one line
    shipped more than ``late_days`` days after the order date — an
    EXISTS (left_semi with a cross-table predicate), the TPC-H Q4
    pattern on this schema."""
    od = orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = lineitem.select(F.col("l_orderkey"), "l_shipdate")
    late = od.join(
        li,
        (od.o_orderkey == li.l_orderkey)
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


def late_shipment_priority_sql(late_days: int = LATE_DAYS) -> str:
    return f"""SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL {late_days} DAY
)
GROUP BY o_orderpriority"""
