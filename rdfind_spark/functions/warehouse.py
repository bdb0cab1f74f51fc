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


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    """The classic pricing-summary report (TPC-H Q1 shape): per
    (returnflag, linestatus) the quantity/price/discounted sums and row
    count for lines shipped before the cutoff.  Pure scan → filter
    (pushed down) → one partial-aggregated groupBy on a 6-value key;
    money in exact integer cents, quantities in exact integer units."""
    li = lineitem.filter(
        F.col("l_shipdate") < F.lit(ship_before).cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_c"),
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "disc_cpct"
        ),
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        F.sum("price_c").alias("sum_base_price_cents"),
        F.expr("sum(disc_cpct) div 100").alias("sum_disc_price_cents"),
        F.count("*").alias("count_order"),
    )


def pricing_summary_sql(ship_before: str = "1998-09-01") -> str:
    return f"""SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_base_price_cents,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) // 100
            AS BIGINT) AS sum_disc_price_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '{ship_before} 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


def revenue_forecast(
    lineitem: DataFrame,
    year: int = 1996,
    min_disc: float = 0.02,
    max_disc: float = 0.06,
    max_qty: float = 24.0,
) -> DataFrame:
    """Discount-band revenue scan (TPC-H Q6 shape): Σ price·discount
    over lines in one ship year, a discount band, and a quantity cap —
    the pure pushdown query (every predicate reaches the parquet scan;
    no join, no wide shuffle, one global integer sum)."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        & (F.col("l_discount") >= min_disc)
        & (F.col("l_discount") <= max_disc)
        & (F.col("l_quantity") < max_qty)
    ).select(
        (_cents("l_extendedprice") * _cents("l_discount")).alias("rev_cpct")
    )
    return li.agg(
        F.count("*").alias("n_lines"),
        F.expr("sum(rev_cpct) div 100").alias("revenue_cents"),
    )


def revenue_forecast_sql(
    year: int = 1996,
    min_disc: float = 0.02,
    max_disc: float = 0.06,
    max_qty: float = 24.0,
) -> str:
    return f"""SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) // 100
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{year}-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '{year + 1}-01-01 00:00:00'
  AND l_discount >= {min_disc} AND l_discount <= {max_disc}
  AND l_quantity < {max_qty}"""


SEGMENT = "BUILDING"
Q3_CUTOFF = "1995-03-15"
Q5_REGION = "ASIA"
Q5_FROM = "1995-01-01"
Q5_TO = "1996-01-01"


def top_unshipped_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = SEGMENT,
    cutoff: str = Q3_CUTOFF,
    k: int = 10,
) -> DataFrame:
    """Top-k revenue among orders of one market segment placed before
    ``cutoff`` with lines still shipping after it — the TPC-H Q3
    shipping-priority shape on this schema.

    Plan discipline: both date predicates and the segment filter sit on
    the scans (parquet pushdown); the fact joins shuffle on their keys
    with AQE choosing build sides; the top-k is orderBy+limit =
    TakeOrderedAndProject (per-partition heaps, k-row driver merge) on
    exact integer cents with a full (revenue, date, key) tie-break, so
    the result is deterministic and oracle-exact."""
    cutoff_ts = F.lit(cutoff).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    od = orders.filter(F.col("o_orderdate") < cutoff_ts).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.filter(F.col("l_shipdate") > cutoff_ts).select(
        "l_orderkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "rev_cpct"
        ),
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.expr("sum(rev_cpct) div 100").alias("revenue_cents"))
        .orderBy(
            F.col("revenue_cents").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(k)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue_cents",
        )
    )


def top_unshipped_orders_sql(
    segment: str = SEGMENT, cutoff: str = Q3_CUTOFF, k: int = 10
) -> str:
    return f"""SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) // 100
            AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
  AND l_shipdate > TIMESTAMP '{cutoff} 00:00:00'
  AND EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_mktsegment = '{segment}')
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue_cents DESC, o_orderdate ASC, o_orderkey ASC
LIMIT {k}"""


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = Q5_REGION,
    date_from: str = Q5_FROM,
    date_to: str = Q5_TO,
) -> DataFrame:
    """Revenue per nation from *local* supply chains (supplier and
    customer in the same nation) inside one region and order-date year —
    the TPC-H Q5 shape: the longest join chain in the warehouse surface
    (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region).

    Plan discipline: nation/region broadcast; the same-nation predicate
    rides the supplier join as an equi-condition (c_nationkey =
    s_nationkey joins on key equality, never a post-join filter over the
    cross product); date range pushes to the orders scan."""
    od = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "rev_cpct"
        ),
    )
    nat = F.broadcast(
        nation.join(
            F.broadcast(
                region.filter(F.col("r_name") == region_name).select(
                    "r_regionkey"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.expr("sum(rev_cpct) div 100").alias("revenue_cents"),
        )
    )


def local_supplier_volume_sql(
    region_name: str = Q5_REGION,
    date_from: str = Q5_FROM,
    date_to: str = Q5_TO,
) -> str:
    return f"""SELECT n_name, COUNT(*) AS n_items,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) // 100
            AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{date_to} 00:00:00'
  AND r_name = '{region_name}'
GROUP BY n_name"""
