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

from pyspark.sql import DataFrame, Window
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


MIN_COST_TYPE = "STANDARD"
MIN_COST_MAX_SIZE = 10
Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_FROM = "1996-01-01"
Q7_TO = "1998-01-01"
BIG_SPENDER_MIN_QTY = 300


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    p_type: str = MIN_COST_TYPE,
    max_size: int = MIN_COST_MAX_SIZE,
) -> DataFrame:
    """Cheapest supplier(s) per part (TPC-H Q2 pattern on this schema,
    which has no partsupp table): for each part of one type/size class,
    the supplier(s) whose total sold value for that part is the
    per-part minimum.  The reference pattern is the correlated
    MIN-subquery; here it is a window-min over a single aggregate.

    Plan discipline: the part filter broadcasts as a semi-join BEFORE
    the lineitem aggregate, so the fact scan only aggregates qualifying
    parts; the per-part minimum is a window over the already-aggregated
    (part, supplier) table — one extra shuffle on p_partkey over data
    that is orders of magnitude smaller than the fact table; supplier
    and part decorations broadcast at the end.  Money in exact integer
    cents, so the min and the tie set are engine-independent."""
    pk = part.filter(
        (F.col("p_type") == p_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand")
    cost = (
        lineitem.select(
            "l_partkey", "l_suppkey", _cents("l_extendedprice").alias("c")
        )
        .join(F.broadcast(pk.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("c").alias("cost_cents"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.withColumn("min_cost", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cost"))
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("p_partkey", "p_brand", "s_name", "cost_cents")
    )


def min_cost_supplier_sql(
    p_type: str = MIN_COST_TYPE, max_size: int = MIN_COST_MAX_SIZE
) -> str:
    return f"""WITH cost AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cost_cents
  FROM lineitem
  WHERE EXISTS (SELECT 1 FROM part
                WHERE p_partkey = l_partkey
                  AND p_type = '{p_type}' AND p_size <= {max_size})
  GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, p_brand, s_name, cost_cents
FROM cost
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE cost_cents = (SELECT MIN(c2.cost_cents) FROM cost c2
                    WHERE c2.l_partkey = cost.l_partkey)"""


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = Q7_NATION_A,
    nation_b: str = Q7_NATION_B,
    date_from: str = Q7_FROM,
    date_to: str = Q7_TO,
) -> DataFrame:
    """Trade volume between two nations by direction and ship year
    (TPC-H Q7 shape): revenue of lines a supplier in one nation shipped
    to a customer in the other, either direction kept separate.

    Plan discipline: the nation dimension broadcasts TWICE under
    different roles (supplier side / customer side), each pre-joined
    into its entity table BEFORE the fact joins — so the supplier and
    customer build sides arrive already restricted to the two nations
    and the fact joins themselves discard out-of-pair rows (a fact join
    followed by a nation filter would shuffle 12× more rows at 25
    nations).  The (A,B)/(B,A) disjunction collapses to a post-join
    inequality on already-restricted rows; the ship-date range pushes
    to the lineitem scan."""
    pair = nation.filter(
        F.col("n_name").isin([nation_a, nation_b])
    ).select("n_nationkey", "n_name")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("ship_year"),
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "rev_cpct"
        ),
    )
    sup = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(pair.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(
            pair.select(
                F.col("n_nationkey").alias("cn_nationkey"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("cn_nationkey"),
    ).select("c_custkey", "cust_nation")
    return (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(
            F.count("*").alias("n_items"),
            F.expr("sum(rev_cpct) div 100").alias("revenue_cents"),
        )
    )


def volume_shipping_sql(
    nation_a: str = Q7_NATION_A,
    nation_b: str = Q7_NATION_B,
    date_from: str = Q7_FROM,
    date_to: str = Q7_TO,
) -> str:
    return f"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) // 100
            AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier            ON l_suppkey = s_suppkey
JOIN nation sn           ON s_nationkey = sn.n_nationkey
JOIN orders              ON l_orderkey = o_orderkey
JOIN customer            ON o_custkey = c_custkey
JOIN nation cn           ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{date_to} 00:00:00'
  AND sn.n_name IN ('{nation_a}', '{nation_b}')
  AND cn.n_name IN ('{nation_a}', '{nation_b}')
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)"""


def big_spender_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = BIG_SPENDER_MIN_QTY,
) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): orders whose total line
    quantity exceeds ``min_qty``, decorated with the customer — the
    HAVING-threshold aggregate feeding a semi-join back into the fact
    chain.

    Plan discipline: the quantity aggregate runs FIRST (map-side
    partial sums, one shuffle on l_orderkey) and its HAVING filter
    leaves a tiny qualifying set, which then BROADCASTS into the
    orders/customer decoration joins — at any scale the expensive side
    is the single fact aggregate, never a fact × fact join.  Quantities
    are exact integers, so the threshold set is engine-identical."""
    qty = (
        lineitem.select(
            "l_orderkey",
            F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("q").alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            _cents("o_totalprice").alias("total_price_cents"),
        )
        .join(F.broadcast(qty), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "order_date",
            "total_price_cents",
            "sum_qty",
        )
    )


def big_spender_orders_sql(min_qty: int = BIG_SPENDER_MIN_QTY) -> str:
    return f"""SELECT c_name, c_custkey, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_price_cents,
       sum_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN (SELECT l_orderkey,
             CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) > {min_qty}) q
  ON o_orderkey = q.l_orderkey"""


# Q19-shape disjunctive bands: (brand, max size, qty range) per band.
PROMO_BANDS = (
    ("Brand#11", 10, 1, 15),
    ("Brand#22", 20, 10, 25),
    ("Brand#3", 30, 20, 35),
)


def promo_band_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    bands=PROMO_BANDS,
) -> DataFrame:
    """Disjunctive-predicate revenue scan (TPC-H Q19 shape): one global
    revenue sum over lines matching ANY of several (brand, size,
    quantity-range) bands — the OR-of-ANDs pattern that exercises
    cross-table disjunctions.

    Plan discipline: the part side pre-filters to the union of band
    brands/sizes (a pushable IN + range predicate) and broadcasts; the
    residual OR-of-ANDs then evaluates post-join on already-restricted
    rows, never on the raw cross product.  One integer aggregate, no
    wide shuffle."""
    brands = sorted({b for b, _, _, _ in bands})
    max_size = max(s for _, s, _, _ in bands)
    pt = part.filter(
        F.col("p_brand").isin(brands) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_size")
    li = lineitem.select(
        "l_partkey",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "rev_cpct"
        ),
    )
    cond = None
    for brand, size, qlo, qhi in bands:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") <= size)
            & (F.col("qty") >= qlo)
            & (F.col("qty") <= qhi)
        )
        cond = c if cond is None else (cond | c)
    return (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.count("*").alias("n_lines"),
            F.expr("sum(rev_cpct) div 100").alias("revenue_cents"),
        )
    )


def promo_band_revenue_sql(bands=PROMO_BANDS) -> str:
    ors = "\n   OR ".join(
        f"(p_brand = '{b}' AND p_size <= {s} AND qty >= {lo} AND qty <= {hi})"
        for b, s, lo, hi in bands
    )
    return f"""WITH li AS (
  SELECT l_partkey,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev_cpct
  FROM lineitem
)
SELECT COUNT(*) AS n_lines,
       CAST(SUM(rev_cpct) // 100 AS BIGINT) AS revenue_cents
FROM li JOIN part ON l_partkey = p_partkey
WHERE {ors}"""


# ------------------------------------------- Q8 market share

Q8_NATION = "NATION_2"
Q8_REGION = "ASIA"
Q8_TYPE = "STANDARD"
Q8_FROM = "1995-01-01"
Q8_TO = "1997-01-01"


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    nation_name: str = Q8_NATION,
    region_name: str = Q8_REGION,
    p_type: str = Q8_TYPE,
    date_from: str = Q8_FROM,
    date_to: str = Q8_TO,
) -> DataFrame:
    """National market share (TPC-H Q8 shape): among lineitems of parts
    of one type, ordered in a date range by customers in one region,
    the share of revenue supplied by one nation, per order year — the
    ratio-of-conditional-aggregates pattern over a two-level dimension
    chain (region → nation → customer, and nation → supplier in a
    second role).

    Plan discipline:

    * the type-filtered part keys BROADCAST into the lineitem scan
      first — Q8's part predicate is the most selective edge, so the
      fact table shrinks before any shuffle join;
    * region → nation pre-joins BROADCAST-side into customer (exactly
      volume_shipping's role trick), so the orders⋈customer join
      already discards out-of-region rows;
    * the supplier-side nation broadcasts under its second role to
      label rows with supp_nation;
    * ONE aggregate computes both the conditional (nation) and total
      sums — no self-join, no window over the fact;
    * integer fixed point end-to-end: share_ppm =
      nation_cents·1_000_000 div total_cents (exact same BIGINT
      recurrence in the DuckDB oracle).  Headroom note: the ppm
      multiply needs nation_cents < 9.2e12 per year-group (~$92B/yr);
      above that pre-scale both sums by the same power of ten.
    """
    pt = part.filter(F.col("p_type") == p_type).select("p_partkey")
    li = (
        lineitem.select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
                "rev_cpct"
            ),
        )
        .join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "l_suppkey", "rev_cpct")
    )
    od = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    rn = (
        nation.select("n_nationkey", "n_regionkey")
        .join(
            F.broadcast(
                region.filter(F.col("r_name") == region_name).select(
                    "r_regionkey"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    cust = (
        customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(rn), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    sup = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("sn_nationkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    agg = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.expr("sum(rev_cpct) div 100").alias("total_cents"),
            F.expr(
                f"sum(if(supp_nation = '{nation_name}', rev_cpct, 0)) div 100"
            ).alias("nation_cents"),
        )
    )
    return agg.select(
        "o_year",
        "nation_cents",
        "total_cents",
        F.expr("nation_cents * 1000000 div total_cents").alias("share_ppm"),
    )


def market_share_sql(
    nation_name: str = Q8_NATION,
    region_name: str = Q8_REGION,
    p_type: str = Q8_TYPE,
    date_from: str = Q8_FROM,
    date_to: str = Q8_TO,
) -> str:
    return f"""WITH agg AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
              // 100 AS BIGINT) AS total_cents,
         CAST(SUM(CASE WHEN sn.n_name = '{nation_name}'
                  THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                  ELSE 0 END) // 100 AS BIGINT) AS nation_cents
  FROM lineitem
  JOIN part      ON l_partkey = p_partkey
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region    ON cn.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = '{p_type}'
    AND r_name = '{region_name}'
    AND o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{date_to} 00:00:00'
  GROUP BY year(o_orderdate)
)
SELECT o_year, nation_cents, total_cents,
       CAST(nation_cents * 1000000 // total_cents AS BIGINT) AS share_ppm
FROM agg"""


# Q13-shape: priorities excluded from the per-customer order count
CUSTDIST_EXCLUDE = "1-URGENT"


def customer_distribution(
    customer: DataFrame, orders: DataFrame, exclude: str = CUSTDIST_EXCLUDE
) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): how many
    customers placed exactly N qualifying orders — INCLUDING the
    zero-order customers the outer join exists for (the reference's
    star schema has no outer-join query; this is the classic shape a
    warehouse user would bring).  Orders in the excluded priority class
    don't count (Q13's "special requests" comment filter, re-keyed to
    ``o_orderpriority`` since the synthetic schema carries no comment).

    Plan discipline: the canonical formulation outer-joins the raw fact
    table and THEN aggregates twice; here the orders side is aggregated
    to (custkey, n) FIRST — one map-side-combined shuffle of the fact
    table down to key-level — and the outer join runs customer ⟕
    key-level counts, so the join input is |customers| + |customers
    with orders| rows at any scale, never the raw order stream.  The
    histogram re-aggregate is then histogram-sized."""
    per_cust = (
        orders.filter(F.col("o_orderpriority") != exclude)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def customer_distribution_sql(exclude: str = CUSTDIST_EXCLUDE) -> str:
    return f"""SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c.c_custkey, COALESCE(o.n, 0) AS c_count
  FROM customer c LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS n FROM orders
    WHERE o_orderpriority <> '{exclude}' GROUP BY o_custkey
  ) o ON c.c_custkey = o.o_custkey
) GROUP BY c_count"""


# Q22-shape: market segments standing in for Q22's phone country codes
OPPORTUNITY_SEGMENTS = ("AUTOMOBILE", "BUILDING", "MACHINERY")
# the "dormancy" predicate: no order in this priority class (the
# synthetic order generator gives every customer SOME order, so Q22's
# literal "never ordered" would be the empty set — re-keyed, same
# anti-join shape, non-trivial output)
OPPORTUNITY_DORMANT_PRIORITY = "1-URGENT"


def sales_opportunity(
    customer: DataFrame, orders: DataFrame, segments=OPPORTUNITY_SEGMENTS
) -> DataFrame:
    """Dormant rich customers (TPC-H Q22 shape): per market segment,
    the count and total balance of customers whose account balance
    exceeds the positive-balance average of the segment pool AND who
    have no order in the urgent priority class — the scalar-subquery +
    anti-join classic.  Segments stand in for Q22's phone country
    codes, and "no urgent order" for "never ordered" (no phone column;
    every synthetic customer has some order).

    Exactness: balances are compared in integer cents, and the
    above-average predicate is cross-multiplied
    (``bal_cents * pool_n > pool_sum_cents``) so no division ever
    happens — bit-identical across engines, no float average.

    Plan discipline: the average is a single-row aggregate broadcast
    into the scan (map-side predicate); the dormancy test is a
    left-anti join against the DISTINCT qualifying custkeys — the fact
    table collapses to key-level before the anti join, so the anti
    probe is customer-sized vs distinct-buyer-sized at any scale."""
    seg = F.col("c_mktsegment").isin(*segments)
    cust = customer.select(
        "c_custkey",
        "c_mktsegment",
        _cents("c_acctbal").alias("bal_cents"),
    ).filter(seg)
    pool = cust.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("pool_sum"), F.count("*").alias("pool_n")
    )
    buyers = (
        orders.filter(
            F.col("o_orderpriority") == OPPORTUNITY_DORMANT_PRIORITY
        )
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(pool))
        .filter(F.col("bal_cents") * F.col("pool_n") > F.col("pool_sum"))
        .join(buyers, cust.c_custkey == buyers.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.sum("bal_cents").alias("total_bal_cents"),
        )
    )


def sales_opportunity_sql(segments=OPPORTUNITY_SEGMENTS) -> str:
    seg_list = ", ".join(f"'{s}'" for s in segments)
    return f"""WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer WHERE c_mktsegment IN ({seg_list})
),
pool AS (
  SELECT CAST(SUM(bal_cents) AS BIGINT) AS pool_sum,
         COUNT(*) AS pool_n
  FROM cust WHERE bal_cents > 0
)
SELECT c_mktsegment, COUNT(*) AS n_custs,
       CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
FROM cust CROSS JOIN pool
WHERE bal_cents * pool_n > pool_sum
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '{OPPORTUNITY_DORMANT_PRIORITY}')
GROUP BY c_mktsegment"""


# ---------------------------------------------------------- Q16 shape

CENSUS_EXCLUDE_BRAND = "Brand#5"
CENSUS_TYPES = ("PROMO", "ECONOMY", "STANDARD")
CENSUS_SIZES = (3, 9, 14, 19, 23, 36, 45, 49)


def supplier_relationship_census(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    exclude_brand: str = CENSUS_EXCLUDE_BRAND,
    types=CENSUS_TYPES,
    sizes=CENSUS_SIZES,
) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship,
    ``specification: Q16``) re-keyed to the available star schema:
    how many DISTINCT suppliers can ship each qualifying
    (brand, type, size) part class — brand excluded by inequality,
    type restricted by IN-list, size by IN-list — where the
    "complaint" supplier exclusion (Q16's NOT IN with a LIKE
    subquery) is suppliers with negative account balance, and the
    part-supplier relation (TPC-H partsupp, absent here) is the
    distinct (l_partkey, l_suppkey) pairs actually observed in
    lineitem.

    Plan shape the test pins: both dimension filters push to the part
    scan; the complaint exclusion is a LEFT ANTI against a tiny
    aggregate (never a NOT IN rescan); the count is distinct over the
    pair-deduped fact, so the heavy lineitem stream collapses to
    key-level pairs BEFORE the dimension join."""
    pairs = lineitem.select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("l_suppkey").alias("s_suppkey"),
    ).distinct()
    complainers = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    qual_parts = part.filter(
        (F.col("p_brand") != exclude_brand)
        & F.col("p_type").isin(*types)
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(complainers, on="s_suppkey", how="left_anti")
        .join(qual_parts, on="p_partkey")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("s_suppkey").alias("supplier_cnt"))
    )


def supplier_relationship_census_sql(
    exclude_brand: str = CENSUS_EXCLUDE_BRAND,
    types=CENSUS_TYPES,
    sizes=CENSUS_SIZES,
) -> str:
    type_list = ", ".join(f"'{t}'" for t in types)
    size_list = ", ".join(str(s) for s in sizes)
    return f"""WITH pairs AS (
  SELECT DISTINCT l_partkey AS p_partkey, l_suppkey AS s_suppkey
  FROM lineitem
)
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT pr.s_suppkey) AS supplier_cnt
FROM pairs pr
JOIN part p ON p.p_partkey = pr.p_partkey
WHERE p.p_brand <> '{exclude_brand}'
  AND p.p_type IN ({type_list})
  AND p.p_size IN ({size_list})
  AND pr.s_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size"""


# ---------------------------------------------------------- Q21 shape

WAITING_LATE_DAYS = 365
WAITING_STATUS = "F"
WAITING_TOP_K = 100


def waiting_suppliers(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = WAITING_LATE_DAYS,
    status: str = WAITING_STATUS,
    top_k: int = WAITING_TOP_K,
) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) re-keyed to
    the available columns: for finished orders (status ``F``), find
    suppliers whose line shipped more than ``late_days`` after the
    order date, on MULTI-supplier orders where they were the ONLY late
    supplier — the famous EXISTS / NOT-EXISTS double self-join on the
    fact table.  (TPC-H's receipt-vs-commit lateness needs columns the
    synthetic schema lacks; ship-vs-order-date is the same shape.)

    Plan shape the test pins: the EXISTS becomes one LEFT SEMI and the
    NOT EXISTS one LEFT ANTI, each against the key-level DISTINCT
    (order, supplier) projections — the fact stream collapses to pair
    level BEFORE both self-joins, and the status filter pushes to the
    orders scan.  Output: (s_name, numwait) top-k with a deterministic
    (numwait DESC, s_name) tie-break."""
    fo = orders.filter(F.col("o_orderstatus") == status).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    pairs = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        pairs.join(fo, on="l_orderkey")
        .filter(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            > late_days
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_pairs = pairs.select("l_orderkey", "l_suppkey").distinct()
    other = all_pairs.select(
        "l_orderkey", F.col("l_suppkey").alias("o_supp")
    )
    other_late = late.select(
        "l_orderkey", F.col("l_suppkey").alias("o_supp")
    )
    waiting = (
        late.join(
            other,
            (late["l_orderkey"] == other["l_orderkey"])
            & (late["l_suppkey"] != other["o_supp"]),
            "left_semi",
        )
        .join(
            other_late,
            (late["l_orderkey"] == other_late["l_orderkey"])
            & (late["l_suppkey"] != other_late["o_supp"]),
            "left_anti",
        )
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(
            supplier.select(
                F.col("s_suppkey").alias("l_suppkey"), "s_name"
            ),
            on="l_suppkey",
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(top_k)
    )


def waiting_suppliers_sql(
    late_days: int = WAITING_LATE_DAYS,
    status: str = WAITING_STATUS,
    top_k: int = WAITING_TOP_K,
) -> str:
    return f"""WITH pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
),
late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = '{status}'
    AND datediff('day', o.o_orderdate::DATE, l.l_shipdate::DATE)
        > {late_days}
),
waiting AS (
  SELECT l1.l_orderkey, l1.l_suppkey FROM late l1
  WHERE EXISTS (SELECT 1 FROM pairs p2
                WHERE p2.l_orderkey = l1.l_orderkey
                  AND p2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey)
)
SELECT s.s_name, COUNT(*) AS numwait
FROM waiting w JOIN supplier s ON s.s_suppkey = w.l_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s_name ASC LIMIT {top_k}"""


# --- returned-item revenue (Q10 shape) ------------------------------------

RETURNED_FLAG = "R"
RETURNED_SINCE = "1996-01-01"
RETURNED_UNTIL = "1996-04-01"
RETURNED_TOP_K = 20


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    since: str = RETURNED_SINCE,
    until: str = RETURNED_UNTIL,
    top_k: int = RETURNED_TOP_K,
) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting,
    ``specification: Q10``): revenue lost to returns per customer for
    one order quarter — which customers keep sending goods back.  The
    classic customer-ranking join: fact filtered on BOTH the line
    return flag and the order-date window, three-table chain up to the
    customer, nation decoration broadcast, top-k by exact integer
    revenue cents with a full deterministic tie-break.

    Plan shape: the returnflag filter pushes to the lineitem scan and
    the date window to the orders scan BEFORE the join (the fact
    stream entering the customer join is quarter+flag-sized, not
    corpus-sized); nation broadcasts; the top-k is a TakeOrdered, so
    nothing customer-sized reaches the driver."""
    li = lineitem.filter(F.col("l_returnflag") == RETURNED_FLAG).select(
        "l_orderkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "rev_cpct"
        ),
    )
    od = orders.filter(
        (F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(until).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.expr("sum(rev_cpct) div 100").alias("revenue_cents"))
        .join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"),
                "c_name",
                "c_nationkey",
                "c_acctbal",
            ),
            on="o_custkey",
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "c_name",
            "n_name",
            _cents("c_acctbal").alias("acctbal_cents"),
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(top_k)
    )


def returned_item_revenue_sql(
    since: str = RETURNED_SINCE,
    until: str = RETURNED_UNTIL,
    top_k: int = RETURNED_TOP_K,
) -> str:
    return f"""WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
              // 100 AS BIGINT) AS revenue_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = '{RETURNED_FLAG}'
    AND o_orderdate >= TIMESTAMP '{since} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{until} 00:00:00'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
       revenue_cents
FROM rev
JOIN customer ON c_custkey = o_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue_cents DESC, c_custkey ASC LIMIT {top_k}"""


# --- small-quantity-order revenue (Q17 shape) -----------------------------

SMALL_QTY_MAX_SIZE = 5
SMALL_QTY_PCT = 20  # "small" = below this percent of the part's mean qty


def small_qty_revenue(
    part: DataFrame,
    lineitem: DataFrame,
    max_size: int = SMALL_QTY_MAX_SIZE,
    pct: int = SMALL_QTY_PCT,
) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue,
    ``specification: Q17``): for one part class (size <= ``max_size``
    — the synthetic schema has no container column, so the class
    filter re-keys to the size dimension), the revenue locked up in
    orders below ``pct``% of that part's average order quantity — the
    classic correlated scalar subquery (``l_quantity < 0.2 * (SELECT
    AVG ...)``), expressed as ONE per-part aggregate joined back onto
    the fact rows.

    Exactness: quantities are integral, so the average comparison
    cross-multiplies — ``100 * qty * n_lines < pct * total_qty`` — no
    division, no floats; revenue in integer cents.  Output is the
    single-row report (n_small lines, revenue_cents,
    avg_yearly_cents = revenue DIV 7 per the Q17 formula).

    Plan shape: the size filter pushes to the part scan and semi-joins
    the fact BEFORE the per-part aggregate (the aggregate runs on the
    class subset, not the corpus); the per-part means join back
    key-to-key (AQE broadcasts the class-sized side); one final
    single-row aggregate."""
    pk = part.filter(F.col("p_size") <= max_size).select("p_partkey")
    li = lineitem.join(
        F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "l_partkey",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "rev_cpct"
        ),
    )
    means = li.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.sum("qty").alias("total_qty"), F.count("*").alias("n_lines")
    )
    small = li.join(
        means, F.col("l_partkey") == F.col("m_partkey")
    ).filter(
        F.lit(100) * F.col("qty") * F.col("n_lines")
        < F.lit(pct) * F.col("total_qty")
    )
    return small.agg(
        F.count("*").alias("n_small"),
        F.expr("sum(rev_cpct) div 100").alias("revenue_cents"),
        F.expr("(sum(rev_cpct) div 100) div 7").alias("avg_yearly_cents"),
    )


def small_qty_revenue_sql(
    max_size: int = SMALL_QTY_MAX_SIZE, pct: int = SMALL_QTY_PCT
) -> str:
    return f"""WITH li AS (
  SELECT l_partkey,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev_cpct
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= {max_size})
),
means AS (
  SELECT l_partkey AS m_partkey, SUM(qty) AS total_qty,
         COUNT(*) AS n_lines
  FROM li GROUP BY 1
)
SELECT COUNT(*) AS n_small,
       CAST(SUM(rev_cpct) // 100 AS BIGINT) AS revenue_cents,
       CAST((SUM(rev_cpct) // 100) // 7 AS BIGINT) AS avg_yearly_cents
FROM li JOIN means ON l_partkey = m_partkey
WHERE 100 * qty * n_lines < {pct} * total_qty"""
