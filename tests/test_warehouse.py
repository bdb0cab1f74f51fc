"""Unit tests for the warehouse star-join queries (hand-checkable
micro-instances; the full-size gate is the DuckDB oracle board)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rdfind_spark.functions import warehouse


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_top_unshipped_orders_micro(spark):
    customer = spark.createDataFrame(
        [
            Row(c_custkey=1, c_name="a", c_nationkey=1, c_acctbal=0.0,
                c_mktsegment="BUILDING"),
            Row(c_custkey=2, c_name="b", c_nationkey=1, c_acctbal=0.0,
                c_mktsegment="AUTO"),
        ]
    )
    orders = spark.createDataFrame(
        [
            # qualifies: BUILDING, ordered before cutoff
            Row(o_orderkey=10, o_custkey=1, o_orderstatus="O",
                o_totalprice=0.0, o_orderdate=_ts("1995-03-01"),
                o_orderpriority="1-URGENT"),
            # wrong segment
            Row(o_orderkey=11, o_custkey=2, o_orderstatus="O",
                o_totalprice=0.0, o_orderdate=_ts("1995-03-01"),
                o_orderpriority="1-URGENT"),
            # ordered after cutoff
            Row(o_orderkey=12, o_custkey=1, o_orderstatus="O",
                o_totalprice=0.0, o_orderdate=_ts("1995-04-01"),
                o_orderpriority="1-URGENT"),
        ]
    )
    lineitem = spark.createDataFrame(
        [
            # ships after cutoff: counts (100.00 * (1-0.10) = 90.00)
            Row(l_orderkey=10, l_extendedprice=100.0, l_discount=0.10,
                l_shipdate=_ts("1995-04-01")),
            # ships before cutoff: excluded
            Row(l_orderkey=10, l_extendedprice=50.0, l_discount=0.0,
                l_shipdate=_ts("1995-03-01")),
            Row(l_orderkey=11, l_extendedprice=100.0, l_discount=0.0,
                l_shipdate=_ts("1995-04-01")),
            Row(l_orderkey=12, l_extendedprice=100.0, l_discount=0.0,
                l_shipdate=_ts("1995-04-01")),
        ]
    )
    rows = warehouse.top_unshipped_orders(
        customer, orders, lineitem, cutoff="1995-03-15", k=10
    ).collect()
    assert [(r.o_orderkey, r.order_date, r.revenue_cents) for r in rows] == [
        (10, "1995-03-01", 9000)
    ]


def test_local_supplier_volume_same_nation_only(spark):
    region = spark.createDataFrame(
        [Row(r_regionkey=1, r_name="ASIA"), Row(r_regionkey=2, r_name="EUROPE")]
    )
    nation = spark.createDataFrame(
        [
            Row(n_nationkey=1, n_name="JAPAN", n_regionkey=1),
            Row(n_nationkey=2, n_name="FRANCE", n_regionkey=2),
        ]
    )
    customer = spark.createDataFrame(
        [Row(c_custkey=1, c_name="a", c_nationkey=1, c_acctbal=0.0,
             c_mktsegment="AUTO")]
    )
    supplier = spark.createDataFrame(
        [
            Row(s_suppkey=1, s_name="s1", s_nationkey=1, s_acctbal=0.0),
            Row(s_suppkey=2, s_name="s2", s_nationkey=2, s_acctbal=0.0),
        ]
    )
    orders = spark.createDataFrame(
        [Row(o_orderkey=10, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
             o_orderdate=_ts("1995-06-01"), o_orderpriority="1-URGENT")]
    )
    lineitem = spark.createDataFrame(
        [
            # same-nation supplier: counts (200.00 at 5% = 190.00)
            Row(l_orderkey=10, l_suppkey=1, l_extendedprice=200.0,
                l_discount=0.05),
            # cross-nation supplier: excluded by the equi-condition
            Row(l_orderkey=10, l_suppkey=2, l_extendedprice=999.0,
                l_discount=0.0),
        ]
    )
    rows = warehouse.local_supplier_volume(
        customer, orders, lineitem, supplier, nation, region
    ).collect()
    assert [(r.n_name, r.n_items, r.revenue_cents) for r in rows] == [
        ("JAPAN", 1, 19000)
    ]


def test_min_cost_supplier_picks_per_part_minimum_with_ties(spark):
    part = spark.createDataFrame(
        [
            Row(p_partkey=1, p_name="x", p_brand="Brand#1", p_type="STANDARD",
                p_size=5, p_retailprice=1.0),
            Row(p_partkey=2, p_name="y", p_brand="Brand#2", p_type="PROMO",
                p_size=5, p_retailprice=1.0),  # wrong type: excluded
        ]
    )
    supplier = spark.createDataFrame(
        [
            Row(s_suppkey=1, s_name="s1", s_nationkey=1, s_acctbal=0.0),
            Row(s_suppkey=2, s_name="s2", s_nationkey=1, s_acctbal=0.0),
            Row(s_suppkey=3, s_name="s3", s_nationkey=1, s_acctbal=0.0),
        ]
    )
    lineitem = spark.createDataFrame(
        [
            # part 1: s1 sells 10.00 total, s2 sells 10.00, s3 sells 30.00
            Row(l_orderkey=1, l_partkey=1, l_suppkey=1, l_extendedprice=4.0),
            Row(l_orderkey=2, l_partkey=1, l_suppkey=1, l_extendedprice=6.0),
            Row(l_orderkey=3, l_partkey=1, l_suppkey=2, l_extendedprice=10.0),
            Row(l_orderkey=4, l_partkey=1, l_suppkey=3, l_extendedprice=30.0),
            # excluded part
            Row(l_orderkey=5, l_partkey=2, l_suppkey=3, l_extendedprice=1.0),
        ]
    )
    rows = warehouse.min_cost_supplier(lineitem, part, supplier).collect()
    got = sorted((r.p_partkey, r.s_name, r.cost_cents) for r in rows)
    assert got == [(1, "s1", 1000), (1, "s2", 1000)]  # exact tie kept


def test_volume_shipping_directions_and_year(spark):
    nation = spark.createDataFrame(
        [
            Row(n_nationkey=1, n_name="NATION_1", n_regionkey=0),
            Row(n_nationkey=2, n_name="NATION_2", n_regionkey=0),
            Row(n_nationkey=3, n_name="NATION_3", n_regionkey=0),
        ]
    )
    supplier = spark.createDataFrame(
        [
            Row(s_suppkey=1, s_name="s1", s_nationkey=1, s_acctbal=0.0),
            Row(s_suppkey=3, s_name="s3", s_nationkey=3, s_acctbal=0.0),
        ]
    )
    customer = spark.createDataFrame(
        [
            Row(c_custkey=1, c_name="c1", c_nationkey=2, c_acctbal=0.0,
                c_mktsegment="AUTO"),
            Row(c_custkey=2, c_name="c2", c_nationkey=1, c_acctbal=0.0,
                c_mktsegment="AUTO"),
        ]
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=10, o_custkey=1, o_orderstatus="O",
                o_totalprice=0.0, o_orderdate=_ts("1996-02-01"),
                o_orderpriority="1"),
            Row(o_orderkey=11, o_custkey=2, o_orderstatus="O",
                o_totalprice=0.0, o_orderdate=_ts("1996-02-01"),
                o_orderpriority="1"),
        ]
    )
    lineitem = spark.createDataFrame(
        [
            # nation1 supplier -> nation2 customer, 1996: counts
            Row(l_orderkey=10, l_suppkey=1, l_extendedprice=100.0,
                l_discount=0.0, l_shipdate=_ts("1996-06-01")),
            # nation3 supplier: excluded (not in the pair)
            Row(l_orderkey=10, l_suppkey=3, l_extendedprice=999.0,
                l_discount=0.0, l_shipdate=_ts("1996-06-01")),
            # nation1 supplier -> nation1 customer: same nation, excluded
            Row(l_orderkey=11, l_suppkey=1, l_extendedprice=999.0,
                l_discount=0.0, l_shipdate=_ts("1996-06-01")),
            # outside the date window: excluded
            Row(l_orderkey=10, l_suppkey=1, l_extendedprice=999.0,
                l_discount=0.0, l_shipdate=_ts("1995-06-01")),
        ]
    )
    rows = warehouse.volume_shipping(
        lineitem, orders, customer, supplier, nation
    ).collect()
    assert [
        (r.supp_nation, r.cust_nation, r.ship_year, r.n_items, r.revenue_cents)
        for r in rows
    ] == [("NATION_1", "NATION_2", 1996, 1, 10000)]


def test_big_spender_orders_threshold(spark):
    customer = spark.createDataFrame(
        [Row(c_custkey=1, c_name="c1", c_nationkey=1, c_acctbal=0.0,
             c_mktsegment="AUTO")]
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=10, o_custkey=1, o_orderstatus="O",
                o_totalprice=123.456, o_orderdate=_ts("1996-02-01"),
                o_orderpriority="1"),
            Row(o_orderkey=11, o_custkey=1, o_orderstatus="O",
                o_totalprice=50.0, o_orderdate=_ts("1996-02-02"),
                o_orderpriority="1"),
        ]
    )
    lineitem = spark.createDataFrame(
        [
            Row(l_orderkey=10, l_quantity=3.0),
            Row(l_orderkey=10, l_quantity=4.0),
            Row(l_orderkey=11, l_quantity=5.0),
        ]
    )
    rows = warehouse.big_spender_orders(
        customer, orders, lineitem, min_qty=6
    ).collect()
    assert [
        (r.c_name, r.o_orderkey, r.order_date, r.total_price_cents, r.sum_qty)
        for r in rows
    ] == [("c1", 10, "1996-02-01", 12346, 7)]


def test_promo_band_revenue_or_of_ands(spark):
    part = spark.createDataFrame(
        [
            Row(p_partkey=1, p_name="x", p_brand="Brand#11", p_type="STANDARD",
                p_size=5, p_retailprice=1.0),
            Row(p_partkey=2, p_name="y", p_brand="Brand#22", p_type="STANDARD",
                p_size=15, p_retailprice=1.0),
            Row(p_partkey=3, p_name="z", p_brand="Brand#9", p_type="STANDARD",
                p_size=5, p_retailprice=1.0),  # brand outside every band
        ]
    )
    lineitem = spark.createDataFrame(
        [
            # band 1: Brand#11, size<=10, qty 1..15 -> counts (90.00)
            Row(l_orderkey=1, l_partkey=1, l_quantity=5.0,
                l_extendedprice=100.0, l_discount=0.10),
            # Brand#11 but qty outside band 1: excluded
            Row(l_orderkey=2, l_partkey=1, l_quantity=20.0,
                l_extendedprice=999.0, l_discount=0.0),
            # band 2: Brand#22, size<=20, qty 10..25 -> counts (50.00)
            Row(l_orderkey=3, l_partkey=2, l_quantity=12.0,
                l_extendedprice=50.0, l_discount=0.0),
            # non-band brand: excluded
            Row(l_orderkey=4, l_partkey=3, l_quantity=5.0,
                l_extendedprice=999.0, l_discount=0.0),
        ]
    )
    rows = warehouse.promo_band_revenue(lineitem, part).collect()
    assert [(r.n_lines, r.revenue_cents) for r in rows] == [(2, 14000)]


def test_customer_distribution_counts_zero_order_customers(spark):
    customer = spark.createDataFrame(
        [
            Row(c_custkey=1, c_name="a", c_nationkey=1, c_acctbal=0.0,
                c_mktsegment="BUILDING"),
            Row(c_custkey=2, c_name="b", c_nationkey=1, c_acctbal=0.0,
                c_mktsegment="BUILDING"),
            Row(c_custkey=3, c_name="c", c_nationkey=1, c_acctbal=0.0,
                c_mktsegment="BUILDING"),
        ],
    )
    orders = spark.createDataFrame(
        [
            # cust 1: two counted + one excluded-priority order
            Row(o_orderkey=10, o_custkey=1, o_orderstatus="O",
                o_totalprice=1.0, o_orderdate=_ts("1995-01-01"),
                o_orderpriority="5-LOW"),
            Row(o_orderkey=11, o_custkey=1, o_orderstatus="O",
                o_totalprice=1.0, o_orderdate=_ts("1995-01-02"),
                o_orderpriority="5-LOW"),
            Row(o_orderkey=12, o_custkey=1, o_orderstatus="O",
                o_totalprice=1.0, o_orderdate=_ts("1995-01-03"),
                o_orderpriority="1-URGENT"),
            # cust 2: only an excluded order -> counts as zero
            Row(o_orderkey=13, o_custkey=2, o_orderstatus="O",
                o_totalprice=1.0, o_orderdate=_ts("1995-01-04"),
                o_orderpriority="1-URGENT"),
            # cust 3: no orders at all -> zero via the outer join
        ],
    )
    out = {
        r.c_count: r.custdist
        for r in warehouse.customer_distribution(customer, orders).collect()
    }
    assert out == {2: 1, 0: 2}


def test_sales_opportunity_above_avg_and_no_urgent(spark):
    # pool = positive balances in qualifying segments: 100.00 (cust 1,
    # BUILDING), 300.00 (cust 2, BUILDING), 250.00 (cust 3, MACHINERY)
    # -> avg 216.67 (cust 4's FURNITURE doesn't qualify; cust 5's
    # negative balance joins the comparison set but not the pool).
    # Above average: cust 2 (300) and cust 3 (250); cust 3 has an
    # URGENT order so the anti join drops it -> only cust 2 reported.
    customer = spark.createDataFrame(
        [
            Row(c_custkey=1, c_name="a", c_nationkey=1, c_acctbal=100.0,
                c_mktsegment="BUILDING"),
            Row(c_custkey=2, c_name="b", c_nationkey=1, c_acctbal=300.0,
                c_mktsegment="BUILDING"),
            Row(c_custkey=3, c_name="c", c_nationkey=1, c_acctbal=250.0,
                c_mktsegment="MACHINERY"),
            Row(c_custkey=4, c_name="d", c_nationkey=1, c_acctbal=900.0,
                c_mktsegment="FURNITURE"),
            Row(c_custkey=5, c_name="e", c_nationkey=1, c_acctbal=-50.0,
                c_mktsegment="BUILDING"),
        ],
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=10, o_custkey=3, o_orderstatus="O",
                o_totalprice=1.0, o_orderdate=_ts("1995-01-01"),
                o_orderpriority="1-URGENT"),
            Row(o_orderkey=11, o_custkey=2, o_orderstatus="O",
                o_totalprice=1.0, o_orderdate=_ts("1995-01-02"),
                o_orderpriority="5-LOW"),
        ],
    )
    # cross-multiplied: pool sum 65000 cents, n=3; cust2 30000*3 =
    # 90000 > 65000 kept; cust3 25000*3 = 75000 > 65000 but urgent;
    # cust1 10000*3 = 30000 < 65000 below.
    out = [
        (r.c_mktsegment, r.n_custs, r.total_bal_cents)
        for r in warehouse.sales_opportunity(customer, orders).collect()
    ]
    assert out == [("BUILDING", 1, 30000)]


def test_returned_item_revenue_filters_and_ranks(spark):
    """Q10 micro: only R-flag lines inside the quarter count; revenue
    is exact integer cents; ranking is revenue DESC with custkey
    tie-break."""
    customer = spark.createDataFrame(
        [
            Row(c_custkey=1, c_name="a", c_nationkey=1, c_acctbal=1.23,
                c_mktsegment="x"),
            Row(c_custkey=2, c_name="b", c_nationkey=2, c_acctbal=4.56,
                c_mktsegment="x"),
            Row(c_custkey=3, c_name="c", c_nationkey=1, c_acctbal=0.0,
                c_mktsegment="x"),
        ]
    )
    nation = spark.createDataFrame(
        [Row(n_nationkey=1, n_name="N1", n_regionkey=0),
         Row(n_nationkey=2, n_name="N2", n_regionkey=0)]
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=10, o_custkey=1, o_orderstatus="F",
                o_totalprice=0.0, o_orderdate=_ts("1996-02-01"),
                o_orderpriority="1-URGENT"),
            Row(o_orderkey=20, o_custkey=2, o_orderstatus="F",
                o_totalprice=0.0, o_orderdate=_ts("1996-03-31"),
                o_orderpriority="1-URGENT"),
            # outside the quarter: must not count
            Row(o_orderkey=30, o_custkey=3, o_orderstatus="F",
                o_totalprice=0.0, o_orderdate=_ts("1996-04-01"),
                o_orderpriority="1-URGENT"),
        ]
    )

    def li(ok, flag, price, disc):
        return Row(l_orderkey=ok, l_partkey=1, l_suppkey=1, l_linenumber=1,
                   l_quantity=1.0, l_extendedprice=price, l_discount=disc,
                   l_tax=0.0, l_returnflag=flag, l_linestatus="F",
                   l_shipdate=_ts("1996-02-10"))

    lineitem = spark.createDataFrame([
        li(10, "R", 100.0, 0.10),   # cust 1: 100.00 * 90% = 9000 cents
        li(10, "N", 500.0, 0.0),    # not returned: excluded
        li(20, "R", 200.0, 0.0),    # cust 2: 20000 cents
        li(30, "R", 999.0, 0.0),    # order outside window: excluded
    ])
    got = warehouse.returned_item_revenue(
        customer, orders, lineitem, nation
    ).collect()
    assert [
        (r.c_custkey, r.c_name, r.n_name, r.acctbal_cents, r.revenue_cents)
        for r in got
    ] == [(2, "b", "N2", 456, 20000), (1, "a", "N1", 123, 9000)]


def test_small_qty_revenue_correlated_mean(spark):
    """Q17 micro: the per-part mean is computed over the CLASS subset,
    the small-line cut is the cross-multiplied strict inequality, and
    out-of-class parts never contribute."""
    part = spark.createDataFrame(
        [
            Row(p_partkey=1, p_name="p1", p_brand="B", p_type="T",
                p_size=1, p_retailprice=0.0),      # in class
            Row(p_partkey=2, p_name="p2", p_brand="B", p_type="T",
                p_size=50, p_retailprice=0.0),     # out of class
        ]
    )

    def li(pk, qty, price):
        return Row(l_orderkey=1, l_partkey=pk, l_suppkey=1, l_linenumber=1,
                   l_quantity=qty, l_extendedprice=price, l_discount=0.0,
                   l_tax=0.0, l_returnflag="N", l_linestatus="F",
                   l_shipdate=_ts("1996-02-10"))

    # part 1: quantities 1, 10, 10, 19 -> mean 10; small = qty < 2
    #         (20% of 10), so ONLY the qty=1 line (strict: 1 < 2)
    lineitem = spark.createDataFrame([
        li(1, 1.0, 70.0),
        li(1, 10.0, 100.0),
        li(1, 10.0, 100.0),
        li(1, 19.0, 100.0),
        li(2, 1.0, 999.0),  # out-of-class: excluded even though tiny
    ])
    got = warehouse.small_qty_revenue(part, lineitem).collect()
    assert [(r.n_small, r.revenue_cents, r.avg_yearly_cents)
            for r in got] == [(1, 7000, 1000)]
    # boundary: qty exactly at 20% of the mean must NOT count (strict <)
    lineitem2 = spark.createDataFrame([
        li(1, 2.0, 70.0), li(1, 10.0, 1.0), li(1, 10.0, 1.0),
        li(1, 18.0, 1.0),
    ])
    got2 = warehouse.small_qty_revenue(part, lineitem2).collect()
    assert got2[0].n_small == 0
