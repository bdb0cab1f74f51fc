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
