"""Bucketed-layout plan tests: joins and aggregations on the bucket
key must run WITHOUT a shuffle exchange."""

from __future__ import annotations

import pytest

from rdfind_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    a = spark.range(0, 10_000).selectExpr("id AS k", "id % 7 AS va")
    b = spark.range(0, 10_000).selectExpr("id AS k", "id % 5 AS vb")
    write_bucketed(a, "bt_a", ["k"], n_buckets=8, path=str(tmp_path / "a"))
    write_bucketed(b, "bt_b", ["k"], n_buckets=8, path=str(tmp_path / "b"))
    yield "bt_a", "bt_b"
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair, monkeypatch):
    ta, tb = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, ta).join(read_table(spark, tb), on="k")
        assert joined.count() == 10_000
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = read_table(spark, ta).groupBy("k").count()
    assert agg.count() == 10_000
    assert "Exchange" not in _plan(agg)


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    # control: the same join WITHOUT the bucketed layout shuffles
    ta, _ = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.range(0, 10_000).selectExpr("id AS k", "id % 5 AS vb")
        joined = read_table(spark, ta).join(plain, on="k")
        assert "Exchange" in _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
