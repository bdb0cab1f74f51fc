"""Bucketed-layout plan tests: joins and aggregations on the bucket
key must run WITHOUT a shuffle exchange."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

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


def test_z_value_matches_morton_reference(spark):
    """4×4 grid, 2 bits/column: ntile levels equal the raw values, so
    _z must equal the hand-computed Morton interleave."""
    from rdfind_spark.sources.zorder import z_value

    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r._z for r in z_value(df, ["x", "y"], bits=2).collect()
    }

    def morton(x, y, bits=2):
        z = 0
        for b in range(bits):  # b=0 is MSB
            src = bits - 1 - b
            z += ((x >> src) & 1) * 2 ** (src * 2 + 1)
            z += ((y >> src) & 1) * 2 ** (src * 2)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}
    # quadrant property: the first quarter of the curve IS the
    # low-low quadrant — the locality that makes min/max pruning work
    first_quarter = sorted(rows, key=lambda p: got[p])[:4]
    assert all(x < 2 and y < 2 for x, y in first_quarter)


def test_write_zordered_files_have_narrow_column_spans(spark, tmp_path):
    """Every output file must cover a compact curve segment: per-file
    min/max spans of BOTH interleaved columns stay near half the
    domain (a single-column sort would leave the other column's span
    at the full domain in every file)."""
    from pyspark.sql import functions as F

    from rdfind_spark.sources.zorder import write_zordered

    rows = [(x, y, x * 16 + y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int, payload int")
    path = str(tmp_path / "zorder")
    write_zordered(df, path, ["x", "y"], bits=4, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 256 and set(back.columns) == {"x", "y", "payload"}
    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert len(spans) >= 3
    for r in spans:
        assert r.xs <= 9 and r.ys <= 9, (r.xs, r.ys)


def test_z_value_sampled_matches_exact_on_uniform_grid(spark):
    """On a uniform grid with rel_err=0 the GK sketch is exact, so the
    sampled-quantile curve must equal the exact ntile curve (up to the
    constant level offset both encode identically)."""
    from rdfind_spark.sources.zorder import z_value, z_value_sampled

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    exact = {
        (r.x, r.y): r._z for r in z_value(df, ["x", "y"], bits=2).collect()
    }
    sampled = {
        (r.x, r.y): r._z
        for r in z_value_sampled(df, ["x", "y"], bits=2, rel_err=0.0).collect()
    }
    assert sampled == exact


def test_z_value_sampled_fills_curve_under_skew(spark):
    """A heavy-tailed RANGE (99% of values in [0,900), a tail out to
    1e14) must still occupy every curve level: quantile normalization
    spreads by rank, where raw-value bit-slicing would collapse 99% of
    rows into level 0.  (Massive TIES are different: a 90%-one-value
    column correctly collapses to few levels, because quantiles balance
    mass, not distinct values.)"""
    from pyspark.sql import functions as F

    from rdfind_spark.sources.zorder import z_value_sampled

    rows = [(i, i) for i in range(900)] + [
        (900 + i, 10 ** (6 + i)) for i in range(9)
    ]
    df = spark.createDataFrame(rows, "id int, v long")
    z = z_value_sampled(df, ["v"], bits=3, rel_err=0.0)
    n_levels = z.select((F.col("_z")).alias("l")).distinct().count()
    assert n_levels == 8, "rank normalization must fill all 2^3 levels"
    # raw-value slicing for contrast: 8 equal-width bins over the full
    # range put every non-tail row in bin 0
    width = (10**14) // 8
    raw_bins = {min(v // width, 7) for _, v in rows}
    assert len(raw_bins) <= 3, "the contrast premise itself"


def test_zorder_prunes_row_groups_end_to_end(spark, tmp_path):
    """The operator's reason to exist, measured: write the SAME table
    linear (range-sorted by l_partkey) and z-ordered on
    (l_partkey, l_suppkey), then count the row groups a min/max-stats
    reader MUST read for a ~10% band predicate on each column
    (pyarrow footer statistics — the same stats Spark's parquet reader
    prunes with).

    Measured at sf0.01, 32 files (pinned with margin below):

    | layout | partkey band | suppkey band | worst case |
    |---|---|---|---|
    | linear (sort by partkey) | 4/32 | 32/32 (none) | 32 |
    | z-order (both)           | 10/32 | 18/32       | 18 |

    The curve trades perfect pruning on the sort column for PARTIAL
    pruning on every interleaved column — the second predicate goes
    from scanning everything to skipping ~45%, which is the whole
    point for multi-predicate scans at the 100 TB tier.  Needs sf0.01
    (sf0.001 has ~10 distinct suppliers — no rank resolution)."""
    import glob

    import pyarrow.parquet as pq

    from rdfind_spark.sources.zorder import write_zordered

    src = "/root/testdata/sf0.01/lineitem.parquet"
    if not os.path.isdir(src) and not os.path.exists(src):
        pytest.skip("sf0.01 testdata not present")
    df = spark.read.parquet(src)
    n_files = 32
    lin = str(tmp_path / "linear")
    zor = str(tmp_path / "zorder")
    (
        df.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lin)
    )
    write_zordered(df, zor, ["l_partkey", "l_suppkey"], bits=5, n_files=n_files)

    def must_read(path, col, lo, hi):
        read = total = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(rg.num_columns):
                    c = rg.column(j)
                    if c.path_in_schema == col:
                        total += 1
                        st = c.statistics
                        if st is None or (st.min <= hi and st.max >= lo):
                            read += 1
        return read, total

    # ~10% bands around the median of each key (45th..55th pct of the
    # synthetic uniform domains)
    pk = df.approxQuantile("l_partkey", [0.45, 0.55], 0.0)
    sk = df.approxQuantile("l_suppkey", [0.45, 0.55], 0.0)
    lin_pk, tot = must_read(lin, "l_partkey", *pk)
    lin_sk, _ = must_read(lin, "l_suppkey", *sk)
    z_pk, _ = must_read(zor, "l_partkey", *pk)
    z_sk, _ = must_read(zor, "l_suppkey", *sk)
    assert tot >= n_files - 2
    # linear: near-perfect on the sort column, ZERO pruning on the other
    assert lin_pk <= 6
    assert lin_sk == tot
    # z-order: partial pruning on BOTH; the non-sort column must skip
    # at least a quarter of the row groups (measured: 18/32 read)
    assert z_sk <= tot * 3 // 4, (z_sk, tot)
    assert z_pk <= tot // 2, (z_pk, tot)
    # the sampled (no-global-sort, 100 TB) curve must prune about as
    # well as the exact ntile curve (measured: 10/32 and 20/32 vs the
    # exact form's 10/32 and 18/32)
    zsam = str(tmp_path / "zorder_sampled")
    write_zordered(
        df, zsam, ["l_partkey", "l_suppkey"], bits=5, n_files=n_files,
        sampled=True,
    )
    zs_pk, _ = must_read(zsam, "l_partkey", *pk)
    zs_sk, _ = must_read(zsam, "l_suppkey", *sk)
    assert zs_sk <= tot * 3 // 4, (zs_sk, tot)
    assert zs_pk <= tot // 2, (zs_pk, tot)
    # same data in both layouts: the band scans return identical counts
    got_lin = (
        spark.read.parquet(lin)
        .filter((F.col("l_suppkey") >= sk[0]) & (F.col("l_suppkey") <= sk[1]))
        .count()
    )
    got_z = (
        spark.read.parquet(zor)
        .filter((F.col("l_suppkey") >= sk[0]) & (F.col("l_suppkey") <= sk[1]))
        .count()
    )
    assert got_lin == got_z > 0
