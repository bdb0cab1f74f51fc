"""Trie + null-ordering semantics pins (FIXTURES.md §1; reference
StringTrie$Test.scala:15-42, NullSensitiveOrdered$Test.scala:12-22)."""

from __future__ import annotations

from rdfind_spark.util import StringTrie, null_sensitive_cmp

PREFIXES = {
    "http://dbpedia.org/resource/": "dbpr",
    "http://dbpedia.org/resource/Category:": "dbpc",
    "http://xmlns.com/foaf/0.1/": "foaf",
    "urn:yahoo:maps": "y",
}


def make_trie() -> StringTrie:
    t = StringTrie()
    for k, v in PREFIXES.items():
        t.put(k, v)
    return t


def test_longest_prefix_match():
    t = make_trie()
    key, val = t.longest_prefix("http://dbpedia.org/resource/Berlin")
    assert (key, val) == ("http://dbpedia.org/resource/", "dbpr")
    key, val = t.longest_prefix("http://dbpedia.org/resource/Category:Cities")
    assert (key, val) == ("http://dbpedia.org/resource/Category:", "dbpc")
    key, val = t.longest_prefix("http://xmlns.com/foaf/0.1/knows")
    assert (key, val) == ("http://xmlns.com/foaf/0.1/", "foaf")


def test_miss_and_exact():
    t = make_trie()
    assert t.longest_prefix("https://example.org/x") == (None, None)
    assert t.longest_prefix("urn:yahoo:maps") == ("urn:yahoo:maps", "y")
    assert t.get("urn:yahoo:maps") == "y"
    assert t.get("urn:yahoo:map") is None


def test_empty_key_root():
    t = make_trie()
    t.put("", "root")
    key, val = t.longest_prefix("zzz")
    assert (key, val) == ("", "root")


def test_to_pairs_roundtrip():
    t = make_trie()
    assert dict(t.to_pairs()) == PREFIXES


def test_null_ordering():
    assert null_sensitive_cmp(None, "a") == -1
    assert null_sensitive_cmp("a", None) == 1
    assert null_sensitive_cmp(None, None) == 0
    assert null_sensitive_cmp("a", "b") == -1
    assert null_sensitive_cmp("b", "a") == 1
    assert null_sensitive_cmp("a", "a") == 0


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from rdfind_spark.util import salted_join

    # one hot key (0) with 5k rows + a long tail
    left = spark.range(0, 6000).selectExpr(
        "CASE WHEN id < 5000 THEN 0 ELSE id END AS k", "id AS v"
    )
    right = spark.createDataFrame(
        [(0, "hot"), (5500, "cold"), (9999, "absent-left")], "k long, tag string"
    )
    plain = left.join(right, on="k").groupBy("k", "tag").count()
    salted = salted_join(left, right, on=["k"]).groupBy("k", "tag").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left join multiplicities preserved too
    pl = left.join(right, on="k", how="left").count()
    sl = salted_join(left, right, on=["k"], how="left").count()
    assert pl == sl == 6000


def test_materialize_reliable_checkpoint_mode(spark, tmp_path):
    """materialize() defaults to localCheckpoint; with
    spark.rdfind.checkpointDir set it writes reliable checkpoints to
    that directory (cluster fault-tolerance posture)."""
    from rdfind_spark.util import materialize

    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    local = materialize(df)
    assert local.count() == 100
    assert local.rdd.getNumPartitions() >= 1

    cdir = str(tmp_path / "reliable-ckpt")
    spark.conf.set("spark.rdfind.checkpointDir", cdir)
    try:
        reliable = materialize(df)
        assert reliable.count() == 100
        # the reliable mode must actually have written to the directory
        import os

        found = []
        for root, _dirs, files in os.walk(cdir):
            found.extend(files)
        assert found, f"no checkpoint files under {cdir}"
        # results agree across modes
        assert sorted(map(tuple, reliable.collect())) == sorted(
            map(tuple, local.collect())
        )
    finally:
        spark.conf.unset("spark.rdfind.checkpointDir")


def test_skew_report_ranks_heavy_keys_and_sizes_salt(spark):
    from rdfind_spark.util import skew_report

    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, ["k"], top_k=2).collect()
    assert [(r.k, r.n_rows, r.freq_ppm) for r in got] == [
        ("hot", 70, 700000),
        ("warm", 20, 200000),
    ]
    assert all(r.suggested_salt == 1 for r in got)  # tiny table: AQE is enough


def test_release_frees_local_checkpoint_blocks(spark):
    """df.unpersist() is a documented NO-OP on a localCheckpoint-backed
    frame (the blocks are pinned on the checkpoint RDD, not registered
    for the DataFrame in the cache manager); util.release must actually
    drop them.  Asserted via the Spark-context persistent-RDD registry
    delta so other session state doesn't interfere."""
    from pyspark.sql import functions as F

    from rdfind_spark.util import materialize, release

    sc = spark.sparkContext

    def persisted_ids():
        ids = set()
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            ids.add(it.next()._1())
        return ids

    before = persisted_ids()
    ck = materialize(
        spark.range(10_000).select("id", (F.col("id") * 2).alias("y"))
    )
    created = persisted_ids() - before
    assert created, "materialize should pin blocks"
    ck.unpersist()  # the documented no-op
    assert created <= persisted_ids(), "unpersist must be the no-op we claim"
    release(ck)
    after = persisted_ids()
    assert not (created & after), "release must drop the pinned RDD blocks"
    # releasing an ordinary (non-checkpoint) frame is a safe no-op
    release(spark.range(10).select("id"))
