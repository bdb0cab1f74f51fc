#!/usr/bin/env python
"""Phase-by-phase profile of discover_cinds(minimal=True) at sf0.1 —
mirrors the hashed bulk pipeline in operators.cind.discover_cinds
(stage boundaries materialized so each phase is timed separately)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from rdfind_spark.operators.captures import capture_candidates
from rdfind_spark.operators.cind import (
    CAPTURE_KEY,
    capture_overlaps,
    extract_cinds,
    remove_implied_cinds,
)
from rdfind_spark.sources.triples import triple_view

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
triples = triple_view(spark, sf_dir)
cand = capture_candidates(triples)
caph = cand.select(
    F.xxhash64("join_value").alias("jv1"),
    F.hash("join_value").alias("jv2"),
    F.xxhash64("code", "v1", "v2").alias("h1"),
    F.hash("code", "v1", "v2").alias("h2"),
)
dcap_h = caph.distinct().persist(StorageLevel.MEMORY_AND_DISK)
print(f"dcap_h: {dcap_h.count()} rows {time.time() - t0:.1f}s")

t1 = time.time()
freq_h = (
    dcap_h.groupBy("h1", "h2")
    .agg(F.count("*").alias("support"))
    .filter(F.col("support") >= 10)
    .persist(StorageLevel.MEMORY_AND_DISK)
)
print(f"freq_h: {freq_h.count()} rows {time.time() - t1:.1f}s")

t1 = time.time()
frequent = (
    cand.select(
        "code",
        "v1",
        "v2",
        F.xxhash64("code", "v1", "v2").alias("h1"),
        F.hash("code", "v1", "v2").alias("h2"),
    )
    .join(F.broadcast(freq_h), on=["h1", "h2"])
    .groupBy("h1", "h2", "support")
    .agg(
        F.first("code").alias("code"),
        F.first("v1").alias("v1"),
        F.first("v2").alias("v2"),
    )
    .select(*CAPTURE_KEY, "support")
    .persist(StorageLevel.MEMORY_AND_DISK)
)
print(f"frequent: {frequent.count()} rows {time.time() - t1:.1f}s")

t1 = time.time()
capf = (
    dcap_h.join(F.broadcast(freq_h), on=["h1", "h2"])
    .select("jv1", "jv2", "h1", "h2", "support")
    .persist(StorageLevel.MEMORY_AND_DISK)
)
print(f"capf: {capf.count()} rows {time.time() - t1:.1f}s")

t1 = time.time()
cands = capture_overlaps(capf, frequent, min_overlap=10)
cands = cands.coalesce(spark.sparkContext.defaultParallelism).persist(
    StorageLevel.MEMORY_AND_DISK
)
print(f"overlaps: {cands.count()} rows {time.time() - t1:.1f}s")

t1 = time.time()
cinds = extract_cinds(cands).persist(StorageLevel.MEMORY_AND_DISK)
print(f"cinds: {cinds.count()} rows {time.time() - t1:.1f}s")

t1 = time.time()
minimal = remove_implied_cinds(cinds)
print(f"minimal: {minimal.count()} rows {time.time() - t1:.1f}s")
print(f"TOTAL {time.time() - t0:.1f}s")
