#!/usr/bin/env python
"""Phase-by-phase profile of discover_cinds(minimal=True) at sf0.1."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import SparkSession

from rdfind_spark.operators.cind import (
    capture_overlaps,
    capture_supports,
    distinct_captures,
    extract_cinds,
    frequent_captures,
    pruned_captures,
    remove_implied_cinds,
)
from rdfind_spark.operators.captures import capture_candidates
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
dcap = distinct_captures(capture_candidates(triples)).persist(
    StorageLevel.MEMORY_AND_DISK
)
dcap.count()  # stacked-cache build order (AQE deadlock dodge)
supports = capture_supports(dcap)
frequent = frequent_captures(supports, 10).persist(StorageLevel.MEMORY_AND_DISK)
frequent.count()
capf = pruned_captures(dcap, frequent)
cands = capture_overlaps(capf, frequent, min_overlap=10)
cands = cands.coalesce(spark.sparkContext.defaultParallelism)
cands = cands.persist(StorageLevel.MEMORY_AND_DISK)
n = cands.count()
t1 = time.time()
print(f"pair stage: {t1-t0:.1f}s  ({n} overlap pairs)", flush=True)

cinds = extract_cinds(cands)
cinds = cinds.persist(StorageLevel.MEMORY_AND_DISK)
n2 = cinds.count()
t2 = time.time()
print(f"extract: {t2-t1:.1f}s  ({n2} cinds)", flush=True)

minimal = remove_implied_cinds(cinds)
n3 = minimal.count()
t3 = time.time()
print(f"minimality: {t3-t2:.1f}s  ({n3} minimal cinds)", flush=True)
print(f"total: {t3-t0:.1f}s", flush=True)
spark.stop()
