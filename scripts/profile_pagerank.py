#!/usr/bin/env python
"""Per-segment PageRank profile at sf0.1: runs the query with 0/1/3/5
iterations (after a JIT warmup at sf0.001, caches cleared between runs)
— the intercept is the fixed prefix (edge build + top-k restore), the
slope the true per-iteration cost."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    from rdfind_spark.functions import graph
    from rdfind_spark.sources.triples import triple_view

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _clear() -> None:
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graph.pagerank(triple_view(spark, "/root/testdata/sf0.001")).write.format(
        "noop"
    ).mode("overwrite").save()
    _clear()
    for iters in (0, 1, 3, 5, 5):
        t0 = time.time()
        graph.pagerank(triple_view(spark, sf), iterations=iters).write.format(
            "noop"
        ).mode("overwrite").save()
        print(f"iters={iters}: {time.time() - t0:.1f}s", flush=True)
        _clear()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
