#!/usr/bin/env python
"""One side of a controlled A/B benchmark between two code snapshots.

Usage: python scripts/ab_bench.py REPO_PATH_OR_GIT_REF [query ...]

The first argument is either a directory holding an ``__spark_entry__``
or a git ref (tag/commit) of this repo — a ref is materialized once as
a detached ``git worktree`` under /tmp and reused across invocations,
so historical snapshots never need to be committed into the tree.

Runs the named queries from that snapshot's ``__spark_entry__`` under
the same session config + inter-query cache hygiene as bench.py (fresh
process per invocation, sf0.001 warmup of the same queries first so
both sides pay JIT equally), and prints one JSON line
``{"repo": ..., "queries": {name: sec}}``.

Drive it alternating sides with >= 3 repeats per side (this VM's
run-to-run variance is ±40%), e.g.:

    for i in 1 2 3; do
      python scripts/ab_bench.py r2-end q1 q2 >> ab.jsonl
      python scripts/ab_bench.py /root/repo q1 q2 >> ab.jsonl
    done
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _materialize_snapshot(spec: str) -> str:
    """Directory path → itself; git ref → a cached detached worktree."""
    if os.path.isdir(spec):
        return os.path.abspath(spec)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sha = subprocess.check_output(
        ["git", "-C", repo_root, "rev-parse", "--verify", spec + "^{commit}"],
        text=True,
    ).strip()
    target = f"/tmp/ab_worktree_{sha[:12]}"
    if not os.path.isdir(target):
        subprocess.check_call(
            ["git", "-C", repo_root, "worktree", "add", "--detach", target, sha]
        )
    return target


def main() -> int:
    repo = _materialize_snapshot(sys.argv[1])
    names = sys.argv[2:]
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rdfind-spark-ab")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.maxPlanStringLength", "1000000")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    queries = entry.queries()

    def _clear() -> None:
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    for name in names:  # untimed JIT warmup, same plan shapes
        try:
            queries[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as exc:  # pragma: no cover
            print(f"# warmup {name}: {exc}", file=sys.stderr)
        _clear()

    timings = {}
    for name in names:
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.time() - t0, 3)
        _clear()
    print(json.dumps({"repo": repo, "queries": timings}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
