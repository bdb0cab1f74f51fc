#!/usr/bin/env python
"""Mean recall@k grid for the ANN variants — seeded vs trained coarse
quantizer, exact scoring vs PQ+ADC, at several rescore depths.

Usage: python scripts/pq_recall_grid.py [sf_dir]   (default sf0.01)

Prints one line per cell; the README quotes the table.  The synthetic
embeddings are UNIFORM random (PQ's adversarial case, no cluster
structure), so these are floor numbers — see knn_ivf_pq's docstring.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from rdfind_spark.functions import similarity as sim


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def mean_recall(df):
        return round(
            df.agg(F.avg("recall_at_k")).collect()[0][0], 3
        )

    print(f"# sf_dir={sf_dir}")
    print(
        "# exact-scoring ceilings: seeded",
        mean_recall(sim.knn_ivf_recall(embs)),
        "trained",
        mean_recall(sim.knn_ivf_trained_recall(embs)),
        flush=True,
    )
    for rescore in (30, 50, 80):
        seeded = mean_recall(sim.knn_ivf_pq_recall(embs, rescore=rescore))
        trained = mean_recall(
            sim.knn_ivf_pq_trained_recall(embs, rescore=rescore)
        )
        print(
            f"# rescore={rescore}: pq_seeded={seeded} pq_trained={trained}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
