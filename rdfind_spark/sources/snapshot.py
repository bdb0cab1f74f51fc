"""Snapshot maintenance for a keyed parquet corpus store: latest-wins
upsert merges and small-file compaction — the jobs that keep a
continuously-ingested corpus healthy between training runs.

(Format-library-free: the merge is plain relational algebra over
parquet snapshots — the same shape a table-format MERGE executes — so
it runs anywhere Spark runs.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_snapshot(
    prior: DataFrame,
    updates: DataFrame,
    key: str,
    tombstone_col: str | None = "deleted",
) -> DataFrame:
    """Latest-wins merge: rows in ``updates`` replace prior rows with
    the same ``key``; prior rows without an update pass through; update
    rows flagged in ``tombstone_col`` (when the column exists) delete
    the key from the result.

    Plan shape: ONE left_anti join (prior minus updated keys) + a
    no-shuffle union + a filter — the updates side is usually a day's
    delta, so the anti join broadcasts.  At warehouse scale, write the
    snapshot bucketed by key (sources/bucketed.py) and both the anti
    join and downstream key joins skip their shuffles."""
    has_tomb = tombstone_col is not None and tombstone_col in updates.columns
    upd_keys = updates.select(key).distinct()
    kept = prior.join(F.broadcast(upd_keys), on=key, how="left_anti")
    live = (
        updates.filter(~F.coalesce(F.col(tombstone_col), F.lit(False))).drop(
            tombstone_col
        )
        if has_tomb
        else updates
    )
    return kept.unionByName(live.select(*prior.columns))


def compact_snapshot(
    spark: SparkSession, path: str, out_path: str, target_files: int = 8
) -> int:
    """Rewrite a many-small-files snapshot into ``target_files`` files
    (coalesce — a no-shuffle repartition downward); returns the row
    count written.  Run after enough upsert deltas accumulate that scan
    task count, not data volume, dominates read cost."""
    df = spark.read.parquet(path)
    n = df.count()
    df.coalesce(target_files).write.mode("overwrite").parquet(out_path)
    return n
