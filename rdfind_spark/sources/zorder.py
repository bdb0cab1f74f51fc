"""Z-order (Morton-curve) data layout for multi-column range pruning.

Parquet row-group min/max statistics prune scans only when the file
layout correlates with the filtered column.  Sorting by ONE column
gives perfect pruning on it and none on the others; interleaving the
bits of SEVERAL columns' rank spaces (the Z-order curve) gives every
interleaved column partial locality, so a range filter on ANY of them
skips most row groups — the standard layout lever for multi-predicate
scans at the 100 TB tier (Delta/Iceberg `OPTIMIZE ZORDER BY` is the
same construction).

Construction (all JVM-side column expressions, no UDF):

1. Each column is rank-normalized to ``bits`` levels with ``ntile``
   over its sort order — rank, not raw value, so skewed distributions
   still fill the curve uniformly (raw-value bit-slicing would collapse
   a heavy-tailed column onto a few curve cells).
2. The per-column level bits are interleaved into one BIGINT z-value
   (most-significant bit first, round-robin across columns).
3. The frame is range-repartitioned and sorted by the z-value, so
   every output file covers a compact curve segment and its per-column
   min/max spans are narrow.

Cost: the ntile ranks need one window per column over a global sort —
at real scale substitute a sampled quantile table (``approxQuantile``
broadcast, the same rank with searchsorted semantics); the curve and
write path are unchanged.  The ntile form is kept here because it is
exact, deterministic, and the write is a once-per-table batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Z_BITS = 8  # levels per column: 8 bits × up to 8 columns fits a BIGINT


def z_value(df: DataFrame, cols: list[str], bits: int = Z_BITS) -> DataFrame:
    """Attach a ``_z`` BIGINT column: the Morton interleave of each
    column's ``bits``-level rank.  The ntile window orders by
    (column, then the other z columns), so the assignment is
    deterministic up to permutation of rows tied on ALL z columns —
    full duplicates may swap ntile cells across runs/partitionings,
    which never affects pruning (identical rows land in the same
    min/max span wherever they fall) but means ``_z`` is not a stable
    row fingerprint; add a unique key column to ``cols`` if one is
    needed."""
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols × {bits} bits exceeds BIGINT")
    out = df
    for c in cols:
        w = Window.orderBy(F.col(c).asc_nulls_first(), *[
            F.col(o).asc_nulls_first() for o in cols if o != c
        ])
        out = out.withColumn(f"_lvl_{c}", F.ntile(2**bits).over(w) - 1)
    # interleave: output bit (bits-1-b)*n_cols + position, MSB first
    n = len(cols)
    terms = []
    for b in range(bits):  # b = 0 is the MSB of each column level
        for i, c in enumerate(cols):
            src_bit = bits - 1 - b
            dst_bit = (bits - 1 - b) * n + (n - 1 - i)
            terms.append(
                (F.shiftright(F.col(f"_lvl_{c}"), src_bit) % 2).cast("long")
                * F.lit(2**dst_bit).cast("long")
            )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return out.withColumn("_z", z).drop(*[f"_lvl_{c}" for c in cols])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = Z_BITS,
    n_files: int = 32,
    sampled: bool = False,
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of
    ``cols``: range-partitioned and sorted by the interleaved z-value,
    so each file covers a compact curve segment and row-group min/max
    stats prune range filters on ANY of the interleaved columns.
    ``sampled=True`` assigns curve levels from one approxQuantile pass
    instead of per-column global-sort windows — the 100 TB form (see
    ``z_value_sampled``); layout quality degrades only by the sketch's
    rel_err."""
    zdf = (z_value_sampled if sampled else z_value)(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def z_value_sampled(
    df: DataFrame,
    cols: list[str],
    bits: int = Z_BITS,
    rel_err: float = 0.001,
) -> DataFrame:
    """The scale form of ``z_value``: per-column level boundaries come
    from ONE ``approxQuantile`` pass (Greenwald-Khanna sketch, no
    global sort, no window) and are applied as a broadcast-literal
    searchsorted — the whole curve assignment is then a narrow map.

    Trade: levels are approximate within ``rel_err`` of the true
    quantiles, which only blurs file boundaries slightly (pruning
    quality degrades smoothly); the exact ``z_value`` keeps a
    per-column global-sort window, unusable at the 100 TB tier."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds BIGINT")
    levels = 2**bits
    probs = [i / levels for i in range(1, levels)]
    dbl = df.select(
        *df.columns,
        *[F.col(c).cast("double").alias(f"_d_{c}") for c in cols],
    )
    cuts = {
        c: q
        for c, q in zip(
            cols, dbl.stat.approxQuantile([f"_d_{c}" for c in cols], probs, rel_err)
        )
    }
    out = dbl
    for c in cols:
        lvl = F.lit(0)
        for cut in cuts[c]:  # ascending boundaries -> searchsorted
            lvl = lvl + F.when(F.col(f"_d_{c}") > cut, 1).otherwise(0)
        out = out.withColumn(f"_lvl_{c}", lvl)
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            src_bit = bits - 1 - b
            dst_bit = (bits - 1 - b) * n + (n - 1 - i)
            terms.append(
                (F.shiftright(F.col(f"_lvl_{c}"), src_bit) % 2).cast("long")
                * F.lit(2**dst_bit).cast("long")
            )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return out.withColumn("_z", z).drop(
        *[f"_lvl_{c}" for c in cols], *[f"_d_{c}" for c in cols]
    )
