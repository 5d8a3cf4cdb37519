"""Z-order (Morton) clustering for multi-dimensional data skipping.

`pipeline.sink.write_partitioned(cluster_by=...)` sorts within
partitions LINEARLY — parquet min/max statistics then prune scans that
filter on the leading sort column, but a predicate on any other column
prunes nothing (every file spans its full range). The 100 TB fix is
the standard one (Databricks Z-ORDER, Hudi/Iceberg space-filling
curves): sort by the interleaved bits of several bucketized columns,
so every file covers a small HYPER-RECTANGLE of the key space and
min/max stats prune on ANY of the clustered dimensions.

Everything here is JVM Column expressions (shift/and/or — whole-stage
codegen), no UDFs; the one driver-side action is the 1-row min/max agg
that `minmax_bucket` needs to scale a column into its bucket range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: bit i of column j lands at position
    ``i * len(cols) + j``. Inputs must already be non-negative ints
    below ``2**bits`` (use `minmax_bucket`); the result fits a LONG for
    ``bits * len(cols) <= 63``.

    Unrolls to ``bits * len(cols)`` shift/and/or terms — a wide but
    flat expression that stays inside whole-stage codegen.
    """
    if not cols:
        raise ValueError("interleave_bits needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a LONG")
    key: Column | None = None
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, i * len(cols) + j)
            key = term if key is None else key.bitwiseOR(term)
    return key


def bucket_expr(
    col: str, lo: float, hi: float, bits: int = 16
) -> Column:
    """Scale a numeric column into ``[0, 2**bits)`` given its range —
    a pure Column expression, no data access. Values outside [lo, hi]
    clamp to the edge buckets (correctness-safe for stale ranges: a
    too-narrow range only weakens pruning at the extremes)."""
    lo_f, hi_f = float(lo), float(hi)
    n = (1 << bits) - 1
    if hi_f <= lo_f:
        return F.lit(0).cast("long")
    scaled = (F.col(col).cast("double") - F.lit(lo_f)) / F.lit(hi_f - lo_f) * n
    return F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(n)).cast("long")


def minmax_buckets(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> list[Column]:
    """Bucket expressions for every clustered column from ONE stats
    pass: a single ``agg(min(c1), max(c1), min(c2), ...)`` scan covers
    all d columns (d separate scans of a possibly-expensive
    unmaterialized plan was the N+1 shape this replaces). Pass
    ``ranges={col: (lo, hi)}`` to skip the scan entirely — at cluster
    scale these are the min/max a table format (Iceberg/Delta) already
    keeps in metadata."""
    missing = [c for c in cols if ranges is None or c not in ranges]
    found: dict[str, tuple[float, float]] = dict(ranges or {})
    if missing:
        row = df.agg(
            *[f for c in missing for f in (F.min(c), F.max(c))]
        ).first()
        for i, c in enumerate(missing):
            lo, hi = row[2 * i], row[2 * i + 1]
            if lo is None or hi is None:
                raise ValueError(
                    f"z-order column {c!r} has no non-null values — "
                    "cannot derive a bucket range"
                )
            found[c] = (lo, hi)
    return [bucket_expr(c, *found[c], bits=bits) for c in cols]


def minmax_bucket(df: DataFrame, col: str, bits: int = 16) -> Column:
    """Single-column form of `minmax_buckets` (one stats scan for this
    column; prefer the plural form when clustering several)."""
    return minmax_buckets(df, [col], bits=bits)[0]


def zorder_layout(
    df: DataFrame,
    bucket_cols: list[Column],
    bits: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Lay the frame out along the Z-curve: range-repartition by the
    Morton key (each output file covers one contiguous curve segment =
    one small hyper-rectangle), then sort within partitions so parquet
    row groups inherit tight min/max on EVERY clustered dimension.
    Drops the helper key column before returning."""
    key = interleave_bits(bucket_cols, bits=bits).alias("_zkey")
    out = df.withColumn("_zkey", key)
    out = (
        out.repartitionByRange(num_files, "_zkey")
        if num_files
        else out.repartitionByRange("_zkey")
    )
    return out.sortWithinPartitions("_zkey").drop("_zkey")


def zorder_key_py(values: list[int], bits: int = 16) -> int:
    """Pure-Python reference for `interleave_bits` (test oracle)."""
    key = 0
    for i in range(bits):
        for j, v in enumerate(values):
            key |= ((v >> i) & 1) << (i * len(values) + j)
    return key
