"""Sinks (SURVEY §2.1 S6-S8, §2.8 T3).

Two tiers, per the SURVEY §7 watch list:

* ``write_json_array`` — reference-parity sink: ONE pretty-printed JSON
  array file, overwrite, post-write verification
  (video_processor.py:338-354). Inherently single-file → driver-side,
  small outputs only (the reference writes ~11 records).
* ``write_partitioned`` — the scale path: partitioned JSON-lines or
  parquet via the distributed writer.
* ``foreach_batch_overwrite`` — the streaming commit protocol: the
  workflow's diff-then-commit loop (update-streams.yml:74-100) becomes
  an idempotent overwrite-by-batch ``foreachBatch`` sink with
  checkpointing; re-running a failed epoch rewrites the same output.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame


class SinkVerificationError(RuntimeError):
    pass


def write_json_array(
    df: DataFrame, path: str, verify: bool = True, max_rows: int = 10_000
) -> int:
    """S6: single JSON array file, UTF-8, ensure_ascii=False, overwrite;
    verify exists & non-empty after write (:346-350). Returns count.

    Driver-side by construction (the reference writes ~11 records) —
    guarded so misuse on a big DataFrame fails loudly instead of
    collecting it into driver memory. Use ``write_partitioned`` for
    anything larger."""
    # limit(max_rows + 1) bounds the collect itself: the guard never
    # pulls more than max_rows + 1 rows onto the driver.
    records = [
        row.asDict(recursive=True) for row in df.limit(max_rows + 1).collect()
    ]
    if len(records) > max_rows:
        raise ValueError(
            f"write_json_array is a single-file driver-side sink capped at "
            f"{max_rows} rows; this DataFrame has more — use "
            "write_partitioned for large outputs"
        )
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".json.tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(records, fh, indent=2, ensure_ascii=False, default=str)
        os.replace(tmp, path)  # atomic overwrite — no torn output.json
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if verify:
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            raise SinkVerificationError(f"sink verification failed: {path}")
    return len(records)


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    zorder_files: int | None = None,
) -> None:
    """The 100 TB sink: distributed writer, optional hive partitioning.

    ``max_records_per_file`` caps file size (a 1000-executor job
    writing unbounded files produces un-splittable multi-GB parquet;
    capping keeps downstream scans parallel). ``cluster_by`` sorts
    within partitions before writing — rows with equal/near keys land
    in the same row groups, so parquet min/max statistics actually
    prune and run-length/dictionary encodings compress (the cheap
    two-thirds of a Z-order without the shuffle). ``zorder_by`` pays
    that shuffle: range-repartition + sort along the Morton curve of
    the named numeric columns (operators/zorder.py), so min/max stats
    prune scans filtering on ANY of the listed dimensions, not just
    the leading sort key. Mutually exclusive with ``cluster_by``."""
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    if zorder_by:
        from ..operators.zorder import minmax_buckets, zorder_layout

        # one stats scan for ALL clustered columns, not one per column
        buckets = minmax_buckets(df, zorder_by)
        df = zorder_layout(df, buckets, num_files=zorder_files)
    if cluster_by:
        df = df.sortWithinPartitions(*cluster_by)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.format(fmt).save(path)


def _swap_dirs(tmp: str, final: str, bak: str) -> None:
    """Two renames; split out so crash tests can inject a failure
    between write and swap."""
    os.rename(final, bak)
    os.rename(tmp, final)


def rewrite_in_place(
    spark,
    path: str,
    write_fn,
    fmt: str = "parquet",
    verify_checksum: bool = True,
) -> int:
    """Rewrite a table's physical layout ONTO ITSELF — the natural ops
    invocation Spark (correctly) refuses as a direct
    overwrite-from-read: the scan would list files the overwrite is
    deleting. The ops-grade staged form:

    1. **stage** — read ``path`` lazily and let ``write_fn(df,
       tmp_dir)`` produce the full re-laid-out copy next to the
       target (same filesystem, so the later rename is a metadata op);
    2. **verify** — re-read the staged copy and compare row count
       and (optionally) an order-independent content checksum against
       the ORIGINAL — a bad rewrite refuses to swap and the original
       is untouched. The checksum is the pair (bit_xor(xxhash64(all
       cols sorted by name)), sum(pmod(xxhash64, 2^16))): XOR commutes
       and never overflows but is blind to even-multiplicity changes,
       the bounded modular sum counts multiplicity and stays inside a
       LONG past 10^14 rows (ANSI mode forbids a wrapping raw sum) —
       together they're order/layout-independent and duplicate-aware;
    3. **swap** — rename original -> ``<path>.__rewrite_bak__``,
       staged -> original, then delete the backup.

    Crash contract: any failure up to and including verification
    leaves the original serving; the only non-atomic window is
    between the two renames, which leaves ``.__rewrite_bak__``
    holding the intact original (recover by renaming it back — the
    guard below refuses to start a new rewrite while one exists,
    instead of silently clobbering the evidence). On a real cluster
    the same protocol rides the table format's atomic snapshot swap
    (Iceberg/Delta replace); this is the filesystem form.

    Returns the row count."""
    import shutil

    path = os.path.abspath(path.rstrip("/"))
    tmp = path + ".__rewrite_tmp__"
    bak = path + ".__rewrite_bak__"
    if os.path.exists(bak):
        raise SinkVerificationError(
            f"previous in-place rewrite of {path} left a backup at {bak} "
            "(crash between write and swap); restore or remove it first"
        )
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    def _metrics(df):
        from pyspark.sql import functions as F

        cols = sorted(df.columns)
        agg = [F.count(F.lit(1)).alias("n")]
        if verify_checksum:
            h = F.xxhash64(*cols)
            agg.append(F.bit_xor(h).alias("x"))
            agg.append(F.sum(F.pmod(h, F.lit(1 << 16))).alias("s"))
        row = df.agg(*agg).first()
        return (
            (row["n"], row["x"], row["s"]) if verify_checksum else (row["n"],)
        )

    try:
        src = spark.read.format(fmt).load(path)
        write_fn(src, tmp)
        want = _metrics(spark.read.format(fmt).load(path))
        # Read the staged copy with the ORIGINAL's schema: if write_fn
        # added partitioning, the partition columns are re-inferred on
        # read-back (bigint -> int) and xxhash64 hashes int and long
        # differently, so identical content would fail verification.
        # Pinning the source schema also fails closed if write_fn
        # dropped a column (it reads back all-null -> checksum mismatch).
        got = _metrics(spark.read.schema(src.schema).format(fmt).load(tmp))
        if got != want:
            raise SinkVerificationError(
                f"in-place rewrite of {path} failed verification "
                f"(rows, checksum): staged {got} != original {want}; "
                "original left untouched"
            )
        _swap_dirs(tmp, path, bak)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(bak, ignore_errors=True)
    return want[0]


def foreach_batch_overwrite(path: str, fmt: str = "json"):
    """S7/T3: complete-recompute streaming sink — every micro-batch
    rewrites the whole output (the reference's per-run overwrite, :341),
    idempotent w.r.t. epoch replay."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:  # noqa: ARG001
        batch_df.write.mode("overwrite").format(fmt).save(path)

    return _sink
