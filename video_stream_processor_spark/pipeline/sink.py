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


def foreach_batch_overwrite(path: str, fmt: str = "json"):
    """S7/T3: complete-recompute streaming sink — every micro-batch
    rewrites the whole output (the reference's per-run overwrite, :341),
    idempotent w.r.t. epoch replay."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:  # noqa: ARG001
        batch_df.write.mode("overwrite").format(fmt).save(path)

    return _sink
