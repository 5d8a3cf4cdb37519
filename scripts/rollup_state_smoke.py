#!/usr/bin/env python
"""Measure the rollup maintainer's streaming-state footprint — and
SATURATE its 2^p per-group cap.

The r7 format change (mergeable HLL register sketches) made the
maintainer a CHAINED stateful aggregation whose stage-1 state is keyed
by (window, event_type, user-bucket) — up to 2^p rows per open group
where the estimate-only format kept one. Two measurements, both landing
in SCALE.md:

* **fixture**: the real maintainer over the sf0.1 events fixture
  (multi-file source, one file per trigger, so the watermark advances
  and windows actually close) at the default precision p=12 and at
  p=8. At this corpus the state is bounded by the DATA (groups hold
  far fewer than 2^8 distinct users), so this measures the realistic
  small-group regime.
* **saturation**: a synthetic corpus built to exercise the cap the
  100 TB story rests on (r8 verdict: "the HLL state-cap claim is
  extrapolated, not measured") — HOT_HOURS hourly windows each holding
  HOT_USERS=50k distinct users (≫ 2^12), arranged so both windows are
  OPEN at one trigger boundary (events span only the first 29 min of
  each hour, one file per hour in mtime order, watermark 30 min — the
  file source replays in modification-time order, set explicitly).
  Expected stage-1 peak = open_groups × 2^p exactly: 50k users hash
  into all 4096 (p=12) / 256 (p=8) buckets with probability ~1-5e-6
  per bucket, so the measured maximum must sit in a tight band above
  open_groups × 2^p, and dropping p 12→8 must cut it ~16×. The script
  ASSERTS both — if the cap ever stops holding, this smoke fails
  rather than printing a smaller number quietly.

Stage-1 vs stage-2 are identified by INDEX in the stateOperators
array, not by comparing row counts (r8 advisor: a row-count sort
mislabels them when the counts tie): both operators report
operatorName=stateStoreSave, and probe-measured on this build
(pyspark 4.1) the array lists the DOWNSTREAM final aggregation at
index 0 (append-mode eviction → ~0 rows held at trigger end) and the
upstream bucketed-partials aggregation at index 1. The saturation run
cross-checks the convention: its stage-1 maximum must exceed the
stage-2 maximum by >100x, so a Spark upgrade that reordered the array
would trip the assertion instead of silently swapping labels.

Usage: python scripts/rollup_state_smoke.py  [prints one JSON line]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from video_stream_processor_spark.io import load_table  # noqa: E402
from video_stream_processor_spark.session import get_spark  # noqa: E402
from video_stream_processor_spark.streaming.rollup import (  # noqa: E402
    start_rollup_maintenance,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_SRC_FILES = 8  # 8 time-ranged files -> 8 triggers of watermark advance

#: stateOperators index convention (probe-verified, see module docstring)
IDX_STAGE2_FINAL = 0
IDX_STAGE1_BUCKETED = 1

HOT_USERS = 50_000
HOT_HOURS = 2


def _maintain_and_read_ops(spark, src: str, out: str, p: int) -> dict:
    """Run the real maintainer over ``src`` and return per-operator
    state maxima, labeled by the probe-verified index convention."""
    live, ckpt = os.path.join(out, "live"), os.path.join(out, "ckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # state_partitions pinned to the session conf: this probe's curves
    # (state rows per store count, SCALE.md history) were measured at
    # the session default; the r10 'auto' default would re-size new
    # checkpoints and silently change the instrument
    q = start_rollup_maintenance(
        stream, live, ckpt, size="1 hour", watermark="30 minutes", p=p,
        state_partitions=None,
    )
    if not q.awaitTermination(900):
        q.stop()
        raise RuntimeError("maintainer did not drain within 900s")
    progress = [pr for pr in q.recentProgress if pr["stateOperators"]]
    n_ops = {len(pr["stateOperators"]) for pr in progress}
    assert n_ops == {2}, f"expected the chained 2-operator shape, got {n_ops}"

    def op_max(i: int) -> dict:
        return {
            "max_rows": max(
                pr["stateOperators"][i]["numRowsTotal"] for pr in progress
            ),
            "max_memory_bytes": max(
                pr["stateOperators"][i]["memoryUsedBytes"] for pr in progress
            ),
        }

    return {
        "p": p,
        "triggers_with_state": len(progress),
        "stage2_final": op_max(IDX_STAGE2_FINAL),
        "stage1_bucketed": op_max(IDX_STAGE1_BUCKETED),
        "rows_written": spark.read.parquet(live).count(),
    }


def measure_fixture(spark, src: str, scratch: str, p: int) -> dict:
    return _maintain_and_read_ops(spark, src, os.path.join(scratch, f"p{p}"), p)


def _write_saturating_corpus(spark, src: str) -> None:
    """HOT_HOURS hourly windows × HOT_USERS distinct users each, events
    confined to the first 29 minutes of each hour so the 30-minute
    watermark keeps EVERY hot window open until the tail file lands —
    the stage-1 peak is then all hot groups at their bucket cap
    simultaneously. One file per hour plus the closing tail, replayed
    in that order via explicit modification times (the file source
    processes oldest-mtime first)."""
    base = F.to_timestamp(F.lit("2024-06-01 08:00:00"))
    paths = []
    for h in range(HOT_HOURS):
        part = os.path.join(src, f"hour{h}")
        (
            spark.range(HOT_USERS)
            .select(
                (F.col("id") + h * HOT_USERS).alias("event_id"),
                (
                    base
                    + F.make_interval(
                        secs=(
                            h * 3600 + (F.col("id") % 1740)
                        ).cast("double")
                    )
                ).alias("ts"),
                F.col("id").alias("user_id"),
                F.lit("hot").alias("event_type"),
                F.lit(1.0).alias("value"),
            )
            .coalesce(1)
            .write.parquet(part)
        )
        paths.append(part)
    tail = os.path.join(src, "tail")
    (
        spark.range(1)
        .select(
            F.lit(999_999_999).cast("long").alias("event_id"),
            F.to_timestamp(F.lit("2024-06-01 23:00:00")).alias("ts"),
            F.lit(0).cast("long").alias("user_id"),
            F.lit("tail").alias("event_type"),
            F.lit(1.0).alias("value"),
        )
        .coalesce(1)
        .write.parquet(tail)
    )
    paths.append(tail)
    # replay order = mtime order: stamp strictly increasing times
    t0 = 1_700_000_000
    for i, d in enumerate(paths):
        for f in os.listdir(d):
            full = os.path.join(d, f)
            os.utime(full, (t0 + i * 10, t0 + i * 10))


def measure_saturation(spark, scratch: str, p: int) -> dict:
    src = os.path.join(scratch, "hot_src")
    if not os.path.exists(src):
        _write_saturating_corpus(spark, src)
    # glob the hour/tail subdirs into one source dir view
    run = _maintain_and_read_ops(
        spark, os.path.join(src, "*"), os.path.join(scratch, f"hot_p{p}"), p
    )
    cap = 1 << p
    expected = HOT_HOURS * cap  # every hot group saturates every bucket
    got = run["stage1_bucketed"]["max_rows"]
    # near-tight band: P(one bucket empty) ~ e^-(50k/2^p) is ~5e-6 at
    # p=12, but across HOT_HOURS*2^p buckets that still aggregates to a
    # few-percent chance of >=1 miss per run — allow an 8-row deficit
    # (P(>=8 misses) is negligible) so hash randomness can't fail the
    # evidence chain, plus at most a handful of tail-group rows riding
    # the same trigger on the high side
    assert expected - 8 <= got <= expected + 64, (
        f"stage-1 peak {got} outside [{expected - 8}, {expected + 64}] "
        f"at p={p}: the 2^p per-group cap did not saturate as designed"
    )
    # index-convention cross-check (see module docstring)
    assert got > 100 * max(run["stage2_final"]["max_rows"], 1), (
        "stage-1/stage-2 labels look swapped: "
        f"{got} vs {run['stage2_final']['max_rows']}"
    )
    run["hot_groups"] = HOT_HOURS
    run["hot_users_per_group"] = HOT_USERS
    run["expected_stage1_rows"] = expected
    return run


def main() -> None:
    spark = get_spark(app_name="vsp-rollup-state-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="vsp_state_smoke_")
    try:
        src = os.path.join(scratch, "events_src")
        load_table(spark, SF_DIR, "events").repartitionByRange(
            N_SRC_FILES, "ts"
        ).write.parquet(src)
        # replay the range files in TIME order (part-00000 holds the
        # lowest ts range): the file source processes oldest-mtime
        # first, and the write's own mtimes land in arbitrary order —
        # which made the watermark advance (and so the measured state
        # peak) drift a few % between otherwise identical runs
        t0 = 1_700_000_000
        for i, f in enumerate(sorted(os.listdir(src))):
            os.utime(os.path.join(src, f), (t0 + i * 10, t0 + i * 10))
        n_events = spark.read.parquet(src).count()
        out = {
            "sf_dir": SF_DIR,
            "n_events": n_events,
            "source_files": N_SRC_FILES,
            "runs": [measure_fixture(spark, src, scratch, p) for p in (12, 8)],
            "saturation": [
                measure_saturation(spark, scratch, p) for p in (12, 8)
            ],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
