#!/usr/bin/env python
"""Measure the v3 rollup maintainer's streaming-state footprint.

The r7 format change (mergeable HLL register sketches) made the
maintainer a CHAINED stateful aggregation whose stage-1 state is keyed
by (window, event_type, user-bucket) — up to 2^p rows per open group
where the estimate-only format kept one. This smoke runs the real
maintainer over the sf0.1 events fixture (multi-file source, one file
per trigger, so the watermark advances and windows actually close) at
the default precision p=12 and at p=8, and reports per-operator
StreamingQueryProgress.stateOperators maxima — rows and state-store
memory — against the trigger count. The numbers land in SCALE.md.

Hourly windows here (unlike bench.py's daily): state footprint is the
question, so MORE open groups is the representative case, and nothing
here times the filesystem.

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

from video_stream_processor_spark.io import load_table  # noqa: E402
from video_stream_processor_spark.session import get_spark  # noqa: E402
from video_stream_processor_spark.streaming.rollup import (  # noqa: E402
    start_rollup_maintenance,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_SRC_FILES = 8  # 8 time-ranged files -> 8 triggers of watermark advance


def measure(spark, src: str, scratch: str, p: int) -> dict:
    out = os.path.join(scratch, f"p{p}")
    live, ckpt = os.path.join(out, "live"), os.path.join(out, "ckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_rollup_maintenance(
        stream, live, ckpt, size="1 hour", watermark="30 minutes", p=p
    )
    if not q.awaitTermination(900):
        q.stop()
        raise RuntimeError("maintainer did not drain within 900s")
    progress = [pr for pr in q.recentProgress if pr["stateOperators"]]
    n_ops = {len(pr["stateOperators"]) for pr in progress}
    assert n_ops == {2}, f"expected the chained 2-operator shape, got {n_ops}"
    ops = []
    for i in range(2):
        ops.append(
            {
                "max_rows": max(
                    pr["stateOperators"][i]["numRowsTotal"] for pr in progress
                ),
                "max_memory_bytes": max(
                    pr["stateOperators"][i]["memoryUsedBytes"]
                    for pr in progress
                ),
            }
        )
    # stage-1 (bucketed partials) is the operator with more rows
    ops.sort(key=lambda o: o["max_rows"])
    return {
        "p": p,
        "triggers_with_state": len(progress),
        "stage2_final": ops[0],
        "stage1_bucketed": ops[1],
        "rows_written": spark.read.parquet(live).count(),
    }


def main() -> None:
    spark = get_spark(app_name="vsp-rollup-state-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="vsp_state_smoke_")
    try:
        src = os.path.join(scratch, "events_src")
        load_table(spark, SF_DIR, "events").repartitionByRange(
            N_SRC_FILES, "ts"
        ).write.parquet(src)
        n_events = spark.read.parquet(src).count()
        out = {
            "sf_dir": SF_DIR,
            "n_events": n_events,
            "source_files": N_SRC_FILES,
            "runs": [measure(spark, src, scratch, p) for p in (12, 8)],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
