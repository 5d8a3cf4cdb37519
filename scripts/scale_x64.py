#!/usr/bin/env python
"""x64 scale point for the stateful legs (r13 verdict item 4; since
r15 a REPEATABLE gauntlet-optional stage — SPARK_GRAFT_GAUNTLET_X64=1
makes gauntlet.sh run it calm-gated, append the raw block to SCALE.md,
and derive the bound claims mechanically via check_scale_claims'
derive_x64, so the x64 bounds re-verify whenever the stateful legs'
code changes).

SCALE.md's curves stop at sf0.1x8 (800k events / 40k docs); the 100 TB
design claims for the rollup maintainer ("streaming state is bounded
by open_groups x 2^p rows") and the banded MinHash LSH ("bucket sizes
are small by LSH construction, so candidate-pair explosion is
bounded") had no measurement beyond that. This script runs the three
legs at a 64x multiplication of sf0.1 (6.4M events / 320k docs) and
stamps the BOUNDS next to the walls:

* ``rollup_maintain_x64`` — the full maintainer drain (availableNow,
  16 time-ranged files = 16 triggers, auto sizing fed by the persisted
  occupancy estimate). Stamps the PEAK state rows observed across all
  triggers (max over StreamingQueryProgress of summed
  stateOperators[].numRowsTotal) against the derived per-trigger bound
  ``max open (day,type) groups x 2^p`` — the open-group count is
  computed exactly from the staged files (per trigger: groups whose
  first event has arrived and whose window end + watermark is still
  ahead of the trigger's watermark), not assumed. x64 is the first
  point where per-group state genuinely saturates the 2^p ceiling
  (~38k users per (day,type) group vs 4096 HLL buckets), so the bound
  is exercised, not vacuous.
* ``session_30m_x64`` / ``session_30m_sliced_x64`` — batch
  sessionization at 6.4M rows, uniform and with the x8skew remap's hot
  user (40% of all events on user 1 = 2.56M rows). Stamps the per-task
  state histogram: rows per user (the plain form's reducer group) vs
  rows per (user, 6h-slice) (the sliced form's), p50/p99/max — the
  slice bound IS the design claim, and the hot-user max shows what it
  buys.
* ``minhash_pairs_x64`` — the banded-LSH pipeline at 320k docs.
  Stamps the bucket-size distribution over the EXACT production
  banding (`minhash_bucket_sizes`): p50/p99/p999/max docs per
  (band, bucket), plus the candidate-pair volume the tail implies
  (sum over buckets of C(n,2)) and the verified output count.

Corpus note: the x8 smoke multiplies documents with a one-token
suffix, which leaves the copies 8-way NEAR-duplicates — fine at
C(8,2)=28 injected pairs per base doc, but at 64 copies that is
C(64,2)=2016 pairs per doc (~10M verified pairs from 5k docs): the
leg would measure pair-list materialization, not bucket behavior. The
x64 document multiplication therefore SUFFIXES a per-copy tag onto
every word (``w1 w2`` -> ``w1~c5 w2`` in copy 5, one ``regexp_replace``
of each space — see ``_distinct_docs_x64``), which puts the copy tag
inside every bigram shingle: copies share no shingles, so the x64
corpus is 320k pairwise-distinct docs and the measured bucket
distribution is the honest hash-dispersion behavior. (The rejected
first cut interleaved the token BETWEEN words, which degraded bigram
similarity to per-copy unigram overlap and exploded to 4.8M pairs.)
Within-copy seeded near-dups survive per copy, so the verified-pair
output stays linear in copies (64x the base corpus's).

Classifier-silent by design: these are one-off SCALE.md measurements,
not bench-artifact legs (they appear in no BENCH_r*.json, so the
cross-round classifier never sees them).

Usage: python scripts/scale_x64.py   # one JSON line per leg
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from scale_smoke import _multiply  # noqa: E402
from video_stream_processor_spark.io import load_table  # noqa: E402
from video_stream_processor_spark.llm.dedup import (  # noqa: E402
    invalidate_checkpoint_memo,
    minhash_bucket_sizes,
    minhash_near_dup_pairs,
)
from video_stream_processor_spark.session import get_spark  # noqa: E402
from video_stream_processor_spark.streaming.analytics import (  # noqa: E402
    interval_ns,
    session_stats,
    session_stats_sliced,
)

COPIES = 64
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WM = "30 minutes"
GAP = "30 minutes"
SLICE = "6 hours"
N_FILES = 16  # staged triggers for the maintainer drain


def measured(sec: float, rows: int, **extra) -> dict:
    return {
        "rows_in": rows,
        "sec": sec,
        "sec_per_mrow": round(sec / (rows / 1e6), 3),
        "load_1m": round(os.getloadavg()[0], 2),
        **extra,
    }


def _distinct_docs_x64(docs: DataFrame) -> DataFrame:
    """64 key-remapped copies with a per-copy tag SUFFIXED ONTO EVERY
    WORD (``w1 w2`` -> ``w1~c5 w2`` in copy 5, via one regexp over the
    spaces): a per-copy token bijection, so within-copy bigram
    structure — and therefore within-copy Jaccard — matches the base
    corpus, while every bigram carries the copy tag and copies share
    no shingles. (A first cut INTERLEAVED the copy token between words;
    that turned bigram similarity into unigram vocabulary overlap
    within each copy — (w, c5) shared by any two docs using word w —
    and 32k docs exploded to 4.8M verified pairs. Word-suffixing keeps
    the corpus's natural pair density, 64x the base count.)"""
    c = F.explode(F.array(*[F.lit(i) for i in range(COPIES)])).alias("__copy")
    out = docs.select("*", c)
    out = out.withColumn(
        "doc_id",
        F.col("doc_id") + F.col("__copy").cast("long") * F.lit(100_000_000),
    )
    tag = F.concat(F.lit("~c"), F.col("__copy").cast("string"), F.lit(" "))
    out = out.withColumn(
        "text",
        F.when(
            F.col("text").isNotNull(),
            F.regexp_replace(F.col("text"), F.lit(" "), tag),
        ),
    )
    return out.drop("__copy")


def _group_hist(df: DataFrame, *keys) -> dict:
    """p50/p99/max of rows-per-group — the per-task state unit."""
    per = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    row = per.agg(
        F.expr("percentile_approx(n, array(0.5, 0.99), 10000)").alias("p"),
        F.max("n").alias("mx"),
        F.count(F.lit(1)).alias("groups"),
    ).first()
    return {
        "groups": row["groups"],
        "p50": int(row["p"][0]),
        "p99": int(row["p"][1]),
        "max": int(row["mx"]),
    }


def sessions_leg(spark, events: DataFrame, label: str) -> None:
    n = events.count()
    slice_us = interval_ns(SLICE) // 1000
    hist_user = _group_hist(events.filter(F.col("ts").isNotNull()), "user_id")
    hist_slice = _group_hist(
        events.filter(F.col("ts").isNotNull()),
        "user_id",
        (F.unix_micros("ts") / F.lit(slice_us)).cast("long"),
    )
    for name, build, hist in (
        (f"session_30m_{label}", lambda: session_stats(events, gap=GAP), hist_user),
        (
            f"session_30m_sliced_{label}",
            lambda: session_stats_sliced(events, gap=GAP, time_slice=SLICE),
            hist_slice,
        ),
    ):
        build().write.format("noop").mode("overwrite").save()  # warm
        secs = []
        for _ in range(3):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
        sec = sorted(secs)[1]
        print(
            json.dumps(
                {
                    "op": name,
                    **measured(
                        sec,
                        n,
                        spread={"min": min(secs), "med": sec, "max": max(secs)},
                        per_task_rows=hist,
                    ),
                }
            ),
            flush=True,
        )


def rollup_leg(spark, events: DataFrame, scratch: str) -> None:
    from video_stream_processor_spark.operators import hll
    from video_stream_processor_spark.streaming.rollup import (
        cached_open_groups,
        compact_rollup,
        read_rollup_tiered,
        start_rollup_maintenance,
    )

    n = events.count()
    src = os.path.join(scratch, "events_x64")
    events.repartitionByRange(N_FILES, "ts").write.parquet(src)
    # replay in TIME order (bench._rollup_events_src's mtime fix): the
    # file source reads oldest-mtime first; task-completion mtimes
    # would advance the watermark early and drop whole files as late
    t0 = 1_700_000_000
    for i, f in enumerate(sorted(os.listdir(src))):
        os.utime(os.path.join(src, f), (t0 + i * 10, t0 + i * 10))

    est, est_src = cached_open_groups(spark, src, size="1 day", watermark=WM)

    # Derived per-trigger open-group bound, computed EXACTLY from the
    # staged files under Spark's real watermark semantics: the
    # watermark IN EFFECT during batch i is derived from batch i-1's
    # max event time (one-trigger lag — the watermark update happens
    # between batches), so end-of-batch-i state holds every (day,
    # type) group whose first event has arrived (first_ts <= max ts_i)
    # and whose window end is still >= max_ts_{i-1} - wm_delay. (A
    # first cut used batch i's OWN max ts as the watermark source and
    # no lag — it under-derived the open count ~3x and printed
    # bound_held=false against a perfectly in-bound run.)
    staged = spark.read.parquet(src).select(
        "ts", "event_type", F.input_file_name().alias("f")
    ).filter(F.col("ts").isNotNull())
    groups = staged.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.min("ts").alias("first_ts")).collect()
    file_max = sorted(
        r["mx"] for r in staged.groupBy("f").agg(F.max("ts").alias("mx")).collect()
    )
    wm_delay = dt.timedelta(seconds=interval_ns(WM) / 1e9)
    open_per_trigger = []
    for i, mx in enumerate(file_max):
        wm_in_effect = (file_max[i - 1] - wm_delay) if i > 0 else None
        open_per_trigger.append(
            sum(
                1
                for g in groups
                if g["first_ts"] <= mx
                and (
                    wm_in_effect is None
                    or g["day"] + dt.timedelta(days=1) >= wm_in_effect
                )
            )
        )
    max_open = max(open_per_trigger)
    # stage-1 state is (window, etype, bucket)-keyed: <= 2^p rows per
    # open group; stage-2 (the register-merge agg) adds one row per
    # open group
    bound_rows = max_open * (2 ** hll.DEFAULT_P) + max_open

    out = os.path.join(scratch, "rollup_x64")
    live, base, ckpt = (os.path.join(out, x) for x in ("live", "base", "ckpt"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    t_start = time.perf_counter()
    q = start_rollup_maintenance(
        stream, live, ckpt, size="1 day", watermark=WM,
        state_partitions="auto", expected_open_groups=est,
    )
    if not q.awaitTermination(3600):
        q.stop()
        raise RuntimeError("x64 maintainer did not drain within 3600s")
    t_maintain = time.perf_counter() - t_start
    progress = q.recentProgress
    retention = int(
        spark.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100")
    )
    if len(progress) >= retention:
        raise RuntimeError(
            f"{len(progress)} progress entries at/over the retention cap "
            f"{retention}: peak-state and commit sums would undercount"
        )
    peak_state = max(
        sum(int(so.get("numRowsTotal") or 0) for so in (pr.get("stateOperators") or []))
        for pr in progress
    )
    # per-operator peaks: stage-1 (bucket-keyed, the 2^p-bounded one)
    # vs stage-2 (group-keyed) — so the bound check names which
    # operator carried the rows
    n_ops = max(len(pr.get("stateOperators") or []) for pr in progress)
    peak_per_op = [
        max(
            int((pr.get("stateOperators") or [{}] * n_ops)[j].get("numRowsTotal") or 0)
            if j < len(pr.get("stateOperators") or [])
            else 0
            for pr in progress
        )
        for j in range(n_ops)
    ]
    commit_s = round(
        sum(
            so.get("commitTimeMs", 0)
            for pr in progress
            for so in (pr.get("stateOperators") or [])
        )
        / 1000.0,
        3,
    )
    stores = max(
        (
            int(so.get("numShufflePartitions") or 0)
            for pr in progress
            for so in (pr.get("stateOperators") or [])
        ),
        default=0,
    )
    compact_rollup(spark, live, base)
    read_rollup_tiered(spark, live, base).write.format("noop").mode(
        "overwrite"
    ).save()
    sec = round(time.perf_counter() - t_start, 3)
    print(
        json.dumps(
            {
                "op": "rollup_maintain_x64",
                **measured(
                    sec,
                    n,
                    maintain=round(t_maintain, 3),
                    commit_io_s=commit_s,
                    state_stores=stores,
                    open_groups_est=est,
                    open_groups_src=est_src,
                    triggers=len(file_max),
                    peak_state_rows=peak_state,
                    peak_state_rows_per_op=peak_per_op,
                    max_open_groups_derived=max_open,
                    open_groups_per_trigger=open_per_trigger,
                    state_bound_rows=bound_rows,
                    bound_held=peak_state <= bound_rows,
                ),
            }
        ),
        flush=True,
    )


def minhash_leg(spark, docs: DataFrame) -> None:
    n = docs.count()
    # bucket-size distribution over the production banding (untimed:
    # the probe is evidence, not workload)
    sizes = minhash_bucket_sizes(docs)
    row = sizes.agg(
        F.expr(
            "percentile_approx(n_docs, array(0.5, 0.99, 0.999), 10000)"
        ).alias("p"),
        F.max("n_docs").alias("mx"),
        F.count(F.lit(1)).alias("buckets"),
        F.sum(
            (F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("long")
        ).alias("cand_pairs"),
    ).first()
    bucket_stats = {
        "buckets": row["buckets"],
        "p50": int(row["p"][0]),
        "p99": int(row["p"][1]),
        "p999": int(row["p"][2]),
        "max": int(row["mx"]),
        "candidate_pairs_implied": int(row["cand_pairs"]),
    }
    invalidate_checkpoint_memo()
    t0 = time.perf_counter()
    pairs = minhash_near_dup_pairs(docs, threshold=0.5)
    n_pairs = pairs.count()
    sec = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "op": "minhash_pairs_x64",
                **measured(
                    sec, n, verified_pairs=n_pairs, bucket_docs=bucket_stats
                ),
            }
        ),
        flush=True,
    )


def main() -> None:
    from bench import CALIB_IDLE_BAND_MS, _await_quiet_machine, calibrate_ms

    # optional leg filter: `scale_x64.py rollup minhash` re-runs only
    # those legs (sessions|rollup|minhash) — selective re-measurement
    # after a derivation fix without re-paying the full run
    legs = set(sys.argv[1:]) or {"sessions", "rollup", "minhash"}
    unknown = legs - {"sessions", "rollup", "minhash"}
    if unknown:
        sys.exit(f"unknown legs {sorted(unknown)}; pick from sessions/rollup/minhash")

    load_start, comparable = _await_quiet_machine()
    print(
        json.dumps(
            {
                "meta": "scale_x64",
                "copies": COPIES,
                "sf_dir": SF_DIR,
                "load_1m_start": load_start,
                "comparable": comparable,
                # r15: the same run-bracketing calibration the smoke
                # and bench stamps carry — check_scale_claims
                # auto-attributes any bound/histogram outlier to the
                # machine when a stamp exceeds the band
                "calib_ms": calibrate_ms(),
                "calib_band_ms": CALIB_IDLE_BAND_MS,
            }
        ),
        flush=True,
    )
    spark = get_spark(app_name="vsp-scale-x64")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="vsp_x64_")
    try:
        base_events = load_table(spark, SF_DIR, "events")
        ev64 = _multiply(base_events, ["event_id", "user_id"], copies=COPIES)
        if "sessions" in legs:
            sessions_leg(spark, ev64, "x64")
            # the x8skew remap's hot user/hot hour at x64: 40% of 6.4M
            # events on ONE user — the per-task state escape under
            # fire. (_skew_remap also remaps an orders table; pass the
            # base one to satisfy its contract, discard its output.)
            from scale_smoke import _skew_remap

            skewed = _skew_remap(
                {"events": ev64, "orders": load_table(spark, SF_DIR, "orders")}
            )["events"]
            sessions_leg(spark, skewed, "x64skew")
        if "rollup" in legs:
            rollup_leg(spark, ev64, scratch)
        if "minhash" in legs:
            docs64 = _distinct_docs_x64(load_table(spark, SF_DIR, "documents"))
            minhash_leg(spark, docs64)
        # end-of-run calibration on its own meta line (same convention
        # as scale_smoke): the degraded modes this exists to expose
        # arrive mid-run
        print(
            json.dumps(
                {"meta": "scale_x64_end", "calib_ms_end": calibrate_ms()}
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
