"""Phase 3: streaming analytics (T5-T11).

Strategy (SURVEY §5.2): replay events.parquet through the streaming
file source with availableNow triggers and assert the streaming result
equals the batch twin of the same builder — plus dedicated tests for
watermark late-data drop (T10), streaming dedup state (T8), the
arbitrary stateful operator (T9), and progress metrics (T11).
"""

from __future__ import annotations

import shutil
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from video_stream_processor_spark.io import load_events_stream, load_table, table_path
from video_stream_processor_spark.streaming import (
    closed_sessions_batch,
    closed_user_sessions,
    running_user_totals,
    session_stats,
    sliding_counts,
    stream_dedup,
    tumbling_stats,
)
from video_stream_processor_spark.streaming.stateful import user_totals_batch


def run_stream(sdf, tmp_path, name=None):
    """Drain a streaming DataFrame via availableNow into a memory sink;
    return (rows, query)."""
    name = name or f"q_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sdf.sparkSession.sql(f"SELECT * FROM {name}").collect(), q


def run_stream_append(sdf, tmp_path, name=None):
    name = name or f"q_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sdf.sparkSession.sql(f"SELECT * FROM {name}").collect(), q


def assert_same_rows(got, want):
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return load_events_stream(spark, sf_dir)


def assert_tumbling_close(got, want):
    """Streaming tumbling_stats vs its batch twin: exact on everything
    except n_users, which is HLL++ (rsd 5%) on the streaming side.
    Over thousands of windows a few rows legitimately land past 3
    sigma, so the per-row cap is generous (6 sigma) and the real
    accuracy assertion is on the population: mean relative error must
    stay within the sketch's rsd."""

    def key(r):
        return (r["win_start"], r["win_end"], r["event_type"])

    exact = ["n_events", "sum_value", "avg_value"]
    want_by_key = {key(r): r for r in want}
    assert {key(r) for r in got} == set(want_by_key)
    rel_errs = []
    for r in got:
        w = want_by_key[key(r)]
        assert [r[c] for c in exact] == [w[c] for c in exact]
        err = abs(r["n_users"] - w["n_users"])
        assert err <= max(5, 0.3 * w["n_users"])
        rel_errs.append(err / max(w["n_users"], 1))
    assert sum(rel_errs) / len(rel_errs) <= 0.05


def test_tumbling_stream_equals_batch(spark, sf_dir, events_batch, events_stream, tmp_path):
    """T5/T6: watermarked tumbling agg over the replayed stream must
    equal the batch twin (complete mode sees all windows). n_users is
    approx (HLL++) on the streaming side — compared within rsd."""
    want = tumbling_stats(events_batch, size="1 hour").collect()
    got, _ = run_stream(
        tumbling_stats(events_stream, size="1 hour", watermark="1 hour"), tmp_path
    )
    assert_tumbling_close(got, want)


def test_sliding_stream_equals_batch(spark, events_batch, events_stream, tmp_path):
    want = sliding_counts(events_batch).collect()
    got, _ = run_stream(sliding_counts(events_stream, watermark="1 hour"), tmp_path)
    assert_same_rows(got, want)


def test_session_stream_equals_batch(spark, events_batch, events_stream, tmp_path):
    """T7: session windows need a watermark in streaming mode."""
    want = session_stats(events_batch, gap="30 minutes").collect()
    got, _ = run_stream(
        session_stats(events_stream, gap="30 minutes", watermark="1 hour"), tmp_path
    )
    assert_same_rows(got, want)


def _assert_sessions_equal(got, want):
    """Exact on bounds/user/count; sum_value via cent-rounding (the
    sliced path sums exact integer cents, the plain path rounds a
    float sum — identical after rounding to cents)."""

    def norm(rows):
        return sorted(
            (
                r["sess_start"],
                r["sess_end"],
                r["user_id"],
                r["n_events"],
                None if r["sum_value"] is None else round(r["sum_value"], 2),
            )
            for r in rows
        )

    assert norm(got) == norm(want)


def test_session_sliced_equals_plain_on_fixture(spark, events_batch):
    """T7 hot-user escape: slice-and-stitch must reproduce plain
    sessionization exactly on the fixture corpus."""
    from video_stream_processor_spark.streaming import session_stats_sliced

    want = session_stats(events_batch, gap="30 minutes").collect()
    got = session_stats_sliced(
        events_batch, gap="30 minutes", time_slice="6 hours"
    ).collect()
    assert len(want) > 0
    _assert_sessions_equal(got, want)


def test_session_sliced_hot_user_and_boundaries(spark):
    """The corpus the escape exists for: one bot user holding >40% of
    events in a single multi-day always-on session (every slice cut
    lands inside it -> maximal stitch pressure), plus engineered
    boundary cases: a gap of exactly `gap` across a slice cut (must
    MERGE — session_window merges at <= gap, probe-verified; only a
    strictly-larger gap splits), a gap of gap+1µs across a cut (must
    SPLIT), and an event exactly ON a cut."""
    import datetime as dt

    from video_stream_processor_spark.streaming import session_stats_sliced

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    # bot user 1: one event every 10 min for 48h -> ONE session spanning
    # eight 6h slices; 289 events.
    for i in range(289):
        rows.append((1, base + dt.timedelta(minutes=10 * i), 1.25))
    # user 2: two events 30m + 1µs apart straddling the 06:00 slice
    # cut -> gap strictly exceeds the session gap, two sessions.
    rows.append((2, base + dt.timedelta(hours=5, minutes=45), 2.0))
    rows.append(
        (2, base + dt.timedelta(hours=6, minutes=15, microseconds=1), 3.0)
    )
    # user 3: two events EXACTLY 30m apart straddling the 12:00 cut
    # -> still one session (merge at <= gap).
    rows.append((3, base + dt.timedelta(hours=11, minutes=45), 4.0))
    rows.append((3, base + dt.timedelta(hours=12, minutes=15), 5.0))
    # user 4: single event exactly ON the 18:00 cut (first µs of a slice).
    rows.append((4, base + dt.timedelta(hours=18), 6.0))
    # filler users so the bot is ~41% of events: 420 events over 100 users
    for i in range(420):
        rows.append((100 + i % 100, base + dt.timedelta(minutes=7 * i), 0.5))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    n_bot = 289
    assert n_bot / len(rows) > 0.40

    want = session_stats(df, gap="30 minutes").collect()
    got = session_stats_sliced(df, gap="30 minutes", time_slice="6 hours").collect()
    _assert_sessions_equal(got, want)
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0]["n_events"] == n_bot
    assert len(by_user[2]) == 2
    assert len(by_user[3]) == 1 and by_user[3][0]["n_events"] == 2
    assert len(by_user[4]) == 1

    # the escape's reason to exist: the per-reducer key in pass 1 is
    # (user, slice) — the bot's events spread over all 8 slices instead
    # of meeting at one reducer
    slices = {
        r["_slice"]
        for r in df.filter(F.col("user_id") == 1)
        .select(F.expr("unix_micros(ts) div 21600000000").alias("_slice"))
        .distinct()
        .collect()
    }
    assert len(slices) >= 8


def test_session_sliced_rejects_slice_below_gap(spark, events_batch):
    from video_stream_processor_spark.streaming import session_stats_sliced

    with pytest.raises(ValueError, match="must be >= gap"):
        session_stats_sliced(events_batch, gap="30 minutes", time_slice="10 minutes")


def test_stream_dedup_within_watermark(spark, sf_dir, events_batch, tmp_path):
    """T8: duplicated input (same file twice = every event_id twice)
    collapses back to the batch distinct count."""
    src_dir = tmp_path / "dup_events"
    src_dir.mkdir()
    src = table_path(sf_dir, "events")
    shutil.copy(src, src_dir / "a.parquet")
    shutil.copy(src, src_dir / "b.parquet")
    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )
    deduped = stream_dedup(
        _normalize_events(raw),
        keys=["event_id"],
        watermark="10 minutes",
        within_watermark=True,
    ).select("event_id")
    got, _ = run_stream_append(deduped, tmp_path)
    n_batch = events_batch.count()
    assert len(got) == n_batch
    assert len({r["event_id"] for r in got}) == n_batch


def test_watermark_drops_late_data(spark, tmp_path):
    """T10: append-mode watermark semantics. A window whose end has
    passed the watermark is emitted exactly once and its state evicted;
    a late event arriving after eviction is dropped — it neither
    resurrects the window nor re-emits it. (A late event arriving
    *before* eviction still merges — Spark's documented best-effort.)
    """
    import time

    src_dir = tmp_path / "late_events"
    src_dir.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def mk(rows, name):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(src_dir / name)

    # batch 0: events at 10:00 and 14:00 (wm stays at epoch for batch 0)
    mk(
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 14:00:00", 1, "click", 1.0, "{}"),
        ],
        "a.parquet",
    )
    time.sleep(1.1)  # file-source orders batches by mtime
    # batch 1: wm → 13:50; the [10:00,11:00) window emits and evicts
    mk([(3, "2024-01-01 14:30:00", 1, "click", 1.0, "{}")], "b.parquet")
    time.sleep(1.1)
    # batch 2: wm → 14:20; event 4 (10:30) is late past eviction →
    # dropped; event 5 (15:00) is on time
    mk(
        [
            (4, "2024-01-01 10:30:00", 1, "click", 1.0, "{}"),
            (5, "2024-01-01 15:00:00", 1, "click", 1.0, "{}"),
        ],
        "c.parquet",
    )
    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )
    agg = tumbling_stats(_normalize_events(raw), size="1 hour", watermark="10 minutes")
    got, _ = run_stream_append(agg, tmp_path)
    h10 = 1704103200  # 2024-01-01 10:00:00 UTC
    h10_rows = [r for r in got if r["win_start"] == h10]
    # emitted exactly once, with only the on-time event — the late
    # event 4 neither merged (state already evicted) nor re-emitted
    assert len(h10_rows) == 1
    assert h10_rows[0]["n_events"] == 1


def test_stateful_running_totals(spark, events_stream, events_batch, tmp_path):
    """T9: applyInPandasWithState running totals converge to the batch
    groupBy — take each user's last emitted snapshot."""
    sdf = running_user_totals(events_stream)
    name = f"q_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    snaps = spark.sql(f"SELECT * FROM {name}").collect()
    # last snapshot per user = max n_events per user (monotone)
    final = {}
    for r in snaps:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    want = {r["user_id"]: r for r in user_totals_batch(events_batch).collect()}
    assert final.keys() == want.keys()
    for uid, row in final.items():
        assert row["n_events"] == want[uid]["n_events"]
        assert row["sum_value"] == pytest.approx(want[uid]["sum_value"], abs=0.05)


def test_foreach_batch_overwrite_sink(spark, sf_dir, events_batch, tmp_path):
    """S7/T3: the complete-recompute sink — one availableNow trigger
    carries the full input (the reference re-reads all links per run),
    foreachBatch overwrites the output idempotently; the sink contents
    equal the batch twin."""
    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.pipeline.sink import foreach_batch_overwrite
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA
    from video_stream_processor_spark.io import table_path

    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(
        table_path(sf_dir, "events") + "*"
    )
    agg = tumbling_stats(_normalize_events(raw), size="1 hour", watermark="1 hour")
    out = str(tmp_path / "sink_out")
    q = (
        agg.writeStream.foreachBatch(foreach_batch_overwrite(out, fmt="parquet"))
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_fb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out).collect()
    want = tumbling_stats(events_batch, size="1 hour").collect()
    keys = ["win_start", "win_end", "event_type", "n_events", "sum_value"]
    assert sorted([tuple(r[k] for k in keys) for r in got]) == sorted(
        [tuple(r[k] for k in keys) for r in want]
    )


def test_stream_static_join_equals_batch(spark, sf_dir, events_batch, events_stream, tmp_path):
    """J8: the registered stream-static join builder runs unchanged on
    the unbounded source (static dim broadcast per micro-batch) and
    matches its own batch run."""
    from video_stream_processor_spark.plans.streaming_batch import EVENT_CATEGORIES

    def build(ev):
        dim = spark.createDataFrame(
            EVENT_CATEGORIES, "event_type string, category string"
        )
        return (
            ev.join(F.broadcast(dim), "event_type")
            .groupBy("category")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
        )

    want = build(events_batch).collect()
    got, _ = run_stream(build(events_stream), tmp_path)
    assert_same_rows(got, want)


def test_stateful_running_totals_tws(spark, events_stream, events_batch, tmp_path):
    """T9 via Spark 4 transformWithStateInPandas (RocksDB state store):
    converges to the same batch totals as the applyInPandasWithState
    form. Requires the protobuf package (the TWS state-server protocol
    speaks protobuf) — skipped where it isn't installed."""
    pytest.importorskip("google.protobuf.descriptor")
    from video_stream_processor_spark.streaming.stateful import running_user_totals_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sdf = running_user_totals_tws(events_stream)
        name = f"q_{uuid.uuid4().hex[:8]}"
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        snaps = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    final = {}
    for r in snaps:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    want = {r["user_id"]: r for r in user_totals_batch(events_batch).collect()}
    assert final.keys() == want.keys()
    for uid, row in final.items():
        assert row["n_events"] == want[uid]["n_events"]
        assert row["sum_value"] == pytest.approx(want[uid]["sum_value"], abs=0.05)


def test_streaming_metrics_progress(spark, events_stream, tmp_path):
    """T11: StreamingQueryProgress exposes per-batch row counts — the
    engine's analog of the reference's processed/failed counters."""
    got, q = run_stream(
        tumbling_stats(events_stream, size="1 hour", watermark="1 hour"), tmp_path
    )
    progress = q.recentProgress
    assert progress, "no progress events recorded"
    total_in = sum(p["numInputRows"] for p in progress)
    assert total_in > 0


def test_closed_user_sessions(spark, tmp_path):
    """T9 (session closer): sessions emit exactly once, on close.
    User 1 exercises the in-key-gap path (a later row for the same
    user closes the old session); user 2 exercises the EventTimeTimeout
    path (only OTHER users' events advance the watermark past its
    close boundary). Closed sessions must equal the batch
    session_window twin for every session the final watermark passed."""
    import time

    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA

    src_dir = tmp_path / "sess_events"
    src_dir.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def mk(rows, name):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(src_dir / name)

    # batch 0: user 1 session A (2 events), user 2 session X (1 event)
    mk(
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 10:10:00", 1, "click", 1.0, "{}"),
            (3, "2024-01-01 10:05:00", 2, "view", 1.0, "{}"),
        ],
        "a.parquet",
    )
    time.sleep(1.1)  # file-source orders batches by mtime
    # batch 1: user 1 jumps past the gap -> closes session A in-key and
    # opens session B; watermark after this batch: 12:00 - 10min = 11:50
    # (past both A's 10:40 and X's 10:35 close boundaries).
    mk([(4, "2024-01-01 12:00:00", 1, "click", 1.0, "{}")], "b.parquet")
    time.sleep(1.1)
    # batch 2: a third user far ahead -> watermark 13:50 passes B's
    # 12:30 boundary; the no-data/timeout pass closes B and X.
    mk([(5, "2024-01-01 14:00:00", 3, "click", 1.0, "{}")], "c.parquet")

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )
    sdf = closed_user_sessions(
        _normalize_events(raw).withWatermark("ts", "10 minutes"), gap="30 minutes"
    )
    got, _ = run_stream_append(sdf, tmp_path)

    batch = _normalize_events(
        spark.read.schema(EVENTS_RAW_SCHEMA).parquet(str(src_dir))
    )
    # Final watermark (14:00 - 10min = 13:50) passed the close boundary
    # of sessions A (10:40), X (10:35), and B (12:30) — but not user
    # 3's (14:30), which must stay open/unemitted.
    want = [
        tuple(r)
        for r in closed_sessions_batch(batch, gap="30 minutes").collect()
        if r["user_id"] != 3
    ]
    assert sorted(tuple(r) for r in got) == sorted(want)
    assert len(want) == 3  # A, B, X all present in the twin


def test_closed_user_sessions_late_rows_land_in_right_session(spark, tmp_path):
    """r15 review: with a watermark delay, Spark still delivers rows
    OLDER than the open session — they must land in the RIGHT session:
    one within gap before the open session lowers its start; one more
    than gap before everything opens its own (earlier) session; one
    between two open sessions bridges them into one. The old
    single-session state absorbed all three into the newest session
    and eagerly emitted sessions the watermark had not yet made final.
    Every closed session must match the batch session_window twin."""
    import time

    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA

    src_dir = tmp_path / "late_sess_events"
    src_dir.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def mk(rows, name):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(src_dir / name)

    # batch 0: u1 open session [10:00, 10:10]; u2 two sessions (10:00
    # and 10:50 are 50min > gap apart); u9 advances the clock.
    mk(
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 10:10:00", 1, "click", 1.0, "{}"),
            (3, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
            (4, "2024-01-01 10:50:00", 2, "view", 1.0, "{}"),
            (5, "2024-01-01 11:00:00", 9, "click", 1.0, "{}"),
        ],
        "a.parquet",
    )
    time.sleep(1.1)
    # batch 1 (watermark now 9:00 = 11:00 - 2h): all three late shapes
    # are in-watermark and must re-shape the open sessions —
    #   u1 9:50  -> lowers session start (9:50 is within gap of 10:00)
    #   u1 8:30  -> its own earlier session (> gap before 9:50)
    #   u2 10:25 -> bridges [10:00] and [10:50] into one session
    mk(
        [
            (6, "2024-01-01 09:50:00", 1, "click", 1.0, "{}"),
            (7, "2024-01-01 08:30:00", 1, "click", 1.0, "{}"),
            (8, "2024-01-01 10:25:00", 2, "view", 1.0, "{}"),
            (9, "2024-01-01 13:00:00", 9, "click", 1.0, "{}"),
        ],
        "b.parquet",
    )
    time.sleep(1.1)
    # batch 2: u9 16:00 -> final watermark 14:00 closes every session
    # whose boundary it passed (u9's own 16:00 session stays open).
    mk([(10, "2024-01-01 16:00:00", 9, "click", 1.0, "{}")], "c.parquet")

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )
    sdf = closed_user_sessions(
        _normalize_events(raw).withWatermark("ts", "2 hours"),
        gap="30 minutes",
    )
    got, _ = run_stream_append(sdf, tmp_path)

    batch = _normalize_events(
        spark.read.schema(EVENTS_RAW_SCHEMA).parquet(str(src_dir))
    )
    final_wm_us = int(pd.Timestamp("2024-01-01 14:00:00").value) // 1000
    want = [
        tuple(r)
        for r in closed_sessions_batch(batch, gap="30 minutes").collect()
        if int(pd.Timestamp(r["session_end"]).value) // 1000 < final_wm_us
    ]
    assert sorted(tuple(r) for r in got) == sorted(want)
    # the twin really contains the reshaped sessions the late rows made
    starts = sorted(
        pd.Timestamp(w[1]).strftime("%H:%M") for w in want
    )
    assert starts == ["08:30", "09:50", "10:00", "11:00", "13:00"]


def test_session_gap_accepts_full_interval_grammar():
    """r15 review: the session builders' gap parser is the package's
    shared interval grammar (analytics.interval_ns), not a private
    subset — '1 day' and multi-part intervals parse, fractional
    quantities fail loudly."""
    from video_stream_processor_spark.streaming.stateful import _duration_us

    assert _duration_us("30 minutes") == 1_800_000_000
    assert _duration_us("1 day") == 86_400_000_000
    assert _duration_us("1 hour 30 minutes") == 5_400_000_000
    with pytest.raises(ValueError, match="fractional|non-integer"):
        _duration_us("1.5 hours")


def test_stream_stream_interval_join_equals_batch(
    spark, sf_dir, events_batch, events_stream, tmp_path
):
    """Stream–stream interval join: signup→purchase attribution within
    1h, run on two filtered views of the SAME unbounded source (a
    stream self-join), must equal its batch twin. Both sides carry the
    watermark; the interval bound is what lets Spark evict join state."""
    from video_stream_processor_spark.streaming import (
        signup_purchase_attribution,
    )

    def build(ev, wm=None):
        signups = ev.filter(F.col("event_type") == "signup")
        purchases = ev.filter(F.col("event_type") == "purchase")
        return signup_purchase_attribution(
            signups, purchases, horizon="1 hour", watermark=wm
        )

    want = build(events_batch).collect()
    assert want, "fixture produced no signup→purchase pairs"
    got, _ = run_stream_append(build(events_stream, "1 hour"), tmp_path)
    assert_same_rows(got, want)


def test_stream_stream_interval_join_drops_late_purchase(spark, tmp_path):
    """Late-data semantics of the stream-stream interval join (the
    divergence from the batch twin `test_stream_stream_interval_join_
    equals_batch` pins equality on): once the watermark passes a
    signup's join horizon its state is evicted, so a purchase arriving
    AFTER that — even though it pairs within the horizon in EVENT time
    — is dropped by the streaming join. The batch twin, which sees all
    rows at once, keeps the pair; that asymmetry is the documented
    price of bounded join state (watermark + interval bound), same
    contract as test_watermark_drops_late_data's window eviction."""
    import time

    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA
    from video_stream_processor_spark.streaming import (
        signup_purchase_attribution,
    )

    src_dir = tmp_path / "late_join_events"
    src_dir.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def mk(rows, name):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(src_dir / name)

    # batch 0: signup 10:00 + on-time purchase 10:20 -> pair emits
    mk(
        [
            (1, "2024-01-01 10:00:00", 1, "signup", 0.0, "{}"),
            (2, "2024-01-01 10:20:00", 1, "purchase", 9.99, "{}"),
        ],
        "a.parquet",
    )
    time.sleep(1.1)  # file-source orders batches by mtime
    # batch 1: both sides advance to 15:00 -> wm 14:50, far past the
    # signup's 11:00 join horizon; its state evicts (unmatched rows:
    # user 2/3 have no counterpart)
    mk(
        [
            (3, "2024-01-01 15:00:00", 2, "signup", 0.0, "{}"),
            (4, "2024-01-01 15:00:00", 3, "purchase", 5.0, "{}"),
        ],
        "b.parquet",
    )
    time.sleep(1.1)
    # batch 2: unrelated on-time rows. State cleanup runs at the END
    # of a batch with that batch's watermark, so the 14:50 mark from
    # batch 1 evicts the 10:00 signup HERE — one batch of lag, the
    # documented best-effort window in which a late row could still
    # have matched.
    mk(
        [
            (6, "2024-01-01 16:00:00", 4, "signup", 0.0, "{}"),
            (7, "2024-01-01 16:00:00", 5, "purchase", 1.0, "{}"),
        ],
        "b2.parquet",
    )
    time.sleep(1.1)
    # batch 3: purchase 10:40 for user 1 — inside the horizon in event
    # time, but behind the watermark on arrival and the signup's state
    # is gone -> dropped
    mk([(5, "2024-01-01 10:40:00", 1, "purchase", 50.0, "{}")], "c.parquet")

    def build(ev, wm=None):
        return signup_purchase_attribution(
            ev.filter(F.col("event_type") == "signup"),
            ev.filter(F.col("event_type") == "purchase"),
            horizon="1 hour",
            watermark=wm,
        )

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )
    got, _ = run_stream_append(build(_normalize_events(raw), "10 minutes"), tmp_path)
    assert sorted((r["signup_id"], r["purchase_id"]) for r in got) == [(1, 2)]

    # the batch twin sees all rows at once and keeps the late pair —
    # the divergence this test exists to document
    batch = _normalize_events(
        spark.read.schema(EVENTS_RAW_SCHEMA).parquet(str(src_dir))
    )
    want = sorted(
        (r["signup_id"], r["purchase_id"]) for r in build(batch).collect()
    )
    assert want == [(1, 2), (1, 5)]


def test_interval_ns_parses_arbitrary_horizons():
    """interval_ns accepts any quantity/unit mix the INTERVAL literal
    accepts — not just the two horizons the join shipped with."""
    import pytest

    from video_stream_processor_spark.streaming.analytics import interval_ns

    assert interval_ns("1 hour") == 3_600_000_000_000
    assert interval_ns("30 minutes") == 1_800_000_000_000
    assert interval_ns("45 minutes") == 2_700_000_000_000
    assert interval_ns("90 seconds") == 90_000_000_000
    assert interval_ns("1 day 6 hours") == 108_000_000_000_000
    assert interval_ns("250 milliseconds") == 250_000_000
    with pytest.raises(ValueError):
        interval_ns("fortnight")
    with pytest.raises(ValueError):
        interval_ns("3 parsecs")
    with pytest.raises(ValueError):
        # Spark's INTERVAL literal rejects fractional quantities; the
        # parser must not silently accept what the join would throw on
        interval_ns("1.5 hours")


def test_interval_ns_agrees_with_spark_parser(spark):
    """interval_ns must agree with Spark's own INTERVAL literal
    evaluation (timestamp shift -> unix_micros delta) for every
    quantity/unit mix the join builder accepts."""
    from video_stream_processor_spark.streaming.analytics import interval_ns

    cases = [
        "1 hour", "30 minutes", "45 minutes", "90 seconds",
        "1 day 6 hours", "2 days 3 hours 4 minutes",
        "250 milliseconds", "1 week", "36 hours",
    ]
    base = "timestamp'2020-01-01 00:00:00'"
    row = spark.range(1).select(
        *[
            (
                F.unix_micros(F.expr(f"{base} + INTERVAL {c}"))
                - F.unix_micros(F.expr(base))
            ).alias(f"c{i}")
            for i, c in enumerate(cases)
        ]
    ).collect()[0]
    for i, c in enumerate(cases):
        assert interval_ns(c) == row[f"c{i}"] * 1000, c


def test_attribution_arbitrary_horizon_batch(spark, events_batch):
    """A horizon outside the original lookup table runs and bounds
    latency correctly (batch twin; same builder serves streams)."""
    from video_stream_processor_spark.streaming import (
        signup_purchase_attribution,
    )

    signups = events_batch.filter(F.col("event_type") == "signup")
    purchases = events_batch.filter(F.col("event_type") == "purchase")
    rows = signup_purchase_attribution(
        signups, purchases, horizon="45 minutes"
    ).collect()
    assert rows, "no pairs within 45 minutes in fixture"
    assert all(0 < r["latency_ns"] <= 2_700_000_000_000 for r in rows)
    hour = signup_purchase_attribution(
        signups, purchases, horizon="1 hour"
    ).count()
    assert len(rows) <= hour  # tighter horizon, no extra pairs


def test_streaming_near_dup_flags_equals_batch(spark, sf_dir, tmp_path):
    """LLM op on an unbounded stream: incoming docs flagged against the
    static corpus LSH index (stream-static join, zero streaming state)
    must equal the batch twin as a SET of (doc, corpus, band) hits."""
    from video_stream_processor_spark.llm.dedup import (
        streaming_near_dup_flags,
    )
    from video_stream_processor_spark.schemas import DOCUMENTS_SCHEMA

    corpus = load_table(spark, sf_dir, "documents")
    want = {
        (r["doc_id"], r["corpus_id"], r["band"], r["jaccard"])
        for r in streaming_near_dup_flags(corpus, corpus).collect()
    }
    assert want, "no near-dup flags in fixture corpus"
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(table_path(sf_dir, "documents") + "*")
    )
    got_rows, _ = run_stream_append(
        streaming_near_dup_flags(stream, corpus), tmp_path
    )
    got = {
        (r["doc_id"], r["corpus_id"], r["band"], r["jaccard"])
        for r in got_rows
    }
    assert got == want


def test_streaming_ivf_assignment_equals_batch(spark, sf_dir, tmp_path):
    """L3 on an unbounded stream: incoming embeddings route to trained
    IVF cells via the stateless inlined-centroid assignment (zero
    streaming state — the groupBy form would buffer per-key state) and
    must equal the batch assignment exactly."""
    from video_stream_processor_spark.io import table_path
    from video_stream_processor_spark.llm.similarity import (
        ivf_assign_mapside,
        ivf_assignments,
        kmeans_centroids,
    )
    from video_stream_processor_spark.schemas import EMBEDDINGS_SCHEMA

    emb = load_table(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb, k=8, iters=2)
    want = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assignments(emb, centroids=cent).collect()
    }
    stream = (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(table_path(sf_dir, "embeddings") + "*")
    )
    got_rows, _ = run_stream_append(
        ivf_assign_mapside(stream, cent).select("vec_id", "centroid_id"),
        tmp_path,
    )
    got = {r["vec_id"]: r["centroid_id"] for r in got_rows}
    assert got == want


def test_streaming_model_scoring_equals_batch(spark, sf_dir, tmp_path):
    """L4 learned filter on an unbounded stream: the trained model is
    plain plan literals (moments + weights), so inference is a
    stateless map-side projection — scoring a documents stream must
    equal the batch scores exactly, with zero streaming state."""
    from video_stream_processor_spark.llm.quality_model import (
        quality_features,
        score_quality,
        standardize,
        train_quality_model,
    )
    from video_stream_processor_spark.schemas import DOCUMENTS_SCHEMA

    docs = load_table(spark, sf_dir, "documents")
    moments, w = train_quality_model(docs, iters=6)

    def scored(df):
        return score_quality(standardize(quality_features(df), moments), w)

    want = {
        (r["doc_id"], r["quality_score"])
        for r in scored(docs).select("doc_id", "quality_score").collect()
    }
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(table_path(sf_dir, "documents") + "*")
    )
    got_rows, _ = run_stream_append(
        scored(stream).select("doc_id", "quality_score"), tmp_path
    )
    got = {(r["doc_id"], r["quality_score"]) for r in got_rows}
    assert got == want


def test_sampled_training_stays_close_to_full(spark, sf_dir):
    """100 TB path: training on the deterministic 1/2 hash-sample must
    stay within a few accuracy points of the full-corpus model on the
    FULL corpus (the inference pass always covers every row)."""
    from video_stream_processor_spark.llm.quality_model import (
        quality_features,
        score_quality,
        standardize,
        train_quality_model,
    )

    docs = load_table(spark, sf_dir, "documents")

    def acc(moments, w):
        scored = score_quality(
            standardize(quality_features(docs), moments), w
        )
        return scored.agg(
            F.avg(
                (
                    (F.col("quality_score") >= 0.5).cast("int")
                    == F.col("y").cast("int")
                ).cast("double")
            )
        ).first()[0]

    full = acc(*train_quality_model(docs))
    sampled = acc(*train_quality_model(docs, sample_mod=2))
    assert sampled >= full - 0.06, (full, sampled)


def test_streaming_corpus_ingestion_equals_batch(spark, sf_dir, tmp_path):
    """Continuous corpus ingestion (quality gate -> near-dup admission
    vs the reference corpus -> chunk -> append shards) must produce
    exactly the batch twin's chunk set when the stream drains the same
    files. The reference corpus is a disjoint half of the fixture so
    the admission filter actually rejects docs."""
    from video_stream_processor_spark.llm.ingest import (
        ingest_batch,
        prepare_corpus_stream,
    )
    from video_stream_processor_spark.llm.quality_model import (
        train_quality_model,
    )
    from video_stream_processor_spark.schemas import DOCUMENTS_SCHEMA

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    moments, w = train_quality_model(docs, iters=6)

    batch_chunks = ingest_batch(docs, corpus, moments, w)
    want = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in batch_chunks.collect()
    }
    assert want, "batch twin admitted nothing"
    n_docs_admitted = batch_chunks.select("doc_id").distinct().count()
    assert n_docs_admitted < docs.count(), "admission filter never rejected"

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(table_path(sf_dir, "documents") + "*")
    )
    out = str(tmp_path / "shards")
    q = (
        prepare_corpus_stream(
            stream, corpus, moments, w, out, str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# T1/T5/T6 + fault tolerance: checkpoint-restart recovery, under both the
# default HDFS-backed state store and RocksDB (the provider a real cluster
# runs for large state).
# ---------------------------------------------------------------------------

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _land_parquet_parts(df, stage_dir, src_dir):
    """Write ``df`` and move its part files into the live source dir —
    mimics new files arriving for the streaming file source. Returns the
    number of files landed."""
    df.coalesce(1).write.mode("overwrite").parquet(str(stage_dir))
    parts = sorted(stage_dir.glob("*.parquet"))
    for p in parts:
        shutil.copy(p, src_dir / f"{stage_dir.name}_{p.name}")
    assert parts, f"no parquet parts written under {stage_dir}"
    return len(parts)


@pytest.mark.parametrize("provider", ["hdfs_default", "rocksdb"])
def test_checkpoint_restart_recovers_state(spark, events_batch, tmp_path, provider):
    """A stopped query restarted on the same checkpoint must (a) resume
    from the file-source offsets already committed — reading ONLY files
    that arrived after the stop — and (b) restore its window state, so
    the post-restart result equals the batch twin over ALL the data.

    This is the recovery contract a 1000-executor job leans on: driver
    loss or a planned redeploy must not reprocess the backlog or drop
    aggregation state. availableNow + stop + restart is the local-mode
    replay of exactly that lifecycle; parametrized over the state-store
    provider to pin that the semantics don't depend on it.
    """
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
        )
    try:
        part1 = events_batch.filter(F.col("event_id") % 2 == 0)
        part2 = events_batch.filter(F.col("event_id") % 2 == 1)
        src = tmp_path / "src"
        src.mkdir()
        _land_parquet_parts(part1, tmp_path / "stage1", src)

        stream = spark.readStream.schema(events_batch.schema).parquet(str(src))
        agg = tumbling_stats(stream, size="1 hour", watermark="1 hour")
        name = f"restart_{provider}"
        ckpt = str(tmp_path / "ckpt_restart")

        def start():
            # Memory sink supports checkpoint recovery in complete mode
            # (state, not sink contents, is the recovered artifact).
            return (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        q1 = start()
        q1.awaitTermination(180)
        assert spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0] > 0

        _land_parquet_parts(part2, tmp_path / "stage2", src)
        q2 = start()
        q2.awaitTermination(180)

        # (a) restart read only the newly-landed files, not the backlog
        read_after_restart = sum(p["numInputRows"] for p in q2.recentProgress)
        assert read_after_restart == part2.count()

        # (b) restored state + new data == batch twin over the full table
        got = spark.sql(f"SELECT * FROM {name}").collect()
        want = tumbling_stats(events_batch, size="1 hour").collect()
        assert_tumbling_close(got, want)
    finally:
        if provider == "rocksdb":
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tumbling_avg_half_up_on_exact_tie(spark):
    """The 6-dp average is integer-derived and HALF-UP by contract: 32
    two-decimal values summing to 1114.23 put the true average exactly
    on the 6th-decimal boundary (34.8196875) — the case where double
    math is engine- and order-dependent (the sf0.1 rehearsal failure).
    Pinned against Python Decimal ROUND_HALF_UP."""
    from decimal import ROUND_HALF_UP, Decimal

    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA

    rows = [
        (i, f"2024-01-01 10:{i % 60:02d}:00", i, "x", 34.82 if i else 34.81, "{}")
        for i in range(32)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    ev = _normalize_events(spark.createDataFrame(pdf, schema=EVENTS_RAW_SCHEMA))
    out = tumbling_stats(ev, size="1 hour").collect()
    assert len(out) == 1
    want = (Decimal("1114.23") / 32).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    assert Decimal("1114.23") / 32 == Decimal("34.8196875")  # true tie
    assert out[0]["sum_value"] == 1114.23
    assert out[0]["avg_value"] == float(want) == 34.819688

def test_tumbling_avg_null_and_negative_semantics(spark):
    """avg_value keeps SQL AVG semantics (NULLs excluded, not
    zero-treated) and rounds negatives half-AWAY-FROM-ZERO on integer
    magnitude — the one negative-rounding convention Spark's `div`
    (truncate toward zero) and DuckDB's `//` (floor) agree on once the
    operands are abs()'d. Pinned against Python Decimal on both a
    mixed-NULL group and an all-refund (negative) group."""
    from decimal import ROUND_HALF_UP, Decimal

    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA

    rows = [
        # 10:00 window: two real values + one NULL → avg over 2, not 3
        (1, "2024-01-01 10:00:00", 1, "a", 10.01, "{}"),
        (2, "2024-01-01 10:01:00", 2, "a", 20.02, "{}"),
        (3, "2024-01-01 10:02:00", 3, "a", None, "{}"),
        # 11:00 window: all NULL → sum NULL, avg NULL (never div-by-0)
        (4, "2024-01-01 11:00:00", 1, "a", None, "{}"),
        # 12:00 window: negative sum landing on an exact 6-dp tie:
        # -1114.23 / 32 = -34.8196875 → half-away-from-zero -34.819688
        *[
            (10 + i, f"2024-01-01 12:{i % 60:02d}:00", i, "a",
             -34.82 if i else -34.81, "{}")
            for i in range(32)
        ],
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    ev = _normalize_events(spark.createDataFrame(pdf, schema=EVENTS_RAW_SCHEMA))
    out = {r["win_start"]: r for r in tumbling_stats(ev, size="1 hour").collect()}
    h10, h11, h12 = 1704103200, 1704106800, 1704110400
    assert out[h10]["n_events"] == 3
    assert out[h10]["sum_value"] == 30.03
    assert out[h10]["avg_value"] == 15.015  # /2 non-null, not /3
    assert out[h11]["sum_value"] is None
    assert out[h11]["avg_value"] is None
    want = -(Decimal("1114.23") / 32).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    assert out[h12]["avg_value"] == float(want) == -34.819688

def test_tumbling_avg_random_groups_match_decimal_reference(spark):
    """Property pin for the integer-cents average, ONE Spark job over
    200 random groups (per-example jobs would be minutes): for random
    mixes of positive/negative/NULL 2-decimal values, avg_value equals
    Python Decimal's 6-dp ROUND_HALF_UP (= ties away from zero — the
    convention the abs()+sign formula implements identically in Spark
    and DuckDB), averaged over NON-NULL values only; sum_value is the
    exact cents sum; all-NULL groups yield NULL for both."""
    from decimal import ROUND_HALF_UP, Decimal
    import random

    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA

    rng = random.Random(20260814)
    rows, want = [], {}
    base = 1704067200  # 2024-01-01 00:00 UTC
    eid = 0
    for g in range(200):
        h = base + g * 3600
        vals = [
            None if rng.random() < 0.15 else round(rng.uniform(-500, 500), 2)
            for _ in range(rng.randint(1, 40))
        ]
        for v in vals:
            ts = pd.Timestamp(h * 1_000_000_000 + rng.randint(0, 3599) * 1_000_000_000)
            rows.append((eid, ts, eid % 7, "x", v, "{}"))
            eid += 1
        nn = [Decimal(str(v)) for v in vals if v is not None]
        if nn:
            s = sum(nn)
            avg = (s / len(nn)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            want[h] = (len(vals), float(s), float(avg))
        else:
            want[h] = (len(vals), None, None)
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    ev = _normalize_events(spark.createDataFrame(pdf, schema=EVENTS_RAW_SCHEMA))
    got = {
        r["win_start"]: (r["n_events"], r["sum_value"], r["avg_value"])
        for r in tumbling_stats(ev, size="1 hour").collect()
    }
    assert got == want

def test_tumbling_avg_oracle_formula_matches_on_hostile_values(spark):
    """Engine-parity pin for the ORACLE's avg/sum expressions on data
    the parquet fixtures don't contain (negative money, NULLs, exact
    ties): run the stream_window_counts tumbling-leg arithmetic in
    DuckDB over the same random frame and require cell-identical
    results against tumbling_stats — the divergence class ADVICE r4
    flagged (Spark div truncates, DuckDB // floors) cannot re-enter
    unnoticed."""
    import random

    import duckdb

    from video_stream_processor_spark.io import _normalize_events
    from video_stream_processor_spark.schemas import EVENTS_RAW_SCHEMA

    rng = random.Random(97)
    rows = []
    base = 1704067200
    for g in range(60):
        h = base + g * 3600
        for i in range(rng.randint(1, 32)):
            v = None if rng.random() < 0.2 else round(rng.uniform(-400, 400), 2)
            ts = pd.Timestamp(h * 1_000_000_000 + i * 1_000_000_000)
            rows.append((g * 100 + i, ts, i, "x", v, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    ev = _normalize_events(spark.createDataFrame(pdf, schema=EVENTS_RAW_SCHEMA))
    got = {
        r["win_start"]: (r["n_events"], r["sum_value"], r["avg_value"])
        for r in tumbling_stats(ev, size="1 hour").collect()
    }
    con = duckdb.connect()
    con.register("ev", pdf[["ts", "value"]])
    duck = con.execute(
        """
        SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ws,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS s,
               CASE WHEN count(value) = 0 THEN NULL
                    ELSE (CASE WHEN sum(CAST(round(value * 100) AS BIGINT)) < 0
                               THEN -1 ELSE 1 END)
                       * ((abs(sum(CAST(round(value * 100) AS BIGINT))) * 20000
                            + count(value))
                          // (2 * count(value))) / 1000000.0
               END AS a
        FROM ev GROUP BY 1
        """
    ).fetchall()
    con.close()
    want = {ws: (n, s, a) for ws, n, s, a in duck}
    assert got == want
