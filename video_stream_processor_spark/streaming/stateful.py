"""T9 — arbitrary stateful streaming operator.

The reference has no per-key state (each cron run is stateless, full
recompute — video_processor.py:356-392); this is the north-star general
form: user-scoped running totals maintained across micro-batches with
``applyInPandasWithState`` (Arrow-batched, executor-side state store).

Scale notes: state lives in the executor state store keyed by user_id —
partitioned by the groupBy hash, so 1000 executors hold 1/1000 of the
keys each. State size is O(distinct keys), not O(events); the timeout
(``GroupStateTimeout``) is the eviction policy for idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)
# State carries the value sum as EXACT integer cents, not a double:
# a float accumulated across micro-batches picks up a different
# addition-order error than the batch twin's one-shot sum, so on a
# high-count key round(total, 2) can land on a different cent than the
# twin and the documented must-match-exactly contract breaks at scale
# (plus Python round() is half-even while F.round is half-up — they
# split on exact .xx5 ties). Integer cents sum identically in any
# order, the same argument as analytics.tumbling_stats (r15 review).
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)


def _cents(values: pd.Series) -> int:
    """2-decimal money → exact integer cents, half-up like F.round
    (numpy round is half-even; +0.5-floor on the magnitude matches
    Spark's BigDecimal HALF_UP, sign reapplied for refunds)."""
    import numpy as np

    v = values.to_numpy(dtype="float64") * 100.0
    return int((np.sign(v) * np.floor(np.abs(v) + 0.5)).sum())


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running totals
    and emit the updated snapshot."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += _cents(pdf["value"])
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [cents / 100.0]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum(value)) snapshots, one
    row per user per micro-batch that touched the user. Batch twin:
    ``user_totals_batch`` — the final snapshot must match it exactly
    (both sides sum exact integer cents, so the equality is by
    construction, independent of micro-batch split or addition order).
    """
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """The batch semantics running_user_totals converges to (exact
    cents, same formula as the streaming state fold)."""
    cents = F.round(F.col("value") * 100).cast("long")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents) / 100.0).alias("sum_value"),
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
# ALL of the user's open sessions (parallel arrays sorted by start),
# not just the newest: with a watermark delay, a "late" row Spark still
# delivers can extend or bridge an EARLIER session — single-session
# state forced the first cut to merge such rows into the wrong session
# (start never lowered, rows > gap before the open session absorbed)
# and to emit eagerly on an in-key gap before the watermark made the
# session final, both diverging from the session_window batch twin
# (r15 review). State is O(open sessions per user), and a session
# stays open only until the watermark passes its close boundary, so
# the array length is bounded by gap+delay worth of activity.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("starts_us", ArrayType(LongType())),
        StructField("lasts_us", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _session_row(start_us: int, last_us: int, n: int, gap_us: int) -> pd.DataFrame:
    # session_end = last event + gap: matches F.session_window's
    # half-open [start, last+gap) so the batch twin compares exactly.
    return pd.DataFrame(
        {
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us + gap_us, unit="us")],
            "n_events": [n],
        }
    )


def _make_session_closer(gap_us: int):
    def _close_sessions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # [start_us, last_us, n] per open session, sorted by start.
        sessions: list[list[int]] = []
        if state.exists:
            sessions = [list(t) for t in zip(*state.get)]
        if not state.hasTimedOut:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
                )
            # Merge new rows into the open sessions by the classic
            # sort-and-fold: neighbors merge iff the boundary gap is
            # <= gap (an event landing EXACTLY gap after the last one
            # still merges — the F.session_window convention, pinned by
            # the exact-gap test). A row can lower a session's start,
            # bridge two sessions into one, or open its own — all
            # cases one fold handles.
            items = sessions + [[t, t, 1] for t in ts_us]
            items.sort(key=lambda it: (it[0], it[1]))
            sessions = []
            for it in items:
                if sessions and it[0] - sessions[-1][1] <= gap_us:
                    sessions[-1][1] = max(sessions[-1][1], it[1])
                    sessions[-1][2] += it[2]
                else:
                    sessions.append(it)
        # A session is final only once the watermark STRICTLY passes
        # last + gap: a future row carries ts >= watermark, and at
        # ts - last == gap it would still merge. Emission therefore
        # waits for the watermark (no eager in-gap emit — an emitted
        # session could otherwise still legally grow from a
        # late-but-in-watermark row, and appended output can never be
        # amended).
        wm_us = state.getCurrentWatermarkMs() * 1000
        remaining = [s for s in sessions if s[1] + gap_us >= wm_us]
        if remaining:
            state.update(
                (
                    [s[0] for s in remaining],
                    [s[1] for s in remaining],
                    [s[2] for s in remaining],
                )
            )
            # Wake when the watermark passes the EARLIEST remaining
            # close boundary (ms floor is safe: EventTimeTimeout fires
            # only when the watermark strictly exceeds the timestamp,
            # so firing implies wm > boundary and the strict close
            # check above then passes).
            state.setTimeoutTimestamp(
                min(s[1] + gap_us for s in remaining) // 1000
            )
        else:
            state.remove()
        for start_us, last_us, n in sessions:
            if last_us + gap_us < wm_us:
                row = _session_row(start_us, last_us, n, gap_us)
                row.insert(0, "user_id", key[0])
                yield row

    return _close_sessions


def closed_user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """T9 (second form) — event-time sessionization that emits a row
    only when a session CLOSES, the stateful pattern ``session_window``
    aggregation cannot express (it re-emits whole windows; this emits
    each session exactly once, suitable for an append-only sink).

    A session emits exactly when the event-time watermark passes its
    close boundary (``last_ts + gap``) — in whichever invocation
    observes that first: a data batch for the key, or the
    ``GroupStateTimeout.EventTimeTimeout`` wakeup for an idle key.
    Never earlier: until the watermark passes the boundary a
    late-but-in-watermark row can still legally extend or bridge the
    session, and appended output cannot be amended (the first cut
    emitted eagerly on an in-key gap and mis-merged late rows into the
    newest session — r15 review). Batch twin:
    ``closed_sessions_batch`` — every session whose close boundary the
    final watermark passed must match it exactly (start, end =
    last + gap, count).

    Scale notes: state is the user's OPEN sessions — O(active keys x
    sessions inside the watermark horizon), bounded by the timeout
    eviction; the single shuffle is the groupBy hash partitioning, so
    1000 executors hold 1/1000 of the open sessions each. Requires
    ``withWatermark`` upstream (enforced by Spark for
    EventTimeTimeout).

    The reference's cron recompute (video_processor.py:356-392) has no
    incremental analog of this; it is the north-star general form.
    """
    gap_us = _duration_us(gap)
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_closer(gap_us),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_us(gap: str) -> int:
    """'30 minutes' → microseconds, via the one interval parser the
    package shares (analytics.interval_ns — full unit table, multi-part
    intervals, loud errors). The first cut re-implemented a narrower
    table here, so closed_user_sessions(gap='1 day') crashed with a
    bare KeyError while every other interval consumer accepted it
    (r15 review)."""
    from .analytics import interval_ns

    return interval_ns(gap) // 1000


def closed_sessions_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """The batch semantics closed_user_sessions converges to once the
    watermark passes every session: one row per (user, session_window),
    end = last event + gap (Spark session_window's half-open bound)."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """T9 on the Spark 4 ``transformWithStateInPandas`` API — the
    successor to applyInPandasWithState: named state variables on a
    processor handle, timer support, RocksDB-backed state store
    (set ``spark.sql.streaming.stateStore.providerClass`` to the
    RocksDB provider — required by this operator). Same semantics as
    ``running_user_totals``; tests assert both converge to the batch
    twin.

    Runtime requirement: the TWS state-server protocol needs the
    ``protobuf`` Python package; environments without it should use
    ``running_user_totals`` (applyInPandasWithState) — the test suite
    skips this variant when protobuf is missing."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            n, cents = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += _cents(pdf["value"])
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
