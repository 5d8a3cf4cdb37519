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
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running totals
    and emit the updated snapshot."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum(value)) snapshots, one
    row per user per micro-batch that touched the user. Batch twin:
    ``user_totals_batch`` — the final snapshot must match it exactly.
    """
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """The batch semantics running_user_totals converges to."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
# (start_us, last_us, n_events) of the currently-open session.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
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
        closed: list[pd.DataFrame] = []
        if state.hasTimedOut:
            # Watermark passed last_ts + gap with no new rows: the open
            # session can never grow — close it and evict the key.
            start_us, last_us, n = state.get
            closed.append(_session_row(start_us, last_us, n, gap_us))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
                )
            ts_us.sort()
            start_us, last_us, n = state.get if state.exists else (None, None, 0)
            for t in ts_us:
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    # In-key gap: the arriving row itself proves the
                    # previous session closed — emit without waiting
                    # for the watermark.
                    closed.append(_session_row(start_us, last_us, n, gap_us))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = max(last_us, t), n + 1
            state.update((start_us, last_us, n))
            # Idle-key eviction: fire when event-time watermark passes
            # the open session's close boundary.
            state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        for row in closed:
            row.insert(0, "user_id", key[0])
            yield row

    return _close_sessions


def closed_user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """T9 (second form) — event-time sessionization that emits a row
    only when a session CLOSES, the stateful pattern ``session_window``
    aggregation cannot express (it re-emits whole windows; this emits
    each session exactly once, suitable for an append-only sink).

    Two close paths: an in-key gap (a newer row for the same user more
    than ``gap`` later) closes eagerly; an idle key closes via
    ``GroupStateTimeout.EventTimeTimeout`` when the watermark passes
    ``last_ts + gap``. Batch twin: ``closed_sessions_batch`` — every
    session whose close boundary the final watermark passed must match
    it exactly (start, end = last + gap, count).

    Scale notes: state is one (start, last, n) triple per OPEN session
    per user — O(active keys), bounded by the timeout eviction; the
    single shuffle is the groupBy hash partitioning, so 1000 executors
    hold 1/1000 of the open sessions each. Requires ``withWatermark``
    upstream (enforced by Spark for EventTimeTimeout).

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
    """'30 minutes' → microseconds (the small interval grammar the
    session builders use)."""
    qty, unit = gap.split()
    per = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
    }[unit]
    return int(qty) * per


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
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [round(total, 2)],
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
