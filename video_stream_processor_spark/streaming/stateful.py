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
