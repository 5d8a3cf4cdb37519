"""io._normalize_events across every ts storage encoding it claims to
handle (VERDICT r2 item 8 — the branch that broke round 2 was the one
no test exercised).

The events fixture has shipped in two encodings over the rounds:
parquet TIMESTAMP(NANOS) (read as bigint under nanosAsLong) and
TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). A
UTC-adjusted MICROS file (plain TimestampType) is the third plausible
drift. All three must normalize to the same (ts: timestamp, ts_ns:
bigint) shape with identical values.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from video_stream_processor_spark.io import _normalize_events

# Naive-UTC wall clocks; epoch micros are tz-independent for these.
_WALL = [
    datetime.datetime(2024, 1, 1, 10, 0, 0, 123456),
    datetime.datetime(2024, 3, 15, 23, 59, 59, 999999),
    datetime.datetime(2025, 7, 4, 0, 0, 0, 0),
]
_EPOCH = datetime.datetime(1970, 1, 1)
_EXPECT_NS = [int((w - _EPOCH).total_seconds() * 1_000_000) * 1000 for w in _WALL]


def _write(tmp_path, ts_type, name):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_WALL, pa.timestamp("us")).cast(ts_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    path = str(tmp_path / name)
    pq.write_table(table, path)
    return path


@pytest.mark.parametrize(
    "ts_type,expect_raw_dtype",
    [
        (pa.timestamp("ns"), "bigint"),  # TIMESTAMP(NANOS) + nanosAsLong
        (pa.timestamp("us"), "timestamp_ntz"),  # current driver fixture
        (pa.timestamp("us", tz="UTC"), "timestamp"),  # UTC-adjusted MICROS
    ],
    ids=["nanos-as-long", "micros-ntz", "micros-utc"],
)
def test_normalize_events_encodings(spark, tmp_path, ts_type, expect_raw_dtype):
    path = _write(tmp_path, ts_type, "ev.parquet")
    raw = spark.read.parquet(path)
    assert dict(raw.dtypes)["ts"] == expect_raw_dtype
    norm = _normalize_events(raw)
    assert dict(norm.dtypes)["ts"] == "timestamp"
    assert dict(norm.dtypes)["ts_ns"] == "bigint"
    rows = sorted(norm.select("event_id", "ts", "ts_ns").collect())
    assert [r["ts_ns"] for r in rows] == _EXPECT_NS
    # ts renders as the same naive-UTC wall clock in every encoding
    # (session tz pinned UTC in _RUNTIME_CONFS)
    assert [r["ts"].replace(tzinfo=None) for r in rows] == _WALL


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["nanos-as-long", "micros-ntz", "micros-utc"],
)
def test_events_stream_reads_every_encoding(spark, tmp_path, ts_type):
    """Streaming reads must declare a schema, so the footer decides
    which raw schema to declare (ADVICE r3: a hardcoded TIMESTAMP_NTZ
    declaration broke older TIMESTAMP(NANOS) fixtures on the stream
    path even though the batch path handled them)."""
    from video_stream_processor_spark.io import load_events_stream

    _write(tmp_path, ts_type, "events.parquet")
    sdf = load_events_stream(spark, str(tmp_path))
    assert dict(sdf.dtypes)["ts"] == "timestamp"
    assert dict(sdf.dtypes)["ts_ns"] == "bigint"
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_enc_stream")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    rows = sorted(
        spark.sql("select event_id, ts, ts_ns from t_enc_stream").collect()
    )
    assert [r["ts_ns"] for r in rows] == _EXPECT_NS
    assert [r["ts"].replace(tzinfo=None) for r in rows] == _WALL
