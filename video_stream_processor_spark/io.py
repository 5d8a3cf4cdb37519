"""Table loaders and sources (SURVEY §2.1).

All readers are declarative ``spark.read``/``spark.readStream`` — column
pruning and predicate pushdown reach the parquet scan for free. At
100 TB the same code holds: each table becomes a directory of parquet
files (ideally partitioned / bucketed by its join key) and the path is
the only thing that changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import EVENTS_RAW_SCHEMA, TABLES
from .session import ensure_runtime_confs


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _normalize_events(raw: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` regardless of its on-disk encoding.

    The fixture has shipped as parquet TIMESTAMP(NANOS) (read as int64
    under nanosAsLong) and as TIMESTAMP(MICROS, isAdjustedToUTC=false)
    (read as TIMESTAMP_NTZ). Expose ``ts`` as TimestampType (micros,
    UTC — the session tz is pinned UTC so the NTZ cast is exact and
    tz-independent, matching DuckDB's naive-UTC rendering) and keep
    integer epoch nanos as ``ts_ns``. Exact integer path throughout:
    a double round-trip (cast(double)*1e9) loses ~100s of ns."""
    dtype = dict(raw.dtypes).get("ts")
    if dtype == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
        return raw.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    ts = F.col("ts")
    if dtype == "timestamp_ntz":
        # unix_micros requires TIMESTAMP; with session tz UTC the cast
        # is a pure re-tag (no wall-clock shift).
        ts = ts.cast("timestamp")
    return raw.withColumn("ts", ts).withColumn(
        "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; events gets timestamp normalization."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _normalize_events(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every table as a temp view (for the SQL entry point)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{name}{suffix}")


def _events_stream_schema(path: str):
    """Raw schema for a streaming events read, chosen from the parquet
    footer. Batch reads infer this; streaming reads must declare it,
    and the fixture has shipped with three ``ts`` encodings
    (TIMESTAMP(NANOS) → bigint under nanosAsLong, TIMESTAMP(MICROS)
    NTZ, TIMESTAMP(MICROS) UTC), so a hardcoded declaration breaks on
    older fixtures. Falls back to EVENTS_RAW_SCHEMA (the current
    encoding) if the footer can't be read."""
    from pyspark.sql import types as T

    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_schema(path).field("ts").type
        if pa.types.is_timestamp(t):
            if t.unit == "ns":
                ts_type = T.LongType()  # read as bigint via nanosAsLong
            elif t.tz is None:
                ts_type = T.TimestampNTZType()
            else:
                ts_type = T.TimestampType()
        elif pa.types.is_integer(t):
            ts_type = T.LongType()
        else:
            return EVENTS_RAW_SCHEMA
    except Exception:
        return EVENTS_RAW_SCHEMA
    return T.StructType(
        [
            T.StructField(
                f.name,
                ts_type if f.name == "ts" else f.dataType,
                f.nullable,
            )
            for f in EVENTS_RAW_SCHEMA.fields
        ]
    )


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded relation (T2/T5-T11 fixtures): the parquet
    file replayed through the streaming file source. Schema must be
    declared for streaming reads (chosen from the footer — see
    _events_stream_schema); one file per trigger keeps micro-batch
    boundaries deterministic in tests."""
    ensure_runtime_confs(spark)
    path = table_path(sf_dir, "events")
    # The streaming file source needs a directory or glob (a bare file
    # path fails "basePath must be a directory"); a trailing-* glob
    # keeps this zero-copy over the read-only fixture file.
    raw = (
        spark.readStream.schema(_events_stream_schema(path))
        .option("maxFilesPerTrigger", "1")
        .parquet(path + "*")
    )
    return _normalize_events(raw)


def read_links(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """S1: text line scan with comment/blank filtering.

    Reference: ``/root/reference/video_processor.py:325-336`` — strip
    each line, drop blanks and ``#``-comments (:329). Dedup (:330) is
    applied separately (operators.dedup / dropDuplicates) so the scan
    stays streaming-compatible.
    """
    reader = spark.readStream if streaming else spark.read
    lines = reader.text(path)
    trimmed = F.trim(F.col("value"))
    return (
        lines.select(trimmed.alias("url"))
        .filter((F.col("url") != "") & (~F.col("url").startswith("#")))
    )
