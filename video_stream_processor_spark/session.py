"""SparkSession factory and runtime-conf guard.

Two consumers:

* our own tests / ``bench.py`` — ``get_spark()`` builds the session;
* the driver harness — it owns the session and calls ``queries()``
  callables; there we may only adjust *runtime* confs, via
  ``ensure_runtime_confs(spark)``.

Config rationale (written for the 100 TB target, exercised on local[N]):

* **AQE on** (+ partition coalescing + skew-join): at cluster scale this
  right-sizes post-shuffle partitions and splits skewed join partitions
  at runtime — the single highest-leverage knob for ad-hoc analytics.
* **shuffle.partitions ≈ cores** locally; on a 1000-executor cluster set
  ~2-3× total cores and let AQE coalesce down per stage.
* **Session timezone pinned UTC** so timestamp rendering matches the
  DuckDB oracle (naive-UTC) and is cluster-node independent.
* **Arrow enabled** — every Python-boundary crossing (pandas UDFs,
  ``toPandas``) is Arrow-batched, never row-pickled.
* **nanosAsLong** — the ``events`` table stores TIMESTAMP(NANOS), which
  Spark's vectorized parquet reader otherwise rejects; we read nanos as
  int64 and normalize to micros in ``io.load_table`` (lossless for our
  derivations, which are ≥ second granularity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are runtime-settable and required for correct/deterministic
# results regardless of who built the session (e.g. the driver harness).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet uses TIMESTAMP(NANOS); see module docstring.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # parquet footer min/max → MIN/MAX/COUNT answered from metadata
    "spark.sql.parquet.aggregatePushdown": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Set the runtime confs this engine relies on; safe on any session."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static conf on this build — get_spark() sets it at build
            # time; an externally built session keeps its value.
            pass
    return spark


def get_spark(
    app_name: str = "video-stream-processor-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a local[N] session with the engine's defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or 0) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("VSP_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_runtime_confs(spark)
