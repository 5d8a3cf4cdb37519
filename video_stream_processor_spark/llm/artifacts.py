"""Trained-artifact store: persist and reload the small scalar models
the engine trains (logistic-regression weights + moments, BPE merge
tables, any JSON-shaped parameters).

`session.materialize` already makes DataFrame-shaped artifacts
(k-means centroids, PQ codebooks) durable; this covers the driver-side
scalar artifacts. The operational shape at 100 TB: a scheduled train
job writes the artifact next to the corpus snapshot, serving/inference
jobs load it and inline the values as plan literals — training and
inference never share a session, so an in-memory memo is not enough.

Storage format is a single-row JSON column in parquet, written through
Spark — the same writer/committer/filesystem stack as every other
output, so the store works unchanged on HDFS/S3/DBFS paths. The JSON
payload keeps floats at full ``repr`` precision: a reloaded model is
bit-identical to the trained one (pinned in tests), which matters
because the whole determinism contract of the trained ops rests on
exact doubles.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_FORMAT_VERSION = 1


def save_artifact(spark: SparkSession, path: str, payload: dict) -> None:
    """Write a JSON-serializable artifact as a one-row parquet at
    ``path`` (overwrite). Floats survive at full precision: json emits
    repr(float), which round-trips doubles exactly."""
    body = json.dumps(payload, sort_keys=True)
    (
        spark.range(1)
        .select(
            F.lit(_FORMAT_VERSION).alias("format_version"),
            F.lit(body).alias("payload_json"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def load_artifact(spark: SparkSession, path: str) -> dict:
    """Read an artifact written by :func:`save_artifact`."""
    rows = spark.read.parquet(path).collect()
    if len(rows) != 1:
        raise ValueError(f"artifact at {path} has {len(rows)} rows, expected 1")
    row = rows[0]
    if row["format_version"] != _FORMAT_VERSION:
        raise ValueError(
            f"artifact format {row['format_version']} != {_FORMAT_VERSION}"
        )
    return json.loads(row["payload_json"])


def save_quality_model(
    spark: SparkSession,
    path: str,
    moments: dict[str, float],
    weights: list[float],
) -> None:
    """Persist a trained quality model (see llm/quality_model.py)."""
    save_artifact(
        spark, path, {"kind": "quality_logreg", "moments": moments, "weights": weights}
    )


def load_quality_model(
    spark: SparkSession, path: str
) -> tuple[dict[str, float], list[float]]:
    """Reload a quality model; returns (moments, weights) bit-identical
    to what was saved."""
    art = load_artifact(spark, path)
    if art.get("kind") != "quality_logreg":
        raise ValueError(f"artifact at {path} is {art.get('kind')!r}")
    return art["moments"], [float(w) for w in art["weights"]]
