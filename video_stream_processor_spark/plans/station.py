"""SURVEY §7 Phase 2 registration — the reference pipeline end-to-end
as a driver-visible query.

Covers in one graph: S1 (link scan semantics), O5 (dedup before the
expensive call — video_processor.py:330), U1 (Arrow-batched enrichment
with the deterministic stub extractor), P2/P3 (validity filters),
F1-F14 (scalar derivations), P1 (38-field projection).

Rows-only driver check: the stub enrichment is Python (md5-derived),
so there is no single-statement DuckDB twin — but every scalar
derivation in the chain is oracle-checked individually by the
scalar_* suites, and tests/test_station.py pins golden outputs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.station import build_station_records
from ..session import ensure_runtime_confs
from ..sources.extractor import StubExtractor
from .base import register

RUN_TS = dt.datetime(2026, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc)
N_LINKS = 64


@register("station_pipeline", survey_ids="S1,S3,O5,U1,P1,P2,P3,F1-F14")
def station_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline (links -> dedup -> enrich -> validate ->
    38-field station records) on a deterministic synthetic link set:
    fully reproducible (seeded stub extractor + frozen run_ts +
    md5-derived uuids), ~1/16 enrichment failures and ~1/16 unresolved
    URLs exercise the P2/P3 drop paths."""
    # No load_table in this builder — ship the package + set confs
    # explicitly (the enrichment mapInPandas unpickles module functions
    # on executors).
    ensure_runtime_confs(spark)
    links = spark.range(N_LINKS).select(
        F.concat(F.lit("https://www.youtube.com/watch?v=vid"), F.col("id")).alias("url")
    )
    return build_station_records(
        links, StubExtractor, run_ts=RUN_TS, partitions=8
    )
