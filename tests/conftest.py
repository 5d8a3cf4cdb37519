"""Shared fixtures: one session-scoped SparkSession, sf-dir selection."""

from __future__ import annotations

import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from video_stream_processor_spark.session import get_spark  # noqa: E402

# sf0.001 keeps the suite fast; set VSP_TEST_SF_DIR=/root/testdata/sf0.01
# for a pre-driver dress rehearsal at the driver's correctness scale.
SF_DIR = os.environ.get("VSP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_spark(app_name="vsp-tests", cpus=8, shuffle_partitions=8)
    # Fixture-drift smoke probe: analyzing the events load catches an
    # on-disk type change (e.g. ns→µs regeneration) in the FIRST test
    # run, not in the driver's correctness run. Schema-only — no job.
    from video_stream_processor_spark.io import load_table

    probe = load_table(session, SF_DIR, "events")
    assert "ts_ns" in probe.columns, "events normalization lost ts_ns"
    assert dict(probe.dtypes)["ts"] == "timestamp", (
        f"events.ts normalized to {dict(probe.dtypes)['ts']!r}, expected "
        "'timestamp' — fixture encoding drifted; fix io._normalize_events"
    )
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
