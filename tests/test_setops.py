"""Extra checks that the oracle can't express."""

from __future__ import annotations

from video_stream_processor_spark.plans import all_specs


def test_approx_distinct_bounds(spark, sf_dir):
    """HLL++ at rsd=2% should land within 10% of exact on this data."""
    df = all_specs()["agg_approx_distinct"].builder(spark, sf_dir)
    for row in df.collect():
        exact, approx = row["exact_users"], row["approx_users"]
        assert exact > 0
        assert abs(approx - exact) <= max(2, 0.10 * exact), row
