"""Extra checks that the oracle can't express."""

from __future__ import annotations

from video_stream_processor_spark.plans import all_specs


def test_approx_distinct_bounds(spark, sf_dir):
    """HLL++ at rsd=2% should land within 10% of exact on this data —
    agg_counts_suite asserts exactly this in its approx_ok column (the
    oracle-portable claim); this test re-checks it independently."""
    df = all_specs()["agg_counts_suite"].builder(spark, sf_dir)
    rows = [r for r in df.collect() if r["part"].startswith("approx:")]
    assert rows, "no approx legs in agg_counts_suite"
    for row in rows:
        assert row["exact_users"] > 0
        assert row["approx_ok"] == 1, row


def test_registry_fits_driver_window_and_is_fully_oracle_paired():
    """The driver hash-checks the first 50 registered queries: the
    registry must never exceed 50 entries, and every entry must carry a
    DuckDB oracle (a rows-only entry would burn a window slot on a
    weaker check) — except the ONE deliberate rows-only entry: the
    xxhash64 production near-dup paths (r9 verdict order 4), which
    DuckDB cannot replay by construction and whose correctness is
    pinned against the oracle-checked portable twins in test_llm.py."""
    specs = all_specs()
    assert len(specs) <= 50, f"registry has {len(specs)} entries (> 50)"
    rows_only = [n for n, s in specs.items() if s.oracle is None]
    assert rows_only == ["llm_near_dup_pairs_prod"], (
        f"unexpected rows-only entries burn driver slots: {rows_only}"
    )


def test_station_observe_counters(spark, sf_dir):
    """A2: the observe() counters surfaced by agg_counts_suite must
    agree with the stub extractor's outcome classes AND with the
    station pipeline's surviving row count (input - failed - unresolved
    = records the 37-field projection emits)."""
    df = all_specs()["agg_counts_suite"].builder(spark, sf_dir)
    got = {
        r["part"]: r["n"]
        for r in df.collect()
        if r["part"].startswith("observe:")
    }
    assert got["observe:station_input"] == 64
    survivors = (
        got["observe:station_input"]
        - got["observe:station_failed"]
        - got["observe:station_unresolved"]
    )
    station_rows = all_specs()["station_pipeline"].builder(spark, sf_dir).count()
    assert survivors == station_rows
