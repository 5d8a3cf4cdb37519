"""Oracle-differential test over every registered query (SURVEY §5.2).

Mirrors the driver's t2 gate: each ``plans`` QuerySpec with an oracle is
hash-compared (here: exact-compared) against DuckDB on the same parquet;
oracle-less specs get the rows-and-schema sanity check.
"""

from __future__ import annotations

import pytest

from video_stream_processor_spark.plans import all_specs

from .oracle_harness import compare_to_oracle

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    if spec.oracle is None:
        rows = df.limit(5).collect()
        assert df.columns, f"{name}: no output columns"
        assert rows is not None
    else:
        compare_to_oracle(df, spec.oracle, sf_dir, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
