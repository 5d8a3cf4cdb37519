#!/usr/bin/env python
"""Hostile replica of the grading driver's correctness pass.

The driver imports ``__spark_entry__`` into a SparkSession IT built
(unknown confs, unknown OS timezone), runs every registered query at
sf0.01 and hash-compares against the DuckDB oracle. This script does
the same, deliberately hostile:

* plain ``SparkSession.builder`` — NOT ``session.get_spark`` — so any
  load path that forgot ``ensure_runtime_confs`` breaks here first;
* run under a non-UTC OS timezone to catch naive-datetime drift
  (``TZ=America/New_York python scripts/driver_sim.py``);
* exact-compare via tests/oracle_harness (stricter than the driver's
  value hash).

Exit 0 = every query matches. Prints one status line per query.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("VSP_DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .appName("vsp-driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_harness import compare_to_oracle

    # the real driver's smoke is rows > 0 (__spark_entry__ contract);
    # count() >= 0 was vacuously true (r9 review)
    assert e.entry(spark).count() > 0, "entry smoke failed: 0 rows"

    queries = e.queries()
    oracles = e.oracle_sql()
    failed: list[str] = []
    for name in sorted(queries):
        t0 = time.monotonic()
        try:
            df = queries[name](spark, SF_DIR)
            if name in oracles:
                compare_to_oracle(df, oracles[name], SF_DIR, name=name)
                status = "match"
            else:
                # materialize ALL rows like the driver's rows-only
                # check would; limit(1) passed on empty results and
                # never executed later partitions (r9 review)
                assert df.count() > 0, "rows-only query returned 0 rows"
                status = "rows-only"
        except Exception:
            traceback.print_exc()
            status = "FAIL"
            failed.append(name)
        print(f"{name}: {status} ({time.monotonic() - t0:.1f}s)", flush=True)

    n = len(queries)
    print(f"# driver-sim: {n - len(failed)}/{n} ok, sf_dir={SF_DIR}, "
          f"tz={os.environ.get('TZ', '(os default)')}")
    if failed:
        print(f"# FAILED: {failed}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
