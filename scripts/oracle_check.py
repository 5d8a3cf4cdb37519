#!/usr/bin/env python
"""Targeted oracle check: run only the NAMED registered queries against
the DuckDB oracle (same harness as driver_sim) — the per-change
equivalence proof the r15 optimization round runs after every engine
edit, at a fraction of a full driver replay's wall.

Usage: python scripts/oracle_check.py q1,q2,... [sf_dir ...]
(default sf dirs: sf0.001 and sf0.01)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .appName("vsp-oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_harness import compare_to_oracle

    queries = e.queries()
    oracles = e.oracle_sql()
    failed = []
    for sf_dir in sf_dirs:
        for name in names:
            t0 = time.monotonic()
            try:
                df = queries[name](spark, sf_dir)
                if name in oracles:
                    compare_to_oracle(df, oracles[name], sf_dir, name=name)
                    status = "match"
                else:
                    assert df.count() > 0, "rows-only query returned 0 rows"
                    status = "rows-only"
            except Exception:
                traceback.print_exc()
                status = "FAIL"
                failed.append(f"{name}@{sf_dir}")
            print(
                f"{name} @ {os.path.basename(sf_dir)}: {status} "
                f"({time.monotonic() - t0:.1f}s)",
                flush=True,
            )
    if failed:
        print(f"# FAILED: {failed}")
        return 1
    print("# all named queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
