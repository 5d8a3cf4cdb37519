"""Local replica of the driver's oracle-differential check.

Runs a registered Spark query and its DuckDB oracle over the same
parquet, normalizes both to canonical pandas frames (columns sorted by
name, rows sorted by stringified values) and asserts EXACT equality —
stricter than any plausible driver hash, so float drift is caught here
first.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from video_stream_processor_spark.schemas import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "-0.0" if f == 0 else repr(f)
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return "-0.0" if f == 0 else repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Lower-cased sorted columns, every cell canonical-stringified,
    rows sorted — makes comparison order- and type-representation-
    insensitive, but value-exact."""
    out = pd.DataFrame()
    for col in sorted(df.columns, key=str.lower):
        out[str(col).lower()] = df[col].map(_canon_cell)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
            drop=True
        )
    return out


def compare_to_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "?") -> None:
    mine = canonicalize(spark_df.toPandas())
    con = duck_connection(sf_dir)
    theirs = canonicalize(con.execute(oracle_sql).fetch_df())
    con.close()
    assert list(mine.columns) == list(theirs.columns), (
        f"{name}: column mismatch\n spark={list(mine.columns)}\n duck ={list(theirs.columns)}"
    )
    assert len(mine) == len(theirs), f"{name}: row count {len(mine)} != {len(theirs)}"
    if len(mine) == 0:
        raise AssertionError(f"{name}: query returned 0 rows — not a useful check")
    neq = (mine != theirs).any(axis=1)
    if neq.any():
        bad = neq[neq].index[:5]
        detail = "\n".join(
            f"  row {i}:\n    spark={mine.loc[i].to_dict()}\n    duck ={theirs.loc[i].to_dict()}"
            for i in bad
        )
        raise AssertionError(
            f"{name}: {int(neq.sum())}/{len(mine)} rows differ\n{detail}"
        )
