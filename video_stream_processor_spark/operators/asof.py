"""As-of join (SURVEY §2.3 J7) as a shuffle-once composite.

pyspark.sql has no native ASOF JOIN. The naive composition (left join on
key + ``r.ts <= l.ts`` + row_number) materializes |left|×|matching
rights| rows before pruning — quadratic per key, fatal at 100 TB. This
implementation uses the union–sort–fill trick instead:

1. tag left and right rows, union them (no join, no blowup);
2. one window sort per key on (ts, side, tiebreak);
3. ``last(struct(right_ts, *right_cols), ignorenulls=True)`` over the
   unbounded-preceding frame fills each left row with the most recent
   right ROW at-or-before its timestamp (backward-inclusive, pandas
   ``merge_asof`` semantics). Filling one struct — not one column at a
   time — makes the match all-or-nothing per row: a matched right row's
   legitimately-NULL value column stays NULL instead of inheriting an
   older right row's value, and the output never mixes columns from
   different right rows;
4. keep only left rows.

Cost: exactly one shuffle (hash by key) + per-partition sort — the same
cost profile as a sort-merge join, data-size linear. Skewed keys are
handled by AQE the same way any window function is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"
_TS = "__asof_ts"
_TIE = "__asof_tie"
_PAY = "__asof_payload"
_RTS = "__asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    prefix: str = "asof_",
    ts_out: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: for every left row, attach the
    right row with the greatest ``right_ts <= left_ts`` per key.

    ``right_tiebreak``: column ordering simultaneous right rows (the
    greatest wins) — pass one for fully deterministic output.
    Right columns are attached as ``{prefix}{col}`` (nulls if no match);
    the match is all-or-nothing per row (one struct fill, see module
    doc). ``ts_out``: when set, also attach the matched right row's
    timestamp under that name.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    if _RTS in right_cols:
        raise ValueError(f"right_cols may not contain reserved name {_RTS!r}")

    lhs = left.select(
        "*",
        F.lit(1).alias(_SIDE),
        F.col(left_ts).alias(_TS),
        F.lit(None).cast("long").alias(_TIE),
    )
    tie = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(_TS),
        tie.alias(_TIE),
        # One struct per right row: struct() is non-null even when every
        # field is null, so last(ignorenulls) picks whole rows only.
        F.struct(
            F.col(right_ts).alias(_RTS),
            *[F.col(c) for c in right_cols],
        ).alias(_PAY),
    )
    merged = lhs.unionByName(rhs, allowMissingColumns=True)

    # Rights sort before lefts at equal ts (asof is inclusive); among
    # simultaneous rights the greatest tiebreak is filled last → wins.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*", F.last(F.col(_PAY), ignorenulls=True).over(w).alias("__f")
    )
    out = filled.filter(F.col(_SIDE) == 1)
    for c in right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__f.{c}"))
    if ts_out is not None:
        out = out.withColumn(ts_out, F.col(f"__f.{_RTS}"))
    return out.drop(_SIDE, _TS, _TIE, _PAY, "__f")


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    tolerance: Column,
    left_ts: str = "ts",
    right_ts: str = "ts",
    **kwargs,
) -> DataFrame:
    """As-of join that also nulls matches older than ``left_ts - tolerance``
    (pandas merge_asof ``tolerance=``). Only the exact set of columns
    this call attached is nulled for stale matches — pre-existing left
    columns that happen to share the prefix are untouched."""
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = kwargs.pop("right_cols", None)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    prefix = kwargs.get("prefix", "asof_")
    ts_out = kwargs.pop("ts_out", None)
    matched_ts_col = "__asof_matched_ts"
    joined = asof_join(
        left, right, on, left_ts, right_ts,
        right_cols=right_cols, ts_out=matched_ts_col, **kwargs,
    )
    matched_ts = F.col(matched_ts_col)
    stale = matched_ts.isNotNull() & (matched_ts < F.col(left_ts) - tolerance)
    out = joined
    for c in [f"{prefix}{rc}" for rc in right_cols]:
        out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    if ts_out is not None:
        # the caller-requested matched-ts column obeys the same
        # staleness rule as the attached value columns
        out = out.withColumn(
            ts_out, F.when(stale, F.lit(None)).otherwise(matched_ts)
        )
    return out.drop(matched_ts_col)


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts_ns",
    right_ts: str = "ts_ns",
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """The cogrouped-pandas twin of ``asof_join`` (SURVEY §2.9 U4
    cogroup surface): both inputs group by the key, each co-group's
    pair of pandas frames meets in one Arrow-batched task, and pandas
    ``merge_asof`` computes the backward-inclusive match.

    Exists for two reasons: (a) it demonstrates
    ``groupBy().cogroup().applyInPandas`` — the one pandas-API surface
    the JVM operators can't express — and (b) it is an independent
    implementation of the as-of semantics, pinned equal to the
    union–sort–fill JVM path in tests (two implementations, one
    contract). The JVM path stays the production default: same single
    shuffle per side, but no Python workers and no per-group pandas
    materialization (a hot key's whole group must fit one task here —
    the documented cogroup hazard).

    Tie among simultaneous right rows: the greatest ``right_tiebreak``
    wins, matching ``asof_join(right_tiebreak=...)``.
    """
    import pandas as pd
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    right_types = {f.name: f.dataType for f in right.schema.fields}
    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(f"{prefix}{c}", right_types[c], True) for c in right_cols]
    )
    left_cols = list(left.columns)
    # All integral widths: unmatched rows surface these as float NaN in
    # pandas; map each to its exact-width nullable dtype so Arrow hands
    # Spark proper NULLs with no unsafe downcast.
    pd_int = {
        T.ByteType: "Int8",
        T.ShortType: "Int16",
        T.IntegerType: "Int32",
        T.LongType: "Int64",
    }
    int_out = {
        f"{prefix}{c}": pd_int[type(right_types[c])]
        for c in right_cols
        if type(right_types[c]) in pd_int
    }
    lts, rts, tie = left_ts, right_ts, right_tiebreak
    rcols = list(right_cols)
    pfx = prefix

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        ldf = ldf.sort_values(lts, kind="mergesort")
        sort_keys = [rts] + ([tie] if tie else [])
        rdf = rdf.sort_values(sort_keys, kind="mergesort")
        rsel = rdf[[rts] + rcols].rename(
            columns={**{c: f"{pfx}{c}" for c in rcols}, rts: "__rts"}
        )
        merged = pd.merge_asof(
            ldf, rsel, left_on=lts, right_on="__rts",
            direction="backward", allow_exact_matches=True,
        )
        out = merged[left_cols + [f"{pfx}{c}" for c in rcols]]
        # unmatched rows surface integer right-cols as float NaN; cast
        # to pandas nullable ints so Arrow hands Spark proper NULLs
        return out.astype(int_out)

    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(merge, schema=out_schema)
    )
