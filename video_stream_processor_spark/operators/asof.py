"""As-of join (SURVEY §2.3 J7) as a shuffle-once composite.

pyspark.sql has no native ASOF JOIN. The naive composition (left join on
key + ``r.ts <= l.ts`` + row_number) materializes |left|×|matching
rights| rows before pruning — quadratic per key, fatal at 100 TB. This
implementation uses the union–sort–fill trick instead:

1. tag left and right rows, union them (no join, no blowup);
2. one window sort per key on (ts, side, tiebreak);
3. ``last(right_value, ignorenulls=True)`` over the unbounded-preceding
   frame fills each left row with the most recent right row at-or-before
   its timestamp (backward-inclusive, pandas ``merge_asof`` semantics);
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join: for every left row, attach the
    right row with the greatest ``right_ts <= left_ts`` per key.

    ``right_tiebreak``: column ordering simultaneous right rows (the
    greatest wins) — pass one for fully deterministic output.
    Right columns are attached as ``{prefix}{col}`` (nulls if no match).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

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
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
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
        "*",
        *[
            F.last(F.col(f"{prefix}{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
    )
    out = filled.filter(F.col(_SIDE) == 1)
    for c in right_cols:
        out = out.drop(f"{prefix}{c}").withColumnRenamed(f"__f_{c}", f"{prefix}{c}")
    return out.drop(_SIDE, _TS, _TIE)


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
    (pandas merge_asof ``tolerance=``). The match timestamp must be
    reconstructable, so the right ts is always attached."""
    right_cols = kwargs.pop("right_cols", None)
    if right_cols is not None and right_ts not in right_cols:
        right_cols = [*right_cols, right_ts]
    prefix = kwargs.get("prefix", "asof_")
    joined = asof_join(
        left, right, on, left_ts, right_ts,
        right_cols=right_cols, **kwargs,
    )
    matched_ts = F.col(f"{prefix}{right_ts}")
    stale = matched_ts.isNotNull() & (matched_ts < F.col(left_ts) - tolerance)
    out = joined
    for c in joined.columns:
        if c.startswith(prefix):
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out
