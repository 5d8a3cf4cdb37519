"""Composite-operator semantics (operators/asof.py) — pinned against
pandas ``merge_asof``, including the cases the union–sort–fill trick
can get wrong if implemented per-column instead of per-row."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from video_stream_processor_spark.operators.asof import (
    asof_join,
    asof_join_tolerance,
)


def _left(spark):
    return spark.createDataFrame(
        [(1, 100, 10), (1, 250, 11), (2, 50, 12), (3, 400, 13)],
        ["k", "ts", "lid"],
    )


def _right(spark):
    # right row at ts=200 carries a NULL value column on purpose
    return spark.createDataFrame(
        [(1, 90, "a", 1.0), (1, 200, None, 2.0), (2, 60, "c", 3.0)],
        "k bigint, ts bigint, v string, w double",
    )


def test_asof_matches_pandas_merge_asof(spark):
    got = {
        r["lid"]: (r["asof_v"], r["asof_w"])
        for r in asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts", right_ts="ts"
        ).collect()
    }
    lp = _left(spark).toPandas().sort_values("ts")
    rp = _right(spark).toPandas().sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in exp.iterrows():
        v = None if pd.isna(row["v"]) else row["v"]
        w = None if pd.isna(row["w"]) else row["w"]
        assert got[row["lid"]] == (v, w), row["lid"]


def test_asof_null_value_column_stays_null(spark):
    """The all-or-nothing property the struct fill guarantees: a MATCHED
    right row's NULL column must come through as NULL — not inherit an
    older right row's value — and the other columns of the same right
    row must still fill (no mixing across right rows)."""
    out = {
        r["lid"]: (r["asof_v"], r["asof_w"])
        for r in asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts", right_ts="ts"
        ).collect()
    }
    # lid=11 (k=1, ts=250) matches the right row at ts=200: v is NULL
    # there, w is 2.0 — per-column fill would wrongly give v='a'.
    assert out[11] == (None, 2.0)
    # lid=10 (k=1, ts=100) matches ts=90 cleanly.
    assert out[10] == ("a", 1.0)
    # lid=13 (k=3) has no right rows at all.
    assert out[13] == (None, None)


def test_asof_random_bulk_vs_pandas(spark):
    """Seeded random joint distribution — many keys, duplicate
    timestamps, NULL right values, keys missing on either side — must
    match pandas merge_asof row-for-row. (Simultaneous right rows are
    excluded per (k, ts): pandas keeps input order there while the
    distributed sort needs an explicit tiebreak — covered separately.)"""
    import random

    rnd = random.Random(7)
    lrows = [
        (rnd.randrange(12), rnd.randrange(1000), i) for i in range(400)
    ]
    seen: set[tuple[int, int]] = set()
    rrows = []
    for j in range(200):
        k, ts = rnd.randrange(10), rnd.randrange(1000)
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        rrows.append((k, ts, None if rnd.random() < 0.3 else f"v{j}", float(j)))
    left = spark.createDataFrame(lrows, "k bigint, ts bigint, lid bigint")
    right = spark.createDataFrame(rrows, "k bigint, ts bigint, v string, w double")
    got = {
        r["lid"]: (r["asof_v"], r["asof_w"])
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
    }
    lp = left.toPandas().sort_values("ts", kind="stable")
    rp = right.toPandas().sort_values("ts", kind="stable")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    assert len(got) == 400
    for _, row in exp.iterrows():
        v = None if pd.isna(row["v"]) else row["v"]
        w = None if pd.isna(row["w"]) else row["w"]
        assert got[row["lid"]] == (v, w), (row["lid"], got[row["lid"]], (v, w))
    # three-way agreement: the cogrouped applyInPandas twin must match
    # the JVM path on the same joint distribution
    from video_stream_processor_spark.operators.asof import asof_join_cogrouped

    cog = {
        r["lid"]: (r["asof_v"], r["asof_w"])
        for r in asof_join_cogrouped(
            left, right, on="k", left_ts="ts", right_ts="ts"
        ).collect()
    }
    assert cog == got


def test_asof_cogrouped_small_int_right_columns(spark):
    """ByteType/ShortType right columns survive the pandas round-trip:
    matched rows keep exact values, unmatched rows become real NULLs
    (not float NaN that fails the Arrow cast to int8/int16)."""
    from pyspark.sql import types as T

    from video_stream_processor_spark.operators.asof import asof_join_cogrouped

    left = spark.createDataFrame(
        [(1, 5, 10), (1, 50, 11), (2, 5, 12)], "k bigint, ts bigint, lid bigint"
    )
    right = spark.createDataFrame(
        [(1, 10, 3, 7)],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("ts", T.LongType()),
                T.StructField("tiny", T.ByteType()),
                T.StructField("small", T.ShortType()),
            ]
        ),
    )
    out = asof_join_cogrouped(left, right, on="k", left_ts="ts", right_ts="ts")
    types = {f.name: f.dataType for f in out.schema.fields}
    assert types["asof_tiny"] == T.ByteType()
    assert types["asof_small"] == T.ShortType()
    got = {r["lid"]: (r["asof_tiny"], r["asof_small"]) for r in out.collect()}
    assert got == {10: (None, None), 11: (3, 7), 12: (None, None)}


def test_asof_tolerance_nulls_only_attached_columns(spark):
    """Stale matches null exactly the columns THIS join attached; a
    pre-existing left column sharing the prefix is untouched."""
    left = _left(spark).withColumn("asof_note", F.lit("keep-me"))
    out = {
        r["lid"]: (r["asof_v"], r["asof_w"], r["asof_note"])
        for r in asof_join_tolerance(
            left,
            _right(spark),
            on="k",
            tolerance=F.lit(30),
            left_ts="ts",
            right_ts="ts",
        ).collect()
    }
    # lid=10: match at ts=90, left ts=100, gap 10 <= 30 → kept
    assert out[10] == ("a", 1.0, "keep-me")
    # lid=11: match at ts=200, gap 50 > 30 → attached cols nulled,
    # pre-existing asof_note preserved
    assert out[11] == (None, None, "keep-me")
    # lid=12: gap 50-60 = -10? left ts=50 precedes right 60 → no match
    assert out[12] == (None, None, "keep-me")


def test_asof_tolerance_ts_out_passthrough(spark):
    """ts_out forwarded through asof_join_tolerance attaches the
    matched right ts and obeys the staleness rule (nulled when the
    match is older than the tolerance)."""
    out = {
        r["lid"]: r["matched_at"]
        for r in asof_join_tolerance(
            _left(spark),
            _right(spark),
            on="k",
            tolerance=F.lit(30),
            left_ts="ts",
            right_ts="ts",
            ts_out="matched_at",
        ).collect()
    }
    assert out[10] == 90  # fresh match keeps its right ts
    assert out[11] is None  # stale match: ts nulled with the values
    assert out[12] is None  # no match at all


def test_asof_cogrouped_twin_equals_jvm_path(spark, sf_dir):
    """Two independent implementations, one contract: the cogrouped
    applyInPandas as-of (merge_asof per co-group) must equal the JVM
    union-sort-fill path row-for-row on real data — signups as the
    right side, every event as the left, per user."""
    from video_stream_processor_spark.io import load_table
    from video_stream_processor_spark.operators.asof import (
        asof_join,
        asof_join_cogrouped,
    )

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("user_id", "event_id", "ts_ns")
    right = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", F.col("event_id").alias("signup_id"), "ts_ns")
    )
    kw = dict(
        on="user_id", left_ts="ts_ns", right_ts="ts_ns",
        right_cols=["signup_id"], right_tiebreak="signup_id",
    )
    jvm = {
        (r["user_id"], r["event_id"]): r["asof_signup_id"]
        for r in asof_join(left, right, **kw).collect()
    }
    cog = {
        (r["user_id"], r["event_id"]): r["asof_signup_id"]
        for r in asof_join_cogrouped(left, right, **kw).collect()
    }
    assert len(jvm) == left.count()
    assert cog == jvm
