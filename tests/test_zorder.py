"""Z-order clustering (operators/zorder.py): key correctness vs a
Python reference, and the claim that matters — a Z-laid-out table's
parquet min/max statistics prune scans on EVERY clustered dimension,
where a linear sort only prunes its leading column. Pruning is
measured from the actual row-group statistics via pyarrow, not
asserted from prose."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from video_stream_processor_spark.operators.zorder import (
    interleave_bits,
    zorder_key_py,
    zorder_layout,
)
from video_stream_processor_spark.pipeline.sink import write_partitioned


def test_interleave_matches_python_reference(spark):
    vals = [0, 1, 2, 3, 7, 8, 100, 200, 255]
    rows = [(a, b, (a * 7 + b) % 256) for a in vals for b in vals]
    df = spark.createDataFrame(rows, "a: long, b: long, c: long")
    got = df.select(
        "a",
        "b",
        "c",
        interleave_bits([F.col("a"), F.col("b")], bits=8).alias("k2"),
        interleave_bits([F.col("a"), F.col("b"), F.col("c")], bits=8).alias("k3"),
    ).collect()
    for r in got:
        assert r["k2"] == zorder_key_py([r["a"], r["b"]], bits=8)
        assert r["k3"] == zorder_key_py([r["a"], r["b"], r["c"]], bits=8)


def test_interleave_rejects_long_overflow():
    with pytest.raises(ValueError):
        interleave_bits([F.col("a"), F.col("b")], bits=32)


def _rg_candidates(path_dir: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(row groups whose [min,max] overlaps [lo,hi], total row groups),
    straight from the parquet footers — what a stats-pruning scan reads."""
    cand = total = 0
    for f in sorted(glob.glob(f"{path_dir}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                cand += 1
    assert total > 0
    return cand, total


@pytest.fixture(scope="module")
def grid(spark):
    # 256x256 grid: u and h are independent uniform dimensions
    return spark.range(256 * 256).select(
        (F.col("id") % 256).alias("u"), (F.col("id") / 256).cast("long").alias("h")
    )


@pytest.fixture()
def exact_range_boundaries(spark):
    """Derandomize repartitionByRange for the layout under test.

    Range-exchange boundaries come from a ~100-rows-per-partition
    sample whose seed varies with JVM RDD ids, so the 16 curve
    segments drift run to run — the r7 full-suite flake (9 vs 8 of 16
    row groups overlapping the probe, passing in isolation). Raising
    the sample size above every input partition's row count makes the
    sketch exhaustive, so the boundaries are exact quantiles of the
    65536 distinct Morton keys: 16 segments of exactly 4096 keys =
    aligned 64x64 tiles, deterministically, without touching the
    operator."""
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "65536")
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_zorder_prunes_every_dimension_linear_only_leading(
    grid, tmp_path, exact_range_boundaries
):
    lin_dir = str(tmp_path / "linear")
    z_dir = str(tmp_path / "zorder")

    # linear layout: contiguous in u, each file spans ALL of h
    grid.repartitionByRange(16, "u").sortWithinPartitions("u").write.mode(
        "overwrite"
    ).parquet(lin_dir)
    # z-order layout: 16 curve segments = small (u, h) rectangles
    zorder_layout(grid, [F.col("u"), F.col("h")], bits=8, num_files=16).write.mode(
        "overwrite"
    ).parquet(z_dir)

    lin_u, lin_n = _rg_candidates(lin_dir, "u", 100, 107)
    lin_h, _ = _rg_candidates(lin_dir, "h", 100, 107)
    z_u, z_n = _rg_candidates(z_dir, "u", 100, 107)
    z_h, _ = _rg_candidates(z_dir, "h", 100, 107)

    # leading-column pruning works for both layouts (exact tiling:
    # u in [100,107] touches exactly the 4 tiles of the u=[64,127] band)
    assert lin_u <= lin_n // 4
    assert z_u <= z_n // 2
    # the non-leading dimension: linear prunes NOTHING, z-order does
    assert lin_h == lin_n
    assert z_h <= z_n // 2


def test_write_partitioned_zorder_by_roundtrip_and_prunes(
    grid, spark, tmp_path, exact_range_boundaries
):
    """The sink-level zorder_by path (min/max-bucketized Morton layout)
    preserves the data exactly and still beats linear on the
    non-leading dimension."""
    out = str(tmp_path / "sink_z")
    write_partitioned(grid, out, zorder_by=["u", "h"], zorder_files=16)
    back = spark.read.parquet(out)
    assert back.count() == 256 * 256
    assert back.agg(F.sum("u"), F.sum("h")).first() == grid.agg(
        F.sum("u"), F.sum("h")
    ).first()
    z_h, z_n = _rg_candidates(out, "h", 100, 107)
    assert z_h <= z_n // 2
    with pytest.raises(ValueError):
        write_partitioned(grid, out, cluster_by=["u"], zorder_by=["h"])

def _jobs_run(spark, group: str, fn) -> int:
    """Run fn under a job group and count the Spark jobs it launched."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_minmax_buckets_single_stats_pass(grid, spark):
    """The stats cost of a d-column Z-order layout is ONE min/max scan,
    not d (the N+1 shape ADVICE r4 flagged): bucketizing 2 columns
    launches exactly as many jobs as bucketizing 1, and precomputed
    ranges launch none."""
    from video_stream_processor_spark.operators.zorder import (
        minmax_bucket,
        minmax_buckets,
    )

    j1 = _jobs_run(spark, "z1", lambda: minmax_bucket(grid, "u"))
    j2 = _jobs_run(spark, "z2", lambda: minmax_buckets(grid, ["u", "h"]))
    assert j1 >= 1  # the scan actually happened
    assert j2 == j1  # ...and adding columns doesn't add scans
    j0 = _jobs_run(
        spark,
        "z0",
        lambda: minmax_buckets(
            grid, ["u", "h"], ranges={"u": (0, 255), "h": (0, 255)}
        ),
    )
    assert j0 == 0  # table-format-metadata path: no data access


def test_zorder_beats_cluster_by_on_second_dim_real_table(spark, sf_dir, tmp_path):
    """End-to-end on the real lineitem table, through the sink API both
    times: a predicate on the SECOND clustered dimension must scan
    fewer row groups under zorder_by than under the linear cluster_by
    layout (which only ever prunes its leading column). Pruning is
    measured from the written parquet footers — the min/max statistics
    a pruning reader actually consults."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    )
    lo, hi = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).first()
    span = max(hi - lo, 1)
    plo, phi = lo + int(span * 0.45), lo + int(span * 0.50)

    lin_dir = str(tmp_path / "lin")
    z_dir = str(tmp_path / "zord")
    # comparable layouts: same file count, same sink entry point
    write_partitioned(
        li.repartitionByRange(16, "l_partkey"),
        lin_dir,
        cluster_by=["l_partkey", "l_suppkey"],
    )
    write_partitioned(
        li, z_dir, zorder_by=["l_partkey", "l_suppkey"], zorder_files=16
    )

    lin_c, lin_n = _rg_candidates(lin_dir, "l_suppkey", plo, phi)
    z_c, z_n = _rg_candidates(z_dir, "l_suppkey", plo, phi)
    # linear: every file spans ~the full suppkey range -> no pruning
    assert lin_c / lin_n >= 0.9
    # z-order: the same predicate skips a real share of the row groups
    assert z_c / z_n <= 0.75
    assert z_c / z_n < lin_c / lin_n


def test_minmax_buckets_all_null_column_fails_loudly(spark):
    from video_stream_processor_spark.operators.zorder import minmax_buckets

    df = spark.range(10).select(
        F.col("id"), F.lit(None).cast("long").alias("n")
    )
    with pytest.raises(ValueError, match="no non-null values"):
        minmax_buckets(df, ["id", "n"])
