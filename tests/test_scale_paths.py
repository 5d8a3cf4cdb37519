"""Scale-path capability tests: bucketed co-located joins (the
pre-shuffle strategy for repeated big joins) and stream-stream joins
with watermarked time-range conditions (J6's streaming form).

These are the two §2 capabilities whose value only shows in the plan
shape, not in result values — so the assertions are plan assertions.
"""

from __future__ import annotations

import contextlib
import io
import uuid

import pytest
from pyspark.sql import functions as F

from video_stream_processor_spark.io import load_events_stream, load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides by the key lets the join read
    pre-hashed buckets: no Exchange above either scan. This is the
    100 TB answer for a fact table joined on the same key every day —
    pay the shuffle once at write time."""
    suffix = uuid.uuid4().hex[:8]  # tables land in the default warehouse; dropped in finally
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        f"li_b_{suffix}"
    )
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        f"o_b_{suffix}"
    )
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"li_b_{suffix}").join(
            spark.table(f"o_b_{suffix}"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS li_b_{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS o_b_{suffix}")


def test_partition_pruning_on_partitioned_layout(spark, sf_dir, tmp_path):
    """§4.2 partition pruning: a hive-partitioned layout (the 100 TB
    at-rest shape) turns an event_type predicate into PartitionFilters
    — the scan never opens other partitions' files."""
    from video_stream_processor_spark.pipeline.sink import write_partitioned

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = str(tmp_path / "ev_part")
    write_partitioned(ev, out, fmt="parquet", partition_by=["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = _plan(back)
    assert "PartitionFilters: [" in plan
    assert "purchase" in plan.split("PartitionFilters:", 1)[1][:200]
    assert back.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_runtime_bloom_filter_reduces_fact_scan(spark, sf_dir):
    """§4.2 runtime filters: when the dim side of a shuffle join has a
    selective predicate, Spark injects a bloom filter built from the
    dim keys into the FACT SCAN — at 100 TB this drops non-joining fact
    rows at the scan instead of carrying them through the shuffle.
    (Local test data is below the application-side threshold, so the
    thresholds are lowered to expose the plan shape; broadcast joins
    don't need it, hence autoBroadcastJoinThreshold=-1 — the exact
    cluster regime where both sides are too big to broadcast.)"""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy().agg(
            F.sum("l_quantity").alias("s")
        )
        plan = _plan(j)
        assert "might_contain" in plan, "runtime bloom filter not injected"
        # the filter must sit on the lineitem (application) side scan
        assert "bloom_filter_agg" in plan
        # and the result is unchanged by the filter
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        want = j.first()["s"]
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        assert j.first()["s"] == want
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_write_partitioned_file_sizing_and_clustering(spark, sf_dir, tmp_path):
    """§4.2 output shaping: maxRecordsPerFile splits oversized output
    files (splittable downstream scans), and cluster_by sorts within
    partitions so parquet min/max stats are tight per file chunk."""
    from video_stream_processor_spark.pipeline.sink import write_partitioned

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .coalesce(1)
    )
    n = ev.count()
    out = str(tmp_path / "ev_sized")
    write_partitioned(
        ev, out, fmt="parquet", max_records_per_file=n // 4 + 1,
        cluster_by=["event_id"],
    )
    import glob

    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 4  # one input partition still split by the cap
    back = spark.read.parquet(out)
    assert back.count() == n
    # clustering: each file's event_id range is tight (disjoint-ish),
    # so any single file spans well under the full id range
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        m = pq.read_metadata(f)
        lo = min(m.row_group(i).column(0).statistics.min for i in range(m.num_row_groups))
        hi = max(m.row_group(i).column(0).statistics.max for i in range(m.num_row_groups))
        spans.append((lo, hi))
    spans.sort()
    # sorted-within-partition output: consecutive files do not overlap
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_llm_text_ops_null_safe(spark):
    """Dedup/text ops must not throw on null/empty/whitespace text —
    the reality of any 100 TB crawl corpus."""
    from video_stream_processor_spark.llm import (
        exact_dedup_groups,
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
        text_quality_by_lang,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta", "en", "s", 27),
            (2, None, "en", "s", 0),
            (3, "", "en", "s", 0),
            (4, "   ", "en", "s", 3),
            (5, "single", "en", "s", 6),
            (6, "alpha beta gamma alpha beta", "en", "s", 27),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # no exceptions, and sane results
    groups = exact_dedup_groups(docs).collect()
    assert sum(r["n_copies"] for r in groups) == 6
    dup = [r for r in groups if r["n_copies"] == 2]
    assert len(dup) == 1 and dup[0]["survivor_id"] == 1
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 6)}
    mh = minhash_near_dup_pairs(docs, threshold=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in mh} == {(1, 6)}
    text_quality_by_lang(docs.filter(F.col("text").isNotNull())).collect()


def test_salted_join_equals_plain(spark, sf_dir):
    """Skew salting: the salted join returns exactly the plain join's
    rows (inner and left), with the hot key spread over `buckets`
    (key, salt) partitions instead of one."""
    from video_stream_processor_spark.operators.salt import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # simulate skew: collapse 90% of user_ids onto one hot key
    big = ev.withColumn(
        "user_id",
        F.when(F.col("user_id") % 10 != 0, F.lit(7)).otherwise(F.col("user_id")),
    )
    dim = (
        big.select("user_id").distinct().withColumn("user_tag", F.concat(F.lit("u"), "user_id"))
    )
    for how in ("inner", "left"):
        plain = big.join(dim, "user_id", how).select("event_id", "user_id", "user_tag")
        salted = salted_join(big, dim, "user_id", how=how).select(
            "event_id", "user_id", "user_tag"
        )
        a = sorted(map(tuple, plain.collect()))
        b = sorted(map(tuple, salted.collect()))
        assert a == b, how


def test_salted_join_rejects_replication_breaking_how(spark, sf_dir):
    """right/full/anti would see every small-side row `buckets` times —
    salted_join must refuse rather than silently multiply rows."""
    import pytest

    from video_stream_processor_spark.operators.salt import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = ev.select("user_id").distinct()
    for how in ("right", "full", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(ev, dim, "user_id", how=how)


def test_salted_join_spreads_duplicate_rows(spark):
    """Exact duplicate rows of a hot key must land in multiple salt
    buckets (the row-content-hash salt collapsed them into one)."""
    from video_stream_processor_spark.operators.salt import with_salt

    dup = spark.range(1).select(
        F.lit(7).alias("k"), F.lit("same").alias("v")
    )
    hot = dup.unionByName(dup)
    for _ in range(9):  # 2^10 = 1024 identical rows
        hot = hot.unionByName(hot)
    n_buckets = (
        with_salt(hot.repartition(8), "k", buckets=8)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets >= 2, "duplicate rows collapsed into one salt bucket"


def test_stream_stream_time_range_join(spark, sf_dir, tmp_path):
    """J6 streaming form: purchases joined to the same user's clicks
    within the preceding hour — two watermarked streams, equi-key +
    event-time range condition, append mode. Result must equal the
    batch twin of the identical join."""
    ev_s = load_events_stream(spark, sf_dir)
    clicks_s = ev_s.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    ).withWatermark("c_ts", "2 hours")
    buys_s = ev_s.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("b_id"),
    ).withWatermark("b_ts", "2 hours")
    cond = (
        (F.col("c_user") == F.col("b_user"))
        & (F.col("c_ts") >= F.col("b_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("b_ts"))
    )
    joined_s = buys_s.join(clicks_s, cond).select("b_user", "b_id", "c_id")

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined_s.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["b_user"], r["b_id"], r["c_id"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    ev_b = load_table(spark, sf_dir, "events")
    clicks_b = ev_b.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    buys_b = ev_b.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"), F.col("event_id").alias("b_id")
    )
    want = {
        (r["b_user"], r["b_id"], r["c_id"])
        for r in buys_b.join(clicks_b, cond).select("b_user", "b_id", "c_id").collect()
    }
    assert want, "batch twin should produce matches"
    assert got == want


def _with_confs(spark, confs: dict):
    """Set runtime SQL confs, returning the previous values."""
    old = {}
    for k, v in confs.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return old


def _restore_confs(spark, old: dict):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """The skew story beyond explicit salting: for skew AQE can see,
    the engine leans on OptimizeSkewedJoin — a hot key 50x the median
    partition gets split at runtime (SortMergeJoin(skew=true) +
    'AQEShuffleRead … skewed' in the final plan) with no manual
    salting. Thresholds are scaled down so local data exhibits the
    same shape a 100 TB hot key would."""
    old = _with_confs(
        spark,
        {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        hot = spark.range(100_000).select(
            F.lit(7).alias("k"),
            F.concat(F.lit("v" * 64), F.col("id").cast("string")).alias("pad"),
        )
        cold = spark.range(8_000).select(
            (F.col("id") % 1000 + 10).alias("k"),
            F.concat(F.lit("v" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(2_000).select(
            (F.col("id") % 1010).alias("k"), F.col("id").alias("rv")
        )
        j = hot.unionAll(cold).join(right, "k")
        n = len(j.collect())  # execute THIS plan: AQE finalizes on execution
        assert n == 215_840
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        _restore_confs(spark, old)


def _scan_output_rows(df) -> int:
    """numOutputRows of the (executed) parquet scan node — rows that
    survived row-group/page pruning, BEFORE Spark's row-level Filter."""
    from collections import deque

    q = deque([df._jdf.queryExecution().executedPlan()])
    while q:
        node = q.popleft()
        if "FileSourceScan" in node.getClass().getSimpleName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    return kv._2().value()
        for i in range(node.children().size()):
            q.append(node.children().apply(i))
    raise AssertionError("no FileSourceScan node found")


def test_sorted_layout_enables_rowgroup_skipping(spark, tmp_path):
    """Data layout IS a query optimization at 100 TB: the same range
    predicate over the same rows reads orders of magnitude less when
    files are range-clustered on the filter key (parquet min/max stats
    skip whole row groups) than when rows are scattered. Guards the
    write-side contract: repartitionByRange + sortWithinPartitions on
    the hot filter key before fact-table writes."""
    base = spark.range(300_000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("pad")
    )
    paths = {}
    for layout, df in [
        ("clustered", base.repartitionByRange(4, "k").sortWithinPartitions("k")),
        ("scattered", base.repartition(4).sortWithinPartitions("pad")),
    ]:
        paths[layout] = str(tmp_path / layout)
        # small row groups so a local file has many (stand-in for the
        # many-row-groups-per-file shape of real fact files)
        df.write.option("parquet.block.size", 64 * 1024).parquet(paths[layout])
    rows = {}
    for layout, path in paths.items():
        rd = spark.read.parquet(path).filter(
            (F.col("k") >= 150_000) & (F.col("k") < 151_000)
        )
        assert len(rd.collect()) == 1_000
        rows[layout] = _scan_output_rows(rd)
    assert rows["clustered"] < 10_000
    assert rows["scattered"] > 20 * rows["clustered"], rows
