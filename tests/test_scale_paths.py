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
