"""Sorts, limits, dedup, set ops, multi-dim aggregates
(SURVEY §2.6 O1-O7, §2.4 A4-A8).

O5 generalizes the reference's ``list(set(links))`` dedup
(video_processor.py:330); O6 its per-batch append accumulation (:370);
A7 the tag accumulation (:219-224); A8 the best-format argmax (:88-99).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "sort_topk_offset",
    survey_ids="O3,O4,O1",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25 OFFSET 10
""",
)
def sort_topk_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with offset. Spark fuses orderBy+limit into
    TakeOrderedAndProject — each partition keeps only its local top
    (k+offset), the driver merges; no global sort materializes. Total
    order via the orderkey tiebreak."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
    )


@register(
    "dedup_distinct_pairs",
    survey_ids="O5,A4",
    oracle="""
SELECT DISTINCT c_nationkey AS nationkey, c_mktsegment AS segment
FROM customer
""",
)
def dedup_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup = set semantics on a projection (the reference's
    set() dedup generalized). Plans as a hash aggregate with map-side
    partial dedup before the shuffle."""
    return (
        _t(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .distinct()
    )


@register(
    "set_union_distinct",
    survey_ids="O6,O5",
    oracle="""
SELECT o_orderkey, o_orderpriority AS priority FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 200000
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two filtered scans via unionByName+distinct."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority")
    )
    big = o.filter(F.col("o_totalprice") > 200000).select(
        "o_orderkey", F.col("o_orderpriority").alias("priority")
    )
    return urgent.unionByName(big).distinct()


@register(
    "set_intersect_except",
    survey_ids="O7",
    oracle="""
WITH c97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'),
     c98 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00')
SELECT o_custkey AS custkey, 'both' AS bucket FROM (SELECT * FROM c97 INTERSECT SELECT * FROM c98)
UNION ALL
SELECT o_custkey, 'only_1997' FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c98)
""",
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT of yearly active-customer sets, labeled.
    (exceptAll/intersect also power S8-style snapshot change detection.)"""
    o = _t(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        lo = F.lit(f"{year}-01-01 00:00:00").cast(o.schema["o_orderdate"].dataType)
        hi = F.lit(f"{year + 1}-01-01 00:00:00").cast(o.schema["o_orderdate"].dataType)
        return (
            o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .select("o_custkey")
            .distinct()
        )

    c97, c98 = active(1997), active(1998)
    both = c97.intersect(c98).select(F.col("o_custkey").alias("custkey"), F.lit("both").alias("bucket"))
    only97 = c97.exceptAll(c98).select(F.col("o_custkey").alias("custkey"), F.lit("only_1997").alias("bucket"))
    return both.unionByName(only97)


@register(
    "agg_rollup",
    survey_ids="A6,A3",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  GROUPING(l_returnflag, l_linestatus) AS gid,
  count(*) AS n,
  round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id — subtotals per flag and a grand total in
    one pass (Spark expands to a single Expand+hash-agg, not N scans)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


@register(
    "agg_cube",
    survey_ids="A6,A3",
    oracle="""
SELECT
  o_orderstatus,
  o_orderpriority,
  GROUPING(o_orderstatus, o_orderpriority) AS gid,
  count(*) AS n,
  round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status×priority: all 4 grouping sets in one pass."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")
    )


@register(
    "agg_collect_set",
    survey_ids="A7",
    oracle="""
SELECT
  c_nationkey AS nationkey,
  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
  count(*) AS n_cust
FROM customer
GROUP BY 1
""",
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set per group, sorted and joined for deterministic
    output. Bounded-group-only at scale (SURVEY §7 watch list): fine for
    ≤5 segments per nation; never for unbounded value sets — use
    approx/top-k instead."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@register(
    "agg_argmax",
    survey_ids="A8",
    oracle="""
SELECT
  c_mktsegment AS segment,
  max_by(c_name, round(c_acctbal * 100) * 1000000 + c_custkey) AS top_customer,
  round(max(c_acctbal), 2) AS top_bal
FROM customer
GROUP BY 1
""",
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by (argmax) — the reference's 'take the best element' shape
    (:88-99) as a single-pass aggregate. Ranking key encodes
    (acctbal, custkey) into one exact integer so ties break identically
    in both engines (acctbal has 2 decimals; custkey < 1e6)."""
    c = _t(spark, sf_dir, "customer")
    rank_key = (F.round(F.col("c_acctbal") * 100) * 1_000_000 + F.col("c_custkey")).cast(
        "long"
    )
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.max_by("c_name", rank_key).alias("top_customer"),
            F.round(F.max("c_acctbal"), 2).alias("top_bal"),
        )
    )


@register(
    "agg_approx_distinct",
    survey_ids="A5",
    oracle=None,  # HLL++ sketch values are engine-specific → rows-only check;
    # tests/test_setops.py bounds the estimate against the exact count.
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=2%) beside the exact count.
    The sketch is mergeable — at 100 TB it replaces the two-phase
    distinct shuffle with constant-size partial state."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("etype"))
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
