"""Window functions (SURVEY §2.5 W1-W5).

W1 mirrors the reference's "best audio format" pick
(video_processor.py:88-99): a preference-ordered top-1 per group,
expressed as row_number over a composite ordering instead of a Python
loop over a list. Every ordering below is a *total* order (explicit
tiebreak keys) so results replay identically on any engine.

Scale: one hash shuffle + sort per distinct (partitionBy, orderBy)
pair; partition keys here (customer, user, order) are high-cardinality,
so windows parallelize across executors. Low-cardinality partitions
(e.g. a single global window) would serialize — avoided by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "win_top1_per_group",
    survey_ids="W1,A8",
    oracle="""
SELECT l_orderkey, l_partkey, round(l_extendedprice, 2) AS best_price
FROM (
  SELECT l_orderkey, l_partkey, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_extendedprice DESC, l_linenumber DESC
         ) AS rn
  FROM lineitem
)
WHERE rn = 1
""",
)
def win_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-ordered top-1 per order — the W1 'best format' shape:
    highest price wins, later line breaks ties (reference takes the
    *last* preferred format, video_processor.py:94,96,99)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").desc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            "l_partkey",
            F.round("l_extendedprice", 2).alias("best_price"),
        )
    )


@register(
    "win_ranking",
    survey_ids="W2",
    oracle="""
SELECT
  o_orderkey,
  o_custkey,
  row_number() OVER w AS rn,
  rank()       OVER w AS rnk,
  dense_rank() OVER w AS drnk,
  ntile(4)     OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per customer by spend."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    survey_ids="W3,F17",
    oracle="""
SELECT
  event_id,
  user_id,
  (epoch_ns(ts) - lag(epoch_ns(ts)) OVER w) // 1000000000 AS gap_s,
  lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) ASC, event_id ASC)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead along each user's event timeline (sessionization
    primitive, W3); nanos arithmetic keeps both engines integer-exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ns").asc(), F.col("event_id").asc()
    )
    gap = F.floor((F.col("ts_ns") - F.lag("ts_ns").over(w)) / F.lit(1_000_000_000))
    return ev.select(
        "event_id",
        "user_id",
        gap.alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "win_frames",
    survey_ids="W4",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  round(sum(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
  round(avg(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3
FROM orders
""",
)
def win_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame specs: running total (unbounded-preceding) + 3-row moving
    average per customer timeline."""
    o = _t(spark, sf_dir, "orders")
    ordering = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    run = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mov = Window.partitionBy("o_custkey").orderBy(*ordering).rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(mov), 6).alias("moving_avg3"),
    )


@register(
    "win_percentiles",
    survey_ids="W5,A3",
    oracle="""
SELECT
  c_mktsegment                                   AS segment,
  round(quantile_cont(c_acctbal, 0.5), 6)        AS median_bal,
  round(quantile_cont(c_acctbal, 0.9), 6)        AS p90_bal,
  round(min(c_acctbal), 2)                       AS min_bal,
  round(max(c_acctbal), 2)                       AS max_bal
FROM customer
GROUP BY 1
""",
)
def win_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per segment. At 100 TB the exact
    form needs a per-group sort; swap to percentile_approx (t-digest,
    mergeable, single pass) when error tolerance allows — kept exact
    here because the oracle is exact."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(F.percentile("c_acctbal", 0.5), 6).alias("median_bal"),
            F.round(F.percentile("c_acctbal", 0.9), 6).alias("p90_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )
