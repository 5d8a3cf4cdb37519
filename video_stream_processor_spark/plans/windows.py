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
    "win_suite",
    survey_ids="W2,W3,W4,F17",
    oracle="""
SELECT
  o_orderkey,
  o_custkey,
  row_number() OVER wr AS rn,
  rank()       OVER wr AS rnk,
  dense_rank() OVER wr AS drnk,
  ntile(4)     OVER wr AS quartile,
  round(sum(o_totalprice) OVER (
    wt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
  round(avg(o_totalprice) OVER (
    wt ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
  round(lag(o_totalprice) OVER wt, 2)                AS prev_price,
  lead(o_orderkey) OVER wt                           AS next_key,
  CAST(datediff('day',
    CAST(lag(o_orderdate) OVER wt AS DATE),
    CAST(o_orderdate AS DATE)) AS INT)               AS gap_days,
  first_value(o_orderkey) OVER (
    wt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key
FROM orders
WINDOW
  wr AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
  wt AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
)
def win_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated window surface over each customer's order
    timeline, two window specs:

    * ranking (W2): row_number / rank / dense_rank / ntile by spend;
    * frames (W4): running total (unbounded preceding) + 3-row moving
      average;
    * offsets (W3 + F17): lag/lead/first_value along the date ordering,
      incl. the day-gap between consecutive orders.

    Both specs share the o_custkey partition key, so Spark plans ONE
    hash shuffle and two in-partition sorts — adding window functions
    to an existing spec is free of extra exchanges (the property that
    matters when stacking per-entity features at 100 TB)."""
    o = _t(spark, sf_dir, "orders")
    wr = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    ordering = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    wt = Window.partitionBy("o_custkey").orderBy(*ordering)
    run = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = wt.rowsBetween(-2, 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(wr).alias("rn"),
        F.rank().over(wr).alias("rnk"),
        F.dense_rank().over(wr).alias("drnk"),
        F.ntile(4).over(wr).alias("quartile"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(mov), 6).alias("moving_avg3"),
        F.round(F.lag("o_totalprice").over(wt), 2).alias("prev_price"),
        F.lead("o_orderkey").over(wt).alias("next_key"),
        F.datediff(d.cast("date"), F.lag(d).over(wt).cast("date")).alias(
            "gap_days"
        ),
        F.first("o_orderkey").over(run).alias("first_key"),
    )
