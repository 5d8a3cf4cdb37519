"""Relational core queries (SURVEY §2.2 P*, §2.3 J1-J5, §2.4 A*, §2.7 F15-F17).

Each query is one declarative DataFrame plan — Catalyst handles pushdown,
pruning, join selection (broadcast for the small dims), and partial→final
aggregation. Scale notes are per-query where they matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1 shape — scan → filter → hash agg (partial+final) → sort.
# Reference analogs: P7 predicate, A3 grouped agg, F16 math, O3 sort.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    survey_ids="S9,P7,A3,F16,F17,O3",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 6)                                        AS avg_qty,
  round(avg(l_extendedprice), 6)                                   AS avg_price,
  round(avg(l_discount), 6)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary over lineitem (flagship; smoke-checked by entry()).

    100 TB: hash aggregate over 2 low-cardinality keys — map-side partial
    aggregation collapses each partition to ≤ ~6 rows before the shuffle,
    so the exchange is O(partitions), not O(rows). The shipdate predicate
    and 7-column projection push to the parquet scan.
    """
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02 00:00:00").cast(li.schema["l_shipdate"].dataType)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# P7: general predicates (BETWEEN / IN / LIKE / IS NOT NULL) + projection.
# --------------------------------------------------------------------------
# NOT registered: S9/P7 driver evidence comes from q1_pricing_summary —
# this builder stays for the pushdown/pruning plan test and the bench mix
# (the ≤50-entry registry keeps the driver's CORRECTNESS window covering
# every registered query).
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate suite on orders; every conjunct pushes to the parquet
    scan (PushedFilters), projection prunes to 5 columns (ReadSchema)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_totalprice").between(50000, 200000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_orderstatus").like("F%")
            & F.col("o_custkey").isNotNull()
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("total_price"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


# --------------------------------------------------------------------------
# J1: broadcast hash join against a small dimension.
# Reference analog: the literal codec/bitrate dict lookups
# (video_processor.py:194-217) are degenerate broadcast joins.
# --------------------------------------------------------------------------
# NOT registered: J1 driver evidence comes from join_revenue_by_nation
# and stream_static_join_categories (registry ≤50 consolidation); kept
# for tests/bench.
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × small dim: explicit broadcast(part) — no shuffle of the
    100 TB fact side; the dim ships to every executor once."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# J2: multi-way inner equi-join (TPC-H Q5 shape) across the star schema.
# --------------------------------------------------------------------------
@register(
    "join_revenue_by_nation",
    survey_ids="J2,J1,A3,O3",
    oracle="""
SELECT
  n.n_name                                              AS nation,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
  count(*)                                              AS n_items
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'AMERICA')
GROUP BY n.n_name
ORDER BY revenue DESC
""",
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with EAGER AGGREGATION: lineitem pre-aggregates per
    l_orderkey BEFORE the join (an optimization Catalyst does not do
    itself), so the one big shuffle carries one 2-column partial row
    per order instead of every full-width lineitem row (~4x fewer rows
    here; the win grows with lineitems-per-order at scale). The
    orderkey join then REUSES the groupBy's hash partitioning — on a
    cluster only the orders side shuffles for it. nation/region are
    hint-broadcast (fixed-size dims, scale-invariant); the customer-
    derived dim is NOT hinted — it is O(customers), so the planner/AQE
    picks broadcast only while it actually fits under the threshold
    (it does at every test SF) and degrades to a shuffle join at 100 TB
    instead of OOMing the executors. Results are identical to the plain
    join→agg form (the oracle states that form).
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "AMERICA"))
        .select("c_custkey", "n_name")
    )
    li_agg = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li_agg.join(o, li_agg.l_orderkey == o.o_orderkey)
        .join(dim, o.o_custkey == dim.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.sum("cnt").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


# --------------------------------------------------------------------------
# A3/A4/A5: grouped agg with distinct + approx-distinct side by side.
# --------------------------------------------------------------------------
@register(
    "agg_orders_by_month",
    survey_ids="A3,A4,F17",
    oracle="""
SELECT
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
  o_orderstatus                                  AS status,
  count(*)                                       AS n_orders,
  count(DISTINCT o_custkey)                      AS n_customers,
  round(sum(o_totalprice), 2)                    AS sum_price,
  round(min(o_totalprice), 2)                    AS min_price,
  round(max(o_totalprice), 2)                    AS max_price
FROM orders
GROUP BY 1, 2
""",
)
def agg_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped agg incl. count(distinct): Spark expands distinct into a
    two-phase aggregate; non-distinct metrics still get map-side partial
    aggregation. date_trunc keeps the key low-cardinality."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "order_month"
            ),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )
