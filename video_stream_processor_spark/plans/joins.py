"""Join surface (SURVEY §2.3 J3-J7): outer, semi/anti, cross-theta,
range, as-of. J1/J2 live in relational.py.

The reference has no relational join — its closest analogs are the
constant-dict lookups (video_processor.py:194-217, broadcast-join
degenerate form) and the stopword anti-membership test (:223). The
general surface is mandated by the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.asof import asof_join
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "join_outer_suite",
    survey_ids="J3,P6,A3",
    oracle="""
SELECT 'left' AS part,
       c.c_custkey AS key,
       c.c_mktsegment AS attr,
       count(o.o_orderkey) AS n1,
       NULL::BIGINT AS n2,
       round(coalesce(sum(o.o_totalprice), 0), 2) AS val
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY 2, 3
UNION ALL
SELECT 'full',
       coalesce(cn.nk, sn.nk),
       NULL::VARCHAR,
       coalesce(cn.n_cust, 0),
       coalesce(sn.n_supp, 0),
       NULL::DOUBLE
FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) cn
FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) sn
  ON cn.nk = sn.nk
""",
)
def join_outer_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer joins (J3), both shapes in one labeled result:

    * left outer + null-safe defaulting (P6): order-less customers
      survive with n_orders=0 — the J1 `.get(default)` idiom
      generalized;
    * full outer over PRE-AGGREGATED sides — aggregate-before-join
      keeps the outer-join input tiny regardless of base-table scale.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    left_leg = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(
            F.col("c_custkey").alias("key"),
            F.col("c_mktsegment").alias("attr"),
        )
        .agg(
            F.count("o_orderkey").alias("n1"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("val"),
        )
        .select(
            F.lit("left").alias("part"),
            "key",
            "attr",
            "n1",
            F.lit(None).cast("long").alias("n2"),
            "val",
        )
    )
    cn = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    full_leg = (
        cn.join(sn, cn.nk == sn.snk, "full")
        .select(
            F.lit("full").alias("part"),
            F.coalesce(F.col("nk"), F.col("snk")).cast("long").alias("key"),
            F.lit(None).cast("string").alias("attr"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n1"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n2"),
            F.lit(None).cast("double").alias("val"),
        )
    )
    return left_leg.unionByName(full_leg)


@register(
    "join_semi_anti",
    survey_ids="J4",
    oracle="""
SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment, 'has_urgent' AS bucket
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
UNION ALL
SELECT c.c_custkey, c.c_mktsegment, 'no_urgent'
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi (= EXISTS) and left anti (= NOT EXISTS) over the same
    membership predicate, labeled — every customer lands in exactly one
    bucket. No right-side columns ever materialize, so the probe side
    streams: the membership-test analog of the reference's stopword
    check (video_processor.py:223). The urgent predicate keeps the anti
    set non-trivial (every customer has *some* order in this data)."""
    c = _t(spark, sf_dir, "customer")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    base = lambda df, tag: df.select(  # noqa: E731
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(tag).alias("bucket"),
    )
    semi = base(c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi"), "has_urgent")
    anti = base(c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti"), "no_urgent")
    return semi.unionByName(anti)


@register(
    "join_cross_theta",
    survey_ids="J5",
    oracle="""
SELECT n.n_name AS nation, r.r_name AS region
FROM nation n CROSS JOIN region r
WHERE n.n_nationkey < r.r_regionkey * 3 AND n.n_regionkey <> r.r_regionkey
""",
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi theta on a cross join — Catalyst plans broadcast
    nested-loop; only sane when one side is dimension-sized, which is
    exactly how it's used here (25×5 rows)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.crossJoin(F.broadcast(r))
        .filter(
            (F.col("n_nationkey") < F.col("r_regionkey") * 3)
            & (F.col("n_regionkey") != F.col("r_regionkey"))
        )
        .select(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@register(
    "join_range_events",
    survey_ids="J6,J8,A3",
    oracle="""
SELECT 'range' AS part,
       a.event_id AS event_id,
       NULL::BIGINT AS other_id,
       count(b.event_id) AS n_follow,
       NULL::BIGINT AS latency_ns,
       NULL::DOUBLE AS val
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND epoch_ns(b.ts) > epoch_ns(a.ts)
 AND epoch_ns(b.ts) <= epoch_ns(a.ts) + 3600000000000
WHERE a.event_type = 'error'
GROUP BY 2
UNION ALL
SELECT 'attrib',
       s.event_id,
       p.event_id,
       NULL::BIGINT,
       epoch_ns(p.ts) - epoch_ns(s.ts),
       round(p.value, 2)
FROM events s
JOIN events p
  ON s.user_id = p.user_id
 AND epoch_ns(p.ts) > epoch_ns(s.ts)
 AND epoch_ns(p.ts) <= epoch_ns(s.ts) + 3600000000000
WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
""",
)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval joins, two labeled legs in one result:

    * ``range``: events within 1h after each error event of the same
      user. Equi-join on user_id carries the shuffle; the time range
      is a post-join filter — pairs explode only within a user, so
      cost is bounded by per-user activity, not table size.
      Comparisons use raw nanos (ts_ns) so sub-microsecond ordering
      matches the nanosecond-precision oracle exactly.
    * ``attrib``: the stream-stream interval join's batch twin (J8),
      routed through the SAME builder the streaming query runs —
      ``streaming.analytics.signup_purchase_attribution`` on batch
      relations — so the oracle hash-checks the exact code path whose
      streaming form `tests/test_streaming.py` pins equal to batch.
      One row per (signup, purchase-within-1h) pair per user.
    """
    from ..streaming.analytics import signup_purchase_attribution

    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"), F.col("user_id").alias("a_user"),
        F.col("ts_ns").alias("a_ns"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("b_user"),
        F.col("ts_ns").alias("b_ns"),
    )
    hour_ns = 3_600_000_000_000
    range_leg = (
        a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ns") > F.col("a_ns"))
            & (F.col("b_ns") <= F.col("a_ns") + hour_ns),
            "left",
        )
        .groupBy(F.col("a_id").alias("event_id"))
        .agg(F.count("b_id").alias("n_follow"))
        .select(
            F.lit("range").alias("part"),
            "event_id",
            F.lit(None).cast("long").alias("other_id"),
            "n_follow",
            F.lit(None).cast("long").alias("latency_ns"),
            F.lit(None).cast("double").alias("val"),
        )
    )
    attrib = signup_purchase_attribution(
        ev.filter(F.col("event_type") == "signup"),
        ev.filter(F.col("event_type") == "purchase"),
        horizon="1 hour",
    )
    attrib_leg = attrib.select(
        F.lit("attrib").alias("part"),
        F.col("signup_id").alias("event_id"),
        F.col("purchase_id").alias("other_id"),
        F.lit(None).cast("long").alias("n_follow"),
        "latency_ns",
        F.col("purchase_value").alias("val"),
    )
    return range_leg.unionByName(attrib_leg)


@register(
    "join_asof_signup",
    survey_ids="J7,W3",
    oracle="""
WITH u AS (
  SELECT user_id, epoch_ns(ts) AS tsn, event_id, NULL::BIGINT AS signup_id, 1 AS is_left
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, epoch_ns(ts), NULL, event_id, 0
  FROM events WHERE event_type = 'signup'
), f AS (
  SELECT event_id, is_left,
         last_value(signup_id IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY tsn ASC, is_left ASC, coalesce(signup_id, -1) ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS signup_event_id
  FROM u
)
SELECT event_id, signup_event_id FROM f WHERE is_left = 1
""",
)
def join_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via operators.asof_join (union–sort–fill, one shuffle,
    no pair blowup): each purchase event gets the latest at-or-before
    signup of the same user; purchases before any signup get null."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ns"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id"), F.col("ts_ns"), F.col("event_id").alias("signup_src")
    )
    joined = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts_ns",
        right_ts="ts_ns",
        right_cols=["signup_src"],
        right_tiebreak="signup_src",
    )
    return joined.select(
        "event_id", F.col("asof_signup_src").alias("signup_event_id")
    )


@register(
    "join_asof_tolerance",
    survey_ids="J7,W3",
    oracle="""
WITH u AS (
  SELECT user_id, epoch_ns(ts) AS tsn, event_id, NULL::BIGINT AS signup_id, 1 AS is_left
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, epoch_ns(ts), NULL, event_id, 0
  FROM events WHERE event_type = 'signup'
), f AS (
  SELECT event_id, is_left, tsn,
         last_value(signup_id IGNORE NULLS) OVER w AS sig_id,
         last_value(CASE WHEN is_left = 0 THEN tsn END IGNORE NULLS) OVER w
           AS sig_tsn
  FROM u
  WINDOW w AS (
    PARTITION BY user_id
    ORDER BY tsn ASC, is_left ASC, coalesce(signup_id, -1) ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  )
)
SELECT event_id,
       CASE WHEN sig_tsn >= tsn - 604800000000000 THEN sig_id END
         AS signup_event_id
FROM f WHERE is_left = 1
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (pandas merge_asof
    ``tolerance=``): each purchase gets its user's latest at-or-before
    signup ONLY if that signup is within 7 days — older matches are
    nulled (1740 of 1791 matches survive at sf0.01; 51 null out). Same
    union–sort–fill plan as join_asof_signup plus one post-fill
    conditional — no extra shuffle. The oracle fills the matched
    signup's id and timestamp in the same window (signup rows never
    carry NULLs, so per-column fill equals the struct fill) and applies
    the identical staleness predicate."""
    from ..operators.asof import asof_join_tolerance

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ns"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id"), F.col("ts_ns"), F.col("event_id").alias("signup_src")
    )
    joined = asof_join_tolerance(
        purchases,
        signups,
        on="user_id",
        tolerance=F.lit(7 * 86_400_000_000_000),
        left_ts="ts_ns",
        right_ts="ts_ns",
        right_cols=["signup_src"],
        right_tiebreak="signup_src",
    )
    return joined.select("event_id", F.col("asof_signup_src").alias("signup_event_id"))


@register(
    "join_salted_skew",
    survey_ids="J2,A3",
    oracle="""
SELECT o.o_orderpriority AS priority,
       count(*)          AS n_items,
       round(sum(l.l_extendedprice), 2) AS gross
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 skew path THROUGH the correctness gate: lineitem⋈orders
    executed with operators/salt.salted_join (deterministic salt on the
    big side, small side exploded across salt values) — the oracle is
    the plain join, proving salting is a pure physical rewrite. For the
    pathological hot key AQE's runtime split can't fix."""
    from ..operators.salt import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, on="l_orderkey", buckets=8)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
        )
    )
