"""SURVEY §3.4 entry point 1 — ``spark.sql`` over registered views —
plus the §4.2 optimizations only SQL syntax exercises: GROUPING SETS
and subquery decorrelation (correlated scalar + EXISTS).

The oracle strings are near-identical ANSI SQL run by DuckDB — the
point of these registrations is that the SAME declarative text drives
two engines to the same answer, with Catalyst decorrelating the
subqueries into joins (RewriteCorrelatedScalarSubquery) rather than
executing them per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from .base import register

_VIEWS = ("lineitem", "orders", "customer", "nation")


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in _VIEWS:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"vsp_{name}")


@register(
    "sql_grouping_sets",
    survey_ids="A6,A3,F16",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT)
         AS grp_id,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
""",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 via SQL GROUPING SETS (rollup/cube cover the builder API;
    this is the general mixed-set form) + grouping() disambiguation of
    NULL-as-total vs NULL-as-value."""
    _register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT)
         AS grp_id,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS sum_price
FROM vsp_lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
"""
    )


@register(
    "sql_subquery_suite",
    survey_ids="J2,J4,A3,P7",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
         AS n_orders
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey < 500
  AND EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
  )
""",
)
def sql_subquery_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery decorrelation, both forms in ONE statement: a
    correlated scalar subquery in the projection (Catalyst rewrites to
    a left outer aggregate join — never per-row execution; count(*)=0
    comes back as 0, not NULL) and an EXISTS predicate (planned as a
    left semi join). DuckDB decorrelates identically, so the same
    declarative text drives both engines to the same answer."""
    _register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       (SELECT count(*) FROM vsp_orders o WHERE o.o_custkey = c.c_custkey)
         AS n_orders
FROM vsp_customer c JOIN vsp_nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey < 500
  AND EXISTS (
    SELECT 1 FROM vsp_orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
  )
"""
    )
