"""Scalar-function suites over the test tables
(SURVEY §2.7 F11-F17, §2.2 P5/P6).

The reference's own scalar derivations (F3-F14) are exercised for
parity in plans/station.py and tests/test_functions.py; these queries
cover the general JSON / math / string / datetime / conditional surface
the driver oracle mandates. All expressions are built-in Column ops —
whole-stage-codegen'd, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "json_extract_props",
    survey_ids="F15,P6",
    oracle="""
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  coalesce(json_extract_string(props, '$.missing'), 'none') AS missing_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
""",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column, with
    null-safe defaulting for absent paths. get_json_object evaluates
    JVM-side; for repeated multi-key extraction prefer from_json once
    into a struct (single parse) — both stay in codegen."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.filter(k.isNotNull())
        .select(
            "event_id",
            k.cast("long").alias("k"),
            F.coalesce(F.get_json_object("props", "$.missing"), F.lit("none")).alias(
                "missing_k"
            ),
        )
    )


@register(
    "scalar_math_suite",
    survey_ids="F16,A3",
    oracle="""
SELECT
  l_returnflag                                    AS flag,
  round(sum(sqrt(l_quantity)), 2)                 AS sum_sqrt_qty,
  round(sum(abs(l_discount - 0.05)), 4)           AS sum_abs_disc,
  round(sum(pow(1 + l_tax, 2)), 2)                AS sum_pow_tax,
  round(sum(ln(l_extendedprice)), 4)              AS sum_ln_price,
  round(sum(floor(l_quantity) + ceil(l_discount * 10)), 2) AS sum_floor_ceil
FROM lineitem
GROUP BY 1
""",
)
def scalar_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt/abs/pow/ln/floor/ceil under aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.round(F.sum(F.sqrt("l_quantity")), 2).alias("sum_sqrt_qty"),
            F.round(F.sum(F.abs(F.col("l_discount") - 0.05)), 4).alias("sum_abs_disc"),
            F.round(F.sum(F.pow(F.lit(1) + F.col("l_tax"), 2)), 2).alias("sum_pow_tax"),
            F.round(F.sum(F.log(F.col("l_extendedprice"))), 4).alias("sum_ln_price"),
            # Spark floor/ceil yield LONG vs DuckDB's DOUBLE — cast to
            # double so the summed output types agree.
            F.round(
                F.sum(
                    (F.floor("l_quantity") + F.ceil(F.col("l_discount") * 10)).cast(
                        "double"
                    )
                ),
                2,
            ).alias("sum_floor_ceil"),
        )
    )


@register(
    "scalar_string_suite",
    survey_ids="F11,F12,F13",
    oracle="""
SELECT
  c_custkey                                   AS custkey,
  upper(c_name)                               AS name_upper,
  lower(substring(c_mktsegment, 1, 3))        AS seg3,
  length(c_name)                              AS name_len,
  printf('%s#%05d', c_mktsegment, c_custkey)  AS seg_tag,
  replace(c_name, 'Customer', 'C')            AS name_short,
  lpad(CAST(c_nationkey AS VARCHAR), 4, '0')  AS nation_pad
FROM customer
WHERE c_custkey <= 500
""",
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/length/format/replace/lpad — the reference's
    truncate-and-format idioms (:285,:291,:295) generalized."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") <= 500)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.upper("c_name").alias("name_upper"),
            F.lower(F.substring("c_mktsegment", 1, 3)).alias("seg3"),
            F.length("c_name").alias("name_len"),
            F.format_string("%s#%05d", F.col("c_mktsegment"), F.col("c_custkey")).alias(
                "seg_tag"
            ),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("name_short"),
            F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_pad"),
        )
    )


@register(
    "scalar_datetime_suite",
    survey_ids="F17,F2",
    oracle="""
SELECT
  o_orderkey,
  year(o_orderdate)                                         AS yy,
  month(o_orderdate)                                        AS mm,
  day(o_orderdate)                                          AS dd,
  quarter(o_orderdate)                                      AS qq,
  isodow(o_orderdate)                                       AS dow_iso,
  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')      AS plus3m,
  CAST(epoch(o_orderdate) AS BIGINT)                        AS epoch_s
FROM orders
WHERE o_orderkey <= 2000
""",
)
def scalar_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/iso-weekday/datediff/add_months/epoch.
    ISO weekday = Spark weekday()+1 (Mon=0 → Mon=1); epoch of the NTZ
    orderdate goes through an explicit UTC-pinned cast so the rendered
    integer is timezone-independent."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.year(d).alias("yy"),
            F.month(d).alias("mm"),
            F.dayofmonth(d).alias("dd"),
            F.quarter(d).alias("qq"),
            (F.weekday(d) + 1).alias("dow_iso"),
            F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
                "days_since"
            ),
            F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
            d.cast("timestamp").cast("long").alias("epoch_s"),
        )
    )


@register(
    "case_when_classify",
    survey_ids="P5,P6,F14,A3",
    oracle="""
SELECT
  CASE
    WHEN event_type = 'error' THEN 'err'
    WHEN event_type = 'purchase' AND value >= 50 THEN 'big_purchase'
    WHEN event_type = 'purchase' THEN 'small_purchase'
    ELSE 'other'
  END                     AS bucket,
  count(*)                AS n,
  round(sum(value), 2)    AS sum_value
FROM events
GROUP BY 1
""",
)
def case_when_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained conditional classification — the F14 error-taxonomy /
    P5 flag-derivation shape over the events stream table."""
    ev = _t(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("event_type") == "error", "err")
        .when((F.col("event_type") == "purchase") & (F.col("value") >= 50), "big_purchase")
        .when(F.col("event_type") == "purchase", "small_purchase")
        .otherwise("other")
    )
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "array_indexing_suite",
    survey_ids="O2,F6",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
  FROM documents
)
SELECT doc_id,
       len(t)                        AS n_tok,
       t[1]                          AS first_tok,
       t[-1]                         AS last_tok,
       array_to_string(t[1:3], ' ')  AS head3
FROM toks
""",
)
def array_indexing_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: positive and NEGATIVE array indexing plus slicing — the
    reference's path.split('.')[-1] idiom (video_processor.py:186-192)
    generalized. try_element_at returns NULL out-of-range, matching
    DuckDB list semantics under ANSI mode."""
    d = _t(spark, sf_dir, "documents")
    t = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    return d.select(
        "doc_id",
        F.size(t).alias("n_tok"),
        F.try_element_at(t, F.lit(1)).alias("first_tok"),
        F.try_element_at(t, F.lit(-1)).alias("last_tok"),
        F.concat_ws(" ", F.slice(t, 1, 3)).alias("head3"),
    )


@register(
    "corpus_counts",
    survey_ids="A1",
    oracle="""
SELECT 'documents' AS tbl, count(*) AS n FROM documents
UNION ALL SELECT 'events', count(*) FROM events
UNION ALL SELECT 'orders', count(*) FROM orders
""",
)
def corpus_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: plain record counting per table — the reference's processed/
    failed run summary (video_processor.py:385-388) as a metadata-only
    aggregate (parquet count(*) answers from footer statistics)."""
    parts = [
        _t(spark, sf_dir, tbl)
        .groupBy(F.lit(tbl).alias("tbl"))
        .agg(F.count(F.lit(1)).alias("n"))
        for tbl in ("documents", "events", "orders")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
