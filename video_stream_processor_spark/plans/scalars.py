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
    "scalar_suite",
    survey_ids="F16,F11,F12,F13,F17,F2",
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
  CAST(epoch(o_orderdate) AS BIGINT)                        AS epoch_s,
  upper(o_orderpriority)                                    AS prio_upper,
  lower(substring(o_orderpriority, 1, 3))                   AS prio3,
  length(o_orderpriority)                                   AS prio_len,
  printf('%s#%05d', o_orderstatus, o_orderkey)              AS status_tag,
  replace(o_orderpriority, 'URGENT', 'U')                   AS prio_short,
  lpad(CAST(o_custkey AS VARCHAR), 7, '0')                  AS cust_pad,
  round(sqrt(o_totalprice), 6)                              AS sqrt_price,
  round(abs(o_totalprice - 150000), 2)                      AS abs_diff,
  round(pow(1 + o_totalprice / 1000000, 2), 6)              AS pow_price,
  round(ln(o_totalprice), 6)                                AS ln_price,
  CAST(floor(o_totalprice) + ceil(o_totalprice / 1000) AS BIGINT)
                                                            AS floor_ceil
FROM orders
WHERE o_orderkey <= 2000
""",
)
def scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated scalar surface, one per-row pass over orders:

    * datetime (F17/F2): year/month/day/quarter/iso-weekday/datediff/
      add_months/epoch. ISO weekday = Spark weekday()+1; epoch of the
      NTZ orderdate goes through an explicit UTC-pinned cast so the
      rendered integer is timezone-independent.
    * strings (F11-F13): upper/lower/substring/length/format/replace/
      lpad — the reference's truncate-and-format idioms (:285,:291,
      :295) generalized.
    * math (F16): sqrt/abs/pow/ln/floor/ceil. Spark floor/ceil yield
      LONG vs DuckDB DOUBLE — the combined expression casts to BIGINT
      on both engines.

    Every expression is a built-in Column op — one whole-stage-codegen
    span, no shuffle (the narrow-transform ideal the 100 TB row path
    wants)."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    p = F.col("o_totalprice")
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
            F.upper("o_orderpriority").alias("prio_upper"),
            F.lower(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
            F.length("o_orderpriority").alias("prio_len"),
            F.format_string(
                "%s#%05d", F.col("o_orderstatus"), F.col("o_orderkey")
            ).alias("status_tag"),
            F.replace(
                F.col("o_orderpriority"), F.lit("URGENT"), F.lit("U")
            ).alias("prio_short"),
            F.lpad(F.col("o_custkey").cast("string"), 7, "0").alias("cust_pad"),
            F.round(F.sqrt(p), 6).alias("sqrt_price"),
            F.round(F.abs(p - 150000), 2).alias("abs_diff"),
            F.round(F.pow(F.lit(1) + p / 1_000_000, 2), 6).alias("pow_price"),
            F.round(F.log(p), 6).alias("ln_price"),
            (F.floor(p) + F.ceil(p / 1000)).cast("long").alias("floor_ceil"),
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


# corpus counting (A1) lives in setops.agg_counts_suite (merged with the
# approx-distinct surface so the ≤50-entry registry keeps both evidenced).
