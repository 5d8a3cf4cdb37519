"""SURVEY §2.9 registrations — the Python-boundary surface beyond U1
(which lives in pipeline/station): U2 pandas UDAF, U3 Python UDTF, U4
grouped-map applyInPandas.

Design rule: Python only where the semantics genuinely need imperative
per-group logic; everything here is Arrow-batched (never row-pickled),
and each query has a pure-SQL oracle proving the Python path computes
exactly what the declarative twin would.

Scale notes: pandas GROUPED_AGG and applyInPandas shuffle once on the
group key and stream Arrow batches per group; group size bounds memory
(per-user event counts here), the same A7-style hazard as collect_list
— documented, bounded for these keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .base import register

# NB: pandas_udf decoration happens INSIDE the builders — the decorator
# resolves its return type against the active session, and this module
# is imported on executors (it rides the shipped package zip), where no
# session exists.


@register(
    "udaf_weighted_avg",
    survey_ids="U2,A3",
    oracle="""
SELECT event_type,
       round(sum(value * ((event_id % 100) + 1))
             / sum((event_id % 100) + 1), 6) AS wavg_value,
       count(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: pandas GROUPED_AGG UDAF — weighted mean of value with a
    deterministic per-event weight; the SQL oracle is the declarative
    twin (sum(v*w)/sum(w)), proving the Arrow path bit-for-bit."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:  # GROUPED_AGG
        return float((v * w).sum() / w.sum())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:  # Spark disallows mixing pandas
        return len(v)  # and JVM aggregates in one groupBy

    ev = load_table(spark, sf_dir, "events").withColumn(
        "w", (F.col("event_id") % 100 + 1).cast("double")
    )
    return ev.groupBy("event_type").agg(
        F.round(weighted_avg("value", "w"), 6).alias("wavg_value"),
        n_rows("value").alias("n_events"),
    )


_ZSCORE_SCHEMA = "user_id bigint, event_id bigint, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user standardization — the canonical 'needs the whole group
    in one place' shape (ddof=0 == SQL stddev_pop)."""
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=0)
    z = (pdf["value"] - mu) / sd if sd > 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "zscore": z.round(6)}
    )


@register(
    "grouped_map_zscore",
    survey_ids="U4,W4",
    oracle="""
SELECT user_id, event_id,
       round(CASE WHEN stddev_pop(value) OVER w > 0
                  THEN (value - avg(value) OVER w) / stddev_pop(value) OVER w
                  ELSE 0.0 END, 6) AS zscore
FROM events
WINDOW w AS (PARTITION BY user_id)
""",
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: applyInPandas grouped map — per-user z-scores. The oracle is
    the pure-window SQL twin; for THIS op the window form is what you'd
    ship (stays in the JVM) — the grouped map exists to prove the
    general escape hatch for logic windows can't express."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return ev.groupBy("user_id").applyInPandas(_zscore_group, schema=_ZSCORE_SCHEMA)


@register(
    "py_udtf_tokenize",
    survey_ids="U3,F6",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
  FROM documents
)
SELECT doc_id, i AS pos, t[i] AS token, length(t[i]) AS token_len
FROM toks, unnest(generate_series(1, len(t))) AS u(i)
WHERE doc_id < 100
""",
)
def py_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: Python UDTF (Spark >=3.5) — one doc row -> one row per token
    with 1-based position. ``explode`` covers this natively (and is what
    production should use — the oracle IS that shape); the UDTF proves
    the general table-function seam for logic explode can't express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string, token_len int")
    class Tokenize:
        def eval(self, doc_id: int, text: str):  # noqa: D401
            pos = 0
            for tok in text.split(" "):
                if tok == "":
                    continue
                pos += 1
                yield doc_id, pos, tok, len(tok)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    spark.udtf.register("vsp_tokenize", Tokenize)
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token, t.token_len "
        "FROM _udtf_docs, LATERAL vsp_tokenize(doc_id, text) t"
    )
