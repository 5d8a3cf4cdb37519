"""Explicit StructTypes for every relation the engine touches.

Production paths never infer schemas (SURVEY §1.3); streaming file
sources *require* one. Test-table schemas verified against the parquet
footers of ``/root/testdata/sf0.001`` (FIXTURES.md §B).

The 37-field ``STATION_SCHEMA`` is the reference's output record —
field list and types from ``/root/reference/video_processor.py:281-319``
(ints for the 0/1 flags per :275,:303,:314; nullable doubles for the geo
fields per :315-317; bool only for ``has_extended_info`` per :318).
"""

from __future__ import annotations

from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


REGION_SCHEMA = _struct(("r_regionkey", T.IntegerType()), ("r_name", T.StringType()))

NATION_SCHEMA = _struct(
    ("n_nationkey", T.IntegerType()),
    ("n_name", T.StringType()),
    ("n_regionkey", T.IntegerType()),
)

CUSTOMER_SCHEMA = _struct(
    ("c_custkey", T.LongType()),
    ("c_name", T.StringType()),
    ("c_nationkey", T.IntegerType()),
    ("c_acctbal", T.DoubleType()),
    ("c_mktsegment", T.StringType()),
)

SUPPLIER_SCHEMA = _struct(
    ("s_suppkey", T.LongType()),
    ("s_name", T.StringType()),
    ("s_nationkey", T.IntegerType()),
    ("s_acctbal", T.DoubleType()),
)

PART_SCHEMA = _struct(
    ("p_partkey", T.LongType()),
    ("p_name", T.StringType()),
    ("p_brand", T.StringType()),
    ("p_type", T.StringType()),
    ("p_size", T.IntegerType()),
    ("p_retailprice", T.DoubleType()),
)

ORDERS_SCHEMA = _struct(
    ("o_orderkey", T.LongType()),
    ("o_custkey", T.LongType()),
    ("o_orderstatus", T.StringType()),
    ("o_totalprice", T.DoubleType()),
    ("o_orderdate", T.TimestampNTZType()),
    ("o_orderpriority", T.StringType()),
)

LINEITEM_SCHEMA = _struct(
    ("l_orderkey", T.LongType()),
    ("l_partkey", T.LongType()),
    ("l_suppkey", T.LongType()),
    ("l_linenumber", T.IntegerType()),
    ("l_quantity", T.DoubleType()),
    ("l_extendedprice", T.DoubleType()),
    ("l_discount", T.DoubleType()),
    ("l_tax", T.DoubleType()),
    ("l_returnflag", T.StringType()),
    ("l_linestatus", T.StringType()),
    ("l_shipdate", T.TimestampNTZType()),
)

# On-disk shape (verified via pyarrow.parquet.read_schema, 2026-08-13):
# ts is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark reads
# TIMESTAMP_NTZ. This is the *current-encoding* raw-read schema; batch
# reads infer from the footer, and streaming reads go through
# io._events_stream_schema, which swaps the ts field per the footer
# (older TIMESTAMP(NANOS) fixtures → bigint under nanosAsLong), so
# every historical encoding is readable on both paths.
EVENTS_RAW_SCHEMA = _struct(
    ("event_id", T.LongType()),
    ("ts", T.TimestampNTZType()),
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),  # JSON, e.g. '{"k": 87}'
)

# Normalized shape produced by io.load_table / io.load_events_stream:
# ts as TimestampType (micros, UTC), original nanos kept as ts_ns.
EVENTS_SCHEMA = _struct(
    ("event_id", T.LongType()),
    ("ts", T.TimestampType()),
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),
    ("ts_ns", T.LongType()),
)

DOCUMENTS_SCHEMA = _struct(
    ("doc_id", T.LongType()),
    ("text", T.StringType()),
    ("lang", T.StringType()),
    ("source", T.StringType()),
    ("n_chars", T.LongType()),
)

EMBEDDINGS_SCHEMA = _struct(
    ("vec_id", T.LongType()),
    ("embedding", T.ArrayType(T.FloatType())),
    ("label", T.IntegerType()),
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION_SCHEMA,
    "nation": NATION_SCHEMA,
    "customer": CUSTOMER_SCHEMA,
    "supplier": SUPPLIER_SCHEMA,
    "part": PART_SCHEMA,
    "orders": ORDERS_SCHEMA,
    "lineitem": LINEITEM_SCHEMA,
    "events": EVENTS_RAW_SCHEMA,
    "documents": DOCUMENTS_SCHEMA,
    "embeddings": EMBEDDINGS_SCHEMA,
}

# Reference input: one URL per line (video_processor.py:325-336).
LINKS_SCHEMA = _struct(("url", T.StringType()))

# Enrichment output: extract_video_info's 7 fields
# (video_processor.py:101-109); null struct ⇒ extraction failure (:180).
VIDEO_INFO_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("thumbnail", T.StringType(), True),
        T.StructField("stream_url", T.StringType(), True),
        T.StructField("duration", T.LongType(), True),
        T.StructField("uploader", T.StringType(), True),
        T.StructField("view_count", T.LongType(), True),
    ]
)

# Optional nested variant mirroring yt-dlp's formats list
# (video_processor.py:88-99) for the W1 "best format" selection.
FORMAT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("vcodec", T.StringType(), True),
        T.StructField("acodec", T.StringType(), True),
    ]
)

_STATION_FIELDS: list[tuple[str, T.DataType]] = [
    ("changeuuid", T.StringType()),
    ("stationuuid", T.StringType()),
    ("serveruuid", T.StringType()),
    ("name", T.StringType()),
    ("url", T.StringType()),
    ("url_resolved", T.StringType()),
    ("homepage", T.StringType()),
    ("favicon", T.StringType()),
    ("tags", T.StringType()),
    ("country", T.StringType()),
    ("countrycode", T.StringType()),
    ("state", T.StringType()),
    ("language", T.StringType()),
    ("languagecodes", T.StringType()),
    ("votes", T.IntegerType()),
    ("lastchangetime", T.StringType()),
    ("lastchangetime_iso8601", T.StringType()),
    ("codec", T.StringType()),
    ("bitrate", T.IntegerType()),
    ("file_name_from_url", T.StringType()),
    ("hls", T.IntegerType()),
    ("lastcheckok", T.IntegerType()),
    ("lastchecktime", T.StringType()),
    ("lastchecktime_iso8601", T.StringType()),
    ("lastcheckoktime", T.StringType()),
    ("lastcheckoktime_iso8601", T.StringType()),
    ("lastlocalchecktime", T.StringType()),
    ("lastlocalchecktime_iso8601", T.StringType()),
    ("clicktimestamp", T.StringType()),
    ("clicktimestamp_iso8601", T.StringType()),
    ("clickcount", T.IntegerType()),
    ("clicktrend", T.IntegerType()),
    ("ssl_error", T.IntegerType()),
    ("geo_lat", T.DoubleType()),
    ("geo_long", T.DoubleType()),
    ("geo_distance", T.DoubleType()),
    ("has_extended_info", T.BooleanType()),
]

STATION_SCHEMA = _struct(*_STATION_FIELDS)
STATION_COLUMNS = tuple(n for n, _ in _STATION_FIELDS)
