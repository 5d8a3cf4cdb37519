"""The reference pipeline re-expressed as one declarative DataFrame
graph (SURVEY §7 Phase 2).

Reference flow (video_processor.py:356-392): read links → dedup →
per-URL enrichment → validity filters → scalar derivations → 37-field
station record → JSON sink, with success/failure counters.

Spark flow (identical semantics, different execution):

    links ─ dropDuplicates ─ mapInPandas(U1 enrich) ─ observe(A2)
          ─ filter(P2 null-drop) ─ filter(P3 unresolved-url)
          ─ select(P1 projection of F1-F14 derivations)

The SAME function builds the batch and the streaming plan — every
operator here is streaming-compatible, so the 2-hour-cron semantics
(update-streams.yml:5-6) become ``trigger(availableNow=True)`` over a
file source with zero code change (T1/T2/T3).

Scale notes:
* dedup BEFORE enrichment — the reference's one optimization (set() at
  :330 ahead of the yt-dlp calls) becomes a convention Catalyst can't
  infer past a nondeterministic UDF (SURVEY §4.3).
* ``repartition`` after dedup spreads surviving URLs across executors
  so one slow batch of URLs doesn't serialize enrichment.
* All derivations are Column expressions *outside* the UDF — only the
  fetch itself crosses the Python boundary.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import scalar
from ..schemas import VIDEO_INFO_SCHEMA
from ..sources.extractor import Extractor, make_enrich_fn

ENRICHED_SCHEMA = "url string, " + ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in VIDEO_INFO_SCHEMA.fields
)


def enrich_links(
    links: DataFrame,
    extractor_factory: Callable[[], Extractor],
    dedup: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """S3/U1: dedup (O5, before the expensive call — :330), spread,
    enrich via Arrow-batched mapInPandas."""
    df = links
    if dedup:
        df = df.dropDuplicates(["url"])
    if partitions:
        df = df.repartition(partitions)
    return df.mapInPandas(make_enrich_fn(extractor_factory), schema=ENRICHED_SCHEMA)


def build_station_records(
    links: DataFrame,
    extractor_factory: Callable[[], Extractor],
    run_ts: dt.datetime | None = None,
    observation=None,
    partitions: int | None = None,
) -> DataFrame:
    """links(url) → 37-field station records (schemas.STATION_SCHEMA).

    ``run_ts``: the frozen 'current time' (SURVEY §4.3 determinism) —
    the reference stamps one wall-clock instant per record (:257).
    ``observation``: optional pyspark Observation (batch) or name
    (streaming) for A2 success/failure counters without a second pass.
    """
    if run_ts is None:
        run_ts = dt.datetime.now(dt.timezone.utc)
    enriched = enrich_links(links, extractor_factory, partitions=partitions)

    failed = F.col("stream_url").isNull()  # P2: enrichment returned null (:261-264)
    unresolved = F.col("stream_url").contains("youtube.com/watch")  # P3 (:270-273)
    if observation is not None:
        enriched = enriched.observe(
            observation,
            F.count(F.lit(1)).alias("n_input"),
            F.count(F.when(failed, 1)).alias("n_failed"),
            F.count(F.when((~failed) & unresolved, 1)).alias("n_unresolved"),
        )
    valid = enriched.filter(~failed).filter(~unresolved)

    # A naive-datetime literal would be converted OS-locally (PySpark's
    # TimestampType.toInternal uses time.mktime), shifting the frozen
    # instant on non-UTC hosts; a string parsed by the session (pinned
    # UTC in ensure_runtime_confs) is TZ-independent.
    if run_ts.tzinfo is not None:
        run_ts = run_ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    ts = F.to_timestamp(F.lit(run_ts.strftime("%Y-%m-%d %H:%M:%S.%f")))
    plain, iso = scalar.dual_timestamp(ts)
    lang = scalar.language("title")
    code = scalar.language_code("title")

    return valid.select(
        scalar.deterministic_uuid("url", "change").alias("changeuuid"),
        scalar.deterministic_uuid("url", "station").alias("stationuuid"),
        scalar.deterministic_uuid("url", "server").alias("serveruuid"),
        scalar.truncate80("title").alias("name"),
        F.col("url"),
        F.col("stream_url").alias("url_resolved"),
        F.lit("https://youtube.com").alias("homepage"),
        F.coalesce("thumbnail", F.lit("https://youtube.com/favicon.ico")).alias("favicon"),
        scalar.truncate80(scalar.title_tags("title")).alias("tags"),
        F.format_string("User Defined (%s Videos)", lang).alias("country"),
        code.alias("countrycode"),
        F.format_string("%s State", lang).alias("state"),
        lang.alias("language"),
        F.lower(code).substr(1, 2).alias("languagecodes"),
        F.lit(0).alias("votes"),
        plain.alias("lastchangetime"),
        iso.alias("lastchangetime_iso8601"),
        scalar.codec("stream_url").alias("codec"),
        scalar.bitrate("stream_url").alias("bitrate"),
        scalar.truncate80(scalar.safe_filename("title", "stream_url")).alias(
            "file_name_from_url"
        ),
        scalar.is_hls("stream_url").alias("hls"),
        F.lit(1).alias("lastcheckok"),
        plain.alias("lastchecktime"),
        iso.alias("lastchecktime_iso8601"),
        plain.alias("lastcheckoktime"),
        iso.alias("lastcheckoktime_iso8601"),
        plain.alias("lastlocalchecktime"),
        iso.alias("lastlocalchecktime_iso8601"),
        plain.alias("clicktimestamp"),
        iso.alias("clicktimestamp_iso8601"),
        F.lit(0).alias("clickcount"),
        F.lit(0).alias("clicktrend"),
        F.lit(0).alias("ssl_error"),
        F.lit(None).cast("double").alias("geo_lat"),
        F.lit(None).cast("double").alias("geo_long"),
        F.lit(None).cast("double").alias("geo_distance"),
        F.lit(False).alias("has_extended_info"),
    )


def station_quality_expr() -> Column:
    """lastcheckok as the reference defines validity (:303): 1 for every
    surviving record — exposed for sink-side verification counts."""
    return F.col("lastcheckok") == 1
