"""SURVEY §7 Phase 2 registration — the reference pipeline end-to-end
as a driver-visible query.

Covers in one graph: S1 (link scan semantics), O5 (dedup before the
expensive call — video_processor.py:330), U1 (Arrow-batched enrichment
with the deterministic stub extractor), P2/P3 (validity filters),
F1-F14 (scalar derivations), P1 (37-field projection).

Oracle-checked end to end: the stub enrichment is a pure function of
md5(url), so the ENTIRE pipeline — including the Python mapInPandas
stage — is replicated as one DuckDB SQL statement (STATION_ORACLE) and
all 38 output columns hash-match. tests/test_station.py additionally
pins golden outputs and the streaming twin.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.station import build_station_records
from ..session import ensure_runtime_confs
from ..sources.extractor import StubExtractor
from .base import register

RUN_TS = dt.datetime(2026, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc)
N_LINKS = 64


STATION_ORACLE = """
WITH consts AS (
  SELECT ['chellame','rhymes','kids','super','hit','melody','classic',
          'dance','paattu','story','tamil','hindi','english','telugu',
          'malayalam','kannada','song','official','video','hd'] AS words,
         ['m4a','mp3','m3u8','webm','ogg','aac'] AS exts
), links AS (
  SELECT 'https://www.youtube.com/watch?v=vid' || CAST(i AS VARCHAR) AS url
  FROM range(64) t(i)
), hashed AS (
  SELECT url, md5(url) AS h FROM links
), fields AS (
  SELECT url, h,
         CAST(concat('0x', substr(h, 1, 2)) AS INT) AS b0,
         words[(CAST(concat('0x', substr(h, 3, 2)) AS INT) % 20) + 1] AS w1,
         words[(CAST(concat('0x', substr(h, 5, 2)) AS INT) % 20) + 1] AS w2,
         words[(CAST(concat('0x', substr(h, 7, 2)) AS INT) % 20) + 1] AS w3,
         words[(CAST(concat('0x', substr(h, 9, 2)) AS INT) % 20) + 1] AS w4,
         exts[(CAST(concat('0x', substr(h, 3, 2)) AS INT) % 6) + 1] AS extn,
         CAST(concat('0x', substr(h, 5, 2)) AS INT) % 4 AS cdn,
         substr(h, 7, 8) AS pathid,
         CAST(concat('0x', substr(h, 15, 4)) AS INT) AS expire
  FROM hashed, consts
), survivors AS (
  SELECT url,
         concat(upper(substr(w1, 1, 1)), substr(w1, 2), ' ',
                upper(substr(w2, 1, 1)), substr(w2, 2), ' ',
                upper(substr(w3, 1, 1)), substr(w3, 2), ' ',
                upper(substr(w4, 1, 1)), substr(w4, 2)) AS title,
         concat(w1, ' ', w2, ' ', w3, ' ', w4) AS ltitle,
         [w1, w2, w3, w4] AS wlist,
         concat('https://cdn', cdn, '.example.com/audio/', pathid, '.',
                extn, '?expire=', expire) AS stream_url,
         concat('https://i.example.com/', substr(h, 19, 8),
                '/default.jpg') AS thumb,
         extn, h
  FROM fields
  WHERE b0 % 16 NOT IN (0, 1)
), lang AS (
  SELECT *,
         CASE WHEN contains(ltitle,'tamil') OR contains(ltitle,'tamizh')
                   OR contains(ltitle,'tam') THEN 'Tamil'
              WHEN contains(ltitle,'hindi') OR contains(ltitle,'hind')
                   THEN 'Hindi'
              WHEN contains(ltitle,'english') OR contains(ltitle,'eng')
                   THEN 'English'
              WHEN contains(ltitle,'telugu') OR contains(ltitle,'tel')
                   THEN 'Telugu'
              WHEN contains(ltitle,'malayalam') OR contains(ltitle,'mal')
                   THEN 'Malayalam'
              WHEN contains(ltitle,'kannada') OR contains(ltitle,'kan')
                   THEN 'Kannada'
              ELSE 'Tamil' END AS language,
         CASE WHEN contains(ltitle,'tamil') OR contains(ltitle,'tamizh')
                   OR contains(ltitle,'tam') THEN 'TAMIL'
              WHEN contains(ltitle,'hindi') OR contains(ltitle,'hind')
                   THEN 'HINDI'
              WHEN contains(ltitle,'english') OR contains(ltitle,'eng')
                   THEN 'ENGLI'
              WHEN contains(ltitle,'telugu') OR contains(ltitle,'tel')
                   THEN 'TELUG'
              WHEN contains(ltitle,'malayalam') OR contains(ltitle,'mal')
                   THEN 'MALAY'
              WHEN contains(ltitle,'kannada') OR contains(ltitle,'kan')
                   THEN 'KANNA'
              ELSE 'TAMIL' END AS languagecode
  FROM survivors
)
SELECT
  concat_ws('-', substr(md5(url || chr(31) || 'change'), 1, 8),
                 substr(md5(url || chr(31) || 'change'), 9, 4),
                 substr(md5(url || chr(31) || 'change'), 13, 4),
                 substr(md5(url || chr(31) || 'change'), 17, 4),
                 substr(md5(url || chr(31) || 'change'), 21, 12)) AS changeuuid,
  concat_ws('-', substr(md5(url || chr(31) || 'station'), 1, 8),
                 substr(md5(url || chr(31) || 'station'), 9, 4),
                 substr(md5(url || chr(31) || 'station'), 13, 4),
                 substr(md5(url || chr(31) || 'station'), 17, 4),
                 substr(md5(url || chr(31) || 'station'), 21, 12)) AS stationuuid,
  concat_ws('-', substr(md5(url || chr(31) || 'server'), 1, 8),
                 substr(md5(url || chr(31) || 'server'), 9, 4),
                 substr(md5(url || chr(31) || 'server'), 13, 4),
                 substr(md5(url || chr(31) || 'server'), 17, 4),
                 substr(md5(url || chr(31) || 'server'), 21, 12)) AS serveruuid,
  substr(title, 1, 80) AS name,
  url,
  stream_url AS url_resolved,
  'https://youtube.com' AS homepage,
  thumb AS favicon,
  coalesce(substr(array_to_string(list_filter(wlist,
      x -> length(x) > 2 AND x NOT IN
        ('the','and','or','but','in','on','at','to','for','of',
         'with','by','official','video','audio','hd','tamil','song')),
    ','), 1, 80), '') AS tags,
  concat('User Defined (', language, ' Videos)') AS country,
  languagecode AS countrycode,
  concat(language, ' State') AS state,
  language,
  substr(lower(languagecode), 1, 2) AS languagecodes,
  0 AS votes,
  '2026-01-01T00:00:00' AS lastchangetime,
  '2026-01-01T00:00:00Z' AS lastchangetime_iso8601,
  CASE extn WHEN 'm4a' THEN 'MP4A' WHEN 'mp3' THEN 'MP3'
            WHEN 'aac' THEN 'AAC' WHEN 'webm' THEN 'OPUS'
            WHEN 'ogg' THEN 'OGG' WHEN 'm3u8' THEN 'HLS'
            ELSE 'MP4A' END AS codec,
  128 AS bitrate,
  substr(concat(regexp_replace(title, '[-\\s]+', '_', 'g'), '.', extn),
         1, 80) AS file_name_from_url,
  CAST(contains(stream_url, '.m3u8') AS INT) AS hls,
  1 AS lastcheckok,
  '2026-01-01T00:00:00' AS lastchecktime,
  '2026-01-01T00:00:00Z' AS lastchecktime_iso8601,
  '2026-01-01T00:00:00' AS lastcheckoktime,
  '2026-01-01T00:00:00Z' AS lastcheckoktime_iso8601,
  '2026-01-01T00:00:00' AS lastlocalchecktime,
  '2026-01-01T00:00:00Z' AS lastlocalchecktime_iso8601,
  '2026-01-01T00:00:00' AS clicktimestamp,
  '2026-01-01T00:00:00Z' AS clicktimestamp_iso8601,
  0 AS clickcount,
  0 AS clicktrend,
  0 AS ssl_error,
  CAST(NULL AS DOUBLE) AS geo_lat,
  CAST(NULL AS DOUBLE) AS geo_long,
  CAST(NULL AS DOUBLE) AS geo_distance,
  FALSE AS has_extended_info
FROM lang
"""


@register(
    "station_pipeline",
    survey_ids="S1,S3,O5,U1,P1,P2,P3,F1-F14",
    oracle=STATION_ORACLE,
)
def station_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline (links -> dedup -> enrich -> validate ->
    37-field station records) on a deterministic synthetic link set:
    fully reproducible (seeded stub extractor + frozen run_ts +
    md5-derived uuids), ~1/16 enrichment failures and ~1/16 unresolved
    URLs exercise the P2/P3 drop paths. The DuckDB oracle replays the
    whole chain — extractor arithmetic included — in SQL."""
    # No load_table in this builder — ship the package + set confs
    # explicitly (the enrichment mapInPandas unpickles module functions
    # on executors).
    ensure_runtime_confs(spark)
    links = spark.range(N_LINKS).select(
        F.concat(F.lit("https://www.youtube.com/watch?v=vid"), F.col("id")).alias("url")
    )
    return build_station_records(
        links, StubExtractor, run_ts=RUN_TS, partitions=8
    )
