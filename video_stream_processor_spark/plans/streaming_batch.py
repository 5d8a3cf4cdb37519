"""Batch twins of the streaming analytics (SURVEY §2.8 T5-T8, J8).

Structured Streaming runs the *same* logical plan incrementally; these
registrations prove the plan's semantics against the DuckDB oracle in
batch mode, while tests/test_streaming.py proves stream==batch on the
replayed file source. Window bounds leave as epoch-second BIGINTs
(no raw timestamps — engine-portable hashing).

Reference parity: the reference's cron loop (update-streams.yml:4-10)
is T1-T3 (covered by pipeline/station + tests); the windowed surface
here is the north-star generalization over ``events``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..streaming.analytics import (
    session_stats,
    sliding_counts,
    tumbling_stats,
    windowed_to_flat,
)
from ..streaming.rollup import rollup_stats
from .base import register

EVENT_CATEGORIES = [
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "conversion"),
    ("signup", "conversion"),
    ("error", "problem"),
]


@register(
    "stream_window_counts",
    survey_ids="T6,T5,T10,T3,A3,A5,F17",
    oracle="""
WITH bucketed AS (
  SELECT value, CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS b
  FROM events
), expanded AS (
  SELECT value, b - js.j * 900 AS win_start
  FROM bucketed
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) js
), arr AS (
  SELECT event_id, event_type, value, epoch_ns(ts) AS tsn,
         epoch_ns(ts) + (event_id * 2654435761) % 1200 * 1000000000 AS ak
  FROM events
), tagged AS (
  SELECT tsn, event_type, value,
         CASE WHEN max(tsn) OVER (ORDER BY ak, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR tsn >= max(tsn) OVER (ORDER BY ak, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                - 600000000000
              THEN 1 ELSE 0 END AS kept
  FROM arr
)
SELECT 'tumbling_1h' AS kind,
       CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS win_start,
       CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) + 3600 AS win_end,
       event_type,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
       CASE WHEN count(value) = 0 THEN NULL
            ELSE (CASE WHEN sum(CAST(round(value * 100) AS BIGINT)) < 0
                       THEN -1 ELSE 1 END)
               * ((abs(sum(CAST(round(value * 100) AS BIGINT))) * 20000
                    + count(value))
                  // (2 * count(value))) / 1000000.0
       END AS avg_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 2, 3, 4
UNION ALL
SELECT 'sliding_1h_15m', win_start, win_start + 3600,
       NULL::VARCHAR,
       count(*),
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0,
       NULL::DOUBLE,
       NULL::BIGINT
FROM expanded
GROUP BY 2, 3
UNION ALL
SELECT 'tumbling_1h_wm10m',
       tsn // 3600000000000 * 3600,
       tsn // 3600000000000 * 3600 + 3600,
       event_type,
       CAST(sum(kept) AS BIGINT),
       round(sum(CASE WHEN kept = 1 THEN value ELSE 0.0 END), 2),
       NULL::DOUBLE,
       CAST(sum(1 - kept) AS BIGINT)
FROM tagged
GROUP BY 2, 3, 4
UNION ALL
SELECT 'rollup_1h',
       CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT),
       CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) + 3600,
       event_type,
       count(*),
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0,
       NULL::DOUBLE,
       1::BIGINT
FROM events
GROUP BY 2, 3, 4
UNION ALL
SELECT 'rollup_1d_derived',
       CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT),
       CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) + 86400,
       event_type,
       count(*),
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0,
       NULL::DOUBLE,
       1::BIGINT
FROM events
GROUP BY 2, 3, 4
""",
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6/T5/T10, three window shapes in one labeled result (batch
    twins of the streaming plans in streaming/analytics.py):

    * 'tumbling_1h': tumbling 1h × event_type stats;
    * 'sliding_1h_15m': sliding 1h/15m — each event expands to
      size/slide = 4 overlapping windows (a generator over the window
      expr + one hash aggregate; the oracle replicates via an explicit
      offset cross join);
    * 'tumbling_1h_wm10m': the watermark late-drop replay
      (``stream_watermark_late_drop``) — tumbling stats over the
      events that SURVIVE a 10-minute watermark under a deterministic
      jittered arrival order; in this leg the generic ``n_users``
      column carries the per-window count of late-DROPPED rows (typed
      slot reuse, labeled by ``kind``);
    * 'rollup_1h': the incrementally-maintained rollup table's
      aggregation (``streaming.rollup.rollup_stats`` — the exact
      builder both the streaming maintainer and the batch backfill
      write through), driver-oracle-evidenced here in batch form.
      n_events and the exact-cents sum_value check value-for-value;
      ``n_users_approx`` (since r7 the deterministic register-sketch
      estimate, operators/hll.py) is engine-specific, so — as in
      ``agg_counts_suite`` — the ``n_users`` slot carries the ERROR
      BOUND claim instead (1 iff the sketch lands within ±10% of the
      exact per-group distinct count; the oracle claims 1). The
      live==backfill equality itself is pinned in tests/test_rollup.py;
    * 'rollup_1d_derived': the day tier derived from the hour tier's
      persisted mergeable sketches (``coarsen_rollup``) — sums of sums
      exact vs the oracle's direct day recompute, merged-sketch
      estimate bound-checked against the true day distinct count.
    """
    # The raw events scan is deliberately NOT checkpoint-shared across
    # the legs (r16 negative probe): with the hour rollup tier
    # materialized (below — the change that pays), an in-query
    # localCheckpoint of the projected events measured FLAT vs six
    # direct parquet scans (5.0-6.0 s vs 5.0-5.3 s same-window at
    # sf0.1) — the 16 MB-split parquet scans are already cheap and the
    # checkpoint write+read just moves the bytes once more.
    from ..session import materialize

    ev = load_table(spark, sf_dir, "events")
    tum = tumbling_stats(ev, size="1 hour").select(
        F.lit("tumbling_1h").alias("kind"),
        "win_start",
        "win_end",
        "event_type",
        "n_events",
        "sum_value",
        "avg_value",
        "n_users",
    )
    sli = sliding_counts(ev, size="1 hour", slide="15 minutes").select(
        F.lit("sliding_1h_15m").alias("kind"),
        "win_start",
        "win_end",
        F.lit(None).cast("string").alias("event_type"),
        "n_events",
        "sum_value",
        F.lit(None).cast("double").alias("avg_value"),
        F.lit(None).cast("long").alias("n_users"),
    )
    wm = stream_watermark_late_drop(spark, sf_dir, events=ev).select(
        F.lit("tumbling_1h_wm10m").alias("kind"),
        "win_start",
        (F.col("win_start") + 3600).alias("win_end"),
        "event_type",
        "n_events",
        "sum_value",
        F.lit(None).cast("double").alias("avg_value"),
        F.col("n_late_dropped").alias("n_users"),
    )
    # rollup_1h: routed through the rollup table's own builder, with
    # the HLL estimate checked against an exact-distinct twin (null-safe
    # key join: a NULL event_type group is a legitimate rollup row).
    # The hour tier is materialized ONCE (r16): the day leg below
    # derives from it, and unmaterialized it re-ran the whole stage-1/
    # stage-2 sketch aggregation a second time (measured 1.9 s of the
    # query at sf0.1) — at scale the hour tier is a written table the
    # day derivation reads, which is exactly what this models.
    roll = materialize(rollup_stats(ev, size="1 hour"), "swc_roll")
    exact = windowed_to_flat(
        ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
            F.count_distinct("user_id").alias("_exact_users")
        )
    ).select(
        F.col("win_start").alias("_e_ws"),
        F.col("win_end").alias("_e_we"),
        F.col("event_type").alias("_e_et"),
        "_exact_users",
    )
    cond = (
        roll["win_start"].eqNullSafe(exact["_e_ws"])
        & roll["win_end"].eqNullSafe(exact["_e_we"])
        & roll["event_type"].eqNullSafe(exact["_e_et"])
    )
    rol = roll.join(exact, cond, "inner").select(
        F.lit("rollup_1h").alias("kind"),
        "win_start",
        "win_end",
        "event_type",
        "n_events",
        "sum_value",
        F.lit(None).cast("double").alias("avg_value"),
        F.col("n_users_approx")
        .between(
            F.floor(F.col("_exact_users") * 0.9).cast("long"),
            F.ceil(F.col("_exact_users") * 1.1).cast("long"),
        )
        .cast("long")
        .alias("n_users"),
    )
    # rollup_1d_derived: the day tier DERIVED from the hour tier's
    # mergeable sketches (streaming.rollup.coarsen_rollup) — no fact
    # rescan on the Spark side; the oracle recomputes the day grain
    # directly from events, so a hash match proves sums-of-sums
    # exactness AND (via the same ±10%-bound slot) that the MERGED
    # sketch's estimate tracks the true day-level distinct count.
    # Derived==direct byte equality is pinned in tests/test_rollup.py.
    from ..operators.hll import DEFAULT_P
    from ..streaming.rollup import coarsen_rollup

    # p is known statically here (roll was composed above with
    # rollup_stats' default); passing it keeps this builder a pure
    # plan — deriving it would probe the unexecuted aggregation with
    # an action at build time (r9 review finding)
    day = coarsen_rollup(roll, "1 day", p=DEFAULT_P)
    exact_day = windowed_to_flat(
        ev.groupBy(F.window("ts", "1 day"), "event_type").agg(
            F.count_distinct("user_id").alias("_exact_users")
        )
    ).select(
        F.col("win_start").alias("_e_ws"),
        F.col("win_end").alias("_e_we"),
        F.col("event_type").alias("_e_et"),
        "_exact_users",
    )
    cond_day = (
        day["win_start"].eqNullSafe(exact_day["_e_ws"])
        & day["win_end"].eqNullSafe(exact_day["_e_we"])
        & day["event_type"].eqNullSafe(exact_day["_e_et"])
    )
    rol_day = day.join(exact_day, cond_day, "inner").select(
        F.lit("rollup_1d_derived").alias("kind"),
        "win_start",
        "win_end",
        "event_type",
        "n_events",
        "sum_value",
        F.lit(None).cast("double").alias("avg_value"),
        F.col("n_users_approx")
        .between(
            F.floor(F.col("_exact_users") * 0.9).cast("long"),
            F.ceil(F.col("_exact_users") * 1.1).cast("long"),
        )
        .cast("long")
        .alias("n_users"),
    )
    return (
        tum.unionByName(sli)
        .unionByName(wm)
        .unionByName(rol)
        .unionByName(rol_day)
    )


@register(
    "stream_session_30m",
    survey_ids="T7,T9,W3",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sess
  FROM flagged
), islands AS (
  SELECT user_id, sess,
         epoch_us(min(ts)) AS start_us,
         epoch_us(max(ts)) AS last_us,
         count(*) AS n_events,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM numbered
  GROUP BY user_id, sess
)
SELECT 'session' AS part,
       start_us // 1000000 AS sess_start,
       (last_us + 1800000000) // 1000000 AS sess_end,
       user_id, n_events, cents / 100.0 AS sum_value
FROM islands
UNION ALL
SELECT 'sliced',
       start_us // 1000000,
       (last_us + 1800000000) // 1000000,
       user_id, n_events, cents / 100.0
FROM islands
UNION ALL
SELECT 'closed', start_us, last_us + 1800000000, user_id, n_events,
       NULL::DOUBLE
FROM islands
""",
)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7/T9 session windows (30m gap) per user, three labeled legs
    through three independent execution strategies that must agree:

    * 'session': `session_stats` — the `F.session_window` aggregation
      whose streaming form tests pin stream==batch; epoch-second
      bounds [first_ts, last_ts + gap).
    * 'sliced': `session_stats_sliced` — the time-slice-and-stitch
      hot-user escape (sessionize per (user, 6h-slice), stitch
      boundary sessions in a second pass over session summaries).
      Identical values by the equivalence argument in its docstring;
      hashing it against the same oracle proves the decomposition.
    * 'closed': `closed_sessions_batch` — the batch twin the T9
      arbitrary-stateful tests (`closed_user_sessions`,
      applyInPandasWithState) pin exact equality against; routed
      through that exact builder so the oracle evidences the
      semantics the stateful operator converges to. Epoch-µs bounds
      (the stateful path's native precision), no value sum.

    Oracle = classic gaps-and-islands (lag + running sum), proving
    the semantics rather than restating the API. The island split is
    `gap > 30m` (NOT >=): session_window merges an event landing
    exactly gap after the last one — probe-verified, pinned by the
    exact-gap case in tests/test_streaming.py."""
    from ..streaming.analytics import session_stats_sliced
    from ..streaming.stateful import closed_sessions_batch

    # NOT shared-scan-materialized (r16 negative probe, unlike
    # stream_window_counts): the three legs' event scans are cheap next
    # to their aggregations, and a same-window A/B showed the in-query
    # checkpoint saves nothing here (plain 0.93-1.28 s vs shared
    # 1.10-1.20 s noop at sf0.1, ordering noise dominating both).
    ev = load_table(spark, sf_dir, "events")
    base = session_stats(ev, gap="30 minutes").select(
        F.lit("session").alias("part"),
        "sess_start",
        "sess_end",
        "user_id",
        "n_events",
        "sum_value",
    )
    sliced = session_stats_sliced(
        ev, gap="30 minutes", time_slice="6 hours"
    ).select(
        F.lit("sliced").alias("part"),
        "sess_start",
        "sess_end",
        "user_id",
        "n_events",
        "sum_value",
    )
    closed = closed_sessions_batch(ev, gap="30 minutes").select(
        F.lit("closed").alias("part"),
        F.unix_micros("session_start").alias("sess_start"),
        F.unix_micros("session_end").alias("sess_end"),
        "user_id",
        "n_events",
        F.lit(None).cast("double").alias("sum_value"),
    )
    return base.unionByName(sliced).unionByName(closed)


@register(
    "stream_first_per_key",
    survey_ids="T8,O5,A8",
    oracle="""
SELECT user_id, event_type, first_ts_us, first_event_id, first_value
FROM (
  SELECT user_id, event_type,
         epoch_us(ts) AS first_ts_us,
         event_id AS first_event_id,
         round(value, 2) AS first_value,
         row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def stream_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup twin of T8: earliest event per (user,
    event_type) with an explicit (ts, event_id) tiebreak — unlike
    dropDuplicates' arbitrary survivor, this is oracle-checkable, and
    it is the semantics dropDuplicatesWithinWatermark converges to on
    an ordered replay."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.expr("ts_ns div 1000").alias("first_ts_us"),
            F.col("event_id").alias("first_event_id"),
            F.round("value", 2).alias("first_value"),
        )
    )


def stream_watermark_late_drop(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """T5/T10 driver evidence: watermark late-data semantics as a
    deterministic batch replay (the streaming engine's actual behavior
    is proven stream-side in tests/test_streaming.py::
    test_watermark_drops_late_data; this is its oracle-checkable twin).

    The fixture arrives ordered by event time, so lateness is injected
    with a deterministic per-event arrival jitter of 0-20 minutes
    (identical arithmetic in both engines). Replay semantics = the
    1-row-micro-batch limit of Spark's rule: the watermark is
    max(event time seen so far) - delay (10 min), and a row whose
    event time is older than the watermark at its arrival is dropped.
    Survivors aggregate into 1h tumbling windows; each window also
    reports how many of its rows were late-dropped.

    Scale note: the running max is a single global ordered window —
    right for an oracle-evidence query (arrival order is inherently a
    global sequence), but at 100 TB this form is a backfill audit run
    per arrival segment; the production path is the streaming engine's
    own watermark (``withWatermark``), which tracks the max per trigger
    without any global sort.

    Pass ``events`` to share a scan with other legs (r16:
    stream_window_counts feeds its one materialized pass here).
    """
    ev = load_table(spark, sf_dir, "events") if events is None else events
    ak = (
        F.col("ts_ns")
        + F.col("event_id") * F.lit(2654435761) % 1200 * F.lit(1_000_000_000)
    )
    w = Window.orderBy(ak, "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm0 = F.max("ts_ns").over(w)
    kept = (
        F.when(wm0.isNull() | (F.col("ts_ns") >= wm0 - F.lit(600_000_000_000)), 1)
        .otherwise(0)
    )
    tagged = ev.select("ts_ns", "event_type", "value", kept.alias("kept"))
    return tagged.groupBy(
        (F.expr("ts_ns div 3600000000000") * 3600).alias("win_start"),
        "event_type",
    ).agg(
        F.sum("kept").cast("bigint").alias("n_events"),
        F.round(
            F.sum(F.when(F.col("kept") == 1, F.col("value")).otherwise(0.0)), 2
        ).alias("sum_value"),
        F.sum(1 - F.col("kept")).cast("bigint").alias("n_late_dropped"),
    )


@register(
    "stream_static_join_categories",
    survey_ids="J8,J1,A3",
    oracle="""
SELECT d.category,
       count(*) AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e
JOIN (VALUES ('click','engagement'), ('view','engagement'),
             ('purchase','conversion'), ('signup','conversion'),
             ('error','problem')) AS d(event_type, category)
  ON e.event_type = d.event_type
GROUP BY d.category
""",
)
def stream_static_join_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 stream-static join shape: unbounded events × tiny static dim.
    The dim is broadcast — zero shuffle added to the stream side; the
    same join works unchanged under readStream (tests prove it)."""
    ev = load_table(spark, sf_dir, "events")
    # SQL VALUES → a JVM LocalRelation; createDataFrame(list) would ship
    # the rows through a Python RDD scan (a "Python" node in the plan)
    dim = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"('{et}', '{cat}')" for et, cat in EVENT_CATEGORIES)
        + " AS t(event_type, category)"
    )
    return (
        ev.join(F.broadcast(dim), "event_type")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
