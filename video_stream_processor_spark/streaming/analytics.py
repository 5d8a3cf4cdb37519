"""Windowed / stateful event analytics — one builder, two execution
modes (batch relation or unbounded stream).

Reference parity: the reference's only "streaming" is a 2-hour-cron
full recompute (update-streams.yml:4-10); the general windowed surface
(T5-T8, T10) is north-star mandated. All builders take the normalized
``events`` shape (io.load_table / io.load_events_stream).

Scale notes (100 TB):
* Watermarks bound state: without them a streaming groupBy keeps every
  window forever. Every streaming caller passes ``watermark=...``.
* Window aggregation shuffles once on (window, keys) — partial
  aggregation happens map-side automatically, so the shuffle carries
  one row per (window, key) per input partition, not per event.
* ``session_window`` state is per key; skewed users are the hazard —
  AQE skew handling covers the batch twin, and the watermark caps the
  streaming state lifetime. Partial aggregation still applies (gap
  merging is associative), so a hot user costs one merged row per
  input partition on the shuffle wire, not one per event — measured
  flat-or-falling under a 40%-of-events hot user (SCALE.md x8skew).
  A user hot enough to overwhelm the single reducer that merges their
  partials cannot be salted (all of a user's rows must meet to merge
  gaps); the escape is pre-slicing the timeline — sessionize within
  coarse (user, time-slice) groups, then stitch the few
  slice-boundary sessions whose gap spans a cut in a second, tiny
  pass: `session_stats_sliced`, equivalence-pinned against
  `session_stats` including a 40%-hot-user corpus
  (tests/test_streaming.py). At that severity one user exceeding an
  executor's share of a 100 TB day is also a data-quality signal
  (bot traffic) — but the engine no longer falls over on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _maybe_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    """T5: bound event-time state; no-op for batch relations."""
    if watermark is not None and events.isStreaming:
        return events.withWatermark("ts", watermark)
    return events


_INTERVAL_UNIT_NS = {
    "microsecond": 1_000,
    "millisecond": 1_000_000,
    "second": 1_000_000_000,
    "minute": 60_000_000_000,
    "hour": 3_600_000_000_000,
    "day": 86_400_000_000_000,
    "week": 604_800_000_000_000,
}


def interval_ns(interval: str) -> int:
    """Parse a Spark interval string ("1 hour", "90 minutes",
    "1 day 6 hours") to nanoseconds — same grammar as the join
    condition's ``INTERVAL`` literal, including its rejection of
    fractional quantities ("1.5 hours" fails in Spark too; pinned
    equal to Spark's own parser in tests)."""
    parts = interval.strip().lower().split()
    if not parts or len(parts) % 2:
        raise ValueError(f"unparseable interval: {interval!r}")
    total = 0
    for qty, unit in zip(parts[::2], parts[1::2]):
        unit = unit.rstrip("s")
        if unit not in _INTERVAL_UNIT_NS:
            raise ValueError(f"unknown interval unit {unit!r} in {interval!r}")
        if not qty.isdigit():
            raise ValueError(
                f"non-integer quantity {qty!r} in {interval!r} "
                "(Spark INTERVAL literals reject fractional parts)"
            )
        total += int(qty) * _INTERVAL_UNIT_NS[unit]
    return total


def windowed_to_flat(df: DataFrame) -> DataFrame:
    """Flatten the struct ``window`` column to epoch-second bounds so
    results hash identically across engines (no raw timestamps out)."""
    return df.select(
        F.unix_timestamp(F.col("window.start")).alias("win_start"),
        F.unix_timestamp(F.col("window.end")).alias("win_end"),
        *[c for c in df.columns if c != "window"],
    ).drop("window")


def tumbling_stats(
    events: DataFrame,
    size: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """T6 tumbling: per (window, event_type) count + value stats.

    ``n_users``: exact ``count_distinct`` in batch; streaming
    aggregations cannot hold per-group distinct sets incrementally, so
    the streaming path uses HLL++ ``approx_count_distinct`` (A5) — the
    same trade Spark mandates and the right one at 100 TB anyway.
    """
    distinct_users = (
        F.approx_count_distinct("user_id")
        if events.isStreaming
        else F.count_distinct("user_id")
    )
    w = _maybe_watermark(events, watermark)
    # value is money (2 decimals): aggregate EXACT integer cents, not
    # doubles. Float sums depend on addition order (micro-batches vs
    # one batch) and engines disagree on round() ties — avg over a
    # power-of-2 count of 2-decimal values lands exactly on x.xxxxxx5,
    # where Spark's BigDecimal HALF_UP and DuckDB's double math split
    # (caught by the sf0.1 rehearsal, 30/10083 rows). Integer cents
    # sum identically in any order; the 6-dp average is BIGINT math,
    # so streaming, batch, and the DuckDB oracle are bit-identical by
    # construction. Three hazards the formula handles explicitly:
    # * NULL values: sum() and count("value") both skip NULLs, so the
    #   average keeps SQL AVG semantics (dividing by count(*) would
    #   silently treat NULLs as zeros);
    # * negative money (refunds): `div` truncates toward zero in Spark
    #   but `//` floors in DuckDB — they disagree on negatives, so the
    #   rounding runs on abs() (half-away-from-zero, engine-identical)
    #   and the sign is re-applied;
    # * overflow: |cents| * 20000 wraps a LONG silently (ANSI off)
    #   past ~4.6e14 cents (~$4.6e12 per group). The guard is a
    #   post-aggregation check on the handful of group rows, not a
    #   per-event cost; past it, fail loudly instead of emitting a
    #   wrapped average.
    cents = F.round(F.col("value") * 100).cast("long")
    agg = w.groupBy(F.window("ts", size), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("_cents"),
        F.count("value").alias("_n_vals"),
        distinct_users.alias("n_users"),
    )
    avg_6dp = F.expr(
        "CASE WHEN _n_vals = 0 THEN CAST(NULL AS DOUBLE)"
        " WHEN abs(_cents) > 461000000000000 THEN"
        "  raise_error('tumbling_stats: |cents sum| exceeds avg overflow"
        " headroom (~4.6e14); aggregate at a finer grain')"
        " ELSE (CASE WHEN _cents < 0 THEN -1 ELSE 1 END)"
        "  * ((abs(_cents) * 20000 + _n_vals) div (2 * _n_vals)) / 1e6 "
        "END"
    )
    return windowed_to_flat(agg).select(
        "win_start",
        "win_end",
        "event_type",
        "n_events",
        (F.col("_cents") / 100.0).alias("sum_value"),
        avg_6dp.alias("avg_value"),
        "n_users",
    )


def sliding_counts(
    events: DataFrame,
    size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """T6 sliding: overlapping windows — each event lands in
    size/slide windows; Spark expands via the same ``window`` expr."""
    w = _maybe_watermark(events, watermark)
    # exact integer cents, same argument as tumbling_stats: a float
    # sum's addition order differs between streaming micro-batches and
    # the one-pass batch twin, so round(sum, 2) can split on a hot
    # window while cents sum identically in any order (r15 review)
    cents = F.round(F.col("value") * 100).cast("long")
    agg = w.groupBy(F.window("ts", size, slide)).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents) / 100.0).alias("sum_value"),
    )
    return windowed_to_flat(agg)


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """T7 session windows: per-user activity bursts separated by ≥gap.

    Semantics (must match the batch/SQL twin): a session is a maximal
    run of a user's events where each consecutive pair is <= gap apart
    (probe-verified: an event landing EXACTLY gap after the last one
    still merges; only a strictly-larger gap splits — matching the
    stateful twin's `> gap_us` close rule); window = [first_ts,
    last_ts + gap).
    """
    w = _maybe_watermark(events, watermark)
    # exact integer cents (the tumbling_stats argument): the sliced
    # twin already summed cents, so the pinned session==sliced equality
    # could break on exactly the hot-user corpora the sliced path
    # exists for if this side kept order-dependent float sums (r15
    # review) — now both legs are exact by construction
    cents = F.round(F.col("value") * 100).cast("long")
    agg = w.groupBy(F.session_window("ts", gap), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents) / 100.0).alias("sum_value"),
    )
    return agg.select(
        F.unix_timestamp(F.col("session_window.start")).alias("sess_start"),
        F.unix_timestamp(F.col("session_window.end")).alias("sess_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


def session_stats_sliced(
    events: DataFrame,
    gap: str = "30 minutes",
    time_slice: str = "6 hours",
) -> DataFrame:
    """T7 at hostile skew — the time-slice-and-stitch escape for a user
    too hot for one reducer (batch form; same output contract as
    `session_stats`).

    Plain sessionization shuffles ALL of a user's rows to the single
    reducer that merges their gap state; salting cannot apply (every
    row of a user must meet to merge gaps), so one bot/sentinel user
    holding a material fraction of a 100 TB day serializes the stage.
    The escape decomposes the merge:

    1. **Slice** — sessionize within coarse ``(user_id, time-slice)``
       groups: the shuffle key gains the slice, so a hot user's rows
       spread over ``#slices`` reducers and per-task work is bounded
       by one user-slice, not one user. Slicing is exact-arithmetic
       (``unix_micros(ts) div slice_us``), so every event lands in
       exactly one slice.
    2. **Stitch** — a second, tiny pass over the LOCAL SESSION
       summaries (not events): per user ordered by start, a local
       session merges into its predecessor iff the boundary gap is
       <= ``gap`` — exactly the merge rule sessionization applies to
       consecutive events, so the composition is equivalent to global
       sessionization (splits happen at real >gap gaps and nowhere
       else). Rows here are O(sessions); a continuously-active hot
       user contributes ≤ one row per slice, so the window sort that
       was the scale-killer now runs on thousands of rows, not
       billions.

    ``sum_value`` aggregates exact integer cents (order-independent —
    the two-pass addition order differs from the one-pass twin's;
    float sums would drift, cents cannot).

    Local sessions never interleave across slices (a slice-k session's
    last event precedes every slice-k+1 event), so plain ``lag`` over
    start order sees the true predecessor — no running-max needed.

    **And in streaming mode?** This composition is batch-only: the
    stitch pass is a window function, which streaming cannot run
    incrementally. Streaming sessionization does not need this escape
    in the same way — `session_stats(streaming=True)` merges gap state
    PER KEY in the state store, so a hot user costs one fat state row
    updated per micro-batch, not a serialized sort of their whole
    history; the bound is per-trigger input, which the source rate
    already caps. If a per-trigger hot spike ever needed slicing, the
    streaming form of this escape is a two-query pipeline: query 1
    sessionizes per (user, slice) via ``session_window`` into an
    intermediate sink, query 2 stitches with
    `applyInPandasWithState` keyed by user over the (tiny) summary
    stream — the stitch rule below is already the exact merge
    predicate it would apply. Not implemented: no measured workload
    here motivates the second state store.
    """
    gap_us = interval_ns(gap) // 1000
    slice_us = interval_ns(time_slice) // 1000
    if slice_us < gap_us:
        raise ValueError(
            f"time_slice {time_slice!r} must be >= gap {gap!r}: slices "
            "narrower than the gap make every session a stitch case"
        )
    cents = F.round(F.col("value") * 100).cast("long")
    local = (
        events.withColumn(
            "_slice", F.expr(f"unix_micros(ts) div {slice_us}")
        )
        .groupBy("user_id", "_slice", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents).alias("_cents"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("_start_us"),
            # session_window.end = last event + gap (half-open); recover
            # the last-event instant for the boundary-gap test.
            (F.unix_micros(F.col("session_window.end")) - gap_us).alias(
                "_last_us"
            ),
            "n_events",
            "_cents",
        )
    )
    w = Window.partitionBy("user_id").orderBy("_start_us", "_last_us")
    chained = local.withColumn(
        "_new",
        # merge iff boundary gap <= gap: session_window merges an event
        # landing EXACTLY gap after the last one (probe-verified: the
        # window is [start, last+gap] inclusive at merge time; only a
        # strictly-larger gap splits) — the stateful twin's `> gap_us`
        # close rule says the same thing
        F.when(
            F.col("_start_us") - F.lag("_last_us").over(w) <= F.lit(gap_us),
            F.lit(0),
        ).otherwise(F.lit(1)),  # lag NULL (first session) starts a chain
    ).withColumn(
        "_chain",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        chained.groupBy("user_id", "_chain")
        .agg(
            F.min("_start_us").alias("_s"),
            F.max("_last_us").alias("_l"),
            F.sum("n_events").alias("n_events"),
            F.sum("_cents").alias("_c"),
        )
        .select(
            F.expr("_s div 1000000").alias("sess_start"),
            F.expr(f"(_l + {gap_us}) div 1000000").alias("sess_end"),
            "user_id",
            "n_events",
            (F.col("_c") / 100.0).alias("sum_value"),
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str | None = None,
    within_watermark: bool = False,
) -> DataFrame:
    """T8/O5: dedup by key.

    Batch: plain ``dropDuplicates``. Streaming: state per key — forever
    with ``dropDuplicates`` (exact, unbounded state), or bounded with
    ``dropDuplicatesWithinWatermark`` (correct iff true duplicates
    arrive within the watermark delay — the 100 TB default).
    """
    keys = keys or ["event_id"]
    df = _maybe_watermark(events, watermark)
    if within_watermark and df.isStreaming:
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def first_event_per_key(
    events: DataFrame,
    keys: list[str],
    watermark: str | None = None,
) -> Column | DataFrame:
    """Deterministic dedup twin: earliest event per key via min_by —
    unlike dropDuplicates (arbitrary survivor) this is oracle-checkable.
    """
    w = _maybe_watermark(events, watermark)
    return w.groupBy(*keys).agg(
        F.min("ts_ns").alias("first_ts_ns"),
        F.min_by("event_id", "ts_ns").alias("first_event_id"),
        F.round(F.min_by("value", "ts_ns"), 2).alias("first_value"),
    )


def signup_purchase_attribution(
    signups: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Stream–stream interval join (the T-surface capstone Spark
    feature): every (signup, purchase) pair for the same user where the
    purchase happens within ``horizon`` AFTER the signup — the classic
    conversion-attribution join.

    Works identically on batch relations and on two unbounded streams;
    in streaming mode both sides carry a watermark and the join
    condition's time bound lets Spark evict state once the watermark
    passes ``signup.ts + horizon`` (without the interval bound a
    stream–stream inner join would buffer both sides forever).

    Scale shape: one shuffle per side on user_id; state per key is
    bounded by (watermark + horizon) of events — the documented
    Structured Streaming state-cleanup contract.

    Output is flat epoch-second/na­no columns (engine-portable): one
    row per qualifying pair.
    """
    horizon_ns = interval_ns(horizon)
    s = _maybe_watermark(signups, watermark).select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
        F.col("ts_ns").alias("s_ts_ns"),
    )
    p = _maybe_watermark(purchases, watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("ts_ns").alias("p_ts_ns"),
        F.col("value").alias("purchase_value"),
    )
    # The join's time bounds run on the µs-truncated ``ts`` (what the
    # streaming state manager evicts on); BOTH bounds of the pair
    # predicate re-run on raw nanos below. The lower bound is >= (not
    # >): a purchase in the SAME microsecond as the signup but with a
    # later raw-nano timestamp is a qualifying pair at ns precision —
    # a strict µs-level > would drop it while the ns-precision oracle
    # counts it. ``latency_ns > 0`` then restores strictness exactly
    # where it belongs. Still watermark/state-eviction compatible:
    # both bounds remain on the watermarked ``ts`` columns.
    joined = s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    )
    return (
        joined.select(
            F.col("s_user").alias("user_id"),
            "signup_id",
            "purchase_id",
            (F.col("p_ts_ns") - F.col("s_ts_ns")).alias("latency_ns"),
            F.round("purchase_value", 2).alias("purchase_value"),
        )
        .filter(F.col("latency_ns") > 0)
        .filter(F.col("latency_ns") <= F.lit(horizon_ns))
    )
