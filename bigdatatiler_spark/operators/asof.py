"""As-of (temporal) join — SURVEY.md §2.5's identified gap.

OSS Spark has no native as-of join; the engine implements it as the
union + last(ignorenulls) window pattern:

1. union the probe ("query") and reference ("quote") streams with a
   marker column,
2. window per key ordered by (time, marker) — marker puts reference rows
   first at equal timestamps, giving inclusive >= semantics,
3. ``last(ref_col, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT
   carries the latest reference row forward,
4. keep probe rows.

One shuffle on the join key; state is O(1) per row (vs. the naive
range-join's quadratic blowup). This is the same plan merge_asof would
produce, but stays in the JVM with no Python boundary. The DuckDB oracle
uses its native ASOF LEFT JOIN, so the semantics (latest ref with
ref.ts <= probe.ts, per key, null when none) are verified independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..tables import table


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    on: str,
    time_col: str,
    payload_cols: tuple[str, ...],
    direction: str = "backward",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Generic as-of join: for each probe row, attach the most recent ref
    row (ref.time <= probe.time) with the same key — or, with
    ``direction="forward"``, the EARLIEST ref row at-or-after it
    (ref.time >= probe.time): the lead-time question (click → next
    purchase, alert → next deploy). Same single-shuffle union+window
    plan either way; forward just flips the frame (CURRENT..UNBOUNDED
    FOLLOWING, first instead of last) and the tie order (probe before
    ref at equal time, so an equal-time ref stays inside the forward
    frame — inclusive >= semantics). Returns probe columns plus
    ``ref_<payload>`` columns (null if no ref row on that side).

    ``tiebreak_col``: REQUIRED for deterministic output whenever two ref
    rows can share (key, time) — without it the window sort breaks such
    ties arbitrarily (divergence class 17, hostile round 6: year-9999
    saturated timestamps collide). Appended ascending to the ordering,
    so ties go to the ref encountered last in scan order — LARGEST
    tiebreak backward, SMALLEST forward."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    p = probe.withColumn("__is_probe", F.lit(1))
    r = ref.withColumn("__is_probe", F.lit(0))
    # align schemas: probe-only columns null on ref side and vice versa
    all_cols = [c for c in p.columns if c != "__is_probe"]
    for c in all_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(p.schema[c].dataType))
    for c in r.columns:
        if c not in p.columns:
            p = p.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    u = p.unionByName(r)
    tb = [F.asc(tiebreak_col)] if tiebreak_col else []
    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc(time_col), F.asc("__is_probe"), *tb)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc(time_col), F.desc("__is_probe"), *tb)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    carried = [
        carry(F.when(F.col("__is_probe") == 0, F.col(c)))
        .over(w)
        .alias(f"ref_{c}")
        for c in payload_cols
    ]
    return u.select("*", *carried).where(F.col("__is_probe") == 1).drop("__is_probe")


@register(
    "asof_purchase_to_click",
    oracle="""
    SELECT
      p.event_id AS purchase_event_id,
      p.user_id,
      epoch_ms(date_trunc('milliseconds', p.ts)) AS purchase_ts_ms,
      m.event_id AS click_event_id,
      epoch_ms(date_trunc('milliseconds', m.ts)) AS click_ts_ms
    FROM (SELECT * FROM events
          WHERE event_type = 'purchase' AND user_id IS NOT NULL
            AND ts IS NOT NULL) p
    LEFT JOIN LATERAL (
      SELECT c.event_id, c.ts FROM events c
      WHERE c.event_type = 'click' AND c.user_id = p.user_id
        AND c.ts <= p.ts
      ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
    ) m ON TRUE
    """,
)
def asof_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each purchase matched to the user's most
    recent click at-or-before it; equal-timestamp clicks break to the
    LARGEST event_id. Ordering on unsaturated epoch-MICROS (exact for
    every representable timestamp through year 294k — the nanos column
    saturates at ~2255, which would merge far-future rows the oracle's
    raw-timestamp comparison keeps distinct; fuzz 5). The oracle was
    DuckDB's native ASOF through round 5; hostile round 6 (class 17)
    showed ties at one timestamp resolve ARBITRARILY in both engines, so
    both sides now pin the tie — the oracle as a LATERAL top-1."""
    ev = table(spark, sf_dir, "events")
    # NULL-user rows excluded both engines: a window PARTITION BY groups
    # all NULL keys into one pseudo-user (cross-attributing anonymous
    # events) while the oracle's equality ASOF drops them — neither is
    # the intended attribution semantics (hostile-fixture finding).
    # fuzz round 6 (class 19): NULL timestamps sort FIRST in the window
    # union (matching a probe to a time-less ref) while the oracle's
    # ts-comparison excludes them — a row without a timestamp cannot
    # participate in a temporal join on either side, either engine.
    purchases = ev.where(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    ).select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "ts")
    clicks = ev.where(
        (F.col("event_type") == "click")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    ).select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "ts")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        time_col="ts_us",
        payload_cols=("event_id", "ts"),
        tiebreak_col="event_id",
    )
    return joined.select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.unix_millis("ts").alias("purchase_ts_ms"),
        F.col("ref_event_id").alias("click_event_id"),
        F.unix_millis("ref_ts").alias("click_ts_ms"),
    )


@register(
    "range_join_event_windows",
    oracle="""
    SELECT
      s.event_id AS signup_event_id,
      e.event_id AS error_event_id,
      s.user_id,
      epoch_ms(date_trunc('milliseconds', s.ts)) AS signup_ts_ms,
      epoch_ms(date_trunc('milliseconds', e.ts)) AS error_ts_ms
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON s.user_id = e.user_id
     AND e.ts >= s.ts
     AND e.ts < s.ts + INTERVAL 24 HOURS
    """,
)
def range_join_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: errors within 24h after each signup, per user.
    Expressed as equi-join on user + range predicate — Spark executes the
    equi part as a hash join and evaluates the range residual on matches,
    so there's no nested-loop blowup; at scale, bucketing both sides by
    coarse time bands turns the residual into a band-equi join."""
    ev = table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        F.col("ts").alias("s_ts"),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.unix_micros("ts").alias("e_us"),
        F.col("ts").alias("e_ts"),
    )
    day_us = 24 * 3600 * 1_000_000
    return (
        s.join(
            e,
            (F.col("user_id") == F.col("e_user_id"))
            & (F.col("e_us") >= F.col("s_us"))
            & (F.col("e_us") < F.col("s_us") + F.lit(day_us)),
        )
        .select(
            "signup_event_id",
            "error_event_id",
            "user_id",
            F.unix_millis("s_ts").alias("signup_ts_ms"),
            F.unix_millis("e_ts").alias("error_ts_ms"),
        )
    )


@register(
    "asof_forward_click_to_purchase",
    oracle="""
    SELECT
      c.event_id AS click_event_id,
      c.user_id,
      epoch_ms(date_trunc('milliseconds', c.ts)) AS click_ts_ms,
      m.event_id AS purchase_event_id,
      epoch_ms(date_trunc('milliseconds', m.ts)) AS purchase_ts_ms
    FROM (SELECT * FROM events
          WHERE event_type = 'click' AND user_id IS NOT NULL
            AND ts IS NOT NULL) c
    LEFT JOIN LATERAL (
      SELECT p.event_id, p.ts FROM events p
      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        AND p.ts >= c.ts
      ORDER BY p.ts ASC, p.event_id ASC LIMIT 1
    ) m ON TRUE
    """,
)
def asof_forward_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the lead-time direction: each click matched
    to the user's NEXT purchase at-or-after it (null when the user never
    buys again); equal-timestamp purchases break to the SMALLEST
    event_id (class 17 — see asof_purchase_to_click). Same union+window
    kernel as the backward query with the frame flipped (see asof_join);
    the oracle is the independent LATERAL top-1 formulation. Ordering on
    unsaturated epoch-micros, NULL users excluded on both engines (the
    same two hostile-fixture classes the backward query pins)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(
        (F.col("event_type") == "click")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    ).select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "ts")
    purchases = ev.where(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    ).select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "ts")
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        time_col="ts_us",
        payload_cols=("event_id", "ts"),
        direction="forward",
        tiebreak_col="event_id",
    )
    return joined.select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.unix_millis("ts").alias("click_ts_ms"),
        F.col("ref_event_id").alias("purchase_event_id"),
        F.unix_millis("ref_ts").alias("purchase_ts_ms"),
    )
