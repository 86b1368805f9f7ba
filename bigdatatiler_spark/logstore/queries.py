"""Registered oracle-matched queries for the log-store surface.

These run the reference's query shapes (SURVEY.md §2.2-§2.3, E1/E3 at §3)
against the driver's ``events`` table, whose columns map 1:1 onto the
LogChange fields the reference queries (FIXTURES.md §8):
user_id↔UserId, event_type↔TypeOfEvent, ts↔JsTimeOfCreation, event_id↔id.

All outputs follow the registry determinism rules: epoch-ms timestamps,
decimal-exact aggregation, total-order LIMITs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..tables import event_ts, table
from .store import filtered_scan

# Fixed query window: half-open [T0, T1) inside the events table's
# 2024-01-01..2024-01-30 span, boundary-exercising per FIXTURES.md §11.
T0 = "2024-01-10 00:00:00"
T1 = "2024-01-20 00:00:00"


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — "latest 100 events of one type in a half-open time window,
    newest first" (BigDataLogControl.cs:206-330 re-expressed declaratively).
    Used by ``__spark_entry__.entry`` as the smoke-check query.

    Filters and sorts directly on ``ts`` with timestamp literals: Catalyst
    unwraps the loader's NTZ→LTZ cast, so the range predicate reaches the
    parquet scan as a pushed filter (min/max row-group pruning; asserted in
    tests/test_plans.py).
    """
    ev = table(spark, sf_dir, "events")
    scan = filtered_scan(
        ev,
        event_type="click",
        between=(event_ts(T0), event_ts(T1)),
        limit=100,
        time_col="ts",
    )
    return scan.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
    )


@register(
    "events_filtered_topk",
    oracle=f"""
    SELECT event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ts_ms, user_id, event_type,
           CASE WHEN (isfinite(value) AND abs(value) < 1e16) THEN value END AS value
    FROM events
    WHERE event_type = 'click'
      AND ts >= TIMESTAMP '{T0}' AND ts < TIMESTAMP '{T1}'
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
)
def events_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8-O15: conjunctive filter + half-open range + ORDER BY ts DESC +
    top-k. Compiles to a pushed-filter parquet scan + TakeOrderedAndProject
    (no global sort — verified via explain in tests/test_plans.py)."""
    return flagship(spark, sf_dir)


@register(
    "events_point_read",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_ms(date_trunc('milliseconds', ts)) AS ts_ms,
           CASE WHEN (isfinite(value) AND abs(value) < 1e16) THEN value END AS value, props
    FROM events
    WHERE user_id = 8 AND event_id = 0
    """,
)
def events_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: point read by (partition key, id) — ReadItemAsync parity
    (BigDataLogControl.cs:192-204). Both predicates push to the scan."""
    ev = table(spark, sf_dir, "events")
    return ev.where((F.col("user_id") == 8) & (F.col("event_id") == 0)).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
        "value",
        "props",
    )


@register(
    "events_gather_disjunctive",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_ms(date_trunc('milliseconds', ts)) AS ts_ms
    FROM events
    WHERE event_id = 7 OR user_id = 42
    """,
)
def events_gather_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13: disjunctive key predicate (``id = @P OR ParentLogId = @P``,
    BigDataLogControl.cs:135) — the split-document gather shape."""
    ev = table(spark, sf_dir, "events")
    return ev.where((F.col("event_id") == 7) | (F.col("user_id") == 42)).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
    )


# keyset-cursor anchor (page 2+): strictly after this (ts, event_id) in
# (ts DESC, id DESC) order — value-based, so it works at every SF
CURSOR_TS = "2024-01-16 00:00:00"
CURSOR_ID = 5000
CURSOR_PAGE = 100


@register(
    "events_page_keyset",
    oracle=f"""
    SELECT event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ts_ms, user_id, event_type
    FROM events
    WHERE ts < TIMESTAMP '{CURSOR_TS}'
       OR (ts = TIMESTAMP '{CURSOR_TS}' AND event_id < {CURSOR_ID})
    ORDER BY ts DESC, event_id DESC
    LIMIT {CURSOR_PAGE}
    """,
)
def events_page_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: the log-store cursor — one keyset page strictly after a
    (ts, id) anchor, the reference's FeedIterator drain re-expressed so
    each page is a sargable composite filter + TakeOrderedAndProject
    (O(page) at any depth; the filter and sort ride ``ts`` itself — the
    cast-unwrapped predicate pushes into the parquet scan, so min/max
    row-group pruning applies). LogStore.cursor wraps this page shape in
    the drain loop (BigDataLogControl.cs:141-150)."""
    from .store import keyset_page

    ev = table(spark, sf_dir, "events")
    page = keyset_page(
        ev,
        anchor=(event_ts(CURSOR_TS), CURSOR_ID),
        page_size=CURSOR_PAGE,
        time_col="ts",
        id_col="event_id",
    )
    return page.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "user_id",
        "event_type",
    )


@register(
    "events_user_activity",
    oracle="""
    SELECT
      user_id,
      count(*) AS n_events,
      round(CAST(sum(TRY_CAST(CASE WHEN (isfinite(value) AND abs(value) < 1e16) THEN value END AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
      epoch_ms(date_trunc('milliseconds', min(ts))) AS first_ts_ms,
      epoch_ms(date_trunc('milliseconds', max(ts))) AS last_ts_ms,
      count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user aggregation (the engine's generalization of the reference's
    per-partition access pattern). Decimal-exact sum → deterministic hash.
    Partial aggregation (map-side combine) keeps the shuffle small."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
            "total_value"
        ),
        F.unix_millis(F.min("ts")).alias("first_ts_ms"),
        F.unix_millis(F.max("ts")).alias("last_ts_ms"),
        F.count_distinct("event_type").alias("n_types"),
    )


@register(
    "events_latest_per_user",
    oracle="""
    SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ts_ms, event_type, rn
    FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn <= 3
    """,
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6: per-user top-k via ranking window — "latest N events per user",
    the per-partition generalization of O14+O15. One shuffle on user_id."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "user_id",
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "event_type",
            "rn",
        )
    )
