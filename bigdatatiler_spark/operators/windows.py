"""Window-function surface (SURVEY.md §2.6).

The reference's closest construct is ORDER BY time DESC + OFFSET/LIMIT
(BigDataLogControl.cs:267-268); these queries provide the full ranking /
offset / frame surface. Window shuffles partition by their key — at scale
the partition key (customer, user) must be high-cardinality, which all of
these are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..tables import table
from ._util import dec, money_sum, ms, ts_lit


@register(
    "top_customers_per_nation",
    oracle="""
    SELECT n_name, c_custkey, total_spend, rnk
    FROM (
      SELECT
        n_name,
        c_custkey,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(10,2))), 2) AS DOUBLE) AS total_spend,
        rank() OVER (
          PARTITION BY n_name
          ORDER BY round(sum(CAST(o_totalprice AS DECIMAL(10,2))), 2) DESC, c_custkey ASC
        ) AS rnk
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      GROUP BY n_name, c_custkey
    )
    WHERE rnk <= 3
    """,
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() over per-nation spend: agg shuffle on (nation, customer) then
    window shuffle on nation. Rank on the exact decimal (pre-cast) so ties
    are decided on exact values in both engines, with custkey tiebreak."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    spend = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(F.round(F.sum(dec("o_totalprice")), 2).alias("spend_dec"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("spend_dec"), F.asc("c_custkey"))
    return (
        spend.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "n_name",
            "c_custkey",
            F.col("spend_dec").cast("double").alias("total_spend"),
            "rnk",
        )
    )


@register(
    "customer_order_running_total",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      epoch_ms(o_orderdate) AS o_orderdate_ms,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(10,2))) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ), 2) AS DOUBLE) AS running_total,
      row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      ) AS order_seq
    FROM orders
    WHERE o_custkey <= 30
    """,
)
def customer_order_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (ROWS UNBOUNDED PRECEDING..CURRENT): per-customer
    running spend. Decimal accumulation keeps the prefix sums exact and
    order-independent across engines."""
    orders = table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 30)
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        ms("o_orderdate").alias("o_orderdate_ms"),
        F.round(F.sum(dec("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "order_gaps_lag_lead",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      epoch_ms(o_orderdate) AS o_orderdate_ms,
      epoch_ms(lag(o_orderdate) OVER w)  AS prev_order_ms,
      epoch_ms(lead(o_orderdate) OVER w) AS next_order_ms,
      date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS days_since_prev
    FROM orders
    WHERE o_custkey <= 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def order_gaps_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation: inter-order gaps per customer. datediff on
    date-truncated values is integral — no FP concerns."""
    orders = table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 30)
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    prev_d = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        ms("o_orderdate").alias("o_orderdate_ms"),
        ms(prev_d).alias("prev_order_ms"),
        ms(F.lead("o_orderdate").over(w)).alias("next_order_ms"),
        F.datediff(F.col("o_orderdate"), prev_d).cast("long").alias("days_since_prev"),
    )


@register(
    "order_value_quartiles",
    oracle="""
    SELECT
      o_orderkey,
      o_orderstatus,
      ntile(4) OVER (
        PARTITION BY o_orderstatus
        ORDER BY CAST(o_totalprice AS DECIMAL(10,2)) ASC, o_orderkey ASC
      ) AS quartile,
      dense_rank() OVER (
        PARTITION BY o_orderstatus ORDER BY o_orderpriority ASC
      ) AS priority_rank
    FROM orders
    WHERE o_custkey <= 50
    """,
)
def order_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + dense_rank: distribution bucketing per order status. Ordering
    on exact decimal + unique key keeps tile assignment deterministic."""
    orders = table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    w_val = Window.partitionBy("o_orderstatus").orderBy(
        dec("o_totalprice").asc(), F.asc("o_orderkey")
    )
    w_pri = Window.partitionBy("o_orderstatus").orderBy(F.asc("o_orderpriority"))
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w_val).alias("quartile"),
        F.dense_rank().over(w_pri).alias("priority_rank"),
    )


# --- time-window aggregations shared with the streaming module -----------
# (same transformation functions run on streaming frames in
#  bigdatatiler_spark/streaming/ingest.py; batch runs are oracle-checked)

from ..streaming.ingest import session_windows, tumbling_counts  # noqa: E402


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT
      epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
      event_type,
      count(*) AS n_events,
      round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (F.window == hour truncation for
    aligned windows). Identical code path powers the streaming variant —
    watermark-evicted state there, plain shuffle here."""
    from ..tables import table as _table

    return tumbling_counts(_table(spark, sf_dir, "events"), size="1 hour")


@register(
    "events_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT
      user_id,
      epoch_ms(min(ts)) AS session_start_ms,
      epoch_ms(max(ts) + INTERVAL 30 MINUTES) AS session_end_ms,
      count(*) AS n_events
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user — F.session_window
    in batch; the oracle derives identical sessions via gaps-and-islands
    (new session when the gap is >= the timeout, matching Spark's
    half-open [start, last+gap) semantics)."""
    from ..tables import table as _table

    return session_windows(_table(spark, sf_dir, "events"), gap="30 minutes")


@register(
    "events_sliding_counts",
    oracle="""
    SELECT
      epoch_ms(time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes')
        AS window_start_ms,
      epoch_ms(time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
               + INTERVAL '1 hour') AS window_end_ms,
      event_type,
      count(*) AS n_events
    FROM events CROSS JOIN generate_series(0, 3) AS t(k)
    GROUP BY 1, 2, 3
    """,
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 15 minutes: each event lands in
    size/slide = 4 windows (Spark expands map-side, one shuffle on the
    expanded key — the oracle derives the same 4 epoch-aligned windows
    per event via a generate_series cross join). Shared transformation
    with the streaming variant in streaming/ingest.py."""
    from ..streaming.ingest import sliding_counts
    from ..tables import table as _table

    return sliding_counts(
        _table(spark, sf_dir, "events"), size="1 hour", slide="15 minutes"
    )


@register(
    "order_price_percentiles",
    oracle="""
    SELECT
      o_orderpriority,
      count(DISTINCT o_custkey) AS n_distinct_customers,
      round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 4) AS p50_price,
      round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 4) AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + distinct aggregation per group.
    `percentile` (exact) matches DuckDB's quantile_cont interpolation;
    at 100 TB swap in approx_percentile (t-digest sketch, one pass,
    mergeable) — exact percentile needs a per-group sort. The distinct
    count adds the two-shuffle distinct-agg plan (expand → partial)."""
    o = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct(F.col("o_custkey")).alias("n_distinct_customers"),
        F.round(F.percentile(price, F.lit(0.5)), 4).alias("p50_price"),
        F.round(F.percentile(price, F.lit(0.9)), 4).alias("p90_price"),
    )
