"""Banded range join — interval joins WITHOUT an equi key.

SURVEY.md §2.5 covers the equi-keyed range join (asof.py: user_id equality
plus a time-range residual — Catalyst runs the equi part as a hash join and
the range as a cheap residual). The remaining gap is the range join with NO
equality component at all: "every pair of rows within Δt of each other,
corpus-wide". Vanilla Spark can only plan that as BroadcastNestedLoopJoin
or CartesianProduct — O(n·m) compares and a single-task bottleneck that is
unusable at 100 TB (this module's plan test pins that neither node appears).

The scale-safe shape is the standard binned range join (the same idea
behind Databricks' range-join optimization and interval trees in streaming
systems), built here from plain DataFrame ops so Catalyst/AQE still own the
physical details:

1. pick a band width W ≥ the interval length;
2. the point side maps each row to ONE band id: floor(t / W);
3. the interval side [lo, hi) explodes to the bands it overlaps —
   sequence(floor(lo/W), floor(hi/W)) — at most ceil(len/W)+1 ≈ 2 rows
   when W ≥ hi-lo;
4. equi-join on the band id (shuffle-partitioned, AQE-skewable, never
   all-pairs) and apply the exact range predicate as a residual.

Each matching (interval, point) pair meets in EXACTLY one band — the
point's own band — so the output needs no dedup. Cost: ≤2× replication of
the interval side and a hash join keyed by time band; compares are limited
to rows at most 2W apart instead of n·m. Hot bands (bursty periods) are
ordinary equi-join skew, handled by AQE skew-join splitting.

Reference parity: the reference's query surface has no cross-partition
range scan (its Cosmos reads are partition-scoped; BigDataLogControl.cs
time filters ride a single log's partition key) — this operator is part of
the beyond-parity analytics surface, with DuckDB's IEJoin as the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table

#: 5 minutes in nanoseconds — the burst-pair window.
_BURST_NS = 300 * 1_000_000_000


def banded_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    lo: str,
    hi: str,
    point: str,
    band_ns: int,
) -> DataFrame:
    """Join each row of ``points`` to every row of ``intervals`` whose
    half-open interval [lo, hi) contains it, with no equi key required.

    ``lo``/``hi`` are epoch-nanos LongType columns on ``intervals``;
    ``point`` is an epoch-nanos column on ``points``. ``band_ns`` must be
    ≥ the maximum interval length for the ≤2-band explosion bound to hold
    (wider intervals still join correctly, they just replicate to more
    bands). Column names must be disjoint between the two inputs.
    """
    i = intervals.withColumn(
        "__band",
        F.explode(
            F.sequence(
                (F.col(lo) / F.lit(band_ns)).cast("long"),
                (F.col(hi) / F.lit(band_ns)).cast("long"),
            )
        ),
    )
    p = points.withColumn("__band", (F.col(point) / F.lit(band_ns)).cast("long"))
    return (
        i.join(p, "__band")
        .where((F.col(point) >= F.col(lo)) & (F.col(point) < F.col(hi)))
        .drop("__band")
    )


@register(
    "rangejoin_error_bursts",
    oracle=f"""
    SELECT
      a.event_id AS first_event_id,
      b.event_id AS second_event_id,
      ((greatest(least(epoch_us(b.ts), 9000000000000000), -9000000000000000) * 1000) - (greatest(least(epoch_us(a.ts), 9000000000000000), -9000000000000000) * 1000)) // 1000000 AS gap_ms
    FROM (SELECT * FROM events WHERE event_type = 'error') a
    JOIN (SELECT * FROM events WHERE event_type = 'error') b
      ON (greatest(least(epoch_us(b.ts), 9000000000000000), -9000000000000000) * 1000) > (greatest(least(epoch_us(a.ts), 9000000000000000), -9000000000000000) * 1000)
     AND (greatest(least(epoch_us(b.ts), 9000000000000000), -9000000000000000) * 1000) < (greatest(least(epoch_us(a.ts), 9000000000000000), -9000000000000000) * 1000) + {_BURST_NS}
    """,
)
def rangejoin_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide error-burst pairs: every ordered pair of error events
    (any user — NO equi key) where the second fires within 5 minutes
    strictly after the first. The naive plan is a nested-loop self-join;
    the banded plan meets only within ±1 time band. gap_ms is integer
    nanos-floor-division (de-float rule: nothing fractional reaches the
    comparison hash)."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "error")
    firsts = ev.select(
        F.col("event_id").alias("first_event_id"),
        (F.col("ts_ns") + F.lit(1)).alias("lo_ns"),  # strict >: [ts+1, ts+W+1)
        (F.col("ts_ns") + F.lit(_BURST_NS)).alias("hi_ns"),
    )
    seconds = ev.select(
        F.col("event_id").alias("second_event_id"),
        F.col("ts_ns").alias("second_ns"),
    )
    joined = banded_interval_join(
        firsts, seconds, lo="lo_ns", hi="hi_ns", point="second_ns", band_ns=_BURST_NS
    )
    return joined.select(
        "first_event_id",
        "second_event_id",
        # gap = b_ns - a_ns where a_ns = lo_ns - 1; integer div keeps the
        # whole expression in exact BIGINT arithmetic on both engines.
        F.expr("(second_ns - lo_ns + 1) div 1000000").alias("gap_ms"),
    )
