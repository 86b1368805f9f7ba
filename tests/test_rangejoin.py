"""Banded range join (operators/rangejoin.py): correctness vs the naive
nested-loop formulation, and the plan property that justifies it — no
BroadcastNestedLoopJoin / CartesianProduct anywhere in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatatiler_spark.operators.rangejoin import (
    banded_interval_join,
    rangejoin_error_bursts,
)

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_banded_matches_naive(spark):
    """The banded plan must produce exactly the naive range join's pairs."""
    rows = [(i, t) for i, t in enumerate([0, 5, 99, 100, 101, 250, 999, 1000, 1001])]
    df = spark.createDataFrame(rows, "id long, t long")
    intervals = df.select(
        F.col("id").alias("a_id"),
        F.col("t").alias("lo"),
        (F.col("t") + F.lit(100)).alias("hi"),
    )
    points = df.select(F.col("id").alias("b_id"), F.col("t").alias("p"))
    banded = banded_interval_join(
        intervals, points, lo="lo", hi="hi", point="p", band_ns=100
    )
    got = sorted((r.a_id, r.b_id) for r in banded.collect())
    naive = sorted(
        (r.a_id, r.b_id)
        for r in intervals.join(
            points, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi"))
        ).collect()
    )
    assert got == naive
    # self-containment sanity: each point is inside its own interval
    assert all(any(a == b == i for a, b in got) for i in range(len(rows)))


def test_banded_handles_intervals_wider_than_band(spark):
    """Intervals longer than band_ns replicate to more bands but stay exact."""
    intervals = spark.createDataFrame(
        [(1, 0, 1000)], "a_id long, lo long, hi long"
    )
    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 50, 999, 1000, 1500])],
        "b_id long, p long",
    )
    got = sorted(
        r.b_id
        for r in banded_interval_join(
            intervals, points, lo="lo", hi="hi", point="p", band_ns=100
        ).collect()
    )
    assert got == [0, 1, 2]  # 1000 excluded (half-open), 1500 out of range


def test_no_nested_loop_in_plan(spark):
    """The whole point: a no-equi-key range join that Catalyst would plan
    as BroadcastNestedLoopJoin must instead run as a banded equi join."""
    plan = _executed_plan(rangejoin_error_bursts(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # it IS a join, just an equi one on the band key
