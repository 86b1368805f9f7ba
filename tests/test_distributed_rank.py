"""The distributed-rank kernel (r9 verdict item 5): exact global
row_number + ANSI ntile WITHOUT a single-partition window, pinned
equal to Spark's own single-window forms on hostile sizes (n % k
boundaries, ties broken by key, n < k, duplicates in the order value)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from bigdatatiler_spark.operators._util import distributed_rank, ntile_from_rank


@pytest.mark.parametrize("n", [1, 3, 4, 5, 97, 100, 103])
@pytest.mark.parametrize("k", [4, 10])
def test_matches_single_window_ntile(spark, n, k):
    # duplicate-heavy order values force the tiebreak to matter
    df = spark.range(n).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("v")
    )
    order = [F.desc("v"), F.asc("key")]
    w = Window.orderBy(*order)
    expected = {
        r["key"]: (r["rn"], r["t"])
        for r in df.select(
            "key",
            F.row_number().over(w).alias("rn"),
            F.ntile(k).over(w).alias("t"),
        ).collect()
    }
    total = df.count()
    got = {
        r["key"]: (r["rn"], r["t"])
        for r in distributed_rank(df, order, rank_name="rn")
        .select(
            "key",
            "rn",
            ntile_from_rank(F.col("rn"), F.lit(total), k).alias("t"),
        )
        .collect()
    }
    assert got == expected


def test_rank_plan_has_no_single_partition_exchange(spark):
    df = spark.range(1000).select(
        F.col("id").alias("key"), (F.col("id") % 13).alias("v")
    )
    ranked = distributed_rank(df, [F.asc("v"), F.asc("key")])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


@pytest.mark.parametrize("n", [1, 4, 97, 103])
@pytest.mark.parametrize("inclusive", [False, True])
def test_prefix_sum_matches_single_window(spark, n, inclusive):
    from bigdatatiler_spark.operators._util import distributed_prefix_sum

    df = spark.range(n).select(
        F.col("id").alias("key"),
        (F.col("id") % 5).alias("v"),
        ((F.col("id") * 7) % 11).alias("x"),
    )
    order = [F.desc("v"), F.asc("key")]
    end = 0 if inclusive else -1
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, end)
    expected = {
        r["key"]: r["p"]
        for r in df.select(
            "key", F.coalesce(F.sum("x").over(w), F.lit(0)).alias("p")
        ).collect()
    }
    got = {
        r["key"]: r["p"]
        for r in distributed_prefix_sum(
            df, order, "x", name="p", inclusive=inclusive
        )
        .select("key", "p")
        .collect()
    }
    assert got == expected
