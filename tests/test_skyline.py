"""Skyline one-pass correctness: the sorted running-max trick must equal
brute-force dominance on hostile inputs — exact price ties, equal-size
chains, single-point groups — which real fixture data may never hit."""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def _brute_frontier(points):
    out = []
    for b, p, s in points:
        dominated = any(
            b2 == b and p2 <= p and s2 >= s and (p2 < p or s2 > s)
            for b2, p2, s2 in points
        )
        if not dominated:
            out.append((b, p, s))
    return sorted(out)


def _window_frontier(spark, points):
    df = spark.createDataFrame(points, "brand string, price long, size long")
    g = df.distinct()
    w = (
        Window.partitionBy("brand")
        .orderBy(F.asc("price"), F.desc("size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rows = (
        g.withColumn("m", F.max("size").over(w))
        .where(F.col("m").isNull() | (F.col("m") < F.col("size")))
        .select("brand", "price", "size")
        .collect()
    )
    return sorted(tuple(r) for r in rows)


def test_skyline_hostile_cases(spark):
    points = [
        # brand A: price tie at 10 (sizes 5 vs 9 — 5 is dominated),
        # plus a strictly dominated interior point and a duplicate row
        ("A", 10, 5),
        ("A", 10, 9),
        ("A", 10, 9),
        ("A", 12, 9),   # dominated by (10, 9)
        ("A", 12, 11),
        ("A", 15, 11),  # dominated by (12, 11) — equal size, higher price
        # brand B: single point (always frontier)
        ("B", 99, 1),
        # brand C: monotone descending sizes — all on the frontier
        ("C", 1, 30),
        ("C", 2, 40),
        ("C", 3, 50),
        # brand D: same size everywhere — only the cheapest survives
        ("D", 5, 7),
        ("D", 6, 7),
        ("D", 7, 7),
    ]
    uniq = sorted(set(points))
    assert _window_frontier(spark, points) == _brute_frontier(uniq)


def test_skyline_randomized(spark):
    import random

    rng = random.Random(4)
    points = [
        (rng.choice("AB"), rng.randrange(6), rng.randrange(6))
        for _ in range(120)
    ]
    uniq = sorted(set(points))
    assert _window_frontier(spark, points) == _brute_frontier(uniq)
