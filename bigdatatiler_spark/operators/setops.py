"""Set-operation surface (SURVEY.md §2.7): UNION / INTERSECT / EXCEPT.

None exist in the reference (its disjunctive gather O13 is the degenerate
union of two point filters); the engine exposes Spark's built-ins. Note
INTERSECT/EXCEPT are set-semantics (deduplicating) in both Spark and ANSI
SQL — each compiles to an aggregate or left-semi/anti under Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table


def _segment_keys(spark, sf_dir, segment):
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == segment)
        .select("c_custkey")
    )


def _buyers_of_brand(spark, sf_dir, brand):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == brand)
    orders = table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )


@register(
    "setops_customer_cohorts",
    oracle="""
    WITH building AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    brand1_buyers AS (
      SELECT DISTINCT o_custkey AS c_custkey
      FROM lineitem
      JOIN part   ON l_partkey = p_partkey AND p_brand = 'Brand#1'
      JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT 'both' AS cohort, c_custkey FROM (
      SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM brand1_buyers
    )
    UNION ALL
    SELECT 'building_only' AS cohort, c_custkey FROM (
      SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM brand1_buyers
    )
    UNION ALL
    SELECT 'brand1_only' AS cohort, c_custkey FROM (
      SELECT c_custkey FROM brand1_buyers EXCEPT SELECT c_custkey FROM building
    )
    """,
)
def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one query: cohort partition of
    BUILDING-segment customers vs Brand#1 buyers. Each set op is a
    single-column shuffle on c_custkey; the three branches share the two
    input scans (Spark reuses the exchange under AQE)."""
    building = _segment_keys(spark, sf_dir, "BUILDING")
    brand1 = _buyers_of_brand(spark, sf_dir, "Brand#1")
    both = building.intersect(brand1).select(F.lit("both").alias("cohort"), "c_custkey")
    b_only = building.exceptAll(brand1.distinct()).select(
        F.lit("building_only").alias("cohort"), "c_custkey"
    )
    p_only = brand1.distinct().exceptAll(building).select(
        F.lit("brand1_only").alias("cohort"), "c_custkey"
    )
    return both.unionByName(b_only).unionByName(p_only)


@register(
    "union_priority_tiers",
    oracle="""
    SELECT 'urgent' AS tier, o_orderkey, o_custkey FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    UNION ALL
    SELECT 'normal' AS tier, o_orderkey, o_custkey FROM orders
    WHERE o_orderpriority = '3-MEDIUM'
    """,
)
def union_priority_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two filtered scans (bag semantics — no dedup shuffle).
    Catalyst merges the branches into one scan with an OR-ed pushed filter
    when beneficial."""
    orders = table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        F.lit("urgent").alias("tier"), "o_orderkey", "o_custkey"
    )
    normal = orders.where(F.col("o_orderpriority") == "3-MEDIUM").select(
        F.lit("normal").alias("tier"), "o_orderkey", "o_custkey"
    )
    return urgent.unionByName(normal)
