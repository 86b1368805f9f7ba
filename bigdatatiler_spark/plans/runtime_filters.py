"""Runtime bloom-filter join pruning — shuffle-side row pruning at scale.

SURVEY.md §4 maps the reference's hand-built predicate shipping
(/root/reference/BigDataLogControl.cs:212-264) onto Catalyst's automatic
pushdown. That covers *static* predicates. At 100 TB the expensive case is
different: a fact-table join where the selective predicate sits on the
*other* side (e.g. lineitem ⋈ orders with a filter only on orders).
Static pushdown can't help the fact scan — every lineitem row is read,
shuffled, and only then dropped by the join.

Spark's runtime bloom filter (SPARK-32268, on by default since 3.4) fixes
exactly this: the optimizer plants a ``bloom_filter_agg`` subquery on the
filtered (creation) side and injects ``might_contain(<bloom>, xxhash64(key))``
as a scan-adjacent filter on the fact (application) side, so non-matching
rows die before the shuffle instead of after it. It only fires when the
join is a shuffle join (a broadcast join already prunes via the hash table)
and the fact scan exceeds ``applicationSideScanSizeThreshold`` (10 GiB by
default — i.e. precisely the 100 TB regime, never the sf0.01 test regime).

This module makes the behavior testable at toy scale: a context manager
that lowers the thresholds so the rule fires on test data, and a canonical
join shape to audit. Results are identical with or without the filter —
it is pure physical-plan machinery, which is why it lives in ``plans``
rather than ``operators`` and has no ``queries()`` registration.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F

# Confs that gate runtime-filter injection, with the values that make the
# rule fire on kilobyte-scale test parquet. On a real cluster the defaults
# (creation side ≤ 10 MiB, application scan ≥ 10 GiB) are already correct.
_TOY_SCALE_CONFS = {
    # force a shuffle join; runtime filters never apply to broadcast joins
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # fact scan threshold: default 10GB would never trigger at test scale
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


@contextmanager
def runtime_bloom_pruning(spark: SparkSession, confs: dict[str, str] | None = None):
    """Temporarily set the confs under which Catalyst injects runtime bloom
    filters on shuffle joins, restoring prior values on exit.

    Injection happens at optimization time (first action / explain), so the
    DataFrame must be *built and executed* inside the ``with`` block.
    """
    confs = dict(_TOY_SCALE_CONFS, **(confs or {}))
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def bloom_prunable_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical shape runtime filtering exists for: a wide fact table
    (lineitem) equi-joined to a side whose only selective predicate is local
    to it (urgent orders). No filter on lineitem is statically pushable; the
    bloom filter is the only thing standing between the full fact scan and
    the shuffle.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("line_count"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross_revenue"),
        )
    )


def has_runtime_bloom_filter(df: DataFrame) -> bool:
    """True if the optimized plan injected a bloom-filter runtime filter."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "might_contain" in plan and "bloom_filter_agg" in plan
