"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant repeated cost is shuffling lineitem-shaped facts on
their join key. Bucketing is the Spark-native fix (SURVEY.md §2.5): write
both join sides pre-hash-partitioned into the same number of buckets on
the key, and every future equi-join on that key is exchange-free — the
sort-merge join reads bucket i of each side on the same executor.

This is the persistent-layout complement to the per-query broadcast/AQE
strategies: broadcast kills the shuffle when one side is small, bucketing
kills it when both sides are big and the join recurs (fact-to-fact:
orders⋈lineitem, events⋈events self-joins, chunk⋈parent reassembly).

Bucketed writes go through the session catalog (`saveAsTable` — bucket
metadata lives in the metastore; a path write can't record it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    n_buckets: int,
    bucket_cols: tuple[str, ...],
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-ordered) catalog
    table. ``sort_cols`` pre-sorts within buckets so the downstream
    sort-merge join skips its sort too."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
