"""Canonical loaders for the driver's parquet test tables."""

from __future__ import annotations

import datetime as _dt

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Plain parquet scan → full Catalyst pushdown.

    ``events.ts`` is parquet TIMESTAMP(NANOS): read as raw int64 nanos
    (``ts_ns``, filter on this — min/max pushdown works on the physical
    column) plus a derived microsecond ``ts`` timestamp for projection.
    """
    tune_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def event_ns(iso: str) -> int:
    """'YYYY-MM-DD HH:MM:SS' (UTC) → epoch nanos, for ts_ns range literals."""
    dt = _dt.datetime.fromisoformat(iso).replace(tzinfo=_dt.timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
