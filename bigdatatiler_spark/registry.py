"""Query registry backing the driver contract.

Every implemented operator from SURVEY.md §2 registers a named query here:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the operator
is SQL-expressible) the equivalent ANSI SQL that DuckDB runs as the oracle.

Determinism rules for oracle-matched queries (the driver hashes values
order-insensitively but exactly):
- never emit raw floating aggregates: aggregate in DECIMAL (exact), then
  cast/round at the end — identical in Spark and DuckDB;
- never emit raw timestamps: emit epoch millis (unix_millis / epoch_ms);
- every LIMIT carries a total-order ORDER BY (unique tiebreak column);
- alias every computed column identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}

#: Modules that register queries on import (one per operator family).
_QUERY_MODULES = (
    "bigdatatiler_spark.logstore.queries",
    "bigdatatiler_spark.operators.relational",
    "bigdatatiler_spark.operators.tpch_deep",
    "bigdatatiler_spark.operators.windows",
    "bigdatatiler_spark.operators.setops",
    "bigdatatiler_spark.operators.scalar",
    "bigdatatiler_spark.operators.asof",
    "bigdatatiler_spark.operators.dedup",
    "bigdatatiler_spark.operators.similarity",
    "bigdatatiler_spark.operators.text",
    "bigdatatiler_spark.operators.tiling",
    "bigdatatiler_spark.operators.multimodal",
    "bigdatatiler_spark.functions.tokenize",
    "bigdatatiler_spark.operators.skew",
    "bigdatatiler_spark.operators.sqlsurface",
    "bigdatatiler_spark.operators.graph",
    "bigdatatiler_spark.operators.sketches",
    "bigdatatiler_spark.operators.sampling",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query/oracle pair under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet — registry stays partial during bring-up
    return QUERIES
