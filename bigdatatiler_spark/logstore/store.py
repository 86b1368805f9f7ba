"""Log-store query builder and partitioned persistence.

Reference parity map (see SURVEY.md §2 for the full inventory):
- ``filtered_scan``  → getLogChangesByType's dynamically-composed Cosmos SQL
  (/root/reference/BigDataLogControl.cs:206-330): conditional equality
  predicates, half-open time range [start, end), ORDER BY time DESC,
  OFFSET/LIMIT. We implement the *intended* semantics — the caller's
  partition key is honored (the reference hardcodes "Account1" at
  BigDataLogControl.cs:285, a bug documented in SURVEY.md §2.12) and the
  timeline is optional (the reference NREs on null, :213).
- ``LogStore.point_read`` → ReadItemAsync point read
  (/root/reference/BigDataLogControl.cs:192-204).
- ``LogStore.gather``     → the split-gather disjunctive query
  (/root/reference/BigDataLogControl.cs:135-150).
- ``LogStore.append``     → CreateItemAsync partition-routed writes
  (/root/reference/BigDataLogControl.cs:67-112), as one partitioned job.

Scale design: every method returns a lazy DataFrame; filters land in the
parquet scan (PushedFilters), the partition column prunes directories, and
ORDER BY+LIMIT compiles to TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, functions as F


def _half_open(col: Column, window) -> Column:
    """``start <= col < end`` — the reference's asymmetric range predicate
    (BigDataLogControl.cs:259-263 uses >= @start AND < @end; preserved)."""
    start, end = window
    return (col >= F.lit(start)) & (col < F.lit(end))


def filtered_scan(
    df: DataFrame,
    *,
    user_id=None,
    event_type: str | None = None,
    between: tuple | None = None,
    limit: int | None = 100,
    offset: int = 0,
    time_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Declarative rebuild of the reference's conjunctive query builder.

    Each predicate is appended only when its argument is present, mirroring
    the WHERE/AND state machine at BigDataLogControl.cs:212-275 — but as
    Column expressions, so Catalyst pushes them into the scan. Sort is
    newest-first with a unique id tiebreak (total order → deterministic
    top-k; the reference relies on Cosmos's stable index order).
    """
    out = df
    if user_id is not None:
        out = out.where(F.col(user_col) == F.lit(user_id))
    if event_type is not None:
        out = out.where(F.col(type_col) == F.lit(event_type))
    if between is not None:
        out = out.where(_half_open(F.col(time_col), between))
    out = out.orderBy(F.col(time_col).desc(), F.col(id_col).desc())
    if offset:
        # Non-zero offset needs a global row numbering; the reference always
        # uses OFFSET 0 (BigDataLogControl.cs:268), so this path is rare.
        from pyspark.sql import Window

        w = Window.orderBy(F.col(time_col).desc(), F.col(id_col).desc())
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > offset)
            .drop("__rn")
        )
    if limit is not None:
        out = out.limit(limit)
    return out


class LogStore:
    """Partitioned append-only log table (Parquet), keyed like the reference
    container: hash partition on user — here a directory-partition column,
    giving partition pruning on every user-scoped query."""

    def __init__(self, spark, path: str, user_col: str = "user_id"):
        self.spark = spark
        self.path = path
        self.user_col = user_col

    # --- writes ---------------------------------------------------------
    def create(self, df: DataFrame) -> None:
        """DDL + initial load (reference: createAzureDocumentDatabase,
        BigDataLogControl.cs:38-66). Partitioned overwrite."""
        df.write.mode("overwrite").partitionBy(self.user_col).parquet(self.path)

    def append(self, df: DataFrame) -> None:
        """Batch insert (reference: AddLogDocuments' sequential per-doc loop,
        BigDataLogControl.cs:83-112 — here one parallel partitioned job; no
        2 MB size policing needed, Parquet has no per-record limit)."""
        df.write.mode("append").partitionBy(self.user_col).parquet(self.path)

    # --- reads ----------------------------------------------------------
    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def point_read(self, user_id, doc_id, id_col: str = "id") -> DataFrame:
        """ReadItemAsync(id, PartitionKey(userId)) → partition-pruned scan +
        pushed id filter (BigDataLogControl.cs:192-204)."""
        return self.df().where(
            (F.col(self.user_col) == F.lit(user_id)) & (F.col(id_col) == F.lit(doc_id))
        )

    def gather(self, user_id, parent_id, id_col="id", parent_col="parent_log_id") -> DataFrame:
        """Self-or-children fetch: ``id = @P OR parent_log_id = @P`` ordered
        by split_index (BigDataLogControl.cs:135), partition-scoped."""
        return (
            self.df()
            .where(F.col(self.user_col) == F.lit(user_id))
            .where((F.col(id_col) == F.lit(parent_id)) | (F.col(parent_col) == F.lit(parent_id)))
            .orderBy("split_index")
        )

    def scan(self, **kwargs) -> DataFrame:
        return filtered_scan(self.df(), user_col=self.user_col, **kwargs)

    def combined(
        self, user_id, parent_id, id_col="id", parent_col="parent_log_id"
    ) -> DataFrame:
        """E3, the reassembly read: GetCombinedLogChange(userId, parentId)
        (BigDataLogControl.cs:120-190) as ONE plan — gather self-or-children
        (O13) → ordered merge (O17). The reference's two service round-trips
        (point read, then gather query) and its client-side unsplit
        short-circuit (O18) collapse into the same group-and-merge: an
        unsplit parent is simply a 1-chunk group. Single shuffle on the
        record id, partition-pruned to one user."""
        from .tile import reassemble

        return reassemble(
            self.gather(user_id, parent_id, id_col=id_col, parent_col=parent_col),
            id_col=id_col,
            parent_col=parent_col,
        )


__all__ = ["LogStore", "filtered_scan"]
