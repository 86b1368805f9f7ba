"""Physical data layout: range-clustered writes and size-targeted
compaction.

The reference's only layout policy is the 1.5 MB per-document cap
(LogChange.cs:23-24) — a single-node store doesn't need more. A 100 TB
parquet table needs two more:

- **Clustered (sorted) layout** for data skipping: rows range-partitioned
  and sorted on the columns queries filter by, so every file (and every
  row group inside it) covers a narrow, non-overlapping key range.
  Parquet stores per-row-group min/max stats; a pushed-down predicate
  then skips whole row groups / files instead of scanning the table.
  This is the open-analogue of clustering keys in any warehouse, built
  from two primitives Spark already has: `repartitionByRange` (sampled
  range exchange → equal-sized, ordered output partitions — no global
  sort materialization on one node) + `sortWithinPartitions`.

- **Compaction** for the small-files problem: streaming ingest and
  per-partition appends leave thousands of KB-sized files; each file
  costs a task + a footer read + a metadata entry, so scan cost drifts
  away from data cost. Compaction rewrites a table at a target file
  size with the SAME clustering, restoring the skip-friendly layout.

Both are plain batch jobs over DataFrames — at 100 TB they run per
partition-directory (compact yesterday's partition, not the table).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

from .io import DEFAULT_COMPRESSION

#: target bytes per parquet file after compaction (128 MB — one HDFS-ish
#: block: big enough to amortize footers/tasks, small enough to parallelize)
DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: tuple[str, ...],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``num_files`` range-clustered, internally sorted
    parquet files on ``cluster_by``.

    `repartitionByRange` samples the keys and assigns contiguous,
    non-overlapping ranges to partitions (one ordered shuffle, skew-aware
    via sampling); `sortWithinPartitions` orders rows inside each, so
    parquet's row-group min/max stats are tight. A subsequent scan with a
    pushed filter on the leading cluster column touches only the files
    whose range intersects the predicate.
    """
    if not cluster_by:
        raise ValueError("cluster_by must name at least one column")
    (
        df.repartitionByRange(num_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .option("compression", DEFAULT_COMPRESSION)
        .parquet(path)
    )


def _data_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]


def table_file_stats(path: str) -> dict:
    """{'n_files': int, 'total_bytes': int, 'avg_bytes': float} for a
    (non-partitioned) parquet directory — the compaction trigger input.

    At 100 TB this comes from the table metadata / listing service, not a
    local listdir; the decision logic is the same: compact when
    avg_bytes drifts far below the target."""
    files = _data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "avg_bytes": (total / len(files)) if files else 0.0,
    }


def compact_table(
    spark: SparkSession,
    path: str,
    out_path: str,
    cluster_by: tuple[str, ...] = (),
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_file_bytes)`` files at ``out_path``,
    re-clustered on ``cluster_by`` when given (else coalesced without a
    shuffle). Returns {'files_before', 'files_after'}.

    Writing to a fresh directory then swapping is deliberate: a compactor
    must never destroy the only copy mid-rewrite. On a real cluster the
    swap is an atomic metadata commit (table format / HMS); here the
    caller renames."""
    before = table_file_stats(path)
    n_out = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    df = spark.read.parquet(path)
    if cluster_by:
        write_clustered(df, out_path, cluster_by, n_out, mode="overwrite")
    else:
        # coalesce: merges partitions without a shuffle — the cheap path
        # when the existing row order is fine and only file count is wrong
        (
            df.coalesce(n_out)
            .write.mode("overwrite")
            .option("compression", DEFAULT_COMPRESSION)
            .parquet(out_path)
        )
    return {"files_before": before["n_files"], "files_after": len(_data_files(out_path))}
