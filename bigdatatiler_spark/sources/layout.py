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


# --- Z-order (Morton) clustering ------------------------------------------
# Range-clustering on ONE column gives perfect skipping on that column and
# none on any other. Z-ordering interleaves the bits of two filter columns
# into a single sort key, so a range-clustered write on the key yields
# files/row-groups whose min/max stats are narrow on BOTH dimensions —
# the lakehouse-standard layout for tables queried by two independent
# predicates (here: user and time, the reference's two query axes).
#
# Raw values interleave badly when one dimension's varying bits sit higher
# than the other's (e.g. epoch-hours ~2^14 vs a handful of user ids — the
# Morton key then degenerates to a plain time sort). So, as in production
# Z-order implementations, each dimension is first min/max-normalized onto
# the SAME bit width; the interleave runs on the normalized coordinates.
# All of it is integer arithmetic — identical in Spark and DuckDB, so the
# key is oracle-checkable like any other operator.

ZORDER_BITS = 8  # per-dimension resolution after normalization (256 tiles)


def zorder_key(col_a: str, col_b: str, bits: int = ZORDER_BITS):
    """Morton key over already-normalized coordinates: bit i of ``col_a``
    → key bit 2i, bit i of ``col_b`` → key bit 2i+1. A sequential integer
    fold — codegen'd, deterministic, no UDF."""
    from pyspark.sql import functions as F

    return F.expr(
        f"""aggregate(sequence(0, {bits - 1}), 0L, (acc, i) ->
              acc + shiftleft(CAST(({col_a} >> i) & 1 AS BIGINT), CAST(2*i AS INT))
                  + shiftleft(CAST(({col_b} >> i) & 1 AS BIGINT), CAST(2*i+1 AS INT)))"""
    )


def _scale_expr(col: str, lo: str, hi: str, bits: int) -> str:
    """(col-lo) rescaled onto [0, 2^bits-1] by integer division — order-
    preserving, engine-exact. Runs in DECIMAL(38,0): with extreme key
    ranges (fuzz round 4: user_id = -2^62) both (col-lo) and the ·top
    product overflow BIGINT — Spark would wrap silently, DuckDB errors.
    The numerator is non-negative (col ≥ lo), so the truncating `div`
    matches the oracle's HUGEINT `//` exactly."""
    top = (1 << bits) - 1
    return (
        f"CAST(((CAST({col} AS DECIMAL(38,0)) - {lo}) * {top})"
        f" div greatest(CAST({hi} AS DECIMAL(38,0)) - {lo}, 1) AS BIGINT)"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int,
    bits: int = ZORDER_BITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered on the Morton key of (col_a, col_b):
    min/max-normalize both dimensions (one tiny 1-row aggregate), then
    one sampled range exchange + in-partition sort on the interleaved
    key, so every file covers a small tile of the 2-D space and parquet
    min/max stats stay tight on BOTH columns. Same plan shape (and cost)
    as write_clustered plus the bounds aggregate."""
    from pyspark.sql import functions as F

    b = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    ).first()
    if b["a_lo"] is None or b["b_lo"] is None:
        # empty input (or all-null dims): nothing to cluster — write the
        # empty table with its schema instead of interpolating None into SQL
        df.write.mode(mode).option("compression", DEFAULT_COMPRESSION).parquet(path)
        return
    na = _scale_expr(col_a, str(b["a_lo"]), str(b["a_hi"]), bits)
    nb = _scale_expr(col_b, str(b["b_lo"]), str(b["b_hi"]), bits)
    (
        df.withColumn("__na", F.expr(na))
        .withColumn("__nb", F.expr(nb))
        .withColumn("__zkey", zorder_key("__na", "__nb", bits))
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__na", "__nb", "__zkey")
        .write.mode(mode)
        .option("compression", DEFAULT_COMPRESSION)
        .parquet(path)
    )


def _zorder_oracle() -> str:
    b = ZORDER_BITS
    top = (1 << b) - 1
    return f"""
    WITH raw AS (
      SELECT event_id,
             user_id AS u,
             epoch_ms(date_trunc('milliseconds', ts)) // 3600000 AS hr
      FROM events
    ),
    bounds AS (
      SELECT event_id, u, hr,
             min(u) OVER () AS u_lo, max(u) OVER () AS u_hi,
             min(hr) OVER () AS h_lo, max(hr) OVER () AS h_hi
      FROM raw
    ),
    dims AS (
      -- HUGEINT: extreme ids (fuzz 4: -2^62) overflow the BIGINT product
      SELECT event_id,
             CAST(((CAST(u AS HUGEINT) - u_lo) * {top})
                  // greatest(CAST(u_hi AS HUGEINT) - u_lo, 1) AS BIGINT) AS u8,
             CAST(((CAST(hr AS HUGEINT) - h_lo) * {top})
                  // greatest(CAST(h_hi AS HUGEINT) - h_lo, 1) AS BIGINT) AS t8
      FROM bounds
    )
    SELECT event_id, u8, t8,
           CAST(list_sum([((u8 >> i) & 1) << (2*i)
                     FOR i IN generate_series(0, {b - 1})])
         + list_sum([((t8 >> i) & 1) << (2*i+1)
                     FOR i IN generate_series(0, {b - 1})]) AS BIGINT) AS zkey
    FROM dims
    """


def _register_zorder_query() -> None:
    from pyspark.sql import DataFrame as _DF, SparkSession, functions as F

    from ..registry import register
    from ..tables import table

    @register("events_zorder_key", oracle=_zorder_oracle())
    def events_zorder_key(spark: SparkSession, sf_dir: str) -> _DF:
        """The Z-order layout key as a first-class operator: per event,
        its min/max-normalized (user, epoch-hour) tile coordinates and
        Morton key — the sort key write_zordered clusters on. The bounds
        are a 1-row broadcast aggregate (the oracle's window-over-()
        formulation is the independent cross-check); everything else is a
        map-only projection. The layout win the key buys is measured in
        tests/test_layout.py from parquet footer min/max ranges."""
        b = ZORDER_BITS
        ev = table(spark, sf_dir, "events").select(
            "event_id",
            F.col("user_id").alias("u"),
            F.expr("unix_millis(ts) div 3600000").alias("hr"),
        )
        bounds = F.broadcast(
            ev.agg(
                F.min("u").alias("u_lo"),
                F.max("u").alias("u_hi"),
                F.min("hr").alias("h_lo"),
                F.max("hr").alias("h_hi"),
            )
        )
        dims = ev.crossJoin(bounds).select(
            "event_id",
            F.expr(_scale_expr("u", "u_lo", "u_hi", b)).alias("u8"),
            F.expr(_scale_expr("hr", "h_lo", "h_hi", b)).alias("t8"),
        )
        return dims.withColumn("zkey", zorder_key("u8", "t8", b))


_register_zorder_query()
