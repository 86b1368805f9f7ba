"""Manifest-based file skipping: table-level min/max statistics.

Parquet already prunes row groups from footer stats — but at 100 TB the
footers themselves are the bottleneck: a scan over a 100k-file table
opens 100k footers (one round trip each on an object store) just to
discover that 99k files are irrelevant. Table formats (Iceberg
manifests, Delta's add-file stats) solve this by hoisting per-file
min/max into a small *manifest* consulted before any data file is
opened. This module is that structure on plain parquet directories:

- ``build_manifest``: one footer read per file, distributed over
  executors via ``mapInPandas`` (a footer is a few KB — the build cost
  is metadata IO, not data IO), written as a small parquet manifest.
- ``prune_files``: the file paths whose [min, max] envelope intersects a
  predicate range — driver-side over the manifest (thousands of rows,
  the same cardinality class as a partition listing).
- ``scan_pruned``: read ONLY the surviving files, with the residual
  filter still applied (stats prune conservatively; the filter is what
  guarantees correctness, the manifest is what guarantees the 99k
  irrelevant files are never opened).

Works best over clustered layouts (sources/layout.py write_clustered /
write_zordered): tight, non-overlapping per-file envelopes are what make
the intersection test selective. Values are compared in double precision
(timestamps as epoch micros) — exact for timestamps and for integers up
to 2^53; columns beyond that need a widened manifest schema.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = "path string, n_rows long, vmin double, vmax double"


def _coerce(v: Any) -> float | None:
    """Statistics value → comparable double (timestamps → epoch micros)."""
    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return v.timestamp() * 1e6
    if isinstance(v, _dt.date):
        return (
            _dt.datetime(v.year, v.month, v.day, tzinfo=_dt.timezone.utc).timestamp()
            * 1e6
        )
    return float(v)


def _data_files(table_path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(table_path):
        if any(seg.startswith("_") for seg in root.split(os.sep)):
            continue
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return sorted(out)


def _write_stats(
    spark: SparkSession, files: list[str], stat_col: str, out_path: str
) -> None:
    """Distributed footer-stat collection for ``files`` → parquet at
    ``out_path``. The driver handles only the file LIST; footer reads
    (a few KB each) fan out over executors via mapInPandas."""
    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        min(len(files), 64)
    )

    def _stats(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                idx = md.schema.to_arrow_schema().get_field_index(stat_col)
                vmin: float | None = None
                vmax: float | None = None
                ok = idx >= 0
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics if ok else None
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    lo, hi = _coerce(st.min), _coerce(st.max)
                    vmin = lo if vmin is None else min(vmin, lo)
                    vmax = hi if vmax is None else max(vmax, hi)
                # a file without stats keeps NULL bounds → never pruned
                rows.append(
                    (p, md.num_rows, vmin if ok else None, vmax if ok else None)
                )
            yield pd.DataFrame(rows, columns=["path", "n_rows", "vmin", "vmax"])

    fdf.mapInPandas(_stats, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out_path)


def build_manifest(
    spark: SparkSession, table_path: str, stat_col: str, manifest_path: str
) -> int:
    """Collect per-file (row count, min, max) of ``stat_col`` into a
    parquet manifest. Returns the number of files indexed. Use
    ``update_manifest`` after appends/compaction — a full rebuild is only
    needed when ``stat_col`` changes."""
    files = _data_files(table_path)
    if not files:
        raise ValueError(f"no parquet data files under {table_path}")
    _write_stats(spark, files, stat_col, manifest_path)
    return len(files)


def update_manifest(
    spark: SparkSession, table_path: str, stat_col: str, manifest_path: str
) -> tuple[int, int]:
    """Incremental manifest maintenance: index only files not yet in the
    manifest and drop entries whose files vanished (compaction, partition
    overwrite). Returns (added, removed). Cost tracks the CHANGED files —
    an append-heavy table re-reads no old footers; a full rebuild is only
    ever needed if ``stat_col`` changes."""
    current = set(_data_files(table_path))
    known = {
        r["path"] for r in spark.read.parquet(manifest_path).select("path").collect()
    }
    added_files = sorted(current - known)
    removed = known - current
    if not added_files and not removed:
        return 0, 0
    kept = spark.read.parquet(manifest_path)
    if removed:
        kept = kept.filter(~F.col("path").isin(sorted(removed)))
    tmp = manifest_path.rstrip("/") + "._adds"
    if added_files:
        _write_stats(spark, added_files, stat_col, tmp)
        kept = kept.unionByName(spark.read.parquet(tmp))
    # a manifest is partition-listing-sized; stage through the driver to
    # sidestep read-and-overwrite-same-path (the object-store version
    # writes a new manifest file and swaps a pointer, Iceberg-style)
    staged = kept.collect()
    spark.createDataFrame(staged, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(manifest_path)
    if added_files:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return len(added_files), len(removed)


def prune_files(
    spark: SparkSession, manifest_path: str, lo: Any, hi: Any
) -> tuple[list[str], int]:
    """File paths whose [vmin, vmax] envelope intersects [lo, hi]
    (half-open: lo inclusive, hi exclusive), plus the total file count.
    NULL-bounded files (no stats) are conservatively kept."""
    flo, fhi = _coerce(lo), _coerce(hi)
    m = spark.read.parquet(manifest_path)
    total = m.count()
    keep = m.filter(
        F.col("vmin").isNull()
        | F.col("vmax").isNull()
        | ((F.col("vmax") >= F.lit(flo)) & (F.col("vmin") < F.lit(fhi)))
    )
    return sorted(r["path"] for r in keep.select("path").collect()), total


def scan_pruned(
    spark: SparkSession,
    manifest_path: str,
    stat_col: str,
    lo: Any,
    hi: Any,
) -> DataFrame:
    """Manifest-pruned range scan: open only intersecting files, then
    apply the exact residual predicate ``lo <= stat_col < hi``."""
    files, _total = prune_files(spark, manifest_path, lo, hi)
    if not files:
        raise ValueError(
            "manifest pruned every file — empty-result reads should "
            "short-circuit in the caller (no schema to infer from zero files)"
        )
    df = spark.read.parquet(*files)
    return df.filter((F.col(stat_col) >= F.lit(lo)) & (F.col(stat_col) < F.lit(hi)))
