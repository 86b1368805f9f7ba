"""Versioned tables: snapshot isolation + time travel on plain parquet.

Every mutation in this engine so far rewrites directories in place
(rollup refresh, merge_upsert, compaction) — correct for single-writer
batch, but a reader that lists files mid-rewrite sees a torn table, and
yesterday's state is gone. Table formats fix both with one idea: DATA
FILES ARE IMMUTABLE; only a tiny versioned manifest decides which files
ARE the table. This module is that idea on a plain directory, the same
commit protocol Delta's transaction log and Iceberg's snapshot list use:

- each commit writes NEW data files into its own subdirectory, then a
  version manifest (the complete file list), then atomically swaps the
  ``_latest`` pointer (os.rename — readers see wholly old or wholly new,
  never a mix; a crash before the swap leaves invisible garbage, never a
  torn table);
- ``read_table(..., version=N)`` is time travel: any retained version
  remains byte-identical readable, because nothing ever mutates a data
  file — reproducing last month's training set is reading last month's
  manifest;
- ``commit_compact`` rewrites small files into a new version WITHOUT
  touching the files older versions reference — layout maintenance stops
  being a correctness event for concurrent readers;
- ``vacuum`` deletes files unreferenced by retained versions — the only
  destructive operation, explicitly separated from the logical commits.

Single-writer by design (multi-writer needs a coordination primitive —
conditional-put on object stores; out of scope as it is for raw Delta
without a LogStore). Scale: a manifest lists file PATHS — partition-
listing cardinality, driver-side; data IO stays fully distributed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .io import DEFAULT_COMPRESSION

_VERSIONS = "_versions"
_LATEST = "_latest"


def _vdir(path: str) -> str:
    return os.path.join(path, _VERSIONS)


def _vfile(path: str, v: int) -> str:
    return os.path.join(_vdir(path), f"v{v:06d}.json")


def current_version(path: str) -> int | None:
    p = os.path.join(_vdir(path), _LATEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def _manifest(path: str, v: int) -> dict:
    with open(_vfile(path, v)) as f:
        return json.load(f)


def _rows_of(files: list[str]) -> dict[str, int]:
    """Footer row counts for a commit's NEW files (commit-sized metadata
    IO — inherited files carry their counts forward in the manifest)."""
    import pyarrow.parquet as pq

    return {f: pq.ParquetFile(f).metadata.num_rows for f in files}


def _write_commit(
    path: str,
    files: list[str],
    op: str,
    parent: int | None,
    file_rows: dict[str, int] | None = None,
    meta: dict | None = None,
) -> int:
    v = 1 if parent is None else parent + 1
    os.makedirs(_vdir(path), exist_ok=True)
    manifest = {
        "version": v,
        "op": op,
        "parent": parent,
        "ts_ms": int(time.time() * 1000),
        "files": sorted(files),
    }
    if file_rows is not None:
        manifest["file_rows"] = file_rows
    if meta is not None:
        manifest["meta"] = meta
    with open(_vfile(path, v), "w") as f:
        json.dump(manifest, f)
    # the commit point: an atomic pointer swap, never a partial state
    tmp = os.path.join(_vdir(path), f".{_LATEST}.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, os.path.join(_vdir(path), _LATEST))
    return v


def _stage_files(df: DataFrame, path: str, v_next: int) -> list[str]:
    """Write ``df`` as immutable files under a commit-unique directory."""
    cdir = os.path.join(path, "data", f"c{v_next:06d}-{uuid.uuid4().hex[:8]}")
    df.write.mode("error").option("compression", DEFAULT_COMPRESSION).parquet(cdir)
    return [
        os.path.join(cdir, f)
        for f in os.listdir(cdir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]


def commit_append(
    spark: SparkSession, path: str, df: DataFrame, meta: dict | None = None
) -> int:
    """Append ``df`` as a new version (old files + new files)."""
    parent = current_version(path)
    pm = _manifest(path, parent) if parent is not None else {}
    prior = pm.get("files", [])
    new = _stage_files(df, path, (parent or 0) + 1)
    rows = dict(pm.get("file_rows", {})) | _rows_of(new)
    return _write_commit(path, prior + new, "append", parent, rows, meta)


def commit_overwrite(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Replace the table contents in one atomic version step. Old
    versions keep reading their own files."""
    parent = current_version(path)
    new = _stage_files(df, path, (parent or 0) + 1)
    return _write_commit(path, new, "overwrite", parent, _rows_of(new))


def commit_compact(
    spark: SparkSession, path: str, num_files: int
) -> int:
    """Rewrite the CURRENT version's rows into ``num_files`` files as a
    new version — pure layout maintenance, logically a no-op: readers of
    any version (including the parent) are untouched."""
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no versions at {path}")
    df = read_table(spark, path, parent).coalesce(num_files)
    new = _stage_files(df, path, parent + 1)
    return _write_commit(path, new, "compact", parent, _rows_of(new))


def read_table(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """The table AS OF ``version`` (default: latest). Raises on a
    version whose files were vacuumed away."""
    v = current_version(path) if version is None else version
    if v is None:
        raise ValueError(f"no versions at {path}")
    files = _manifest(path, v)["files"]
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise ValueError(
            f"version {v} of {path} references {len(missing)} vacuumed file(s) "
            f"(e.g. {missing[0]}); only versions within the vacuum retention "
            f"window are readable"
        )
    return spark.read.parquet(*files)


def versions(path: str) -> list[dict]:
    """All retained version manifests, oldest first (op, ts, file count)."""
    if not os.path.isdir(_vdir(path)):
        return []
    out = []
    for f in sorted(os.listdir(_vdir(path))):
        if f.startswith("v") and f.endswith(".json"):
            out.append(_manifest(path, int(f[1:-5])))
    return out


def vacuum(path: str, keep_last: int = 2) -> tuple[int, int]:
    """Delete data files referenced ONLY by versions older than the last
    ``keep_last``, and drop those versions' manifests. Returns (files
    deleted, versions dropped). The one destructive operation — time
    travel shrinks to the retention window, exactly like Delta VACUUM."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = versions(path)
    if len(vs) <= keep_last:
        return 0, 0
    kept, dropped = vs[-keep_last:], vs[:-keep_last]
    live = {f for m in kept for f in m["files"]}
    doomed = {f for m in dropped for f in m["files"]} - live
    for f in doomed:
        if os.path.exists(f):
            os.remove(f)
        parent = os.path.dirname(f)
        if os.path.isdir(parent) and not os.listdir(parent):
            shutil.rmtree(parent, ignore_errors=True)
    for m in dropped:
        os.remove(_vfile(path, m["version"]))
    return len(doomed), len(dropped)


def commit_delete(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list,
    bloom_index_path: str | None = None,
) -> tuple[int, int, int]:
    """Targeted row deletion (GDPR/right-to-be-forgotten class) as a
    copy-on-write version commit. Returns (new version, files rewritten,
    files untouched).

    The expensive part of a compliance delete at 100 TB is not removing
    the rows — it is discovering which of 100k immutable files contain
    them. With a Bloom index over ``key_col`` (sources/bloomindex.py)
    only files that MAY contain a doomed key are rewritten (no false
    negatives ⇒ the delete is complete; false positives only cost a
    rewrite that drops nothing); without one, every file is rewritten.
    Untouched files are carried into the new version BY REFERENCE — the
    dominant fraction of the table is never read, and concurrent readers
    of older versions are unaffected (the deleted rows remain visible in
    pre-delete versions until ``vacuum`` ages them out — retention policy
    is where the compliance clock actually stops).
    """
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no versions at {path}")
    files = _manifest(path, parent)["files"]
    if bloom_index_path is not None:
        from .bloomindex import bloom_prune_files

        affected: set[str] = set()
        for k in keys:
            hit, _total = bloom_prune_files(spark, bloom_index_path, k)
            affected.update(hit)
        # the index may cover a superset/subset of this version's files
        affected &= set(files)
    else:
        affected = set(files)
    untouched = [f for f in files if f not in affected]
    parent_rows = _manifest(path, parent).get("file_rows", {})
    kept_counts = {f: parent_rows[f] for f in untouched if f in parent_rows}
    if not affected:
        return (
            _write_commit(path, untouched, "delete", parent, kept_counts),
            0,
            len(untouched),
        )
    doomed = spark.createDataFrame([(k,) for k in keys], f"{key_col} string") \
        if keys and isinstance(keys[0], str) else \
        spark.createDataFrame([(k,) for k in keys], f"{key_col} long")
    from pyspark.sql import functions as F

    kept_rows = (
        spark.read.parquet(*sorted(affected))
        .join(F.broadcast(doomed), key_col, "left_anti")
    )
    new = _stage_files(kept_rows, path, parent + 1)
    v = _write_commit(
        path, untouched + new, "delete", parent, kept_counts | _rows_of(new)
    )
    return v, len(affected), len(untouched)


def version_diff(
    spark: SparkSession, path: str, v_from: int, v_to: int
) -> tuple[DataFrame, DataFrame]:
    """Change data feed: (added_rows, removed_rows) between two versions.

    Because data files are immutable, a file present in both manifests
    contributes NOTHING to the diff — only the symmetric difference of
    the file lists is read. An append of 1 GB to a 100 TB table diffs in
    1 GB of IO; a naive two-sided EXCEPT would read 200 TB. Row-level
    semantics on the changed files are bag EXCEPTs in both directions
    (exceptAll), so a compaction — same rows, different files — yields
    empty diffs, and a delete yields its rows on the removed side only.
    Downstream incremental consumers (rollup refresh, index maintenance)
    subscribe to exactly this pair.
    """
    m_from = set(_manifest(path, v_from)["files"])
    m_to = set(_manifest(path, v_to)["files"])
    only_to = sorted(m_to - m_from)
    only_from = sorted(m_from - m_to)
    if not only_to and not only_from:
        empty = read_table(spark, path, v_to).limit(0)
        return empty, empty
    schema_src = read_table(spark, path, v_to)
    new_rows = (
        spark.read.parquet(*only_to) if only_to else schema_src.limit(0)
    )
    old_rows = (
        spark.read.parquet(*only_from) if only_from else schema_src.limit(0)
    )
    return new_rows.exceptAll(old_rows), old_rows.exceptAll(new_rows)


def fast_count(path: str, version: int | None = None) -> int:
    """COUNT(*) from commit metadata alone — zero data IO, no Spark job.

    Every commit records its new files' footer row counts and inherits
    the rest (Delta's numRecords add-file stat); summing the manifest
    answers the most common sanity query over a 100 TB table in
    milliseconds. Falls back to footer reads for any file a pre-stats
    manifest didn't record."""
    v = current_version(path) if version is None else version
    if v is None:
        raise ValueError(f"no versions at {path}")
    m = _manifest(path, v)
    rows = m.get("file_rows", {})
    missing = [f for f in m["files"] if f not in rows]
    return sum(rows[f] for f in m["files"] if f in rows) + sum(
        _rows_of(missing).values()
    )


def ingest_batch_handler(path: str):
    """foreachBatch handler appending each micro-batch as a version,
    exactly-once: the batch_id is recorded IN the commit manifest, so the
    transaction log doubles as the idempotence journal (the same move
    Delta's txn/appId-version action makes). Structured Streaming
    re-delivers the last uncommitted batch after a failure; a batch_id
    already present in any retained manifest is a no-op replay."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        for m in versions(path):
            if m.get("meta", {}).get("batch_id") == batch_id:
                return
        commit_append(
            batch_df.sparkSession, path, batch_df, meta={"batch_id": batch_id}
        )

    return _apply


def stream_to_versioned(events_stream: DataFrame, path: str, checkpoint_dir: str):
    """Exactly-once streaming ingest into a versioned table: every
    micro-batch becomes an atomic commit; readers always see a version
    boundary (never a half-written batch), time travel reaches any
    retained batch, and the CDC feed (version_diff) exposes each batch's
    rows to incremental consumers downstream."""
    from ..streaming.joins import write_foreach_batch

    return write_foreach_batch(events_stream, ingest_batch_handler(path), checkpoint_dir)
