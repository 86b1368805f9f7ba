"""Versioned tables (sources/versioned.py): snapshot isolation, time
travel, compaction-as-no-op, vacuum retention, crash invisibility."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatatiler_spark.sources.versioned import (
    commit_append,
    commit_compact,
    commit_overwrite,
    current_version,
    read_table,
    vacuum,
    versions,
)
from bigdatatiler_spark.tables import table

SF = "/root/testdata/sf0.001"


def _ids(df) -> list[int]:
    return sorted(r.event_id for r in df.select("event_id").collect())


@pytest.fixture()
def ev(spark):
    return table(spark, SF, "events").select("event_id", "user_id", "event_type")


def test_append_and_time_travel(spark, tmp_path, ev):
    path = str(tmp_path / "t")
    first = ev.where(F.col("event_id") < 500)
    second = ev.where(F.col("event_id") >= 500)
    v1 = commit_append(spark, path, first)
    v2 = commit_append(spark, path, second)
    assert (v1, v2) == (1, 2)
    assert current_version(path) == 2
    # latest sees everything; v1 still sees exactly the first batch
    assert _ids(read_table(spark, path)) == _ids(ev)
    assert _ids(read_table(spark, path, version=1)) == _ids(first)


def test_overwrite_isolates_old_readers(spark, tmp_path, ev):
    path = str(tmp_path / "t")
    commit_append(spark, path, ev.where(F.col("event_id") < 100))
    commit_overwrite(spark, path, ev.where(F.col("event_id") >= 900))
    assert _ids(read_table(spark, path, version=1)) == _ids(
        ev.where(F.col("event_id") < 100)
    )
    assert _ids(read_table(spark, path)) == _ids(ev.where(F.col("event_id") >= 900))


def test_compact_is_logically_noop(spark, tmp_path, ev):
    path = str(tmp_path / "t")
    # many small files via many partitions
    commit_append(spark, path, ev.repartition(16))
    n_before = len(versions(path)[-1]["files"])
    v = commit_compact(spark, path, num_files=2)
    n_after = len(versions(path)[-1]["files"])
    assert n_after < n_before
    assert _ids(read_table(spark, path, version=v)) == _ids(
        read_table(spark, path, version=v - 1)
    )


def test_vacuum_enforces_retention(spark, tmp_path, ev):
    path = str(tmp_path / "t")
    commit_append(spark, path, ev.where(F.col("event_id") < 100))
    commit_overwrite(spark, path, ev.where(F.col("event_id") < 200))
    commit_overwrite(spark, path, ev.where(F.col("event_id") < 300))
    deleted, dropped = vacuum(path, keep_last=2)
    assert deleted > 0 and dropped == 1
    # retained versions still read; the vacuumed one fails with a clear error
    assert len(_ids(read_table(spark, path, version=3))) == 300
    assert len(_ids(read_table(spark, path, version=2))) == 200
    with pytest.raises((ValueError, FileNotFoundError)):
        read_table(spark, path, version=1)


def test_uncommitted_staging_is_invisible(spark, tmp_path, ev):
    """A crashed writer leaves data files but no manifest/pointer swap —
    readers must see the previous version exactly."""
    path = str(tmp_path / "t")
    commit_append(spark, path, ev.where(F.col("event_id") < 100))
    # simulate a crash: stage files directly without committing
    from bigdatatiler_spark.sources.versioned import _stage_files

    _stage_files(ev.where(F.col("event_id") >= 100), path, 99)
    assert current_version(path) == 1
    assert len(_ids(read_table(spark, path))) == 100


def test_targeted_delete_with_bloom_index(spark, tmp_path, ev):
    """Copy-on-write delete: doomed keys gone from the new version,
    everything else intact, untouched files carried by REFERENCE (the
    bloom index bounds the rewrite set), and time travel still shows
    the pre-delete state."""
    import os

    from bigdatatiler_spark.sources.bloomindex import build_bloom_index
    from bigdatatiler_spark.sources.versioned import commit_delete

    path = str(tmp_path / "t")
    # user-bucketed layout → event_id spread across all files
    commit_append(spark, path, ev.repartition(8, "user_id"))
    m1 = versions(path)[-1]["files"]
    idx = os.path.join(str(tmp_path), "idx")
    build_bloom_index(spark, path, "event_id", idx, fpp=0.01)

    doomed = [3, 400, 777]
    v, rewritten, untouched = commit_delete(
        spark, path, "event_id", doomed, bloom_index_path=idx
    )
    assert v == 2
    # bloom bounds the rewrite: 3 keys live in ≤3 files (+ rare fp)
    assert rewritten <= 4 and untouched >= len(m1) - 4

    after = _ids(read_table(spark, path))
    assert set(doomed).isdisjoint(after)
    assert sorted(after + doomed) == _ids(ev)
    # time travel: v1 still has the rows
    assert set(doomed) <= set(_ids(read_table(spark, path, version=1)))
    # untouched files are the same physical paths, not copies
    m2 = set(versions(path)[-1]["files"])
    assert len(m2 & set(m1)) == untouched


def test_delete_without_index_rewrites_everything_but_is_correct(spark, tmp_path, ev):
    from bigdatatiler_spark.sources.versioned import commit_delete

    path = str(tmp_path / "t")
    commit_append(spark, path, ev.repartition(4, "user_id"))
    v, rewritten, untouched = commit_delete(spark, path, "event_id", [1, 2])
    assert untouched == 0 and rewritten > 0
    after = _ids(read_table(spark, path))
    assert 1 not in after and 2 not in after
    assert len(after) == len(_ids(ev)) - 2


def test_version_diff_reads_only_changed_files(spark, tmp_path, ev):
    """CDC semantics: append → rows on added side; delete → removed side;
    compaction → EMPTY diff (same rows, new files)."""
    from bigdatatiler_spark.sources.versioned import commit_delete, version_diff

    path = str(tmp_path / "t")
    commit_append(spark, path, ev.where(F.col("event_id") < 500).repartition(4))
    commit_append(spark, path, ev.where(F.col("event_id") >= 500).repartition(4))
    added, removed = version_diff(spark, path, 1, 2)
    assert _ids(added) == _ids(ev.where(F.col("event_id") >= 500))
    assert removed.count() == 0

    commit_delete(spark, path, "event_id", [10, 20])
    added, removed = version_diff(spark, path, 2, 3)
    assert added.count() == 0
    assert _ids(removed) == [10, 20]

    commit_compact(spark, path, num_files=2)
    added, removed = version_diff(spark, path, 3, 4)
    assert added.count() == 0 and removed.count() == 0


def test_fast_count_matches_data_and_survives_all_commit_types(spark, tmp_path, ev):
    from bigdatatiler_spark.sources.versioned import commit_delete, fast_count

    path = str(tmp_path / "t")
    commit_append(spark, path, ev.where(F.col("event_id") < 600).repartition(4))
    assert fast_count(path) == 600
    commit_append(spark, path, ev.where(F.col("event_id") >= 600).repartition(3))
    n_total = ev.count()
    assert fast_count(path) == n_total
    commit_delete(spark, path, "event_id", [5, 6, 7])
    assert fast_count(path) == n_total - 3
    commit_compact(spark, path, num_files=2)
    assert fast_count(path) == n_total - 3
    # older versions answer from their own manifests
    assert fast_count(path, version=1) == 600


def test_streaming_ingest_exactly_once(spark, tmp_path, ev):
    """Three micro-batches → three version commits whose union equals
    the batch table; a replayed batch_id is a no-op."""
    from bigdatatiler_spark.sources.versioned import (
        fast_count,
        ingest_batch_handler,
        stream_to_versioned,
    )

    src = str(tmp_path / "src")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    path = str(tmp_path / "t")
    q = stream_to_versioned(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert current_version(path) == 3
    assert _ids(read_table(spark, path)) == _ids(ev)
    assert fast_count(path) == ev.count()
    # replay the last committed batch — version count must not move
    batch_ids = [m["meta"]["batch_id"] for m in versions(path)]
    ingest_batch_handler(path)(ev, max(batch_ids))
    assert current_version(path) == 3
