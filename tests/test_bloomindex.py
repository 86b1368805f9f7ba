"""Bloom-filter file index (sources/bloomindex.py): no false negatives,
real skipping on a hostile layout, and a sane false-positive rate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatatiler_spark.sources.bloomindex import (
    bloom_prune_files,
    build_bloom_index,
    point_read_bloom,
)
from bigdatatiler_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def indexed_events(spark, tmp_path_factory):
    """events hash-bucketed by user_id (the co-located-user-join layout)
    — each user's events span the whole month, so every file's event_id
    envelope covers ~the full id domain and min/max prunes NOTHING for
    id point reads. Exactly where the Bloom index earns its keep.
    (A time-clustered layout wouldn't do here: the generator assigns
    event_ids in ts order, so time files ARE id-clustered.)"""
    root = tmp_path_factory.mktemp("bloom")
    data_path = os.path.join(root, "events")
    index_path = os.path.join(root, "events_bloom_idx")
    ev = table(spark, SF, "events")
    ev.repartition(8, "user_id").write.mode("overwrite").parquet(data_path)
    n = build_bloom_index(spark, data_path, "event_id", index_path, fpp=0.01)
    assert n >= 4  # empty hash buckets may not produce a file
    return data_path, index_path, ev


def test_point_read_no_false_negative(spark, indexed_events):
    data_path, index_path, ev = indexed_events
    # every 37th key must be found — Bloom never false-negatives
    keys = [r.event_id for r in ev.select("event_id").collect()][::37]
    for key in keys:
        got = point_read_bloom(spark, index_path, "event_id", key)
        assert got is not None, f"key {key} wrongly pruned everywhere"
        rows = got.collect()
        assert [r.event_id for r in rows] == [key]


def test_skipping_is_real(spark, indexed_events):
    """A single key lives in one file; the index must prune most of the
    rest (fpp=0.01 over ~8 files ⇒ usually 1 surviving file)."""
    data_path, index_path, ev = indexed_events
    keys = [r.event_id for r in ev.select("event_id").limit(20).collect()]
    survived = 0
    total = None
    for key in keys:
        files, total = bloom_prune_files(spark, index_path, key)
        assert files, "false negative"
        survived += len(files)
    # perfect skipping would be 20 files for 20 keys; allow fp slack
    assert survived <= 20 + 10, f"{survived} files survived for 20 keys of {total}"


def test_definitive_miss_short_circuits(spark, indexed_events):
    """A key absent from the table: overwhelmingly likely to prune every
    file → None, meaning the read answers 'no rows' with ZERO data IO."""
    data_path, index_path, _ev = indexed_events
    missing = 10_000_000_019  # far outside the generator's id range
    result = point_read_bloom(spark, index_path, "event_id", missing)
    if result is not None:  # rare fp on some file — still exact
        assert result.count() == 0


def test_minmax_would_not_have_pruned(spark, indexed_events):
    """Sanity of the motivating claim: on the time-clustered layout the
    per-file event_id envelopes all overlap the full domain, so min/max
    skipping keeps ~every file while Bloom keeps ~one."""
    import pyarrow.parquet as pq

    data_path, _index_path, _ev = indexed_events
    from bigdatatiler_spark.sources.manifest import _data_files

    spans = []
    for f in _data_files(data_path):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("event_id")
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append((lo, hi))
    overall_lo = min(s[0] for s in spans)
    overall_hi = max(s[1] for s in spans)
    covering = sum(
        1 for lo, hi in spans if lo <= overall_lo + (overall_hi - overall_lo) * 0.1
        and hi >= overall_hi - (overall_hi - overall_lo) * 0.1
    )
    assert covering >= len(spans) // 2, "layout unexpectedly id-clustered"
