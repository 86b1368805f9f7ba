"""Manifest-based file skipping: pruning is selective over a clustered
layout, conservative without stats, and never changes query results."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdatatiler_spark.sources.layout import write_clustered
from bigdatatiler_spark.sources.manifest import (
    build_manifest,
    prune_files,
    scan_pruned,
)
from bigdatatiler_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("manifest")
    data = str(root / "events")
    man = str(root / "manifest")
    ev = table(spark, SF, "events").select("event_id", "ts", "user_id", "value")
    write_clustered(ev, data, cluster_by=("ts",), num_files=8)
    n = build_manifest(spark, data, "ts", man)
    assert n == 8
    return data, man, ev


def _bounds(ev):
    row = ev.agg(F.min("ts"), F.max("ts")).first()
    return row[0], row[1]


def test_narrow_range_opens_few_files_same_answer(spark, clustered):
    data, man, ev = clustered
    lo_ts, hi_ts = _bounds(ev)
    span = hi_ts - lo_ts
    lo = lo_ts + span * 2 // 8
    hi = lo_ts + span * 3 // 8  # ~1/8 of the time range

    files, total = prune_files(spark, man, lo, hi)
    assert total == 8
    # ts-clustered files have near-disjoint envelopes: a 1/8 range
    # intersects at most a couple of them
    assert 1 <= len(files) <= 3

    got = scan_pruned(spark, man, "ts", lo, hi)
    want = ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    assert sorted(r["event_id"] for r in got.collect()) == sorted(
        r["event_id"] for r in want.collect()
    )
    assert got.count() > 0


def test_full_range_keeps_every_file(spark, clustered):
    _data, man, ev = clustered
    lo_ts, hi_ts = _bounds(ev)
    files, total = prune_files(
        spark, man, lo_ts, hi_ts + dt.timedelta(seconds=1)
    )
    assert len(files) == total == 8


def test_disjoint_range_prunes_everything_and_scan_refuses(spark, clustered):
    _data, man, ev = clustered
    _lo, hi_ts = _bounds(ev)
    lo = hi_ts + dt.timedelta(days=365)
    hi = lo + dt.timedelta(days=1)
    files, _ = prune_files(spark, man, lo, hi)
    assert files == []
    with pytest.raises(ValueError):
        scan_pruned(spark, man, "ts", lo, hi)


def test_update_manifest_tracks_appends_and_compaction(spark, tmp_path):
    from bigdatatiler_spark.sources.manifest import update_manifest

    data = str(tmp_path / "t")
    man = str(tmp_path / "m")
    ev = table(spark, SF, "events").select("event_id", "ts", "value")
    half = ev.filter(F.col("event_id") % 2 == 0)
    write_clustered(half, data, cluster_by=("ts",), num_files=4)
    assert build_manifest(spark, data, "ts", man) == 4

    # append: only the 2 new files get their footers read
    other = ev.filter(F.col("event_id") % 2 == 1)
    write_clustered(other, data + "_new", cluster_by=("ts",), num_files=2)
    import os
    import shutil as sh

    for f in os.listdir(data + "_new"):
        if f.endswith(".parquet"):
            sh.move(f"{data}_new/{f}", f"{data}/{f}")
    added, removed = update_manifest(spark, data, "ts", man)
    assert (added, removed) == (2, 0)
    assert spark.read.parquet(man).count() == 6

    # no-op refresh
    assert update_manifest(spark, data, "ts", man) == (0, 0)

    # pruned scan over the updated manifest still matches a plain filter
    lo_ts, hi_ts = _bounds(ev)
    span = hi_ts - lo_ts
    lo, hi = lo_ts + span * 3 // 8, lo_ts + span * 4 // 8
    got = scan_pruned(spark, man, "ts", lo, hi)
    want = ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    assert sorted(r["event_id"] for r in got.collect()) == sorted(
        r["event_id"] for r in want.collect()
    )


def test_missing_stats_kept_conservatively(spark, tmp_path):
    # a manifest row with NULL bounds (no footer stats) must survive pruning
    rows = [("f1", 10, 0.0, 1.0), ("f2", 10, None, None)]
    m = spark.createDataFrame(rows, "path string, n_rows long, vmin double, vmax double")
    man = str(tmp_path / "m")
    m.write.parquet(man)
    files, total = prune_files(spark, man, 5.0, 6.0)
    assert total == 2 and files == ["f2"]
