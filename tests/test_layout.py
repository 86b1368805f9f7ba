"""Physical-layout contracts: range-clustered writes must produce
disjoint per-file key ranges (verified from the parquet footers
themselves, not from Spark's own reporting), and compaction must hit the
target file count without losing rows."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bigdatatiler_spark.sources.layout import (
    _data_files,
    compact_table,
    table_file_stats,
    write_clustered,
)

SF = "/root/testdata/sf0.001"


def _file_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` read from parquet row-group
    statistics — the exact metadata a scan uses to skip."""
    ranges = []
    for f in sorted(_data_files(path)):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max, "stats missing"
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def test_write_clustered_produces_disjoint_sorted_files(spark, tmp_path):
    out = str(tmp_path / "orders_clustered")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n = orders.count()
    write_clustered(orders, out, ("o_orderdate",), num_files=4)

    back = spark.read.parquet(out)
    assert back.count() == n

    ranges = sorted(_file_ranges(out, "o_orderdate"))
    assert len(ranges) == 4
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"file ranges overlap: {hi} > {lo}"


def test_clustered_scan_pushes_range_predicate(spark, tmp_path):
    """The point of the layout: a range filter must reach the parquet
    scan as a pushed filter so the disjoint file stats can prune."""
    out = str(tmp_path / "orders_clustered2")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_clustered(orders, out, ("o_orderdate",), num_files=4)

    q = spark.read.parquet(out).where(F.col("o_orderdate") < "1993-01-01")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderdate" in plan.split("PushedFilters")[1][:200]


def test_compact_table_hits_target_and_keeps_rows(spark, tmp_path):
    frag = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n = orders.count()
    # simulate streaming-ingest fragmentation: 64 tiny files
    orders.repartition(64).write.parquet(frag)
    assert table_file_stats(frag)["n_files"] == 64

    total = table_file_stats(frag)["total_bytes"]
    stats = compact_table(spark, frag, out, target_file_bytes=total // 3 + 1)
    assert stats["files_before"] == 64
    assert stats["files_after"] <= 3
    assert spark.read.parquet(out).count() == n
