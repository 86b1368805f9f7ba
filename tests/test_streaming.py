"""Structured Streaming integration tests: file source → availableNow
micro-batches → memory sink, compared against the batch run of the same
transformation; plus stateful cross-batch chunk reassembly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatatiler_spark.streaming.ingest import (
    EVENTS_STREAM_SCHEMA,
    dedup_within_watermark,
    stream_events,
    tumbling_counts,
)
from bigdatatiler_spark.streaming.reassemble import reassemble_stream
from bigdatatiler_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    """The same tumbling_counts transformation over a file stream must
    reproduce the batch result once the stream drains."""
    src = str(tmp_path / "landing")
    ev = table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    # two slices → at least two files in the landing zone
    ev.where(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)
    ev.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)

    stream = stream_events(spark, src, watermark="1 hour")
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start_ms"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    want = {
        (r["window_start_ms"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_counts(ev).collect()
    }
    assert got == want


def test_streaming_dedup(spark, tmp_path):
    src = str(tmp_path / "dupes")
    ev = table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).limit(50)
    ev.write.mode("append").parquet(src)
    ev.write.mode("append").parquet(src)  # duplicate delivery

    stream = stream_events(spark, src, watermark="1 hour")
    q = (
        dedup_within_watermark(stream)
        .select("event_id")
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id, count(*) c FROM dedup_test GROUP BY 1 HAVING count(*) > 1").collect()
    total = spark.sql("SELECT count(*) c FROM dedup_test").first()["c"]
    assert total == 50
    assert rows == []


def test_stateful_reassembly_across_batches(spark, tmp_path):
    """Chunks of one record arriving in different micro-batches must merge
    exactly once, in split order (applyInPandasWithState)."""
    src = str(tmp_path / "chunks")
    batch1 = spark.createDataFrame(
        [(1, 0, "AAA", 3), (1, 1, "BBB", 3), (2, 0, "solo", 1)],
        ["record_id", "split_index", "chunk", "total_splits"],
    )
    batch2 = spark.createDataFrame(
        [(1, 2, "CCC", 3)],
        ["record_id", "split_index", "chunk", "total_splits"],
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(batch1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        reassemble_stream(stream)
        .writeStream.format("memory")
        .queryName("reasm_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["record_id"]: (r["payload"], r["n_chunks"])
        for r in spark.sql("SELECT * FROM reasm_test").collect()
    }
    assert got == {1: ("AAABBBCCC", 3), 2: ("solo", 1)}
