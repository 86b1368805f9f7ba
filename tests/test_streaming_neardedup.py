"""Streaming near-dedup parity (r10 verdict #5): the micro-batch banded
MinHash fold must land on EXACTLY the batch ``dedup_minhash_lsh`` pair
set regardless of how the source splits into micro-batches, and must be
idempotent under at-least-once redelivery (a replayed batch appends
nothing — first arrival wins on doc_id)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from bigdatatiler_spark.registry import load_all
from bigdatatiler_spark.streaming.parity import (
    _read_neardedup_results,
    neardedup_apply_batch,
)


@pytest.fixture(scope="module")
def split_sf_dir(tmp_path_factory):
    """documents split into THREE member files — with
    maxFilesPerTrigger=1 the AvailableNow run takes ≥3 real micro-batch
    transitions, so cross-batch pair discovery (new ⋈ index) is
    exercised, not just the single-batch degenerate case."""
    dest = tmp_path_factory.mktemp("split_docs")
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    ddir = dest / "documents.parquet"
    os.makedirs(ddir)
    third = tbl.num_rows // 3
    pq.write_table(tbl.slice(0, third), str(ddir / "part-a.parquet"))
    pq.write_table(tbl.slice(third, third), str(ddir / "part-b.parquet"))
    pq.write_table(tbl.slice(2 * third), str(ddir / "part-c.parquet"))
    return str(dest)


def _pair_set(df):
    return {tuple(r) for r in df.collect()}


def test_multibatch_parity_equals_batch_lsh(spark, split_sf_dir):
    specs = load_all()
    streamed = specs["docs_streaming_neardedup_parity"].fn(spark, split_sf_dir)
    batch = specs["dedup_minhash_lsh"].fn(spark, split_sf_dir)
    got, want = _pair_set(streamed), _pair_set(batch)
    assert got == want, (
        f"streamed {len(got)} pairs != batch {len(want)}; "
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
    assert len(want) > 0, "fixture must contain near-dup pairs for the test to bite"


def test_redelivery_is_idempotent(spark, split_sf_dir, tmp_path):
    state = str(tmp_path / "state")
    os.makedirs(state)
    docs = spark.read.parquet(
        os.path.join(split_sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    b1 = docs.where("doc_id % 3 = 0")
    b2 = docs.where("doc_id % 3 <> 0")

    neardedup_apply_batch(spark, state, b1)
    after_b1 = _pair_set(_read_neardedup_results(spark, state))
    # full redelivery of batch 1: every doc_id already indexed → no-op
    neardedup_apply_batch(spark, state, b1)
    assert _pair_set(_read_neardedup_results(spark, state)) == after_b1
    # batch 2 WITH a partial replay of batch 1 mixed in (at-least-once)
    neardedup_apply_batch(spark, state, b2.unionByName(b1.limit(50)))
    final = _pair_set(_read_neardedup_results(spark, state))

    want = _pair_set(load_all()["dedup_minhash_lsh"].fn(spark, split_sf_dir))
    assert final == want


def test_conflicting_id_first_arrival_wins(spark, tmp_path):
    """Cross-batch CONFLICTING re-ingest (same doc_id, different text):
    the indexed first arrival defines the doc — the later payload is
    dropped, its shingles never enter the index, and the pair set equals
    the batch LSH over the FIRST-ARRIVAL corpus (pinned Spark-side; the
    DuckDB oracle cannot see arrival order, which is the documented
    boundary on the parity registration)."""
    from pyspark.sql import functions as F

    from bigdatatiler_spark.operators.dedup import (
        MINHASH_THRESHOLD,
        minhash_bands,
        shingle_frame,
    )
    from bigdatatiler_spark.operators._util import int_ratio

    state = str(tmp_path / "state")
    os.makedirs(state)
    base = "the quick brown fox jumps over the lazy dog again and again "
    rows1 = [(1, base * 5), (2, base * 5 + "tail one"), (3, "zebra " * 40)]
    # batch 2 redelivers doc 2 with a DIFFERENT payload (near-dup of 3's)
    rows2 = [(2, "zebra " * 40 + "conflict"), (4, base * 5 + "tail two")]
    b1 = spark.createDataFrame(rows1, "doc_id long, text string")
    b2 = spark.createDataFrame(rows2, "doc_id long, text string")
    neardedup_apply_batch(spark, state, b1)
    neardedup_apply_batch(spark, state, b2)
    got = _pair_set(_read_neardedup_results(spark, state))

    # reference: batch LSH over the first-arrival corpus (doc 2 = payload 1)
    corpus = spark.createDataFrame(rows1 + rows2[1:], "doc_id long, text string")
    sh = shingle_frame(corpus).localCheckpoint()
    bands = minhash_bands(sh)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
        .distinct()
    )
    pairs = cand.join(
        sh.select(F.col("doc_id").alias("doc_id_1"), F.col("sh").alias("sh1")), "doc_id_1"
    ).join(
        sh.select(F.col("doc_id").alias("doc_id_2"), F.col("sh").alias("sh2")), "doc_id_2"
    )
    jac = int_ratio(
        F.size(F.array_intersect("sh1", "sh2")),
        F.size(F.array_union("sh1", "sh2")),
        6,
        "jaccard_e6",
    )
    want = _pair_set(
        pairs.select("doc_id_1", "doc_id_2", jac).where(
            F.col("jaccard_e6") >= int(MINHASH_THRESHOLD * 1000000)
        )
    )
    assert got == want
    # the conflict payload is really gone: doc 2 pairs with doc 1/4
    # (its FIRST payload's family), never with doc 3 (the second's)
    assert all(not ({p[0], p[1]} == {2, 3}) for p in got)
    assert any({p[0], p[1]} == {1, 2} for p in got)


def test_midbatch_failure_redelivery_is_exact(spark, split_sf_dir, tmp_path):
    """r11 ADVICE: a batch that fails BETWEEN its state writes (results/
    written, ids/ not yet) used to re-emit all its pairs on redelivery —
    the anti-join could not drop them. With batchId-keyed subdir writes,
    replaying the batch overwrites its own partial state and lands on the
    identical final pair set."""
    state = str(tmp_path / "state")
    os.makedirs(state)
    docs = spark.read.parquet(
        os.path.join(split_sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    b1 = docs.where("doc_id % 3 = 0")
    b2 = docs.where("doc_id % 3 <> 0")

    neardedup_apply_batch(spark, state, b1, batch_id=0)
    # simulate the mid-batch crash: batch 1's results landed but its
    # ids/sh/bands did not (the exact ordering hole the ADVICE named)
    neardedup_apply_batch(spark, state, b2, batch_id=1)
    import shutil

    for sub in ("ids", "sh", "bands"):
        shutil.rmtree(os.path.join(state, sub, "bid_1"))
    # redelivery of batch 1 (at-least-once): must overwrite, not append
    neardedup_apply_batch(spark, state, b2, batch_id=1)

    final = _pair_set(_read_neardedup_results(spark, state))
    want = _pair_set(load_all()["dedup_minhash_lsh"].fn(spark, split_sf_dir))
    assert final == want
