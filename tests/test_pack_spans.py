"""pack_span_manifest conservation pins (r10 verdict #6): the
loss-masking span view must tile the packed stream exactly — spans sum
to the sequence- and document-level token accounting, and every document
carries exactly one BOS and one EOS flag."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatatiler_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _frames(spark):
    specs = load_all()
    spans = specs["pack_span_manifest"].fn(spark, SF)
    seqs = specs["pack_sequence_manifest"].fn(spark, SF)
    docs = specs["pack_training_sequences"].fn(spark, SF)
    return spans, seqs, docs


def test_span_tokens_sum_to_sequence_used_tokens(spark):
    spans, seqs, _ = _frames(spark)
    per_seq = spans.groupBy("seq_id").agg(
        F.sum("span_len").alias("span_tokens"),
        F.count(F.lit(1)).alias("span_docs"),
    )
    joined = seqs.join(per_seq, "seq_id", "full_outer")
    bad = joined.where(
        F.col("span_tokens").isNull()
        | F.col("used_tokens").isNull()
        | (F.col("span_tokens") != F.col("used_tokens"))
        | (F.col("span_docs") != F.col("n_docs"))
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_span_tokens_sum_to_doc_n_tokens_with_one_bos_one_eos(spark):
    spans, _, docs = _frames(spark)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").alias("span_tokens"),
        F.sum("bos").alias("n_bos"),
        F.sum("eos").alias("n_eos"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    joined = docs.join(per_doc, "doc_id", "full_outer")
    bad = joined.where(
        F.col("span_tokens").isNull()
        | (F.col("span_tokens") != F.col("n_tokens"))
        | (F.col("n_bos") != 1)
        | (F.col("n_eos") != 1)
        | (F.col("n_spans") != F.col("n_seqs"))
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_spans_tile_each_sequence_without_overlap(spark):
    """Within a sequence, spans ordered by span_start must be contiguous
    from its first occupied token: each span starts where the previous
    one ended (the packed stream has no holes except the tail of the
    final sequence)."""
    spans, _, _ = _frames(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("seq_id").orderBy("span_start")
    gaps = spans.withColumn(
        "prev_end", F.lag(F.col("span_start") + F.col("span_len")).over(w)
    ).where(
        F.col("prev_end").isNotNull()
        & (F.col("prev_end") != F.col("span_start"))
    )
    assert gaps.count() == 0, gaps.limit(5).collect()
