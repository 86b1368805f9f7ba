"""Weighted-priority sampling (Efraimidis-Spirakis): key monotonicity in
the weight, determinism under repartitioning, and the statistical bias
the weighting exists to produce."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatatiler_spark.operators.sampling import (
    WEIGHTED_K,
    es_priority,
    sample_weighted_priority,
)

SF = "/root/testdata/sf0.01"


def test_key_monotone_in_weight(spark):
    """For a fixed id (fixed u), a larger weight must never lower the
    key — the property that makes heavier items likelier to survive."""
    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    rows = df.select(
        es_priority(F.col("id"), F.lit(1)).alias("k1"),
        es_priority(F.col("id"), F.lit(2)).alias("k2"),
        es_priority(F.col("id"), F.lit(10)).alias("k10"),
    ).collect()
    for r in rows:
        assert r.k2 >= r.k1 and r.k10 >= r.k2


def test_selection_stable_under_repartitioning(spark):
    a = {r.doc_id for r in sample_weighted_priority(spark, SF).collect()}
    from bigdatatiler_spark.tables import table

    docs = table(spark, SF, "documents").repartition(17, "lang")
    key = es_priority(F.col("doc_id"), F.greatest(F.col("n_chars"), F.lit(1)))
    b = {
        r.doc_id
        for r in docs.select("doc_id", key.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(WEIGHTED_K)
        .collect()
    }
    assert a == b


def test_weighting_biases_toward_heavy_docs(spark):
    """The picked set's mean length must exceed the corpus mean — the
    whole point of ∝-weight sampling (measured: 341 vs 298 at sf0.01)."""
    from bigdatatiler_spark.tables import table

    picked_mean = (
        sample_weighted_priority(spark, SF).agg(F.avg("n_chars")).collect()[0][0]
    )
    corpus_mean = (
        table(spark, SF, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert picked_mean > corpus_mean
