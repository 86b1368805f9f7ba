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


def test_source_cap_invariant_under_layout(spark):
    """sample_source_cap's two-phase selection (sub-bucket rank → final
    rank) must pick EXACTLY the same rows whatever the input
    partitioning: phase 1's _pid grouping changes which rows reach phase
    2, but never excludes a global per-source top-cap winner."""
    from bigdatatiler_spark.operators.sampling import SOURCE_CAP
    from bigdatatiler_spark.registry import load_all
    from bigdatatiler_spark.tables import table
    from pyspark.sql import Window, functions as F

    sf = "/root/testdata/sf0.1"  # cap engages here (sources > cap docs)
    got = {
        tuple(r)
        for r in load_all()["sample_source_cap"].fn(spark, sf).collect()
    }
    # reference: ONE global window over an adversarial repartitioning
    docs = (
        table(spark, sf, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select("doc_id", "source")
        .repartition(7, "doc_id")  # layout the two-phase never saw
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    want = {
        tuple(r)
        for r in docs.withColumn("keep_rank", F.row_number().over(w))
        .where(F.col("keep_rank") <= SOURCE_CAP)
        .collect()
    }
    assert got == want
    # the cap genuinely engages at this sf
    n_sources = docs.select("source").distinct().count()
    assert len(got) == n_sources * SOURCE_CAP
