"""Deterministic sampling / dataset-split operators.

Training-data pipelines need reproducible splits: the same document must
land in the same split on every run, on every cluster size, regardless
of partitioning. Spark's ``df.sample``/``sampleBy`` are seeded but
partition-layout-dependent, so the engine uses content hashing instead —
``bucket = md5(id) mod 100`` — which is stable across engines (DuckDB
runs the identical expression, so these are fully oracle-checked),
shuffle-free (a scan-level projection + filter, no exchange), and
stable under repartitioning, the property that matters when the corpus
is rewritten/compacted between runs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table

_BUCKETS = 100

_SQL_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT"
    f" % {_BUCKETS} AS BIGINT)"
)


def _bucket(col: Column) -> Column:
    """Stable hash bucket 0..99 from the id — md5-based for engine
    portability (same idiom as sketches.py / text.py)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % _BUCKETS
    )


def split_column(col: Column, train: int = 80, valid: int = 90) -> Column:
    """80/10/10 train/valid/test assignment from the stable bucket."""
    b = _bucket(col)
    return (
        F.when(b < train, "train").when(b < valid, "valid").otherwise("test")
    )


@register(
    "sample_train_test_split",
    oracle=f"""
    SELECT
      CASE WHEN {_SQL_BUCKET} < 80 THEN 'train'
           WHEN {_SQL_BUCKET} < 90 THEN 'valid'
           ELSE 'test' END AS split,
      count(*) AS n_docs,
      sum(n_chars) AS total_chars,
      count(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY 1
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 corpus split with per-split volume stats.
    The split is a projection — no shuffle, no sort, no RNG state; the
    only exchange is the 3-group aggregate. Adding data never moves an
    existing document between splits (hash depends only on doc_id)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            split_column(F.col("doc_id")).alias("split"), "n_chars", "lang"
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


@register(
    "sample_stratified_by_lang",
    oracle=f"""
    WITH s AS (
      SELECT lang, n_chars, {_SQL_BUCKET} AS bucket FROM documents
    )
    SELECT lang,
           count(*) AS corpus_docs,
           sum(CASE WHEN bucket < 10 THEN 1 ELSE 0 END) AS sample_docs,
           sum(CASE WHEN bucket < 10 THEN n_chars ELSE 0 END) AS sample_chars
    FROM s GROUP BY lang
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% per-language sample, reported against the full
    stratum size (the corpus-vs-sample view a data-quality audit reads).
    Same stable-bucket trick; stratification is free because the bucket
    is independent of the stratum key — every lang gets the same 10%
    expectation without a per-stratum pass or sampleBy's fraction map."""
    docs = table(spark, sf_dir, "documents")
    in_sample = _bucket(F.col("doc_id")) < 10
    return (
        docs.select("lang", "n_chars", in_sample.alias("in_sample"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("corpus_docs"),
            F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).alias("sample_docs"),
            F.sum(F.when(F.col("in_sample"), F.col("n_chars")).otherwise(0)).alias(
                "sample_chars"
            ),
        )
    )
