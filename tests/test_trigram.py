"""Trigram-index substring search: completeness and pruning contracts
on controlled corpora (the fixture path is oracle-checked; these pin the
index semantics the oracle can't isolate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatatiler_spark.operators.retrieval import (
    TRIGRAM_N_RARE,
    _char_trigrams,
)


def _search(spark, docs, patterns):
    """The registered query's index pipeline, parameterized for tests."""
    from pyspark.sql import Window

    d = spark.createDataFrame(docs, ["doc_id", "text"])
    postings = d.select("doc_id", F.explode(_char_trigrams("text")).alias("tg"))
    tgdf = postings.groupBy("tg").agg(F.count("*").alias("df"))
    pat_rows = [
        (p, tg) for p in patterns for tg in sorted({p[i : i + 3] for i in range(len(p) - 2)})
    ]
    pats = spark.createDataFrame(pat_rows, ["pattern", "tg"])
    w = Window.partitionBy("pattern").orderBy(F.asc("df"), F.asc("tg"))
    rare = (
        pats.join(tgdf, "tg")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TRIGRAM_N_RARE)
        .groupBy("pattern")
        .agg(F.collect_set("tg").alias("tgs"), F.count("*").alias("n_rare"))
        .select("pattern", F.explode("tgs").alias("tg"), "n_rare")
    )
    cand = (
        postings.join(rare, "tg")
        .groupBy("pattern", "doc_id", "n_rare")
        .agg(F.count("*").alias("n_hit"))
        .where(F.col("n_hit") == F.col("n_rare"))
        .select("pattern", "doc_id")
    )
    hits = (
        d.join(cand, "doc_id")
        .where(F.contains("text", F.col("pattern")))
        .select("pattern", "doc_id")
    )
    return {(r["pattern"], r["doc_id"]) for r in hits.collect()}, {
        (r["pattern"], r["doc_id"]) for r in cand.collect()
    }


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown cat sits on the quiet mat"),
    (3, "wholly unrelated text about spark shuffles"),
    (4, "quick brown fox again but different tail"),
]


def test_matches_equal_brute_force_contains(spark):
    pats = ["quick brown", "lazy dog", "zebra"]
    hits, _ = _search(spark, DOCS, pats)
    brute = {
        (p, i) for p in pats for i, t in DOCS if p in t
    }
    assert hits == brute
    assert ("zebra", 1) not in hits  # absent pattern → no rows


def test_candidates_are_superset_and_pruned(spark):
    # "quiet mat" shares trigrams with doc 1's "quick"/"mat"? the index
    # may over-generate, never under-generate — and must prune docs
    # sharing no rare trigram
    hits, cand = _search(spark, DOCS, ["quiet mat"])
    assert hits == {("quiet mat", 2)}
    assert hits <= cand
    assert all(p == "quiet mat" for p, _ in cand)
    assert ("quiet mat", 3) not in cand  # no shared trigrams → pruned


def test_pattern_shorter_than_corpus_trigram_overlap(spark):
    # a pattern occurring in EVERY doc: candidates = all docs, all verify
    docs = [(i, f"common core text {i}") for i in range(1, 6)]
    hits, cand = _search(spark, docs, ["common core"])
    assert hits == {("common core", i) for i in range(1, 6)}
