"""Trigram-index substring search: completeness and pruning contracts
on controlled corpora (the fixture path is oracle-checked; these pin the
index semantics the oracle can't isolate). Tests drive the SHARED
implementation (trigram_search / _trigram_candidates), not a copy."""

from __future__ import annotations

from bigdatatiler_spark.operators.retrieval import (
    _trigram_candidates,
    trigram_search,
)


def _search(spark, docs, patterns):
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    hits = {
        (r["pattern"], r["doc_id"]) for r in trigram_search(d, patterns).collect()
    }
    cand = {
        (r["pattern"], r["doc_id"])
        for r in _trigram_candidates(d, patterns).collect()
    }
    return hits, cand


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
    # the index may over-generate, never under-generate — and must prune
    # docs sharing no rare trigram
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
