"""Round-trip property tests for the tile/reassemble pair (SURVEY.md §5.2).

The reference invariant: CombineSplitLogs(loadXmlFile(x)) == x.OuterXml
(LogChange.cs:95-98) — here reassemble(tile(df)) must reproduce every
payload byte-for-byte, across the unsplit / exactly-at-boundary /
multi-chunk / re-split-sized paths.
"""

from __future__ import annotations

import pytest

from bigdatatiler_spark.logstore.tile import reassemble, tile

CHUNK = 100

CASES = [
    ("empty-ish", "x"),
    ("under", "a" * 37),
    ("exact", "b" * CHUNK),
    ("one-over", "c" * (CHUNK + 1)),
    ("multi", "".join(chr(97 + i % 26) * 7 for i in range(300))),
    ("big", "payload-" * 2000),
]


@pytest.fixture(scope="module")
def payloads(spark):
    return spark.createDataFrame(
        [(i, name, text) for i, (name, text) in enumerate(CASES)],
        ["rec_id", "name", "payload"],
    )


def test_roundtrip_exact(spark, payloads):
    got = {
        r["record_id"]: r["payload"]
        for r in reassemble(tile(payloads, "payload", "rec_id", CHUNK), id_col="rec_id").collect()
    }
    want = {i: text for i, (_, text) in enumerate(CASES)}
    assert got == want


def test_split_metadata(spark, payloads):
    tiled = tile(payloads, "payload", "rec_id", chunk_chars=CHUNK).collect()
    by_rec: dict[int, list] = {}
    for r in tiled:
        by_rec.setdefault(r["rec_id"], []).append(r)
    for i, (_, text) in enumerate(CASES):
        rows = sorted(by_rec[i], key=lambda r: r["split_index"])
        expect_chunks = max(1, -(-len(text) // CHUNK))
        assert len(rows) == expect_chunks
        assert [r["split_index"] for r in rows] == list(range(expect_chunks))
        assert all(r["total_splits"] == expect_chunks for r in rows)
        if expect_chunks == 1:
            # unsplit fast path: no parent linkage (LogChange.cs:110-118)
            assert rows[0]["parent_id"] is None
        else:
            assert all(r["parent_id"] == i for r in rows)
        # every chunk except the last is exactly CHUNK chars
        assert all(len(r["chunk"]) == CHUNK for r in rows[:-1])
        assert "".join(r["chunk"] for r in rows) == text


def test_reassemble_unordered_input(spark):
    """Order-sensitivity guard: reassembly must not depend on row order
    (the array_sort-inside-agg pattern, SURVEY.md §7 hard part (c))."""
    rows = [(1, 2, "C", 3, 1), (1, 0, "A", 3, 1), (1, 1, "B", 3, 1)]
    df = spark.createDataFrame(
        rows, ["id", "split_index", "chunk", "total_splits", "parent_id"]
    ).repartition(3)
    out = reassemble(df, id_col="id").collect()
    assert out[0]["payload"] == "ABC"
