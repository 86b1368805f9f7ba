"""Oracle-matched queries for the tiling operator pair (SURVEY.md §2.9).

Runs logstore.tile/reassemble over the documents table with a small chunk
budget so every split path (unsplit fast path + multi-chunk) is exercised
against the DuckDB oracle. The round-trip query checks the reference's key
correctness property — ``CombineSplitLogs(loadXmlFile(x)) == x.OuterXml``
(LogChange.cs:95-98) — as ``reassemble(tile(doc)) == doc.text``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..logstore.tile import reassemble, tile, tile_bytecap
from ..registry import register
from ..tables import table

CHUNK = 120  # chars — small enough that most docs split into several tiles

# Conflicting-id arbiter (fuzz 9): the tile/reassemble record id is the
# PK (the reference's ULID `id`, LogChange.cs:29-43, is unique by
# construction), but at-least-once ingest can deliver the SAME id with
# DIFFERENT payloads. Reassembly keyed on a non-unique id would
# interleave chunks of two documents, so the ingest path resolves
# conflicts deterministically first: keep the payload with the greatest
# md5 (content-based, engine-portable — max(text) would hinge on each
# engine's collation). SQL mirror: arg_max(text, md5(text)).
_DEDUP_IDS_SQL = """
    SELECT doc_id, arg_max(text, md5(text)) AS text
    FROM documents WHERE text IS NOT NULL GROUP BY doc_id
"""


def _dedupe_conflicting_ids(docs: DataFrame) -> DataFrame:
    # One payload-bearing groupBy. The payload-free alternative (id-only
    # count → broadcast dup-id list → anti-join uniques through, arbiter
    # only conflicts) measures IDENTICAL wall time at sf0.1 (11.7 s vs
    # 12.0 s cold) while tripling the audited plan-node count via lineage
    # replay of its join DAG across the bytecap fixpoint's branches — at
    # true 100 TB ingest the conflict arbiter belongs in the write path
    # once, not ahead of every query, so the compact form is kept here.
    return (
        docs.where(F.col("text").isNotNull())
        .groupBy("doc_id")
        .agg(F.max_by("text", F.md5("text")).alias("text"))
    )

# byte-cap scaled to the test corpus (the reference's 1.5 MB cap with
# 50k/10k floors would never trigger on ~1k-char docs): same policy,
# proportional constants.
BYTECAP = 220
BYTECAP_FIRST_FLOOR = 50
BYTECAP_RESPLIT_FLOOR = 15


@register(
    "doc_tile_chunks",
    oracle=f"""
    SELECT
      doc_id,
      CAST(i AS INT)                       AS split_index,
      substr(text, i * {CHUNK} + 1, {CHUNK}) AS chunk,
      CAST(greatest(CAST(ceil(length(text) / {CHUNK}.0) AS INT), 1) AS INT) AS total_splits,
      CASE WHEN length(text) > {CHUNK} THEN doc_id END AS parent_id
    -- NULL body -> no tiles (fuzz 6): Spark's sequence() fan-out skips
    -- NULL text while DuckDB's greatest() IGNORES the NULL ceil() and
    -- would emit one NULL chunk; conflicting duplicate ids resolve via
    -- the content arbiter (fuzz 9 — see _DEDUP_IDS_SQL)
    FROM ({_DEDUP_IDS_SQL}) documents,
         unnest(generate_series(0, greatest(CAST(ceil(length(text) / {CHUNK}.0) AS INT), 1) - 1)) AS t(i)
    """,
)
def doc_tile_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O23/O29: fixed-size chunk fan-out. sequence+transform+posexplode —
    one narrow stage, no shuffle, no UDF; row count multiplies but bytes
    don't (each chunk is a substring view)."""
    docs = _dedupe_conflicting_ids(table(spark, sf_dir, "documents"))
    return tile(docs, "text", "doc_id", chunk_chars=CHUNK).select(
        "doc_id",
        "split_index",
        "chunk",
        "total_splits",
        "parent_id",
    )


@register(
    "doc_tile_roundtrip",
    oracle=f"""
    WITH documents_1 AS ({_DEDUP_IDS_SQL}),
    chunks AS (
      SELECT
        doc_id,
        CAST(i AS INT) AS split_index,
        substr(text, i * {CHUNK} + 1, {CHUNK}) AS chunk
      FROM documents_1,
           unnest(generate_series(0, greatest(CAST(ceil(length(text) / {CHUNK}.0) AS INT), 1) - 1)) AS t(i)
    ),
    merged AS (
      SELECT doc_id, string_agg(chunk, '' ORDER BY split_index) AS payload,
             count(*) AS n_chunks
      FROM chunks GROUP BY doc_id
    )
    SELECT m.doc_id AS record_id,
           m.n_chunks,
           length(m.payload) AS payload_len,
           CASE WHEN m.payload = d.text THEN 1 ELSE 0 END AS roundtrip_ok
    FROM merged m JOIN documents_1 d ON m.doc_id = d.doc_id
    """,
)
def doc_tile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17/O19 + the §2.9 round-trip invariant: tile → reassemble → compare
    with the original. Ordered merge via array_sort(collect_list(struct)) —
    order-correct regardless of partitioning; one shuffle on the record id."""
    docs = _dedupe_conflicting_ids(table(spark, sf_dir, "documents"))
    tiled = tile(docs, "text", "doc_id", chunk_chars=CHUNK)
    merged = reassemble(tiled, id_col="doc_id")
    return (
        merged.join(docs, merged.record_id == docs.doc_id)
        .select(
            "record_id",
            "n_chunks",
            F.length("payload").alias("payload_len"),
            F.when(F.col("payload") == F.col("text"), 1).otherwise(0).alias("roundtrip_ok"),
        )
    )


@register(
    "doc_tile_bytecap_roundtrip",
    oracle=f"""
    SELECT doc_id AS record_id, md5(text) AS payload_md5, 1 AS within_cap
    FROM ({_DEDUP_IDS_SQL}) documents
    """,
)
def doc_tile_bytecap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O26: the compressed-size-validated re-chunk fixpoint
    (LogChange.cs:214-257) end-to-end — tile under a hard zip-byte cap,
    reassemble, and emit md5 of the reconstruction plus the cap
    invariant. The oracle's md5 is computed from the ORIGINAL text, so a
    single lost/duplicated/reordered chunk anywhere in the estimate →
    validate → re-split loop breaks the hash compare; within_cap is the
    engine-side guarantee (every emitted archive ≤ cap — the floors are
    scaled so forcing can't occur on this corpus) checked against the
    oracle's constant truth."""
    # NULL body -> no tiles (fuzz 6); conflicting ids arbitered (fuzz 9)
    docs = _dedupe_conflicting_ids(table(spark, sf_dir, "documents"))
    tiled = tile_bytecap(
        docs,
        "text",
        "doc_id",
        max_zip_bytes=BYTECAP,
        first_floor=BYTECAP_FIRST_FLOOR,
        resplit_floor=BYTECAP_RESPLIT_FLOOR,
    )
    # One aggregation pass (r12): reassembly keyed on doc_id directly
    # (every tile_bytecap leaf carries it; parent_id is id-or-null), so
    # the groupBy reuses the renumber window's hash partitioning — no
    # second exchange — and max(zip_bytes) rides the same aggregate
    # instead of a separate caps pass + join that replayed the whole
    # union+window subtree a second time. Plan: 2× (union+window) +
    # 2 aggregates + 1 join → 1× union+window + 1 aggregate.
    merged = reassemble(
        tiled,
        id_col="doc_id",
        parent_col=None,
        extra_aggs={"max_zip": F.max("zip_bytes")},
    )
    return merged.select(
        "record_id",
        F.md5("payload").alias("payload_md5"),
        F.when(F.col("max_zip") <= BYTECAP, 1).otherwise(0).alias("within_cap"),
    )
