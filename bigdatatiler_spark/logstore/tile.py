"""Tiling operator pair: size-bounded record splitting and reassembly.

Reference parity (SURVEY.md §2.9, §2.4):
- ``tile``       → LogChange.loadXmlFile's chunk fan-out
  (/root/reference/LogChange.cs:99-175): payloads over a size threshold are
  split into fixed-size chunks emitted as linked rows (parent keeps the
  record id; children carry ``split_index``/``total_splits``/``parent_id``).
- ``reassemble`` → CombineSplitLogs' ordered concatenation merge
  (/root/reference/LogChange.cs:312-342 + BigDataLogControl.cs:120-190):
  gather chunks by parent, sort by split_index, concatenate.

Spark-first design: chunking is ``sequence + transform + substring`` +
``posexplode`` (pure built-ins, whole-stage codegen — no UDF); reassembly
is the order-sensitive-agg-inside-unordered-groupBy pattern:
``array_join(transform(array_sort(collect_list(struct(idx, chunk)))))``.
One shuffle each way. The reference's compression-ratio chunk-size
estimation (LogChange.cs:122-130) is environment-dependent; here chunk
size is an explicit parameter for reproducibility (SURVEY.md §7 hard
parts). Round-trip invariant: ``reassemble(tile(df)) == df`` — tested in
tests/test_tiling.py across the unsplit/split boundary.

At 100 TB: both operators are shuffle-once, key-partitioned on the record
id — no driver-side loops, no collect; Parquet has no 2 MB record limit so
tiling is a *semantic* operator (downstream batch sizing), not a storage
workaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Reference default: 1.5 MB compressed-chunk cap (LogChange.cs:23-24).
#: For text tiling the analog is a character budget per chunk.
DEFAULT_CHUNK_CHARS = 1_500_000


def tile(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    chunk_chars: int = DEFAULT_CHUNK_CHARS,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split oversized payloads into linked chunk rows.

    Output columns: ``id_col``, ``*keep_cols``, ``split_index`` (0-based),
    ``total_splits``, ``parent_id`` (null on unsplit rows, = id on chunks —
    mirroring LogChange.cs:110-118 vs 143-170), ``chunk``.
    Unsplit fast path (payload fits) emits exactly one row with
    ``total_splits = 1``, like the reference's short-circuit.
    """
    n_chunks = F.ceil(F.length(payload_col) / F.lit(chunk_chars)).cast("int")
    chunks = F.when(
        n_chunks <= 1, F.array(F.col(payload_col))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.col(payload_col).substr(
                i * F.lit(chunk_chars) + 1, F.lit(chunk_chars)
            ),
        )
    )
    keep = [F.col(c) for c in keep_cols]
    exploded = df.select(
        F.col(id_col),
        *keep,
        F.posexplode(chunks).alias("split_index", "chunk"),
        F.size(chunks).alias("total_splits"),
    )
    return exploded.withColumn(
        "parent_id",
        F.when(F.col("total_splits") > 1, F.col(id_col)).otherwise(F.lit(None)),
    )


def reassemble(
    chunks_df: DataFrame, id_col: str, parent_col: str = "parent_id"
) -> DataFrame:
    """Inverse of :func:`tile` — ordered merge of chunk chains.

    Groups by the logical record id (``coalesce(parent_id, id)`` handles
    unsplit rows), sorts chunks by ``split_index`` *inside* the aggregate
    (array_sort over collected structs — never bare collect_list, which has
    no ordering guarantee across partitions), and concatenates.
    """
    record_id = F.coalesce(F.col(parent_col), F.col(id_col))
    return (
        chunks_df.groupBy(record_id.alias("record_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("split_index", "chunk"))),
                    lambda s: s["chunk"],
                ),
                "",
            ).alias("payload"),
            F.count("*").alias("n_chunks"),
            F.max("total_splits").alias("total_splits"),
        )
    )
