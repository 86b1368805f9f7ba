"""Stateful streaming reassembly of split-document chains.

The streaming counterpart of logstore.tile.reassemble (SURVEY.md §2.10):
chunk rows for one logical record may arrive across micro-batches; state
accumulates (split_index, chunk) pairs per record until ``total_splits``
are present, then emits the merged payload exactly once and clears the
state — ``applyInPandasWithState`` with per-key state and a processing-
time timeout as the leak guard for chains that never complete.

State size is bounded by (incomplete chains) × (chunk bytes) — the
timeout evicts abandoned chains, which is what keeps this viable on an
unbounded stream.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MERGED_SCHEMA = StructType(
    [
        StructField("record_id", LongType()),
        StructField("payload", StringType()),
        StructField("n_chunks", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("idx", ArrayType(IntegerType())),
        StructField("chunk", ArrayType(StringType())),
        StructField("total", IntegerType()),
    ]
)


def _merge_chunks(key: Any, pdfs: Any, state: GroupState) -> Any:
    import pandas as pd

    idx, chunks, total = ([], [], None)
    if state.exists:
        idx, chunks, total = state.get
        idx, chunks = list(idx), list(chunks)
    if state.hasTimedOut:
        # abandoned chain: drop state, emit nothing
        state.remove()
        return
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            idx.append(int(row["split_index"]))
            chunks.append(row["chunk"])
            total = int(row["total_splits"])
    # dedup by ordinal (first delivery wins): at-least-once redelivery must
    # neither corrupt the merge nor trigger early emission via a raw length
    # test — completion requires the distinct ordinals to cover [0, total)
    seen: dict[int, str] = {}
    for i, c in zip(idx, chunks):
        if i not in seen:
            seen[i] = c
    if total is not None and set(seen) >= set(range(total)):
        payload = "".join(seen[i] for i in sorted(seen))
        state.remove()
        yield pd.DataFrame(
            {"record_id": [key[0]], "payload": [payload], "n_chunks": [len(seen)]}
        )
    else:
        state.update((idx, chunks, total))
        state.setTimeoutDuration(60 * 60 * 1000)  # 1h abandoned-chain eviction


def reassemble_stream(chunks: DataFrame, record_col: str = "record_id") -> DataFrame:
    """Streaming ordered-merge: one output row per completed chain."""
    return chunks.groupBy(record_col).applyInPandasWithState(
        _merge_chunks,
        outputStructType=MERGED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
