"""transformWithState reassembly: the modern stateful-processor form.

Same semantics as reassemble.py's ``applyInPandasWithState`` operator
(SURVEY.md §2.10 / §2.4 O17: accumulate (split_index, chunk) pairs per
logical record across micro-batches, emit the ordered merge exactly once
when ``total_splits`` chunks are present), re-expressed on Spark 4's
``transformWithStateInPandas`` API, which is the scale path:

- typed state variables (ListState for chunks, ValueState for the
  expected total) instead of one monolithic state tuple — the RocksDB
  state store appends to the ListState without rewriting the whole
  value, so per-chunk state updates are O(chunk) not O(record);
- an explicit processing-time timer per key evicts abandoned chains
  (the reference never completes a chain whose writer crashed mid-split
  — BigDataLogControl.cs:97-109 surfaces the fault and stops);
- RocksDB state store + changelog checkpointing keeps state off-heap,
  which is what bounds executor memory when millions of chains are
  in flight on a real cluster.

Requires ``spark.sql.streaming.stateStore.providerClass`` =
RocksDBStateStoreProvider (transformWithState is RocksDB-only), and the
``protobuf`` package — PySpark's transformWithState state protocol is
protobuf-framed. ``runtime_available()`` reports whether this
environment can execute the operator; where it can't (no protobuf in
the container), reassemble.py's applyInPandasWithState form is the
executable fallback with identical semantics.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def runtime_available() -> bool:
    """True iff this environment can run transformWithStateInPandas."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False

MERGED_SCHEMA = StructType(
    [
        StructField("record_id", LongType()),
        StructField("payload", StringType()),
        StructField("n_chunks", IntegerType()),
    ]
)

_CHUNK_STATE = StructType(
    [StructField("idx", IntegerType()), StructField("chunk", StringType())]
)
_TOTAL_STATE = StructType([StructField("total", IntegerType())])

#: processing-time eviction horizon for chains that never complete
ABANDON_AFTER_MS = 60 * 60 * 1000


class ChunkReassembler(StatefulProcessor):
    """Per-record chunk accumulator with exactly-once ordered emission."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._chunks = handle.getListState("chunks", _CHUNK_STATE)
        self._total = handle.getValueState("total", _TOTAL_STATE)
        self._handle = handle

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timer_values: Any
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in rows:
            self._chunks.appendList(
                [
                    (int(i), c)
                    for i, c in zip(pdf["split_index"], pdf["chunk"])
                ]
            )
            self._total.update((int(pdf["total_splits"].iloc[-1]),))

        # Dedup by split_index: under at-least-once chunk redelivery the
        # ListState can hold the same ordinal twice; emitting on a raw
        # length test would corrupt the payload (duplicate segment) or
        # fire early. Keep the first delivery of each ordinal and gate
        # completion on the distinct-ordinal set covering [0, total).
        seen: dict[int, str] = {}
        for i, c in self._chunks.get():
            if i not in seen:
                seen[i] = c
        total = self._total.get()
        if total is not None and set(seen) >= set(range(total[0])):
            payload = "".join(seen[i] for i in sorted(seen))
            n = len(seen)
            self._chunks.clear()
            self._total.clear()
            # disarm the abandoned-chain timer: a later chain reusing this
            # record_id must not be evicted by this chain's stale timer
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            yield pd.DataFrame(
                {"record_id": [key[0]], "payload": [payload], "n_chunks": [n]}
            )
        else:
            # arm/refresh the abandoned-chain eviction timer
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timer_values.getCurrentProcessingTimeInMs() + ABANDON_AFTER_MS
            )

    def handleExpiredTimer(
        self, key: Any, timer_values: Any, expired_timer_info: Any
    ) -> Iterator["pd.DataFrame"]:
        # abandoned chain: drop state, emit nothing
        self._chunks.clear()
        self._total.clear()
        yield from ()

    def close(self) -> None:
        pass


def reassemble_with_state(
    chunks: DataFrame, record_col: str = "record_id"
) -> DataFrame:
    """Streaming ordered merge via transformWithStateInPandas.

    Input schema: (record_id, split_index, chunk, total_splits); one
    output row per completed chain. Grouping on ``record_col`` is the
    state partitioning — chains shard across executors by record id.
    """
    return chunks.groupBy(record_col).transformWithStateInPandas(
        statefulProcessor=ChunkReassembler(),
        outputStructType=MERGED_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
