"""Reference-parity log store.

The reference (jerbio/BigDataTiler) persists compressed XML change-logs as
documents in a Cosmos container hash-partitioned on /UserId and queries them
with dynamically-composed conjunctive SQL (equality + half-open time range,
descending time sort, top-k). Here that becomes:

- a Parquet table partitioned by ``user_id`` (partition pruning = Cosmos
  partition-key routing),
- a declarative filtered-scan builder (Catalyst does predicate pushdown,
  column pruning, and TakeOrderedAndProject — the reference hand-builds all
  of this as SQL strings, BigDataLogControl.cs:206-330),
- a tile/reassemble operator pair for size-bounded record splitting
  (LogChange.cs:99-175 / 312-342).
"""

from .store import LogStore, filtered_scan  # noqa: F401
