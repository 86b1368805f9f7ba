"""Bloom-filter file index: point-read skipping on non-clustered keys.

The min/max manifest (sources/manifest.py) prunes files for RANGE
predicates — it needs the layout clustered on the stat column to be
selective. Point reads on a key the layout is NOT clustered by (the
reference's O5 "read one log by id" against a time-partitioned table —
BigDataLogControl.cs:116-150 reads by (id, partition key); our layouts
cluster by time) get nothing from min/max: every file's [min, max] id
envelope spans the whole domain. Delta and Iceberg solve this with a
per-file Bloom filter index; this module is that structure on plain
parquet:

- ``build_bloom_index``: per file, read ONLY the key column (columnar
  projection — a single column of a wide file) and fold its distinct
  keys into a Bloom filter sized for the requested false-positive rate.
  Distributed over executors via ``mapInPandas`` on the file list, like
  the manifest build.
- ``bloom_prune_files``: files whose filter MAY contain the key. Bloom
  guarantees: no false negatives ever (the result is always correct),
  false positives at ~fpp (the only cost is opening ~fpp·N extra files).
- ``point_read_bloom``: read only surviving files, exact residual filter.

Hashing is double-hashed md5 (h1 + i·h2 mod m, Kirsch-Mitzenmacher):
deterministic across runs/machines with no native-lib dependency — the
index survives being built and queried by different clusters. At 1%
fpp the index costs ~1.2 bytes/key: a 100 TB table with 10^11 keys
carries a ~120 GB index — read per-file lazily, never loaded whole; the
driver only streams (path, bits) rows of the files list, partition-
listing cardinality.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from .manifest import _data_files

BLOOM_SCHEMA = "path string, n_keys long, m_bits long, k_hashes int, bits binary"


def _params(n_keys: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_keys`` at ``fpp`` (≥64 bits)."""
    n = max(n_keys, 1)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _hash_pair(key: str) -> tuple[int, int]:
    """(h1, h2) 64-bit halves of md5(key) — deterministic everywhere."""
    d = hashlib.md5(key.encode()).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1


def _bit_positions(key: str, m_bits: int, k_hashes: int) -> list[int]:
    h1, h2 = _hash_pair(key)
    return [(h1 + i * h2) % m_bits for i in range(k_hashes)]


def build_bloom_index(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    index_path: str,
    fpp: float = 0.01,
) -> int:
    """Build the per-file Bloom index for ``key_col``; returns files
    indexed. Keys are hashed by string representation (int64 and string
    keys round-trip identically on build and probe)."""
    files = _data_files(table_path)
    if not files:
        raise ValueError(f"no parquet data files under {table_path}")
    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        min(len(files), 64)
    )

    def _build(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                keys = {
                    str(v)
                    for v in pq.read_table(p, columns=[key_col])[key_col].to_pylist()
                    if v is not None
                }
                m, k = _params(len(keys), fpp)
                bits = np.zeros((m + 7) // 8, dtype=np.uint8)
                for key in keys:
                    for pos in _bit_positions(key, m, k):
                        bits[pos >> 3] |= 1 << (pos & 7)
                rows.append((p, len(keys), m, k, bits.tobytes()))
            yield pd.DataFrame(
                rows, columns=["path", "n_keys", "m_bits", "k_hashes", "bits"]
            )

    fdf.mapInPandas(_build, BLOOM_SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        index_path
    )
    return len(files)


def bloom_prune_files(
    spark: SparkSession, index_path: str, key
) -> tuple[list[str], int]:
    """(files that may contain ``key``, total files). The membership test
    runs distributed as a pandas UDF over the index table — the driver
    receives only surviving paths."""
    idx = spark.read.parquet(index_path)
    total = idx.count()
    key_s = str(key)

    def _probe(batches):
        import pandas as pd

        for pdf in batches:
            keep = []
            for _, r in pdf.iterrows():
                bits = np.frombuffer(r["bits"], dtype=np.uint8)
                hit = all(
                    bits[pos >> 3] & (1 << (pos & 7))
                    for pos in _bit_positions(key_s, int(r["m_bits"]), int(r["k_hashes"]))
                )
                if hit:
                    keep.append(r["path"])
            yield pd.DataFrame({"path": keep})

    keep = idx.mapInPandas(_probe, "path string")
    return sorted(r["path"] for r in keep.collect()), total


def point_read_bloom(
    spark: SparkSession, index_path: str, key_col: str, key
) -> DataFrame | None:
    """Bloom-pruned point read: open only files that may contain ``key``,
    with the exact equality as residual. None when every file is pruned
    (a definitive miss — the caller short-circuits without any data IO)."""
    files, _total = bloom_prune_files(spark, index_path, key)
    if not files:
        return None
    return spark.read.parquet(*files).filter(F.col(key_col) == F.lit(key))
