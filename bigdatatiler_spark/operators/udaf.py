"""Python aggregate / grouped-map UDF surface (SURVEY.md §2.11).

Completes the UDF API matrix alongside the scalar Arrow UDFs
(logstore/codec.py), mapInPandas (operators/multimodal.py) and the
stateful streaming processors (streaming/): a GROUPED_AGG pandas UDAF
and an ``applyInPandas`` grouped-map transform — both registered with
DuckDB oracles, so the driver cross-checks that the Python kernels
compute EXACTLY what the declarative SQL formulation computes.

Determinism design (the reason these are hash-matchable at all):
- the UDAF's interquartile mean is pure integer arithmetic on exact
  cents (sort, rank-slice, floor-div) — no float ever enters;
- the grouped z-score keeps every sum in arbitrary-precision Python
  ints (no int64 overflow at any corpus size), converts exactly once
  to double for one IEEE-correctly-rounded sqrt and one division whose
  numerator is < 2^53 — both engines perform the identical float ops
  on identical operands, so the floored per-mille z matches bit-exact.

Scale caveat (documented, inherent to the API): a GROUPED_AGG /
applyInPandas group materializes IN MEMORY in one Python worker. That
is the right tool for bounded groups (per-type event families here);
for unbounded groups the rank-window SQL form (this module's oracles)
or a GK sketch (operators/sketches.py) is the scale path. The hot
integer loop is one Arrow batch transfer each way — never per-row
Python.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..registry import register
from ..tables import table

_CENTS = "CAST(TRY_CAST(CASE WHEN (isfinite(value) AND abs(value) < 1e16) THEN value END AS DECIMAL(18,2)) * 100 AS BIGINT)"


@pandas_udf(LongType())
def _n_rows(cents: pd.Series) -> int:
    """Group size as a pandas UDAF: Spark disallows mixing GROUPED_AGG
    pandas UDFs with JVM aggregates in one agg(), so the count rides the
    same Arrow batch. NULL cents (non-finite source values) are not part
    of the statistic — mirrors the oracle's isfinite() filter."""
    return len(cents.dropna())


@pandas_udf(LongType())
def _iqm_cents(cents: pd.Series) -> int:
    """Interquartile mean as exact integers: mean of the sorted values at
    1-based ranks ⌈n/4⌉+1 .. ⌊3n/4⌋, truncating division (DuckDB's //
    truncates toward zero while Python's floors — sign-normalizing here
    keeps negative-sum bands engine-exact). Falls back to the plain mean
    when the band is empty (n ≤ 4 boundary cases)."""
    xs = sorted(int(v) for v in cents.dropna())
    n = len(xs)
    lo = -(-n // 4) + 1  # ceil(n/4) + 1
    hi = (3 * n) // 4
    band = xs[lo - 1 : hi] if hi >= lo else xs
    s, m = sum(band), len(band)
    # truncate toward zero, matching the oracle's DuckDB // semantics
    # (Python // floors: they differ on negative non-exact quotients)
    return s // m if s >= 0 else -((-s) // m)


@register(
    "events_iqm_udaf",
    oracle=f"""
    WITH c AS (
      SELECT event_type, {_CENTS} AS cents,
             row_number() OVER (
               PARTITION BY event_type ORDER BY {_CENTS}, event_id
             ) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
      WHERE (isfinite(value) AND abs(value) < 1e16)
    ),
    banded AS (
      SELECT event_type, n, cents,
             (rk >= CAST(ceil(n / 4.0) AS BIGINT) + 1
              AND rk <= (3 * n) // 4) AS in_band,
             (((3 * n) // 4) >= CAST(ceil(n / 4.0) AS BIGINT) + 1) AS has_band
      FROM c
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN has_band THEN
                      CASE WHEN in_band THEN cents END
                    ELSE cents END)
                // count(CASE WHEN has_band THEN
                           CASE WHEN in_band THEN 1 END
                         ELSE 1 END) AS BIGINT) AS iqm_cents
    FROM banded
    GROUP BY event_type
    """,
)
def events_iqm_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type average via a GROUPED_AGG pandas UDAF: the
    interquartile mean of the value column in exact cents. The oracle
    recomputes the identical rank-band in SQL, so the driver's hash
    compare certifies the Python aggregate against the declarative
    formulation — the UDAF analog of the codec round-trip tests."""
    e = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return (
        e.select("event_type", cents.alias("cents"))
        .groupBy("event_type")
        .agg(
            _n_rows(F.col("cents")).alias("n_events"),
            _iqm_cents(F.col("cents")).alias("iqm_cents"),
        )
    )


#: |z| threshold for the grouped z-score outlier report, in milli-z.
_Z_MILLI = 2500

_ZSCORE_SCHEMA = (
    "event_id long, event_type string, cents long, z_e3 long"
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group classical z-score in exact arithmetic: every sum is an
    arbitrary-precision Python int; z = (n·x − S)/√(n·Q − S²) touches
    float exactly twice (one sqrt, one division; the numerator may
    exceed 2^53 under hostile magnitudes — parity holds because both
    engines convert the same exact integer to the nearest double)."""
    pdf = pdf[pdf["cents"].notna()]
    xs = [int(v) for v in pdf["cents"]]
    n = len(xs)
    s = sum(xs)
    q = sum(x * x for x in xs)
    disc = n * q - s * s
    if disc <= 0:  # constant group: z undefined, nothing to report
        return pdf.iloc[0:0][["event_id", "event_type", "cents"]].assign(z_e3=0)
    sd = math.sqrt(float(disc))
    out = pdf.copy()
    out["z_e3"] = [math.floor((n * x - s) * 1000 / sd) for x in xs]
    out = out[abs(out["z_e3"]) >= _Z_MILLI]
    return out[["event_id", "event_type", "cents", "z_e3"]]


@register(
    "events_zscore_grouped",
    oracle=f"""
    WITH c AS (
      SELECT event_id, event_type, {_CENTS} AS cents FROM events
      WHERE event_type IS NOT NULL AND (isfinite(value) AND abs(value) < 1e16)
    ),
    stats AS (
      -- HUGEINT moments (fuzz 8): |cents| can reach ~1.2e13, so
      -- sum(cents^2) overflows INT64; the pandas side is exact Python
      -- ints, and both engines round the SAME exact integer to the
      -- nearest double before the one division, so parity holds even
      -- past 2^53
      SELECT event_type,
             count(*) AS n,
             sum(CAST(cents AS HUGEINT)) AS s,
             sum(CAST(cents AS HUGEINT) * cents) AS q
      FROM c GROUP BY event_type
    )
    SELECT c.event_id, c.event_type, c.cents,
           CAST(floor(CAST((st.n * c.cents - st.s) * 1000 AS DOUBLE)
                / sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE)))
                AS BIGINT) AS z_e3
    FROM c JOIN stats st USING (event_type)
    WHERE st.n * st.q > st.s * st.s
      AND abs(CAST(floor(CAST((st.n * c.cents - st.s) * 1000 AS DOUBLE)
                / sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE)))
                AS BIGINT)) >= {_Z_MILLI}
    """,
)
def events_zscore_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier report (|z| ≥ 2.5) via an
    ``applyInPandas`` grouped-map transform — the batch grouped-map cell
    of the UDF matrix, cross-checked against the window-aggregate SQL
    form. The floored milli-z is deterministic because the only float
    steps are an IEEE sqrt of an exactly-represented integer and one
    division with an exact < 2^53 numerator (see module docstring); a
    boundary tie at the 2500 threshold would need z exactly 2.5, which
    the irrational denominator rules out for nonzero numerators."""
    e = table(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return (
        e.select("event_id", "event_type", cents.alias("cents"))
        .groupBy("event_type")
        .applyInPandas(_zscore_group, _ZSCORE_SCHEMA)
    )


# ── Python UDTF: RAG-style overlapping chunker ────────────────────────────

#: chunk geometry in whitespace tokens: window 64, stride 48 (overlap 16)
CHUNK_TOKS = 64
CHUNK_STRIDE = 48


class _ChunkDoc:
    """Arrow-optimized Python UDTF: one document row in → one row per
    overlapping chunk out (the retrieval-indexing chunker: fixed token
    window, fixed stride, deterministic chunk ids and content hashes).

    Chunk k covers 0-based token span [k·stride, k·stride+window); k
    runs while k·stride < n_tokens, so every token is covered and the
    final chunk may be short. The md5 content hash makes the emitted
    VALUES verifiable cross-engine, not just the chunk arithmetic.
    """

    def eval(self, doc_id: int, toks: list):  # noqa: A003 - UDTF contract
        import hashlib

        n = len(toks)
        k = 0
        while k * CHUNK_STRIDE < n:
            s = k * CHUNK_STRIDE
            piece = toks[s : s + CHUNK_TOKS]
            text = " ".join(piece)
            yield (
                doc_id,
                k,
                s + 1,  # 1-based start, matching SQL list slicing
                s + len(piece),
                len(piece),
                hashlib.md5(text.encode()).hexdigest()[:16],
            )
            k += 1


_CHUNK_SCHEMA = (
    "doc_id bigint, chunk_idx bigint, start_tok bigint, end_tok bigint, "
    "n_toks bigint, chunk_md5 string"
)

_NORM_TOKS_SQL = (
    "string_split(translate(trim(regexp_replace(text, '[ \\t\\n\\r\\x0B\\f]+', ' ', 'g')), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')"
)


@register(
    "doc_rag_chunks",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, {_NORM_TOKS_SQL} AS toks FROM documents
    ),
    spans AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(generate_series(0, CAST(ceil(len(toks) /
                    {CHUNK_STRIDE}.0) AS BIGINT) - 1)) AS k
      FROM norm
      WHERE len(toks) > 0
    )
    SELECT doc_id,
           k AS chunk_idx,
           k * {CHUNK_STRIDE} + 1 AS start_tok,
           least(k * {CHUNK_STRIDE} + {CHUNK_TOKS}, n) AS end_tok,
           least(k * {CHUNK_STRIDE} + {CHUNK_TOKS}, n)
             - k * {CHUNK_STRIDE} AS n_toks,
           substr(md5(array_to_string(
             toks[k * {CHUNK_STRIDE} + 1 :
                  least(k * {CHUNK_STRIDE} + {CHUNK_TOKS}, n)], ' ')), 1, 16)
             AS chunk_md5
    FROM spans
    """,
)
def doc_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-indexing chunker as a PYTHON UDTF (the §2.11 table-
    function cell): every document lateral-joins to its overlapping
    64-token / 48-stride chunks with content hashes — the shape a RAG
    pipeline indexes. The DuckDB oracle rebuilds every chunk with list
    slicing + generate_series, so the driver hash certifies the UDTF's
    row expansion AND chunk contents.

    The UDTF runs Arrow-optimized (batched transfer); still, a Python
    table function is the API demonstration — the same expansion stays
    fully JVM-side as posexplode(sequence(...)) + slice() when the
    chunker needs no imperative logic (this one wouldn't; real ones
    carry tokenizer state that does). One narrow projection + the
    lateral expansion; no shuffle anywhere."""
    from pyspark.sql.functions import udtf

    chunker = udtf(_ChunkDoc, returnType=_CHUNK_SCHEMA, useArrow=True)
    spark.udtf.register("doc_chunker", chunker)
    docs = table(spark, sf_dir, "documents")
    toks = F.split(
        F.translate(F.trim(F.regexp_replace("text", r"[ \t\n\r\x0B\f]+", " ")), "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"), " "
    )
    docs.select("doc_id", toks.alias("toks")).where(
        F.size("toks") > 0
    ).createOrReplaceTempView("_rag_docs")
    return spark.sql(
        "SELECT c.* FROM _rag_docs d, LATERAL doc_chunker(d.doc_id, d.toks) c"
    )
