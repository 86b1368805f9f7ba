"""Python UDAF / grouped-map kernels vs direct models on hostile groups."""

from __future__ import annotations

import math

import pandas as pd


def _iqm_model(xs):
    xs = sorted(xs)
    n = len(xs)
    lo = -(-n // 4) + 1
    hi = (3 * n) // 4
    band = xs[lo - 1 : hi] if hi >= lo else xs
    s, m = sum(band), len(band)
    return s // m if s >= 0 else -((-s) // m)  # truncating division


def test_iqm_band_boundaries(spark):
    """The rank band on tiny groups (n = 1..8): empty-band fallback and
    exact slice edges, UDAF vs the Python model."""
    from bigdatatiler_spark.operators.udaf import _iqm_cents, _n_rows
    from pyspark.sql import functions as F

    rows = []
    for n in range(1, 9):
        for i in range(n):
            rows.append((f"g{n}", (i + 1) * 100 + n))  # distinct values
    df = spark.createDataFrame(rows, "g string, cents long")
    got = {
        r.g: (r.n, r.iqm)
        for r in df.groupBy("g")
        .agg(_n_rows(F.col("cents")).alias("n"), _iqm_cents(F.col("cents")).alias("iqm"))
        .collect()
    }
    want = {}
    for n in range(1, 9):
        xs = [(i + 1) * 100 + n for i in range(n)]
        want[f"g{n}"] = (n, _iqm_model(xs))
    assert got == want


def test_zscore_constant_group_and_formula(spark):
    """Constant groups must vanish (variance 0), and reported z values
    must match the exact-integer formula replayed in Python."""
    from bigdatatiler_spark.operators.udaf import (
        _Z_MILLI,
        _ZSCORE_SCHEMA,
        _zscore_group,
    )

    xs = [100] * 20 + [100000]  # one extreme outlier
    pdf = pd.DataFrame(
        {
            "event_id": range(len(xs)),
            "event_type": ["t"] * len(xs),
            "cents": xs,
        }
    )
    out = _zscore_group(pdf)
    n, s = len(xs), sum(xs)
    q = sum(x * x for x in xs)
    sd = math.sqrt(float(n * q - s * s))
    want = {
        i: math.floor((n * x - s) * 1000 / sd)
        for i, x in enumerate(xs)
        if abs(math.floor((n * x - s) * 1000 / sd)) >= _Z_MILLI
    }
    assert dict(zip(out["event_id"], out["z_e3"])) == want
    assert len(want) >= 1  # the outlier must be reported

    const = pd.DataFrame(
        {"event_id": [1, 2], "event_type": ["c", "c"], "cents": [5, 5]}
    )
    assert len(_zscore_group(const)) == 0

    # schema sanity: the declared applyInPandas schema names the output
    assert [c.strip().split()[0] for c in _ZSCORE_SCHEMA.split(",")] == [
        "event_id",
        "event_type",
        "cents",
        "z_e3",
    ]


def test_rag_chunker_geometry():
    """Pure-Python chunk geometry: coverage (every token in ≥1 chunk),
    overlap (stride < window ⇒ consecutive chunks share 16 tokens), and
    the boundary counts at n = 1, 48, 49, 64, 65, 112, 113."""
    from bigdatatiler_spark.operators.udaf import (
        CHUNK_STRIDE,
        CHUNK_TOKS,
        _ChunkDoc,
    )

    def chunks(n):
        toks = [f"t{i}" for i in range(n)]
        return list(_ChunkDoc().eval(1, toks))

    expect_counts = {1: 1, 48: 1, 49: 2, 64: 2, 65: 2, 96: 2, 97: 3, 112: 3, 113: 3}
    for n, want in expect_counts.items():
        got = chunks(n)
        assert len(got) == want, f"n={n}: {len(got)} chunks, want {want}"
        covered = set()
        for _, k, s, e, m, _h in got:
            assert s == k * CHUNK_STRIDE + 1
            assert e - s + 1 == m <= CHUNK_TOKS
            covered.update(range(s, e + 1))
        assert covered == set(range(1, n + 1)), f"n={n}: coverage hole"
    # overlap: with n=65 the second chunk starts at 49 ≤ 64 = first end
    (_, _, _, e1, _, _), (_, _, s2, _, _, _) = chunks(65)
    assert s2 <= e1 and e1 - s2 + 1 == CHUNK_TOKS - CHUNK_STRIDE


def test_iqm_negative_band_truncates_like_duckdb(spark):
    """Negative band sums: Python // floors but DuckDB // truncates; the
    UDAF must truncate (e.g. sum -7 over 4 → -1, not -2) — verified
    against DuckDB's operator directly."""
    import duckdb

    from bigdatatiler_spark.operators.udaf import _iqm_cents
    from pyspark.sql import functions as F

    xs = [-9, -3, -2, -1, -1, 30]  # band (ranks 3..4 of 6) = [-2, -1]
    df = spark.createDataFrame([("g", x) for x in xs], "g string, cents long")
    got = (
        df.groupBy("g").agg(_iqm_cents(F.col("cents")).alias("iqm")).collect()
    )[0].iqm
    want = duckdb.sql("SELECT (-2 + -1) // 2").fetchone()[0]
    assert got == want == -1
