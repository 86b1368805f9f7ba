"""Semantic tests for the round-5 monitoring/retrieval operators:
PSI distribution drift, CUSUM change-point, positional proximity.

The oracle differential proves cross-engine equality; these pin the
MEANING on constructed inputs with known answers (a balanced corpus has
zero PSI; a step series change-points at the step; a phrase at known
positions yields the known distance)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _write_events(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")
    return d


def _t(hour, minute=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=hour, minutes=minute)


def test_psi_zero_on_balanced_halves(spark, tmp_path):
    from bigdatatiler_spark.operators.quality import events_type_drift_psi

    # two types, each with the same count in [h0, h2) and [h2, h4):
    # p == q per type -> ln(1) = 0 -> every term exactly 0
    rows = []
    eid = 0
    for half_start in (0, 2):
        for ty, n in (("click", 3), ("view", 5)):
            for i in range(n):
                rows.append((eid, _t(half_start, i + 1), 1, ty, 1.0, "{}"))
                eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in events_type_drift_psi(spark, sf).collect()}
    assert set(out) == {"click", "view"}
    for r in out.values():
        assert r["psi_term_e6"] == 0, r


def test_psi_nonzero_on_shifted_mix(spark, tmp_path):
    from bigdatatiler_spark.operators.quality import events_type_drift_psi

    # 'click' dominates the first half, 'view' the second -> both terms
    # positive (PSI terms are (p-q)ln(p/q) >= 0 always)
    rows = []
    eid = 0
    for ty, n in (("click", 8), ("view", 2)):
        for i in range(n):
            rows.append((eid, _t(0, i + 1), 1, ty, 1.0, "{}"))
            eid += 1
    for ty, n in (("click", 2), ("view", 8)):
        for i in range(n):
            rows.append((eid, _t(3, i + 1), 1, ty, 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = events_type_drift_psi(spark, sf).collect()
    assert all(r["psi_term_e6"] > 0 for r in out), out


def test_cusum_finds_step_change(spark, tmp_path):
    from bigdatatiler_spark.operators.quality import events_cusum_changepoint

    # 6 hours at 100 cents, then 6 hours at 500 cents: |CUSUM| peaks at
    # the last pre-step hour (hour 5)
    rows = []
    eid = 0
    for h in range(12):
        v = 1.0 if h < 6 else 5.0
        rows.append((eid, _t(h), 1, "click", v, "{}"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    [r] = events_cusum_changepoint(spark, sf).collect()
    assert r["n_hours"] == 12
    expect_ms = int(_t(5).replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert r["changepoint_ms"] == expect_ms
    # mean = (6*100 + 6*500) // 12 = 300; CUSUM at hour 5 = 6*(100-300)
    assert r["max_abs_cusum_cents"] == 1200


def test_phrase_proximity_known_positions(spark, tmp_path):
    from bigdatatiler_spark.operators.retrieval import doc_phrase_proximity

    docs = [
        # 'aa' x4 and 'bb' x3 dominate; doc 0 has them adjacent,
        # doc 1 has them 4 apart, doc 2 lacks 'bb' entirely
        (0, "aa bb zz yy", None, "s", 11),
        (1, "aa xx ww qq bb aa bb", None, "s", 20),
        (2, "aa cc dd", None, "s", 8),
    ]
    d = str(tmp_path)
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in doc_phrase_proximity(spark, d).collect()}
    assert set(out) == {0, 1}  # doc 2 has no 'bb'
    assert out[0]["min_dist"] == 1 and out[0]["within_window"] == 1
    # doc 1: aa at 1,6; bb at 5,7 -> min |Δ| = 1 (6 vs 5 or 7)
    assert out[1]["min_dist"] == 1
    assert out[1]["n_t1"] == 2 and out[1]["n_t2"] == 2
