"""as-of join semantics on controlled data."""

from __future__ import annotations

import pytest

from bigdatatiler_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.createDataFrame(
        [(100, "u1", 50), (101, "u1", 10), (102, "u2", 30), (103, "u3", 99)],
        ["event_id", "user_id", "t"],
    )
    ref = spark.createDataFrame(
        [(1, "u1", 20), (2, "u1", 50), (3, "u2", 31)],
        ["event_id", "user_id", "t"],
    )
    return probe, ref


def test_asof_semantics(spark, frames):
    probe, ref = frames
    out = {
        r["event_id"]: r["ref_event_id"]
        for r in asof_join(
            probe, ref, on="user_id", time_col="t", payload_cols=("event_id",)
        ).collect()
    }
    assert out[100] == 2  # equal timestamp matches (inclusive >=)
    assert out[101] is None  # no ref at-or-before t=10
    assert out[102] is None  # u2's only ref is later (t=31 > 30)
    assert out[103] is None  # key with no ref rows at all


def test_asof_forward_semantics(spark, frames):
    probe, ref = frames
    out = {
        r["event_id"]: r["ref_event_id"]
        for r in asof_join(
            probe,
            ref,
            on="user_id",
            time_col="t",
            payload_cols=("event_id",),
            direction="forward",
        ).collect()
    }
    assert out[100] == 2  # equal timestamp matches (inclusive >=)
    assert out[101] == 1  # earliest ref at-or-after t=10 is t=20
    assert out[102] == 3  # u2's ref at t=31 >= 30
    assert out[103] is None  # key with no ref rows at all


def test_asof_tiebreak_deterministic(spark):
    """Two refs at the SAME (key, time): backward picks the largest
    tiebreak id, forward the smallest (divergence class 17)."""
    probe = spark.createDataFrame([(100, "u1", 50)], ["event_id", "user_id", "t"])
    ref = spark.createDataFrame(
        [(7, "u1", 50), (3, "u1", 50), (5, "u1", 50)],
        ["event_id", "user_id", "t"],
    )
    back = asof_join(
        probe, ref, on="user_id", time_col="t",
        payload_cols=("event_id",), tiebreak_col="event_id",
    ).collect()
    assert back[0]["ref_event_id"] == 7
    fwd = asof_join(
        probe, ref, on="user_id", time_col="t",
        payload_cols=("event_id",), direction="forward", tiebreak_col="event_id",
    ).collect()
    assert fwd[0]["ref_event_id"] == 3


def test_asof_direction_validation(spark, frames):
    probe, ref = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            probe, ref, on="user_id", time_col="t",
            payload_cols=("event_id",), direction="sideways",
        )
