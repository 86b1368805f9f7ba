"""Connected-components unit tests: chains, cycles, disjoint clusters —
the label-propagation fixpoint must equal the true components."""

from __future__ import annotations

import pytest

from bigdatatiler_spark.operators.graph import connected_components


def _clusters(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["a", "b"])
    rows = connected_components(df, "a", "b", **kw).collect()
    return {r["node"]: r["cluster_id"] for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter > 1 forces multiple iterations
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cycle_and_disjoint_components(spark):
    got = _clusters(spark, [(10, 20), (20, 30), (30, 10), (7, 8), (100, 50)])
    assert got == {10: 10, 20: 10, 30: 10, 7: 7, 8: 7, 100: 50, 50: 50}


def test_duplicate_and_reversed_edges(spark):
    got = _clusters(spark, [(2, 1), (1, 2), (2, 1), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_reliable_lineage_cut_mode(spark, tmp_path):
    """lineage_cut='reliable' must produce identical components through
    the fault-tolerant checkpoint path (the real-cluster setting, where
    localCheckpoint blocks die with a lost executor), and must refuse to
    run without a checkpoint dir rather than fail rounds in."""
    edges = [(1, 2), (2, 3), (3, 4), (9, 8)]
    with pytest.raises(ValueError, match="setCheckpointDir"):
        _clusters(spark, edges, lineage_cut="reliable")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    reliable = _clusters(spark, edges, lineage_cut="reliable")
    local = _clusters(spark, edges, lineage_cut="local")
    assert reliable == local == {1: 1, 2: 1, 3: 1, 4: 1, 9: 8, 8: 8}


def test_invalid_lineage_cut_rejected(spark):
    with pytest.raises(ValueError, match="lineage_cut"):
        _clusters(spark, [(1, 2)], lineage_cut="bogus")
