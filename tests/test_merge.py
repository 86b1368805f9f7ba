"""merge_upsert (MERGE INTO) semantics on hostile synthetic inputs."""

from __future__ import annotations


def test_merge_arms_and_column_resolution(spark):
    from bigdatatiler_spark.operators.sqlsurface import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, tag string, v long",
    )
    chg = spark.createDataFrame(
        [(2, "B", 200), (9, "z", 900)],
        "k long, tag string, v long",
    )
    out = {
        r.k: (r.tag, r.v, r.action)
        for r in merge_upsert(base, chg, "k", ("tag", "v")).collect()
    }
    assert out == {
        1: ("a", 10, "keep"),
        2: ("B", 200, "update"),
        3: ("c", 30, "keep"),
        9: ("z", 900, "insert"),
    }


def test_merge_partial_update_cols(spark):
    """Columns outside update_cols must keep the base value on a match."""
    from bigdatatiler_spark.operators.sqlsurface import merge_upsert

    base = spark.createDataFrame([(1, "keepme", 1)], "k long, tag string, v long")
    chg = spark.createDataFrame([(1, "clobber", 99)], "k long, tag string, v long")
    row = merge_upsert(base, chg, "k", ("v",)).collect()[0]
    assert (row.tag, row.v, row.action) == ("keepme", 99, "update")


def test_merge_empty_change_batch(spark):
    from bigdatatiler_spark.operators.sqlsurface import merge_upsert

    base = spark.createDataFrame([(1, "a", 10)], "k long, tag string, v long")
    chg = base.where("k < 0")
    rows = merge_upsert(base, chg, "k", ("v",)).collect()
    assert [(r.k, r.action) for r in rows] == [(1, "keep")]
