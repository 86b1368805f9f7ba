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
    """Columns outside update_cols must keep the base value on a match —
    INCLUDING a NULL base value (ANSI MERGE leaves non-SET columns
    alone; a coalesce-based merge would clobber the NULL)."""
    from bigdatatiler_spark.operators.sqlsurface import merge_upsert

    base = spark.createDataFrame(
        [(1, "keepme", 1), (2, None, 2)], "k long, tag string, v long"
    )
    chg = spark.createDataFrame(
        [(1, "clobber", 99), (2, "clobber", 88)], "k long, tag string, v long"
    )
    rows = {r.k: r for r in merge_upsert(base, chg, "k", ("v",)).collect()}
    assert (rows[1].tag, rows[1].v, rows[1].action) == ("keepme", 99, "update")
    assert (rows[2].tag, rows[2].v, rows[2].action) == (None, 88, "update")


def test_merge_empty_change_batch(spark):
    from bigdatatiler_spark.operators.sqlsurface import merge_upsert

    base = spark.createDataFrame([(1, "a", 10)], "k long, tag string, v long")
    chg = base.where("k < 0")
    rows = merge_upsert(base, chg, "k", ("v",)).collect()
    assert [(r.k, r.action) for r in rows] == [(1, "keep")]


def test_merge_property_random_batches(spark):
    """merge_upsert vs a dict-model of MERGE semantics on randomized
    key sets (overlapping, disjoint, empty overlaps) — one Spark job per
    example batch."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdatatiler_spark.operators.sqlsurface import merge_upsert

    keys_st = st.lists(
        st.integers(min_value=0, max_value=15), unique=True, max_size=10
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(base_keys=keys_st, chg_keys=keys_st)
    def run(base_keys, chg_keys):
        base = spark.createDataFrame(
            [(k, k * 10) for k in base_keys], "k long, v long"
        )
        chg = spark.createDataFrame(
            [(k, k * 100) for k in chg_keys], "k long, v long"
        )
        model = {k: (k * 10, "keep") for k in base_keys}
        for k in chg_keys:
            model[k] = (k * 100, "update" if k in model else "insert")
        got = {
            r.k: (r.v, r.action)
            for r in merge_upsert(base, chg, "k", ("v",)).collect()
        }
        assert got == model

    run()
