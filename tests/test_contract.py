"""Driver-contract tests: entry smoke, registry consistency."""

from __future__ import annotations

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["event_id", "ts_ms", "user_id", "event_type", "value"]


def test_registry_consistency(spark):
    mod = _load_entry()
    qs, osql = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 40
    assert set(osql) <= set(qs)
    # every callable is (spark, sf_dir) -> DataFrame (lazy — no job run here)
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name


def test_all_queries_execute_smoke(spark, sf_dir):
    """Every registered query runs end-to-end at sf0.001 (values checked
    against DuckDB separately in test_oracle.py at the same SF)."""
    mod = _load_entry()
    for name, fn in mod.queries().items():
        n = fn(spark, sf_dir).count()
        assert n >= 0, name
