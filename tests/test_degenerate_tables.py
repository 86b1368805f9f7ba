"""Fuzz round 13 (c): degenerate-cardinality differential pins.

``tools/hostile_fixtures.py --truncate0 / --truncate1`` derive variants
of the fixture where EVERY table holds 0 rows (the empty-partition /
empty-table axis: a 100 TB pipeline's first backfill day, a filter that
matches nothing) or exactly 1 row (zero variances, self-pairs,
single-group quantiles). The full 212-query sweep over both variants
found three divergence classes this round:

- class 46 — Spark's ROLLUP/CUBE on EMPTY input emits NO rows at all
  (it drops even the ``()`` grouping set) while DuckDB emits the SQL-
  standard grand-total row with count 0. Pinned to Spark's behavior via
  ``HAVING count(*) > 0`` in the oracles (region_rollup,
  priority_status_cube).
- class 47 — empty-input SUM is NULL in Spark where the oracle computes
  a COUNT (0), and ANSI ``/ 0`` ERRORS on degenerate denominators where
  the ratio is simply undefined: funnel step counts coalesce to 0 with a
  NULL-safe rate (int_ratio now NULL on zero denominators, oracles use
  nullif), constraint-audit violation sums coalesce to 0, global revenue
  aggregates coalesce to 0 (money_sum0), Pearson correlation guards zero
  variance to NULL on both engines.
- class 48 — pandas-materialization representation coupling: a column
  that is ALL-NULL numeric at degenerate cardinality materializes as
  float64 NaN (str 'nan') from DuckDB's .df() but object None
  (str 'None') from a row-tuple DataFrame, even though the type-
  normalized value hashes are IDENTICAL. Where the NULL is semantically
  load-bearing (an undefined statistic, an open SCD2 interval), the
  value is kept and only the weaker fetchall-hash equality is asserted
  (REPR_EXCEPTIONS below names each column); everywhere else the fix
  made the dtype stable and the full pandas-hash equality is pinned.

This test rebuilds both variants in tmp and re-runs every once-red
query through BOTH engines so none of the classes can silently return.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from bigdatatiler_spark.registry import load_all
from bigdatatiler_spark.tables import TABLES
from tools.check_oracle import pandas_hash, table_hash
from tools.hostile_fixtures import build_truncated

#: every query red in the round-13 trunc0/trunc1 sweeps before the fixes
DEGENERATE_PINNED = (
    "corpus_zipf_slope",
    "customer_revenue_gini",
    "events_funnel_conversion",
    "events_funnel_windowed",
    "events_hourly_anomaly",
    "graph_degree_assortativity",
    "lineitem_constraint_audit",
    "lineitem_price_quantity_corr",
    "orders_constraint_audit",
    "orders_priority_scd2",
    "orders_profile",
    "priority_status_cube",
    "region_rollup",
    "sketch_kmv_join_estimate",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q6_forecast_revenue",
)

#: class 48: queries whose degenerate output holds an ALL-NULL numeric
#: column whose NULL is semantically load-bearing — value hashes are
#: still asserted equal; only the raw-str pandas comparison is waived
REPR_EXCEPTIONS = {
    "corpus_zipf_slope",            # zipf_slope_e6: undefined on <2 ranks
    "customer_revenue_gini",        # gini_e6: undefined with no revenue
    "events_funnel_conversion",     # rate: NULL when n_signup = 0
    "events_funnel_windowed",       # rate: NULL when n_signup = 0
    "events_hourly_anomaly",        # zscore: NULL at zero variance
    "graph_degree_assortativity",   # assortativity: undefined, no edges
    "lineitem_price_quantity_corr", # corr_e6: NULL at zero variance
    "orders_priority_scd2",         # valid_to_ms: open current interval
    "sketch_kmv_join_estimate",     # est_intersection_e2: empty sketches
    "tpch_q14_promo_revenue",       # promo_pct_e6: 0/0 promo share
}

assert len(set(DEGENERATE_PINNED)) == len(DEGENERATE_PINNED)


@pytest.fixture(scope="module", params=[0, 1], ids=["rows0", "rows1"])
def degen_dir(request, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp(f"degen{request.param}"))
    build_truncated("/root/testdata/sf0.001", dest, request.param)
    return dest


@pytest.fixture(scope="module")
def oracle_con(degen_dir):
    con = duckdb.connect()
    # threads=1: DuckDB 1.0.0's parallel window operator non-
    # deterministically merges sessions across far-future timestamp
    # gaps (~1/12 runs on the hostile fixture, r11); single-threaded
    # execution is stable and canonical
    con.execute("SET threads=1")
    for t in TABLES:
        p = os.path.join(degen_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", DEGENERATE_PINNED)
def test_degenerate_differential(name, spark, degen_dir, oracle_con):
    import pandas as pd

    spec = load_all()[name]
    sdf = spec.fn(spark, degen_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    res = oracle_con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols)
    sn, sh = table_hash(scols, srows)
    on, oh = table_hash(ocols, orows)
    assert sn == on, f"{name}: rowcount {sn} != {on} on degenerate tables"
    assert sh == oh, f"{name}: value hash diverges on degenerate tables"
    if name not in REPR_EXCEPTIONS:
        opdf = oracle_con.execute(spec.oracle).df()
        assert pandas_hash(
            pd.DataFrame(srows, columns=scols)
        ) == pandas_hash(opdf), (
            f"{name}: pandas-materialization hash diverges on degenerate "
            "tables (all-NULL numeric dtype coupling — class 48)"
        )
