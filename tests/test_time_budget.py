"""Gate: the per-query wall-time budget stays in sync with bench.py.

The budget file (bigdatatiler_spark/plans/time_budget.json) is generated
from ONE solo bench run by tools/time_budget.py --write; bench.py then
reports any query exceeding its budget BY NAME on the detail line. This
test pins the bookkeeping (coverage + sanity), not the timings — timings
are machine-load-dependent and belong to bench runs, not pytest.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_PATH = os.path.join(REPO, "bigdatatiler_spark", "plans", "time_budget.json")


def _load():
    with open(BUDGET_PATH) as f:
        return json.load(f)


def test_budget_covers_every_headline_query():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    budget = _load()
    missing = [n for n in bench.HEADLINE if n not in budget["budget_sec"]]
    assert not missing, (
        f"HEADLINE queries without a wall-time budget (regenerate with "
        f"tools/time_budget.py --write after a solo bench): {missing}"
    )
    assert "ann_ivf_index_build" in budget["budget_sec"]


def test_budget_values_sane():
    budget = _load()
    assert budget["tolerance"] >= 1.5  # generous by design — noise immunity
    assert budget["floor_sec"] >= 1.0
    for name, cap in budget["budget_sec"].items():
        assert cap >= budget["floor_sec"], (name, cap)
        assert cap < 120.0, (name, cap)  # nothing should budget >2 min at sf0.1
