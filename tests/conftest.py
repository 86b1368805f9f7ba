from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatatiler_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

#: Slow tier (r12 verdict item 3): the default `pytest tests/` run must
#: complete inside the driver's verification window, so the two files
#: whose wall-clock dwarfs everything else — the streaming micro-batch
#: replay matrix and the hostile-fixture differential sweep — are
#: SKIPPED by default with an explicit reason in the report, and run
#: when BDT_FULL_TESTS=1 (the builder's full gate before every round
#: commit; its result is recorded in OPTIMIZATION_r*.md). Contracts,
#: sf0.01 oracle comparisons, and the plan pins all stay in the default
#: tier. Measured per-file (idle box, r13): every other file ≤ ~100 s.
SLOW_TIER_FILES = ("test_streaming.py", "test_hostile_fixtures.py")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("BDT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set BDT_FULL_TESTS=1 to run (see conftest.py)"
    )
    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_TIER_FILES:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bigdatatiler-tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.ui.enabled": "false",
    })
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
