"""Driver-contract tests: entry smoke, registry consistency."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
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


def test_driver_window_covers_every_family():
    """The driver cross-checks only the first ~50 entries of queries()
    (round-1 evidence). Assert the curated order puts at least one query
    from every operator module inside that window, and that every
    _WINDOW_PRIORITY name actually exists (catches typos/renames)."""
    from bigdatatiler_spark import registry

    specs = registry.load_all()
    names = list(specs)
    missing = [n for n in registry._WINDOW_PRIORITY if n not in specs]
    assert not missing, f"_WINDOW_PRIORITY names not registered: {missing}"
    assert len(registry._WINDOW_PRIORITY) <= 50, "priority list overflows window"
    window = set(names[:50])
    families = {spec.fn.__module__ for spec in specs.values()}
    uncovered = [
        fam
        for fam in sorted(families)
        if not any(s.fn.__module__ == fam for n, s in specs.items() if n in window)
    ]
    assert not uncovered, f"families with no driver-window query: {uncovered}"


def test_window_rotates_fresh_names():
    """Certification-breadth gate (r6 verdict item 2): while any registered
    query has NEVER held a driver-window slot in any round's
    CORRECTNESS_r*.json, the curated window must contain at least one such
    never-certified name — the window may not stop rotating. Recomputed
    straight from the driver's files (no stale-artifact risk); the committed
    plans/window_ledger.json is the human-readable artifact of the same
    derivation (tools/window_ledger.py --write)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from window_ledger import build_ledger

    ledger = build_ledger(REPO)
    if not ledger["generated_from"]:
        return  # round 1: no driver files yet, nothing to rotate against
    if ledger["never_certified"]:
        assert ledger["current_window_fresh"], (
            f"{len(ledger['never_certified'])} registered queries have never "
            "held a driver-window slot, but the current window rotates none "
            "of them in — update registry._WINDOW_PRIORITY"
        )


def test_window_matches_staleness_policy():
    """Re-certification cadence gate (r8 verdict item 6): the curated
    window must be EXACTLY tools/window_ledger.py::next_window()'s output —
    never-certified names first-class, then one stalest-certified sentinel
    per uncovered module, then oldest-certified fill. Like
    test_window_rotates_fresh_names, this is red at each round start (the
    driver's committed CORRECTNESS_r{N}.json changes the derivation) until
    the builder's first rotation commit, which is the intended cadence."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from window_ledger import build_ledger, next_window

    from bigdatatiler_spark import registry

    if not build_ledger(REPO)["generated_from"]:
        return  # round 1: no driver files yet, no staleness to rotate by
    assert list(registry._WINDOW_PRIORITY) == next_window(REPO), (
        "window diverges from the staleness policy — regenerate "
        "registry._WINDOW_PRIORITY from `python tools/window_ledger.py "
        "--next-window`"
    )


def test_window_defer_only_new_names():
    """_WINDOW_DEFER exists so an operator registered MID-round (after
    the window froze and was verified) queues for the NEXT rotation
    instead of evicting a name this round must certify. Abuse guard:
    only names that have NEVER held a driver slot may be deferred —
    deferring a rotation-due name would stall its re-certification."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from window_ledger import build_ledger

    from bigdatatiler_spark import registry

    deferred = set(getattr(registry, "_WINDOW_DEFER", ()))
    if not deferred:
        return
    specs = registry.load_all()
    unknown = deferred - set(specs)
    assert not unknown, f"_WINDOW_DEFER names not registered: {unknown}"
    held = set(build_ledger(REPO)["ever_held_slot"])
    stale = deferred & held
    assert not stale, (
        f"_WINDOW_DEFER holds already-certified names {stale} — defer is "
        "only for mid-round NEW registrations; remove them at rotation"
    )


def test_window_ledger_artifact_current():
    """The committed ledger must match a fresh derivation (regenerate with
    `python tools/window_ledger.py --write` after each driver round)."""
    import json
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from window_ledger import build_ledger

    ledger_path = os.path.join(
        REPO, "bigdatatiler_spark", "plans", "window_ledger.json"
    )
    committed = json.load(open(ledger_path))
    assert committed == build_ledger(REPO), (
        "stale plans/window_ledger.json — run tools/window_ledger.py --write"
    )


def test_no_bare_epoch_ms_in_oracles():
    """Fuzz-7 class 26 lint: DuckDB's epoch_ms() TRUNCATES sub-ms
    pre-epoch instants toward zero while Spark's unix_millis() FLOORS
    them, so every oracle must use epoch_ms(date_trunc('milliseconds',
    x)) — the single-argument floor formulation. A bare epoch_ms( in any
    registered oracle is a latent divergence."""
    from bigdatatiler_spark.registry import load_all

    bad = []
    for name, spec in load_all().items():
        sql = spec.oracle or ""
        idx = 0
        while True:
            j = sql.find("epoch_ms(", idx)
            if j < 0:
                break
            rest = sql[j + len("epoch_ms(") :].lstrip()
            if not rest.startswith("date_trunc('milliseconds'"):
                bad.append(name)
                break
            idx = j + len("epoch_ms(")
    assert not bad, f"oracles with bare (truncating) epoch_ms: {sorted(set(bad))}"


def test_all_queries_execute_smoke(spark, sf_dir):
    """Every registered query runs end-to-end at sf0.001 (values checked
    against DuckDB separately in test_oracle.py at the same SF)."""
    mod = _load_entry()
    for name, fn in mod.queries().items():
        n = fn(spark, sf_dir).count()
        assert n >= 0, name


def test_no_hash_hostile_output_types(spark):
    """Registry determinism lint: no registered query may emit raw
    TIMESTAMP/DATE (stringification and tz semantics differ between
    engines — the rules demand epoch-ms longs) or FLOAT32 (repr drifts
    through float→double widening) columns. DOUBLE is permitted only
    because every emitting query derives it from exact decimal sums +
    explicit rounding (registry.py rules) — verified conf-invariant by
    the env sweep."""
    from pyspark.sql.types import (
        DateType,
        FloatType,
        TimestampNTZType,
        TimestampType,
    )

    from bigdatatiler_spark.registry import load_all

    bad = []
    for name, spec in load_all().items():
        df = spec.fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(
                f.dataType, (TimestampType, TimestampNTZType, DateType, FloatType)
            ):
                bad.append((name, f.name, str(f.dataType)))
    assert not bad, f"hash-hostile output columns: {bad}"


def test_no_oracle_names_stay_out_of_window():
    """Terminal adjudication of oracle-less queries (r9 verdict item 3):
    the driver's checker has no rows-only mode — a registered query with
    ``oracle=None`` in the window is a GUARANTEED non-green board row
    (sketch_hll_native r9: ``err: no_oracle``). Such names stay
    registered and locally rows-only-checked, but may never occupy a
    window slot, never count as rotation backlog, and never re-enter via
    sentinel/fill (policy lives in tools/window_ledger.py)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from window_ledger import build_ledger

    from bigdatatiler_spark import registry

    specs = registry.load_all()
    no_oracle = {n for n, s in specs.items() if s.oracle is None}
    # the set may be EMPTY (sketch_hll_native gained an exact-bound
    # oracle in r11); the policy still gates any future oracle-less name
    leaked = no_oracle & set(registry._WINDOW_PRIORITY)
    assert not leaked, f"oracle-less names hold window slots: {leaked}"
    ledger = build_ledger(REPO)
    assert sorted(no_oracle) == ledger["no_oracle_excluded"]
    assert not no_oracle & set(ledger["never_certified"])


def test_no_bare_persist_in_package():
    """r11 verdict item 3: a bare ``.persist()`` accumulates CacheManager
    entries across queries in a long-lived session with no unpersist
    hook. Shared intermediates cache via ``localCheckpoint(eager=False)``
    instead (same reuse, plus a lineage cut, plus block release when the
    RDD is dereferenced) — pin that the pattern stays out."""
    import glob

    pkg = os.path.join(os.path.dirname(__file__), "..", "bigdatatiler_spark")
    offenders = []
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        with open(path) as f:
            for i, line in enumerate(f, 1):
                if ".persist()" in line.split("#")[0]:
                    offenders.append(f"{os.path.relpath(path, pkg)}:{i}")
    assert not offenders, f"bare persist() sites: {offenders}"
