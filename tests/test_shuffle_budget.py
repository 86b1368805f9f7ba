"""Shuffle-budget regression gate.

Every registered query's executed plan has a pinned exchange (shuffle)
count in ``bigdatatiler_spark/plans/shuffle_budget.json``. A code change
that adds a shuffle to ANY query — the regression class that silently
turns a 100 TB-viable plan into a bottleneck — fails here with the query
named, instead of surfacing as a slow bench three rounds later.

The budget is a CEILING: plans may improve (fewer exchanges) freely; a
legitimate increase requires regenerating the file
(``python tools/plan_audit.py --write-budget
bigdatatiler_spark/plans/shuffle_budget.json``) and justifying the diff
in review. New queries must add themselves to the budget the same way.
"""

from __future__ import annotations

import json
import os

from bigdatatiler_spark.plans.audit import audit
from bigdatatiler_spark.registry import load_all

SF = "/root/testdata/sf0.001"
BUDGET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bigdatatiler_spark",
    "plans",
    "shuffle_budget.json",
)

#: map-only operators: zero exchanges is part of their contract (any
#: shuffle at all means the scan→project pipeline broke)
MAP_ONLY = (
    "doc_token_stats",
    "doc_lang_id",
    "doc_quality_score",
    "doc_bpe_token_counts",
    "doc_pii_scrub",
    "doc_rolling_hash",
    "doc_fingerprint_bottomk",
    "dedup_simhash",
    "doc_blocklist_filter",
    "multimodal_payload_stats",
    "events_point_read",
    "events_filtered_topk",
    "events_page_keyset",
    "event_id_generation",
    "part_unpivot_measures",
)


def test_shuffle_budget_holds(spark):
    with open(BUDGET_PATH) as f:
        budget = json.load(f)
    specs = load_all()
    missing = [n for n in specs if n not in budget]
    assert not missing, (
        f"queries with no shuffle-budget entry: {missing} — run "
        "python tools/plan_audit.py --write-budget "
        "bigdatatiler_spark/plans/shuffle_budget.json and review the diff"
    )
    over = {}
    for name, spec in specs.items():
        # measure the COLD plan: persist()-bearing queries (bm25, phash)
        # otherwise count InMemoryTableScan-collapsed plans or not
        # depending on which tests ran earlier in the shared session —
        # the budget is generated cold (plan_audit clears cache too)
        spark.catalog.clearCache()
        a = audit(spec.fn(spark, SF))
        if a.exchanges > budget[name]:
            over[name] = (a.exchanges, budget[name])
    assert not over, f"shuffle-budget regressions (got, budget): {over}"


def test_map_only_queries_have_zero_exchanges(spark):
    specs = load_all()
    bad = {}
    for name in MAP_ONLY:
        a = audit(specs[name].fn(spark, SF))
        if a.exchanges != 0:
            bad[name] = a.exchanges
    assert not bad, f"map-only operators grew a shuffle: {bad}"
