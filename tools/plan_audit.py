"""Sweep every registered query and report executed-plan quality.

Usage: python tools/plan_audit.py [sf_dir] [name ...]

Prints one line per query — join strategies, exchange count, codegen
stages, pushdown status — and a WARN block for scale anti-patterns
(cartesian products, row-at-a-time Python evals, unexpected nested-loop
joins). Exit 1 if any warnings fire, so it can gate CI like a test.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatatiler_spark.plans.audit import audit  # noqa: E402
from bigdatatiler_spark.registry import load_all  # noqa: E402
from bigdatatiler_spark.session import get_spark  # noqa: E402


#: queries whose BroadcastNestedLoopJoin(s) are by design: the broadcast
#: side is a constant-size frame (a ≤5-row query set or a 1-row scalar
#: aggregate), so the "nested loop" is one pass over the big side.
#: r13 (verdict item 8): the value pins the EXPECTED BNLJ count — a future
#: accidental cartesian in one of these queries raises the count past the
#: pin and WARNs again, instead of being silenced by the name alone.
BNLJ_BY_DESIGN = {
    "knn_bruteforce_cosine": 1,  # 5 query vectors × corpus (exact baseline)
    "ann_hamming_binary_topk": 1,  # 5-row query-code broadcast × corpus codes
    "ann_ivf_topk": 0,  # centroids inlined as literal (r13) removed the probe BNLJ
    "ann_ivf_multiprobe": 0,  # centroids inlined as literal (r13)
    "dedup_embedding_cosine": 1,  # self-pair generation, id<id residual
    "tpch_q22_idle_customers": 1,  # 1-row scalar avg broadcast
    "tpch_q11_important_parts": 1,  # 1-row scalar threshold broadcast
    "sketch_frequent_tokens": 1,  # 1-row grand-total broadcast
    "sketch_kmv_join_estimate": 1,  # 1-row estimate × 1-row exact crossJoin
    "orders_selectivity_report": 4,  # 3-row predicate-list crossJoin (×2)
    "hybrid_search_rrf": 2,  # 5-row query block broadcast on both sides
    "doc_unigram_logprob": 1,  # 1-row corpus-total + vocab broadcast
    "embedding_kmeans_cells": 0,  # centroids inlined as literal (r13); pin stays so a re-introduced crossJoin shows as a count bump
    "doc_length_rank_deciles": 1,  # 1-row corpus-count broadcast
    "decontaminate_embedding_cosine": 1,  # 1-row benchmark-struct broadcast
    "events_zorder_key": 1,  # 1-row min/max-bounds broadcast
    "events_decayed_engagement": 1,  # 1-row reference-timestamp broadcast
    "orders_constraint_audit": 2,  # audit() cross-joins 1-row check frames
    "lineitem_constraint_audit": 2,  # same 1-row audit() combination
    "ann_pq_adc_topk": 3,  # 1-row codebook crossJoin (×2) + 5-row query ADC tables
    "basket_part_pairs": 1,  # 1-row total-baskets crossJoin for support denominator
    "bm25_topk": 1,  # 1-row corpus-stats (N, avgdl) scalar broadcast
    "doc_tfidf_keywords": 1,  # 1-row corpus-count crossJoin for the idf term
    "dedup_tfidf_cosine": 0,  # same 1-row corpus-count idf broadcast
    "corpus_pmi_collocations": 2,  # 1-row (T, B) totals crossJoin for the PMI term
    "events_type_drift_psi": 3,  # 1-row midpoint + 1-row totals crossJoins
    "orders_benford_audit": 1,  # 1-row digit-total crossJoin for expectations
    "events_chi2_independence": 1,  # 1-row grand-total crossJoin onto cells
    "graph_degree_assortativity": 2,  # two 1-row count crossJoins
    # distributed-rank / distributed-prefix-sum kernel (_util.py): the
    # per-bucket offset frame is ≤ n_buckets rows BY CONSTRUCTION (one row
    # per range bucket), and its triangular b._rb < a._rb broadcast join is
    # the kernel's exclusive-prefix step — the thing that REPLACED the
    # Exchange SinglePartition global window. Window partitioning is
    # plan-asserted in tests/test_plans.py; count-pinned per r12 ADVICE so
    # WARN means something again.
    "customer_rfm_segments": 6,
    "customer_revenue_equidepth": 2,
    "customer_revenue_gini": 1,
    "orders_abc_classification": 2,
    "dsir_importance_weights": 1,
    "pack_training_sequences": 1,
    "pack_sequence_manifest": 1,
    "pack_span_manifest": 1,
    "pack_curriculum_sequences": 1,
    "sketch_hll_native": 1,  # 1-row merged-estimate × 1-row exact-count crossJoin
}


#: the 10 most expensive bench lines (BENCH solo r9, streaming parities
#: excluded — their fn() runs the streaming engine and the post-sink plan
#: is not the scored dataflow). plans/join_strategy.json pins each one's
#: PHYSICAL JOIN STRATEGY counts: the shuffle budget catches an ADDED
#: exchange but not a strategy flip at fixed exchange count (BHJ→SMJ from
#: a stats/conf change, SMJ→BNLJ from a lost equi-condition) — the r8
#: verdict's EXPLAIN-diff gate. Regenerate with --write-joins after an
#: intentional plan change.
JOIN_PINNED = (
    "multimodal_video_scene_cuts",
    "doc_tile_bytecap_roundtrip",
    "dedup_components_two_star",
    "dedup_prefix_filter_jaccard",
    "sample_leakage_safe_split",
    "dedup_connected_components",
    "dedup_tfidf_cosine",
    "multimodal_video_frame_sample",
    "graph_bfs_hops",
    "bm25_topk",
)


def join_strategies(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    """{query: {bhj, smj, shj, bnlj}} over JOIN_PINNED from the same
    initial-plan audit surface the shuffle budget uses (deterministic at
    fixed SF/conf — AQE runtime conversions are not pinned)."""
    specs = load_all()
    out: dict[str, dict[str, int]] = {}
    for name in JOIN_PINNED:
        spark.catalog.clearCache()
        a = audit(specs[name].fn(spark, sf_dir))
        out[name] = {
            "bhj": a.broadcast_joins,
            "smj": a.sortmerge_joins,
            "shj": a.shuffledhash_joins,
            "bnlj": a.nestedloop_joins,
        }
    return out


def main() -> int:
    args = sys.argv[1:]
    budget_path = None
    if args and args[0] == "--write-joins":
        import json

        spark = get_spark("plan-audit")
        spark.sparkContext.setLogLevel("ERROR")
        sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.001"
        joins = join_strategies(spark, sf_dir)
        with open(args[1], "w") as f:
            json.dump(joins, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote join strategies for {len(joins)} queries to {args[1]}")
        return 0
    if args and args[0] == "--write-budget":
        budget_path = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:]
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    warned = False
    budget: dict[str, int] = {}
    for name, spec in sorted(specs.items()):
        if names and name not in names:
            continue
        try:
            # cold plan: a persist() materialized by an earlier query in
            # this loop would collapse shared branches to
            # InMemoryTableScan and under-count that query's exchanges
            spark.catalog.clearCache()
            a = audit(spec.fn(spark, sf_dir))
        except Exception as e:  # audit must cover everything — surface, don't die
            print(f"  ✗ {name}: audit failed: {e}")
            warned = True
            continue
        budget[name] = a.exchanges
        joins = []
        if a.broadcast_joins:
            joins.append(f"bhj={a.broadcast_joins}")
        if a.sortmerge_joins:
            joins.append(f"smj={a.sortmerge_joins}")
        if a.shuffledhash_joins:
            joins.append(f"shj={a.shuffledhash_joins}")
        if a.nestedloop_joins:
            joins.append(f"bnlj={a.nestedloop_joins}")
        print(
            f"  {name}: {' '.join(joins) or 'no-join'}"
            f" exch={a.exchanges} wscg={a.codegen_stages}"
            f" pushed={len(a.pushed_filters)}"
            f"{' topk' if a.takeordered else ''}"
        )
        for w in a.warnings:
            if (
                "BroadcastNestedLoopJoin" in w
                and name in BNLJ_BY_DESIGN
                and a.nestedloop_joins <= BNLJ_BY_DESIGN[name]
            ):
                print(
                    f"    note {w} (by design: tiny broadcast side; "
                    f"pinned ≤{BNLJ_BY_DESIGN[name]})"
                )
                continue
            print(f"    WARN {w}")
            warned = True
    if budget_path:
        import json

        if names and os.path.exists(budget_path):
            # partial run: merge into the existing budget, don't clobber it
            with open(budget_path) as f:
                merged = json.load(f)
            merged.update(budget)
            budget = merged
        with open(budget_path, "w") as f:
            json.dump(budget, f, indent=1, sort_keys=True)
        print(f"wrote shuffle budget for {len(budget)} queries to {budget_path}")
    return 1 if warned else 0


if __name__ == "__main__":
    raise SystemExit(main())
