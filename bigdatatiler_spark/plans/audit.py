"""Physical-plan audit: make the 100 TB design properties inspectable.

SURVEY.md §4's conclusion is that Catalyst supplies every optimization the
reference does by hand (pushdown, partition routing, top-k) plus the ones
it lacks (column pruning, join planning). This module turns those claims
into checkable facts: given any engine DataFrame, extract what the
*executed* plan actually does — which filters reached the parquet scan,
which joins broadcast, how wide the read schema is, whether a cartesian
product or a row-at-a-time Python eval snuck in.

Used three ways:
- tests/test_plans.py asserts properties per query;
- tools/plan_audit.py sweeps every registered query and prints a report
  (the per-round plan-quality gate);
- interactively: ``audit(df)`` while developing an operator, iterating
  until the plan is the one you'd want at 1000 executors.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def executed_plan(df) -> str:
    """The AQE-final executed plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def full_explain(df) -> str:
    """All plan phases + scan details (PushedFilters / ReadSchema live here)."""
    return df._jdf.queryExecution().toString()


@dataclass
class PlanAudit:
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffledhash_joins: int = 0
    nestedloop_joins: int = 0
    cartesian: bool = False
    exchanges: int = 0
    codegen_stages: int = 0
    python_evals: int = 0
    takeordered: bool = False
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)

    @property
    def warnings(self) -> list[str]:
        w = []
        if self.cartesian:
            w.append("CartesianProduct in plan — O(n*m) at scale")
        if self.nestedloop_joins:
            w.append(
                f"{self.nestedloop_joins} BroadcastNestedLoopJoin(s) — fine only "
                "if one side is provably tiny"
            )
        if self.python_evals:
            w.append(
                f"{self.python_evals} non-Arrow Python eval node(s) — row-at-a-time "
                "serialization in the hot path"
            )
        return w


def audit(df) -> PlanAudit:
    plan = executed_plan(df)
    full = full_explain(df)
    return PlanAudit(
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sortmerge_joins=plan.count("SortMergeJoin"),
        shuffledhash_joins=plan.count("ShuffledHashJoin"),
        nestedloop_joins=plan.count("BroadcastNestedLoopJoin"),
        cartesian="CartesianProduct" in plan,
        exchanges=plan.count("Exchange "),
        codegen_stages=len(set(re.findall(r"\*\((\d+)\)", plan))),
        python_evals=plan.count("BatchEvalPython"),
        takeordered="TakeOrderedAndProject" in plan,
        # the explain output truncates long filter lists with "..." (no
        # closing bracket), so capture up to whichever terminator appears
        pushed_filters=[
            m.strip()[:160]
            for m in re.findall(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", full)
            if m.strip()
        ],
        read_schemas=re.findall(r"ReadSchema: ([^\n]*)", full),
    )
