"""Per-query wall-time budget: the named-regression tripwire.

The r6 verdict flagged 4 sub-2-second queries that ran 1.3-1.45x slower
in the driver's bench than the round before — adjudicated as shared-box
load noise, but "watch, don't chase" needs a mechanism. This tool turns
ONE solo bench run (low ambient load, the only Spark JVM on the box)
into a per-query budget file with a generous 2x tolerance + a 1.5 s
floor (sub-second timings are dominated by scheduling noise), so a real
regression is caught BY NAME the next time bench.py runs, while load
noise stays under the threshold.

bench.py reports budget violations on its detail line;
tests/test_time_budget.py gates that the file stays in sync with the
HEADLINE set.

Usage:
  python bench.py > /tmp/bench_solo.json          # SOLO — no other JVMs
  python tools/time_budget.py /tmp/bench_solo.json --write
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_PATH = os.path.join(REPO, "bigdatatiler_spark", "plans", "time_budget.json")

TOLERANCE = 2.0
FLOOR_SEC = 1.5


def build_budget(detail: dict) -> dict:
    assert detail.get("metric") == "headline_queries_detail", detail.get("metric")
    budget = {
        name: round(max(TOLERANCE * sec, FLOOR_SEC), 2)
        for name, sec in sorted(detail["queries"].items())
    }
    return {
        "sf": detail.get("sf"),
        "tolerance": TOLERANCE,
        "floor_sec": FLOOR_SEC,
        "source_total_sec": detail.get("value"),
        "budget_sec": budget,
    }


def main() -> int:
    path = sys.argv[1]
    detail = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                obj = json.loads(line)
                if obj.get("metric") == "headline_queries_detail":
                    detail = obj
    if detail is None:
        print("no headline_queries_detail line found", file=sys.stderr)
        return 1
    budget = build_budget(detail)
    if "--write" in sys.argv:
        with open(BUDGET_PATH, "w") as f:
            json.dump(budget, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {BUDGET_PATH} ({len(budget['budget_sec'])} entries)")
    else:
        print(json.dumps(budget, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
