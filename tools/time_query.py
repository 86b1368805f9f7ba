"""Low-noise per-query timing: fresh JVM, bench methodology, min-of-N.

Usage:
    python tools/time_query.py [-n REPS] <name> [name ...]

Times each named registered query exactly like bench.py (noop sink, warmup
first, spark.catalog.clearCache + persistent-RDD sweep between runs) but in
a FRESH session with only the requested queries, so the long-session
GC/python-worker stall class that inflates late bench lines cannot fire.
Reports every reputation and the min — the min of N cold runs is the
number a plan change has to move (a one-off stall can inflate any single
run; it cannot inflate all of them).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatatiler_spark.registry import load_all
from bigdatatiler_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    if not args:
        print(__doc__)
        sys.exit(2)
    spark = get_spark("bigdatatiler-timeq", extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    def _run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _clear() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    # warmup: JVM codegen + parquet footer caches + Python worker pool
    # (same as bench.py)
    from bench import _warm_python_workers

    _run(specs["events_filtered_topk"].fn(spark, SF_DIR))
    _warm_python_workers(spark)
    _clear()

    out: dict[str, dict] = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"time_query: {name}")
        runs = []
        for _ in range(reps):
            t0 = time.time()
            _run(specs[name].fn(spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
            _clear()
        out[name] = {"min": min(runs), "runs": runs}
        print(f"{name}: min={min(runs)} runs={runs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
