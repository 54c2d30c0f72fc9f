"""Ad-hoc per-query micro-benchmark for iterating on plans.

Usage: python tools/microbench.py q1 q2 ...   (names from the registry)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), RUNS (default 2).
Same methodology as bench.py (noop sink, min of RUNS), but only the
named queries — fast feedback while optimizing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__.strip(), file=sys.stderr)
        return 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "2"))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        print("names come from the registry (see __spark_entry__.queries())", file=sys.stderr)
        return 1
    from etl_his_spark.session import get_spark

    spark = get_spark("microbench")
    # Warmup on the first query
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings = {}
    for name in names:
        best = None
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best or 1e9, time.time() - t0)
        timings[name] = round(best, 3)
    print(json.dumps(timings))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
