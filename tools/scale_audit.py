"""Scale-exponent audit (r6 verdict item 8).

Runs the graph/ANN heavies at every available scale factor and fits the
wall-time scaling exponent alpha in t ~ c * sf^alpha from the log-log
endpoints. The point: the O(m^1.5) wedge bound for triangle counting
and the per-round-shuffle bounds for components/PageRank are ARGUED in
SCALE.md — this measures them. alpha is computed between consecutive
SF pairs and over the full span; a superlinear surprise (alpha well
above the documented bound) is the signal to investigate.

Caveats recorded with the numbers: at small SFs fixed per-query
overhead (plan compile, job scheduling, Python<->JVM chatter) dominates
and DEFLATES alpha, so the 0.01->0.1 pair is the meaningful one; each
query runs in a fresh session min-of-3 (the bench discipline).

Usage: python tools/scale_audit.py [query ...]
Prints one JSON line and writes SCALE_AUDIT.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "graph_triangle_counts",
    "graph_pagerank_trade",
    "dedup_components",
    "ann_topk_pq_adc",
    "dedup_minhash_lsh",
    "corpus_pipeline",
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    from etl_his_spark.registry import ordered_queries
    from etl_his_spark.session import get_spark

    qs = ordered_queries()
    # Merge into the existing audit so partial runs (new queries only)
    # extend the record instead of clobbering prior exponents.
    audit_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_AUDIT.json",
    )
    out: dict = {}
    if os.path.exists(audit_path):
        with open(audit_path) as f:
            out = json.load(f)
    for name in names:
        per_sf: dict[str, float] = {}
        for sf_dir in SF_DIRS:
            if not os.path.isdir(sf_dir):
                continue
            spark = get_spark("scale-audit")
            # warm: parquet footers + plan for THIS sf, outside timing
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            spark.stop()
            per_sf[sf_dir.rsplit("sf", 1)[-1]] = round(min(runs), 3)
        sfs = sorted(per_sf, key=float)
        alphas = {}
        for lo, hi in zip(sfs, sfs[1:]):
            alphas[f"{lo}->{hi}"] = round(
                math.log(per_sf[hi] / per_sf[lo])
                / math.log(float(hi) / float(lo)),
                3,
            )
        out[name] = {"sec": per_sf, "alpha": alphas}
        print(f"{name}: {out[name]}", file=sys.stderr)
    with open(audit_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
