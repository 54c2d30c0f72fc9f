"""Tri-scale gate for an UNREGISTERED queue module (r9 discipline).

Runs every (fn, oracle) pair of a queue dict at sf0.001 / sf0.01 /
sf0.1: the DuckDB oracle comparison (same canonicalization as
tools/check_correctness.py) must pass at EVERY scale, and wall times
are recorded with fitted scale exponents (the R10_QUEUE_SCALE.json
format) so registration day inherits both proofs.

Usage: python tools/queue_triscale.py [--module plans.queries_r11_queue]
       [--dict R11_QUEUE] [--out R11_QUEUE_SCALE.json] [name ...]
Continues through every requested name (so one run reports ALL
mismatches), then exits non-zero if any name failed an oracle
comparison at any scale — or if no SF_DIR existed at all (a vacuous
sweep must not read as a pass; the r8 audit lesson).
"""

from __future__ import annotations

import argparse
import importlib
import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--module", default="etl_his_spark.plans.queries_r11_queue")
    ap.add_argument("--dict", dest="dict_name", default="R11_QUEUE")
    ap.add_argument("--out", default="R11_QUEUE_SCALE.json")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from etl_his_spark.session import get_spark
    from tools.check_correctness import pdf_to_multiset

    queue = getattr(importlib.import_module(args.module), args.dict_name)
    names = args.names or sorted(queue)

    out_path = os.path.join(ROOT, args.out)
    out: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            out = json.load(f)

    failures = 0
    for name in names:
        fn, oracle = queue[name]
        per_sf: dict[str, float] = {}
        for sf_dir in SF_DIRS:
            if not os.path.isdir(sf_dir):
                continue
            spark = get_spark("queue-triscale")
            # Oracle comparison first (correctness at this sf).
            spdf = fn(spark, sf_dir).toPandas()
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{sf_dir}/{t}.parquet')"
                )
            dpdf = con.execute(oracle).fetch_df()
            ok = (
                sorted(spdf.columns) == sorted(dpdf.columns)
                and len(spdf) == len(dpdf)
                and len(spdf) > 0
                and pdf_to_multiset(spdf) == pdf_to_multiset(dpdf)
            )
            sf = sf_dir.rsplit("sf", 1)[-1]
            if not ok:
                failures += 1
                print(
                    f"FAIL {name} @ sf{sf}: spark={len(spdf)}"
                    f" oracle={len(dpdf)}",
                    file=sys.stderr,
                )
                spark.stop()
                break
            # Timed runs: warm once, min of 3 (the bench discipline).
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.time() - t0)
            spark.stop()
            per_sf[sf] = round(min(runs), 3)
        else:
            if not per_sf:
                # No SF_DIR existed: recording an empty entry and
                # printing OK would be a vacuous pass (the r8
                # scan-audit lesson). Count it as a failure instead.
                failures += 1
                print(
                    f"FAIL {name}: no sf dir found among {SF_DIRS}",
                    file=sys.stderr,
                )
                continue
            sfs = sorted(per_sf, key=float)
            alphas = {}
            for lo, hi in zip(sfs, sfs[1:]):
                alphas[f"{lo}->{hi}"] = round(
                    math.log(per_sf[hi] / per_sf[lo])
                    / math.log(float(hi) / float(lo)),
                    3,
                )
            out[name] = {"sec": per_sf, "alpha": alphas}
            print(f"OK {name}: {out[name]}", file=sys.stderr)
            continue
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"failures": failures, "checked": names}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
