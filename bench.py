"""Benchmark harness — the driver runs this per round at sf0.1.

Runs the headline queries on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), forcing full
execution with a noop write (JVM-side, no driver collect), and prints
ONE JSON line with per-query wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_fact",
    "join_inner_broadcast",
    "join_self_roles",
    "unpivot_measures",
    "dedup_first_per_key",
    "agg_pricing_summary",
    "topk_customers",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_simhash",
    "embedding_neardup",
    "ann_topk_bruteforce",
    "events_sessionize",
    "events_asof_join",
    "events_window_agg",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from etl_his_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n.startswith("bench_") and n not in HEADLINE
    ]

    # Warm the JVM + parquet footers once so timings measure the engine,
    # not first-touch initialization.
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
