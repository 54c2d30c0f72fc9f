"""Scan-amplification audit: flag queries that scan ONE table many
times.

The round-8 sweep (SCALE.md "Measured scale exponents, r8 additions",
closing note) found multi-branch plans silently re-running corpus-sized
explodes because a shared frame fed several consumers — at 100 TB each
extra same-table scan is a full corpus pass. The fix, where it applies,
is a lazy localCheckpoint on the BOUNDED shared dimension (vocab/
bigram/doc-dim count frames), never on corpus-sized streams.

This tool machine-checks the sweep's outcome the way audit_plans.py
checks plan posture: for every registered query, count physical parquet
scans PER TABLE in the executed plan and fail on any query scanning one
table more than THRESHOLD times unless it is allowlisted with a reason.
Multi-TABLE joins (TPC-H shapes) never trip this — only same-table
amplification does.

Exit 1 on new offenders. Usage: python tools/audit_scans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

THRESHOLD = 4  # scans of the SAME table; >= this needs an allowlist row

# name -> (table, max allowed scans, reason)
ALLOW = {
    # Reads several published snapshots of the same logical table by
    # design (base + delta + refreshed aggregate verification).
    "incremental_agg_refresh": ("orders", 7, "multi-snapshot lakehouse read"),
    # UNION/INTERSECT/EXCEPT operator demo: each set operand is its own
    # filtered scan by construction.
    "set_operations": ("orders", 6, "set operands are separate scans"),
    # MERGE reads the target for match, anti, and verification passes —
    # the lakehouse upsert shape.
    "merge_upsert_orders": ("orders", 5, "merge target re-reads"),
    # Post-sweep floor: source dim, token explode, bigram explode, and
    # the fused doc/char census each need one documents pass; the
    # bounded count dimensions are already checkpointed (SCALE.md).
    "curation_lm_report": ("documents", 5, "four independent sub-pipelines"),
    # Grouped median-of-medians needs value + two median-join branches;
    # events scans are single-column pruned.
    "stats_outliers_mad": ("events", 4, "MAD needs median re-joins"),
    # Narrow doc_id-only projections joined twice against the LSH
    # candidates — rescan is cheaper than materializing (SCALE.md
    # stopping rule).
    "split_leakage_check": ("documents", 4, "pruned split projections"),
    # Shingle pipeline feeds source pairs from both sides.
    "source_overlap_matrix": ("documents", 4, "pair sides of one index"),
    # Sign-LSH bands build + both pair sides read the embeddings.
    "embedding_neardup": ("embeddings", 4, "band build + two pair sides"),
    # Exact top-k ground truth (documented brute-force baseline) plus
    # the clustered lane read the same vectors.
    "ann_label_purity": ("embeddings", 4, "exact baseline + eval lane"),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import DataFrame

    from etl_his_spark.registry import QUERIES
    from etl_his_spark.session import get_spark

    # Audit the PRE-checkpoint plans: Dataset.localCheckpoint replaces
    # the upstream subtree with a LogicalRDD, so explain() on the
    # shipped plan shows "Scan ExistingRDD" instead of the parquet
    # scans feeding the checkpoint — any same-table amplification
    # inside a checkpointed subtree would pass the gate silently
    # (round-8 ADVICE). No-op'ing localCheckpoint during the audit
    # makes every scan visible again; production behavior is untouched
    # (the patch lives only in this process).
    DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]

    spark = get_spark("audit_scans", cpus=8)
    violations = []
    checked = 0
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        except Exception as e:  # pragma: no cover - surfaced as violation
            violations.append(
                f"{name}: explain failed ({type(e).__name__}: {str(e)[:200]})"
            )
            continue
        checked += 1
        tables = re.findall(r"Location: \S*?/(\w+)\.parquet", buf.getvalue())
        for table, n in Counter(tables).items():
            if n < THRESHOLD:
                continue
            allow = ALLOW.get(name)
            if allow and allow[0] == table and n <= allow[1]:
                continue
            violations.append(
                f"{name}: scans {table} {n}x (threshold {THRESHOLD}, "
                f"allowlisted max "
                f"{allow[1] if allow and allow[0] == table else 'none'})"
            )
    if violations:
        print(f"{len(violations)} scan-amplification violations:")
        for v in violations:
            print(f"  - {v}")
        return 1
    print(f"scan audit clean: {checked} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
