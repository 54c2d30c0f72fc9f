"""Runtime scale-guards for quadratic ground-truth baselines.

The repo keeps a handful of deliberately all-pairs operators as exact
ground truth for recall/precision tests of the banded/bucketed scale
paths (``embedding_neardup_pairs``, ``brute_force_topk``,
``jaccard_pairs``). Their docstrings warn "do not use at scale", but a
docstring cannot stop a user from pointing one at a 100 TB table — so
each now calls :func:`assert_baseline_scale` and fails fast with the
name of its scale-safe twin (r10 verdict item 5, mirroring the r10
SimHash lane-overflow guard).

The check is ``df.limit(cap + 1).count()``: LocalLimit short-circuits
the scan after ``cap + 1`` rows, so the guard costs a bounded partial
scan even against an arbitrarily large input — never a full count,
and never the quadratic join it exists to prevent. The small eager
job at plan-build time follows the existing precedent of
``jaccard_pairs``'s eager localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class BaselineScaleError(ValueError):
    """An all-pairs ground-truth baseline was given scale-sized input."""


def assert_baseline_scale(
    df: DataFrame, cap: int, what: str, twin: str
) -> int:
    """Raise :class:`BaselineScaleError` when ``df`` exceeds ``cap`` rows.

    ``what`` names the guarded baseline, ``twin`` the scale-safe
    operator the error points the caller to. Returns the observed
    row count (exact when ≤ cap) so callers can derive dependent caps
    without a second job.
    """
    n = df.limit(cap + 1).count()
    if n > cap:
        raise BaselineScaleError(
            f"{what} is an all-pairs ground-truth baseline capped at"
            f" {cap:,} input rows; this input exceeds the cap. Use"
            f" {twin} at scale (same semantics, bucketed/blocked plan)."
        )
    return n
