"""Pipeline observability — the S7 analog (SURVEY.md §2.1).

The reference drives a console progress bar and per-entity row
counters through its ETL loop (``Command.php:93,118,203,209-218`` —
start/advance/finish plus "N pacientes / N turnos" success blocks).
A distributed engine can't tick a per-row bar from executors; the
Spark-idiomatic equivalent is the ``Observation`` API: named aggregate
metrics attached to a DataFrame that are collected DURING the next
action on it — zero extra jobs, zero extra scans, unlike a separate
``df.count()`` which would recompute the plan.

``ObservedPipeline`` instruments each pipeline output with row/null
counters, runs the action (publish or count), and renders the
reference-style success block from the observed values.

Scale note: observation metrics are accumulator-style partial
aggregates merged on the driver — O(#metrics) driver memory, safe at
any row count.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class StageMetrics:
    """Observed metrics for one pipeline stage/output."""

    name: str
    rows: int
    wall_s: float
    extras: dict[str, float | int] = field(default_factory=dict)


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach an Observation computing ``count(1)`` plus ``metrics``
    (aggregate expressions) to ``df``. The metrics materialize when the
    returned frame's next action runs; read them via ``obs.get``."""
    obs = Observation(name)
    out = df.observe(obs, F.count(F.lit(1)).alias("rows"), *(
        m.alias(k) for k, m in metrics.items()
    ))
    return out, obs


class ObservedPipeline:
    """Collects per-stage observations and renders the run report.

    Usage::

        op = ObservedPipeline()
        df, done = op.stage(df, "paciente",
                            null_names=F.sum(F.col("nombre").isNull()
                                             .cast("long")))
        df.write...   # or any action
        done()        # records wall time + metrics
        print(op.report())
    """

    def __init__(self) -> None:
        self.stages: list[StageMetrics] = []

    def stage(self, df: DataFrame, name: str, **metrics: Column):
        out, obs = observed(df, name, **metrics)
        t0 = time.time()

        def done() -> StageMetrics:
            got = dict(obs.get)  # blocks until the action has run
            sm = StageMetrics(
                name=name,
                rows=int(got.pop("rows")),
                wall_s=time.time() - t0,
                extras=got,
            )
            self.stages.append(sm)
            return sm

        return out, done

    def report(self) -> str:
        """Reference-style success block: one counter line per entity
        (Command.php:209-218 prints 'N pacientes', 'N turnos', ...)."""
        lines = ["-- pipeline run --"]
        for s in self.stages:
            extras = "".join(
                f" {k}={v}" for k, v in sorted(s.extras.items())
            )
            lines.append(f"{s.rows:>10d} {s.name} [{s.wall_s:.1f}s]{extras}")
        lines.append(f"total {sum(s.rows for s in self.stages)} rows "
                     f"across {len(self.stages)} outputs")
        return "\n".join(lines)
