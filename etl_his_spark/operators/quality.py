"""Data-quality operators: rule validation with quarantine split.

A 100 TB ingest needs malformed/suspect rows diverted, not dropped:
``validate_split`` evaluates named boolean rules once (single pass,
no Python) and returns (valid, quarantine) DataFrames; quarantine rows
carry the list of failed rule names for triage. Both outputs derive
from one cached scan — the split is two filters over the same
evaluated rule column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Attach ``violations: array<string>`` — names of failed rules.

    A rule PASSES when its expression is true; NULL results count as
    failures (unknown = suspect), matching the quarantine posture.
    """
    checks = [
        F.when(expr.isNull() | ~expr, F.lit(name))
        for name, expr in rules.items()
    ]
    return df.withColumn(
        "violations", F.filter(F.array(*checks), lambda x: x.isNotNull())
    )


def validate_split(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantine) by the rule set."""
    checked = with_violations(df, rules)
    valid = checked.filter(F.size("violations") == 0).drop("violations")
    quarantine = checked.filter(F.size("violations") > 0)
    return valid, quarantine
