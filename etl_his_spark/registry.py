"""Central query registry — the driver-contract surface.

Every operator from SURVEY.md §2 (plus the training-data extensions) is
registered here as a named (spark, sf_dir) -> DataFrame callable with,
where SQL-expressible, a DuckDB oracle twin. ``__spark_entry__.py``
exposes these as ``queries()`` / ``oracle_sql()``.

Registration happens at import time via the ``@register`` decorator in
the ``plans.queries_*`` modules, imported at the bottom of this file.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name``; ``oracle`` is DuckDB SQL or None
    for non-SQL-expressible operators (rows-only driver check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Import for side effect: each module registers its queries.
from .plans import queries_core  # noqa: E402,F401
from .plans import queries_his_analog  # noqa: E402,F401
from .plans import queries_text  # noqa: E402,F401
from .plans import queries_dedup  # noqa: E402,F401
from .plans import queries_events  # noqa: E402,F401
from .plans import queries_analytics  # noqa: E402,F401
from .plans import queries_multimodal  # noqa: E402,F401
from .plans import queries_sql  # noqa: E402,F401
from .plans import queries_events2  # noqa: E402,F401
from .plans import queries_json  # noqa: E402,F401
from .plans import queries_tpch  # noqa: E402,F401
from .plans import queries_tpch2  # noqa: E402,F401
from .plans import queries_quality  # noqa: E402,F401
from .plans import queries_misc  # noqa: E402,F401
from .plans import corpus_pipeline  # noqa: E402,F401
from .plans import queries_incremental  # noqa: E402,F401
from .plans import queries_bench  # noqa: E402,F401
from .plans import queries_text2  # noqa: E402,F401
from .plans import queries_lakehouse  # noqa: E402,F401
