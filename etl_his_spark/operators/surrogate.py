"""Surrogate key minting + FK resolution (K1/K2).

The reference relies on PostgreSQL SERIAL + ``INSERT ... RETURNING id``
per row (PostgresSchemaBuilder.php:62,75,96,105; Command.php:139,154,
188). Ids only need to be consistent within one run — the whole schema
is dropped and rebuilt every time (Builder.php:51) — so they are FK
glue, not stable identifiers.

Spark-first forms:

- ``dense_ids`` — gap-free 1..N ids via a two-phase scheme: count rows
  per partition, broadcast the per-partition offsets, add
  partition-local row_number. This avoids the classic single-partition
  global window: the only single-point work is summing a few hundred
  partition counts on the driver. Requires a deterministic order column
  when reproducibility matters (dims); implemented with a window
  partitioned by a salt bucket of the order key.
- ``unique_ids`` — non-dense but collision-free and fully parallel
  (``monotonically_increasing_id``), the right choice for 100 TB facts
  where density is not semantically required.
- ``resolve_fk`` — join child rows to the minted dim on the natural key
  (Command.php:156,196-199's cache lookups, set-oriented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame,
    order_cols: list[Column],
    id_col: str = "id",
    buckets: int = 64,
) -> DataFrame:
    """Gap-free sequential ids 1..N ordered by ``order_cols``.

    Two-phase: bucket rows by range of the order key is not available
    without sampling, so we use ntile-free scheme: a row_number within
    each of ``buckets`` hash buckets plus broadcast bucket offsets.
    Deterministic given a total order; the per-bucket window shuffles
    once on the bucket id, and offsets are computed from bucket counts
    (tiny driver-side aggregation).

    For dimension-sized inputs this is overkill but free; for large
    inputs it is the difference between a single-threaded global window
    and a parallel one.
    """
    # Global rank must follow order_cols across buckets, so bucket by the
    # leading order expression's range via ntile is unsafe without a sort.
    # Strategy: compute row_number within hash buckets of the FULL order
    # tuple is wrong for global ordering; instead sort-partition by range:
    # use repartitionByRange on the order columns, then per-partition
    # row_number + offsets via spark_partition_id counts.
    # LAZY localCheckpoint, not persist() and not eager: the counts
    # collect below is already an action, so it materializes the
    # checkpoint blocks as a side effect — pinning spark_partition_id
    # for the final join without eager's dedicated extra pass over the
    # input. Blocks are GC-reclaimed with the frame — a persist() here
    # would leak a cached copy of the input per call in long-lived
    # sessions (see packing.running_total for the full rationale,
    # including the stated non-replicated-blocks fault tradeoff).
    # Pin the INPUT too: repartitionByRange computes its range bounds
    # with a sampling job over the child at first-RDD-access time, so
    # an un-pinned input is TRAVERSED twice before the counts collect
    # — once for the sampler, once for the shuffle map. With the lazy
    # checkpoint the sampling job is the pass that materializes the
    # input blocks and the shuffle reads them. HOWEVER (r10
    # reconciliation, SCALE.md "his_pipeline_publish, reconciled"):
    # an interleaved pin/no-pin A/B on the flagship publish measured
    # NO wall-clock difference — when the input subtree contains
    # shuffles (the 22-table extraction does), the second traversal
    # reuses the first's shuffle files and only recomputes the cheap
    # post-shuffle stages, so Spark's own shuffle-stage reuse already
    # dedupes the heavy work. The pin is kept as a zero-cost guard
    # for shuffle-FREE inputs (pure scan+project subtrees genuinely
    # recompute), not as a measured win; the r9 "+~5s" claim is
    # retracted as ambient.
    df = df.localCheckpoint(eager=False)
    ranged = (
        df.repartitionByRange(buckets, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = (
        ranged.groupBy("__pid").count().orderBy("__pid").collect()
    )  # ≤ buckets rows — driver-safe at any data scale
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["__pid"]] = acc
        acc += row["count"]
    offset_df = ranged.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        ranged.join(F.broadcast(offset_df), "__pid")
        .withColumn(id_col, F.row_number().over(w).cast("long") + F.col("__offset"))
        .drop("__pid", "__offset")
    )
    return out


# dense_ids_small is a single-partition window: correct ONLY for
# deduped dimensions. The cap makes "never for the fact table" a
# runtime property instead of a docstring promise (r10 verdict item
# 6): row_number is already the running count, so the check is a free
# per-row expression — no extra job, no extra scan. PRECISION of that
# promise (ADVICE r11): the expression evaluates while row_number
# runs, i.e. AFTER the full input has already been shuffled and
# sorted onto the single window partition — it stops silent wrong-ids
# and unbounded runaway, but a fact-scale input can still OOM that
# one task before row DENSE_IDS_SMALL_MAX+1 raises. Callers with
# UNKNOWN input size should pass precheck=True for a pre-shuffle
# bounded scan.
DENSE_IDS_SMALL_MAX = 10_000_000


def dense_ids_small(
    df: DataFrame,
    order_cols: list[Column],
    id_col: str = "id",
    precheck: bool = False,
) -> DataFrame:
    """Gap-free ids via one global window — fine for dimension tables.

    Single-partition window: acceptable when the input is a deduped
    dimension (thousands-to-millions of rows), never for the fact
    table — enforced at ``DENSE_IDS_SMALL_MAX`` rows. The inline
    guard raises MID-SORT (after the shuffle onto the window's single
    partition — see the module comment), so for inputs of unknown
    size pass ``precheck=True``: a ``limit(MAX+1).count()`` bounded
    scan (the ``assert_baseline_scale`` pattern) that raises BEFORE
    any shuffle, at the cost of one small eager job at plan-build
    time. Use ``dense_ids`` for larger dims, ``unique_ids`` for
    facts.
    """
    if precheck:
        from .guards import assert_baseline_scale

        assert_baseline_scale(
            df,
            DENSE_IDS_SMALL_MAX,
            "dense_ids_small (single-partition dimension id mint)",
            "dense_ids (parallel two-phase) or unique_ids (fact-scale)",
        )
    w = Window.orderBy(*order_cols)
    rn = F.row_number().over(w)
    guarded = F.when(
        rn > DENSE_IDS_SMALL_MAX,
        F.raise_error(
            F.lit(
                "dense_ids_small input exceeds"
                f" {DENSE_IDS_SMALL_MAX} rows — this is a"
                " single-partition window for DIMENSIONS; use"
                " dense_ids (parallel two-phase) or unique_ids"
                " (fact-scale) instead"
            )
        ).cast("int"),
    ).otherwise(rn)
    return df.withColumn(id_col, guarded.cast("long"))


def unique_ids(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Collision-free, non-dense 64-bit ids; fully parallel, no shuffle."""
    return df.withColumn(id_col, F.monotonically_increasing_id())


def resolve_fk(
    child: DataFrame,
    dim: DataFrame,
    natural_key: list[str] | list[tuple[str, str]],
    fk_col: str,
    dim_id_col: str = "id",
    broadcast_dim: bool = False,
) -> DataFrame:
    """Attach ``fk_col`` = dim's surrogate id by natural-key equi-join.

    ``natural_key``: list of column names shared by both sides, or
    (child_col, dim_col) pairs. Referential integrity holds by
    construction — the dim was derived from the same rows
    (SURVEY.md §1.3).

    ``broadcast_dim`` defaults to False: Catalyst auto-broadcasts any
    dim under the threshold, and FORCING a broadcast on a dim that
    turns out huge (a 100 TB run's patient dim) OOMs every executor.
    Set True only for dims that are small by construction.
    """
    pairs = [
        (k, k) if isinstance(k, str) else k for k in natural_key
    ]
    dim_sel = dim.select(
        *[F.col(d).alias(f"__nk_{i}") for i, (_, d) in enumerate(pairs)],
        F.col(dim_id_col).alias(fk_col),
    )
    if broadcast_dim:
        dim_sel = F.broadcast(dim_sel)
    cond = None
    for i, (c, _) in enumerate(pairs):
        clause = child[c].eqNullSafe(dim_sel[f"__nk_{i}"])
        cond = clause if cond is None else (cond & clause)
    out = child.join(dim_sel, cond, "left")
    return out.drop(*[f"__nk_{i}" for i in range(len(pairs))])
