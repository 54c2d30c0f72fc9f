"""Count-min sketch as plain DataFrame aggregation.

A CMS answers "how often does key k appear?" in fixed memory with a
one-sided (over-)estimate: DEPTH independent hash rows × WIDTH
counters; estimate(k) = min over rows of counter[h_s(k) % WIDTH].

The build is ONE aggregation with at most DEPTH×WIDTH output cells —
map-side partial aggregation collapses every partition to ≤ 32 K cells
before the (tiny, fixed-size) shuffle, no matter how many trillions of
stream rows went in, and sketches from different days/sources merge by
cell-wise addition (``merge_cms``). The probe side broadcasts the
counter table. Hashing is the repo-wide cross-engine md5 convention
(``seeded_hash60``), so a SQL oracle reproduces the sketch cell for
cell — estimates are deterministic, collisions and all, on both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup_approx import seeded_hash60

CMS_DEPTH = 4
CMS_WIDTH = 8192


def _seed_buckets(key: Column, depth: int, width: int) -> Column:
    """array<struct<seed, bucket>> — the key's cell per hash row."""
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"),
                (seeded_hash60(key, F.lit(s)) % width).alias("bucket"),
            )
            for s in range(depth)
        ]
    )


def count_min_build(
    stream: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(*group_cols, seed, bucket, cnt) counter cells over the stream
    of keys — one sketch per group when ``group_cols`` is given (the
    per-partition partial a rollup persists; ``merge_cms`` sums them
    back into any coarser range)."""
    gcols = list(group_cols or [])
    return (
        stream.select(
            *gcols,
            F.explode(_seed_buckets(F.col(key_col), depth, width)).alias("sb"),
        )
        .groupBy(
            *gcols,
            F.col("sb.seed").alias("seed"),
            F.col("sb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_build_weighted(
    keyed: DataFrame,
    key_col: str,
    weight_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Cell-identical to ``count_min_build`` over the expanded stream,
    built from a pre-aggregated (key, weight) table: ``sum(weight)``
    per cell instead of ``count(*)`` — ``depth`` md5s per DISTINCT
    key rather than per occurrence. When a frequency table already
    exists (or arrives as a mergeable partial), this is the build to
    use: hashing work scales with vocabulary, not corpus."""
    return (
        keyed.select(
            F.col(weight_col).alias("__w"),
            F.explode(_seed_buckets(F.col(key_col), depth, width)).alias("sb"),
        )
        .groupBy(
            F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket")
        )
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — CMS is a monoid, so per-partition/per-day
    sketches combine losslessly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_probe(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Input keys + ``est_n`` (≥ true count, deterministic). The
    counter table is ≤ depth×width rows — broadcast, so probing any
    number of keys is one map-side join plus a key-local min.

    LEFT join + coalesce(0): a CMS answers for ANY key — a key whose
    cells were never touched estimates 0, it does not vanish from the
    output (an inner join would silently drop it)."""
    probe = keys.select(
        "*", F.explode(_seed_buckets(F.col(key_col), depth, width)).alias("sb")
    ).select("*", F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
    return (
        probe.join(F.broadcast(counters), ["seed", "bucket"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_n"))
    )


BLOOM_BITS = 1 << 17
BLOOM_HASHES = 5


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Bloom filter as a DataFrame of SET BIT indices (≤ m rows,
    usually far fewer) — the broadcastable membership summary of a key
    set, built with one aggregation (distinct bit) and the repo-wide
    md5 hashing. Like the CMS it is a monoid: union + distinct merges
    filters losslessly.
    """
    probes = F.array(
        *[(seeded_hash60(F.col(key_col), F.lit(s)) % m) for s in range(k)]
    )
    return (
        keys.select(F.explode(probes).alias("bit")).distinct()
    )


def bloom_prefilter(
    big: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Rows of ``big`` that MIGHT be in the bloom'd key set — no false
    negatives, tunable false positives (classic (1-e^{-kn/m})^k).

    The scale pattern: before a big⋈small join, collapse the small
    side's bloom to m/64 PACKED BIT WORDS (16 KiB at the default m —
    bounded by m regardless of key-set size), ride them into the scan
    as a LITERAL array, and drop non-matching big-side rows map-side —
    a pure column filter, zero joins, zero shuffles, no row-identity
    hazards (duplicate big rows pass or fail independently). The real
    join afterwards removes the false positives, so the final answer
    is EXACTLY the plain join's at a fraction of the shuffle. The one
    driver action collects ≤ m bit rows (the packing-offsets
    precedent: bounded at any input size).
    """
    words = [0] * ((m + 63) // 64)
    for row in bits.collect():
        b = row["bit"]
        words[b >> 6] |= 1 << (b & 63)
    # Python ints are unbounded; Spark longs are signed 64-bit
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    lit_words = F.lit(words)
    cond = None
    for s in range(k):
        h = seeded_hash60(F.col(key_col), F.lit(s)) % m
        # getbit takes COLUMN positions (shiftleft's count must be a
        # Python literal, which the probe position is not)
        probe = (
            F.getbit(
                F.element_at(lit_words, (h / 64).cast("int") + 1),
                (h % 64).cast("int"),
            )
            == 1
        )
        cond = probe if cond is None else cond & probe
    return big.filter(cond)


# ---------------------------------------------------------------------------
# HyperLogLog (from scratch, cross-engine-exact registers)
#
# approx_count_distinct exposes Spark's built-in HLL++ but its register
# state is engine-private; this implementation keeps the SKETCH itself
# in the repo's cross-engine integer algebra (60-bit md5: top p bits =
# bucket, the remaining 51 bits' leading-zero rank = rho via
# length(bin(w)) — both functions exist verbatim in DuckDB), so
# register tables hash-match an oracle exactly and sketches built by
# different engines merge losslessly. Flajolet et al. 2007; the
# HLL++ bias table (Heule et al. 2013) is deliberately omitted — the
# small-range regime uses classic linear counting instead, keeping
# every constant a literal.

HLL_P = 9                      # 2^9 = 512 registers
HLL_W = 2_251_799_813_685_248  # 2^51: weight-suffix modulus for p=9


def hll_registers(
    keyed: DataFrame,
    key_col: str,
    p: int = HLL_P,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(*group_cols, bucket, register) rows — the HLL sketch of
    ``key_col``, optionally one sketch per group.

    bucket = h div 2^(60-p); rho = leading-zero rank of the remaining
    (60-p)-bit suffix (52 - bit_length for p=9, the all-zero suffix
    mapping to the max rank); register = max rho per bucket. One
    map-side-combined groupBy on ≤ groups × 2^p rows — corpus-linear
    hashing, sketch-sized output, absent buckets implicitly 0.

    The aggregate is a pure MAX, so the same expression runs as a
    Structured Streaming aggregation with BOUNDED state and no
    watermark: registers are monotone, late or reordered data can
    only fold in idempotently — the property that makes HLL the
    streaming distinct-count shape.
    """
    wmod = 1 << (60 - p)
    maxrho = 60 - p + 1
    h = seeded_hash60(F.col(key_col))
    w = h % F.lit(wmod)
    rho = (
        F.when(w == 0, F.lit(maxrho))
        .otherwise(F.lit(maxrho) - F.length(F.bin(w)))
        .cast("int")
    )
    gcols = list(group_cols or [])
    return (
        keyed.select(
            *gcols,
            F.expr(
                f"CAST(conv(substring(md5({key_col}),1,15),16,10)"
                f" AS BIGINT) div {wmod}"
            ).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Register-wise max — HLL is a monoid under max, so per-shard
    sketches combine losslessly (the property that makes the sketch
    the 100 TB distinct-count shape: 512 ints per shard, merged at
    read time).

    Pass ``group_cols`` to merge grouped sketches built with
    ``hll_registers(group_cols=[...])`` — grouping happens on
    (*group_cols, bucket). Without it, inputs must be exactly
    (bucket, register): silently max-ing away a forgotten grouping
    column would collapse per-group sketches into one global sketch,
    so any extra column is a hard error instead."""
    gcols = list(group_cols or [])
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    expected = set(gcols) | {"bucket", "register"}
    extra = set(out.columns) - expected
    if extra:
        raise ValueError(
            f"hll_merge: unexpected columns {sorted(extra)} — pass them "
            "as group_cols=[...] or project them away first (merging "
            "across a dropped grouping column silently collapses "
            "per-group sketches)"
        )
    return out.groupBy(*gcols, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> float:
    """Cardinality estimate from a register table.

    Driver-side on ≤ 2^p collected rows (bounded regardless of input
    size — the sketch IS the bounded summary). Classic HLL with the
    two standard regime corrections: linear counting below 2.5m when
    empty buckets exist, and the 2^60-range correction above (never
    reached at 60 hash bits in practice).
    """
    import math

    m = 1 << p
    regs = dict.fromkeys(range(m), 0)
    for row in registers.collect():
        regs[row["bucket"]] = row["register"]
    s = sum(2.0 ** -r for r in regs.values())
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / s
    zeros = sum(1 for r in regs.values() if r == 0)
    if est <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return est
