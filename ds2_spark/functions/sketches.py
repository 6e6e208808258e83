"""Deterministic cardinality sketches (HyperLogLog, Flajolet et al.,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm", AofA 2007).

Why not `approx_count_distinct`: Spark's built-in HLL++ is a black-box
sketch — no cross-engine oracle can replay it, and its registers are
not portable between systems. This implementation derives every
register from md5 STRING arithmetic (hex-prefix bucket, leading-zero
rank from the hex representation — no 64-bit numeric conversions, so
no signed-overflow traps), which means:

  - a DuckDB/any-SQL oracle recomputes the IDENTICAL sketch
    (contract query q_hll_distinct);
  - sketches computed by different engines over shards of one corpus
    can be MERGED (max per register) — the property that makes HLL the
    right cardinality planner for dedup at 10^12 rows, where exact
    countDistinct shuffles every key and this shuffles 256 integers
    per partition (partial max-aggregation does the rest map-side).

The estimate column is the RAW HLL harmonic estimator, computed via an
integer harmonic numerator Z_int = sum(2^(40 - min(register, 40))) so
the cross-engine value is bit-identical (each term is an exact power
of two in int64; the final alpha*m^2*2^40/Z_int is one IEEE division
of identical operands). Registers are clamped at 40 for Z_int only —
a register above 40 needs ~2^40 distinct values in ONE bucket; the
clamp's effect is beyond any float64 ulp long before that. The
small-range linear-counting correction (E <= 2.5m and V > 0:
m*ln(m/V)) deliberately stays OUT of the oracle-checked column — ln()
is not bit-portable across engines; apply it driver-side from the
emitted V (`hll_corrected`, pytest-verified for accuracy).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 256  # 2-hex-digit buckets; relative error ~1.04/sqrt(m) = 6.5%
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # standard alpha_m for m >= 128
# single double literal alpha*m^2*2^40 — injected verbatim into both
# engines (one shared constant + one division = bit-identical est_raw;
# multiply-order differences could otherwise flip the last ulp)
EST_NUMERATOR = _ALPHA * HLL_M * HLL_M * float(2**40)


def _rho_from_hex(rest: Column) -> Column:
    """Leading-zero rank of a 15-hex-digit (60-bit) field, from string
    arithmetic only: 4 bits per stripped leading '0' digit, plus the
    intra-digit zeros of the first nonzero digit, plus 1. All-zero
    fields (p = 2^-60) cap at 61."""
    s = F.regexp_replace(rest, "^0*", "")
    nz = F.lit(15) - F.length(s)
    d = F.upper(F.substring(s, 1, 1))
    extra = (
        F.when(d == "1", 3)
        .when(d.isin("2", "3"), 2)
        .when(d.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(F.length(s) == 0, F.lit(61)).otherwise(
        (F.lit(4) * nz + extra + 1).cast("int")
    )


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """One row per NON-EMPTY register: (bucket 0..255, register =
    max leading-zero rank). Shuffle profile: partial max per partition
    (map-side combine), then 256 rows move. NULL values are skipped
    (SQL COUNT DISTINCT semantics)."""
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rho = _rho_from_hex(F.substring(h, 3, 15))
    return (
        df.filter(F.col(col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(m_zero_registers, z_int, est_raw) from a registers frame —
    empty buckets contribute register 0 (term 2^40). est_raw is the
    raw HLL harmonic estimate, bit-identical across engines (see
    module docstring); apply `hll_corrected` driver-side for the
    small-range regime."""
    spark = registers.sparkSession
    spine = spark.range(HLL_M).select(F.col("id").cast("int").alias("bucket"))
    full = spine.join(registers, "bucket", "left").select(
        F.coalesce(F.col("register"), F.lit(0)).alias("register")
    )
    # F.shiftleft's numBits parameter is typed int-only in PySpark;
    # the SQL form accepts a column expression
    term = F.expr("shiftleft(CAST(1 AS BIGINT), 40 - least(register, 40))")
    agg = full.agg(
        F.sum((F.col("register") == 0).cast("int")).alias("m_zero_registers"),
        F.sum(term).alias("z_int"),
    )
    est = F.lit(EST_NUMERATOR) / F.col("z_int")
    return agg.select(
        "m_zero_registers", "z_int", F.round(est, 2).alias("est_raw")
    )


def hll_corrected(est_raw: float, m_zero_registers: int) -> float:
    """Driver-side small-range correction (linear counting): the one
    float step whose ln() is not bit-portable, so it stays out of the
    oracle-checked columns."""
    if m_zero_registers > 0 and est_raw <= 2.5 * HLL_M:
        return HLL_M * math.log(HLL_M / m_zero_registers)
    return est_raw


# --------------------------------------------------------- count-min

def _cms_pos(key: Column, row: int, w: int) -> Column:
    """Row `row`'s bucket for a key: the same md5-hex-slice derivation
    as the HLL/Bloom sketches (one md5, 5-hex slices per row) — string
    arithmetic only, replayable in any SQL engine."""
    h = F.md5(key.cast("string"))
    return (
        F.conv(F.substring(h, 1 + 5 * row, 5), 16, 10).cast("long") % w
    ).cast("int")


def cms_build(df: DataFrame, col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005): (row, pos,
    cnt) counters. Aggregation state is depth*width regardless of key
    cardinality — the memory-bounded frequency summary for unbounded
    key spaces (heavy-hitter detection over 10^12 rows where an exact
    groupBy's state is the distinct-key count). Partial aggregation
    combines map-side; the shuffle moves at most depth*width rows per
    partition. NULL keys are skipped."""
    if not 1 <= depth <= 6:
        raise ValueError("depth must be in 1..6 (32 md5 hex chars / 5)")
    # ONE scan: posexplode the per-row position array (a depth-way
    # union would re-scan the input depth times — 4x the IO at scale)
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.posexplode(
                F.array(
                    *[_cms_pos(F.col(col), i, width) for i in range(depth)]
                )
            ).alias("row", "pos")
        )
        .groupBy("row", "pos")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str,
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for probe keys: min over rows of the
    key's counter. NEVER underestimates (every counter the key maps to
    contains its full count plus collisions); overestimate bounded by
    eps*N with prob 1-delta for eps=e/width, delta=exp(-depth). The
    sketch side is depth*width rows at most — broadcast it."""
    probe_pos = probes.select(
        F.col(col),
        *[
            _cms_pos(F.col(col), i, width).alias(f"_p{i}")
            for i in range(depth)
        ],
    )
    out = probe_pos
    for i in range(depth):
        s = sketch.filter(F.col("row") == i).select(
            F.col("pos").alias(f"_p{i}"), F.col("cnt").alias(f"_c{i}")
        )
        out = out.join(F.broadcast(s), f"_p{i}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(depth)]
    )
    return out.select(F.col(col), est.alias("est_count"))
