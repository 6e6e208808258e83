"""Z-order (Morton) interleaving for multi-dimensional data layout.

The clustering key behind Delta/Iceberg `ZORDER BY`: interleaving the
bits of two (or more) columns gives a 1-D sort order in which rows
close in EVERY dimension land close on disk, so min/max file stats
prune scans filtered on either column — the layout lever for a
10^12-row table queried by both user and time. This module computes
the key as a pure JVM column expression (shifts/masks, whole-stage
codegen, no UDF); writing `df.repartitionByRange(n, zorder2(...))`
then sorting within partitions is the full layout recipe.

Exactness: bit arithmetic has no rounding at all — the DuckDB twin is
the same shift/mask expression, so the contract query hash-matches
with zero tolerance machinery. Inputs must already be non-negative
integers in [0, 2^bits); bucketize/clamp upstream (the contract query
does `x % 2^16`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def spread_bits(col: Column, bits: int = 16) -> Column:
    """x -> x with a zero bit inserted after every bit (the even-lane
    half of a 2-D Morton code): sum over i of ((x >> i) & 1) << 2i."""
    terms = [
        F.shiftleft(F.shiftright(col.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder2(x: Column, y: Column, bits: int = 16) -> Column:
    """2-D Morton key: x in the even bit lanes, y in the odd ones.
    bits <= 31 per dimension (the key must fit a signed 64-bit)."""
    if not (1 <= bits <= 31):
        raise ValueError("bits must be in [1, 31]")
    return spread_bits(x, bits) + spread_bits(y, bits) * F.lit(2)
