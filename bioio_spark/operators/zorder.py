"""Z-order (Morton) spatial clustering key — the DATA-LAYOUT lever
for windowed reads over relational pixel tables at 100 TB: writing
the pixel table sorted by (plane, morton_key(y, x)) makes any YX
window land in O(window) contiguous key ranges, so parquet min/max
row-group statistics prune the scan to the touched blocks (the same
reason Delta/Iceberg Z-ORDER their cluster columns). The key is pure
integer bit-interleaving — identical magic-number expressions in
Spark and DuckDB, so the layout math itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 16-bit -> 32-bit bit-spreading magic numbers (the standard
# interleave-by-shift-and-mask sequence)
_SPREAD = ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
           (2, 0x33333333), (1, 0x55555555))


def _spread_bits(col: Column) -> Column:
    v = col.cast("bigint")
    for shift, mask in _SPREAD:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(
            F.lit(mask).cast("bigint"))
    return v


def morton_key(y: Column, x: Column) -> Column:
    """32-bit Morton code of two 16-bit coordinates: bit i of x lands
    at key bit 2i, bit i of y at 2i+1. Coordinates outside 0..65535
    FAIL THE JOB (assert_true) rather than silently aliasing — a
    wider image needs a wider spread, not wrong clustering."""
    ok = F.assert_true(
        (y >= 0) & (y < 65536) & (x >= 0) & (x < 65536),
        F.lit("morton_key: coordinates must be in 0..65535"))
    key = (_spread_bits(x)
           .bitwiseOR(F.shiftleft(_spread_bits(y), 1))
           .cast("bigint"))
    return F.when(ok.isNull(), key)


def morton_sql(y: str, x: str) -> str:
    """The identical key in DuckDB SQL (same shifts, same masks)."""

    def spread(expr: str) -> str:
        v = f"CAST({expr} AS BIGINT)"
        for shift, mask in _SPREAD:
            v = f"(({v} | ({v} << {shift})) & {mask})"
        return v

    return f"({spread(x)} | ({spread(y)} << 1))"
