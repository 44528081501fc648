"""JVM-side (Catalyst) cell-id expressions — bit-identical to the numpy
encoder in `cells.py`, but built from Spark column bit ops so cell
assignment in scan/write paths stays inside whole-stage codegen (no
Python round-trip just to compute a partition key).

Two's-complement shifts/masks behave identically in numpy uint64 land
and Spark's signed BIGINT, so `cell_id_expr` == `cells.xy_to_cell` for
every in-frame coordinate (tested in tests/test_sources.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import cells

_SPREAD = [
    (32, 0x00000000FFFFFFFF),
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _interleave_expr(c: Column) -> Column:
    """Spread the low 29 bits to even positions (Morton), JVM-side."""
    out = c.cast("long")
    for shift, mask in _SPREAD:
        out = out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(F.lit(mask))
    return out


def cell_id_expr(x: Column, y: Column, res: int) -> Column:
    """(x, y) metre columns -> cell_id column at `res`; equals
    cells.xy_to_cell for in-frame coordinates."""
    n = 1 << res
    size = cells.WORLD_SPAN / n
    ix = F.greatest(
        F.lit(0),
        F.least(F.lit(n - 1), F.floor((x - F.lit(cells.WORLD_X0)) / F.lit(size))),
    ).cast("long")
    iy = F.greatest(
        F.lit(0),
        F.least(F.lit(n - 1), F.floor((y - F.lit(cells.WORLD_Y0)) / F.lit(size))),
    ).cast("long")
    morton = _interleave_expr(ix).bitwiseOR(F.shiftleft(_interleave_expr(iy), 1))
    # res >= 16 puts the header past 2^63: reinterpret as SIGNED int64
    # (two's complement) before F.lit, matching the numpy encoder's
    # uint64 wraparound — a raw python int of 2^63+ would overflow the
    # long literal and break the bit-identical contract
    header = res << 59
    if header >= 1 << 63:
        header -= 1 << 64
    return morton.bitwiseOR(F.lit(header)).cast("long").alias("cell_id")
