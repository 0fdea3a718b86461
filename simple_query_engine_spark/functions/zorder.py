"""Morton (Z-order) curve helpers, shared by the layout exhibit
(``operators/storage.py``) and the managed-table OPTIMIZE path
(``sources/managed.py``).

Bit layout (round-robin interleave): bit ``i`` of dimension ``j`` lands at
output position ``i * D + j`` for ``D`` dimensions — for D=2 this is the
classic even/odd interleave the storage exhibit's DuckDB oracle mirrors
textually, so one definition drives every consumer and the layout can
never drift.

All arithmetic is exact-integer: dimensions are first scaled onto the
``2**bits`` grid with ``((v - lo) * 2**bits) div (hi - lo + 1)`` (the same
normalization OPTIMIZE ZORDER applies from table stats), clamped so
out-of-range values land on edge cells rather than corrupting the
interleave.  The scaled numerator must stay below 2**53 (it is computed
losslessly through a double division); at 8 bits that admits dimension
ranges up to ~2**45 — far past any key or day-number range.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_bucket(col: Column, lo, hi, bits: int) -> Column:
    """``col`` scaled onto the ``2**bits`` integer grid for the value
    range [``lo``, ``hi``], clamped to the grid edges."""
    grid = 1 << bits
    clamped = F.greatest(F.least(col, F.lit(hi)), F.lit(lo))
    span = int(hi) - int(lo) + 1
    # Truncating division of a non-negative numerator == integer div; the
    # numerator is exact in a double below 2**53 (documented above).
    return ((clamped - F.lit(lo)).cast("long") * grid / F.lit(span)).cast("long")


def z_interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits``-wide integer bucket columns into one z-value."""
    d = len(bucket_cols)
    z = F.lit(0)
    for i in range(bits):
        for j, col in enumerate(bucket_cols):
            z = z + F.shiftleft(
                F.shiftright(col, i).bitwiseAND(F.lit(1)), i * d + j
            )
    return z
