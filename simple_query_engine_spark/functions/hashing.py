"""Engine-portable hashing: the md5-hex-prefix → integer construction.

md5 is the one hash both Spark and DuckDB compute identically (xxhash64
etc. are engine-specific), so every oracle-checked operator that needs a
deterministic numeric hash — MinHash/SimHash bases, hash sampling,
stratified ordering — derives it as ``int(md5(x)[:width], 16)``.  This
module is the single definition of that construction for BOTH engines;
always take the Spark column and the SQL fragment from here so the pair
cannot drift (a width or cast changed on one side only would silently
break hash-match).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_long(col: Column | str, hex_width: int) -> Column:
    """Spark column: first ``hex_width`` md5 hex digits as a long.

    ``hex_width`` ≤ 15 keeps the value < 2⁶⁰, safely inside both engines'
    signed-64 range.
    """
    assert 1 <= hex_width <= 15, hex_width
    return F.conv(F.substring(F.md5(col), 1, hex_width), 16, 10).cast("long")


def md5_prefix_long_sql(expr: str, hex_width: int) -> str:
    """DuckDB fragment computing exactly :func:`md5_prefix_long`."""
    assert 1 <= hex_width <= 15, hex_width
    return f"CAST('0x' || substr(md5({expr}), 1, {hex_width}) AS BIGINT)"
