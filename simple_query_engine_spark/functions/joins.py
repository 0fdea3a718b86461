"""Join strategies for hostile key distributions.

AQE's skew-join splitting (on by default, session.py) handles most skew at
runtime by splitting oversized partitions.  ``salted_join`` is the explicit
fallback for the pathological case AQE can't fix: a *single* join key so hot
that one hash partition exceeds executor memory no matter how it's split —
the classic null-key / celebrity-entity / default-value skew at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side,
    replicate the other side once per salt bucket.

    The skewed side gets a deterministic salt derived from a row hash
    (``xxhash64`` mod buckets — deterministic for retries, unlike
    rand()); the small side is exploded ×``salt_buckets``.  The shuffle key
    becomes (key, salt), spreading each hot key over ``salt_buckets``
    reducers.  Replication cost is |small| × buckets, so the replicated
    side must be the moderate one — for a truly tiny side you'd broadcast
    instead and need no salt at all.

    ``salt_cols`` picks the columns hashed for the salt.  Default is every
    column (always valid), but that forces the scan to read the whole row
    just to salt it — pass a small set of per-row-varying columns (e.g.
    the key plus a line number) to keep column pruning effective.  Any
    choice is *correct* — the join result is salt-invariant because the
    replicated side matches every bucket — salt quality only affects how
    evenly a hot key spreads.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        # Replicating the right side breaks right/full-outer semantics: an
        # unmatched right key would surface once per salt bucket.
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    salted_left = skewed.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*(salt_cols or skewed.columns)), F.lit(salt_buckets)
        ).cast("int"),
    )
    replicated_right = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    # Force a sort-merge join.  Catalyst's size estimate for the right side
    # predates the explode (it sees the scan, not the x salt_buckets blowup),
    # so past ~autoBroadcastJoinThreshold/salt_buckets of input it happily
    # plans a broadcast that then OOMs the driver building it (observed at a
    # 64x-amplified sf0.1: 9.6M orders rows x 8 salt = 77M-row broadcast).
    # And if the right side genuinely fit in a broadcast, salting would be
    # pointless — a broadcast join has no shuffle to skew.  SMJ is the one
    # strategy that is spillable on both sides, and the salt has already
    # evened the partitions it sorts.
    joined = salted_left.join(
        replicated_right.hint("merge"), on=[key, "_salt"], how=how
    )
    return joined.drop("_salt")
