"""Skew-handling joins: salting for hot keys.

AQE's skew-join split (enabled in the session factory) handles most
skew by splitting oversized shuffle partitions, but it only helps
sort-merge joins and only after the skewed partition materializes.
Salting attacks the skew at the source: the hot side's key k becomes
(k, salt) with salt ∈ [0, S), and the other side is replicated S ways
so every (k, salt) bucket still finds its matches. One hot key's rows
now land on S reducers instead of one.

Cost model: replicating the build side S× is worth it iff the hot
key's share of rows ≫ 1/num_partitions — which is why this is an
explicit operator (applied to known-skewed joins, e.g. a boilerplate
synset or a celebrity user) rather than a default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: join types for which salting preserves semantics. Right/full outer
#: would emit each unmatched row of the REPLICATED side once per salt
#: copy (salt_buckets null-extended duplicates), so they are rejected.
SALT_SAFE_JOINS = frozenset(
    {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
     "semi", "left_anti", "leftanti", "anti"}
)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side
    with a uniform bucket, replicate ``other`` across all buckets, and
    join on (keys…, salt). Result equals ``skewed.join(other, on,
    how)`` row-for-row (asserted in tests) for inner/left-family joins
    ONLY — the unmatched-row side must be the salted one. For a
    right/full outer, swap the inputs and use the mirrored left join."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in SALT_SAFE_JOINS
    }:
        raise ValueError(
            f"salted_join supports inner/left-family joins, got {how!r}: "
            "unmatched rows of the replicated side would appear "
            f"{salt_buckets}x (once per salt copy)"
        )
    keys = list(on)
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=13) * salt_buckets).cast("int")
    )
    replicated = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = salted.join(replicated, keys + ["__salt"], how)
    return out.drop("__salt")
