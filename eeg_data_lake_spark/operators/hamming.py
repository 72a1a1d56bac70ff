"""Hamming-distance pair join over single 64-bit fingerprints — the
Manku multi-index construction (the r41 machinery generalized to one
64-bit column): split each fingerprint into four 16-bit blocks; if
hamming(a, b) ≤ 3 the differing bits occupy ≤ 3 blocks, so by
pigeonhole at least one block matches bit-for-bit, and candidates come
from four equi-joins instead of an O(n²) scan. Exact
bit_count(xor) verify on candidates.

All integer-exact JVM expressions (shiftright / bitwiseAND — never
float pow). The index is 4 rows per fingerprint; a hot block (the
all-zeros block every blank input shares) is the skew point — cap
block-bucket sizes at corpus scale the way MAX_SHINGLE_DF caps
posting lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hamming_pairs_64(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    max_dist: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) for every pair with distance ≤ max_dist.
    ``max_dist`` must be ≤ 3: four blocks only guarantee a shared
    block up to 3 differing bits (b blocks cover b−1 differences)."""
    if max_dist > 3:
        raise ValueError("4x16-bit multi-index guarantees max_dist <= 3")
    fps = fps.select(
        F.col(id_col).alias("doc_id"), F.col(fp_col).alias("fp")
    ).localCheckpoint(eager=True)  # reused by index and verify
    blocks = fps.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.shiftright("fp", 48).bitwiseAND(F.lit(65535)),
                F.shiftright("fp", 32).bitwiseAND(F.lit(65535)),
                F.shiftright("fp", 16).bitwiseAND(F.lit(65535)),
                F.col("fp").bitwiseAND(F.lit(65535)),
            )
        ).alias("j", "block"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    fa = fps.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fp_a"))
    fb = fps.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b"))
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("long")
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_dist)
        .select("id_a", "id_b", "hamming")
    )
