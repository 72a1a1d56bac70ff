"""Bloom-prefiltered join: build a Bloom filter over the SMALL side's
join keys distributed (no driver pass over raw keys), ship the bitmap
to the large side as a plan literal, and drop non-matching large-side
rows BEFORE they shuffle. The exact inner join still runs after the
filter, so false positives cost only wasted shuffle bytes — results
stay exact, which is why the whole operator is oracle-checkable.

This is the runtime-filter pattern Catalyst's InjectRuntimeFilter
applies automatically when its thresholds line up
(spark.sql.optimizer.runtime.bloomFilter.*); the explicit operator
exists for the cases the optimizer declines — e.g. the small side is
an intermediate result the planner cannot size, or the filter should
be reused across several consumers — and for engine parity, since the
SQL surface (bloom_filter_agg / might_contain) is not exposed to
PySpark.

Scale design, all JVM expressions:

- **Build**: each small-side key → k = `n_hashes` bit positions via
  seeded xxhash64 → (word_idx, single-bit mask) rows → one
  ``groupBy(word_idx).agg(bit_or)`` shuffle of at most n_bits/64 rows.
  Only the OR-folded bitmap words reach the driver: 2^20 bits = 16 K
  longs = 128 KB regardless of key count.
- **Probe**: the bitmap becomes an array<long> literal; each
  large-side row recomputes its k positions and ANDs k
  ``element_at(bitmap, word) & mask`` checks — whole-stage-codegen
  arithmetic, no Python, no join, evaluated before the exchange.

Sizing: FP rate ≈ (1 − e^{−k·n/m})^k; the 2^20-bit default holds
~100 K keys at k=5 under 5% FPs. For 100 TB probes raise n_bits —
the build shuffle grows only with n_bits/64, never with the corpus.

Measured (sf0.1, r50's 1%-selective join, broadcast disabled so the
fact side really shuffles, Spark UI stage metrics): the prefilter
cut shuffle write from 7.48 MB to 0.106 MB (70.6×) by letting only
6,157 of 600,000 fact rows reach the exchange (97.5×), with results
row-for-row identical to the plain join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_BITS = 1 << 20
DEFAULT_N_HASHES = 5


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k bit positions for a key: pmod(xxhash64(key, seed_i), n_bits).
    Seeding with a literal second argument gives k independent hash
    families from the one builtin."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def build_bloom_words(
    keys: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> list[int]:
    """The filter's bitmap as a dense list of n_bits/64 longs (index =
    word position). Distributed: one explode of k positions per key,
    one bit_or shuffle bounded by the bitmap size."""
    if n_bits % 64:
        # a partial last word would make the probe's element_at read
        # past the bitmap for positions in it — NULL, treated as
        # no-match, silently dropping genuinely matching rows
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    n_words = n_bits // 64
    pos = F.explode(
        F.array(*_positions(F.col(key_col), n_bits, n_hashes))
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[int(r["w"])] = int(r["bits"])
    return dense


def might_contain(
    key: Column,
    bloom_words: list[int],
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> Column:
    """AND of the k probe checks against the literal bitmap — pure
    whole-stage-codegen arithmetic on the probing side."""
    bitmap = F.lit(bloom_words)
    checks = [
        (
            F.element_at(bitmap, (p / 64).cast("int") + 1).bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
            != 0
        )
        for p in _positions(key, n_bits, n_hashes)
    ]
    return reduce(lambda a, b: a & b, checks)


def bloom_prefiltered_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """``large ⋈ small`` with the large side Bloom-pruned before its
    exchange. Exact: FPs are eliminated by the join itself."""
    words = build_bloom_words(small.select(on), on, n_bits, n_hashes)
    pruned = large.filter(might_contain(F.col(on), words, n_bits, n_hashes))
    return pruned.join(small, on)
