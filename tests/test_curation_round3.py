"""Structural invariants for the round-3 curation additions (oracle
parity itself is covered by test_oracle_parity's auto-discovery).

- r27: a planted boilerplate segment is actually deleted from every
  document that carries it, and untouched documents' rebuilt text
  hashes to the original (the rewrite is lossless where df < cap).
- r30: shard packing is contiguous and budget-bounded — every shard's
  token total stays within one max-document of the budget, and doc
  counts sum to the corpus.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.curation import (
    _SEG_W,
    _SHARD_TOKENS,
    r27_crossdoc_segment_dedup,
    r30_token_shard_packing,
)
from eeg_data_lake_spark.workload.registry import REGISTRY, t


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_r27_planted_boilerplate_dropped(spark, tmp_path):
    """Three docs share a leading 4-word boilerplate segment; with
    df cap 3 it must vanish from all three, and the singleton tail
    segments must survive verbatim."""
    boiler = "subscribe to our newsletter"
    docs = [
        (0, f"{boiler} alpha beta gamma delta"),
        (1, f"{boiler} epsilon zeta eta theta"),
        (2, f"{boiler} iota kappa lam mu"),
        (3, "nu xi omicron pi rho sigma tau upsilon"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    d = d.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text"))
    path = str(tmp_path / "documents.parquet")
    d.coalesce(1).write.mode("overwrite").parquet(path)
    out = {
        r["doc_id"]: r
        for r in r27_crossdoc_segment_dedup(spark, str(tmp_path)).collect()
    }
    assert _SEG_W == 4  # fixture geometry assumes 4-word segments
    for i in range(3):
        assert out[i]["n_dropped"] == 1
        assert out[i]["n_segments"] == 2
    # survivors: the per-doc unique tail segment only
    assert out[0]["clean_md5"] == _md5("alpha beta gamma delta")
    # doc 3 shares nothing: rebuilt text == original text
    assert out[3]["n_dropped"] == 0
    assert out[3]["clean_md5"] == _md5(docs[3][1])


def test_r30_shards_contiguous_and_bounded(spark, sf_dir):
    rows = r30_token_shard_packing(spark, sf_dir).collect()
    shards = sorted((r["shard_id"], r["n_docs"], r["n_tokens"]) for r in rows)
    # contiguous ids from 0
    assert [s[0] for s in shards] == list(range(len(shards)))
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()
    max_tok = docs.select(
        F.max(F.size(F.split("text", " "))).alias("m")
    ).collect()[0]["m"]
    assert sum(s[1] for s in shards) == n_docs
    # each non-final shard fills its budget before cutting over, so its
    # total lies in (BUDGET - max_doc, BUDGET + max_doc)
    for _sid, _nd, ntok in shards[:-1]:
        assert _SHARD_TOKENS - max_tok < ntok < _SHARD_TOKENS + max_tok


def test_new_queries_registered_with_oracles():
    for name in (
        "r27_crossdoc_segment_dedup",
        "r28_winsorized_stats",
        "r29_domain_quality_filter",
        "r30_token_shard_packing",
    ):
        assert name in REGISTRY
        assert REGISTRY[name].oracle


def test_r47_dsir_enriches_target_domain(spark, sf_dir):
    """Importance resampling toward the lang='en' target distribution
    must select a set MORE en-like than the population base rate —
    that's the entire point of DSIR's likelihood-ratio weighting."""
    sel = REGISTRY["r47_dsir_importance_resample"].spark_fn(spark, sf_dir)
    rows = sel.collect()
    assert len(rows) > 0
    docs = t(spark, sf_dir, "documents")
    base = docs.filter(F.col("lang") == "en").count() / docs.count()
    got = sum(r.lang == "en" for r in rows) / len(rows)
    assert got > base
    # log-weights arrive in selection order: non-increasing
    ws = [r.dsir_logweight for r in rows]
    assert all(a >= b for a, b in zip(ws, ws[1:]))


def test_pack_token_shards_invariant_to_sort_parallelism(spark):
    """pack_token_shards' docstring claims ANY n_parts yields
    bit-identical shards (integer token sums don't care where range-
    partition boundaries fall) — pin it directly: per-key shard
    assignments must match across n_parts 1 / 3 / 16, including keys
    that tie in token count and partitions that come out empty."""
    import random

    from eeg_data_lake_spark.workload.curation import pack_token_shards

    rng = random.Random(11)
    rows = [
        (f"{i:04d}-{rng.randint(0, 9)}", rng.choice([1, 7, 50, 50, 213]))
        for i in range(400)
    ]
    d = spark.createDataFrame(rows, "key string, n_tok long")

    def assign(n_parts):
        return {
            r["key"]: r["shard_id"]
            for r in pack_token_shards(
                d, shard_tokens=500, n_parts=n_parts
            ).collect()
        }

    base = assign(1)
    assert len(base) == 400
    for n in (3, 16):
        assert assign(n) == base, n
