"""Prefix-filtered Jaccard join (r31): losslessness vs the posting-list
plan (q33) and the candidate-pruning claim itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.dedup import (
    prefix_filter_jaccard_pairs,
    shingle_jaccard_pairs,
    shingled,
    shingled_cached,
)
from eeg_data_lake_spark.workload.registry import t


def _rows(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["shared"], r["jaccard"]) for r in df.collect()
    )


def test_prefix_filter_matches_posting_list_plan(spark, sf_dir):
    sh = shingled_cached(spark, sf_dir)
    assert _rows(prefix_filter_jaccard_pairs(sh)) == _rows(
        shingle_jaccard_pairs(sh)
    )


def test_prefix_filter_prunes_hot_token_candidates(spark):
    """A boilerplate shingle shared by every doc must NOT create
    candidates by itself: it is globally hottest, so it sorts to the
    back of every document and falls outside every prefix."""
    boiler = "all rights reserved"
    docs = [
        # two true near-dups (share most shingles)
        (0, f"{boiler} the quick brown fox jumps over lazy dogs daily"),
        (1, f"{boiler} the quick brown fox jumps over lazy dogs nightly"),
        # unrelated docs that share ONLY the boilerplate shingle
        (2, f"{boiler} alpha beta gamma delta epsilon zeta eta theta"),
        (3, f"{boiler} one two three four five six seven eight nine"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    sh = shingled(d).withColumn("n", F.size("sl")).select("doc_id", "n", "sl")

    out = _rows(prefix_filter_jaccard_pairs(sh, tau=0.5))
    assert [(a, b) for a, b, *_ in out] == [(0, 1)]
    # and it agrees with the unpruned plan on the same fixture
    assert out == _rows(shingle_jaccard_pairs(sh, tau=0.5))


def test_prefix_shorter_than_full_index(spark, sf_dir):
    """The candidate index the prefix plan explodes is strictly smaller
    than the full inverted index q33 explodes."""
    sh = shingled_cached(spark, sf_dir)
    full = sh.select(F.explode("sl")).count()
    inv = sh.select("doc_id", F.explode("sl").alias("shingle"))
    df_tbl = inv.groupBy("shingle").agg(F.count("*").alias("df"))
    ordered = (
        inv.join(df_tbl, "shingle")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("os"))
        .select("doc_id", F.transform("os", lambda s: s["shingle"]).alias("sl"))
        .withColumn("n", F.size("sl"))
    )
    plen = F.col("n") - F.ceil(F.col("n") * F.lit(0.5)).cast("int") + F.lit(1)
    pref = ordered.select(F.explode(F.slice("sl", F.lit(1), plen))).count()
    assert pref < full
    # tau=0.5 prefixes are about half the tokens (+1 per doc)
    assert pref <= full * 0.55 + ordered.count()
