"""Robustness of the text/dedup surface on inputs the synthetic corpus
never produces: multi-byte UTF-8 (CJK, emoji, RTL, combining marks),
NULL text, empty text, and whitespace pathologies. A 100 TB web corpus
is full of all four; none of them may crash a plan or silently skew a
count (Spark 4 runs ANSI mode, so a lurking bad cast would THROW)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.curation import r27_crossdoc_segment_dedup
from eeg_data_lake_spark.workload.dedup import shingled
from eeg_data_lake_spark.workload.registry import REGISTRY

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

UNICODE_DOCS = [
    (0, "漢字 テスト 中文 分词 測試 漢字 テスト 中文 分词 測試", "zh", "s", 0),
    (1, "مرحبا بالعالم هذا نص عربي للاختبار مرحبا بالعالم", "ar", "s", 0),
    (2, "emoji 🎉 test 🚀 with 🎉 repeats 🚀 and ligatures ﬁn", "en", "s", 0),
    (3, "café naïve résumé café naïve résumé déjà vu encore", "fr", "s", 0),
    (4, "éclair combining éclair marks éclair here", "fr", "s", 0),
    (5, None, "en", "s", 0),
    (6, "", "en", "s", 0),
    (7, "   ", "en", "s", 0),
    (8, "single", "en", "s", 0),
]


@pytest.fixture(scope="module")
def unicode_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("unicode")
    d = spark.createDataFrame(UNICODE_DOCS, DOC_SCHEMA)
    d = d.withColumn("n_chars", F.coalesce(F.length("text"), F.lit(0)))
    d.coalesce(1).write.mode("overwrite").parquet(str(p / "documents.parquet"))
    return str(p)


TEXT_QUERIES = [
    "q26_token_counts",
    "q27_top_tokens",
    "q28_quality_scores",
    "q29_language_id",
    "q30_fingerprints",
    "q32_exact_dedup_groups",
    "q33_neardup_shingle_jaccard",
    "q34_minhash_signatures",
    "q70_blocklist_scrub",
    "r21_token_entropy",
    "r27_crossdoc_segment_dedup",
    "q98_text_embedding_topk",
    "z18_exact_substring_dedup",
]


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_ops_survive_unicode_null_empty(spark, unicode_dir, name):
    """No crash, no ANSI cast explosion, sane row counts."""
    df = REGISTRY[name].spark_fn(spark, unicode_dir)
    assert df.count() >= 0  # materializes without raising


def test_shingles_are_codepoint_clean(spark):
    """Multi-byte tokens survive shingling verbatim (no mojibake from
    byte-level slicing — Spark strings are UTF-8 aware)."""
    d = spark.createDataFrame([(0, "漢字 テスト 中文 分词")], "doc_id long, text string")
    (row,) = shingled(d).collect()
    assert row["sl"] == ["漢字 テスト 中文", "テスト 中文 分词"]


def test_r27_unicode_reassembly_hash_is_codepoint_exact(spark, unicode_dir):
    """Reassembled text hashes match Python's own UTF-8 md5 — proves
    the whole segment round-trip is byte-exact for multi-byte text."""
    out = {r["doc_id"]: r for r in r27_crossdoc_segment_dedup(spark, unicode_dir).collect()}
    # doc 0: 10 tokens → 3 segments (4+4+2), all unique corpus-wide
    def seg_md5(text, w=4):
        toks = text.split(" ")
        segs = [" ".join(toks[i : i + w]) for i in range(0, len(toks), w)]
        return hashlib.md5(" ".join(segs).encode("utf-8")).hexdigest()

    assert out[0]["n_dropped"] == 0
    assert out[0]["clean_md5"] == seg_md5(UNICODE_DOCS[0][1])
    # NULL text never reaches the output (no segments exist for it)
    assert 5 not in out
    # whitespace-only text: split(' ') yields empty tokens, not a crash
    assert out[7]["n_segments"] >= 1


def test_null_text_consistent_with_oracle_semantics(spark, unicode_dir):
    """q26 on NULL text: split(NULL) is NULL, size(NULL) is NULL (ANSI)
    — the row survives with NULL counts, mirroring len(string_split(
    NULL,' ')) = NULL in DuckDB, so oracle hashes stay aligned."""
    rows = {r["doc_id"]: r for r in REGISTRY["q26_token_counts"].spark_fn(spark, unicode_dir).collect()}
    assert rows[5]["n_tokens"] is None
    assert rows[6]["n_tokens"] == 1  # '' splits to [''] in both engines


def test_z18_unicode_null_empty_rows(spark, unicode_dir):
    """ExactSubstr on the pathological corpus: NULL text surfaces as
    (n_tokens NULL, n_kept 0, n_removed NULL, md5 NULL) — the oracle's
    exact shape; unicode docs with no >=L-token duplicates are
    untouched and their reassembly md5 is codepoint-exact."""
    from eeg_data_lake_spark.workload.curation import (
        z18_exact_substring_dedup,
    )

    out = {
        r["doc_id"]: r
        for r in z18_exact_substring_dedup(spark, unicode_dir).collect()
    }
    assert out[5]["n_tokens"] is None and out[5]["n_kept"] == 0
    assert out[5]["n_removed"] is None and out[5]["kept_md5"] is None
    assert out[6]["n_tokens"] == 1 and out[6]["n_removed"] == 0
    # every non-NULL doc here is shorter than 2L with unique grams
    assert all(
        out[i]["n_removed"] == 0 for i in (0, 1, 2, 3, 4, 6, 7, 8)
    )
    assert out[0]["kept_md5"] == hashlib.md5(
        UNICODE_DOCS[0][1].encode("utf-8")
    ).hexdigest()


def test_simhash_parity_holds_on_degenerate_corpus(spark, unicode_dir):
    """Full DuckDB parity for r40/r41 on a corpus WITH NULL/short docs:
    r40 must emit (n_shingles=0, fp 0) rows for them on BOTH engines
    (the oracle's coalesce + LEFT JOIN lateral keeps them), and r41
    must pair NONE of them (fingerprint 0 is shared by every
    contentless doc without any similarity)."""
    import duckdb

    from tests.oracle_utils import compare

    con = duckdb.connect()
    # the fixture writes a Spark parquet DIRECTORY, so glob the parts
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{unicode_dir}/documents.parquet/*.parquet'"
    )
    for name in ("r40_simhash_md5", "r41_simhash_hamming_pairs"):
        e = REGISTRY[name]
        problems = compare(
            e.spark_fn(spark, unicode_dir),
            con.sql(e.oracle).fetchdf(),
            name,
        )
        assert not problems, (name, problems)


def test_udtf_ngrams_survives_null_text(spark, unicode_dir):
    """SQL NULL reaches the UDTF as Python None: eval must emit no
    rows, not die on None.split."""
    out = REGISTRY["q72_udtf_ngrams"].spark_fn(spark, unicode_dir)
    rows = out.collect()
    assert all(r.doc_id != 5 for r in rows)  # NULL-text doc absent
    assert any(r.doc_id == 0 for r in rows)  # real docs present
