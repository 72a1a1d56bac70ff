"""z18 ExactSubstr semantics on planted data: duplicated cross-doc
spans, within-doc repetition, overlap merging, and degenerate texts —
each hand-computed AND oracle-compared on the same crafted parquet."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eeg_data_lake_spark.workload.curation import (
    _ESD_L,
    z18_exact_substring_dedup,
    z19_exact_substring_hashed,
)
from eeg_data_lake_spark.workload.registry import REGISTRY
from tests.oracle_utils import compare, run_oracle


def _w(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _fill_other_tables(p, sf_dir):
    """Zero-row copies of the remaining tables so run_oracle's view
    registration finds every file."""
    from tests.oracle_utils import TABLES

    for tbl in TABLES:
        if tbl == "documents":
            continue
        schema = pq.read_schema(f"{sf_dir}/{tbl}.parquet")
        pq.write_table(schema.empty_table(), str(p / f"{tbl}.parquet"))


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory, sf_dir):
    span = _w(_ESD_L + 2, "dup")          # 10-token span shared by 2 docs
    rep = _w(_ESD_L, "rep")               # 8-token span repeated IN one doc
    texts = [
        (0, f"{_w(5, 'a')} {span} {_w(5, 'b')}"),      # span in context
        (1, f"{_w(3, 'c')} {span}"),                   # same span, other doc
        (2, f"{rep} {_w(4, 'm')} {rep}"),              # within-doc repeat
        (3, _w(_ESD_L - 1, "s")),                      # too short for a gram
        (4, ""),                                       # empty text
        (5, _w(30, "u")),                              # all unique: untouched
    ]
    p = tmp_path_factory.mktemp("planted")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([t[0] for t in texts], pa.int64()),
                "text": pa.array([t[1] for t in texts], pa.string()),
            }
        ),
        str(p / "documents.parquet"),
    )
    _fill_other_tables(p, sf_dir)
    return str(p)


def test_planted_spans_removed_exactly(spark, planted_dir):
    rows = {
        r.doc_id: r
        for r in z18_exact_substring_dedup(spark, planted_dir).collect()
    }
    # docs 0/1: exactly the 10 shared tokens go; context survives
    assert rows[0].n_removed == _ESD_L + 2 and rows[0].n_kept == 10
    assert rows[1].n_removed == _ESD_L + 2 and rows[1].n_kept == 3
    # doc 2: both copies of the repeated 8-token span go, middle stays
    assert rows[2].n_removed == 2 * _ESD_L and rows[2].n_kept == 4
    # doc 3 (< L tokens) and doc 5 (unique) untouched
    assert rows[3].n_removed == 0 and rows[5].n_removed == 0
    # empty text tokenizes to the single empty token, kept
    assert rows[4].n_tokens == 1 and rows[4].n_removed == 0
    assert rows[5].kept_md5 is not None


def test_planted_matches_oracle(spark, planted_dir):
    e = REGISTRY["z18_exact_substring_dedup"]
    problems = compare(
        e.spark_fn(spark, planted_dir),
        run_oracle(e.oracle, planted_dir),
        "z18_planted",
    )
    assert problems == [], problems


def test_hashed_variant_equals_string_variant(spark, planted_dir, sf_dir):
    """z19 (xxhash64 gram keys) must produce row-for-row the SAME
    output as z18 (string gram keys) — the hash only changes what
    bytes travel through shuffle 1, never which grams count as
    duplicated (no collisions at these corpus sizes). Pinned on the
    planted corpus (known removals) AND the real sf documents table."""
    for d in (planted_dir, sf_dir):
        a = sorted(z18_exact_substring_dedup(spark, d).collect())
        b = sorted(z19_exact_substring_hashed(spark, d).collect())
        assert a == b, f"variants diverge on {d}"


def test_hashed_variant_prunes_gram_strings_from_shuffle(spark, sf_dir):
    """The point of z19: the duplicate-count exchange must carry the
    8-byte hash, not the gram string. Column pruning is visible in the
    optimized plan — the aggregate subtree below the first exchange
    keys on xxhash64, and z18's plan (same shape) keys on the string."""
    plan = (
        z19_exact_substring_hashed(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "xxhash64" in plan
    base = (
        z18_exact_substring_dedup(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "xxhash64" not in base  # string-key mode untouched


def test_overlapping_duplicate_windows_merge(spark, tmp_path):
    # two docs sharing a LONG span: removal must be one merged interval
    span = _w(3 * _ESD_L, "x")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    [f"{span} {_w(2, 'p')}", f"{_w(2, 'q')} {span}"], pa.string()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = {
        r.doc_id: r
        for r in z18_exact_substring_dedup(spark, str(tmp_path)).collect()
    }
    assert rows[0].n_removed == 3 * _ESD_L and rows[0].n_kept == 2
    assert rows[1].n_removed == 3 * _ESD_L and rows[1].n_kept == 2


def test_fully_removed_document_null_md5(spark, tmp_path, sf_dir):
    """Two identical L-token docs: every token removed in both, Spark's
    missing-stats row must surface as (n_kept=0, kept_md5 NULL) — the
    exact shape the oracle's empty string_agg produces."""
    same = _w(_ESD_L, "z")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([same, same], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    _fill_other_tables(tmp_path, sf_dir)
    rows = {
        r.doc_id: r
        for r in z18_exact_substring_dedup(spark, str(tmp_path)).collect()
    }
    for i in (0, 1):
        assert rows[i].n_kept == 0 and rows[i].n_removed == _ESD_L
        assert rows[i].kept_md5 is None
    e = REGISTRY["z18_exact_substring_dedup"]
    problems = compare(
        e.spark_fn(spark, str(tmp_path)),
        run_oracle(e.oracle, str(tmp_path)),
        "z18_fully_removed",
    )
    assert problems == [], problems


class TestPropertyVsPythonReference:
    """Randomized corpora over a tiny vocabulary (duplicated L-grams
    arise constantly) checked against a direct pure-Python
    re-implementation of the ExactSubstr definition — independent of
    both the Spark plan and the SQL oracle."""

    @staticmethod
    def _reference(texts, L):
        import hashlib
        from collections import Counter

        toks = {i: (t.split(" ") if t is not None else None) for i, t in texts}
        grams = Counter()
        for w in toks.values():
            if w and len(w) >= L:
                for p in range(len(w) - L + 1):
                    grams[" ".join(w[p : p + L])] += 1
        out = {}
        for i, w in toks.items():
            if w is None:
                out[i] = (None, 0, None, None)
                continue
            covered = [False] * len(w)
            for p in range(max(len(w) - L + 1, 0)):
                if grams[" ".join(w[p : p + L])] >= 2:
                    covered[p : p + L] = [True] * L
            kept = [wd for wd, c in zip(w, covered) if not c]
            md5 = (
                hashlib.md5(" ".join(kept).encode()).hexdigest()
                if kept
                else None
            )
            out[i] = (len(w), len(kept), len(w) - len(kept), md5)
        return out

    def test_random_corpora_match_reference(self, spark):
        import random

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @given(seed=st.integers(0, 2**16))
        @settings(max_examples=8, deadline=None)
        def run(seed):
            rng = random.Random(seed)
            vocab = ["a", "b", "c", "d"]
            texts = []
            for i in range(rng.randint(2, 5)):
                n = rng.randint(0, 30)
                texts.append(
                    (i, " ".join(rng.choice(vocab) for _ in range(n)))
                )
            if rng.random() < 0.3:
                texts.append((len(texts), None))
            df = spark.createDataFrame(texts, "doc_id long, text string")
            from eeg_data_lake_spark.workload.curation import (
                _ESD_L,
                z18_exact_substring_dedup,
            )

            import tempfile

            d = tempfile.mkdtemp()
            df.coalesce(1).write.mode("overwrite").parquet(
                d + "/documents.parquet"
            )
            got = {
                r.doc_id: (r.n_tokens, r.n_kept, r.n_removed, r.kept_md5)
                for r in z18_exact_substring_dedup(spark, d).collect()
            }
            want = self._reference(texts, _ESD_L)
            assert got == want, (texts, got, want)

        run()
