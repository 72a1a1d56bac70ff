"""BPE trainer: classic-corpus behavior, exact parity with a local
Python reference, determinism, fold edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from eeg_data_lake_spark.functions.bpe import bpe_train, merge_fold_expr
from eeg_data_lake_spark.workload import REGISTRY
from eeg_data_lake_spark.workload.registry import t


def _ref_bpe(word_freq: dict[str, int], n_merges: int):
    """Single-node reference: identical greedy/tie-break semantics."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for rank in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, n))
        nxt = {}
        for syms, f in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        vocab = nxt
    return merges


def test_classic_sennrich_corpus(spark):
    """The canonical low/lower/newest/widest example: first merges
    fuse the highest-frequency adjacent pairs ('es'+'t' family)."""
    docs = spark.createDataFrame(
        [("low low low low low lower lower newest newest newest "
          "newest newest newest widest widest widest",)],
        "text string",
    )
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(docs, n_merges=6).collect()
    ]
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert got == _ref_bpe(wf, 6)
    # and the very first merge is (e, s) with count 9 — by hand
    assert got[0][1:] == ("e", "s", 9)


def test_matches_python_reference_on_sf(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    wf = {
        r.word: r.freq
        for r in docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter("word <> ''")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .collect()
    }
    want = _ref_bpe(wf, 8)
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(docs, n_merges=8).collect()
    ]
    assert got == want
    # learned merges fuse into multi-char symbols eventually
    assert any(len(l) + len(r) > 2 for _, l, r, _ in got)


def test_registered_query_deterministic(spark, sf_dir):
    a = REGISTRY["z10_bpe_train"].spark_fn(spark, sf_dir).collect()
    b = REGISTRY["z10_bpe_train"].spark_fn(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 12


def test_fold_handles_overlap_and_quotes(spark):
    """'aaa' under (a,a) → [aa, a]; quoted symbols survive escaping."""
    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(F.expr(merge_fold_expr("a", "a")).alias("m")).collect()
    assert out[0].m == ["aa", "a"]
    df2 = spark.createDataFrame([(["d", "'", "s"],)], "syms array<string>")
    out2 = df2.select(F.expr(merge_fold_expr("'", "s")).alias("m")).collect()
    assert out2[0].m == ["d", "'s"]


def test_apply_matches_python_reference(spark, sf_dir):
    from eeg_data_lake_spark.functions.bpe import bpe_apply, bpe_train
    from eeg_data_lake_spark.workload.registry import t

    docs = t(spark, sf_dir, "documents")
    wf = {
        r.word: r.freq
        for r in docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter("word <> ''")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .collect()
    }
    merges = [(l, r) for _, l, r, _ in _ref_bpe(wf, 8)]
    got = bpe_apply(docs, merges).collect()[0]

    def apply_all(word):
        syms = list(word)
        for l, r in merges:
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms = out
        return syms

    total = sum(wf.values())
    tok = sum(f * len(apply_all(w)) for w, f in wf.items())
    chars = sum(f * len(w) for w, f in wf.items())
    assert got.n_distinct_words == len(wf)
    assert got.total_words == total
    assert got.avg_tokens_per_word == round(tok / total, 6)
    assert got.compression_vs_chars == round(tok / chars, 6)
    assert got.compression_vs_chars < 1.0  # merges actually compress
