"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — the
full iterative merge loop, not just one round of pair counts (r09).

Why this is a Spark problem: the corpus-sized work happens exactly
once — one shuffle aggregates the corpus into a (word, freq) table.
Every training round after that runs over the *vocabulary* (|distinct
words|, orders of magnitude smaller than the corpus, independent of
corpus scale for natural text by Heaps' law), so 100 TB of text costs
one corpus pass + N vocab-sized rounds.

Per round, entirely JVM-side:

1. adjacent-pair counts weighted by word frequency — nested HOFs over
   the symbol arrays, one explode, one map-side-combined count
   shuffle;
2. argmax pair (count desc, then lexicographic — fully deterministic);
   ONE row is collected per round, the same driver traffic as a
   k-means centroid update;
3. the merge is applied to every word with an ``aggregate`` fold that
   rebuilds each symbol array greedily left-to-right (leftmost,
   non-overlapping — the classic BPE application order), then
   ``localCheckpoint`` truncates the lineage so round N's plan does
   not nest N fold expressions.

No word-boundary marker is appended (merges never cross words because
words are the grouping unit — the q59 pre-tokenization convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: symbol-pair extraction over a symbol array (guarded: 1-symbol words
#: yield no pairs; Spark's sequence(1, 0) would count DOWN)
_PAIRS_EXPR = """
CASE WHEN size(syms) >= 2
     THEN transform(sequence(1, size(syms) - 1),
                    i -> struct(element_at(syms, i) AS l,
                                element_at(syms, i + 1) AS r))
     ELSE CAST(array() AS array<struct<l: string, r: string>>) END
"""


def _sql_quote(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def merge_fold_expr(left: str, right: str) -> str:
    """SQL that applies ONE merge to a symbol array: greedy
    left-to-right fold — append each symbol unless the accumulator's
    last element is ``left`` and the incoming symbol is ``right``, in
    which case fuse them. 'aaa' under (a,a) becomes [aa, a], the
    leftmost-non-overlapping order every BPE implementation uses."""
    le, re = _sql_quote(left), _sql_quote(right)
    return f"""
    aggregate(syms, CAST(array() AS array<string>),
      (acc, x) -> CASE WHEN size(acc) > 0
                        AND element_at(acc, -1) = '{le}'
                        AND x = '{re}'
                  THEN concat(slice(acc, 1, size(acc) - 1),
                              array('{le}' || '{re}'))
                  ELSE concat(acc, array(x)) END)
    """


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split tokens — the single
    corpus-sized aggregation of the whole training run."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the learned merge table
    (merge_rank, left, right, pair_count) — the artifact a tokenizer
    ships. Deterministic: ties break lexicographically on (left,
    right), and every float-free count is exact."""
    spark = docs.sparkSession
    vocab = (
        word_frequencies(docs, text_col)
        .select(
            F.expr(
                "transform(sequence(1, char_length(word)),"
                " i -> substring(word, i, 1))"
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            vocab.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((rank, l, r, n))
        vocab = vocab.withColumn(
            "syms", F.expr(merge_fold_expr(l, r))
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    )


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a TRAINED merge list to the corpus and report tokenizer
    quality: (n_distinct_words, total_words, avg_tokens_per_word,
    compression_vs_chars). The application runs over the VOCAB
    relation (distinct words + frequencies — the same Heaps'-law
    bound as training), applying each merge with the identical
    greedy fold used during training, so train and apply cannot
    diverge; corpus-level stats weight by word frequency.
    localCheckpoint every few merges keeps the expression tree flat
    (N nested folds would otherwise stack in one codegen unit)."""
    vocab = (
        word_frequencies(docs, text_col)
        .select(
            "freq",
            F.char_length("word").alias("n_chars"),
            F.expr(
                "transform(sequence(1, char_length(word)),"
                " i -> substring(word, i, 1))"
            ).alias("syms"),
        )
        .localCheckpoint(eager=True)
    )
    for i, (left, right) in enumerate(merges):
        vocab = vocab.withColumn("syms", F.expr(merge_fold_expr(left, right)))
        if (i + 1) % 4 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return vocab.agg(
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.sum("freq").alias("total_words"),
        F.round(
            F.sum(F.col("freq") * F.size("syms")) / F.sum("freq"), 6
        ).alias("avg_tokens_per_word"),
        F.round(
            F.sum(F.col("freq") * F.size("syms"))
            / F.sum(F.col("freq") * F.col("n_chars")),
            6,
        ).alias("compression_vs_chars"),
    )
