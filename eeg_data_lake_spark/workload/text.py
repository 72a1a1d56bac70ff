"""Text-analysis workload over the documents table (north-star ops):
tokenization, token counting, quality scoring, language-ID heuristic,
document fingerprinting.

Everything is built from JVM-side expressions (split/explode/regexp/
aggregate HOFs) — no Python UDF touches a row, so the hot path stays
inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import register, t

#: tiny embedded stopword list for the quality/langid heuristics —
#: must stay in sync with the SQL literal lists in the oracles below.
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]
_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "q26_token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)      AS n_tokens,
           CAST(length(text) AS BIGINT)                      AS n_chars,
           round(CAST(length(text) AS DOUBLE)
                 / len(string_split(text, ' ')), 6)          AS chars_per_token
    FROM documents
    """,
    tags=("text", "tokens"),
)
def q26_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting per document (F2 split + size) —
    computed without exploding, so it's a narrow map at any scale."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(F.length("text").cast("double") / F.size(toks), 6).alias(
            "chars_per_token"
        ),
    )


@register(
    "q27_top_tokens",
    oracle="""
    SELECT token, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 25
    """,
    tags=("text", "explode", "topk"),
)
def q27_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary via explode (F7) + count + deterministic top-k.
    At 100 TB the explode output is huge but the partial (map-side)
    aggregation collapses it to |vocab| rows per task before shuffling."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(25)
    )


@register(
    "q28_quality_scores",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, n_chars,
             string_split(text, ' ') AS toks,
             length(text) - length(replace(text, '.', '')) AS n_dots
      FROM documents
    ), m AS (
      SELECT doc_id, lang, n_chars, n_dots,
             len(toks) AS n_tokens,
             len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS n_stop
      FROM tok
    )
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(n_stop AS DOUBLE) / n_tokens, 6)  AS stopword_ratio,
           round(CAST(n_dots AS DOUBLE) / n_chars, 6)   AS punct_ratio,
           round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6) AS length_score,
           round(0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)
                 + 0.5 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 6)
               AS quality_score
    FROM m
    """,
    tags=("text", "quality"),
)
def q28_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: stopword ratio, punctuation density and
    a length score combined into one quality number — the filter stage
    of an LLM-data pipeline, all in array HOFs (F.filter) JVM-side."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    n_dots = F.length("text") - F.length(F.replace(F.col("text"), F.lit("."), F.lit("")))
    # rounding only at the output edge: rounding inner terms first would
    # manufacture exact .5 boundaries where engines' round() can differ
    stop_ratio = n_stop.cast("double") / n_tokens
    length_score = F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    return d.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(n_dots.cast("double") / F.col("n_chars"), 6).alias("punct_ratio"),
        F.round(length_score, 6).alias("length_score"),
        F.round(0.5 * stop_ratio + 0.5 * length_score, 6).alias("quality_score"),
    )


@register(
    "q29_language_id",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x IN ({_SW_SQL})))
                 AS n_en_stop,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang AS lang_label,
           CASE WHEN CAST(n_en_stop AS DOUBLE) / n_tokens >= 0.05
                THEN 'en' ELSE 'other' END AS lang_pred
    FROM m
    """,
    tags=("text", "langid"),
)
def q29_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English stopword hit-rate ≥ 5% → 'en'.
    (A real pipeline scores several stopword lists; one list keeps the
    oracle exact while exercising the identical plan shape.)"""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    hit = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    rate = hit.cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        F.when(rate >= 0.05, "en").otherwise("other").alias("lang_pred"),
    )


@register(
    "q30_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS fingerprint,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def q30_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of case/whitespace-normalized text.
    md5 is bit-identical across engines, making the fingerprint itself
    oracle-checkable (unlike xxhash64, which only Spark defines)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "q31_source_regex",
    oracle="""
    SELECT regexp_extract(source, '([a-z]+)([0-9]+)', 1) AS source_kind,
           -- TRY_CAST, matching Spark's try_cast: a non-matching source
           -- yields '' and a plain CAST('' AS INTEGER) THROWS in DuckDB
           CAST(max(TRY_CAST(regexp_extract(source, '([a-z]+)([0-9]+)', 2) AS INTEGER))
                AS INTEGER) AS max_source_num,
           count(*) AS n_docs
    FROM documents
    GROUP BY source_kind
    """,
    tags=("text", "regex"),
)
def q31_source_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract metadata parsing (F1, the filename-metadata shape
    of /root/reference/main/combine_files.py:46-53) on documents.source."""
    d = t(spark, sf_dir, "documents")
    rx = "([a-z]+)([0-9]+)"
    return (
        d.withColumn("source_kind", F.regexp_extract("source", rx, 1))
        .withColumn("source_num", F.regexp_extract("source", rx, 2).try_cast("int"))
        .groupBy("source_kind")
        .agg(
            F.max("source_num").alias("max_source_num"),
            F.count("*").alias("n_docs"),
        )
    )


@register(
    "q43_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round((CAST(tf.tf AS DOUBLE) / dl.len)
                   * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf
      JOIN dl ON dl.doc_id = tf.doc_id
      JOIN df ON df.term = tf.term
      CROSS JOIN n
    )
    SELECT doc_id, term, tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    tags=("text", "tfidf"),
)
def q43_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document, fully relational (no ml.feature
    hashing — exact, oracle-checkable).

    Every statistic derives from the (doc, term) counts, so the
    explode+count happens ONCE and the rest is two analytic windows —
    no self-joins, no persist, no broadcast:

    - df  = count(*)  OVER (PARTITION BY term)  — tf rows are already
      distinct doc-term pairs, so this IS the document frequency;
    - len = sum(tf)   OVER (PARTITION BY doc_id) — the doc length;
    - ranking window on the same doc_id partitioning — Catalyst reuses
      the exchange, so scoring + top-k cost one shuffle, and Spark 4's
      WindowGroupLimit prunes to 3 rows per doc before the final sort.

    Shuffle ledger (r10 optimization): the input rebalance is HASH on
    doc_id, so the tf hash-agg on (doc_id, term) AND the doc-length
    window both reuse that one exchange (hashpartitioning(doc_id)
    satisfies their clustering) — 3 exchanges total: docs-by-id, term
    window, doc rank window. The old round-robin rebalance paid a 4th
    (the tf agg re-shuffled every EXPLODED token row; partitioning the
    un-exploded text moves each document's bytes once — guide §3.3's
    "explode after, not before, the shuffle"). Hot terms skew the term
    window exactly like any vocab agg — AQE splits them; hot-term
    capping (as in the dedup family) applies if the vocab must be
    bounded."""
    d = t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    tok = d.repartition(par, "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = d.count()  # scalar; one lightweight job
    scored = (
        tf.withColumn("len", F.sum("tf").over(Window.partitionBy("doc_id")))
        .withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("tf").cast("double") / F.col("len"))
                * F.log(F.lit(float(n_docs)) / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


_BPE_RX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "q59_bpe_style_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RX}')) AS BIGINT)
               AS n_tokens,
           CAST(len(list_filter(regexp_extract_all(text, '{_BPE_RX}'),
                                x -> regexp_matches(x, '^[A-Za-z]+$')))
                AS BIGINT) AS n_alpha,
           CAST(len(list_filter(regexp_extract_all(text, '{_BPE_RX}'),
                                x -> regexp_matches(x, '^[0-9]+$')))
                AS BIGINT) AS n_digit
    FROM documents
    """,
    tags=("text", "tokens", "regex"),
)
def q59_bpe_style_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization (the GPT-2 pre-tokenizer shape,
    simplified to letter-runs | digit-runs | single punctuation):
    regexp_extract_all + HOF filters, narrow map — the token-count
    accounting a training-data pipeline runs before a real BPE merge.
    Complements q26's whitespace tokenizer."""
    d = t(spark, sf_dir, "documents")
    toks = F.expr(f"regexp_extract_all(text, '{_BPE_RX}', 0)")
    alpha = F.filter(toks, lambda x: x.rlike("^[A-Za-z]+$"))
    digit = F.filter(toks, lambda x: x.rlike("^[0-9]+$"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(alpha).cast("long").alias("n_alpha"),
        F.size(digit).cast("long").alias("n_digit"),
    )


@register(
    "q72_udtf_ngrams",
    oracle="""
    WITH tl AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents
                WHERE doc_id < 50)
    SELECT doc_id,
           CAST(i AS INTEGER) AS pos,
           tl[i] || ' ' || tl[i + 1] AS ngram
    FROM tl, LATERAL (SELECT unnest(generate_series(1, len(tl) - 1)) AS i)
    """,
    tags=("text", "udtf", "ngrams"),
)
def q72_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function, SURVEY §2.9
    surface) exploding each document into positional word 2-grams via
    a SQL LATERAL join — the API a user reaches for when one input row
    must become a variable number of computed rows and the logic
    doesn't fit an expression.

    Deliberately the slow path: UDTFs run row-at-a-time Python, so the
    registered query caps the input (doc_id < 50) and the docstring of
    record is q33's JVM HOF shingle expression for the 100 TB hot
    path; this entry exists to verify the UDTF wiring (registration,
    lateral correlation, schema) against a SQL oracle — not to win the
    bench."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class TokenNgrams:
        def eval(self, text: str):
            if text is None:  # SQL NULL arrives as Python None:
                return  # no n-grams, not an AttributeError task kill
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i + 1, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("token_ngrams", TokenNgrams)
    t(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, g.pos, g.ngram
        FROM __docs_udtf d, LATERAL token_ngrams(d.text) g
        WHERE d.doc_id < 50
        """
    )


@register(
    "r09_bpe_pair_counts",
    oracle="""
    WITH tok AS (SELECT string_split(text, ' ') AS tl FROM documents),
    pairs AS (
      SELECT unnest(flatten(list_transform(tl,
          t -> list_transform(generate_series(1, len(t) - 1),
                              i -> substr(t, i, 2))))) AS pair
      FROM tok
    )
    SELECT pair, count(*) AS n_occurrences
    FROM pairs
    GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 20
    """,
    tags=("text", "bpe", "tokenizer"),
)
def r09_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer training: corpus-wide
    frequencies of adjacent symbol pairs within words, top-20 — the
    merge-candidate table a byte-pair-encoding trainer recomputes each
    round (q59 applies a trained tokenizer; this is the step that
    TRAINS one). At 100 TB this exact job is why tokenizer training is
    a distributed-count problem, not a single-node one.

    Plan: pair extraction is nested JVM HOFs inside the row (no
    intermediate explode of tokens — one generate per document, not
    per token), then one count shuffle whose map-side combine
    collapses to |distinct pairs| ≈ |alphabet|² partials per task, and
    a TakeOrderedAndProject top-k (never a full sort). The size guard
    matters: Spark's sequence(1, 0) counts DOWN, so 1-char tokens
    must short-circuit to an empty array (DuckDB's generate_series
    returns [] there — a real cross-engine semantics trap)."""
    d = t(spark, sf_dir, "documents")
    pairs = F.expr(
        """
        flatten(transform(split(text, ' '),
          t -> CASE WHEN char_length(t) >= 2
                    THEN transform(sequence(1, char_length(t) - 1),
                                   i -> substring(t, i, 2))
                    ELSE CAST(array() AS array<string>) END))
        """
    )
    return (
        d.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(20)
    )


# --------------------------------------------------------------------
# r38: vocabulary coverage curve (tokenizer sizing)
# --------------------------------------------------------------------


@register(
    "r38_vocab_coverage",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    freq AS (SELECT token, count(*) AS f FROM tok WHERE token <> '' GROUP BY token),
    ranked AS (
      SELECT token, f,
             sum(f) OVER (ORDER BY f DESC, token
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(f) OVER () AS tot,
             row_number() OVER (ORDER BY f DESC, token) AS rnk
      FROM freq
    )
    SELECT t.target,
           CAST(min(r.rnk) AS BIGINT) AS n_tokens_needed,
           CAST(max(r.tot) AS BIGINT) AS total_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM freq) AS vocab_size
    FROM ranked r
    CROSS JOIN (VALUES (0.5), (0.9), (0.99)) t(target)
    WHERE r.cum >= t.target * r.tot
    GROUP BY t.target
    """,
    tags=("text", "vocabulary", "coverage"),
)
def r38_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — "how many distinct tokens cover 50 /
    90 / 99 % of all token occurrences": the sizing question every
    tokenizer build answers before fixing its vocab budget.

    Plan: one explode + vocab agg (map-side combined); the cumulative
    mass runs over the VOCAB relation, which Heaps' law bounds far
    below corpus size (q78's argument), so the single ordered window
    is fine into the millions of types — beyond that, r30's two-phase
    range-partitioned prefix sum is the drop-in replacement. The three
    coverage targets broadcast; min(rank) per target gives the curve
    point. Total-order tie-break (freq desc, token) keeps every engine
    on the same curve."""
    d = t(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("f"))
    )
    wo = Window.orderBy(F.desc("f"), F.asc("token"))
    ranked = freq.select(
        "f",
        F.sum("f").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.row_number().over(wo).alias("rnk"),
    )
    totals = freq.agg(
        F.sum("f").alias("tot"), F.count("*").alias("vocab_size")
    )
    targets = d.sparkSession.createDataFrame(
        [(0.5,), (0.9,), (0.99,)], "target double"
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(targets))
        .filter(F.col("cum") >= F.col("target") * F.col("tot"))
        .groupBy("target")
        .agg(
            F.min("rnk").cast("long").alias("n_tokens_needed"),
            F.max("tot").alias("total_tokens"),
            F.max("vocab_size").alias("vocab_size"),
        )
    )


@register(
    "z10_bpe_train",
    oracle=None,  # iterative argmax loop → rows-only (Python-ref parity
    # and classic-corpus behavior pinned in tests/test_bpe.py)
    tags=("text", "bpe", "tokenizer", "iterative"),
)
def z10_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer TRAINING over the documents table: 12
    iterative merge rounds, each one vocab-sized pair-count shuffle +
    a one-row argmax collect + a JVM fold applying the merge (see
    functions/bpe.py for the scaling argument: the corpus is touched
    once; rounds cost |vocab|). Completes the tokenizer story: r09 is
    one round's candidate table, q59 applies a trained tokenizer, this
    trains one."""
    from eeg_data_lake_spark.functions.bpe import bpe_train

    return bpe_train(t(spark, sf_dir, "documents"), n_merges=12)


@register(
    "z15_bpe_apply",
    oracle=None,  # consumes the iterative z10 trainer's merges → rows-only
    # (application parity vs a Python reference in tests/test_bpe.py)
    tags=("text", "bpe", "tokenizer", "iterative"),
)
def z15_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer loop closed: train 12 merges (z10), apply them
    back to the corpus with the identical greedy fold, and report the
    tokenizer's corpus-level quality — average tokens per word and
    compression vs characters. The apply pass runs over the vocab
    relation, so at 100 TB it costs the one word-count shuffle plus
    |vocab|-sized fold rounds, same as training."""
    from eeg_data_lake_spark.functions.bpe import bpe_apply, bpe_train

    d = t(spark, sf_dir, "documents")
    merges = [
        (r.left, r.right) for r in bpe_train(d, n_merges=12).collect()
    ]
    return bpe_apply(d, merges)
